'''
Multiembed: combinatorial docking for two polyfunctional molecules.

The reference spawns one child Embedder SUBPROCESS per arrangement of
interacting atom pairs (/root/reference/tscode/multiembed.py:26-148),
using process isolation for CPU parallelism. Here each arrangement runs
in-process — the per-arrangement work is already a batched device sweep,
so process isolation would only add fork/IPC overhead; arrangements
execute sequentially while each saturates the chip.
'''

import os
import time
from itertools import permutations
from shutil import copy, rmtree

import numpy as np

from tscode_tpu.errors import InputError, ZeroCandidatesError
from tscode_tpu.ops.linalg import cartesian_product
from tscode_tpu.utils import time_to_string


def multiembed_dispatcher(embedder):
    '''(reference multiembed.py:14-23)'''
    if len(embedder.objects) == 2:
        return multiembed_bifunctional(embedder)
    raise InputError('The multiembed requested is currently unavailable.')


def multiembed_bifunctional(embedder):
    '''Explore every relative arrangement of reactive-index pairs between
    the two molecules (reference multiembed.py:26-82).'''
    mol1, mol2 = embedder.objects

    pairs = cartesian_product(mol1.reactive_indices, mol2.reactive_indices)
    arrangements = [((x1, x2), (y1, y2))
                    for ((x1, x2), (y1, y2)) in permutations(map(tuple, pairs), 2)
                    if x1 != y1 and x2 != y2]

    embedder.t_start_run = time.perf_counter()
    embedder.log(f'--> Multiembed: running {len(arrangements)} embeds '
                 f'(device-batched, in-process)')

    structures_out, constr_ids = [], []
    for i, arrangement in enumerate(arrangements):
        t0 = time.perf_counter()
        structures, constrained = run_child_embed(embedder, arrangement, i)
        embedder.log(f'--> Arrangement {i + 1:3}/{len(arrangements):3}: '
                     f'generated {len(structures):4} candidates in '
                     f'{time_to_string(time.perf_counter() - t0, verbose=True)}.')
        if len(structures) > 0:
            structures_out.append(structures)
            constr_ids.append(constrained)

    if not structures_out:
        raise ZeroCandidatesError(
            '--> Multiembed did not find any suitable disposition of '
            'molecules in any arrangement.')

    structures_out = np.concatenate(structures_out)
    embedder.constrained_indices = np.concatenate(constr_ids)

    embedder.log(f'\n--> Multiembed completed: generated '
                 f'{len(structures_out)} candidates in '
                 f'{time_to_string(time.perf_counter() - embedder.t_start_run, verbose=True)}.')
    return structures_out


def run_child_embed(parent, arrangement, i):
    '''
    One arrangement = one bimolecular cyclical embed with the two chosen
    interaction pairs imposed as x/y pairings
    (reference run_child_embedder, multiembed.py:84-148 — minus the
    subprocess, scratch-dir and re-parse machinery).
    '''
    from tscode_tpu.embedder import Embedder, RunEmbedding

    (x1, x2), (y1, y2) = arrangement
    start_dir = os.getcwd()
    foldername = f'tscode_embed{i + 1}'
    os.makedirs(foldername, exist_ok=True)

    mol1, mol2 = parent.objects
    copy(os.path.join(start_dir, mol1.name), foldername)
    copy(os.path.join(start_dir, mol2.name), foldername)

    child_input = os.path.join(start_dir, foldername, f'embed{i + 1}_input.txt')
    extra = ''
    extra += ' debug' if parent.options.debug else ''
    extra += ' simpleorbitals' if parent.options.simpleorbitals else ''
    extra += (f' shrink={parent.options.shrink_multiplier}'
              if parent.options.shrink else '')
    with open(child_input, 'w') as f:
        f.write(f'noopt rigid{extra}\n')
        f.write(f'{mol1.name} {x1}x {y1}y\n')
        f.write(f'{mol2.name} {x2}x {y2}y\n')

    try:
        # child console output suppressed, as the reference does for its
        # child processes (multiembed.py:135-140)
        from tscode_tpu.utils import suppress_stdout_stderr
        with suppress_stdout_stderr():
            child = Embedder(child_input, stamp=f'embed{i + 1}')
            run = RunEmbedding(child)
            try:
                run.generate_candidates()
                run.compenetration_refining()
                run.fitness_refining()
                run.similarity_refining(rmsd=False)
                if parent.options.debug and len(run.structures):
                    # keep the structures the debug folder exists for
                    run.write_structures('unoptimized', energies=False)
            except ZeroCandidatesError:
                run.structures = np.array([])
                run.constrained_indices = np.array([])
        structures = run.structures
        constrained = run.constrained_indices
        run.logfile.close()
    finally:
        os.chdir(start_dir)
        if not parent.options.debug:
            rmtree(os.path.join(start_dir, foldername), ignore_errors=True)

    return structures, constrained
