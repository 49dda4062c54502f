'''
Multiembed: combinatorial docking for two polyfunctional molecules.

The reference spawns one child Embedder SUBPROCESS per arrangement of
interacting atom pairs (/root/reference/tscode/multiembed.py:26-148),
using process isolation for CPU parallelism. Here the arrangements are
batched onto the device TOGETHER: each child Embedder is built on the
host (parse, orbitals, pivots — no device traffic), its embed's block
rows are packed with the shared `_bimol_rigid_blocks` host section, and
ONE chunked screen sweep processes the union of every arrangement's
rows (the screens are row-independent, and all arrangements share the
same conformer ensembles, so coordinate tensors upload once). Each
child then receives its slice of survivors and runs the standard
refining stages. The previous arrangement-sequential design paid a
~1 s fixed dispatch/pull cost per arrangement on a tunneled
accelerator regardless of candidate count.
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


def _build_child(parent, arrangement, i):
    '''Host phase of one arrangement: write the child input, construct
    the child Embedder + RunEmbedding (reference run_child_embedder,
    multiembed.py:84-148 — minus the subprocess machinery) and pack its
    embed block rows. Returns (run, foldername, blk_or_None).'''
    from tscode_tpu.embedder import Embedder, RunEmbedding
    from tscode_tpu.embeds.cyclical import _bimol_rigid_blocks

    (x1, x2), (y1, y2) = arrangement
    start_dir = os.getcwd()
    foldername = f'tscode_embed{i + 1}'
    os.makedirs(foldername, exist_ok=True)

    mol1, mol2 = parent.objects
    copy(os.path.join(start_dir, mol1.name), foldername)
    copy(os.path.join(start_dir, mol2.name), foldername)

    child_input = os.path.join(start_dir, foldername,
                               f'embed{i + 1}_input.txt')
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
        from tscode_tpu.utils import suppress_stdout_stderr
        with suppress_stdout_stderr():
            child = Embedder(child_input, stamp=f'embed{i + 1}')
            run = RunEmbedding(child)
            # the children are all NOOPT RIGID 2-mol cyclical embeds:
            # pack the block rows now (host numpy only) so the sweep
            # can batch them across arrangements (max_norm_delta=5 via
            # the cyclical_embed dispatcher, reference embeds.py:234-242)
            blk = _bimol_rigid_blocks(
                run.objects[0], run.objects[1],
                max_norm_delta=5, pairing_ok=run.pairing_ok_fn())
            # every child is alive until its _finish_child runs: close
            # the logfile now (reopened there) so a many-arrangement
            # run doesn't hold hundreds of descriptors open at once
            run.logfile.close()
    finally:
        os.chdir(start_dir)
    return run, foldername, blk


def _screen_arrangements(parent, children):
    '''One chunked device sweep over the union of every arrangement's
    block rows. Returns per-arrangement (poses, cons) lists.'''
    import jax.numpy as jnp

    from tscode_tpu.embeds.cyclical import (_assemble_survivors,
                                            _bimol_rigid_screen_survivors,
                                            _concat_blocks)
    from tscode_tpu.ops.clash import cross_fragment_pair_mask

    live = [(run, blk) for run, _, blk in children if blk is not None]
    out = {}
    if not live:
        return out

    run0 = live[0][0]
    angles0 = np.asarray(run0.systematic_angles, dtype=float)
    coords_dev = {}     # value-shared uploads across arrangements

    def dev_coords(mol):
        for arr, ref in coords_dev.values():
            if arr is mol.atomcoords or (
                    arr.shape == mol.atomcoords.shape
                    and np.array_equal(arr, mol.atomcoords)):
                return ref
        ref = jnp.asarray(mol.atomcoords)
        coords_dev[len(coords_dev)] = (mol.atomcoords, ref)
        return ref

    # children whose angle grids match the first batch together; any
    # odd one out (different rotation settings — not produced by this
    # dispatcher, but kept safe) screens separately with its own grid
    batched = [(run, blk) for run, blk in live
               if np.array_equal(
                   np.asarray(run.systematic_angles, dtype=float), angles0)]
    solo = [(run, blk) for run, blk in live
            if not any(run is r for r, _ in batched)]

    if batched:
        # union of every arrangement's rows (compact table indices are
        # offset per arrangement inside _concat_blocks)
        cat = _concat_blocks([blk for _, blk in batched])
        surv_all, keep_all = _bimol_rigid_screen_survivors(
            cat,
            dev_coords(batched[0][0].objects[0]),
            dev_coords(batched[0][0].objects[1]),
            jnp.asarray(angles0),
            jnp.asarray(cross_fragment_pair_mask(
                (run0.objects[0].n_atoms, run0.objects[1].n_atoms))),
            run0.options.clash_thresh, mesh=parent._mesh())

        # slice the compacted survivor array per arrangement (survivors
        # arrive in row-major generation order, so each arrangement's
        # survivors are contiguous)
        lo = 0
        s_lo = 0
        for run, blk in batched:
            n = len(blk['c1'])
            keep = keep_all[lo:lo + n]
            n_surv = int(keep.sum())
            out[id(run)] = _assemble_survivors(
                surv_all[s_lo:s_lo + n_surv], keep, blk['ids'])
            lo += n
            s_lo += n_surv

    for run, blk in solo:
        surv, keep = _bimol_rigid_screen_survivors(
            blk, dev_coords(run.objects[0]), dev_coords(run.objects[1]),
            jnp.asarray(np.asarray(run.systematic_angles, dtype=float)),
            jnp.asarray(cross_fragment_pair_mask(
                (run.objects[0].n_atoms, run.objects[1].n_atoms))),
            run.options.clash_thresh, mesh=parent._mesh())
        out[id(run)] = _assemble_survivors(surv, keep, blk['ids'])

    return out


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

    # host phase: all children built + block rows packed, zero device
    # work; on a mid-build failure, drop the already-built folders so
    # nothing leaks
    children = []
    try:
        for i, arrangement in enumerate(arrangements):
            children.append(_build_child(embedder, arrangement, i))
    except BaseException:
        if not embedder.options.debug:
            for _, foldername, _ in children:
                rmtree(os.path.join(os.getcwd(), foldername),
                       ignore_errors=True)
        raise

    # device phase: one sweep over the union of rows
    t0 = time.perf_counter()
    screened = _screen_arrangements(embedder, children)
    embedder.log(f'--> Multiembed: screened all arrangements in '
                 f'{time_to_string(time.perf_counter() - t0, verbose=True)}.')

    structures_out, constr_ids = [], []
    start_dir = os.getcwd()
    for i, (run, foldername, blk) in enumerate(children):
        t0 = time.perf_counter()
        poses_out, cons_out = screened.get(id(run), ([], []))
        if poses_out:
            pre = (np.concatenate(poses_out), np.array(cons_out))
        else:
            pre = (np.array([]), np.array([]))
        structures, constrained = _finish_child(
            embedder, run, foldername, pre)
        embedder.log(f'--> Arrangement {i + 1:3}/{len(arrangements):3}: '
                     f'generated {len(structures):4} candidates in '
                     f'{time_to_string(time.perf_counter() - t0, verbose=True)}.')
        if len(structures) > 0:
            structures_out.append(structures)
            constr_ids.append(constrained)
    os.chdir(start_dir)

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


def _finish_child(parent, run, foldername, precomputed):
    '''Refining phase of one arrangement: hand the child its slice of
    the shared sweep and run the standard post-embed stages (same
    sequence as the reference child process, multiembed.py:100-131).'''
    start_dir = os.getcwd()
    os.chdir(os.path.join(start_dir, foldername))
    try:
        import contextlib

        from tscode_tpu.backend import local_device_ctx
        from tscode_tpu.utils import suppress_stdout_stderr

        # the shared sweep already ran the heavy screen on the
        # accelerator; what remains per child (TFD/MOI prunes over a
        # few hundred survivors) is LATENCY-bound on a tunneled device
        # (~40 ms per dispatch/pull x 2 stages x N arrangements), so
        # pin it to the local CPU backend — unless the ensemble is big
        # enough that the mesh-sharded prune variants would engage
        n_poses = sum(len(p) for p in precomputed[0]) \
            if isinstance(precomputed[0], list) else len(precomputed[0])
        use_local = (parent._mesh(max(1, n_poses)) is None
                     and n_poses < 20_000)
        env = os.environ.get('TSCODE_MULTIEMBED_LOCAL')
        if env is not None:                 # A/B override
            use_local = env == '1'
        device_ctx = (local_device_ctx() if use_local
                      else contextlib.nullcontext())
        with device_ctx, suppress_stdout_stderr():
            # _build_child closed the logfile to bound open descriptors
            run.logfile = open(f'tscode_{run.stamp}.log', 'a',
                               buffering=1, encoding='utf-8')
            run.precomputed_embed = precomputed
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
