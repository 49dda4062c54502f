'''
External QM single-point gradients for in-process procedures.

The reference runs NEB/saddle/bend on real QM forces by wrapping
calculators in ASE objects (ase_manipulations.py:123-214 get_ase_calc;
consumed by ase_neb :382-526, ase_saddle :314-346, ase_bend :683-866).
The TPU-native design needs no ASE: one `xtb --grad` subprocess per
evaluation yields (energy, gradient) from the Turbomole-format files
xtb writes, a chain of images is evaluated concurrently on the same
thread pool as the refinement dispatch queue, and the consuming device
programs (neb.band_forces + FIRE, dimer rotations, bend restraints)
take the numbers as plain arrays.
'''

import os
import subprocess
import tempfile

import numpy as np

from tscode_tpu.calculators.xtb import _xtb_flags
from tscode_tpu.io_xyz import write_xyz

EH_TO_KCAL = 627.5094740631          # Hartree -> kcal/mol
BOHR_TO_A = 0.529177210903           # Bohr -> Angstrom
# gradient file: Hartree/Bohr -> kcal/mol/A
GRAD_TO_KCAL_A = EH_TO_KCAL / BOHR_TO_A


def parse_turbomole_gradient(text, n_atoms):
    '''
    Parse a Turbomole-format `gradient` file (what `xtb --grad` writes):

        $grad
          cycle = 1  SCF energy = -5.070544  |dE/dxyz| = 0.000298
          <n_atoms coordinate lines: x y z element, Bohr>
          <n_atoms gradient lines: gx gy gz, Hartree/Bohr>
        $end

    Returns (energy_hartree, gradient (n_atoms, 3) Hartree/Bohr) from
    the LAST cycle present. Fortran D-exponents are handled.
    '''
    lines = [ln.strip() for ln in text.splitlines()]
    cycle_starts = [i for i, ln in enumerate(lines)
                    if ln.startswith('cycle')]
    if not cycle_starts:
        raise ValueError('no $grad cycle found in gradient file')
    start = cycle_starts[-1]

    header = lines[start]
    try:
        energy = float(header.split('energy =')[1].split()[0]
                       .replace('D', 'E').replace('d', 'e'))
    except (IndexError, ValueError) as e:
        raise ValueError(f'unparsable gradient header: {header!r}') from e

    grad_lines = lines[start + 1 + n_atoms:start + 1 + 2 * n_atoms]
    if len(grad_lines) < n_atoms:
        raise ValueError(f'gradient file truncated: expected {n_atoms} '
                         f'gradient rows, found {len(grad_lines)}')
    grad = np.array([[float(x.replace('D', 'E').replace('d', 'e'))
                      for x in ln.split()[:3]] for ln in grad_lines])
    return energy, grad


def xtb_gradient(coords, atomnos, method='GFN2-xTB', solvent=None,
                 charge=0, procs=1, title='grad_sp'):
    '''
    Single-point energy + gradient via `xtb --grad` in a scratch dir.
    Returns (energy kcal/mol, gradient (N, 3) kcal/mol/Angstrom).
    Reference capability: the ASE calculator force call inside
    ase_neb/ase_saddle/ase_bend (ase_manipulations.py:123-214).
    '''
    coords = np.asarray(coords, dtype=float)
    with tempfile.TemporaryDirectory(prefix='tscode_grad_') as cwd:
        with open(os.path.join(cwd, f'{title}.xyz'), 'w') as f:
            write_xyz(coords, atomnos, f, title=title)
        flags = ['--grad'] + _xtb_flags(method, opt=False, conv_thr=None,
                                        charge=charge, procs=procs,
                                        solvent=solvent)
        with open(os.path.join(cwd, 'out.log'), 'w') as f:
            subprocess.check_call(['xtb', f'{title}.xyz'] + flags,
                                  stdout=f, stderr=subprocess.STDOUT,
                                  cwd=cwd)
        with open(os.path.join(cwd, 'gradient')) as f:
            e_h, grad_hb = parse_turbomole_gradient(f.read(), len(coords))
    return e_h * EH_TO_KCAL, grad_hb * GRAD_TO_KCAL_A


def make_chain_gradient_fn(atomnos, calculator='XTB', method='GFN2-xTB',
                           solvent=None, charge=0, procs=1, maxthreads=4):
    '''
    Build `fn(chain (I, N, 3)) -> (energies (I,), grads (I, N, 3))`
    evaluating every image concurrently on a thread pool (the work is
    subprocess-bound, mirroring calculators/dispatch.py). Results are
    keyed by submission index — completion order never scrambles the
    band.
    '''
    if calculator != 'XTB':
        raise NotImplementedError(
            f'QM gradients are implemented for XTB (--grad); '
            f'{calculator} has no single-point gradient adapter yet.')

    from concurrent.futures import ThreadPoolExecutor

    def chain_gradient(chain):
        chain = np.asarray(chain)
        with ThreadPoolExecutor(max_workers=maxthreads) as pool:
            futures = [pool.submit(xtb_gradient, image, atomnos,
                                   method=method, solvent=solvent,
                                   charge=charge, procs=procs,
                                   title=f'grad_im{i}')
                       for i, image in enumerate(chain)]
            results = [f.result() for f in futures]
        energies = np.array([r[0] for r in results])
        grads = np.stack([r[1] for r in results])
        return energies, grads

    return chain_gradient


def make_gradient_fn(atomnos, **kwargs):
    '''Single-structure form: fn(coords (N, 3)) -> (E, grad (N, 3)).'''
    chain_fn = make_chain_gradient_fn(atomnos, **kwargs)

    def gradient(coords):
        energies, grads = chain_fn(np.asarray(coords)[None])
        return float(energies[0]), grads[0]

    return gradient
