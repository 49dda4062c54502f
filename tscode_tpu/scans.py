'''
Scan operators: distance scans (2 indices) and dihedral/atropisomer
scans (4 indices).

(reference /root/reference/tscode/operators.py:586-752 and
atropisomer_module.py:38-511)

Each scan point is a constrained relaxation. With an external
calculator available the points run through calculators.dispatch.optimize
at the requested theory level; without one they fall back to the
internal harmonic FF (graph-restrained), which still produces the scan
topology (clash-driven barriers) and exercises the full driver.
'''

import time

import numpy as np
import jax.numpy as jnp

from tscode_tpu.io_xyz import write_xyz
from tscode_tpu.pt import COVALENT_RADII
from tscode_tpu.utils import get_scan_peak_index, time_to_string

try:
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    _HAS_MPL = True
except ImportError:          # pragma: no cover
    _HAS_MPL = False


def _ff_spring_energy(c, p, prs, tgt):
    # module-level so fire_minimize_batch's jit (static energy_fn keyed
    # by identity) compiles ONCE for the whole scan, not per point
    from tscode_tpu.ff import ff_energy
    from tscode_tpu.optimizers import spring_energy
    return ff_energy(c, p) + spring_energy(c, prs, tgt, k=50.0)


def _ff_only_energy(c, p):
    from tscode_tpu.ff import ff_energy
    return ff_energy(c, p)


def _relax_point(embedder, mol, coords, pair=None, pair_dist=None,
                 dihedral=None, dihedral_angle=None):
    '''One constrained relaxation: external calculator when present,
    internal FF otherwise. Returns (coords, energy kcal/mol).'''
    if embedder.options.calculator is not None:
        from tscode_tpu.calculators.dispatch import optimize
        kwargs = {}
        if dihedral is not None:
            kwargs = dict(constrained_dihedrals=np.array([dihedral]),
                          constrained_dih_angles=np.array([dihedral_angle]))
        new_coords, energy, _ = optimize(
            coords, mol.atomnos, embedder.options.calculator,
            method=embedder.options.theory_level,
            constrained_indices=(np.array([pair]) if pair is not None
                                 else None),
            constrained_distances=([pair_dist] if pair is not None
                                   else None),
            solvent=embedder.options.solvent,
            charge=embedder.options.charge,
            procs=embedder.procs, check=False, **kwargs)
        return new_coords, energy

    # FF fallback. The scan loop is host-sequential (each point starts
    # from the previous relaxed geometry), so the one-structure FIRE
    # programs and scalar dihedral evaluations pin to the local CPU
    # backend — on a tunneled accelerator each would pay ~40 ms of
    # dispatch/pull latency per scan point (backend.local_device_ctx).
    from tscode_tpu.backend import local_device_ctx
    from tscode_tpu.ff import build_ff_params, ff_energy, params_to_device
    from tscode_tpu.optimizers import fire_minimize_batch, spring_energy
    from tscode_tpu.torsions import get_rotation_mask

    with local_device_ctx():
        params = getattr(mol, '_ff_params_dev', None)
        if params is None:
            params = params_to_device(build_ff_params(
                mol.atomcoords[0], mol.atomnos, mol.graph))
            mol._ff_params_dev = params

        work = coords.copy()
        if dihedral is not None:
            # impose the torsion geometrically, then relax with the four
            # dihedral atoms frozen to hold the rotated value
            from tscode_tpu.ops.linalg import dihedral as dihedral_fn
            from tscode_tpu.rot_rmsd import _rotate
            i1, i2, i3, i4 = dihedral
            current = float(np.asarray(dihedral_fn(
                jnp.asarray(work[[i1, i2, i3, i4]]))))
            delta = dihedral_angle - current
            mask = get_rotation_mask(mol.graph, tuple(dihedral))
            cand = _rotate(work, tuple(dihedral), delta, mask)
            # the rotation mask may have been inverted (its >half-atoms
            # optimization), flipping the sign of the imposed change
            achieved = float(np.asarray(dihedral_fn(
                jnp.asarray(cand[[i1, i2, i3, i4]]))))
            err_fwd = abs((achieved - dihedral_angle + 180) % 360 - 180)
            if err_fwd > 1e-3:
                cand = _rotate(work, tuple(dihedral), -delta, mask)
            work = cand
            freeze = np.zeros(len(work), dtype=bool)
            freeze[[i1, i2, i3, i4]] = True
        else:
            freeze = None

        if pair is not None:
            pairs = jnp.asarray(np.array([pair]))
            targets = jnp.asarray(np.array([pair_dist]))
            relaxed, e, _ = fire_minimize_batch(
                jnp.asarray(work)[None], _ff_spring_energy, n_steps=200,
                fmax=0.05, freeze_mask=freeze,
                energy_args=(params, pairs, targets))
        else:
            relaxed, e, _ = fire_minimize_batch(
                jnp.asarray(work)[None], _ff_only_energy, n_steps=200,
                fmax=0.05, freeze_mask=freeze, energy_args=(params,))

        return np.asarray(relaxed[0]), float(e[0])


def scan_operator(embedder, mol):
    '''Dispatch on index count (reference operators.py:586-603).'''
    assert mol.n_confs == 1, \
        'The scan> operator works on a single .xyz geometry.'
    assert len(mol.reactive_indices) in (2, 4), \
        'The scan> operator needs two or four indices ' \
        f'({len(mol.reactive_indices)} were provided)'

    if len(mol.reactive_indices) == 2:
        distance_scan(embedder, mol)
    else:
        dihedral_scan(embedder, mol)
    return mol


def distance_scan(embedder, mol, step_size=0.05):
    '''Approach/separate two atoms looking for the energy maximum
    (reference operators.py:605-752).'''
    embedder.t_start_run = time.perf_counter()
    t_start = time.perf_counter()

    i1, i2 = (int(i) for i in mol.reactive_indices)
    coords = mol.atomcoords[0].copy()
    d = float(np.linalg.norm(coords[i1] - coords[i2]))

    # separate bonded pairs, approach non-bonded ones
    bonded = mol.graph.has_edge(i1, i2)
    step = step_size if bonded else -step_size

    embedder.log(
        f'--> {mol.rootname} - Performing a distance scan '
        f'{"approaching" if step < 0 else "separating"} indices {i1} and '
        f'{i2} - step size {round(step, 2)} A\n    Theory level is '
        f'{embedder.options.theory_level} via '
        f'{embedder.options.calculator or "internal FF"}')

    r_sum = COVALENT_RADII[int(mol.atomnos[i1])] + \
        COVALENT_RADII[int(mol.atomnos[i2])]
    if step < 0:
        max_iterations = round((d - 0.9 * r_sum) / abs(step))
    else:
        max_iterations = round((1.8 * r_sum - d) / abs(step))
    max_iterations = max(max_iterations, 1)

    dists, energies, structures = [], [], []
    e_0 = None
    for it in range(max_iterations):
        t_step = time.perf_counter()
        coords, energy = _relax_point(embedder, mol, coords,
                                      pair=(i1, i2), pair_dist=d)
        if e_0 is None:
            e_0 = energy
        energies.append(energy - e_0)
        dists.append(d)
        structures.append(coords.copy())
        embedder.log(f'Step {it + 1}/{max_iterations} - d={round(d, 2)} A '
                     f'- {round(energy - e_0, 2):4} kcal/mol - '
                     f'{time_to_string(time.perf_counter() - t_step)}')
        d += step

    id_max = get_scan_peak_index(energies)

    if _HAS_MPL:
        plt.figure()
        plt.plot(dists, energies, color='tab:red', label='Scan energy',
                 linewidth=3)
        plt.plot(dists[id_max], energies[id_max], color='gold',
                 label='Energy maximum (TS guess)', marker='o',
                 markersize=3)
        title = mol.rootname + ' distance scan'
        plt.legend()
        plt.title(title)
        plt.xlabel(f'indices {i1}-{i2} distance (A)')
        if step > 0:
            plt.gca().invert_xaxis()
        plt.ylabel('Rel. E. (kcal/mol)')
        plt.savefig(f'{title.replace(" ", "_")}_plt.svg')

    with open(f'{mol.rootname}_scan.xyz', 'w') as f:
        for i, (s, dd, e) in enumerate(zip(structures, dists, energies)):
            write_xyz(s, mol.atomnos, f,
                      title=f'Scan point {i + 1}/{len(structures)} - '
                            f'd({i1}-{i2}) = {round(dd, 2)} A - '
                            f'Rel. E = {round(e, 2)} kcal/mol')

    with open(f'{mol.rootname}_scan_max.xyz', 'w') as f:
        write_xyz(structures[id_max], mol.atomnos, f,
                  title=f'Scan point {id_max + 1}/{len(structures)} - '
                        f'd({i1}-{i2}) = {round(dists[id_max], 3)} A - '
                        f'Rel. E = {round(energies[id_max], 3)} kcal/mol')

    embedder.log(f'\n--> Written {len(structures)} structures to '
                 f'{mol.rootname}_scan.xyz '
                 f'({time_to_string(time.perf_counter() - t_start)})')
    embedder.log(f'--> Written energy maximum to '
                 f'{mol.rootname}_scan_max.xyz\n')

    mol.scan_data = (dists, energies)
    return dists, energies, structures, id_max


def atropisomer_peaks(energies, min_thr=0.1, max_thr=75):
    '''Indices of local maxima within the threshold window
    (reference atropisomer_module.py:286-307).'''
    _l = len(energies)
    return [i for i in range(_l)
            if energies[i - 1] < energies[i] >= energies[(i + 1) % _l]
            and max_thr > energies[i] > min_thr]


def dihedral_scan(embedder, mol, prelim_step=10, accurate_step=1):
    '''
    Atropisomer workflow: coarse relaxed dihedral scan (prelim_step deg),
    peak detection, fine re-scan around each peak, TS-candidate output
    (reference dihedral_scan, atropisomer_module.py:433-511 +
    ase_torsion_TSs :38-284, scan core).
    '''
    embedder.t_start_run = time.perf_counter()
    quad = tuple(int(i) for i in mol.reactive_indices)
    coords0 = mol.atomcoords[0].copy()

    from tscode_tpu.ops.linalg import dihedral as dihedral_fn
    start_angle = float(np.asarray(dihedral_fn(
        jnp.asarray(coords0[list(quad)]))))

    embedder.log(f'--> {mol.rootname} - dihedral scan on atoms {quad}, '
                 f'starting angle {round(start_angle, 1)} deg, '
                 f'{prelim_step} deg preliminary steps '
                 f'({embedder.options.calculator or "internal FF"})')

    # coarse scan over the full turn
    angles = [start_angle + k * prelim_step
              for k in range(int(360 / prelim_step))]
    energies, structures = [], []
    coords = coords0.copy()
    e_0 = None
    for a in angles:
        coords, energy = _relax_point(embedder, mol, coords,
                                      dihedral=quad, dihedral_angle=a)
        if e_0 is None:
            e_0 = energy
        energies.append(energy - e_0)
        structures.append(coords.copy())

    peaks = atropisomer_peaks(energies)
    embedder.log(f'    coarse scan found {len(peaks)} peak'
                 f'{"s" if len(peaks) != 1 else ""}')

    ts_structures, ts_energies = [], []
    for p in peaks:
        # fine scan around the peak
        lo = angles[p] - prelim_step
        fine_angles = [lo + k * accurate_step
                       for k in range(int(2 * prelim_step / accurate_step) + 1)]
        fine_E, fine_S = [], []
        c = structures[p - 1].copy()
        for a in fine_angles:
            c, energy = _relax_point(embedder, mol, c,
                                     dihedral=quad, dihedral_angle=a)
            fine_E.append(energy - e_0)
            fine_S.append(c.copy())
        i_best = int(np.argmax(fine_E))
        ts_structures.append(fine_S[i_best])
        ts_energies.append(fine_E[i_best])
        embedder.log(f'    peak near {round(angles[p], 1)} deg refined to '
                     f'{round(fine_angles[i_best], 1)} deg '
                     f'({round(fine_E[i_best], 2)} kcal/mol)')

    with open(f'{mol.rootname}_torsion_scan.xyz', 'w') as f:
        for i, (s, a, e) in enumerate(zip(structures, angles, energies)):
            write_xyz(s, mol.atomnos, f,
                      title=f'Scan point {i + 1}/{len(structures)} - '
                            f'dihedral = {round(a, 1)} deg - '
                            f'Rel. E = {round(e, 2)} kcal/mol')

    if ts_structures:
        with open(f'{mol.rootname}_TSs_guesses.xyz', 'w') as f:
            for i, (s, e) in enumerate(zip(ts_structures, ts_energies)):
                write_xyz(s, mol.atomnos, f,
                          title=f'TS guess {i + 1}/{len(ts_structures)} - '
                                f'Rel. E = {round(e, 2)} kcal/mol')
        embedder.log(f'--> Written {len(ts_structures)} TS guesses to '
                     f'{mol.rootname}_TSs_guesses.xyz\n')

    # NOT stored as mol.scan_data: that attribute feeds the cumulative
    # DISTANCE plot of scan_termination (the reference likewise only sets
    # it in distance scans, operators.py:752)
    mol.torsion_scan_data = (angles, energies)
    return angles, energies, ts_structures
