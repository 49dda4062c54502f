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

from tscode_tpu.errors import InputError
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
                 dihedral=None, dihedral_angle=None, move_mask=None):
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
            mask = (move_mask if move_mask is not None
                    else get_rotation_mask(mol.graph, tuple(dihedral)))
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
    (reference atropisomer_module.py:286-307): strict rise on the left,
    non-strict fall on the right, plus the 5-point-window rule — a peak
    must equal max(energies[i-2:i+3]) — and the last TWO indices are
    never peaks (range(l-2)). Index 0 compares its left neighbor
    against the wrapped last value, reproducing the reference's
    negative-index quirk. For i < 2 the reference's window slice
    energies[i-2:i+3] wraps to an EMPTY slice and max() would raise if
    the earlier gates passed — a latent crash; we clip the window to
    [max(i-2, 0), i+3) instead, identical wherever the reference does
    not crash (documented bug fix).'''
    e = np.asarray(energies)
    _l = len(e)
    return [i for i in range(max(_l - 2, 0))
            if e[i - 1] < e[i] >= e[i + 1]
            and max_thr > e[i] > min_thr
            and e[i] == e[max(i - 2, 0):i + 3].max()]


def _moved_atoms_mask(embedder, mol, quad):
    '''Which atoms rotate when driving the quad torsion. Contiguous
    acyclic quads rotate the i2-side subtree (default mask); a quad
    inside a cycle, or a deliberately non-contiguous one (LET), moves
    only the last atom and lets relaxation carry the rest (reference
    atropisomer_module.py:60-99).'''
    import networkx as nx

    i1, i2, i3, i4 = quad
    contiguous = all(mol.graph.has_edge(a, b)
                     for a, b in zip(quad[:-1], quad[1:]))
    if not contiguous:
        if not embedder.options.let:
            raise InputError(
                'The specified dihedral angle is made up of non-contiguous '
                'atoms. To prevent errors, the run has been stopped. '
                'Override this behavior with the LET keyword.')
        embedder.log('    Non-contiguous dihedral indices: moving only the '
                     'last index (LET override).')
    else:
        graph = mol.graph.copy()
        graph.remove_edge(i2, i3)
        if nx.has_path(graph, i1, i3):
            embedder.log('    The dihedral angle is comprised within a '
                         'cycle: switching to safe scan (moving only the '
                         'last index).')
        else:
            return None          # default: full subtree rotation mask

    mask = np.zeros(mol.n_atoms, dtype=bool)
    mask[i4] = True
    return mask


def _dihedral_sweep(embedder, mol, start_coords, quad, step_deg, min_steps,
                    move_mask, title, ad_libitum=False, max_steps=1000):
    '''Sequential relaxed sweep of the quad torsion by step_deg per
    point. Fixed length (min_steps) by default; with ad_libitum, keeps
    going past min_steps until the energy profile shows the hill was
    crossed (reference ase_dih_scan, atropisomer_module.py:309-412).
    Returns (angles deg, absolute energies kcal/mol, structures).'''
    from tscode_tpu.ops.linalg import dihedral as dihedral_fn

    coords = np.asarray(start_coords).copy()
    angle = float(np.asarray(dihedral_fn(jnp.asarray(coords[list(quad)]))))
    angles, energies, structures = [], [], []

    for k in range(max_steps):
        coords, energy = _relax_point(embedder, mol, coords, dihedral=quad,
                                      dihedral_angle=angle,
                                      move_mask=move_mask)
        angles.append(angle)
        energies.append(energy)
        structures.append(coords.copy())
        angle += step_deg

        if k + 1 >= min_steps:
            if not ad_libitum:
                break
            crest = max(energies)
            if ((crest - energies[-1]) > 1.0
                    or energies[-1] < energies[0]
                    or (energies[-1] - min(energies)) > 50.0):
                break

    embedder.log(f'    {title}: {len(structures)} points '
                 f'({step_deg:+g} deg steps)', p=False)
    return angles, energies, structures


def _refine_subpeak(embedder, mol, fine_S, fine_E, sub_peak, label):
    '''SADDLE/NEB refinement of one accurate-scan sub-peak, per run
    options; plain sub-peak geometry otherwise (reference
    atropisomer_module.py:201-260). Returns (coords, abs energy) or
    None when the refined geometry scrambled.'''
    from tscode_tpu.utils import molecule_check

    guess = fine_S[sub_peak]

    if embedder.options.saddle:
        embedder.log(f'  > Saddle opt on {label}')
        if embedder.options.calculator is not None:
            from tscode_tpu.calculators.gradients import make_gradient_fn
            from tscode_tpu.saddle import dimer_saddle_callback
            grad_fn = make_gradient_fn(
                mol.atomnos, calculator=embedder.options.calculator,
                method=embedder.options.theory_level,
                solvent=embedder.options.solvent,
                charge=embedder.options.charge, procs=embedder.procs)
            refined, energy, _ = dimer_saddle_callback(guess, grad_fn)
        else:
            from tscode_tpu.saddle import saddle_refine_structure
            refined, energy, _ = saddle_refine_structure(
                guess, mol.atomnos, mol.graph)
        if molecule_check(guess, refined, mol.atomnos):
            return refined, energy
        embedder.log(f'    {label}: saddle opt scrambled the structure - '
                     'discarded')
        return None

    if embedder.options.neb:
        embedder.log(f'  > NEB TS opt on {label}')
        lo = fine_S[sub_peak - 2]
        hi = fine_S[(sub_peak + 1) % len(fine_S)]
        if embedder.options.calculator is not None:
            from tscode_tpu.calculators.gradients import \
                make_chain_gradient_fn
            from tscode_tpu.neb import run_neb_callback
            chain_fn = make_chain_gradient_fn(
                mol.atomnos, calculator=embedder.options.calculator,
                method=embedder.options.theory_level,
                solvent=embedder.options.solvent,
                charge=embedder.options.charge, procs=embedder.procs)
            chain, energies, ts_index = run_neb_callback(lo, hi, chain_fn,
                                                         n_images=5)
        else:
            from tscode_tpu.ff import ff_energy
            from tscode_tpu.neb import run_neb
            params = mol._ff_params_dev
            chain, energies, ts_index = run_neb(
                lo, hi, lambda ch: ff_energy(ch, params), n_images=5)
        refined = np.asarray(chain[ts_index])
        if molecule_check(lo, refined, mol.atomnos):
            return refined, float(energies[ts_index])
        embedder.log(f'    {label}: NEB TS scrambled the structure - '
                     'discarded')
        return None

    return guess, fine_E[sub_peak]


def dihedral_scan(embedder, mol, prelim_step=10):
    '''
    Atropisomer workflow (reference dihedral_scan + ase_torsion_TSs,
    atropisomer_module.py:38-284, 433-511): clockwise AND
    counterclockwise coarse scans of the driven torsion, peak detection
    above the kcal threshold, ad-libitum 1-degree re-scan over each
    peak, optional SADDLE/NEB refinement of every sub-peak, then RMSD
    pruning of the collected maxima and an MOI-aligned 'maxima'
    ensemble with barrier heights. Per-direction trajectory + SVG files.
    '''
    embedder.t_start_run = time.perf_counter()
    quad = tuple(int(i) for i in mol.reactive_indices)
    coords0 = mol.atomcoords[0].copy()

    # scans default to a 5 kcal/mol peak threshold unless KCAL was given
    # (reference atropisomer_module.py:441-443)
    thr_kcal = (embedder.options.kcal_thresh
                if 'KCAL' in embedder.kw_line.upper() else 5.0)

    from tscode_tpu.molecule import align_structures

    embedder.log(f'--> {mol.rootname} - dihedral scan on atoms {quad}, '
                 f'{prelim_step} deg preliminary steps, both directions '
                 f'({embedder.options.calculator or "internal FF"})')

    move_mask = _moved_atoms_mask(embedder, mol, quad)
    n_coarse = int(360 / prelim_step)

    maxima_S, maxima_E = [], []
    for step_deg, direction in ((prelim_step, 'clockwise'),
                                (-prelim_step, 'counterclockwise')):
        angles, energies, structures = _dihedral_sweep(
            embedder, mol, coords0, quad, step_deg, n_coarse, move_mask,
            title=f'Preliminary scan ({direction})')
        e_min = min(energies)

        # per-direction trajectory, energies relative to the scan minimum
        scan_name = f'{mol.rootname}_torsion_scan_{direction}.xyz'
        with open(scan_name, 'w') as f:
            aligned = align_structures(np.array(structures),
                                       indices=list(quad[:-1]))
            for i, s in enumerate(aligned):
                write_xyz(s, mol.atomnos, f,
                          title=f'Scan point {i + 1}/{len(structures)} - '
                                f'dihedral = {round(angles[i], 1)} deg - '
                                f'Rel. E = {round(energies[i] - e_min, 2)}'
                                ' kcal/mol')

        if _HAS_MPL:
            plt.figure()
            plt.plot(angles, [e - e_min for e in energies], '-',
                     color='tab:blue', linewidth=3, alpha=0.5,
                     label=f'Preliminary scan ({direction})')

        peaks = atropisomer_peaks(energies, min_thr=e_min + thr_kcal,
                                  max_thr=e_min + 75.0)
        embedder.log(f'    {direction} scan: {len(peaks)} peak'
                     f'{"s" if len(peaks) != 1 else ""} above '
                     f'{thr_kcal} kcal/mol')

        for p, peak in enumerate(peaks):
            # accurate re-scan: 1-degree steps from one coarse point
            # before the peak, ad libitum until the hill is crossed
            fine_A, fine_E, fine_S = _dihedral_sweep(
                embedder, mol, structures[peak - 1], quad, step_deg / 10,
                min_steps=20, move_mask=move_mask, ad_libitum=True,
                title=f'Accurate scan {p + 1}/{len(peaks)} ({direction})')

            if _HAS_MPL:
                plt.plot(fine_A, [e - e_min for e in fine_E], '-o',
                         color='tab:red', markersize=1, linewidth=2,
                         alpha=0.5,
                         label='Accurate scan' if p == 0 else None)

            sub_peaks = atropisomer_peaks(fine_E, min_thr=e_min + thr_kcal,
                                          max_thr=e_min + 75.0)
            if not sub_peaks:
                embedder.log('    No suitable sub-peaks found.')
                continue

            for sp_i, sp in enumerate(sub_peaks):
                label = (f'sub-peak {sp_i + 1}/{len(sub_peaks)} of peak '
                         f'{p + 1} ({direction})')
                result = _refine_subpeak(embedder, mol, fine_S, fine_E,
                                         sp, label)
                if result is None:
                    continue
                refined, energy = result
                maxima_S.append(refined)
                maxima_E.append(energy)
                embedder.log(
                    f'    peak near {round(angles[peak], 1)} deg refined '
                    f'to {round(fine_A[sp], 1)} deg '
                    f'({round(energy - e_min, 2)} kcal/mol)')
                if _HAS_MPL:
                    plt.plot(fine_A[sp], fine_E[sp] - e_min, color='gold',
                             marker='o', markersize=3,
                             label='Maxima' if not maxima_S[:-1] else None)

        if _HAS_MPL:
            plt.legend()
            plt.xlabel(f'Dihedral angle {quad}')
            plt.ylabel('Rel. E (kcal/mol)')
            plt.savefig(f'{mol.rootname}_torsion_scan_{direction}_plt.svg')
            plt.close()

    if not maxima_S:
        embedder.log(
            '\n--> Dihedral scan did not find any suitable maxima above '
            f'the set threshold ({thr_kcal} kcal/mol). Observe the '
            'generated energy plots and try lowering the threshold value '
            '(KCAL keyword).')
        mol.torsion_scan_data = None
        return [], [], []

    # hand the collected maxima to the embedder: RMSD prune, energy
    # sort, MOI-aligned 'maxima' ensemble with barrier heights
    # (reference atropisomer_module.py:493-510)
    from tscode_tpu.ops import rmsd_prune as rmsd_ops

    structures = np.array(maxima_S)
    energies = np.array(maxima_E, dtype=float)
    structures, keep = rmsd_ops.prune_conformers_rmsd(
        structures, mol.atomnos, rmsd_thr=embedder.options.rmsd)
    energies = energies[np.asarray(keep, bool)]
    if not np.all(keep):
        embedder.log(f'Discarded {int(np.sum(~np.asarray(keep, bool)))} '
                     'maxima for RMSD similarity '
                     f'({len(structures)} left)')

    order = np.argsort(energies)
    embedder.structures = structures[order]
    embedder.energies = energies[order]
    embedder.atomnos = mol.atomnos
    embedder.write_structures('maxima', indices=list(quad), relative=True,
                              extra='(barrier height)', align='moi')

    # NOT stored as mol.scan_data: that attribute feeds the cumulative
    # DISTANCE plot of scan_termination (the reference likewise only sets
    # it in distance scans, operators.py:752)
    mol.torsion_scan_data = (embedder.energies.copy(),)
    return list(embedder.structures), list(embedder.energies), \
        list(embedder.structures)
