'''
Molecule bending: deform a conformer so two orbital lobes approach a
target distance.

The reference bends with ASE + a QM calculator in the loop and custom
spring constraints (ase_bend, ase_manipulations.py:683-866). The
TPU-native driver minimizes the internal harmonic FF (graph-restrained
bonds/angles + repulsion) plus a pair spring on the reactive atoms,
stepping the spring target until the PIVOT length (orbital lobe to
orbital lobe) reaches the threshold; orbitals are rebuilt from the bent
geometry between steps. When an external calculator is available it can
replace the FF via the same energy-callable interface.

Bent results are cached per (molecule, pivot indices, rounded target),
like the reference's embedder.ase_bent_mols_dict (embedder.py:457-461).
'''

import numpy as np
import jax.numpy as jnp

from tscode_tpu.backend import local_device_ctx
from tscode_tpu.ff import build_ff_params, ff_energy, params_to_device
from tscode_tpu.optimizers import fire_minimize_batch, spring_energy
from tscode_tpu.pivots import set_pivots


# the bend loop is host-sequential (orbitals rebuild between
# relaxations), so its one-conformer FIRE programs pin to the local
# CPU backend — see backend.local_device_ctx
_local_device_ctx = local_device_ctx


_BEND_BOND_K = 2000.0   # kcal/mol/A^2: near-rigid bonds during bending


def _bend_energy(c, params, pairs, targets, k):
    '''FF + reactive-pair spring; module-level so the jitted FIRE program
    is compiled once and reused across bend iterations and molecules.
    k is TRACED: the bend loop escalates it when progress stalls (the
    reference's OrbitalSpring uses a hard k=1000 from the start,
    ase_manipulations.py:539; here stiffening is adaptive so easy bends
    stay gentle on the frame).

    Bonds are additionally stiffened to _BEND_BOND_K: the reference
    bends under a FixInternals bond CONSTRAINT (exact lengths,
    ase_manipulations.py:595-634), so the deformation must go into
    angles/dihedrals, never into covalent stretches.'''
    from tscode_tpu.ff import K_BOND
    e = ff_energy(c, params) + spring_energy(c, pairs, targets, k=k)
    bonds, bond_r0 = params[0], params[1]
    if bonds.shape[0]:
        d = jnp.linalg.norm(c[..., bonds[:, 0], :]
                            - c[..., bonds[:, 1], :], axis=-1)
        e = e + (_BEND_BOND_K - K_BOND) * jnp.sum((d - bond_r0) ** 2,
                                                  axis=-1)
    return e


def _relax_with_gradient(coords, gradient_fn, pair, target, k=20.0,
                         n_steps=50, fmax=0.05, dt0=0.05):
    '''Host relaxation on an external (E, grad) callback plus the
    reactive-pair spring — the QM-force form of the bend step (the
    reference runs the same shape through ASE optimizers with spring
    constraints, ase_manipulations.py:683-866). The integrator is the
    SHARED jitted FIRE update from neb.py (one implementation to keep
    correct); only the force assembly is bend-specific. Returns coords.'''
    from tscode_tpu.neb import _fire_band_update, _fire_init

    c = np.asarray(coords, dtype=float).copy()
    i1, i2 = pair

    def total_force(x):
        g = gradient_fn(x)[1]
        delta = x[i1] - x[i2]
        d = max(np.linalg.norm(delta), 1e-12)
        # d/dx of k*(d - target)^2
        sg = 2.0 * k * (d - target) * delta / d
        g = np.array(g, dtype=float)
        g[i1] += sg
        g[i2] -= sg
        return -g

    state = _fire_init(jnp.asarray(c), jnp.asarray(dt0))
    for _ in range(n_steps):
        if bool(state[5]):
            break
        f = total_force(np.asarray(state[0]))
        state = _fire_band_update(state, jnp.asarray(f),
                                  jnp.asarray(dt0), jnp.asarray(fmax))
    return np.asarray(state[0])


def bend_key(mol, pivot, threshold, conf=0):
    '''Cache key for one (conformer geometry, pivot, target) bend — the
    reference keys on the CONFORMER's coordinate sum
    (ase_manipulations.py:697-700), not the ensemble's first.'''
    return (float(np.sum(mol.atomcoords[conf])), tuple(sorted(pivot.index)),
            round(threshold, 3))


def _pivot_length(mol, conf, pivot_index):
    for p in mol.pivots[conf]:
        if p.index == pivot_index:
            return float(np.linalg.norm(p.pivot)), p
    # pivot may disappear if lobe counts change; take the closest
    return None, None


def bend_molecule(mol, conf, pivot, threshold, max_iter=40,
                  fix_angles=False, cache=None, suprafacial=False,
                  protect_double_bonds=False, logfunction=None,
                  title='bend', gradient_fn=None):
    '''
    Bend `mol`'s conformer `conf` until the pivot between the two
    reactive-atom orbitals is <= threshold (A). Returns a NEW Molecule
    (same ensemble, bent conformer replaced, orbitals+pivots rebuilt).

    fix_angles is kept for parity with the reference's
    PreventScramblingConstraint signature but is inherently satisfied:
    the internal FF restrains every angle to its input value.
    protect_double_bonds (EZPROT) adds E/Z dihedral restraints.
    '''
    if cache is not None:
        key = bend_key(mol, pivot, threshold, conf=conf)
        if key in cache:
            return cache[key]

    from tscode_tpu.molecule import Molecule
    new_mol = Molecule.__new__(Molecule)
    new_mol.__dict__.update(mol.__dict__)
    new_mol.atomcoords = mol.atomcoords.copy()

    i1, i2 = (int(i) for i in mol.reactive_indices[:2])
    orb_memo = {i: float(np.linalg.norm(atom.center[0] - atom.coord))
                for i, atom in mol.reactive_atoms[conf].items()}
    with _local_device_ctx():
        params = params_to_device(build_ff_params(
            mol.atomcoords[conf], mol.atomnos, mol.graph,
            protect_double_bonds=protect_double_bonds))
        pairs = jnp.asarray(np.array([[i1, i2]]))

    coords = mol.atomcoords[conf].copy()
    pivot_index = pivot.index
    current_len = float(np.linalg.norm(pivot.pivot))

    # orbital geometry offset: pivot length vs reactive-atom distance
    atom_dist = float(np.linalg.norm(coords[i1] - coords[i2]))
    offset = atom_dist - current_len

    # adaptive spring: start gentle, stiffen when the pivot stops
    # moving (spring/FF equilibrium short of the target); the
    # reference's OrbitalSpring is hard (k=1000) from the first step
    k_spring, k_max = 20.0, 1000.0
    prev_len = None

    for it in range(max_iter):
        if current_len <= threshold:
            break
        if prev_len is not None and abs(prev_len - current_len) < 0.01:
            if k_spring >= k_max:
                # stuck at max stiffness: stop, like the reference's
                # STUCK break (ase_manipulations.py:793-800) — the
                # embed uses whatever the bend achieved
                if logfunction:
                    logfunction(f'{title}: bend stuck at pivot length '
                                f'{current_len:.2f} A (target '
                                f'{threshold:.2f} A)')
                break
            k_spring = min(k_spring * 4.0, k_max)
        prev_len = current_len

        # step the atom-pair target toward the pivot goal
        target_piv = max(threshold, current_len - 0.3)
        target_atoms = target_piv + offset

        if gradient_fn is not None:
            # external QM surface: host FIRE on the (E, grad) callback
            # + the same reactive-pair spring
            coords = _relax_with_gradient(coords, gradient_fn,
                                          (i1, i2), target_atoms,
                                          k=k_spring)
        else:
            with _local_device_ctx():
                relaxed, _, _ = fire_minimize_batch(
                    jnp.asarray(coords)[None], _bend_energy, n_steps=300,
                    fmax=0.05,
                    energy_args=(params, pairs,
                                 jnp.asarray(np.array([target_atoms])),
                                 jnp.asarray(k_spring)))
                coords = np.asarray(relaxed[0])

        # rebuild orbitals + pivots from the bent geometry, keeping the
        # ORIGINAL orbital type override (SIMPLEORBITALS) and lengths
        # (SHRINK scaling) — the reference preserves both through
        # orb_memo + atom.init(update=True) (ase_manipulations.py:849-858).
        # Only the bent conformer changed, so the rebuild is scoped to
        # it (confs=[conf]); the other conformers keep the input
        # molecule's atoms/pivots, which are exactly what a full
        # rebuild would reproduce from their unchanged coordinates.
        new_mol.atomcoords = new_mol.atomcoords.copy()
        new_mol.atomcoords[conf] = coords
        new_mol.compute_orbitals(
            override=getattr(mol, '_orbital_override', None),
            confs=[conf])
        new_mol.restore_orb_lengths(orb_memo, confs=[conf])
        set_pivots(new_mol, suprafacial=suprafacial, confs=[conf])

        current_len, p = _pivot_length(new_mol, conf, pivot_index)
        if current_len is None:
            if logfunction:
                logfunction(f'{title}: pivot {pivot_index} vanished during '
                            f'bending; keeping last geometry')
            break
        atom_dist = float(np.linalg.norm(coords[i1] - coords[i2]))
        offset = atom_dist - current_len

    if not new_mol.reactive_atoms:
        new_mol.compute_orbitals(
            override=getattr(mol, '_orbital_override', None))
        new_mol.restore_orb_lengths(orb_memo)
        set_pivots(new_mol, suprafacial=suprafacial)

    # scramble check: the reference accepts at most ONE new bond (the
    # approaching reactive termini) and reverts to the input molecule
    # otherwise (ase_manipulations.py:829-834)
    from tscode_tpu.utils import molecule_check
    if not molecule_check(mol.atomcoords[conf], new_mol.atomcoords[conf],
                          mol.atomnos, max_newbonds=1):
        if logfunction:
            logfunction(f'{title}: bending scrambled the structure; '
                        f'reverting to the unbent molecule')
        new_mol = mol

    if cache is not None:
        cache[key] = new_mol
    return new_mol
