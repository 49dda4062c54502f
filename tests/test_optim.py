'''Optimizer-layer tests: batched FIRE, internal FF, NEB on analytic
potentials with known minima/saddles.'''

import os

import jax.numpy as jnp
import pytest
import numpy as np

from tscode_tpu.ff import build_ff_params, ff_energy, merge_ff_params, params_to_device
from tscode_tpu.molecule import Molecule
from tscode_tpu.neb import interpolate_chain, run_neb
from tscode_tpu.optimizers import fire_minimize, fire_minimize_batch, spring_energy

FIX = os.path.join(os.path.dirname(__file__), 'fixtures')
rng = np.random.default_rng(5)


# ------------------------------------------------------------------- FIRE

def test_fire_harmonic_well_batch():
    def energy(c):                        # (B, N, 3) -> (B,)
        return jnp.sum(c ** 2, axis=(-2, -1))

    x0 = jnp.asarray(rng.normal(size=(16, 4, 3)) * 2)
    x, e, done = fire_minimize_batch(x0, energy, n_steps=300, fmax=1e-3)
    assert bool(done.all())
    np.testing.assert_allclose(np.asarray(x), 0.0, atol=1e-3)


def test_fire_freeze_mask():
    def energy(c):
        return jnp.sum(c ** 2, axis=(-2, -1))

    x0 = jnp.asarray(rng.normal(size=(4, 3, 3)))
    freeze = np.array([True, False, False])
    x, _, _ = fire_minimize_batch(x0, energy, n_steps=200,
                                  freeze_mask=freeze)
    np.testing.assert_allclose(np.asarray(x)[:, 0], np.asarray(x0)[:, 0],
                               atol=1e-12)     # frozen atom untouched
    # free atoms converge to the default fmax=0.05 force tolerance,
    # i.e. |x| < 0.025 for E = sum(x^2)
    np.testing.assert_allclose(np.asarray(x)[:, 1:], 0.0, atol=0.03)


# --------------------------------------------------------------------- FF

def test_ff_restores_distorted_geometry():
    mol = Molecule(os.path.join(FIX, 'CH3Cl.xyz'))
    params = params_to_device(build_ff_params(mol.atomcoords[0],
                                              mol.atomnos, mol.graph))

    def energy(c):
        return ff_energy(c, params)

    # distort and relax back: bond lengths should return to reference
    distorted = mol.atomcoords[0] + rng.normal(size=(5, 3)) * 0.15
    relaxed, e, done = fire_minimize(distorted, energy, n_steps=800,
                                     fmax=1e-2)

    bonds = np.array([(a, b) for a, b in mol.graph.edges if a != b])
    r0 = np.linalg.norm(mol.atomcoords[0][bonds[:, 0]]
                        - mol.atomcoords[0][bonds[:, 1]], axis=1)
    r_rel = np.linalg.norm(relaxed[bonds[:, 0]] - relaxed[bonds[:, 1]],
                           axis=1)
    np.testing.assert_allclose(r_rel, r0, atol=0.02)
    assert e < 0.5


def test_ff_merge_multimolecular():
    m1 = Molecule(os.path.join(FIX, 'C2H4.xyz'))
    m2 = Molecule(os.path.join(FIX, 'CH3Cl.xyz'))
    p1 = build_ff_params(m1.atomcoords[0], m1.atomnos, m1.graph)
    p2 = build_ff_params(m2.atomcoords[0], m2.atomnos, m2.graph)
    merged = merge_ff_params([p1, p2], [0, m1.n_atoms])
    assert merged.bonds.max() >= m1.n_atoms       # second-molecule indices
    assert len(merged.bond_r0) == len(p1.bond_r0) + len(p2.bond_r0)


def test_spring_constraint_pulls_to_target():
    pairs = jnp.asarray(np.array([[0, 1]]))
    targets = jnp.asarray(np.array([2.0]))

    def energy(c):
        return spring_energy(c, pairs, targets, k=10.0)

    x0 = jnp.asarray(np.array([[[0., 0., 0.], [5., 0., 0.]]]))
    x, _, _ = fire_minimize_batch(x0, energy, n_steps=400, fmax=1e-3)
    d = np.linalg.norm(np.asarray(x)[0, 0] - np.asarray(x)[0, 1])
    assert abs(d - 2.0) < 1e-2


# -------------------------------------------------------------------- NEB

def _curved_double_well(c):
    '''E(x, y, z) = (x^2-1)^2 + (y - 0.5 x^2)^2 + z^2 summed over images.
    Minima at (+-1, 0.5, 0); saddle at (0, 0, 0) with E = 1.'''
    x = c[..., 0, 0]
    y = c[..., 0, 1]
    z = c[..., 0, 2]
    return (x ** 2 - 1) ** 2 + (y - 0.5 * x ** 2) ** 2 + z ** 2


def test_neb_finds_curved_saddle():
    start = np.array([[-1.0, 0.5, 0.0]])
    end = np.array([[1.0, 0.5, 0.0]])
    chain, energies, ts = run_neb(start, end, _curved_double_well,
                                  n_images=11, k_spring=2.0,
                                  n_steps=1500, climb_after=700, dt0=0.05)
    ts_point = chain[ts][0]
    assert abs(ts_point[0]) < 0.05              # saddle at x = 0
    assert abs(ts_point[1]) < 0.1               # ... y = 0 (curved path!)
    assert abs(energies[ts] - 1.0) < 0.02       # barrier height 1
    # endpoints never move
    np.testing.assert_allclose(chain[0], start, atol=1e-12)
    np.testing.assert_allclose(chain[-1], end, atol=1e-12)


def test_interpolate_chain():
    start = rng.normal(size=(4, 3))
    end = rng.normal(size=(4, 3))
    chain = interpolate_chain(start, end, 5)
    assert chain.shape == (5, 4, 3)
    np.testing.assert_allclose(chain[0], start)
    np.testing.assert_allclose(chain[-1], end)
    np.testing.assert_allclose(chain[2], (start + end) / 2)


# ------------------------------------------------------------ dimer saddle

def test_dimer_saddle_on_double_well():
    '''The dimer method walks from a perturbed point to the (0, 0, 0)
    saddle of the curved double well (no Hessian, forces only).'''
    from tscode_tpu.saddle import dimer_saddle

    start = jnp.asarray(np.array([[-0.4, 0.45, 0.02]]))
    c, e, done = dimer_saddle(start, _curved_double_well,
                              n_steps=600, fmax=1e-4)
    c = np.asarray(c)[0]
    assert abs(c[0]) < 0.02
    assert abs(c[1]) < 0.05
    assert abs(float(e) - 1.0) < 0.01


def test_ff_double_bond_protection_term():
    '''EZPROT: build_ff_params(protect_double_bonds=True) restrains the
    C=C dihedral — twisting the bond costs energy; without protection
    the FF is flat along that mode (reference PSC,
    ase_manipulations.py:618-633).'''
    import os

    from tscode_tpu.ff import build_ff_params, ff_energy, params_to_device
    from tscode_tpu.graphs import graphize
    from tscode_tpu.io_xyz import read_xyz

    fix = os.path.join(os.path.dirname(__file__), 'fixtures')
    data = read_xyz(os.path.join(fix, 'C2H4.xyz'))
    coords, nos = data.atomcoords[0], data.atomnos
    graph = graphize(coords, nos)

    plain = build_ff_params(coords, nos, graph)
    prot = build_ff_params(coords, nos, graph, protect_double_bonds=True)
    assert plain.dihedrals.shape[0] == 0
    assert prot.dihedrals.shape[0] == 1          # one C=C

    # rotate one CH2 group by 30 degrees about the C=C axis
    from tscode_tpu.ops.linalg import rot_mat_from_pointer
    a, b = (int(prot.dihedrals[0][1]), int(prot.dihedrals[0][2]))
    c0, c1 = coords[a], coords[b]
    rot = np.asarray(rot_mat_from_pointer(jnp.asarray(c1 - c0),
                                          jnp.asarray(30.0)))
    nbs = [i for i in graph.neighbors(b) if i != a]
    twisted = coords.copy()
    twisted[nbs] = (rot @ (twisted[nbs] - c1).T).T + c1

    e = lambda p, c: float(ff_energy(jnp.asarray(c), params_to_device(p)))
    assert e(prot, coords) == pytest.approx(e(plain, coords), abs=1e-9)
    gain = (e(prot, twisted) - e(plain, twisted))
    assert gain > 1.0          # the E/Z restraint resists the twist


def test_dimer_does_not_report_minimum_as_saddle():
    '''A structure already at a minimum (|F| < fmax, positive curvature)
    must not come back converged=True, and must not diverge.'''
    from tscode_tpu.saddle import dimer_saddle

    start = jnp.asarray(np.array([[-1.0, 0.5, 0.0]]))   # exact minimum
    c, e, done = dimer_saddle(start, _curved_double_well,
                              n_steps=400, fmax=1e-4)
    assert not bool(done)
    assert np.all(np.abs(np.asarray(c)) < 5.0)          # bounded walk
