'''Torsion/csearch tests: discovery classifiers + batched rotation loop
vs a sequential numpy oracle of the reference algorithm
(torsion_module.py:655-847).'''

import os

import numpy as np
import pytest

import oracles
from tscode_tpu.molecule import Molecule
from tscode_tpu.graphs import graphize
from tscode_tpu.ops.linalg import cartesian_product
from tscode_tpu import torsions as T

FIX = os.path.join(os.path.dirname(__file__), 'fixtures')


def fix(name):
    return os.path.join(FIX, name)


def test_torsion_discovery_difluoroethane():
    mol = Molecule(fix('C2F2H4.xyz'))
    graph = mol.graph
    dbs = T.get_double_bonds_indices(mol.atomcoords[0], mol.atomnos)
    torsions = T.get_torsions(graph, [], dbs)
    assert len(torsions) == 1
    t = torsions[0]
    c_idx = set(np.where(mol.atomnos == 6)[0])
    assert set(t.torsion[1:3]) == c_idx          # central C-C bond
    assert t.n_fold == 3                          # sp3-sp3


def test_no_rotable_bonds_ethylene():
    mol = Molecule(fix('C2H4.xyz'))
    dbs = T.get_double_bonds_indices(mol.atomcoords[0], mol.atomnos)
    assert len(dbs) == 1                          # the C=C
    torsions = T.get_torsions(mol.graph, [], dbs)
    assert torsions == []


def test_rotation_mask():
    mol = Molecule(fix('C2F2H4.xyz'))
    torsions = T.get_torsions(mol.graph, [],
                              T.get_double_bonds_indices(
                                  mol.atomcoords[0], mol.atomnos))
    t = torsions[0]
    mask = T.get_rotation_mask(mol.graph, t.torsion)
    # half the molecule minus the on-axis atom moves
    assert 0 < mask.sum() <= len(mask) // 2
    assert not mask[t.torsion[1]]


def _oracle_rotate(coords, torsion, angle, mask):
    axis = coords[torsion[1]] - coords[torsion[2]]
    mat = oracles.rot_mat_from_pointer(axis, angle)
    center = coords[torsion[2]]
    out = coords.copy()
    out[mask] = (mat @ (coords[mask] - center).T).T + center
    return out


def _oracle_comp_check(coords, torsion, mask, thresh=1.5):
    _, i2, i3, _ = torsion
    antimask = ~mask
    antimask = antimask.copy()
    antimask[i2] = False
    antimask[i3] = False
    d = oracles.all_dists(coords[antimask], coords[mask])
    return np.count_nonzero(d < thresh) == 0


def _oracle_csearch_block(coords, torsions, graph, angle_sets):
    '''Reference inner loop (torsion_module.py:743-781): returns the
    accepted structures in order.'''
    out = []
    for angle_set in angle_sets:
        new_coords = coords.copy()
        rotated = 0
        for t, torsion in enumerate(torsions):
            angle = angle_set[t]
            if angle != 0:
                mask = T.get_rotation_mask(graph, torsion.torsion)
                temp = _oracle_rotate(new_coords, torsion.torsion,
                                      angle, mask)
                if not _oracle_comp_check(temp, torsion.torsion, mask):
                    for _ in range(int(angle) // 5):
                        temp = _oracle_rotate(temp, torsion.torsion,
                                              -5, mask)
                        if _oracle_comp_check(temp, torsion.torsion, mask):
                            rotated += 1
                            break
                else:
                    rotated += 1
                new_coords = temp
        if rotated:
            out.append(new_coords)
    return np.array(out)


def test_batched_rotation_vs_oracle():
    mol = Molecule(fix('C2F2H4.xyz'))
    coords = mol.atomcoords[0]
    graph = mol.graph
    torsions = T.get_torsions(graph, [],
                              T.get_double_bonds_indices(coords, mol.atomnos))
    angle_sets = cartesian_product(
        *[np.array(t.get_angles()) for t in torsions]).astype(float)

    import jax.numpy as jnp
    batch = jnp.broadcast_to(jnp.asarray(coords),
                             (len(angle_sets),) + coords.shape)
    got_coords, got_rotated = T._apply_torsion_group(
        batch, torsions, graph, angle_sets)
    got = np.asarray(got_coords)[np.asarray(got_rotated) > 0]

    want = _oracle_csearch_block(coords, torsions, graph, angle_sets)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_csearch_end_to_end():
    mol = Molecule(fix('C2F2H4.xyz'))
    out = T.csearch(mol.atomcoords[0], mol.atomnos, mode=1,
                    logfunction=lambda *a, **k: None)
    # 3-fold torsion: identity rotation is torsionally redundant with one
    # of the rotated ones only if geometry is symmetric; at least 2 out
    assert len(out) >= 2
    assert out.shape[1:] == mol.atomcoords[0].shape


def test_csearch_no_torsions_returns_input():
    mol = Molecule(fix('C2H4.xyz'))
    out = T.csearch(mol.atomcoords[0], mol.atomnos, mode=1,
                    logfunction=lambda *a, **k: None)
    assert out.shape == (1,) + mol.atomcoords[0].shape


def test_hydrogen_bond_detection():
    # build a synthetic O-H...O arrangement
    coords = np.array([
        [0.0, 0.0, 0.0],      # O1
        [0.95, 0.0, 0.0],     # H on O1
        [2.8, 0.0, 0.0],      # O2 (O-O 2.8 A, in window, angle ~0)
        [3.2, 0.9, 0.0],      # H on O2
    ])
    atomnos = np.array([8, 1, 8, 1])
    graph = graphize(coords, atomnos)
    hbs = T.get_hydrogen_bonds(coords, atomnos, graph)
    assert [1, 2] in hbs


def test_random_csearch_empty_pool_returns_empty(tmp_path):
    '''rotations=K with no K-rotation angle sets: empty result, no crash
    (the reference's sequential loop just never accepts anything).'''
    import os

    from tscode_tpu.graphs import graphize
    from tscode_tpu.io_xyz import read_xyz
    from tscode_tpu.torsions import (get_double_bonds_indices, get_torsions,
                                     random_csearch)

    fix = os.path.join(os.path.dirname(__file__), 'fixtures')
    data = read_xyz(os.path.join(fix, 'HCOOH.xyz'))
    coords, nos = data.atomcoords[0], data.atomnos
    graph = graphize(coords, nos)
    torsions = get_torsions(graph, [], get_double_bonds_indices(coords, nos))
    out = random_csearch(coords, nos, torsions, graph, n_out=5,
                         rotations=99, logfunction=lambda s: None)
    assert out.shape[0] == 0


def test_most_diverse_returns_aligned_energies():
    from tscode_tpu.torsions import most_diverse_conformers

    rng = np.random.default_rng(0)
    structs = rng.normal(size=(40, 5, 3))
    energies = np.arange(40.0)
    quads = np.array([[0, 1, 2, 3]])
    out, ens = most_diverse_conformers(10, structs, quads,
                                       energies=energies,
                                       return_energies=True)
    assert len(out) == len(ens) <= 10
    # every returned energy belongs to a returned structure
    for s, e in zip(out, ens):
        assert e in energies


def test_scale_orbs_preserves_type_and_direction():
    '''SHRINK must only change orbital lengths (reference
    hypermolecule_class.py:283-290), even with type overrides.'''
    import os

    from tscode_tpu.molecule import Molecule

    fix = os.path.join(os.path.dirname(__file__), 'fixtures')
    mol = Molecule(os.path.join(fix, 'CH3Cl.xyz'), reactive_indices=[0])
    mol.compute_orbitals(override='Single')
    before = mol.get_r_atoms(0)[0]
    vec_before = before.center[0] - before.coord
    n_lobes = len(before.center)

    mol.scale_orbs(0.5)
    after = mol.get_r_atoms(0)[0]
    vec_after = after.center[0] - after.coord
    assert len(after.center) == n_lobes
    # same direction, half the length
    assert np.linalg.norm(vec_after) == pytest.approx(
        0.5 * np.linalg.norm(vec_before), rel=1e-6)
    cos = vec_before @ vec_after / (np.linalg.norm(vec_before)
                                    * np.linalg.norm(vec_after))
    assert cos == pytest.approx(1.0, abs=1e-9)


def test_csearch_operator_never_requests_ff_opt(tmp_path, monkeypatch):
    '''Regression: the reference csearch> operator always calls csearch
    WITHOUT per-conformer FF optimization (operators.py:184-194) — the
    run-level ff_opt option governs the refinement stages only.'''
    import shutil

    from tscode_tpu.embedder import Embedder

    shutil.copy(os.path.join(FIX, 'C2F2H4.xyz'), tmp_path)
    inp = tmp_path / 'input.txt'
    inp.write_text('NOOPT\nC2F2H4.xyz 3 5\n')
    cwd = os.getcwd()
    try:
        emb = Embedder(str(inp), stamp='csff')
    finally:
        os.chdir(cwd)

    calls = []
    real = T.csearch

    def recorder(*args, **kwargs):
        calls.append(kwargs)
        return real(*args, **kwargs)

    monkeypatch.setattr(T, 'csearch', recorder)
    # force run-level FF options ON: they must NOT leak into csearch>
    emb.options.ff_opt = True
    emb.options.ff_calc = object()     # would crash if actually used
    T.csearch_operator(emb, emb.objects[0])

    assert calls, 'csearch was not invoked'
    for kw in calls:
        assert 'ff_opt' not in kw and 'calc' not in kw
