'''Molecule-layer tests: graph inference, orbital builders, alignment.

Oracles are hand-derived from the reference's geometric definitions
(reactive_atoms_classes.py, graph_manipulations.py) on the fixture
molecules under tests/fixtures/.
'''

import os

import numpy as np
import pytest

from tscode_tpu.graphs import (get_sp_n, get_sum_graph, graphize, is_amide_n,
                               is_ester_o, neighbors)
from tscode_tpu.molecule import Molecule, Pivot, align_structures
from tscode_tpu.orbitals import ATOM_TYPE_TABLE, get_atom_builder

FIX = os.path.join(os.path.dirname(__file__), 'fixtures')


def fix(name):
    return os.path.join(FIX, name)


# ------------------------------------------------------------------ graphs

def test_graphize_ethylene():
    mol = Molecule(fix('C2H4.xyz'))
    g = mol.graph
    # C0-H1, C0-H2, C0-C3, C3-H4, C3-H5
    assert sorted(neighbors(g, 0)) == [1, 2, 3]
    assert sorted(neighbors(g, 3)) == [0, 4, 5]
    assert neighbors(g, 1) == [0]


def test_sp_n():
    mol = Molecule(fix('C2H4.xyz'))
    assert get_sp_n(0, mol.graph) == 2          # sp2 carbon
    mol2 = Molecule(fix('CH3Cl.xyz'))
    assert get_sp_n(0, mol2.graph) == 3         # sp3 carbon


def test_formic_acid_graph_and_classes():
    mol = Molecule(fix('HCOOH.xyz'))
    g = mol.graph
    # HCOOH: C bonded to =O, -O(H), H
    c_idx = int(np.where(mol.atomnos == 6)[0][0])
    o_idxs = np.where(mol.atomnos == 8)[0]
    assert len(neighbors(g, c_idx)) == 3
    kinds = {len(neighbors(g, int(o))) for o in o_idxs}
    assert kinds == {1, 2}                      # carbonyl O and hydroxyl O
    assert not is_amide_n(c_idx, g)
    # NOTE: the reference's is_ester_o H-check tests node INDEX 1, not
    # element (graph_manipulations.py:142), so formic acid oxygens
    # classify as ester O — we reproduce that behavior
    assert is_ester_o(int(o_idxs[0]), g)


def test_sum_graph():
    m1 = Molecule(fix('C2H4.xyz'))
    m2 = Molecule(fix('CH3Cl.xyz'))
    g = get_sum_graph([m1.graph, m2.graph], extra_edges=[(0, 6)])
    assert len(g.nodes) == 11
    assert g.has_edge(0, 6)
    # is_single_molecule is evaluated BEFORE extra edges are added
    # (reference graph_manipulations.py:318-322)
    assert not g.is_single_molecule
    assert g.nodes[10]['atomnos'] == 17         # Cl carried over


# ---------------------------------------------------------------- orbitals

def test_type_dispatch():
    mol = Molecule(fix('CH3Cl.xyz'))
    assert get_atom_builder(mol.graph, 0) is ATOM_TYPE_TABLE['C4']
    assert get_atom_builder(mol.graph, 4) is ATOM_TYPE_TABLE['Cl1']
    eth = Molecule(fix('C2H4.xyz'))
    assert get_atom_builder(eth.graph, 0) is ATOM_TYPE_TABLE['C3']


def test_sp2_orbital_geometry():
    mol = Molecule(fix('C2H4.xyz'), reactive_indices=[0])
    mol.compute_orbitals()
    atom = mol.reactive_atoms[0][0]
    assert str(atom) == 'sp2'
    assert atom.center.shape == (2, 3)
    # lobes are +-1.1 A (C sp2) from the atom, orthogonal to the plane
    d = np.linalg.norm(atom.center - atom.coord, axis=1)
    np.testing.assert_allclose(d, [1.1, 1.1], atol=1e-8)
    plane_normal = atom.orb_vecs[0]
    for n in neighbors(mol.graph, 0):
        v = mol.atomcoords[0][n] - atom.coord
        assert abs(plane_normal @ (v / np.linalg.norm(v))) < 1e-2
    # opposite lobes
    np.testing.assert_allclose(atom.orb_vecs[0], -atom.orb_vecs[1], atol=1e-12)


def test_sp3_leaving_group():
    mol = Molecule(fix('CH3Cl.xyz'), reactive_indices=[0])
    mol.compute_orbitals()
    atom = mol.reactive_atoms[0][0]
    assert str(atom) == 'sp3'
    assert atom.center.shape == (1, 3)
    # single lobe at 1.0 A opposite the Cl
    cl = mol.atomcoords[0][4]
    lobe_dir = atom.orb_vecs[0] / np.linalg.norm(atom.orb_vecs[0])
    cl_dir = (cl - atom.coord) / np.linalg.norm(cl - atom.coord)
    np.testing.assert_allclose(lobe_dir, -cl_dir, atol=1e-8)
    np.testing.assert_allclose(np.linalg.norm(atom.center[0] - atom.coord),
                               1.0, atol=1e-8)


def test_single_bond_orbital():
    mol = Molecule(fix('CH3Cl.xyz'), reactive_indices=[4])
    mol.compute_orbitals()
    atom = mol.reactive_atoms[0][4]
    assert str(atom) == 'Single Bond'
    # Cl lobe: 1.5 A, pointing away from the carbon
    np.testing.assert_allclose(np.linalg.norm(atom.center[0] - atom.coord),
                               1.5, atol=1e-8)
    c_dir = (mol.atomcoords[0][0] - atom.coord)
    c_dir /= np.linalg.norm(c_dir)
    np.testing.assert_allclose(atom.orb_vecs[0], -c_dir, atol=1e-8)


def test_ketone_orbital():
    mol = Molecule(fix('HCOOH.xyz'))
    carbonyl_o = next(int(o) for o in np.where(mol.atomnos == 8)[0]
                      if len(neighbors(mol.graph, int(o))) == 1)
    mol = Molecule(fix('HCOOH.xyz'), reactive_indices=[carbonyl_o])
    mol.compute_orbitals()
    atom = mol.reactive_atoms[0][carbonyl_o]
    assert str(atom) == 'Ketone (sp2)'
    assert atom.center.shape == (2, 3)
    d = np.linalg.norm(atom.center - atom.coord, axis=1)
    np.testing.assert_allclose(d, [0.85, 0.85], atol=1e-8)
    # n lobes at 120 deg from the C=O bond
    c = mol.atomcoords[0][neighbors(mol.graph, carbonyl_o)[0]]
    bond_dir = (c - atom.coord) / np.linalg.norm(c - atom.coord)
    for lobe in atom.orb_vecs:
        cosang = lobe @ bond_dir
        np.testing.assert_allclose(np.degrees(np.arccos(cosang)), 120, atol=1)


def test_ether_orbital():
    mol = Molecule(fix('HCOOH.xyz'))
    hydroxyl_o = next(int(o) for o in np.where(mol.atomnos == 8)[0]
                      if len(neighbors(mol.graph, int(o))) == 2)
    mol = Molecule(fix('HCOOH.xyz'), reactive_indices=[hydroxyl_o])
    mol.compute_orbitals()
    atom = mol.reactive_atoms[0][hydroxyl_o]
    assert str(atom) == 'Ether'
    assert atom.center.shape == (2, 3)
    d = np.linalg.norm(atom.center - atom.coord, axis=1)
    np.testing.assert_allclose(d, [1.0, 1.0], atol=1e-8)
    # lobes preserve the substituent angle (rigid rotation of the 2 vecs)
    nbs = neighbors(mol.graph, hydroxyl_o)
    v1 = mol.atomcoords[0][nbs[0]] - atom.coord
    v2 = mol.atomcoords[0][nbs[1]] - atom.coord
    ang_subs = np.degrees(np.arccos(
        v1 @ v2 / np.linalg.norm(v1) / np.linalg.norm(v2)))
    l1, l2 = atom.orb_vecs
    ang_lobes = np.degrees(np.arccos(
        l1 @ l2 / np.linalg.norm(l1) / np.linalg.norm(l2)))
    np.testing.assert_allclose(ang_lobes, ang_subs, atol=1e-6)


def test_vicinal_sigmastar():
    # C2F2H4 = 1,2-difluoroethane: two bonded sp3 carbons -> vicinal
    mol = Molecule(fix('C2F2H4.xyz'))
    c_idx = [int(i) for i in np.where(mol.atomnos == 6)[0]]
    mol = Molecule(fix('C2F2H4.xyz'), reactive_indices=c_idx)
    mol.compute_orbitals()
    assert mol.sp3_sigmastar
    for i in c_idx:
        atom = mol.reactive_atoms[0][i]
        assert atom.center.shape == (3, 3)     # staggered triplet


def test_scale_orbs():
    mol = Molecule(fix('C2H4.xyz'), reactive_indices=[0])
    mol.compute_orbitals()
    mol.scale_orbs(0.5)
    atom = mol.reactive_atoms[0][0]
    np.testing.assert_allclose(
        np.linalg.norm(atom.center - atom.coord, axis=1), [0.55, 0.55],
        atol=1e-8)
    assert mol.get_orbital_length(0) == pytest.approx(0.55)


# ----------------------------------------------------------------- pivots

def test_pivot():
    p = Pivot(np.zeros(3), np.array([2., 0, 0]),
              np.zeros(3), np.array([1., 0, 0]), 0, 1)
    np.testing.assert_allclose(p.pivot, [2, 0, 0])
    np.testing.assert_allclose(p.meanpoint, [1, 0, 0])
    assert p.index == (0, 1)


# -------------------------------------------------------------- alignment

def test_align_structures_recovers_rotation():
    rng = np.random.default_rng(7)
    base = rng.normal(size=(9, 3)) * 2
    from tests.oracles import rot_mat_from_pointer  # noqa
    R = rot_mat_from_pointer(np.array([1.0, 2.0, -0.5]), 63.0)
    rotated = (R @ base.T).T + np.array([3.0, -1.0, 0.5])
    aligned = align_structures(np.array([base, rotated]))
    np.testing.assert_allclose(aligned[0], aligned[1], atol=1e-8)


def test_molecule_centering_and_repr():
    mol = Molecule(fix('C2H4.xyz'), reactive_indices=[0, 3])
    np.testing.assert_allclose(mol.atomcoords.mean(axis=(0, 1)), 0, atol=1e-12)
    mol.compute_orbitals()
    assert 'sp2' in repr(mol)


def _write_mol(tmp_path, name, atoms):
    path = tmp_path / name
    lines = [str(len(atoms)), 'synthetic']
    for sym, x, y, z in atoms:
        lines.append(f'{sym} {x} {y} {z}')
    path.write_text('\n'.join(lines) + '\n')
    return str(path)


def test_imine_orbital(tmp_path):
    '''CH2=NH nitrogen -> Imine type: one lobe in-plane opposite the
    substituent bisector (reference reactive_atoms_classes Imine).'''
    path = _write_mol(tmp_path, 'imine.xyz', [
        ('C', 0.0, 0.0, 0.0), ('N', 1.28, 0.0, 0.0),
        ('H', -0.55, 0.93, 0.0), ('H', -0.55, -0.93, 0.0),
        ('H', 1.86, 0.84, 0.0)])
    mol = Molecule(path, reactive_indices=[1])
    mol.compute_orbitals()
    atom = mol.get_r_atoms(0)[0]
    assert 'Imine' in str(atom)
    assert len(atom.center) >= 1
    # lobe stays in the molecular plane (z = 0)
    assert all(abs(c[2]) < 1e-6 for c in atom.center)


def test_sp_carbon_orbital(tmp_path):
    '''H-C#N carbon (2 neighbors, linear) -> sp type with two collinear
    lobes perpendicular... rather along the axis complement.'''
    path = _write_mol(tmp_path, 'hcn.xyz', [
        ('H', -1.06, 0.0, 0.0), ('C', 0.0, 0.0, 0.0),
        ('N', 1.15, 0.0, 0.0)])
    mol = Molecule(path, reactive_indices=[1])
    mol.compute_orbitals()
    atom = mol.get_r_atoms(0)[0]
    assert 'sp' in str(atom).lower()


def test_metal_orbital(tmp_path):
    '''A bonded alkali/metal center -> Metal type, 4 ringed lobes
    (reference reactive_atoms_classes Metal).'''
    path = _write_mol(tmp_path, 'liOH2.xyz', [
        ('Li', 0.0, 0.0, 0.0), ('O', 1.9, 0.0, 0.0),
        ('H', 2.45, 0.78, 0.0), ('H', 2.45, -0.78, 0.0)])
    mol = Molecule(path, reactive_indices=[0])
    mol.compute_orbitals()
    atom = mol.get_r_atoms(0)[0]
    assert 'Metal' in str(atom)
    assert len(atom.center) == 4
    # lobes sit away from the ligand (positive projection opposite O)
    for c in atom.center:
        assert np.linalg.norm(c - mol.atomcoords[0][0]) > 0.1


def test_ketene_orbital_subtype(tmp_path):
    '''H2C=C=O terminal oxygen -> ketene 'p+p' subtype: 4 lobes ringed
    about the C=O axis (reference reactive_atoms_classes.py:300-320).'''
    path = _write_mol(tmp_path, 'ketene.xyz', [
        ('O', 0.0, 0.0, 0.0), ('C', 1.16, 0.0, 0.0),
        ('C', 2.47, 0.0, 0.0),
        ('H', 3.02, 0.93, 0.0), ('H', 3.02, -0.93, 0.0)])
    mol = Molecule(path, reactive_indices=[0])
    mol.compute_orbitals()
    atom = mol.get_r_atoms(0)[0]
    assert 'p+p' in str(atom)
    assert len(atom.center) == 4
    # lobes orthogonal to the O=C axis
    axis = mol.atomcoords[0][1] - mol.atomcoords[0][0]
    for c in atom.center:
        v = c - mol.atomcoords[0][0]
        cosang = abs(v @ axis) / (np.linalg.norm(v) * np.linalg.norm(axis))
        assert cosang < 0.3, cosang


def test_alkoxide_orbital_subtype(tmp_path):
    '''Methoxide-like O on an sp3 carbon -> 'trilobe' (3 lobes staggered
    against the carbon substituents).'''
    path = _write_mol(tmp_path, 'methoxide.xyz', [
        ('O', 0.0, 0.0, 0.0), ('C', 1.40, 0.0, 0.0),
        ('H', 1.80, 1.03, 0.0), ('H', 1.80, -0.51, 0.89),
        ('H', 1.80, -0.51, -0.89)])
    mol = Molecule(path, reactive_indices=[0])
    mol.compute_orbitals()
    atom = mol.get_r_atoms(0)[0]
    assert len(atom.center) == 3


_PRCL_XYZ = '''11
1-chloropropane
C    0.000   0.000   0.000
Cl   1.780   0.000   0.000
C   -0.760   1.316   0.000
C   -2.280   1.316   0.000
H   -0.360  -0.510   0.890
H   -0.360  -0.510  -0.890
H   -0.400   1.870   0.890
H   -0.400   1.870  -0.890
H   -2.640   0.800   0.890
H   -2.640   0.800  -0.890
H   -2.680   2.290   0.000
'''


def test_lg_applies_only_to_the_bonded_sp3_atom(tmp_path):
    '''Regression: a molecule-line lg= index must only reach the sp3
    atom it is bonded to (reference re-prompts on an unbonded index,
    reactive_atoms_classes.py:163-168); the other sp3 reactive atom
    auto-infers its leaving group instead of crashing.'''
    p = tmp_path / 'prcl.xyz'
    p.write_text(_PRCL_XYZ)
    mol = Molecule(str(p), reactive_indices=[0, 3], attrs={'lg': 1})
    mol.compute_orbitals()          # used to ValueError on atom 3

    coords = mol.atomcoords[0]
    # atom 0: orbital opposite the Cl (atom 1)
    v0 = mol.reactive_atoms[0][0].orb_vecs[0]
    away_cl = coords[0] - coords[1]
    assert v0 @ away_cl > 0
    # atom 3: auto-inferred leaving group = its single non-H neighbor
    # (atom 2), orbital points away from it
    v3 = mol.reactive_atoms[0][3].orb_vecs[0]
    away_c2 = coords[3] - coords[2]
    assert v3 @ away_c2 > 0


def test_lg_unbonded_raises_input_error(tmp_path):
    from tscode_tpu.errors import InputError
    p = tmp_path / 'prcl.xyz'
    p.write_text(_PRCL_XYZ)
    mol = Molecule(str(p), reactive_indices=[0], attrs={'lg': 8})
    with pytest.raises(InputError):
        mol.compute_orbitals()


def test_zero_reactive_molecule_has_per_conf_empties():
    '''Reference parity (hypermolecule_class.py:195-199): even with no
    reactive atoms, compute_orbitals yields one (empty) entry per
    conformer and get_pivots one (empty) list per conformer.'''
    from tscode_tpu.pivots import get_pivots
    mol = Molecule(fix('C2H4.xyz'))
    mol.compute_orbitals()
    assert set(mol.reactive_atoms) == set(range(mol.n_confs))
    assert all(mol.get_r_atoms(c) == [] for c in range(mol.n_confs))
    piv = get_pivots(mol)
    assert len(piv) == mol.n_confs
    assert all(len(p) == 0 for p in piv)


def test_alignment_indices_include_the_reactive_atom():
    '''Reference unions raw adjacency keys (self-loop included,
    hypermolecule_class.py:258): a terminal reactive atom contributes
    itself plus its one neighbor.'''
    mol = Molecule(fix('CH3Cl.xyz'), reactive_indices=[4])   # the Cl
    idx = set(mol.get_alignment_indices())
    assert 4 in idx and 0 in idx and len(idx) == 2


def test_get_centers_handles_heterogeneous_lobe_counts():
    mol = Molecule(fix('HCOOH.xyz'), reactive_indices=[1, 4])
    mol.compute_orbitals()
    centers = mol.get_centers(0)
    assert len(centers) == 2
    assert all(c.ndim == 2 and c.shape[1] == 3 for c in centers)


def test_align_by_moi_is_jax_free(monkeypatch):
    '''align_by_moi runs at output-write time on the host: it must not
    import jax (backend init outside ensure_backend can hang on a
    wedged device tunnel).'''
    import builtins
    real_import = builtins.__import__

    def guard(name, *a, **k):
        if name == 'jax' or name.startswith('jax.'):
            raise AssertionError('align_by_moi imported jax')
        return real_import(name, *a, **k)

    from tscode_tpu.molecule import align_by_moi
    rng = np.random.default_rng(0)
    base = rng.normal(size=(5, 3)) * 2
    structs = np.stack([base, base @ np.array([[0., -1, 0], [1, 0, 0],
                                               [0, 0, 1.]])])
    monkeypatch.setattr(builtins, '__import__', guard)
    out = align_by_moi(structs, np.array([6, 1, 1, 8, 17]))
    assert np.isfinite(out).all()
