'''pKa workflow: protonation/deprotonation geometry, the free-energy
ladder and the formatted pKa termination table, with canned XTB
energetics (no binary needed) — reference pka.py:29-247 and
embedder.py:2395-2449.'''

import os
import shutil

import numpy as np
import pytest

from tscode_tpu.errors import InputError
from tscode_tpu.io_xyz import read_xyz
from tscode_tpu.pka import deprotonate, protonate

FIX = os.path.join(os.path.dirname(__file__), 'fixtures')


def test_deprotonate_removes_proton():
    data = read_xyz(os.path.join(FIX, 'HCOOH.xyz'))
    coords, nos = data.atomcoords[0], data.atomnos
    out_c, out_n = deprotonate(coords, nos, 4)
    assert len(out_n) == 4
    assert 1 not in out_n[np.arange(len(out_n)) >= 3]
    assert np.allclose(out_c, np.delete(coords, 4, axis=0))


def test_deprotonate_rejects_heavy_atom():
    data = read_xyz(os.path.join(FIX, 'HCOOH.xyz'))
    with pytest.raises(InputError):
        deprotonate(data.atomcoords[0], data.atomnos, 0)


def test_protonate_adds_opposite_neighbors():
    data = read_xyz(os.path.join(FIX, 'HCOOH.xyz'))
    coords, nos = data.atomcoords[0], data.atomnos
    out = protonate(coords, nos, 1)          # carbonyl O
    assert out.shape == (6, 3)
    new_h = out[-1]
    assert np.linalg.norm(new_h - coords[1]) == pytest.approx(1.0, abs=1e-9)
    # placed opposite the mean neighbor direction: further from C than O is
    assert np.linalg.norm(new_h - coords[0]) > np.linalg.norm(
        coords[1] - coords[0])


def _fake_optimize(coords, atomnos, calculator, **kw):
    return np.asarray(coords), -10.0 * len(atomnos), True


def _fake_free_energy(coords, atomnos, **kw):
    return -10.0 * len(atomnos)


def test_pka_end_to_end_with_canned_xtb(tmp_path, monkeypatch):
    '''Full pka> run: acidic-H leg (HA -> A-), ladder vs the PKA=
    reference, formatted termination table in the log.'''
    monkeypatch.setattr('tscode_tpu.calculators.dispatch.optimize',
                        _fake_optimize)
    monkeypatch.setattr('tscode_tpu.calculators.xtb.xtb_get_free_energy',
                        _fake_free_energy)

    from tscode_tpu.embedder import Embedder
    shutil.copy(os.path.join(FIX, 'HCOOH.xyz'), tmp_path)
    inp = tmp_path / 'input.txt'
    inp.write_text('NOOPT CALC=XTB PKA(HCOOH.xyz)=3.77\npka> HCOOH.xyz 4\n')
    cwd = os.getcwd()
    try:
        emb = Embedder(str(inp), stamp='pkae2e')
        emb.run()
    finally:
        os.chdir(cwd)

    mol = emb.objects[0]
    assert hasattr(mol, 'pka_data')
    label, dg = mol.pka_data
    assert 'HA' in label
    # g = -10*n_atoms: G(A-) - G(HA) = -40 - (-50) = +10 kcal/mol
    assert dg == pytest.approx(10.0, abs=1e-6)

    log = (tmp_path / 'tscode_pkae2e.log').read_text()
    assert 'pKa energetics' in log
    # the reference compound's computed pKa equals its assigned value
    assert '3.77' in log


def test_pka_acid_base_equilibrium(tmp_path, monkeypatch):
    '''Acid + base in one run: ladder signs follow the reference
    convention (both legs store G(product) - G(reactant)) and the
    proton-transfer equilibrium block prints.'''
    monkeypatch.setattr('tscode_tpu.calculators.dispatch.optimize',
                        _fake_optimize)
    monkeypatch.setattr('tscode_tpu.calculators.xtb.xtb_get_free_energy',
                        _fake_free_energy)

    from tscode_tpu.embedder import Embedder
    shutil.copy(os.path.join(FIX, 'HCOOH.xyz'), tmp_path)
    shutil.copy(os.path.join(FIX, 'HCOOH.xyz'), tmp_path / 'base.xyz')
    inp = tmp_path / 'input.txt'
    # index 4 = acidic H (HA -> A-); index 1 = carbonyl O (B -> BH+)
    inp.write_text('NOOPT CALC=XTB PKA(HCOOH.xyz)=3.77\n'
                   'pka> HCOOH.xyz 4\npka> base.xyz 1\n')
    cwd = os.getcwd()
    try:
        emb = Embedder(str(inp), stamp='pkaeq')
        emb.run()
    finally:
        os.chdir(cwd)

    acid, base = emb.objects
    assert acid.pka_data == ('HA -> A-', pytest.approx(10.0))
    # g = -10*n: G(BH+) - G(B) = -60 - (-50) = -10 (reference pka.py:245)
    assert base.pka_data == ('B -> BH+', pytest.approx(-10.0))

    log = (tmp_path / 'tscode_pkaeq.log').read_text()
    assert 'Equilibrium data' in log
    # dG_eq = 10 + (-10) = 0 -> K = 1
    assert 'K(gas phase, 298.15 K) = 1.0' in log
