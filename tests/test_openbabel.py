'''OpenBabel FF adapter (calculators/openbabel.py) — canned-output
tests, mirroring the reference's _openbabel.py:27-148 contract. No
obabel binary or bindings exist in this image; the CLI path is
exercised through a faked subprocess like the other adapters.'''

import os

import numpy as np
import pytest

import tscode_tpu.calculators.openbabel as ob_mod
from tscode_tpu.errors import InputError

FIX = os.path.join(os.path.dirname(__file__), 'fixtures')


def test_method_validation():
    with pytest.raises(InputError, match='force fields'):
        ob_mod.openbabel_opt(np.zeros((2, 3)), np.array([6, 6]),
                             method='B3LYP')


def test_probe_openbabel_fails_fast(monkeypatch):
    '''The FFCALC=OB refine stage probes availability ONCE up front: a
    systemic failure must raise a clear InputError, not silently mask
    out every structure (advisor r3 finding).'''
    import shutil
    monkeypatch.setattr(ob_mod, '_have_ob_bindings', lambda: False)
    monkeypatch.setattr(shutil, 'which', lambda _: None)
    with pytest.raises(InputError, match='FFCALC=OB needs OpenBabel'):
        ob_mod.probe_openbabel('UFF')
    with pytest.raises(InputError, match='force fields'):
        ob_mod.probe_openbabel('GFN-FF')
    monkeypatch.setattr(ob_mod, '_have_ob_bindings', lambda: True)
    ob_mod.probe_openbabel('UFF')    # available -> no raise


def test_stepwise_distance_walk_reaches_target():
    '''The walk re-optimizes after EVERY 0.2 A step (the reference's
    recursion exists to prevent teleport-induced scrambling) and lands
    exactly on the target.'''
    structure = np.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0]])
    opt_calls = []

    def fake_opt(s):
        opt_calls.append(np.linalg.norm(s[1] - s[0]))
        return s

    out = ob_mod._stepwise_distance_walk(structure, [(0, 1)], [1.5],
                                         fake_opt)
    assert np.linalg.norm(out[1] - out[0]) == pytest.approx(1.5)
    # first atom never moves (only the second walks)
    np.testing.assert_array_equal(out[0], structure[0])
    # one intermediate optimization per 0.2 A of approach (3.0 -> 1.5
    # is 1.5 A; the loop stops once within 0.2 A of the target)
    assert len(opt_calls) >= 6
    assert all(b <= a + 1e-9 for a, b in zip(opt_calls, opt_calls[1:]))


def test_cli_path_canned(monkeypatch):
    from tscode_tpu.io_xyz import read_xyz, write_xyz

    mol = read_xyz(os.path.join(FIX, 'HCOOH.xyz'))
    shifted = mol.atomcoords[0] + 0.01

    def fake_check_call(cmd, stdout=None, stderr=None, cwd=None, **kw):
        assert '--minimize' in cmd and '--ff' in cmd
        outname = cmd[cmd.index('-O') + 1]
        with open(outname, 'w') as f:
            write_xyz(shifted, mol.atomnos, f, title='minimized')
        return 0

    monkeypatch.setattr(ob_mod, '_have_ob_bindings', lambda: False)
    monkeypatch.setattr(ob_mod.subprocess, 'check_call', fake_check_call)
    coords, energy, success = ob_mod.openbabel_opt(
        mol.atomcoords[0], mol.atomnos, method='UFF')
    np.testing.assert_allclose(coords, shifted, atol=1e-5)
    assert energy is None and success


def test_cli_path_rejects_constraints(monkeypatch):
    monkeypatch.setattr(ob_mod, '_have_ob_bindings', lambda: False)
    with pytest.raises(InputError, match='bindings'):
        ob_mod.openbabel_opt(np.zeros((2, 3)), np.array([6, 6]),
                             constrained_indices=[(0, 1)])


def test_scramble_check_flags_broken_geometry(monkeypatch):
    '''check=True: an optimizer output that tears the molecule apart is
    reported as unsuccessful.'''
    from tscode_tpu.graphs import graphize
    from tscode_tpu.io_xyz import read_xyz, write_xyz

    mol = read_xyz(os.path.join(FIX, 'HCOOH.xyz'))
    graph = graphize(mol.atomcoords[0], mol.atomnos)
    exploded = mol.atomcoords[0] * 3.0

    def fake_check_call(cmd, stdout=None, stderr=None, cwd=None, **kw):
        outname = cmd[cmd.index('-O') + 1]
        with open(outname, 'w') as f:
            write_xyz(exploded, mol.atomnos, f, title='exploded')
        return 0

    monkeypatch.setattr(ob_mod, '_have_ob_bindings', lambda: False)
    monkeypatch.setattr(ob_mod.subprocess, 'check_call', fake_check_call)
    _, _, success = ob_mod.openbabel_opt(
        mol.atomcoords[0], mol.atomnos, check=True, graphs=[graph])
    assert not success


def test_ffcalc_ob_routes_force_field_refining(tmp_path, monkeypatch):
    '''FFCALC=OB wires force_field_refining through openbabel_opt
    (the reference left its adapter disconnected, _openbabel.py:18-21 —
    here the keyword reaches the pipeline).'''
    import shutil

    from tscode_tpu.embedder import Embedder

    calls = {'n': 0}

    def fake_ob_opt(coords, atomnos, constrained_indices=None,
                    constrained_distances=None, method='UFF', **kw):
        calls['n'] += 1
        assert method == 'UFF', 'FFCALC=OB must remap the FF level'
        coords = np.asarray(coords, dtype=float)
        out = coords * 0.999 + coords.mean(axis=0) * 0.001
        return out, float(np.sum(out ** 2)) * 0.01, True

    def fake_xtb_opt(coords, atomnos, **kw):
        coords = np.asarray(coords, dtype=float)
        return coords, float(np.sum(coords ** 2)) * 0.01, True

    monkeypatch.setattr('tscode_tpu.calculators.openbabel.openbabel_opt',
                        fake_ob_opt)
    monkeypatch.setattr('tscode_tpu.calculators.xtb.xtb_opt',
                        fake_xtb_opt)
    # satisfy the stage's fail-fast availability probe (no OpenBabel in
    # the test image; the opt itself is faked above)
    monkeypatch.setattr(
        'tscode_tpu.calculators.openbabel._have_ob_bindings', lambda: True)

    fix = os.path.join(os.path.dirname(__file__), 'fixtures')
    for name in ('C2H4.xyz', 'CH3Cl.xyz'):
        shutil.copy(os.path.join(fix, name), tmp_path)
    inp = tmp_path / 'input.txt'
    inp.write_text('CALC=XTB FFCALC=OB FFOPT=ON ONLYREFINED KCAL=50\n'
                   'C2H4.xyz 0\nCH3Cl.xyz 0\n')
    cwd = os.getcwd()
    try:
        emb = Embedder(str(inp), stamp='ob_e2e')
        assert emb.options.ff_calc == 'OB'
        assert emb.options.ff_level == 'UFF'
        run = emb.run()
    finally:
        os.chdir(cwd)

    assert calls['n'] > 0, 'openbabel_opt was never reached'
    assert len(run.structures) > 0
    log = (tmp_path / 'tscode_ob_e2e.log').read_text()
    assert 'via OB' in log
