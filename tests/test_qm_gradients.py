'''QM-force procedures: the `xtb --grad` gradient adapter and the
callback-driven NEB / dimer-saddle / bend drivers it feeds (the
reference's ASE-calculator capability, ase_manipulations.py:123-214,
382-526, 314-346, 683-866 — here without ASE).'''

import os

import numpy as np
import pytest

from tscode_tpu.calculators.gradients import (EH_TO_KCAL, GRAD_TO_KCAL_A,
                                              parse_turbomole_gradient)

FIX = os.path.join(os.path.dirname(__file__), 'fixtures')

CANNED_GRADIENT = '''$grad
  cycle =      1    SCF energy =    -5.00000000000   |dE/dxyz| =  0.010000
    0.00000000000000      0.00000000000000      0.00000000000000      C
    2.05980000000000      0.00000000000000      0.00000000000000      H
   -1.0000000000D-02     0.0000000000E+00     0.0000000000E+00
    1.0000000000e-02     0.0000000000E+00     0.0000000000E+00
  cycle =      2    SCF energy =    -5.07054444297   |dE/dxyz| =  0.000298
    0.00000000000000      0.00000000000000      0.00000000000000      C
    2.05980000000000      0.00000000000000      0.00000000000000      H
   -1.7219232925D-04     0.0000000000E+00     0.0000000000E+00
    1.7219232925e-04     0.0000000000E+00     0.0000000000E+00
$end
'''


def test_parse_turbomole_gradient_last_cycle():
    e, g = parse_turbomole_gradient(CANNED_GRADIENT, n_atoms=2)
    assert e == pytest.approx(-5.07054444297)
    assert g.shape == (2, 3)
    assert g[0, 0] == pytest.approx(-1.7219232925e-04)   # D-exponent
    assert g[1, 0] == pytest.approx(+1.7219232925e-04)
    assert np.all(g[:, 1:] == 0.0)


def test_parse_turbomole_gradient_truncated_raises():
    truncated = '\n'.join(CANNED_GRADIENT.splitlines()[:4])
    with pytest.raises(ValueError):
        parse_turbomole_gradient(truncated, n_atoms=2)


def test_xtb_gradient_canned_subprocess(monkeypatch):
    '''xtb --grad adapter: canned `gradient` file written by a fake
    subprocess; unit conversions Hartree->kcal/mol, Eh/Bohr->kcal/mol/A.'''
    import tscode_tpu.calculators.gradients as gradients_mod

    def fake_check_call(cmd, stdout=None, stderr=None, cwd=None, **kw):
        assert '--grad' in cmd
        with open(os.path.join(cwd, 'gradient'), 'w') as f:
            f.write(CANNED_GRADIENT)
        return 0

    monkeypatch.setattr(gradients_mod.subprocess, 'check_call',
                        fake_check_call)
    coords = np.array([[0.0, 0.0, 0.0], [1.09, 0.0, 0.0]])
    e, g = gradients_mod.xtb_gradient(coords, np.array([6, 1]))
    assert e == pytest.approx(-5.07054444297 * EH_TO_KCAL)
    assert g[0, 0] == pytest.approx(-1.7219232925e-04 * GRAD_TO_KCAL_A)


def _double_well_chain(chain):
    '''Analytic double-well callback: E = (x^2-1)^2 + y^2 + z^2 on a
    single particle; saddle at the origin with barrier 1.'''
    chain = np.asarray(chain)
    x = chain[:, 0, 0]
    y = chain[:, 0, 1]
    z = chain[:, 0, 2]
    e = (x ** 2 - 1) ** 2 + y ** 2 + z ** 2
    g = np.zeros_like(chain)
    g[:, 0, 0] = 4 * x * (x ** 2 - 1)
    g[:, 0, 1] = 2 * y
    g[:, 0, 2] = 2 * z
    return e, g


def test_run_neb_callback_finds_double_well_ts():
    from tscode_tpu.neb import run_neb_callback
    start = np.array([[-1.0, 0.0, 0.0]])
    end = np.array([[1.0, 0.0, 0.0]])
    chain, energies, ts = run_neb_callback(start, end, _double_well_chain,
                                           n_images=9, n_steps=200,
                                           climb_after=80)
    assert abs(chain[ts, 0, 0]) < 0.05                  # TS at x ~ 0
    assert energies[ts] == pytest.approx(1.0, abs=0.02)  # barrier ~ 1
    # endpoints never move
    np.testing.assert_allclose(chain[0], start)
    np.testing.assert_allclose(chain[-1], end)


def test_dimer_saddle_callback_converges_to_saddle():
    from tscode_tpu.saddle import dimer_saddle_callback

    def grad_fn(c):
        e, g = _double_well_chain(np.asarray(c)[None])
        return float(e[0]), g[0]

    coords = np.array([[0.35, 0.15, -0.1]])
    out, energy, done = dimer_saddle_callback(coords, grad_fn,
                                              n_steps=120, fmax=0.01)
    assert done
    assert np.allclose(out, 0.0, atol=0.05)
    assert energy == pytest.approx(1.0, abs=0.02)


def test_neb_operator_uses_qm_gradients_when_calc_present(tmp_path,
                                                          monkeypatch):
    '''End-to-end wiring: with CALC=XTB and a (faked) xtb binary, the
    neb> operator routes through run_neb_callback with per-image
    gradients; here the fake gradient is the internal FF's own, so the
    result must still be a sane MEP with written artifacts.'''
    import jax
    import jax.numpy as jnp

    import tscode_tpu.calculators.gradients as gradients_mod
    import tscode_tpu.settings as settings_mod
    from tscode_tpu.embedder import Embedder
    from tscode_tpu.ff import build_ff_params, ff_energy, params_to_device
    from tscode_tpu.io_xyz import read_xyz, write_xyz

    data = read_xyz(os.path.join(FIX, 'HCOOH.xyz'))
    base = data.atomcoords[0]
    prod = base.copy()
    prod[4] = base[1] + (base[4] - base[1]) * 0.4
    with open(tmp_path / 'ends.xyz', 'w') as f:
        write_xyz(base, data.atomnos, f, title='reagent')
        write_xyz(prod, data.atomnos, f, title='product')

    calls = {'n': 0}

    def fake_xtb_gradient(coords, atomnos, **kw):
        calls['n'] += 1
        from tscode_tpu.graphs import graphize
        params = params_to_device(build_ff_params(
            np.asarray(coords), atomnos, graphize(np.asarray(coords),
                                                  atomnos)))
        e_fn = lambda c: ff_energy(c[None], params)[0]
        e = float(e_fn(jnp.asarray(coords)))
        g = np.asarray(jax.grad(e_fn)(jnp.asarray(coords)))
        return e, g

    monkeypatch.setattr(settings_mod, 'XTB_AVAILABLE', True)
    monkeypatch.setattr(gradients_mod, 'xtb_gradient', fake_xtb_gradient)

    inp = tmp_path / 'input.txt'
    inp.write_text('NOOPT IMAGES=5 CALC=XTB\nneb> ends.xyz\n')
    cwd = os.getcwd()
    try:
        emb = Embedder(str(inp), stamp='nebqm')
        emb.run()
    finally:
        os.chdir(cwd)

    assert calls['n'] > 0, 'QM gradient callback was never invoked'
    assert (tmp_path / 'ends_MEP.xyz').exists()
    assert (tmp_path / 'ends_NEB_TS.xyz').exists()


def test_saddle_operator_uses_qm_gradients_when_calc_present(
        tmp_path, monkeypatch):
    '''saddle> wiring: with CALC=XTB and a faked xtb --grad, the dimer
    runs on the callback gradients and writes its artifact.'''
    import jax
    import jax.numpy as jnp

    import tscode_tpu.calculators.gradients as gradients_mod
    import tscode_tpu.settings as settings_mod
    from tscode_tpu.embedder import Embedder
    from tscode_tpu.ff import build_ff_params, ff_energy, params_to_device
    from tscode_tpu.io_xyz import read_xyz, write_xyz

    data = read_xyz(os.path.join(FIX, 'HCOOH.xyz'))
    with open(tmp_path / 'guess.xyz', 'w') as f:
        write_xyz(data.atomcoords[0] * 1.02, data.atomnos, f, title='g')

    calls = {'n': 0}

    def fake_xtb_gradient(coords, atomnos, **kw):
        calls['n'] += 1
        from tscode_tpu.graphs import graphize
        params = params_to_device(build_ff_params(
            np.asarray(coords), atomnos,
            graphize(np.asarray(coords), atomnos)))
        e_fn = lambda c: ff_energy(c[None], params)[0]
        return (float(e_fn(jnp.asarray(coords))),
                np.asarray(jax.grad(e_fn)(jnp.asarray(coords))))

    monkeypatch.setattr(settings_mod, 'XTB_AVAILABLE', True)
    monkeypatch.setattr(gradients_mod, 'xtb_gradient', fake_xtb_gradient)

    inp = tmp_path / 'input.txt'
    inp.write_text('NOOPT CALC=XTB\nsaddle> guess.xyz\n')
    cwd = os.getcwd()
    try:
        emb = Embedder(str(inp), stamp='sadqm')
        emb.run()
    finally:
        os.chdir(cwd)

    assert calls['n'] > 0, 'QM gradient callback was never invoked'
    assert (tmp_path / 'guess_saddle.xyz').exists()


def test_bend_with_gradient_fn_reaches_target():
    '''bend_molecule on an external-gradient surface (here: the FF's own
    gradient served through the callback) reaches the pivot target like
    the FF path does.'''
    import jax
    import jax.numpy as jnp

    from tscode_tpu.bending import bend_molecule
    from tscode_tpu.ff import build_ff_params, ff_energy, params_to_device
    from tscode_tpu.molecule import Molecule

    mol = Molecule(os.path.join(FIX, 'HCOOOH.xyz'),
                   reactive_indices=[0, 4])
    mol.compute_orbitals()
    from tscode_tpu.pivots import set_pivots
    set_pivots(mol)
    pivot = mol.pivots[0][0]
    start_len = float(np.linalg.norm(pivot.pivot))
    target = start_len - 0.3

    params = params_to_device(build_ff_params(
        mol.atomcoords[0], mol.atomnos, mol.graph))
    e_fn = lambda c: ff_energy(c[None], params)[0]

    def grad_fn(coords):
        c = jnp.asarray(coords)
        return float(e_fn(c)), np.asarray(jax.grad(e_fn)(c))

    bent = bend_molecule(mol, 0, pivot, target, gradient_fn=grad_fn)
    new_len = min(float(np.linalg.norm(p.pivot))
                  for p in bent.pivots[0])
    assert new_len < start_len - 0.05
