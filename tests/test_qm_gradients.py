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


def test_neb_operator_recovers_from_crashed_gradient(tmp_path,
                                                     monkeypatch):
    '''Fault-tolerance parity with the reference's neb_operator
    (reference operators.py:281,352-375): a gradient subprocess that
    dies MID-BAND must not lose the run — the band restarts from the
    periodic checkpoint and completes.'''
    import subprocess as sp

    import tscode_tpu.calculators.gradients as gradients_mod
    import tscode_tpu.settings as settings_mod
    from tscode_tpu.embedder import Embedder
    from tscode_tpu.io_xyz import read_xyz, write_xyz

    data = read_xyz(os.path.join(FIX, 'HCOOH.xyz'))
    base = data.atomcoords[0]
    # proton-transfer-like product: H4 relocated past the carbonyl O
    prod = base.copy()
    prod[4] = base[1] + (base[1] - base[0]) \
        / np.linalg.norm(base[1] - base[0]) * 0.97
    with open(tmp_path / 'ends.xyz', 'w') as f:
        write_xyz(base, data.atomnos, f, title='reagent')
        write_xyz(prod, data.atomnos, f, title='product')

    # analytic double-well for atom 4 between its end positions plus a
    # harmonic tether on the others: a REAL interior barrier, so the
    # band needs many gradient evaluations (the FF fake converges in
    # one step and the crash injection would never fire)
    A, B = base[4].copy(), prod[4].copy()
    d2 = float(np.sum((A - B) ** 2))
    calls = {'n': 0, 'crashes': 0}

    def flaky_xtb_gradient(coords, atomnos, **kw):
        calls['n'] += 1
        # die mid-band twice, well after the first checkpoints landed
        if calls['n'] in (40, 200):
            calls['crashes'] += 1
            raise sp.CalledProcessError(137, 'xtb')
        c = np.asarray(coords, float)
        da, db = c[4] - A, c[4] - B
        na2, nb2 = float(da @ da), float(db @ db)
        e = 10.0 * na2 * nb2 / d2 + 5.0 * float(np.sum((c[:4] - base[:4]) ** 2))
        g = np.zeros_like(c)
        g[4] = 20.0 * (da * nb2 + db * na2) / d2
        g[:4] = 10.0 * (c[:4] - base[:4])
        return e, g

    monkeypatch.setattr(settings_mod, 'XTB_AVAILABLE', True)
    monkeypatch.setattr(gradients_mod, 'xtb_gradient', flaky_xtb_gradient)

    inp = tmp_path / 'input.txt'
    inp.write_text('NOOPT IMAGES=5 CALC=XTB\nneb> ends.xyz\n')
    cwd = os.getcwd()
    try:
        emb = Embedder(str(inp), stamp='nebcrash')
        emb.run()
    finally:
        os.chdir(cwd)

    assert calls['crashes'] == 2, 'the crash injection never fired'
    assert (tmp_path / 'ends_MEP.xyz').exists()
    assert (tmp_path / 'ends_NEB_TS.xyz').exists()
    assert (tmp_path / 'ends_MEP_chkpt.xyz').exists()
    log = (tmp_path / 'tscode_nebcrash.log').read_text()
    assert 'restarting from checkpoint' in log
    # the checkpoint band is a readable ensemble of the run's images
    chk = read_xyz(str(tmp_path / 'ends_MEP_chkpt.xyz'))
    assert chk.atomcoords.shape[1:] == base.shape


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
    cache = {}

    def fake_xtb_gradient(coords, atomnos, **kw):
        calls['n'] += 1
        # build the FF surface ONCE: rebuilding graph+params per call
        # forced a fresh jax.grad compile per gradient and made this
        # test dominate the suite (~100 s)
        if 'grad_fn' not in cache:
            from tscode_tpu.graphs import graphize
            params = params_to_device(build_ff_params(
                np.asarray(coords), atomnos,
                graphize(np.asarray(coords), atomnos)))
            e_fn = lambda c: ff_energy(c[None], params)[0]
            cache['e_fn'] = jax.jit(e_fn)
            cache['grad_fn'] = jax.jit(jax.grad(e_fn))
        return (float(cache['e_fn'](jnp.asarray(coords))),
                np.asarray(cache['grad_fn'](jnp.asarray(coords))))

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


CANNED_ENGRAD = '''#
# Number of atoms
#
 2
#
# The current total energy in Eh
#
    -5.070544442970
#
# The current gradient in Eh/bohr
#
      -0.000172192329
       0.000000000000
       0.000000000000
       0.000172192329
       0.000000000000
       0.000000000000
#
# The atomic numbers and current coordinates in Bohr
#
   6     0.0000000    0.0000000    0.0000000
   1     2.0598000    0.0000000    0.0000000
'''


def test_parse_orca_engrad():
    from tscode_tpu.calculators.gradients import parse_orca_engrad
    e, g = parse_orca_engrad(CANNED_ENGRAD)
    assert e == pytest.approx(-5.070544442970)
    assert g.shape == (2, 3)
    assert g[0, 0] == pytest.approx(-1.7219232900e-04, rel=1e-6)
    # the trailing coordinate section must NOT leak into the gradient
    assert g[1, 0] == pytest.approx(+1.7219232900e-04, rel=1e-6)


def test_parse_orca_engrad_truncated_raises():
    from tscode_tpu.calculators.gradients import parse_orca_engrad
    head = '\n'.join(CANNED_ENGRAD.splitlines()[:12])
    with pytest.raises(ValueError):
        parse_orca_engrad(head)


CANNED_GAUSSIAN_FORCE = ''' Entering Gaussian System
 SCF Done:  E(RPM6) =  -5.07054444297     A.U. after    9 cycles
 ***** Axes restored to original set *****
 -------------------------------------------------------------------
 Center     Atomic                   Forces (Hartrees/Bohr)
 Number     Number              X              Y              Z
 -------------------------------------------------------------------
      1        6           0.000172192    0.000000000    0.000000000
      2        1          -0.000172192    0.000000000    0.000000000
 -------------------------------------------------------------------
 Cartesian Forces:  Max     0.000172192 RMS     0.000099300
'''


def test_parse_gaussian_forces():
    from tscode_tpu.calculators.gradients import parse_gaussian_forces
    e, g = parse_gaussian_forces(CANNED_GAUSSIAN_FORCE, n_atoms=2)
    assert e == pytest.approx(-5.07054444297)
    # gradient = -force
    assert g[0, 0] == pytest.approx(-0.000172192)
    assert g[1, 0] == pytest.approx(+0.000172192)


def test_parse_gaussian_forces_semiempirical_energy_line():
    from tscode_tpu.calculators.gradients import parse_gaussian_forces
    text = CANNED_GAUSSIAN_FORCE.replace(
        ' SCF Done:  E(RPM6) =  -5.07054444297     A.U. after    9 cycles',
        ' Energy=   -0.123456789 NIter=  12.')
    e, g = parse_gaussian_forces(text, n_atoms=2)
    assert e == pytest.approx(-0.123456789)


CANNED_MOPAC_GRAD = '''          FINAL HEAT OF FORMATION =        -12.34567 KCAL/MOL =     -51.654 KJ/MOL


          FINAL  POINT  AND  DERIVATIVES

   PARAMETER     ATOM    TYPE            VALUE       GRADIENT
      1          1  C    CARTESIAN X    -0.123456     1.234567  KCAL/ANGSTROM
      2          1  C    CARTESIAN Y     0.000000     0.000000  KCAL/ANGSTROM
      3          1  C    CARTESIAN Z     0.000000     0.000000  KCAL/ANGSTROM
      4          2  H    CARTESIAN X     1.089000    -1.234567  KCAL/ANGSTROM
      5          2  H    CARTESIAN Y     0.000000     0.000000  KCAL/ANGSTROM
      6          2  H    CARTESIAN Z     0.000000     0.000000  KCAL/ANGSTROM

'''


def test_parse_mopac_gradients():
    from tscode_tpu.calculators.gradients import parse_mopac_gradients
    e, g = parse_mopac_gradients(CANNED_MOPAC_GRAD)
    assert e == pytest.approx(-12.34567)
    assert g.shape == (2, 3)
    assert g[0, 0] == pytest.approx(1.234567)
    assert g[1, 0] == pytest.approx(-1.234567)


def test_mopac_gradient_emits_solvent_keyword(monkeypatch):
    '''A solvated run's NEB/SADDLE gradients must carry the same EPS=
    solvation keyword as its optimization stages (advisor r3 finding:
    the .mop written by mopac_gradient silently dropped the solvent).'''
    import tscode_tpu.calculators.gradients as gradients_mod
    written = {}

    def fake_check_call(cmd, stdout=None, stderr=None, cwd=None, **kw):
        with open(os.path.join(cwd, cmd[-1])) as f:
            written['mop'] = f.read()
        with open(os.path.join(cwd, 'grad_sp.out'), 'w') as f:
            f.write(CANNED_MOPAC_GRAD)
        return 0

    monkeypatch.setattr(gradients_mod.subprocess, 'check_call',
                        fake_check_call)
    coords = np.array([[0.0, 0.0, 0.0], [1.09, 0.0, 0.0]])
    e, _ = gradients_mod.mopac_gradient(coords, np.array([6, 1]),
                                        solvent='water')
    keyword_line = written['mop'].splitlines()[0]
    assert 'EPS=' in keyword_line
    assert e == pytest.approx(-12.34567)
    # gas phase stays clean
    _ = gradients_mod.mopac_gradient(coords, np.array([6, 1]))
    assert 'EPS=' not in written['mop'].splitlines()[0]


def test_orca_gradient_canned_subprocess(monkeypatch):
    '''ORCA EnGrad adapter end-to-end with a fake orca binary: the
    input carries `! <method> EnGrad` and the .engrad file is parsed
    with Eh->kcal/mol and Eh/Bohr->kcal/mol/A conversions.'''
    import tscode_tpu.calculators.gradients as gradients_mod

    seen = {}

    def fake_check_call(cmd, stdout=None, stderr=None, cwd=None, **kw):
        with open(os.path.join(cwd, cmd[1])) as f:
            seen['input'] = f.read()
        title = cmd[1].rsplit('.', 1)[0]
        with open(os.path.join(cwd, f'{title}.engrad'), 'w') as f:
            f.write(CANNED_ENGRAD)
        return 0

    monkeypatch.setattr(gradients_mod.subprocess, 'check_call',
                        fake_check_call)
    coords = np.array([[0.0, 0.0, 0.0], [1.09, 0.0, 0.0]])
    e, g = gradients_mod.orca_gradient(coords, np.array([6, 1]),
                                       method='PM3')
    assert 'EnGrad' in seen['input'].splitlines()[0]
    assert e == pytest.approx(-5.070544442970 * EH_TO_KCAL)
    assert g[0, 0] == pytest.approx(-1.7219232900e-04 * GRAD_TO_KCAL_A,
                                    rel=1e-6)


def test_gaussian_gradient_canned_subprocess(monkeypatch):
    '''Gaussian force adapter end-to-end with a fake g16: the route is
    `# force <method>` and forces are negated into gradients.'''
    import tscode_tpu.calculators.gradients as gradients_mod

    seen = {}

    def fake_check_call(cmd, stdout=None, stderr=None, cwd=None, **kw):
        with open(os.path.join(cwd, cmd[1])) as f:
            seen['input'] = f.read()
        title = cmd[1].rsplit('.', 1)[0]
        with open(os.path.join(cwd, f'{title}.log'), 'w') as f:
            f.write(CANNED_GAUSSIAN_FORCE)
        return 0

    monkeypatch.setattr(gradients_mod.subprocess, 'check_call',
                        fake_check_call)
    coords = np.array([[0.0, 0.0, 0.0], [1.09, 0.0, 0.0]])
    e, g = gradients_mod.gaussian_gradient(coords, np.array([6, 1]),
                                           method='PM6')
    assert '# force PM6' in seen['input']
    assert e == pytest.approx(-5.07054444297 * EH_TO_KCAL)
    assert g[0, 0] == pytest.approx(-0.000172192 * GRAD_TO_KCAL_A)


def test_make_chain_gradient_fn_dispatches_on_calculator(monkeypatch):
    '''The chain-gradient builder follows the run calculator like the
    reference's get_ase_calc (ase_manipulations.py:123-214).'''
    import tscode_tpu.calculators.gradients as gradients_mod

    hits = []

    def fake(tag):
        def f(coords, atomnos, **kw):
            hits.append(tag)
            return 0.0, np.zeros((len(coords), 3))
        return f

    monkeypatch.setattr(gradients_mod, 'orca_gradient', fake('ORCA'))
    monkeypatch.setattr(gradients_mod, 'gaussian_gradient',
                        fake('GAUSSIAN'))
    monkeypatch.setattr(gradients_mod, 'mopac_gradient', fake('MOPAC'))

    chain = np.zeros((2, 3, 3))
    atomnos = np.array([6, 1, 1])
    for calc in ('ORCA', 'GAUSSIAN', 'MOPAC'):
        fn = gradients_mod.make_chain_gradient_fn(atomnos, calculator=calc)
        fn(chain)
    assert hits == ['ORCA', 'ORCA', 'GAUSSIAN', 'GAUSSIAN',
                    'MOPAC', 'MOPAC']

    with pytest.raises(NotImplementedError):
        gradients_mod.make_chain_gradient_fn(atomnos, calculator='NWCHEM')


def test_saddle_keyword_stage_uses_qm_gradients(monkeypatch):
    '''The SADDLE-keyword pipeline stage routes through the QM gradient
    callback when a calculator is configured (reference saddle_refining,
    embedder.py:1985-2051) instead of the internal-FF dimer.'''
    import types

    from tscode_tpu.embedder import RunEmbedding

    calls = {'n': 0}

    def fake_grad_fn(coords):
        calls['n'] += 1
        return 1.0, np.zeros((len(coords), 3))

    import tscode_tpu.calculators.gradients as gradients_mod
    monkeypatch.setattr(gradients_mod, 'make_gradient_fn',
                        lambda *a, **k: fake_grad_fn)

    # minimal embedder stub carrying just what saddle_refining reads
    emb = RunEmbedding.__new__(RunEmbedding)
    emb.options = types.SimpleNamespace(
        calculator='XTB', theory_level='GFN2-xTB', solvent=None,
        charge=0)
    emb.procs = 1
    emb.structures = np.zeros((2, 3, 3))
    emb.energies = np.zeros(2)
    emb.atomnos = np.array([6, 1, 1])
    emb.logs = []
    emb.log = lambda s='', p=True: emb.logs.append(str(s))
    emb.similarity_refining = lambda *a, **k: None
    emb.write_structures = lambda *a, **k: None
    emb.timings = {}

    emb.saddle_refining()
    assert calls['n'] > 0, 'SADDLE stage never called the QM callback'
    assert any('via XTB' in s for s in emb.logs)
