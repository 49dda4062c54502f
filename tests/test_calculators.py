'''Calculator adapter tests — hermetic: input writers + output parsers
against canned files (the reference's parsing functions are pure,
SURVEY.md section 4).'''

import os

import numpy as np
import pytest

from tscode_tpu.calculators.common import EH_TO_KCAL, energy_grepper
from tscode_tpu.calculators.dispatch import dynamic_energy_thr
from tscode_tpu.calculators.gaussian import read_gaussian_out, write_gaussian_input
from tscode_tpu.calculators.mopac import read_mop_out, write_mopac_input
from tscode_tpu.calculators.orca import read_orca_property, write_orca_input
from tscode_tpu.calculators.xtb import _write_xtb_input, _xtb_flags, read_from_xtbtraj


# ------------------------------------------------------------------- xtb

def test_read_from_xtbtraj(tmp_path):
    traj = tmp_path / 'traj.xyz'
    traj.write_text(
        '3\n'
        ' energy: -5.070431 gnorm: 0.01 xtb: 6.5.1\n'
        'O 0.0 0.0 0.1\nH 0.7 0.0 -0.4\nH -0.7 0.0 -0.4\n'
        '3\n'
        ' energy: -5.070544 gnorm: 0.002 xtb: 6.5.1\n'
        'O 0.0 0.0 0.12\nH 0.71 0.0 -0.41\nH -0.71 0.0 -0.41\n')
    coords, energy = read_from_xtbtraj(str(traj))
    assert coords.shape == (3, 3)
    np.testing.assert_allclose(coords[1], [0.71, 0.0, -0.41])
    np.testing.assert_allclose(energy, -5.070544 * EH_TO_KCAL)


def test_energy_grepper(tmp_path):
    out = tmp_path / 'x.out'
    out.write_text('bla\n          | TOTAL ENERGY     -5.070544 Eh |\nbla\n')
    assert energy_grepper(str(out), 'TOTAL ENERGY', 3) == pytest.approx(-5.070544)


def test_xtb_input_writer(tmp_path):
    path = tmp_path / 'job.inp'
    _write_xtb_input(str(path), [(0, 5), (2, 7)], [2.2, None], None, None,
                     'GFN2-xTB', 500, 'traj.xyz', 'out.xyz', 1, None)
    text = path.read_text()
    assert 'distance: 1, 6, 2.2' in text           # 1-based indexing
    assert 'distance: 3, 8, auto' in text
    assert 'force constant=1' in text
    assert '$gfn\n   method=2' in text
    assert text.rstrip().endswith('$end')


def test_xtb_flags():
    flags = _xtb_flags('GFN-FF', True, 'loose', -1, 4, None)
    assert '--gfnff' in flags
    assert flags[flags.index('--chrg') + 1] == '-1'
    # GFN-FF gets implicit ch2cl2 when no solvent requested
    assert flags[flags.index('--alpb') + 1] == 'ch2cl2'
    flags2 = _xtb_flags('GFN2-xTB', True, 'tight', 0, 2, 'methanol')
    assert '--gbsa' in flags2


# ------------------------------------------------------------------ orca

def test_orca_roundtrip(tmp_path):
    inp = tmp_path / 'j.inp'
    coords = np.array([[0., 0., 0.], [1.1, 0., 0.]])
    write_orca_input(str(inp), coords, np.array([6, 8]), method='PM3',
                     constrained_indices=[(0, 1)], charge=0, procs=4,
                     maxiter=10)
    text = inp.read_text()
    assert text.startswith('! PM3 Opt')
    assert '{B 0 1 C}' in text
    assert '%pal nprocs 4 end' in text
    assert 'MaxIter 10' in text
    assert '*xyz 0 1' in text

    prop = tmp_path / 'j_property.txt'
    prop.write_text('stuff\n   SCF Energy:     -114.4380433\n')
    assert read_orca_property(str(prop)) == pytest.approx(-114.4380433)


# ----------------------------------------------------------------- mopac

_MOPAC_OUT = '''
 some header
 SCF FIELD WAS ACHIEVED

          FINAL HEAT OF FORMATION =        -57.79972 KCAL/MOL =    -241.83403 KJ/MOL

          CARTESIAN COORDINATES

     1         O          0.00000000    0.00000000    0.11779500
     2         H          0.75545000    0.00000000   -0.47118000
     3         H         -0.75545000    0.00000000   -0.47118000

'''


def test_read_mop_out(tmp_path):
    out = tmp_path / 'j.out'
    out.write_text(_MOPAC_OUT)
    coords, energy, ok = read_mop_out(str(out))
    assert ok
    assert energy == pytest.approx(-57.79972)
    assert coords.shape == (3, 3)
    np.testing.assert_allclose(coords[1], [0.75545, 0.0, -0.47118])


def test_mopac_input_writer_and_order(tmp_path):
    rng = np.random.default_rng(1)
    coords = rng.normal(size=(6, 3)) * 2
    atomnos = np.array([6, 1, 1, 8, 1, 7])
    path = tmp_path / 'j.mop'
    order = write_mopac_input(str(path), coords, atomnos, method='PM7',
                              constrained_indices=np.array([[0, 3]]))
    text = path.read_text()
    assert text.startswith('PM7\n')
    # constrained pair goes last, in internal coordinates (flag 0 on dist)
    assert sorted(order) == list(range(6))
    assert order[-2:] == [3, 0]
    lines = [l for l in text.splitlines() if l.startswith(' ')]
    assert len(lines) == 6
    assert ' 0 ' in lines[-1]          # frozen distance flag


# -------------------------------------------------------------- gaussian

_GAUSSIAN_OUT = '''
 some header
                         Standard orientation:
 ---------------------------------------------------------------------
 Center     Atomic      Atomic             Coordinates (Angstroms)
 Number     Number       Type             X           Y           Z
 ---------------------------------------------------------------------
      1          8           0        0.000000    0.000000    0.117795
      2          1           0        0.755450    0.000000   -0.471180
      3          1           0       -0.755450    0.000000   -0.471180
 ---------------------------------------------------------------------
 SCF Done:  E(RPM6) = -0.0819499  A.U. after  9 cycles
'''


def test_read_gaussian_out(tmp_path):
    out = tmp_path / 'j.log'
    out.write_text(_GAUSSIAN_OUT)
    coords, energy, ok = read_gaussian_out(str(out))
    assert ok
    assert coords.shape == (3, 3)
    np.testing.assert_allclose(coords[0], [0, 0, 0.117795])
    assert energy == pytest.approx(-0.0819499 * 627.5096080305927)


def test_gaussian_input_writer(tmp_path):
    path = tmp_path / 'j.com'
    coords = np.array([[0., 0., 0.], [1.1, 0., 0.]])
    write_gaussian_input(str(path), coords, np.array([6, 8]),
                         method='PM6', constrained_indices=[(0, 1)])
    text = path.read_text()
    assert 'opt=modredundant' in text
    assert 'B 1 2 F' in text            # 1-based


# ---------------------------------------------------------------- energy

def test_dynamic_energy_thr():
    rel = np.array([0.0, 1, 2, 30, 31, 32, 33, 34, 35, 36])
    # default threshold keeps 3/10 -> enough (>= 10%)
    assert dynamic_energy_thr(rel, 10) == 10
    rel2 = np.concatenate([[0.0], np.full(99, 50.0)])
    # only 1/100 under 10 -> widen until >= 10% survive
    thr = dynamic_energy_thr(rel2, 10)
    assert thr > 50


def test_gaussian_input_writes_charge(tmp_path):
    '''The reference swallows charge via **kwargs and always writes the
    neutral species (_gaussian.py:26-92) — fixed; pin the fix.'''
    from tscode_tpu.calculators.gaussian import write_gaussian_input

    path = tmp_path / 'job.com'
    write_gaussian_input(str(path), np.zeros((2, 3)), np.array([6, 8]),
                        charge=-1, constrained_indices=np.array([[0, 1]]))
    text = path.read_text()
    assert '-1 1' in text
    assert 'B 1 2 F' in text


def test_mopac_input_writes_charge(tmp_path):
    from tscode_tpu.calculators.mopac import write_mopac_input

    path = tmp_path / 'job.mop'
    write_mopac_input(str(path), np.zeros((2, 3)) + np.arange(2)[:, None],
                      np.array([6, 8]), charge=-1)
    assert 'CHARGE=-1' in path.read_text()


def test_crest_method_flag_mapping():
    from tscode_tpu.calculators.xtb import _CREST_METHOD_FLAGS

    assert _CREST_METHOD_FLAGS['GFN-FF'] == '--gfnff'
    assert _CREST_METHOD_FLAGS['GFN2-XTB'] == '--gfn2'
    assert _CREST_METHOD_FLAGS['GFN2-XTB//GFN-FF'] == '--gfn2//gfnff'


def test_xtb_single_point_converts_to_kcal(tmp_path, monkeypatch):
    '''opt=False single points return kcal/mol like every other energy
    of the module (the Eh leak is fixed).'''
    import tscode_tpu.calculators.xtb as xtb_mod

    def fake_check_call(cmd, **kw):
        return 0
    monkeypatch.setattr(xtb_mod.subprocess, 'check_call', fake_check_call)
    monkeypatch.setattr(xtb_mod, 'energy_grepper',
                        lambda *a, **k: -10.0)   # Eh
    coords, energy, ok = xtb_mod.xtb_opt(
        np.zeros((2, 3)) + np.arange(2)[:, None], np.array([1, 1]),
        opt=False, title='sp_test')
    assert energy == pytest.approx(-10.0 * 627.5096080305927)


def test_xtb_free_energy_parses_canned_ohess(tmp_path, monkeypatch):
    '''--ohess free energy: parse the TOTAL FREE ENERGY line from canned
    output, converted to kcal/mol (reference _xtb.py:440-512; its
    duplicate shadowed definition at :359 is a noted reference bug).'''
    import tscode_tpu.calculators.xtb as xtb_mod

    canned = (
        '          | TOTAL ENERGY              -26.425182959 Eh   |\n'
        '          | TOTAL ENTHALPY            -26.325000000 Eh   |\n'
        '          | TOTAL FREE ENERGY         -26.358221000 Eh   |\n')

    def fake_check_call(cmd, stdout=None, stderr=None, cwd=None, **kw):
        stdout.write(canned)
        return 0

    monkeypatch.setattr(xtb_mod.subprocess, 'check_call', fake_check_call)
    g = xtb_mod.xtb_get_free_energy(
        np.zeros((2, 3)) + np.arange(2)[:, None], np.array([1, 1]),
        title='fe_test')
    assert g == pytest.approx(-26.358221 * EH_TO_KCAL, rel=1e-9)


def test_parse_xtb_scoord(tmp_path):
    from tscode_tpu.calculators.xtb import parse_xtb_scoord

    path = tmp_path / 'scoord.1'
    path.write_text('$coord\n'
                    '  0.0  0.0  0.0  c\n'
                    '  1.88972612  0.0  0.0  h\n'
                    '$end\n')
    coords = parse_xtb_scoord(str(path))
    assert coords.shape == (2, 3)
    assert coords[1, 0] == pytest.approx(1.0, abs=1e-6)   # 1 Bohr -> ~0.529*... 


def test_opt_operator_threads_internal_constraints(tmp_path, monkeypatch):
    '''opt> passes internal constraints (same letter twice on one
    molecule) and their imposed distances into every conformer
    optimization (reference operators.py:237-239).'''
    import shutil

    seen = []

    def fake_optimize(coords, atomnos, calculator, constrained_indices=None,
                      constrained_distances=None, **kw):
        seen.append((None if constrained_indices is None
                     else np.asarray(constrained_indices).tolist(),
                     constrained_distances))
        return np.asarray(coords), -1.0, True

    monkeypatch.setattr('tscode_tpu.calculators.dispatch.optimize',
                        fake_optimize)

    from tscode_tpu.embedder import Embedder
    fix = os.path.join(os.path.dirname(__file__), 'fixtures')
    shutil.copy(os.path.join(fix, 'HCOOH.xyz'), tmp_path)
    shutil.copy(os.path.join(fix, 'C2H4.xyz'), tmp_path)
    inp = tmp_path / 'input.txt'
    inp.write_text('NOOPT CALC=XTB DIST(a=2.1)\n'
                   'opt> HCOOH.xyz 1a 4a 2\nC2H4.xyz 0\n')
    cwd = os.getcwd()
    try:
        Embedder(str(inp), stamp='optconstr')
    finally:
        os.chdir(cwd)

    assert seen, 'opt> never called optimize'
    idx, dists = seen[0]
    assert idx == [[1, 4]]
    assert dists == [2.1]


def test_mopac_shared_atom_constraints(tmp_path):
    '''3-atom shared constraint (central bound to two others, e.g. a
    chelotropic embed): the reference builds a valid mixed-coordinate
    input (_mopac.py:147-207) rather than raising.'''
    rng = np.random.default_rng(3)
    coords = rng.normal(size=(7, 3)) * 2.5
    atomnos = np.array([6, 1, 1, 8, 1, 7, 6])
    path = tmp_path / 'j.mop'
    order = write_mopac_input(
        str(path), coords, atomnos, method='PM7',
        constrained_indices=np.array([[0, 3], [3, 6]]))   # central = 3
    text = path.read_text()
    assert sorted(order) == list(range(7))
    # central + both partners come last: others[0] cartesian, then the
    # two internal rows with frozen distances (flag 0)
    assert set(order[-3:]) == {0, 3, 6}
    assert order[-2] == 3                     # central after others[0]
    lines = [l for l in text.splitlines() if l.startswith(' ')]
    assert len(lines) == 7
    frozen = [l for l in lines if l.split()[2] == '0']
    assert len(frozen) == 2
    # each internal row must reference the PREVIOUS constrained atom's
    # MOPAC number (row index in the atom list, 1-based)
    n_free = 4
    assert int(frozen[0].split()[7]) == n_free + 1
    assert int(frozen[1].split()[7]) == n_free + 2
    # dihedral wrap is per-row: both dihedrals in [0, 360)
    for l in frozen:
        assert 0.0 <= float(l.split()[5]) < 360.0


def test_mopac_unsupported_constraints_raise(tmp_path):
    rng = np.random.default_rng(4)
    coords = rng.normal(size=(8, 3)) * 2.5
    atomnos = np.array([6, 1, 1, 8, 1, 7, 6, 1])
    with pytest.raises(NotImplementedError):
        write_mopac_input(str(tmp_path / 'j.mop'), coords, atomnos,
                          constrained_indices=np.array([[0, 3], [0, 5],
                                                        [0, 6]]))


def test_gaussian_out_without_scf_is_failure(tmp_path):
    '''A geometry echo with no completed SCF (job died in cycle 1) must
    read back as a FAILED optimization, not ok=True with energy=None.'''
    out = tmp_path / 'j.log'
    out.write_text(_GAUSSIAN_OUT.replace('SCF Done', 'SCF NotDone'))
    coords, energy, ok = read_gaussian_out(str(out))
    assert not ok and energy is None
