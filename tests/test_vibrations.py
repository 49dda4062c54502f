'''Vibrational analysis, RRHO thermochemistry, IDPP interpolation and
spacing adjustment — analytic anchors plus FF-based sanity checks.

Reference surface covered: ase_vib (ase_manipulations.py:348-380),
xtb --ohess free energies (_xtb.py:440-512), interpolate_structures
(mep_relaxer.py:155-200), ase_adjust_spacings
(ase_manipulations.py:216-312).'''

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tscode_tpu.pt import MASSES
from tscode_tpu.vibrations import (_FREQ_FACTOR, ff_free_energy, frequencies,
                                   frequencies_batch, thermochemistry)

FIX = os.path.join(os.path.dirname(__file__), 'fixtures')


def _diatomic_energy(k=100.0, d0=1.27):
    def efn(c):
        d = jnp.linalg.norm(c[0] - c[1])
        return k * (d - d0) ** 2
    return efn


def test_diatomic_frequency_analytic():
    '''E = K (d-d0)^2 has one mode at _FREQ_FACTOR*sqrt(2K/mu).'''
    k = 100.0
    coords = np.array([[0.0, 0, 0], [1.27, 0, 0]])
    atomnos = np.array([1, 17])
    freqs, n_imag = frequencies(coords, atomnos, _diatomic_energy(k))
    mu = MASSES[1] * MASSES[17] / (MASSES[1] + MASSES[17])
    expected = _FREQ_FACTOR * np.sqrt(2 * k / mu)
    real = freqs[np.abs(freqs) > 1]
    assert n_imag == 0
    assert len(real) == 1
    assert real[0] == pytest.approx(expected, rel=1e-8)


def test_stretched_diatomic_has_imaginary_mode():
    '''Past the inflection of a quartic double well the mode is imaginary.'''
    def efn(c):
        d = jnp.linalg.norm(c[0] - c[1])
        return -50.0 * (d - 1.27) ** 2          # local maximum along d
    freqs, n_imag = frequencies(np.array([[0.0, 0, 0], [1.27, 0, 0]]),
                                np.array([1, 17]), efn)
    assert n_imag == 1
    assert freqs.min() < -100


def test_sackur_tetrode_argon():
    '''Monatomic ideal gas at 298.15 K / 1 atm: S = 36.98 cal/mol/K.'''
    th = thermochemistry(np.array([]), np.array([18]),
                         np.array([[0.0, 0, 0]]))
    assert th['s'] * 1000 == pytest.approx(36.98, abs=0.02)
    assert th['e_rot'] == 0.0
    # enthalpy correction for a monatomic gas is 5/2 RT
    assert th['h_corr'] == pytest.approx(2.5 * 0.0019872 * 298.15, rel=1e-3)


def test_ff_minimum_has_no_imaginary_modes():
    '''A structure relaxed on the internal FF is a true minimum: 3N-6
    positive modes, none imaginary.'''
    from tscode_tpu.ff import build_ff_params, ff_energy, params_to_device
    from tscode_tpu.graphs import graphize
    from tscode_tpu.io_xyz import read_xyz
    from tscode_tpu.optimizers import fire_minimize

    # CH3Cl: no internal torsion, so every one of the 3N-6 modes has a
    # restoring force in the dihedral-free harmonic FF
    data = read_xyz(os.path.join(FIX, 'CH3Cl.xyz'))
    coords, atomnos = data.atomcoords[0], data.atomnos
    params = params_to_device(build_ff_params(
        coords, atomnos, graphize(coords, atomnos)))
    efn = lambda c: ff_energy(c, params)

    relaxed, _, _ = fire_minimize(coords, efn, n_steps=400, fmax=1e-4)
    freqs, n_imag = frequencies(relaxed, atomnos, efn)
    assert n_imag == 0
    n = len(atomnos)
    assert np.count_nonzero(freqs > 1) == 3 * n - 6


def test_frequencies_batch_matches_single():
    coords = np.array([[0.0, 0, 0], [1.27, 0, 0]])
    batch = np.stack([coords, coords * 1.0])
    freqs_b, n_imag_b = frequencies_batch(batch, np.array([1, 17]),
                                          _diatomic_energy())
    freqs_s, _ = frequencies(coords, np.array([1, 17]), _diatomic_energy())
    assert np.allclose(freqs_b[0], freqs_s, atol=1e-6)
    assert np.allclose(freqs_b[0], freqs_b[1])
    assert (n_imag_b == 0).all()


def test_gibbs_below_enthalpy():
    '''G = H - TS with positive S: g_corr < h_corr, and ZPE included.'''
    coords = np.array([[0.0, 0, 0], [1.27, 0, 0]])
    atomnos = np.array([1, 17])
    g, n_imag = ff_free_energy(coords, atomnos, _diatomic_energy())
    th = thermochemistry(*frequencies(coords, atomnos, _diatomic_energy())[:1],
                         atomnos, coords)
    assert th['g_corr'] < th['h_corr']
    assert th['zpe'] > 0
    assert n_imag == 0
    # electronic energy at the minimum is 0, so G == g_corr
    assert g == pytest.approx(th['g_corr'], abs=1e-9)


# ---------------------------------------------------------------- IDPP

def test_interpolate_linear_contract():
    from tscode_tpu.neb import interpolate_structures
    start = np.zeros((3, 3))
    end = np.ones((3, 3))
    chain = interpolate_structures(np.stack([start, end]), np.array([6, 6, 6]),
                                   7, method='linear')
    assert chain.shape == (7, 3, 3)
    assert np.allclose(chain[0], start) and np.allclose(chain[-1], end)
    assert np.allclose(chain[3], 0.5)


def test_idpp_preserves_endpoints_and_beats_linear():
    '''IDPP must keep endpoints fixed and lower the pairwise-distance
    objective of the interior images vs the straight-line chain.'''
    from tscode_tpu.neb import (_idpp_energy, idpp_interpolate,
                                interpolate_chain)
    rng = np.random.default_rng(3)
    start = rng.normal(size=(6, 3)) * 2.0
    # rotate the structure by 120 degrees — linear interpolation shrinks it
    theta = 2 * np.pi / 3
    rot = np.array([[np.cos(theta), -np.sin(theta), 0],
                    [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
    end = start @ rot.T

    n_im = 9
    linear = interpolate_chain(start, end, n_im)
    idpp = idpp_interpolate(start, end, n_im)

    assert np.allclose(idpp[0], start, atol=1e-10)
    assert np.allclose(idpp[-1], end, atol=1e-10)

    def dmat(c):
        return np.linalg.norm(c[:, None] - c[None, :], axis=-1)

    d0, d1 = dmat(start), dmat(end)
    t = np.linspace(0, 1, n_im)[:, None, None]
    targets = (1 - t) * d0 + t * d1
    weights = 1.0 / np.maximum(targets, 1e-2) ** 4
    weights[:, np.arange(6), np.arange(6)] = 0.0

    obj = lambda c: float(np.sum(np.asarray(_idpp_energy(
        jnp.asarray(c), jnp.asarray(targets), jnp.asarray(weights)))))
    assert obj(idpp) < 0.5 * obj(linear)


def test_interpolate_structures_multi_mapping():
    '''m=3 structures map proportionally into the n-image chain.'''
    from tscode_tpu.neb import interpolate_structures
    s = np.stack([np.zeros((2, 3)), np.full((2, 3), 0.7),
                  np.ones((2, 3))])
    chain = interpolate_structures(s, np.array([6, 6]), 9, method='linear')
    assert chain.shape == (9, 2, 3)
    assert np.allclose(chain[0], s[0])
    assert np.allclose(chain[3], s[1])      # round(1 * 9/3) = 3
    assert np.allclose(chain[-1], s[2])
    # interiors strictly between their endpoints
    assert np.all(chain[1] > 0) and np.all(chain[1] < 0.7)


# ------------------------------------------------- adjust_spacings

def test_adjust_spacings_batch(tmp_path):
    '''Springs pull the constrained pair to the imposed DIST while the
    FF keeps both molecules intact (no scrambling).'''
    import shutil

    from tscode_tpu.embedder import Embedder
    from tscode_tpu.optimization import adjust_spacings_batch

    for name in ('C2H4.xyz', 'CH3Cl.xyz'):
        shutil.copy(os.path.join(FIX, name), tmp_path)
    inp = tmp_path / 'input.txt'
    inp.write_text('NOOPT DIST(a=2.8)\nC2H4.xyz 0a\nCH3Cl.xyz 0a\n')
    cwd = os.getcwd()
    try:
        emb = Embedder(str(inp), stamp='adjspc')
        n1 = emb.objects[0].atomcoords.shape[1]
        pose = np.concatenate([
            emb.objects[0].atomcoords[0],
            emb.objects[1].atomcoords[0] + np.array([6.0, 0, 0])])
        atomnos = np.concatenate([emb.objects[0].atomnos,
                                  emb.objects[1].atomnos])
        out, energies, success = adjust_spacings_batch(
            emb, pose[None], atomnos)
    finally:
        os.chdir(cwd)

    pair = list(emb.pairings_table.values())[0]
    d = np.linalg.norm(out[0, pair[0]] - out[0, pair[1]])
    assert d == pytest.approx(2.8, abs=0.1)
    assert success.all()
    assert np.isfinite(energies).all()


def test_adjust_spacings_scramble_path_returns_false(tmp_path):
    '''scramble_check must flag (not crash on) poses that formed a new
    bond during the spring-biased relax.'''
    from tscode_tpu.graphs import graphize
    from tscode_tpu.io_xyz import read_xyz
    from tscode_tpu.utils import scramble_check

    data = read_xyz(os.path.join(FIX, 'C2H4.xyz'))
    c1, n1 = data.atomcoords[0], data.atomnos
    g1 = graphize(c1, n1)
    # second fragment rammed into the first: new cross-fragment bonds
    pose = np.concatenate([c1, c1 + np.array([0.9, 0.0, 0.0])])
    nos = np.concatenate([n1, n1])
    excluded = np.array([[0, 6]]).ravel()      # the constrained pair
    ok = scramble_check(pose, nos, excluded, [g1, g1], max_newbonds=0)
    assert ok is False or ok == False          # noqa: E712 — flags, no crash


def test_frequencies_from_gradients_matches_analytic():
    '''The finite-difference-of-gradients path (external-calculator
    frequencies, reference ase_vib analog) must agree with the analytic
    FF Hessian on the same surface.'''
    import jax
    import jax.numpy as jnp

    from tscode_tpu.ff import build_ff_params, ff_energy, params_to_device
    from tscode_tpu.graphs import graphize
    from tscode_tpu.io_xyz import read_xyz
    from tscode_tpu.optimizers import fire_minimize
    from tscode_tpu.vibrations import (frequencies,
                                       frequencies_from_gradients)

    fix = os.path.join(os.path.dirname(__file__), 'fixtures')
    mol = read_xyz(os.path.join(fix, 'HCOOH.xyz'))
    graph = graphize(mol.atomcoords[0], mol.atomnos)
    params = params_to_device(build_ff_params(
        mol.atomcoords[0], mol.atomnos, graph))

    def e_fn(c):
        return ff_energy(c[None], params)[0]

    # relax to a minimum first so both spectra are clean
    coords, _, _ = fire_minimize(mol.atomcoords[0], ff_energy,
                                 energy_args=(params,), n_steps=2000,
                                 fmax=1e-4)

    grad_jax = jax.grad(e_fn)

    def gradient_fn(c):
        cj = jnp.asarray(c)
        return float(e_fn(cj)), np.asarray(grad_jax(cj))

    ref, n_imag_ref = frequencies(coords, mol.atomnos, e_fn)
    got, n_imag_got = frequencies_from_gradients(coords, mol.atomnos,
                                                 gradient_fn)
    # finite differences vs analytic: real modes agree to a fraction of
    # a wavenumber. The FF has no torsional stiffness (bonds + angles +
    # repulsion only), so its near-zero torsion modes sit below the FD
    # noise floor — compare the meaningful spectrum (> 20 cm^-1) and
    # bound the rest.
    ref_s, got_s = np.sort(ref), np.sort(got)
    real = ref_s > 20.0
    np.testing.assert_allclose(got_s[real], ref_s[real],
                               atol=0.5, rtol=0.005)
    assert np.all(np.abs(got_s[~real]) < 20.0)
    assert n_imag_got == n_imag_ref == 0


def test_detect_symmetry_number():
    '''Point-group sigma detection across the common cases.'''
    from tscode_tpu.vibrations import detect_symmetry_number

    # water, C2v -> sigma 2
    water = np.array([[0.0, 0.0, 0.117], [0.0, 0.757, -0.469],
                      [0.0, -0.757, -0.469]])
    assert detect_symmetry_number(water, np.array([8, 1, 1])) == 2

    # CO2, D-inf-h -> 2; HCN, C-inf-v -> 1
    co2 = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.16], [0.0, 0.0, -1.16]])
    assert detect_symmetry_number(co2, np.array([6, 8, 8])) == 2
    hcn = np.array([[0.0, 0.0, -1.064], [0.0, 0.0, 0.0],
                    [0.0, 0.0, 1.156]])
    assert detect_symmetry_number(hcn, np.array([1, 6, 7])) == 1

    # ammonia, C3v -> 3
    nh3 = np.array([[0.0, 0.0, 0.12],
                    [0.94, 0.0, -0.27],
                    [-0.47, 0.81, -0.27],
                    [-0.47, -0.81, -0.27]])
    assert detect_symmetry_number(nh3, np.array([7, 1, 1, 1])) == 3

    # benzene skeleton, D6h -> 12
    ring = np.array([[1.39 * np.cos(np.radians(60 * k)),
                      1.39 * np.sin(np.radians(60 * k)), 0.0]
                     for k in range(6)])
    hs = ring * (2.47 / 1.39)
    benzene = np.concatenate([ring, hs])
    nos = np.array([6] * 6 + [1] * 6)
    assert detect_symmetry_number(benzene, nos) == 12

    # chiral-ish asymmetric blob -> 1
    blob = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                     [0.0, 1.3, 0.0], [0.0, 0.0, 1.7]])
    assert detect_symmetry_number(blob, np.array([6, 1, 8, 17])) == 1


def test_thermochemistry_sigma_lowers_rot_entropy():
    '''sigma=2 removes R*ln(2) from the rotational entropy: G rises by
    ~RT ln 2 = 0.41 kcal/mol at 298 K vs a sigma-blind result.'''
    from tscode_tpu.vibrations import thermochemistry

    water = np.array([[0.0, 0.0, 0.117], [0.0, 0.757, -0.469],
                      [0.0, -0.757, -0.469]])
    nos = np.array([8, 1, 1])
    freqs = np.array([1595.0, 3657.0, 3756.0])
    auto = thermochemistry(freqs, nos, water)             # detects 2
    blind = thermochemistry(freqs, nos, water, symmetry_number=1)
    dg = auto['g_corr'] - blind['g_corr']
    assert dg == pytest.approx(0.41, abs=0.02)


def test_frequencies_self_route_without_ambient_x64():
    '''On an f32 backend (no ambient x64, like the TPU), frequencies
    must scope itself to CPU-x64 instead of raising — and match the
    ambient-x64 result exactly (same dtype path either way).'''
    import jax

    coords = np.array([[0.0, 0, 0], [1.27, 0, 0]])
    atomnos = np.array([1, 17])
    efn = _diatomic_energy()
    want, want_imag = frequencies(coords, atomnos, efn)

    jax.config.update('jax_enable_x64', False)
    try:
        got, got_imag = frequencies(coords, atomnos, efn)
        gotb, _ = frequencies_batch(coords[None], atomnos, efn)
        g_f32, n_f32 = ff_free_energy(coords, atomnos, efn)
    finally:
        jax.config.update('jax_enable_x64', True)

    assert got.dtype == np.float64
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert got_imag == want_imag == 0
    np.testing.assert_allclose(gotb[0], want, rtol=1e-12)
    g_x64, _ = ff_free_energy(coords, atomnos, efn)
    assert g_f32 == pytest.approx(g_x64, abs=1e-9)
