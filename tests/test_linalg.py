'''Golden tests: JAX geometry core vs numpy/LAPACK oracles at 1e-6 A.'''

import numpy as np
import pytest

import oracles
from tscode_tpu.ops import linalg as L

rng = np.random.default_rng(42)


def random_rotation():
    axis = rng.normal(size=3)
    angle = rng.uniform(-180, 180)
    return oracles.rot_mat_from_pointer(axis, angle)


def test_norm_of_and_normalize():
    v = rng.normal(size=(10, 3))
    np.testing.assert_allclose(np.asarray(L.norm_of(v)),
                               np.linalg.norm(v, axis=-1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(L.normalize(v)),
                               v / np.linalg.norm(v, axis=-1, keepdims=True), atol=1e-12)


def test_dihedral_batched():
    pts = rng.normal(size=(50, 4, 3)) * 3
    got = np.asarray(L.dihedral(pts))
    want = np.array([oracles.dihedral(p) for p in pts])
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_vec_angle():
    v1, v2 = rng.normal(size=(2, 20, 3))
    got = np.asarray(L.vec_angle(v1, v2))
    want = [np.degrees(np.arccos(np.clip(
        np.dot(oracles.norm(a), oracles.norm(b)), -1, 1))) for a, b in zip(v1, v2)]
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_rot_mat_from_pointer():
    axes = rng.normal(size=(30, 3))
    angles = rng.uniform(-360, 360, size=30)
    got = np.asarray(L.rot_mat_from_pointer(axes, angles))
    want = np.array([oracles.rot_mat_from_pointer(a, ang) for a, ang in zip(axes, angles)])
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_rotation_matrix_from_vectors_generic():
    v1, v2 = rng.normal(size=(2, 25, 3))
    got = np.asarray(L.rotation_matrix_from_vectors(v1, v2))
    want = np.array([oracles.rotation_matrix_from_vectors(a, b) for a, b in zip(v1, v2)])
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_rotation_matrix_from_vectors_degenerate():
    v = np.array([1.3, -0.2, 0.7])
    # parallel -> identity
    np.testing.assert_allclose(np.asarray(L.rotation_matrix_from_vectors(v, 2 * v)),
                               np.eye(3), atol=1e-9)
    # antiparallel -> a true 180 deg flip. The reference rotates about
    # the FIXED z axis (utils.py:204-206), which fails to flip vectors
    # with a z component — a reference bug fixed here, so we assert the
    # correct alignment property rather than reference equality.
    R = np.asarray(L.rotation_matrix_from_vectors(v, -v))
    a = v / np.linalg.norm(v)
    np.testing.assert_allclose(R @ a, -a, atol=1e-9)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
    assert np.linalg.det(R) > 0

    # nearly-antiparallel pairs inside the degeneracy window must also
    # land on target (the old norm(a+b) test misrouted delta <= 1e-6)
    for delta in (1e-13, 1e-9, 1e-7):
        t = np.array([-0.2, 1.0, 0.4])
        t -= (t @ a) * a
        t /= np.linalg.norm(t)
        b = -a * np.cos(delta) + t * np.sin(delta)
        R = np.asarray(L.rotation_matrix_from_vectors(v, b))
        assert R @ a @ b > 1.0 - 1e-9


def test_align_vec_pair_random():
    refs = rng.normal(size=(40, 2, 3))
    tgts = rng.normal(size=(40, 2, 3))
    got = np.asarray(L.align_vec_pair(refs, tgts))
    for i in range(40):
        want = oracles.align_vec_pair(refs[i], tgts[i])
        np.testing.assert_allclose(got[i], want, atol=1e-7,
                                   err_msg=f'align_vec_pair mismatch at {i}')


def test_align_vec_pair_exact_rotation():
    # when tgt is an exact rotation of ref, recover it
    for _ in range(10):
        R = random_rotation()
        ref = rng.normal(size=(2, 3))
        tgt = (R.T @ ref.T).T      # R @ tgt = ref
        got = np.asarray(L.align_vec_pair(ref, tgt))
        np.testing.assert_allclose(got @ tgt.T, ref.T, atol=1e-8)


def test_rmsd_and_max_random_pairs():
    N = 17
    ps = rng.normal(size=(60, N, 3)) * 2
    qs = rng.normal(size=(60, N, 3)) * 2
    r_got, m_got = (np.asarray(x) for x in L.rmsd_and_max(ps, qs))
    for i in range(60):
        r_want, m_want = oracles.rmsd_and_max(ps[i], qs[i])
        np.testing.assert_allclose(r_got[i], r_want, atol=1e-7)
        np.testing.assert_allclose(m_got[i], m_want, atol=1e-6)


def test_rmsd_and_max_near_identical():
    # the similar-structure regime that drives pruning decisions
    N = 30
    base = rng.normal(size=(N, 3)) * 3
    for scale in (0.0, 1e-4, 1e-2, 0.3):
        R = random_rotation()
        q = (R @ (base + rng.normal(size=(N, 3)) * scale).T).T
        r_got, m_got = (float(np.asarray(x)) for x in L.rmsd_and_max(base, q))
        r_want, m_want = oracles.rmsd_and_max(base, q)
        assert abs(r_got - r_want) < 1e-6, (scale, r_got, r_want)
        assert abs(m_got - m_want) < 1e-5, (scale, m_got, m_want)


def test_rmsd_and_max_reflection_case():
    # planar point sets are reflection-prone: det fix must kick in
    N = 12
    p = rng.normal(size=(N, 3))
    p[:, 2] = 0.0
    q = p.copy()
    q[:, 0] = -q[:, 0]          # mirrored
    r_got, m_got = (float(np.asarray(x)) for x in L.rmsd_and_max(p, q))
    r_want, m_want = oracles.rmsd_and_max(p, q)
    np.testing.assert_allclose(r_got, r_want, atol=1e-7)
    np.testing.assert_allclose(m_got, m_want, atol=1e-6)


def test_rmsd_and_max_masked_padding():
    N, PAD = 14, 6
    p = rng.normal(size=(N, 3))
    q = rng.normal(size=(N, 3))
    p_pad = np.concatenate([p, rng.normal(size=(PAD, 3)) * 50])
    q_pad = np.concatenate([q, rng.normal(size=(PAD, 3)) * 50])
    mask = np.concatenate([np.ones(N, bool), np.zeros(PAD, bool)])
    r_got, m_got = (float(np.asarray(x)) for x in L.rmsd_and_max(p_pad, q_pad, mask=mask))
    r_want, m_want = oracles.rmsd_and_max(p, q)
    np.testing.assert_allclose(r_got, r_want, atol=1e-7)
    np.testing.assert_allclose(m_got, m_want, atol=1e-6)


def test_inertia_moments():
    for n in (5, 20):
        coords = rng.normal(size=(n, 3)) * 2
        masses = rng.uniform(1, 16, size=n)
        got = np.asarray(L.get_inertia_moments(coords, masses))
        want = oracles.get_inertia_moments(coords, masses)
        np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-8)


def test_inertia_moments_batched():
    coords = rng.normal(size=(7, 11, 3))
    masses = rng.uniform(1, 16, size=11)
    got = np.asarray(L.get_inertia_moments(coords, masses))
    for i in range(7):
        want = oracles.get_inertia_moments(coords[i], masses)
        np.testing.assert_allclose(got[i], want, rtol=1e-9, atol=1e-9)


def test_transform_coords():
    coords = rng.normal(size=(9, 3))
    R = random_rotation()
    pos = rng.normal(size=3)
    got = np.asarray(L.transform_coords(coords, R, pos))
    want = (R @ coords.T).T + pos
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_rotate_dihedral():
    coords = rng.normal(size=(8, 3)) * 2
    quad = np.array([0, 1, 2, 3])
    mask = np.array([1, 1, 0, 0, 0, 1, 0, 1], dtype=bool)
    angle = 37.5
    got = np.asarray(L.rotate_dihedral(coords, quad, angle, mask))
    axis = coords[1] - coords[2]
    mat = oracles.rot_mat_from_pointer(axis, angle)
    center = coords[2]
    want = coords.copy()
    want[mask] = (mat @ (coords[mask] - center).T).T + center
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_cartesian_product_order():
    a, b = np.arange(3), np.arange(2)
    got = L.cartesian_product(a, b)
    want = np.stack(np.meshgrid(a, b), -1).reshape(-1, 2)
    np.testing.assert_array_equal(got, want)
    # first column must vary fastest (reference iteration order)
    assert got[0].tolist() == [0, 0] and got[1].tolist() == [1, 0]


def test_polygonize_digon():
    out = L.polygonize([2.0, 3.0])
    assert out.shape == (2, 2, 2, 3)
    np.testing.assert_allclose(out[0, 0, 0], [-1, 0, 0])
    np.testing.assert_allclose(out[0, 1, 1], [1.5, 0, 0])
    np.testing.assert_allclose(out[1, 1, 0], [1.5, 0, 0])   # second orientation flipped

    # batched device version agrees
    dev = np.asarray(L.polygonize_digons(np.array([[2.0, 3.0]])))[0]
    np.testing.assert_allclose(dev, out, atol=1e-12)


def test_polygonize_triangle():
    out = L.polygonize([3.0, 4.0, 5.0])
    assert out.shape == (8, 3, 2, 3)
    for t in range(8):
        for v in range(3):
            side = np.linalg.norm(out[t, v, 1] - out[t, v, 0])
            np.testing.assert_allclose(side, [3.0, 4.0, 5.0][v], atol=1e-12)


def test_polygonize_triangle_error():
    from tscode_tpu.errors import TriangleError
    with pytest.raises(TriangleError):
        L.polygonize([1.0, 1.0, 5.0])
    ok = np.asarray(L.triangle_sides_ok(np.array([[1.0, 1.0, 5.0], [3.0, 4.0, 5.0]])))
    assert ok.tolist() == [False, True]
