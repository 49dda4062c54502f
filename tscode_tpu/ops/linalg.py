'''
Batched geometry core (pure JAX, no LAPACK custom calls on the hot path).

TPU-first re-design of the reference's Numba kernel layer
(/root/reference/tscode/algebra.py, rmsd_pruning.py:6-41, utils.py:183-261):
every function is written batched-first, dtype-polymorphic and jit/vmap
friendly. The two LAPACK-style primitives the reference leans on —
3x3 SVD for Kabsch rotations and 3x3 eigendecomposition for inertia
moments — are replaced by branch-free closed forms that vectorize on the
VPU/MXU:

 * Kabsch rotations / RMSD use the Theobald QCP quaternion method
   (Newton iteration on the quartic characteristic polynomial of Horn's
   4x4 key matrix + adjoint eigenvector extraction). Mathematically
   identical to SVD-Kabsch with the determinant sign fix
   (rmsd_pruning.py:20-26), but it is ~40 fused FLOPs per pair instead
   of a LAPACK call, so millions of pose pairs batch cleanly.
 * Symmetric 3x3 eigenvalues use the trigonometric (Cardano) closed form.

Conventions: angles in degrees (matching the reference DSL), coordinates
in Angstrom, rotation matrices act on column vectors (R @ x).
'''

import jax
import jax.numpy as jnp
import numpy as np

_jit = jax.jit

# ------------------------------------------------------------------ basics


def norm_of(vec, axis=-1):
    '''Euclidean norm along `axis` (reference: algebra.py:89-96).'''
    return jnp.sqrt(jnp.sum(vec * vec, axis=axis))


def normalize(vec, axis=-1):
    '''Unit vector(s) along `axis` (reference: algebra.py:80-87).'''
    return vec / norm_of(vec, axis=axis)[..., None]


def safe_normalize(vec, axis=-1, eps=1e-30):
    '''Unit vector(s); zero vectors map to zero instead of NaN.'''
    n = norm_of(vec, axis=axis)[..., None]
    return vec / jnp.maximum(n, eps)


@_jit
def vec_angle(v1, v2):
    '''Angle between vectors in degrees (reference: algebra.py:58-62).'''
    cos = jnp.sum(normalize(v1) * normalize(v2), axis=-1)
    return jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))


@_jit
def point_angle(p1, p2, p3):
    '''Angle p1-p2-p3 in degrees (reference: algebra.py:76-78).'''
    return vec_angle(p1 - p2, p3 - p2)


@_jit
def dihedral(p):
    '''
    Praxeolitic dihedral angle in degrees from 4 points.
    p: (..., 4, 3). Returns (...,). (reference: algebra.py:23-56)
    '''
    p0, p1, p2, p3 = p[..., 0, :], p[..., 1, :], p[..., 2, :], p[..., 3, :]

    b0 = -(p1 - p0)
    b1 = normalize(p2 - p1)
    b2 = p3 - p2

    v = b0 - jnp.sum(b0 * b1, axis=-1, keepdims=True) * b1
    w = b2 - jnp.sum(b2 * b1, axis=-1, keepdims=True) * b1

    x = jnp.sum(v * w, axis=-1)
    y = jnp.sum(jnp.cross(b1, v) * w, axis=-1)
    return jnp.degrees(jnp.arctan2(y, x))


# ------------------------------------------------------- rotation builders


@_jit
def quaternion_to_rotation_matrix(q):
    '''
    Quaternion (scalar-LAST: x, y, z, w) -> rotation matrix, batched.
    q: (..., 4) -> (..., 3, 3). Same formula as reference algebra.py:284-323
    (valid for unit quaternions).
    '''
    q1, q2, q3, q0 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]

    r00 = 2 * (q0 * q0 + q1 * q1) - 1
    r01 = 2 * (q1 * q2 - q0 * q3)
    r02 = 2 * (q1 * q3 + q0 * q2)
    r10 = 2 * (q1 * q2 + q0 * q3)
    r11 = 2 * (q0 * q0 + q2 * q2) - 1
    r12 = 2 * (q2 * q3 - q0 * q1)
    r20 = 2 * (q1 * q3 - q0 * q2)
    r21 = 2 * (q2 * q3 + q0 * q1)
    r22 = 2 * (q0 * q0 + q3 * q3) - 1

    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


@_jit
def rot_mat_from_pointer(pointer, angle_deg):
    '''
    Axis-angle rotation matrix, batched: pointer (..., 3), angle_deg (...,).
    (reference: algebra.py:325-344)
    '''
    pointer = normalize(pointer)
    # strengthen the dtype: XLA CPU evaluates trig of WEAK-typed f64
    # scalars at f32 precision, which would cost ~1e-8 in the matrix
    half = jnp.radians(jnp.asarray(angle_deg, dtype=pointer.dtype)) / 2.0
    s, c = jnp.sin(half), jnp.cos(half)
    xyz = s[..., None] * pointer
    w = jnp.broadcast_to(c[..., None], xyz.shape[:-1] + (1,))
    quat = jnp.concatenate([xyz, w], axis=-1)
    return quaternion_to_rotation_matrix(quat)


@_jit
def rotation_matrix_from_vectors(vec1, vec2, eps=1e-12):
    '''
    Rotation aligning vec1 onto vec2 (Rodrigues), batched and branch-free.
    Handles the parallel (identity) and antiparallel (180deg flip) cases
    through jnp.where, matching reference utils.py:183-208.
    '''
    a = normalize(vec1)
    b = normalize(vec2)
    v = jnp.cross(a, b)
    c = jnp.sum(a * b, axis=-1)
    s2 = jnp.sum(v * v, axis=-1)

    zeros = jnp.zeros_like(v[..., 0])
    kmat = jnp.stack([
        jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
    ], axis=-2)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), kmat.shape)
    factor = (1 - c) / jnp.maximum(s2, eps)
    general = eye + kmat + (kmat @ kmat) * factor[..., None, None]

    # degenerate (s2 ~ 0): parallel -> identity; antiparallel -> 180 deg
    # about an axis PERPENDICULAR to a. Two reference bugs fixed here
    # (utils.py:204-206): (1) it rotates about the fixed z axis, which
    # does not flip vectors with a z component (e.g. +z -> +z instead of
    # -z); (2) the parallel/antiparallel split must use the dot-product
    # sign — a tiny-threshold norm(a+b) test misclassifies
    # nearly-antiparallel pairs (angle pi - delta, delta <= 1e-6) as
    # parallel and returns identity, assembling poses ~180 degrees wrong.
    helper = jnp.where((jnp.abs(a[..., :1]) < 0.9),
                       jnp.broadcast_to(jnp.array([1., 0., 0.],
                                                  dtype=v.dtype), v.shape),
                       jnp.broadcast_to(jnp.array([0., 1., 0.],
                                                  dtype=v.dtype), v.shape))
    perp = normalize(jnp.cross(a, helper))
    antiparallel = rot_mat_from_pointer(
        perp, jnp.full(v.shape[:-1], 180.0, dtype=v.dtype))
    degenerate = jnp.where((c < 0.0)[..., None, None], antiparallel, eye)

    return jnp.where((s2 > eps)[..., None, None], general, degenerate)


# ------------------------------------------- QCP quaternion Kabsch engine


def _horn_key_matrix(S):
    '''
    Horn's symmetric 4x4 key matrix (quaternion order w, x, y, z) from the
    3x3 correlation matrix S = sum_i p_i q_i^T (for rotations R p ~ q).
    S: (..., 3, 3) -> (..., 4, 4).
    '''
    Sxx, Sxy, Sxz = S[..., 0, 0], S[..., 0, 1], S[..., 0, 2]
    Syx, Syy, Syz = S[..., 1, 0], S[..., 1, 1], S[..., 1, 2]
    Szx, Szy, Szz = S[..., 2, 0], S[..., 2, 1], S[..., 2, 2]

    k00 = Sxx + Syy + Szz
    k01 = Syz - Szy
    k02 = Szx - Sxz
    k03 = Sxy - Syx
    k11 = Sxx - Syy - Szz
    k12 = Sxy + Syx
    k13 = Szx + Sxz
    k22 = -Sxx + Syy - Szz
    k23 = Syz + Szy
    k33 = -Sxx - Syy + Szz

    row0 = jnp.stack([k00, k01, k02, k03], axis=-1)
    row1 = jnp.stack([k01, k11, k12, k13], axis=-1)
    row2 = jnp.stack([k02, k12, k22, k23], axis=-1)
    row3 = jnp.stack([k03, k13, k23, k33], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def _qcp_lambda_max(S, GA, GB, newton_iters=None):
    '''
    Largest eigenvalue of Horn's key matrix via Theobald's QCP: Newton
    iteration on the quartic characteristic polynomial, seeded with the
    upper bound (GA + GB)/2. S: (..., 3, 3); GA, GB: (...,) squared norms.
    Iteration count adapts to dtype: convergence is quadratic from the
    upper-bound seed, so f32 screening needs far fewer steps than the
    f64 parity paths.
    '''
    if newton_iters is None:
        newton_iters = 30 if S.dtype == jnp.float64 else 12
    Sxx, Sxy, Sxz = S[..., 0, 0], S[..., 0, 1], S[..., 0, 2]
    Syx, Syy, Syz = S[..., 1, 0], S[..., 1, 1], S[..., 1, 2]
    Szx, Szy, Szz = S[..., 2, 0], S[..., 2, 1], S[..., 2, 2]

    Sxx2, Syy2, Szz2 = Sxx * Sxx, Syy * Syy, Szz * Szz
    Sxy2, Syz2, Sxz2 = Sxy * Sxy, Syz * Syz, Sxz * Sxz
    Syx2, Szy2, Szx2 = Syx * Syx, Szy * Szy, Szx * Szx

    SyzSzymSyySzz2 = 2.0 * (Syz * Szy - Syy * Szz)
    Sxx2Syy2Szz2Syz2Szy2 = Syy2 + Szz2 - Sxx2 + Syz2 + Szy2

    # characteristic quartic: x^4 + C2 x^2 + C1 x + C0
    C2 = -2.0 * (Sxx2 + Syy2 + Szz2 + Sxy2 + Syx2 + Sxz2 + Szx2 + Syz2 + Szy2)
    C1 = 8.0 * (Sxx * Syz * Szy + Syy * Szx * Sxz + Szz * Sxy * Syx
                - Sxx * Syy * Szz - Syz * Szx * Sxy - Szy * Syx * Sxz)

    SxzpSzx = Sxz + Szx
    SyzpSzy = Syz + Szy
    SxypSyx = Sxy + Syx
    SyzmSzy = Syz - Szy
    SxzmSzx = Sxz - Szx
    SxymSyx = Sxy - Syx
    SxxpSyy = Sxx + Syy
    SxxmSyy = Sxx - Syy

    C0 = (Sxy2Sxz2Syx2Szx2 := Sxy2 + Sxz2 - Syx2 - Szx2) * Sxy2Sxz2Syx2Szx2 \
        + (Sxx2Syy2Szz2Syz2Szy2 + SyzSzymSyySzz2) * (Sxx2Syy2Szz2Syz2Szy2 - SyzSzymSyySzz2) \
        + (-(SxzpSzx) * SyzmSzy + SxymSyx * (SxxmSyy - Szz)) * (-(SxzmSzx) * SyzpSzy + SxymSyx * (SxxmSyy + Szz)) \
        + (-(SxzpSzx) * SyzpSzy - SxypSyx * (SxxpSyy - Szz)) * (-(SxzmSzx) * SyzmSzy - SxypSyx * (SxxpSyy + Szz)) \
        + (SxypSyx * SyzpSzy + SxzpSzx * (SxxmSyy + Szz)) * (-(SxymSyx) * SyzmSzy + SxzpSzx * (SxxpSyy + Szz)) \
        + (SxypSyx * SyzmSzy + SxzmSzx * (SxxmSyy - Szz)) * (-(SxymSyx) * SyzpSzy + SxzmSzx * (SxxpSyy - Szz))

    lam = 0.5 * (GA + GB)

    # UNROLLED Newton steps (not lax.scan): a scan compiles to a
    # while-loop whose per-step kernels re-read/re-write the full
    # lambda tensor from HBM every iteration — on (chunks, span, span)
    # pair grids that traffic dominates the pass. Inlined, XLA fuses
    # the whole chain (quartic coefficients -> all Newton steps ->
    # the rmsd compare downstream) into one elementwise kernel over
    # the pair grid. Identical op sequence, bitwise-same results.
    for _ in range(newton_iters):
        lam2 = lam * lam
        b = (lam2 + C2) * lam
        a = b + C1
        num = a * lam + C0
        den = 2.0 * lam2 * lam + b + a
        lam = lam - num / jnp.where(jnp.abs(den) > 1e-30, den, 1e-30)
    return lam


def _quaternion_from_key(K, lam):
    '''
    Unit quaternion (w,x,y,z) = eigenvector of K for eigenvalue lam, via
    the adjoint of (K - lam I). Picks the largest-norm adjoint column for
    robustness; falls back to identity when all are degenerate.
    K: (..., 4, 4), lam: (...,) -> (..., 4).
    '''
    # A = K - lam*I as 16 SCALAR slices (x - 0.0 == x bitwise, so only
    # the diagonal subtracts): the previous fancy-indexed
    # `A[..., rows, :][..., :, cols]` cofactor extraction lowered to 32
    # XLA gathers over the batched 4x4 tensors — profiled as the
    # dominant cost of every maxdev/rotation evaluation on TPU (the
    # multiembed block screen spent 4.1 of 4.3 s in it). Static scalar
    # slices keep the arithmetic bitwise identical and fully fusible.
    a = [[K[..., i, j] - lam if i == j else K[..., i, j]
          for j in range(4)] for i in range(4)]

    # cofactor (adjoint^T) columns of a symmetric 4x4: each row of the
    # adjugate is a candidate null-space vector.
    def minor3(rows, cols):
        m = [[a[i][j] for j in cols] for i in rows]
        return (m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
                - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
                + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]))

    idx = [0, 1, 2, 3]
    cands = []                       # 4 candidate rows, each a 4-list
    norms2 = []
    for r in range(4):
        rows = [i for i in idx if i != r]
        comps = []
        for c in range(4):
            cols = [j for j in idx if j != c]
            sign = (-1.0) ** (r + c)
            comps.append(sign * minor3(tuple(rows), tuple(cols)))
        cands.append(comps)
        norms2.append(comps[0] * comps[0] + comps[1] * comps[1]
                      + comps[2] * comps[2] + comps[3] * comps[3])

    # branch-free first-max selection (same semantics as the previous
    # argmax + take_along_axis, which lowered to another batched gather)
    best_n2 = jnp.maximum(jnp.maximum(norms2[0], norms2[1]),
                          jnp.maximum(norms2[2], norms2[3]))
    is_best = [norms2[0] == best_n2]
    taken = is_best[0]
    for r in range(1, 4):
        hit = (norms2[r] == best_n2) & ~taken
        is_best.append(hit)
        taken = taken | hit
    q = jnp.stack(
        [sum(jnp.where(is_best[r], cands[r][c], 0.0) for r in range(4))
         for c in range(4)], axis=-1)
    qn2 = jnp.sum(q * q, axis=-1, keepdims=True)

    identity = jnp.zeros_like(q).at[..., 0].set(1.0)
    q = jnp.where(qn2 > 1e-22, q / jnp.sqrt(jnp.maximum(qn2, 1e-30)), identity)
    return q


@_jit
def kabsch_rotation_from_correlation(S, GA=None, GB=None):
    '''
    Proper rotation R maximizing sum_i q_i . (R p_i), given the correlation
    S = sum_i p_i q_i^T. Batched: S (..., 3, 3) -> R (..., 3, 3).
    Equivalent to SVD-Kabsch with det sign fix (reference rmsd_pruning.py:13-26,
    algebra.py:258-282) but closed-form/branch-free.
    '''
    if GA is None:
        # generic upper-bound seed when the Gram terms are unknown:
        # lam_max <= ||S||_* <= sqrt(3)*||S||_F
        fro = jnp.sqrt(jnp.sum(S * S, axis=(-2, -1)))
        GA = GB = jnp.sqrt(3.0) * fro
    K = _horn_key_matrix(S)
    lam = _qcp_lambda_max(S, GA, GB)
    q = _quaternion_from_key(K, lam)
    # Horn quaternion is (w, x, y, z); our builder takes scalar-last
    q_xyzw = jnp.concatenate([q[..., 1:], q[..., :1]], axis=-1)
    return quaternion_to_rotation_matrix(q_xyzw)


@_jit
def align_vec_pair(ref, tgt):
    '''
    Rotation matrix that optimally aligns the two vectors of `tgt` onto the
    two vectors of `ref` (reference algebra.py:258-282). Batched:
    ref, tgt (..., 2, 3) -> (..., 3, 3).
    '''
    ref = jnp.asarray(ref)
    tgt = jnp.asarray(tgt)
    # want R @ tgt_j ~ ref_j: correlation S = sum_j tgt_j ref_j^T
    S = jnp.einsum('...ji,...jk->...ik', tgt[..., :, :], ref)
    # i.e. S = tgt^T @ ref with vectors as rows
    GA = jnp.sum(tgt * tgt, axis=(-2, -1))
    GB = jnp.sum(ref * ref, axis=(-2, -1))
    return kabsch_rotation_from_correlation(S, GA, GB)


@_jit
def rmsd_and_max(p, q, mask=None):
    '''
    Kabsch RMSD and maximum per-atom deviation between coordinate sets,
    WITHOUT centering (faithful to reference rmsd_pruning.py:6-41, which
    feeds pre-sliced heavy-atom coords straight into the covariance).
    Batched: p, q (..., N, 3), optional mask (..., N) for padded atoms.
    Returns (rmsd, maxdev), each (...,).
    '''
    p = jnp.asarray(p)
    q = jnp.asarray(q)
    if mask is not None:
        m = mask[..., None].astype(p.dtype)
        p = p * m
        q = q * m
        n = jnp.sum(mask, axis=-1).astype(p.dtype)
    else:
        n = jnp.array(p.shape[-2], dtype=p.dtype)

    S = jnp.einsum('...ni,...nk->...ik', p, q)              # cov = p^T q
    GA = jnp.sum(p * p, axis=(-2, -1))
    GB = jnp.sum(q * q, axis=(-2, -1))

    K = _horn_key_matrix(S)
    lam = _qcp_lambda_max(S, GA, GB)
    q_wxyz = _quaternion_from_key(K, lam)
    q_xyzw = jnp.concatenate([q_wxyz[..., 1:], q_wxyz[..., :1]], axis=-1)
    R = quaternion_to_rotation_matrix(q_xyzw)               # R p_i ~ q_i

    rotated = jnp.einsum('...ij,...nj->...ni', R, p)
    diff = rotated - q
    if mask is not None:
        diff = diff * mask[..., None].astype(p.dtype)

    msd = jnp.sum(diff * diff, axis=(-2, -1)) / jnp.maximum(n, 1.0)
    rmsd = jnp.sqrt(jnp.maximum(msd, 0.0))
    maxdev = jnp.max(norm_of(diff), axis=-1)
    return rmsd, maxdev


@_jit
def kabsch_align(p, q, mask=None):
    '''
    Rotation R such that (R @ p_i) optimally overlays q_i (no centering).
    Batched: (..., N, 3) -> (..., 3, 3).
    '''
    p = jnp.asarray(p)
    q = jnp.asarray(q)
    if mask is not None:
        m = mask[..., None].astype(p.dtype)
        p, q = p * m, q * m
    S = jnp.einsum('...ni,...nk->...ik', p, q)
    GA = jnp.sum(p * p, axis=(-2, -1))
    GB = jnp.sum(q * q, axis=(-2, -1))
    return kabsch_rotation_from_correlation(S, GA, GB)


# ------------------------------------------------ inertia / mass properties


def det3(A):
    '''Closed-form determinant of batched 3x3 matrices (no LU custom call).'''
    return (A[..., 0, 0] * (A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1])
            - A[..., 0, 1] * (A[..., 1, 0] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 0])
            + A[..., 0, 2] * (A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0]))


@_jit
def center_of_mass(coords, masses):
    '''COM, batched: coords (..., N, 3), masses (N,) or (..., N).'''
    m = jnp.asarray(masses)
    w = jnp.sum(coords * m[..., None], axis=-2)
    return w / jnp.sum(m, axis=-1)[..., None]


@_jit
def eigvalsh3(A):
    '''
    Eigenvalues (ascending) of symmetric 3x3 matrices via the trigonometric
    closed form. Batched: A (..., 3, 3) -> (..., 3). No LAPACK.
    '''
    A = jnp.asarray(A)
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    eye = jnp.eye(3, dtype=A.dtype)
    B = A - q[..., None, None] * eye
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))

    safe_p = jnp.where(p > 1e-30, p, 1.0)
    C = B / safe_p[..., None, None]
    detC = det3(C)
    r = jnp.clip(detC / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    two_p = 2.0 * p
    e3 = q + two_p * jnp.cos(phi)                                   # largest
    e1 = q + two_p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)              # smallest
    e2 = 3.0 * q - e1 - e3
    evs = jnp.stack([e1, e2, e3], axis=-1)

    # Newton polish on the characteristic polynomial recovers the last
    # few digits Cardano loses: p(x) = x^3 - c2 x^2 + c1 x - c0
    c2 = jnp.trace(A, axis1=-2, axis2=-1)
    c0 = det3(A)
    c1 = 0.5 * (c2 * c2 - jnp.trace(A @ A, axis1=-2, axis2=-1))
    for _ in range(2):
        f = ((evs - c2[..., None]) * evs + c1[..., None]) * evs - c0[..., None]
        df = (3.0 * evs - 2.0 * c2[..., None]) * evs + c1[..., None]
        evs = evs - f / jnp.where(jnp.abs(df) > 1e-30, df, 1e-30)
    evs = jnp.sort(evs, axis=-1)

    return jnp.where((p > 1e-30)[..., None], evs, jnp.stack([q, q, q], axis=-1))


@_jit
def inertia_tensor(coords, masses):
    '''
    Inertia tensor about the COM. Batched: coords (..., N, 3), masses (N,).
    (reference: algebra.py:165-186)
    '''
    masses = jnp.asarray(masses)
    com = center_of_mass(coords, masses)
    x = coords - com[..., None, :]
    r2 = jnp.sum(x * x, axis=-1)                                    # (..., N)
    eye = jnp.eye(3, dtype=coords.dtype)
    term1 = jnp.sum((masses * r2)[..., None, None] * eye, axis=-3)
    term2 = jnp.einsum('...n,...ni,...nj->...ij', masses * jnp.ones_like(r2), x, x)
    return term1 - term2


@_jit
def get_inertia_moments(coords, masses):
    '''
    Principal moments of inertia, ascending. Batched: (..., N, 3) -> (..., 3).
    Reference (algebra.py:165-186) sorts by |eigenvalue|; moments are
    non-negative so plain ascending order matches.
    '''
    return eigvalsh3(inertia_tensor(coords, masses))


# --------------------------------------------------- coordinate transforms


@_jit
def transform_coords(coords, rot, pos):
    '''
    Rotate + translate coordinate blocks, batched (reference algebra.py:390-400
    and the `get_embed` kernel embeds.py:961-969).
    coords (..., N, 3), rot (..., 3, 3), pos (..., 3).
    '''
    return jnp.einsum('...ij,...nj->...ni', rot, coords) + pos[..., None, :]


@_jit
def rotate_dihedral(coords, quad, angle_deg, move_mask):
    '''
    Rotate the masked part of a molecule about the i2-i3 bond of a torsion
    quadruplet (reference utils.py:389-414). Batched over leading axes of
    coords/angle. quad: (4,) int indices; move_mask: (N,) bool.
    '''
    i2, i3 = quad[1], quad[2]
    axis = coords[..., i2, :] - coords[..., i3, :]
    mat = rot_mat_from_pointer(axis, angle_deg)
    center = coords[..., i3, :]
    moved = jnp.einsum('...ij,...nj->...ni', mat, coords - center[..., None, :]) \
        + center[..., None, :]
    return jnp.where(move_mask[..., None], moved, coords)


# ----------------------------------------------------------- index helpers
# Host-side (numpy) combinatorics; the iteration ORDER matters for parity
# with the reference's pruning semantics, so these mirror utils.py:180-181.


def cartesian_product(*arrays):
    '''First array varies fastest (meshgrid 'xy' + reshape, utils.py:180-181).'''
    return np.stack(np.meshgrid(*arrays), -1).reshape(-1, len(arrays))


def polygonize(lengths):
    '''
    Polygon-side vertex couples for cyclical embeds (utils.py:210-261).
    lengths: (2,) -> (2, 2, 2, 3): two orientations (parallel/antiparallel)
    of two centered overlapping segments.
    lengths: (3,) -> (8, 3, 2, 3): eight oriented triangles.
    Raises TriangleError when the triangle inequality fails (host-side use;
    batched device sweeps use `triangle_sides_ok` masks instead).
    '''
    from tscode_tpu.errors import TriangleError

    lengths = np.asarray(lengths, dtype=float)
    assert len(lengths) in (2, 3)

    if len(lengths) == 2:
        # two x-axis segments centered on the origin; orientation 1
        # reverses the second segment (antiparallel pivot pairing)
        ends = np.outer(lengths / 2.0, [1.0, 0.0, 0.0])   # (2, 3)
        segments = np.stack([-ends, ends], axis=1)        # (mol, 2, 3)
        return np.stack([segments,
                         segments * [[[1]], [[-1]]]])     # (2, 2, 2, 3)

    if not np.all(lengths < np.roll(lengths, 1) + np.roll(lengths, 2)):
        raise TriangleError(
            f'Impossible to build a triangle with sides {lengths}')

    # canonical triangle: base along +x, apex above it (law of cosines)
    base, flank, closing = lengths
    apex_x = (base * base - flank * flank + closing * closing) / (2 * base)
    apex = np.array([apex_x, np.sqrt(closing * closing - apex_x * apex_x), 0])
    vertices = np.array([[0.0, 0.0, 0.0], [base, 0.0, 0.0], apex])
    sides = vertices[[[0, 1], [1, 2], [2, 0]]]            # (side, 2, 3)

    # all 8 per-side direction choices; subset order is a pinned quirk
    # (the reference enumerates them via its `swaps` table in this order)
    flip_sets = [(), (2,), (1,), (1, 2), (0,), (0, 1), (0, 2), (0, 1, 2)]
    out = np.broadcast_to(sides, (8,) + sides.shape).copy()
    for orient, flips in enumerate(flip_sets):
        for side in flips:
            out[orient, side] = out[orient, side, ::-1]
    return out


def polygonize_digons(lengths):
    '''
    Batched digon (2-molecule) polygonize on device: lengths (..., 2) ->
    vertices (..., 2, 2, 2, 3) [orientation, molecule, start/end, xyz].
    '''
    lengths = jnp.asarray(lengths)
    half = lengths / 2.0
    zeros = jnp.zeros_like(half[..., 0])

    def seg(h):
        start = jnp.stack([-h, zeros, zeros], axis=-1)
        end = jnp.stack([h, zeros, zeros], axis=-1)
        return jnp.stack([start, end], axis=-2)

    m0 = seg(half[..., 0])
    m1 = seg(half[..., 1])
    orient0 = jnp.stack([m0, m1], axis=-3)
    orient1 = jnp.stack([m0, -m1], axis=-3)
    return jnp.stack([orient0, orient1], axis=-4)


def triangle_sides_ok(lengths):
    '''Triangle inequality mask for batched side lengths (..., 3).'''
    l0, l1, l2 = lengths[..., 0], lengths[..., 1], lengths[..., 2]
    return (l0 < l1 + l2) & (l1 < l2 + l0) & (l2 < l0 + l1)
