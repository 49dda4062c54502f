'''
Batched clash / compenetration screening.

TPU re-design of the reference's hot clash kernels
(/root/reference/tscode/numba_functions.py:26-105, algebra.py:98-157):
instead of a blocked CPU distance-matrix with early exits, we compute
squared distances for a whole padded pose batch at once in matmul form
(|a|^2 + |b|^2 - 2 a.b rides the MXU) and reduce boolean clash counts.
Early exits disappear; the semantics (pass/fail per pose) are identical.
'''

import os

import jax
import jax.numpy as jnp
import numpy as np


# The Pallas clash kernel unrolls the static cross-fragment pair list
# at trace time (one VPU sub/mul/sum triple per pair): past ~1k pairs
# the unrolled Mosaic body stops paying off vs the XLA matmul form,
# whose B x N x N distance computation tiles onto the MXU — exactly the
# regime (100+-atom molecules) the matmul form was designed for. The
# A/B win measured for Pallas (BASELINE.md "Pallas vs XLA") was at ~30
# cross pairs.
_PALLAS_CLASH_MAX_PAIRS = 1024


def use_pallas_clash(n_pairs=None):
    '''Backend policy for the clash screen: the Pallas lane-layout
    kernel on accelerator backends (A/B-measured on the chip — see
    BASELINE.md "Pallas vs XLA"), the XLA matmul form on CPU — and the
    matmul form whenever the static pair list would unroll past
    TSCODE_PALLAS_CLASH_MAX_PAIRS (default 1024) kernel statements
    (large molecules belong on the MXU, not in an unrolled VPU loop).
    TSCODE_USE_PALLAS_CLASH=0/1 overrides the backend choice (the
    pair-count cap still applies unless =1 is forced).'''
    env = os.environ.get('TSCODE_USE_PALLAS_CLASH')
    if env is not None:
        return env == '1'
    if n_pairs is not None:
        cap = int(os.environ.get('TSCODE_PALLAS_CLASH_MAX_PAIRS',
                                 _PALLAS_CLASH_MAX_PAIRS))
        if n_pairs > cap:
            return False
    return jax.default_backend() not in ('cpu',)


def static_pairs(pair_mask):
    '''STATIC (hashable) cross-fragment pair tuple from a host-side
    pair mask — the Pallas kernel unrolls over it at trace time.'''
    return tuple((int(i), int(j))
                 for i, j in zip(*np.nonzero(np.asarray(pair_mask))))


def pairwise_dist2(A, B):
    '''
    Squared Euclidean distance matrix, batched: A (..., N, 3), B (..., M, 3)
    -> (..., N, M). Uses the matmul expansion so XLA can tile it on the MXU.
    '''
    a2 = jnp.sum(A * A, axis=-1)
    b2 = jnp.sum(B * B, axis=-1)
    ab = jnp.einsum('...ni,...mi->...nm', A, B)
    d2 = a2[..., :, None] + b2[..., None, :] - 2.0 * ab
    return jnp.maximum(d2, 0.0)


def fragment_labels(ids):
    '''
    Fragment id per atom from contiguous fragment lengths
    (the reference's `ids` array, numba_functions.py:60-91).
    ids: sequence of ints -> (N,) int array.
    '''
    return np.repeat(np.arange(len(ids)), np.asarray(ids, dtype=int))


def cross_fragment_pair_mask(ids, n_pad=None):
    '''
    (N, N) bool mask that is True for atom pairs (i, j) belonging to
    different fragments, counting each unordered pair ONCE (f_i < f_j),
    matching the rectangular all_dists(m2, m1) counting of the reference.
    Padding rows/cols (beyond sum(ids)) are False.
    '''
    labels = fragment_labels(ids)
    n = len(labels)
    n_pad = n_pad or n
    full = np.zeros((n_pad, n_pad), dtype=bool)
    full[:n, :n] = labels[:, None] < labels[None, :]
    return full


@jax.jit
def count_cross_clashes(poses, pair_mask, thresh=1.5):
    '''
    Number of cross-fragment atom pairs closer than `thresh`, per pose.
    poses: (..., N, 3); pair_mask: (N, N) bool -> (...,) int32.
    '''
    d2 = pairwise_dist2(poses, poses)
    hit = (d2 < thresh * thresh) & pair_mask
    return jnp.sum(hit, axis=(-2, -1)).astype(jnp.int32)


@jax.jit
def compenetration_mask(poses, pair_mask, thresh=1.5, max_clashes=0):
    '''
    Boolean accept mask for a pose batch: True when the pose shows at most
    `max_clashes` cross-fragment contacts below `thresh` Angstrom.
    Batched equivalent of compenetration_check (numba_functions.py:59-105).

    Jitted (like every public entry point here that host code calls
    directly): an un-jitted call runs op by op, and on a tunneled
    accelerator each eager op pays its own remote compile + dispatch —
    measured at SECONDS per call vs milliseconds jitted.
    '''
    return count_cross_clashes.__wrapped__(
        poses, pair_mask, thresh=thresh) <= max_clashes


def count_intra_clashes_np(coords, thresh=0.5):
    '''
    Host-numpy twin of count_intra_clashes for one-shot sanity checks
    on SMALL inputs (e.g. Embedder init): the input lives on the host,
    the result is consumed on the host, and the arrays are tiny — a
    device round trip (let alone an eager op chain over a tunnel) costs
    orders of magnitude more than the arithmetic. Same semantics,
    computed with the exact difference form (no matmul roundoff).
    '''
    coords = np.asarray(coords)
    n = coords.shape[-2]
    off_diag = ~np.eye(n, dtype=bool)
    flat = coords.reshape(-1, n, 3)
    out = np.empty(flat.shape[0], dtype=np.int32)
    # chunk the batch axis so the (b, N, N) distance tensor stays small
    step = max(1, int(2e7) // (n * n))
    for b0 in range(0, flat.shape[0], step):
        c = flat[b0:b0 + step]
        d2 = np.sum((c[:, :, None, :] - c[:, None, :, :]) ** 2, axis=-1)
        hit = (d2 < thresh * thresh) & (d2 > 1e-6) & off_diag
        out[b0:b0 + step] = hit.sum(axis=(-2, -1))
    return out.reshape(coords.shape[:-2])


@jax.jit
def count_intra_clashes(coords, atom_mask=None, thresh=0.5):
    '''
    Sanity-check clash count within a single structure batch: pairs with
    0 < d < thresh, counted TWICE per unordered pair exactly like the
    reference's count_clashes (numba_functions.py:49-56, full-matrix count).
    coords: (..., N, 3) -> (...,) int32.
    '''
    d2 = pairwise_dist2(coords, coords)
    # the matmul-form d2 leaves roundoff where the true distance is zero
    # (up to ~1e-5 A^2 in f32 on TPU), so the diagonal must be excluded
    # structurally; the epsilon only reproduces the reference's d > 0
    # exclusion of genuinely coincident atom pairs
    n = coords.shape[-2]
    off_diag = ~jnp.eye(n, dtype=bool)
    # d > 1e-3 A: no two real atoms sit closer, and it stays above the
    # f32 matmul roundoff floor for coincident pairs
    hit = (d2 < thresh * thresh) & (d2 > 1e-6) & off_diag
    if atom_mask is not None:
        pm = atom_mask[..., :, None] & atom_mask[..., None, :]
        hit = hit & pm
    return jnp.sum(hit, axis=(-2, -1)).astype(jnp.int32)


@jax.jit
def torsion_clash_ok(coords, moved_mask, other_mask, thresh=1.5, max_clashes=0):
    '''
    Clash check between the two graph sides of a rotated torsion
    (reference torsion_comp_check, numba_functions.py:26-47). The i2/i3
    bond atoms must already be excluded from `other_mask` by the caller.
    coords: (..., N, 3); masks: (N,) bool -> (...,) bool accept.
    '''
    d2 = pairwise_dist2(coords, coords)
    pm = other_mask[:, None] & moved_mask[None, :]
    hit = (d2 < thresh * thresh) & pm
    return jnp.sum(hit, axis=(-2, -1)) <= max_clashes
