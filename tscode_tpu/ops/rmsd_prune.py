'''
All-pairs Kabsch-RMSD ensemble pruning — the throughput-critical kernel.

TPU re-design of the reference's cached, chunk-parallel Numba pruner
(/root/reference/tscode/rmsd_pruning.py:43-206). Key observations that
make the parallel version exact:

 * Within one k-pass, the reference computes out_mask[i] from the mask
   AT PASS START (liveness does not feed back inside a pass), so
   "kill i if any active j > i in the same chunk is similar" is fully
   data-parallel over i.
 * The reference's cache only skips recomputation of known-dissimilar
   pairs; with an ideal cache the result equals recomputation. (The
   reference's cache key drops the row index — rmsd_pruning.py:65 — which
   can wrongly skip comparisons; we implement the intended semantics.)

Two-stage screening keeps memory and FLOPs down:
 1. RMSD for ALL pairs of a tile from the QCP lambda_max alone:
    msd = (|P|^2 + |Q|^2 - 2 lambda)/N — one (T, M, 3, 3) correlation
    einsum (MXU) + branch-free scalar math, no (T, M, N, 3) tensors.
 2. maxdev (< 2*rmsd_thr gate) only for the few RMSD-passing pairs,
    gathered and rotated explicitly.
'''

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tscode_tpu.ops.linalg import (_horn_key_matrix, _qcp_lambda_max,
                                   _quaternion_from_key,
                                   quaternion_to_rotation_matrix)

K_SCHEDULE = (5e5, 2e5, 1e5, 5e4, 2e4, 1e4,
              5000, 2000, 1000, 500, 200, 100,
              50, 20, 10, 5, 2, 1)

_ROW_TILE = 128


@functools.partial(jax.jit, static_argnames=('n_atoms',))
def _rmsd_matrix_lambda_only(P, Q, n_atoms):
    '''
    Pairwise Kabsch RMSD (no centering, reference rmsd_pruning.py:6-41)
    from QCP lambda_max only. P: (A, N, 3), Q: (B, N, 3) -> (A, B).
    '''
    S = jnp.einsum('ani,bnk->abik', P, Q)
    GA = jnp.sum(P * P, axis=(-2, -1))[:, None]
    GB = jnp.sum(Q * Q, axis=(-2, -1))[None, :]
    lam = _qcp_lambda_max(S, GA, GB)
    msd = (GA + GB - 2.0 * lam) / n_atoms
    return jnp.sqrt(jnp.maximum(msd, 0.0))


@jax.jit
def _maxdev_pairs(P, Q):
    '''
    Max per-atom deviation after Kabsch superposition for explicit pairs.
    P, Q: (K, N, 3) -> (K,).
    '''
    S = jnp.einsum('kni,knj->kij', P, Q)
    GA = jnp.sum(P * P, axis=(-2, -1))
    GB = jnp.sum(Q * Q, axis=(-2, -1))
    K = _horn_key_matrix(S)
    lam = _qcp_lambda_max(S, GA, GB)
    q_wxyz = _quaternion_from_key(K, lam)
    q_xyzw = jnp.concatenate([q_wxyz[..., 1:], q_wxyz[..., :1]], axis=-1)
    R = quaternion_to_rotation_matrix(q_xyzw)
    diff = jnp.einsum('kij,knj->kni', R, P) - Q
    return jnp.max(jnp.sqrt(jnp.sum(diff * diff, axis=-1)), axis=-1)


def _pad_to(x, n, axis=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths)


def rmsd_similarity_matrix(structures, rmsd_thr, row_tile=_ROW_TILE):
    '''
    (M, M) bool similarity: rmsd < thr AND maxdev < 2*thr, computed in
    row tiles on device. `structures` are already heavy-atom-sliced.
    '''
    structures = np.asarray(structures)
    m, n_atoms = structures.shape[0], structures.shape[1]
    if m <= 1:
        return np.zeros((m, m), dtype=bool)

    m_pad = int(np.ceil(m / row_tile)) * row_tile
    padded = _pad_to(structures, m_pad)
    dev = jnp.asarray(padded)

    rmsd_rows = []
    for r0 in range(0, m_pad, row_tile):
        rmsd_rows.append(np.asarray(
            _rmsd_matrix_lambda_only(dev[r0:r0 + row_tile], dev, n_atoms)))
    rmsd_mat = np.concatenate(rmsd_rows, axis=0)[:m, :m]

    candidates = rmsd_mat < rmsd_thr
    np.fill_diagonal(candidates, False)

    sim = np.zeros((m, m), dtype=bool)
    ii, jj = np.nonzero(np.triu(candidates, k=1))
    if len(ii):
        k_pad = max(int(np.ceil(len(ii) / row_tile)) * row_tile, row_tile)
        P = _pad_to(structures[ii], k_pad)
        Q = _pad_to(structures[jj], k_pad)
        maxdev = np.asarray(_maxdev_pairs(jnp.asarray(P), jnp.asarray(Q)))[:len(ii)]
        ok = maxdev < 2.0 * rmsd_thr
        sim[ii[ok], jj[ok]] = True
        sim[jj[ok], ii[ok]] = True
    return sim


def prune_conformers_rmsd(structures, atomnos, rmsd_thr=0.5):
    '''
    Remove similar structures; returns (pruned, keep_mask). Reproduces
    the reference's k-bucket schedule and keep/kill semantics
    (rmsd_pruning.py:164-206): per pass, structure i dies when any
    later structure j of the same chunk, active at pass start, has
    rmsd < thr and maxdev < 2*thr.
    '''
    structures = np.asarray(structures)
    atomnos = np.asarray(atomnos)
    n = len(structures)
    if n <= 1:
        return structures, np.ones(n, dtype=bool)

    heavy = atomnos != 1
    heavy_structures = np.ascontiguousarray(structures[:, heavy])

    out_mask = np.ones(n, dtype=bool)

    for k in K_SCHEDULE:
        active_count = int(np.count_nonzero(out_mask))
        if not (k == 1 or 20 * k < active_count):
            continue

        chunksize = int(n // k)
        new_mask = out_mask.copy()

        for chunk in range(int(k)):
            first = chunk * chunksize
            last = n if chunk == k - 1 else chunksize * (chunk + 1)
            idx = np.nonzero(out_mask[first:last])[0] + first
            if len(idx) <= 1:
                continue

            sim = rmsd_similarity_matrix(heavy_structures[idx], rmsd_thr)
            kill = np.any(np.triu(sim, k=1), axis=1)
            new_mask[idx[kill]] = False

        out_mask = new_mask

    return structures[out_mask], out_mask


def rmsd_similarity_sequential(ref_pose, poses, rmsd_thr):
    '''
    True if ref_pose is similar (rmsd & maxdev gates) to ANY pose in
    `poses` — batched replacement for the reference's _rmsd_similarity
    (rmsd_pruning.py:208-223) used by the cyclical embed's angular dedup.
    ref_pose: (N, 3); poses: (B, N, 3).
    '''
    if len(poses) == 0:
        return False
    from tscode_tpu.ops.linalg import rmsd_and_max
    rmsd, maxdev = rmsd_and_max(jnp.asarray(poses), jnp.asarray(ref_pose)[None])
    hits = (np.asarray(rmsd) < rmsd_thr) & (np.asarray(maxdev) < 2 * rmsd_thr)
    return bool(hits.any())
