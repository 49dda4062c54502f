'''
Torsion fingerprint deviation (TFD) screening.

Device side: batched dihedral fingerprints and pairwise wrapped-L1
deltas (replacing the Numba prange of numba_functions.py:234-271).
Host side: the exact bucketed dedup bookkeeping of the reference's
prune_conformers_tfd (numba_functions.py:142-232), including its
first-match-per-structure edge collection and keep-first-of-component
rule, driven by device-computed similarity blocks.
'''

import jax
import jax.numpy as jnp
import networkx as nx
import numpy as np

from tscode_tpu.ops.linalg import dihedral

K_SCHEDULE = (5e5, 2e5, 1e5, 5e4, 2e4, 1e4,
              5000, 2000, 1000, 500, 200, 100,
              50, 20, 10, 5, 2, 1)


@jax.jit
def torsion_fingerprints(coords, quadruplets):
    '''
    Per-structure vector of dihedrals over torsion quadruplets.
    coords: (..., N, 3); quadruplets: (Q, 4) int -> (..., Q) float32
    (the reference stores fingerprints in float32, numba_functions.py:238).
    Jitted: host callers (prune_conformers_tfd, csearch) invoke it
    directly, and eager op chains pay per-op dispatch on a tunnel.
    '''
    quadruplets = jnp.asarray(quadruplets, dtype=jnp.int32)
    pts = coords[..., quadruplets, :]                  # (..., Q, 4, 3)
    return dihedral(pts).astype(jnp.float32)


def tfd_delta_matrix(tf_a, tf_b):
    '''
    Pairwise total wrapped angle difference: (A, Q) x (B, Q) -> (A, B).
    deltas wrap at 180 degrees (numba_functions.py:245-260).
    '''
    deltas = jnp.abs(tf_a[:, None, :] - tf_b[None, :, :])
    deltas = jnp.abs(deltas - (deltas > 180) * 360.0)
    return jnp.sum(deltas, axis=-1)


@jax.jit
def _tfd_sim_block(tf_block, thresh):
    return tfd_delta_matrix(tf_block, tf_block) < thresh


_TFD_ROW_TILE = 512
_TFD_COL_TILE = 4096
_TFD_PAD_VALUE = 1.0e9      # wrapped delta of a padded entry stays huge


@jax.jit
def _tfd_delta_tile(tf_rows, tf_cols):
    '''(T, Q) x (C, Q) -> (T, C) wrapped L1 distance, accumulated over
    torsions with a scan so the peak footprint is T*C — never T*C*Q.'''
    def body(acc, qs):
        a_q, b_q = qs
        d = jnp.abs(a_q[:, None] - b_q[None, :])
        return acc + jnp.abs(d - (d > 180) * 360.0), None
    acc0 = jnp.zeros((tf_rows.shape[0], tf_cols.shape[0]),
                     dtype=tf_rows.dtype)
    acc, _ = jax.lax.scan(body, acc0, (tf_rows.T, tf_cols.T))
    return acc


@jax.jit
def _tfd_sim_tile(tf_rows, tf_cols, thresh):
    return _tfd_delta_tile.__wrapped__(tf_rows, tf_cols) < thresh


def _pad_fp(block, n):
    if len(block) == n:
        return block
    out = np.full((n, block.shape[1]), _TFD_PAD_VALUE, dtype=block.dtype)
    out[:len(block)] = block
    return out


def _first_similar_successor(tf_chunk, thresh):
    '''For each row i of a chunk, the smallest j > i with wrapped-L1
    similarity < thresh, or -1 — computed in fixed-shape device tiles
    (the k=1 pass covers the whole active set, so an untiled (L, L, Q)
    tensor would OOM at csearch ensemble sizes).'''
    L = len(tf_chunk)
    first = np.full(L, -1, dtype=np.int64)
    for r0 in range(0, L, _TFD_ROW_TILE):
        r1 = min(r0 + _TFD_ROW_TILE, L)
        rows = jnp.asarray(_pad_fp(tf_chunk[r0:r1], _TFD_ROW_TILE))
        i_g = r0 + np.arange(r1 - r0)
        for c0 in range(r0, L, _TFD_COL_TILE):
            if (first[r0:r1] >= 0).all():
                break
            c1 = min(c0 + _TFD_COL_TILE, L)
            cols = jnp.asarray(_pad_fp(tf_chunk[c0:c1], _TFD_COL_TILE))
            sim = np.asarray(_tfd_sim_tile(rows, cols, thresh))
            sim = sim[:r1 - r0, :c1 - c0]
            valid = sim & (np.arange(c0, c1)[None, :] > i_g[:, None])
            hit = valid.any(axis=1)
            firsts = np.where(hit, valid.argmax(axis=1) + c0, -1)
            undecided = first[r0:r1] < 0
            first[r0:r1] = np.where(undecided & hit, firsts, first[r0:r1])
    return first


def prune_conformers_tfd(structures, quadruplets, thresh=10, tf_mat=None,
                         mesh=None):
    '''
    Prune torsionally-similar structures; returns (pruned, keep_mask).
    Faithful to the reference's bucketed loop (numba_functions.py:142-232):
     * per k in the schedule, run only when k == 1 or 5k < #active
     * chunk boundaries use the ORIGINAL array length, but the last chunk
       ends at the current active count (reference quirk, line 175)
     * within a chunk, each structure contributes an edge to its FIRST
       similar successor only; connected components keep their first node.
    The O(n^2 Q) similarity math runs on device; bookkeeping stays host-side.

    mesh: optional jax.sharding.Mesh — the quadratic first-similar-
    successor search shards its row axis over the mesh (identical
    results; parallel/sharding.sharded_first_similar_successor).
    '''
    structures = np.asarray(structures)
    n = len(structures)
    if n == 0 or len(quadruplets) == 0:
        return structures, np.ones(n, dtype=bool)

    if tf_mat is None:
        tf_mat = np.asarray(torsion_fingerprints(jnp.asarray(structures),
                                                 np.asarray(quadruplets, dtype=np.int32)))

    final_mask = np.ones(n, dtype=bool)

    for k in K_SCHEDULE:
        num_active = int(np.count_nonzero(final_mask))
        if not (k == 1 or 5 * k < num_active):
            continue

        d = int(n // k)
        for step in range(int(k)):
            lo = d * step
            hi = num_active if step == k - 1 else int(d * (step + 1))
            _l = hi - lo
            if _l <= 1:
                continue

            # first similar successor per structure (the reference's
            # `break`). The reference collects matches into a python SET
            # before building the graph (numba_functions.py:180-214), and
            # which component member survives follows the set's iteration
            # order — reproduce that exactly.
            if mesh is not None and mesh.devices.size > 1 and _l > 1:
                from tscode_tpu.parallel.sharding import \
                    sharded_first_similar_successor
                first = sharded_first_similar_successor(
                    tf_mat[lo:lo + _l], float(thresh), mesh)
            else:
                first = _first_similar_successor(tf_mat[lo:lo + _l],
                                                 float(thresh))
            matches = set()
            for i_rel in range(_l):
                if first[i_rel] >= 0:
                    matches.add((int(i_rel), int(first[i_rel])))

            if not matches:
                continue

            g = nx.Graph(matches)
            groups = [tuple(g.subgraph(c).nodes)
                      for c in nx.connected_components(g)]
            best = [group[0] for group in groups]
            for group, keep in zip(groups, best):
                for i in set(group) - {keep}:
                    final_mask[i + lo] = False

    return structures[final_mask], final_mask


def is_new_structure_lru(fingerprints, accept_mask, thresh=10):
    '''
    Host-side replay of string_embed's sequential TFD novelty filter
    (embeds.py:47-69): iterate poses in generation order, keep a pose if
    its fingerprint differs from every previously accepted one.

    NOTE: the reference nominally trims its cache to the last 5 entries,
    but the trim (`lru_cache = lru_cache[1:]`, embeds.py:66-67) rebinds a
    local name and never propagates to the caller, so the effective
    behavior — reproduced here — is comparison against ALL accepted poses.

    fingerprints: (B, Q) float32 (precomputed on device);
    accept_mask: (B,) bool (e.g. the clash mask). Returns (B,) bool.

    The scan is inherently sequential (each acceptance extends the
    comparison cache) — at production ensemble sizes the interpreted
    replay is a host bottleneck, so it runs through the native C++
    loop (native/tfd_lru.cpp) when the toolchain built it.
    '''
    fingerprints = np.asarray(fingerprints)
    if fingerprints.size:
        from tscode_tpu import native
        if native.tfd_available():
            return native.tfd_lru_filter(fingerprints,
                                         np.asarray(accept_mask), thresh)
    out = np.zeros(len(fingerprints), dtype=bool)
    cache = np.empty((0, fingerprints.shape[1]), dtype=fingerprints.dtype)
    for i in np.nonzero(np.asarray(accept_mask))[0]:
        tfp = fingerprints[i]
        if len(cache):
            deltas = np.abs(tfp[None, :] - cache)
            deltas = np.abs(deltas - (deltas > 180) * 360.0)
            if np.any(deltas.sum(axis=1) < thresh):
                continue
        out[i] = True
        cache = np.concatenate([cache, tfp[None, :]])
    return out
