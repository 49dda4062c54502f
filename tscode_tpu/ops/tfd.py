'''
Torsion fingerprint deviation (TFD) screening.

Device side: batched dihedral fingerprints and pairwise wrapped-L1
deltas (replacing the Numba prange of numba_functions.py:234-271).
Host side: the exact bucketed dedup bookkeeping of the reference's
prune_conformers_tfd (numba_functions.py:142-232), including its
first-match-per-structure edge collection and keep-first-of-component
rule, driven by device-computed similarity blocks.
'''

import functools

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


# ---------------------------------------------- device novelty filter
#
# Device-resident exact replay of the string embed's sequential TFD
# novelty filter (reference embeds.py:47-69; host form below). The
# sequential rule — accept pose i iff its fingerprint differs from
# EVERY previously accepted one — is leader clustering, and its
# dependency structure allows an exact parallel evaluation:
#
#  * rejection can only come from an ACCEPTED earlier pose, so poses
#    masked out or already rejected never influence later decisions;
#  * within a block of poses, a pose is DECIDABLE once all its similar
#    predecessors are decided; each resolution round decides at least
#    the first undecided pose, so the rounds loop converges in
#    chain-length iterations (typically 1-3 on clustered ensembles).
#
# The whole filter is ONE jitted program: a lax.scan over fixed-size
# row blocks carrying a fixed-capacity cache of accepted fingerprints
# (compare-vs-cache batched over the block), with the within-block
# chains resolved by a rounds while_loop on the block's similarity
# matrix. Exceeding the cache capacity sets ok=False and the caller
# falls back to the host replay (which stays the sequential oracle).
#
# Accumulation dtype matches the native C++ loop (double) when x64 is
# enabled; on accelerator backends it is f32 — a decision can differ
# from the oracle only for pair sums within f32 epsilon of the
# threshold (the documented TPU-lane tolerance, cf. the clash screen).

# block=4096 measured best on chip at 371,697 survivors (0.153 s vs
# 0.184 at 1024 and 0.264 at 8192 — the scan wall is per-step fixed
# cost until the block pair matrix outgrows fusion; BASELINE.md r5)
_NOVELTY_BLOCK = 4096
_NOVELTY_CACHE = 1024


@jax.jit
def _wrapped_l1_rect(A, B):
    '''(R, Q) x (C, Q) -> (R, C) total wrapped-L1 angle distance in the
    parity accumulation dtype (f64 under x64, else f32).'''
    acc_dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    d = jnp.abs(A.astype(acc_dt)[:, None, :] - B.astype(acc_dt)[None, :, :])
    d = jnp.abs(d - (d > 180) * 360.0)
    return jnp.sum(d, axis=-1)


@functools.partial(jax.jit, static_argnames=('block', 'cache_cap'))
def _tfd_novelty_scan(fps, accept, n_real, thresh, block=_NOVELTY_BLOCK,
                      cache_cap=_NOVELTY_CACHE):
    '''fps (Bp, Q) f32 with Bp a multiple of `block`; accept (Bp,)
    bool; rows at and past n_real are ignored. Returns
    (novel (Bp,) bool, ok scalar bool, n_accepted i32): ok=False means
    the accepted set outgrew cache_cap and the result is INVALID past
    that point — callers must rerun on the host path.'''
    Bp, Q = fps.shape
    n_blocks = Bp // block
    acc_dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    thresh = jnp.asarray(thresh, acc_dt)

    live = jnp.arange(Bp, dtype=jnp.int32) < n_real
    fb = fps.reshape(n_blocks, block, Q)
    ab = (accept & live).reshape(n_blocks, block)

    pos = jnp.arange(block)
    predm = pos[None, :] < pos[:, None]          # [i, j]: j precedes i
    cslot = jnp.arange(cache_cap + 1)

    def blk(carry, xs):
        cache, count, ok = carry
        f, a = xs

        # vs the accepted cache (all global predecessors)
        sc = _wrapped_l1_rect.__wrapped__(f, cache)
        cache_hit = jnp.any((sc < thresh) & (cslot[None, :] < count),
                            axis=1)

        und0 = a & ~cache_hit

        # the within-block similarity matrix (the block scan's biggest
        # HBM term) is only needed when some row survived the cache
        # compare — in steady state whole blocks are cache-hits and the
        # cond skips the (L, L, Q) evaluation entirely
        def with_rounds(_):
            simB = (_wrapped_l1_rect.__wrapped__(f, f) < thresh) & predm

            def undecided(st):
                return jnp.any(st[0])

            def resolve(st):
                und, acc_b = st
                has_und_pred = jnp.any(simB & und[None, :], axis=1)
                dec = und & ~has_und_pred
                rej = jnp.any(simB & acc_b[None, :], axis=1)
                return und & ~dec, acc_b | (dec & ~rej)

            return jax.lax.while_loop(
                undecided, resolve,
                (und0, jnp.zeros(block, dtype=bool)))[1]

        acc_b = jax.lax.cond(jnp.any(und0), with_rounds,
                             lambda _: jnp.zeros(block, dtype=bool), 0)

        # append accepted fingerprints to the cache in block order;
        # non-accepted (and overflow) rows land in the dump slot
        n_acc = jnp.sum(acc_b).astype(jnp.int32)
        rank = (jnp.cumsum(acc_b) - 1).astype(jnp.int32)
        slot = jnp.where(acc_b & (count + rank < cache_cap),
                         count + rank, cache_cap)
        cache = cache.at[slot].set(f)
        ok = ok & (count + n_acc <= cache_cap)
        count = jnp.minimum(count + n_acc, cache_cap)
        return (cache, count, ok), acc_b

    carry0 = (jnp.full((cache_cap + 1, Q), _TFD_PAD_VALUE, fps.dtype),
              jnp.asarray(0, jnp.int32), jnp.asarray(True))
    (_, count, ok), novel = jax.lax.scan(blk, carry0, (fb, ab))
    return novel.reshape(-1), ok, count


def tfd_novelty_device(fingerprints, accept_mask=None, thresh=10,
                       block=None, cache_cap=_NOVELTY_CACHE):
    '''Device form of is_new_structure_lru over a (possibly
    device-resident) fingerprint tensor: only the novelty BITMASK
    crosses the link. Returns (novel (B,) numpy bool, ok): ok=False
    (cache overflow or no torsions) means the caller must use the host
    replay instead. Rows are padded to fixed pow2 buckets so
    executables are reused across survivor counts.'''
    if block is None:
        # the scan's wall at production survivor counts is per-step
        # fixed cost, not pair math — larger blocks cut step count
        # (identical results at any block size; parity tests sweep it)
        import os
        try:
            block = int(os.environ.get('TSCODE_TFD_BLOCK',
                                       _NOVELTY_BLOCK))
        except ValueError:
            block = _NOVELTY_BLOCK
    # the scan reshapes a pow2-padded pool into blocks, so the block
    # size must itself be a pow2 (and sane): round up rather than crash
    # on a hand-set TSCODE_TFD_BLOCK like 3000 or 0
    if block < 8 or block & (block - 1):
        block = max(8, 1 << max(0, int(block) - 1).bit_length())
    B = int(fingerprints.shape[0])
    Q = int(fingerprints.shape[1]) if fingerprints.ndim == 2 else 0
    if B == 0 or Q == 0:
        return np.zeros(B, dtype=bool), False
    Bp = max(block, 1 << max(0, (B - 1)).bit_length())
    fps = jnp.asarray(fingerprints)
    if Bp > B:
        fps = jnp.pad(fps, ((0, Bp - B), (0, 0)))
    if accept_mask is None:
        acc = jnp.ones(Bp, dtype=bool)
    else:
        acc = jnp.asarray(np.pad(np.asarray(accept_mask, dtype=bool),
                                 (0, Bp - B)))
    novel, ok, _ = _tfd_novelty_scan(fps, acc, jnp.asarray(B, jnp.int32),
                                     jnp.asarray(float(thresh)),
                                     block=block, cache_cap=cache_cap)
    if not bool(ok):
        return np.zeros(B, dtype=bool), False
    return np.asarray(novel)[:B], True


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
