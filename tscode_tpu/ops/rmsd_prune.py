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
import os

import jax
import jax.numpy as jnp
import numpy as np

from tscode_tpu.ops.linalg import (_horn_key_matrix, _qcp_lambda_max,
                                   _quaternion_from_key,
                                   quaternion_to_rotation_matrix)

# Pair-kernel experiment switch (perf A/B on chip; 'base' is production):
#   base    einsum S (f32) + fused lambda chain — the measured default
#   flatmm  S as ONE (3Lr, N)@(N, 3Lc) dot per block (layout experiment)
#   mxubf16 einsum on bf16-cast inputs, f32 accumulate (MXU fast path;
#           NOT survivor-exact — diagnostic only)
#   newton6 6 Newton steps instead of 12 (diagnostic only: isolates
#           whether the pass is bound by the fused elementwise chain)
#
# MEASURED on one v5e, 2026-08-19, full tier-2 pipeline at 1.66M poses
# (BASELINE.md "tier-2 pair-kernel A/B"): base 3.38 s/rep,
# flatmm 5.76 s, newton6 3.35 s, mxubf16 3.38 s. Neither the MXU
# einsum nor the lambda chain is the bound — the pass is limited by
# pair-block data movement and schedule structure, so a bf16
# pre-screen (whose ideal case mxubf16 measures at ±0%) is settled:
# not worth building. 'base' stays production.
_QCP_VARIANT = os.environ.get('TSCODE_QCP_VARIANT', 'base')


def _pair_correlation(Pr, Qc):
    '''S[b,p,q,i,k] = sum_n Pr[b,p,n,i] * Qc[b,q,n,k] under the active
    experiment variant. Shapes: Pr (B, Lr, N, 3), Qc (B, Lc, N, 3).'''
    if _QCP_VARIANT == 'flatmm':
        B, Lr, N, _ = Pr.shape
        Lc = Qc.shape[1]
        A = Pr.transpose(0, 1, 3, 2).reshape(B, Lr * 3, N)
        Bm = Qc.transpose(0, 1, 3, 2).reshape(B, Lc * 3, N)
        flat = jnp.einsum('bxn,byn->bxy', A, Bm)
        return flat.reshape(B, Lr, 3, Lc, 3).transpose(0, 1, 3, 2, 4)
    if _QCP_VARIANT == 'mxubf16':
        return jnp.einsum('bpni,bqnk->bpqik',
                          Pr.astype(jnp.bfloat16), Qc.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.einsum('bpni,bqnk->bpqik', Pr, Qc)


def _lambda_max_variant(S, GA, GB):
    if _QCP_VARIANT == 'newton6':
        return _qcp_lambda_max(S, GA, GB, newton_iters=6)
    return _qcp_lambda_max(S, GA, GB)

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


def _pair_gate_matrices(P, n_atoms):
    '''
    Pairwise (A, A) rmsd AND maxdev matrices over one pose block,
    computing the QCP correlation ONCE for both gates (the block
    screens previously evaluated S twice — once for the lambda-only
    rmsd matrix, once inside the per-pair maxdev path).
    P: (A, N, 3) -> (rmsd (A, A), maxdev (A, A)).
    '''
    S = jnp.einsum('ani,bnk->abik', P, P)
    G = jnp.sum(P * P, axis=(-2, -1))
    GA, GB = G[:, None], G[None, :]
    lam = _qcp_lambda_max(S, GA, GB)
    msd = (GA + GB - 2.0 * lam) / n_atoms
    rmsd = jnp.sqrt(jnp.maximum(msd, 0.0))

    K = _horn_key_matrix(S)
    q_wxyz = _quaternion_from_key(K, lam)
    q_xyzw = jnp.concatenate([q_wxyz[..., 1:], q_wxyz[..., :1]], axis=-1)
    R = quaternion_to_rotation_matrix(q_xyzw)
    diff = jnp.einsum('abij,anj->abni', R, P) - P[None, :, :, :]
    maxdev = jnp.max(jnp.sqrt(jnp.sum(diff * diff, axis=-1)), axis=-1)
    return rmsd, maxdev


def _pad_to(x, n, axis=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths)


_COL_BLOCK = 2048


@functools.partial(jax.jit, static_argnames=('col_block',))
def _fused_kill_rows(P_tile, Q_all, i0, m_real, rmsd_thr, col_block=_COL_BLOCK):
    '''
    Kill bits for one row tile against ALL columns, both gates fused on
    device: row i (global index i0+t) dies when any column j > i with
    j < m_real satisfies rmsd < thr AND maxdev < 2*thr. The column axis
    is scanned in blocks so the (T, C, N, 3) rotation intermediate stays
    VMEM-sized; nothing but a (T,) bool ever leaves the device.
    P_tile (T, N, 3); Q_all (M_pad, N, 3) with M_pad % col_block == 0.
    '''
    T, N = P_tile.shape[0], P_tile.shape[1]
    n_blocks = Q_all.shape[0] // col_block
    n_dt = jnp.asarray(N, P_tile.dtype)

    GA = jnp.sum(P_tile * P_tile, axis=(-2, -1))            # (T,)
    i_global = i0 + jnp.arange(T)

    def body(kill, b):
        Q = jax.lax.dynamic_slice_in_dim(Q_all, b * col_block, col_block)
        S = jnp.einsum('tni,cnk->tcik', P_tile, Q)
        GB = jnp.sum(Q * Q, axis=(-2, -1))                  # (C,)
        lam = _qcp_lambda_max(S, GA[:, None], GB[None, :])
        msd = (GA[:, None] + GB[None, :] - 2.0 * lam) / n_dt
        rmsd = jnp.sqrt(jnp.maximum(msd, 0.0))

        j_global = b * col_block + jnp.arange(col_block)
        valid = (j_global[None, :] > i_global[:, None]) & \
            (j_global[None, :] < m_real)
        hit = _two_gate_hits(rmsd, valid, rmsd_thr, N, S, lam, P_tile, Q)
        return kill | jnp.any(hit, axis=1), None

    kill0 = jnp.zeros(T, dtype=bool)
    kill, _ = jax.lax.scan(body, kill0, jnp.arange(n_blocks))
    return kill


@jax.jit
def _fused_kill_blocks(P_blocks, m_real, rmsd_thr):
    '''
    Batched within-block kill bits for MANY small chunks at once (the
    large-k passes of the bucket schedule, where per-chunk work is tiny
    and per-call dispatch would dominate). P_blocks (B, L, N, 3) zero-
    padded chunks; m_real (B,) live rows per chunk. Row i of block b dies
    when some j > i (j < m_real[b]) passes both similarity gates.
    Returns (B, L) bool.
    '''
    L = P_blocks.shape[1]
    idx = jnp.arange(L)
    valid = (idx[None, None, :] > idx[None, :, None]) & \
        (idx[None, None, :] < m_real[:, None, None])
    # the whole two-gate evaluation lives in ONE place
    return _pair_kill_core(P_blocks, valid, rmsd_thr)


_SMALL_CHUNK = 256


def _kill_bits_batched_pass(heavy, chunk_indices, rmsd_thr):
    '''One bucket pass where every chunk is small: pad chunks to a common
    length and evaluate them all in one (or a few) device calls.
    chunk_indices: list of int arrays (active indices per chunk).
    Returns a flat kill index array (into heavy).'''
    L = max(len(idx) for idx in chunk_indices)
    L_pad = max(8, int(2 ** np.ceil(np.log2(L))))
    B = len(chunk_indices)
    N = heavy.shape[1]

    P = np.zeros((B, L_pad, N, 3), dtype=heavy.dtype)
    m_real = np.zeros(B, dtype=np.int32)
    for b, idx in enumerate(chunk_indices):
        P[b, :len(idx)] = heavy[idx]
        m_real[b] = len(idx)

    killed = []
    # bound the per-call footprint: the exact branch materializes two
    # (B_sub, L, L, N, 3) tensors, so the per-pair cost scales with the
    # atom count (f64 on the CPU test config doubles it again)
    per_pair = 100 + 48 * N
    b_step = max(1, int(2e8 // max(L_pad * L_pad * per_pair, 1)))
    for b0 in range(0, B, b_step):
        bits = np.asarray(_fused_kill_blocks(
            jnp.asarray(P[b0:b0 + b_step]),
            jnp.asarray(m_real[b0:b0 + b_step]),
            jnp.asarray(rmsd_thr, P.dtype)))
        for b_rel, idx in enumerate(chunk_indices[b0:b0 + b_step]):
            killed.extend(idx[bits[b_rel, :len(idx)]])
    return np.array(killed, dtype=np.int64)


def chunk_kill_bits(heavy_structures, rmsd_thr, row_tile=_ROW_TILE,
                    col_block=_COL_BLOCK):
    '''
    Streaming kill decision for one active chunk: position i dies when any
    later position j has rmsd < thr AND maxdev < 2*thr. Fully fused on
    device in (row_tile x col_block) pair blocks — no pair matrix is ever
    materialized on host. heavy_structures: (M, N, 3) active structures
    in chunk order. Returns (M,) bool kill mask.
    '''
    m = heavy_structures.shape[0]
    if m <= 1:
        return np.zeros(m, dtype=bool)

    # fixed pow2 executable shapes (remote compiles cost 5-30 s each and
    # the cache is unreliable — see CLAUDE.md): col blocks come from the
    # {128, 256, ..., col_block} pow2 ladder
    cb = min(col_block, _pow2(m, floor=128))
    m_pad_c = int(np.ceil(m / cb)) * cb
    m_pad_r = int(np.ceil(m / row_tile)) * row_tile
    dev_cols = jnp.asarray(_pad_to(heavy_structures, m_pad_c))
    dev_rows = jnp.asarray(_pad_to(heavy_structures, m_pad_r))

    kill = np.zeros(m, dtype=bool)
    for r0 in range(0, m_pad_r, row_tile):
        bits = np.asarray(_fused_kill_rows(
            dev_rows[r0:r0 + row_tile], dev_cols,
            jnp.asarray(r0, jnp.int32), jnp.asarray(m, jnp.int32),
            jnp.asarray(rmsd_thr, dev_rows.dtype), col_block=cb))
        hi = min(r0 + row_tile, m)
        kill[r0:hi] = bits[:hi - r0]
    return kill


def prune_conformers_rmsd(structures, atomnos, rmsd_thr=0.5, mesh=None):
    '''
    Remove similar structures; returns (pruned, keep_mask). Reproduces
    the reference's k-bucket schedule and keep/kill semantics
    (rmsd_pruning.py:164-206): per pass, structure i dies when any
    later structure j of the same chunk, active at pass start, has
    rmsd < thr and maxdev < 2*thr.

    mesh: optional jax.sharding.Mesh — runs the identical-semantics
    SPMD whole-schedule pruner sharded over the pose axis
    (parallel/prune.py) instead of the single-device path.
    '''
    structures = np.asarray(structures)
    atomnos = np.asarray(atomnos)
    n = len(structures)
    if n <= 1:
        return structures, np.ones(n, dtype=bool)

    heavy = atomnos != 1
    heavy_structures = np.ascontiguousarray(structures[:, heavy])

    if mesh is not None and mesh.devices.size > 1:
        from tscode_tpu.parallel.prune import sharded_prune_rmsd
        mask = sharded_prune_rmsd(heavy_structures, mesh,
                                  rmsd_thr=rmsd_thr)
        return structures[mask], mask

    # on accelerator backends with sizable ensembles, the per-pass host
    # orchestration below pays one dispatch+pull round trip per pass —
    # route through the device-resident scheduler instead (identical
    # semantics, parity-tested)
    if n >= 2048 and jax.default_backend() not in ('cpu',):
        mask = prune_conformers_rmsd_device(
            jnp.asarray(heavy_structures), rmsd_thr=rmsd_thr)
        return structures[mask], mask

    out_mask = np.ones(n, dtype=bool)

    for k in K_SCHEDULE:
        active_count = int(np.count_nonzero(out_mask))
        if not (k == 1 or 20 * k < active_count):
            continue

        chunksize = int(n // k)
        new_mask = out_mask.copy()

        chunk_indices = []
        for chunk in range(int(k)):
            first = chunk * chunksize
            last = n if chunk == k - 1 else chunksize * (chunk + 1)
            idx = np.nonzero(out_mask[first:last])[0] + first
            if len(idx) > 1:
                chunk_indices.append(idx)

        if not chunk_indices:
            continue

        max_len = max(len(idx) for idx in chunk_indices)
        if max_len <= _SMALL_CHUNK and len(chunk_indices) > 1:
            # many small chunks -> one batched device pass
            killed = _kill_bits_batched_pass(
                heavy_structures, chunk_indices, rmsd_thr)
            new_mask[killed] = False
        else:
            for idx in chunk_indices:
                kill = chunk_kill_bits(heavy_structures[idx], rmsd_thr)
                new_mask[idx[kill]] = False

        out_mask = new_mask

    return structures[out_mask], out_mask


# ------------------------------------------------------ device-resident

# ------------------------------------------------------ device-resident
#
# The structures tensor stays on device for the whole schedule; the
# liveness mask lives on HOST (tiny, cheap to move) and every pass runs
# as one or two batched device calls over GATHERED active chunks, padded
# to power-of-two buckets so executables are reused across passes and
# runs. This keeps both the quadratic work (scales with ACTIVE counts,
# not chunk spans) and the call/compile count minimal.


def _pair_kill_core(P, valid, rmsd_thr):
    '''
    Shared two-gate QCP pair evaluation: P (B, L, N, 3) blocks,
    valid (B, L, L) bool pair eligibility. Row p of block b dies when
    some valid (p, q) pair passes rmsd < thr AND maxdev < 2*thr.
    Returns (B, L) bool kill bits.

    The maxdev gate is mostly IMPLIED by the rmsd gate: the per-atom
    deviations after optimal rotation satisfy sum_n dev_n^2 = N*msd,
    so maxdev <= sqrt(N)*rmsd. With rmsd < thr this makes
    maxdev < 2*thr automatic whenever N <= 4, and for N > 4 only
    pairs in the band rmsd >= 2*thr/sqrt(N) can fail it — the
    expensive eigenvector/rotation path runs only for those (rare)
    ambiguous pairs, under a cond.
    '''
    N = P.shape[2]
    n_dt = jnp.asarray(N, P.dtype)

    # (no radius lower-bound screen here: unlike _gathered_kill_stream,
    # where lb gates a cond that skips the QCP work, this kernel computes
    # S/lambda for every pair anyway — a pre-gate would add FLOPs and an
    # f32-roundoff parity edge at the threshold without saving anything)
    cand = valid

    S = _pair_correlation(P, P)
    G = jnp.sum(P * P, axis=(-2, -1))
    lam = _lambda_max_variant(S, G[:, :, None], G[:, None, :])
    msd = (G[:, :, None] + G[:, None, :] - 2.0 * lam) / n_dt
    rmsd = jnp.sqrt(jnp.maximum(msd, 0.0))

    gate1 = (rmsd < rmsd_thr) & cand
    if N <= 4:
        return jnp.any(gate1, axis=2)

    ambiguous = gate1 & (jnp.sqrt(float(N)) * rmsd >= 2.0 * rmsd_thr)

    def exact(_):
        K = _horn_key_matrix(S)
        q_wxyz = _quaternion_from_key(K, lam)
        q_xyzw = jnp.concatenate([q_wxyz[..., 1:], q_wxyz[..., :1]],
                                 axis=-1)
        R = quaternion_to_rotation_matrix(q_xyzw)
        rotated = jnp.einsum('bpqij,bpnj->bpqni', R, P)
        diff = rotated - P[:, None]
        maxdev = jnp.sqrt(jnp.max(jnp.sum(diff * diff, axis=-1),
                                  axis=-1))
        return ambiguous & (maxdev < 2.0 * rmsd_thr)

    hit2 = jax.lax.cond(jnp.any(ambiguous), exact,
                        lambda _: jnp.zeros_like(ambiguous), 0)
    return jnp.any((gate1 & ~ambiguous) | hit2, axis=2)


def _tail_kill_tiled(Pt, at, rmsd_thr):
    '''
    Within-chunk pass-start-mask kill over ONE large chunk, evaluated
    as (tile x tile) pair blocks — lax.map over row tiles, lax.scan
    over column tiles — so peak pair memory is tile^2 regardless of
    the chunk size. Matches the reference's LAST-chunk semantics for
    the k-bucket passes (rmsd_pruning.py:139-148: the remainder chunk
    can be arbitrarily large) without the (tail, tail, 3, 3)
    covariance block that OOMs past ~16k rows.
    Pt (Tp, N, 3) padded pow2, at (Tp,) pass-start liveness.
    '''
    tile = _TAIL_TILE
    Tp = Pt.shape[0]
    N = Pt.shape[1]
    nt = Tp // tile
    Pb = Pt.reshape(nt, tile, N, 3)
    ab = at.reshape(nt, tile)
    pos = jnp.arange(Tp, dtype=jnp.int32).reshape(nt, tile)

    def row_tile(args):
        Pr, ar, pr = args

        def col_step(kill_r, cargs):
            Pc, ac, pc = cargs
            valid = ar[:, None] & ac[None, :] & \
                (pc[None, :] > pr[:, None])
            hit = _pair_kill_rect(Pr[None], Pc[None], valid[None],
                                  rmsd_thr)[0]
            return kill_r | hit, None

        kill_r, _ = jax.lax.scan(col_step,
                                 jnp.zeros(tile, dtype=bool),
                                 (Pb, ab, pos))
        return kill_r

    return jax.lax.map(row_tile, (Pb, ab, pos)).reshape(Tp)


@jax.jit
def _gathered_kill_blocks(hs, idx, m_real, rmsd_thr):
    '''
    Batched within-block kill over gathered active rows.
    hs (n, N, 3) device-resident pool; idx (B, L) int32 row indices
    (padded entries >= n, clipped for the gather and masked out);
    m_real (B,) live rows per block. Row p of block b dies when some
    q in (p, m_real[b]) passes rmsd < thr AND maxdev < 2*thr.
    Returns (B, L) bool.
    '''
    n = hs.shape[0]
    P = hs[jnp.clip(idx, 0, n - 1)]                   # (B, L, N, 3)
    L = P.shape[1]
    pos = jnp.arange(L)
    valid = (pos[None, None, :] > pos[None, :, None]) & \
        (pos[None, None, :] < m_real[:, None, None])
    return _pair_kill_core(P, valid, rmsd_thr)


def _inplace_body(hs, alive, rmsd_thr, span_real, span_pad, n_chunks,
                  tail_real, tail_pad):
    '''
    One ENTIRE schedule pass fused into a single device program for the
    high-k regime (small chunk spans): chunk blocks are cut straight
    from the pool by POSITION (no host-side gather of active rows — the
    liveness mask supplies pair validity instead), kills are scattered
    back into the device-resident mask, and only the surviving count
    leaves the device. This removes the per-pass host round trips that
    dominate on high-latency links.

    Chunks c = 0..n_chunks-1 cover rows [c*span_real, c*span_real +
    span_real); the reference's LAST chunk (rows [n_chunks*span_real,
    n)) is evaluated as one extra block of tail_real rows padded to
    tail_pad. All kill decisions use the PASS-START mask (reference
    rmsd_pruning.py:123-162 semantics). Returns (alive', n_active').
    '''
    n_pool = hs.shape[0]
    N = hs.shape[1]
    span = n_chunks * span_real

    # chunk windows never read past their own span (rows beyond it are
    # masked dead), so the block tensor is a RESHAPE + pad of the pool
    # prefix — no gather, and the kill writeback is a reshape too
    # (device gathers/scatters of small rows measured ~100x slower)
    P = jnp.pad(hs[:span].reshape(n_chunks, span_real, N, 3),
                ((0, 0), (0, span_pad - span_real), (0, 0), (0, 0)))
    a = jnp.pad(alive[:span].reshape(n_chunks, span_real),
                ((0, 0), (0, span_pad - span_real)))
    r = jnp.arange(span_pad, dtype=jnp.int32)
    tri = r[None, :] > r[:, None]

    def kill_chunks(Pc, ac):
        valid = ac[:, :, None] & ac[:, None, :] & tri[None]
        return _pair_kill_core(Pc, valid, rmsd_thr)[:, :span_real]

    # the pair covariance tensor is (chunks, span_pad, span_pad, 3, 3):
    # past the budget (multi-million-pose pools: 10k chunks at span 256
    # is a 23.6 GB allocation) the chunk axis runs through a lax.map of
    # group-sized steps — chunks are independent, so this is pure
    # memory bounding with identical results
    group = max(1, _PAIR_CHUNK_BUDGET // (span_pad * span_pad))
    if n_chunks <= group:
        kill = kill_chunks(P, a)
    else:
        n_groups = -(-n_chunks // group)
        pad_c = n_groups * group - n_chunks
        Pg = jnp.pad(P, ((0, pad_c), (0, 0), (0, 0), (0, 0))) \
            .reshape(n_groups, group, span_pad, N, 3)
        ag = jnp.pad(a, ((0, pad_c), (0, 0))) \
            .reshape(n_groups, group, span_pad)
        kill = jax.lax.map(lambda t: kill_chunks(*t), (Pg, ag))
        kill = kill.reshape(n_groups * group, span_real)[:n_chunks]

    # tail chunk: rows [span, span + tail_real), contiguous slice. Past
    # _TAIL_BLOCK_MAX padded rows the single (tail, tail, 3, 3) block
    # would be multi-GB — evaluate tiled instead (identical results)
    tail_take = min(tail_pad, n_pool - span)
    rt = jnp.arange(tail_pad, dtype=jnp.int32)
    Pt = jnp.pad(hs[span:span + tail_take],
                 ((0, tail_pad - tail_take), (0, 0), (0, 0)))
    at = jnp.pad(alive[span:span + tail_take],
                 (0, tail_pad - tail_take)) & (rt < tail_real)
    if tail_pad > _TAIL_BLOCK_MAX:
        kill_t = _tail_kill_tiled(Pt, at, rmsd_thr)[:tail_take]
    else:
        valid_t = at[None, :, None] & at[None, None, :] & \
            (rt[None, None, :] > rt[None, :, None])
        kill_t = _pair_kill_core(Pt[None], valid_t, rmsd_thr)[0][:tail_take]

    kill_flat = jnp.concatenate([
        kill.reshape(span),
        kill_t,
        jnp.zeros(n_pool - span - tail_take, dtype=bool)])
    return alive & ~kill_flat


@functools.partial(jax.jit, static_argnames=(
    'span_real', 'span_pad', 'n_chunks', 'tail_real', 'tail_pad'))
def _inplace_pass(hs, alive, rmsd_thr, span_real, span_pad, n_chunks,
                  tail_real, tail_pad):
    alive = _inplace_body(hs, alive, rmsd_thr, span_real, span_pad,
                          n_chunks, tail_real, tail_pad)
    return alive, jnp.sum(alive)


def _amb_slot_hits(ambiguous, rows, cols, row_of, col_of, rmsd_thr,
                   slots):
    '''
    Second-gate (maxdev) hits for the AMBIGUOUS pairs only, gathered
    into `slots` fixed slots: the ambiguous rmsd band is a thin shell
    (sqrt(N)-bound gate), so on multi-million-pair grids a handful of
    pairs are ambiguous — yet any() over the grid nearly always finds
    one, which used to run the dense rotation path over EVERY pair of
    the tile (the (.., N, 3) rotated/diff tensors dominated the banded
    passes' HBM traffic). Gathering the flagged pairs and recomputing
    their correlation per pair keeps the cond's operands tiny.

    The per-pair S/lambda are recomputed from the gathered coordinates
    (`_maxdev_pairs`), so results can differ from the dense branch by
    contraction-order roundoff — a kill flips only for a pair sitting
    within fp epsilon of the 2*thr maxdev boundary, and the dense
    branch still serves counts past `slots` (exactness fallback).

    ambiguous: (..., ) bool grid; rows/cols: flat (R, N, 3)/(C, N, 3)
    pools; row_of/col_of: flat pair index -> pool index maps.
    Returns a hit grid shaped like `ambiguous`.
    '''
    shape = ambiguous.shape
    total = int(np.prod(shape))
    idx = jnp.nonzero(ambiguous.reshape(total), size=slots,
                      fill_value=total)[0]
    ic = jnp.minimum(idx, total - 1)
    Pg = rows[row_of(ic)]
    Qg = cols[col_of(ic)]
    maxdev = _maxdev_pairs(Pg, Qg)
    ok = (idx < total) & (maxdev < 2.0 * rmsd_thr)
    out = jnp.zeros(total + 1, dtype=bool)
    out = out.at[jnp.where(ok, idx, total)].set(True)
    return out[:total].reshape(shape)


# fixed slot count for the compacted ambiguous-pair second gate; tiles
# whose ambiguous count exceeds it fall back to the dense rotation
# branch (bitwise the pre-compaction behavior)
_AMB_SLOTS = 4096


def _two_gate_hits(rmsd, cand, rmsd_thr, N, Sm, lam, P, Q):
    '''
    Two-gate hit bits for a (T, C) pair tile given the already-computed
    rmsd + candidates. Exploits maxdev <= sqrt(N)*rmsd (sum of squared
    per-atom deviations equals N*msd): for N <= 4 the maxdev gate is
    implied, and otherwise the eigenvector/rotation path runs only for
    the ambiguous pairs — compacted into _AMB_SLOTS gather slots
    (_amb_slot_hits), with the dense whole-tile rotation branch kept
    for tiles whose ambiguous count exceeds the slots.
    '''
    gate1 = (rmsd < rmsd_thr) & cand
    if N <= 4:
        return gate1

    ambiguous = gate1 & (jnp.sqrt(float(N)) * rmsd >= 2.0 * rmsd_thr)
    C = rmsd.shape[1]

    def compact(_):
        return _amb_slot_hits(ambiguous, P, Q, lambda i: i // C,
                              lambda i: i % C, rmsd_thr, _AMB_SLOTS)

    def dense(_):
        K = _horn_key_matrix(Sm)
        q_wxyz = _quaternion_from_key(K, lam)
        q_xyzw = jnp.concatenate([q_wxyz[..., 1:], q_wxyz[..., :1]],
                                 axis=-1)
        R = quaternion_to_rotation_matrix(q_xyzw)
        rotated = jnp.einsum('tcij,tnj->tcni', R, P)
        diff = rotated - Q[None]
        maxdev = jnp.sqrt(jnp.max(jnp.sum(diff * diff, axis=-1), axis=-1))
        return ambiguous & (maxdev < 2.0 * rmsd_thr)

    n_amb = jnp.sum(ambiguous)
    hit2 = jax.lax.cond(
        n_amb == 0, lambda _: jnp.zeros_like(ambiguous),
        lambda _: jax.lax.cond(n_amb <= _AMB_SLOTS, compact, dense, 0),
        0)
    return (gate1 & ~ambiguous) | hit2


@functools.partial(jax.jit, static_argnames=('row_tile', 'col_block'))
def _gathered_kill_stream(sub, n_act, rmsd_thr,
                          row_tile=_ROW_TILE, col_block=_COL_BLOCK):
    '''
    Kill bits for ONE large compacted chunk (rows gathered in order):
    row i dies when some j in (i, n_act) passes both gates. Streams the
    column axis so intermediates stay VMEM-sized; a rotation-invariant
    per-atom-radius lower bound on the (uncentered) Kabsch MSD
    (msd >= mean_k (|p_k| - |q_k|)^2) lets blocks with no candidate
    pair skip the QCP work entirely. sub (S, N, 3), S divisible by both
    tiles. Returns (S,) bool.
    '''
    S, N = sub.shape[0], sub.shape[1]
    n_dt = jnp.asarray(N, sub.dtype)
    n_tiles = S // row_tile
    n_cblocks = S // col_block

    radii = jnp.sqrt(jnp.maximum(jnp.sum(sub * sub, axis=-1), 0.0))
    r2_mean = jnp.mean(radii * radii, axis=-1)

    def row_body(r, kill_acc):
        r0 = r * row_tile
        P = jax.lax.dynamic_slice_in_dim(sub, r0, row_tile)
        rP = jax.lax.dynamic_slice_in_dim(radii, r0, row_tile)
        rP2 = jax.lax.dynamic_slice_in_dim(r2_mean, r0, row_tile)
        GA = jnp.sum(P * P, axis=(-2, -1))
        i_loc = r0 + jnp.arange(row_tile)

        def col_body(c, kill_rows):
            c0 = c * col_block
            j_loc = c0 + jnp.arange(col_block)
            valid = (j_loc[None, :] > i_loc[:, None]) & \
                (j_loc[None, :] < n_act)

            rQ = jax.lax.dynamic_slice_in_dim(radii, c0, col_block)
            rQ2 = jax.lax.dynamic_slice_in_dim(r2_mean, c0, col_block)
            lb = rP2[:, None] + rQ2[None, :] \
                - (2.0 / N) * jnp.einsum('tn,cn->tc', rP, rQ)
            cand = (lb < rmsd_thr * rmsd_thr) & valid

            def heavy(kill_rows):
                Q = jax.lax.dynamic_slice_in_dim(sub, c0, col_block)
                Sm = jnp.einsum('tni,cnk->tcik', P, Q)
                GB = jnp.sum(Q * Q, axis=(-2, -1))
                lam = _qcp_lambda_max(Sm, GA[:, None], GB[None, :])
                msd = (GA[:, None] + GB[None, :] - 2.0 * lam) / n_dt
                rmsd = jnp.sqrt(jnp.maximum(msd, 0.0))
                hit = _two_gate_hits(rmsd, cand, rmsd_thr, N, Sm, lam,
                                     P, Q)
                return kill_rows | jnp.any(hit, axis=1)

            return jax.lax.cond(jnp.any(cand), heavy, lambda kk: kk,
                                kill_rows)

        kill_rows = jax.lax.fori_loop(
            0, n_cblocks, col_body, jnp.zeros(row_tile, dtype=bool))
        return jax.lax.dynamic_update_slice_in_dim(kill_acc, kill_rows, r0, 0)

    return jax.lax.fori_loop(0, n_tiles, row_body,
                             jnp.zeros(S, dtype=bool))


def _finish_body(hs, alive, n, rmsd_thr, s_pad, axis_name=None, n_dev=1):
    '''
    Run the ENTIRE remaining k-bucket schedule in one device program:
    actives are compacted once (order-preserving nonzero), every
    schedule pass evaluates its 20k<active gate on device and streams
    row tiles over the compacted block with pair validity
    alive(p) & alive(q) & q>p & same-chunk (chunk = original position
    // (n//k), capped at k-1 like the reference's trailing chunk).
    Re-evaluating already-run ks is a no-op (surviving pairs were
    already compared under identical boundaries), so the full schedule
    is always safe. Returns (updated pool mask, n_active).

    axis_name/n_dev (static): SPMD mode for shard_map callers with
    REPLICATED inputs (same contract as _mid_body) — each pass's row
    tiles partition contiguously across chips and the per-pass kill
    bits OR-combine with one psum, so every chip carries the identical
    mask into the next pass. Bit-identical to the single-device run
    (kills use the pass-start mask either way).
    '''
    n_pool = hs.shape[0]
    idx = jnp.nonzero(alive, size=s_pad, fill_value=n_pool)[0]
    real = idx < n_pool
    idx_c = jnp.clip(idx, 0, n_pool - 1)
    sub = hs[idx_c]                                    # (S, N, 3)
    N = sub.shape[1]
    n_dt = jnp.asarray(N, sub.dtype)

    radii = jnp.sqrt(jnp.maximum(jnp.sum(sub * sub, axis=-1), 0.0))
    r2_mean = jnp.mean(radii * radii, axis=-1)
    G_all = jnp.sum(sub * sub, axis=(-2, -1))
    S_len = sub.shape[0]
    row_tile = min(_FINISH_ROW_TILE, S_len)
    n_tiles = S_len // row_tile

    # schedule as data: ONE pass body compiled once, k dynamic inside
    # (static filter: active <= s_pad, so ks with 20k >= s_pad can
    # never pass their gate — dropping them shortens the loop)
    ks = jnp.asarray([int(k) for k in K_SCHEDULE
                      if k == 1 or 20 * k < s_pad], jnp.int32)

    def one_pass(a, k):
        cs = jnp.maximum(n // k, 1)
        chunk = jnp.minimum(idx // cs, k - 1)

        def do(a):
            # each row tile is evaluated against the FULL column span in
            # one dense shot: per-(row,col)-block conds were launch-bound
            # at tier-2 configs (~0.2-0.5 ms sequencing each x 2,048
            # conds per schedule while the prescreen nearly always
            # fired); S_len <= 4096 here so the dense (row_tile, S_len)
            # pair tensors stay well under HBM. Kill semantics are
            # identical — kills are collected against the pass-start
            # alive mask either way.
            def row_body(r, kill_acc):
                r0 = r * row_tile
                P = jax.lax.dynamic_slice_in_dim(sub, r0, row_tile)
                rP = jax.lax.dynamic_slice_in_dim(radii, r0, row_tile)
                rP2 = jax.lax.dynamic_slice_in_dim(r2_mean, r0, row_tile)
                GA = jax.lax.dynamic_slice_in_dim(G_all, r0, row_tile)
                aP = jax.lax.dynamic_slice_in_dim(a, r0, row_tile)
                cP = jax.lax.dynamic_slice_in_dim(chunk, r0, row_tile)
                i_loc = r0 + jnp.arange(row_tile)

                j_loc = jnp.arange(S_len)
                valid = aP[:, None] & a[None, :] & \
                    (j_loc[None, :] > i_loc[:, None]) & \
                    (cP[:, None] == chunk[None, :])
                lb = rP2[:, None] + r2_mean[None, :] \
                    - (2.0 / N) * jnp.einsum('tn,cn->tc', rP, radii)
                cand = (lb < rmsd_thr * rmsd_thr) & valid

                def heavy(_):
                    Sm = jnp.einsum('tni,cnk->tcik', P, sub)
                    lam = _qcp_lambda_max(Sm, GA[:, None], G_all[None, :])
                    msd = (GA[:, None] + G_all[None, :] - 2.0 * lam) / n_dt
                    rmsd = jnp.sqrt(jnp.maximum(msd, 0.0))
                    hit = _two_gate_hits(rmsd, cand, rmsd_thr, N,
                                         Sm, lam, P, sub)
                    return jnp.any(hit, axis=1)

                kill_rows = jax.lax.cond(
                    jnp.any(cand), heavy,
                    lambda _: jnp.zeros(row_tile, dtype=bool), 0)
                return jax.lax.dynamic_update_slice_in_dim(
                    kill_acc, kill_rows, r0, 0)

            if axis_name is None:
                t_lo = 0
                t_hi = n_tiles
            else:
                per = -(-n_tiles // n_dev)
                me = jax.lax.axis_index(axis_name).astype(jnp.int32)
                t_lo = jnp.minimum(me * per, n_tiles)
                t_hi = jnp.minimum(t_lo + per, n_tiles)
            kill = jax.lax.fori_loop(t_lo, t_hi, row_body,
                                     jnp.zeros(S_len, dtype=bool))
            if axis_name is not None:
                kill = jax.lax.psum(kill.astype(jnp.int8), axis_name) > 0
            return a & ~kill

        active = jnp.sum(a)
        run = (k == 1) | (20 * k < active)
        return jax.lax.cond(run, do, lambda a: a, a)

    a = jax.lax.fori_loop(0, ks.shape[0],
                          lambda i, a: one_pass(a, ks[i]), real)

    out = jnp.zeros(n_pool + 1, dtype=bool)
    out = out.at[jnp.where(a, idx_c, n_pool)].set(True)
    return out[:n_pool], jnp.sum(a)


@functools.partial(jax.jit, static_argnames=('s_pad',))
def _finish_passes(hs, alive, n, rmsd_thr, s_pad):
    return _finish_body(hs, alive, n, rmsd_thr, s_pad)


def _pair_kill_rect(Pr, Qc, valid, rmsd_thr):
    '''
    Two-gate kill bits for rectangular pair tiles: Pr (B, Lr, N, 3) rows
    vs Qc (B, Lc, N, 3) columns, valid (B, Lr, Lc). Returns (B, Lr).
    Same sqrt(N)-bound gate elision as _pair_kill_core.
    '''
    N = Pr.shape[2]
    n_dt = jnp.asarray(N, Pr.dtype)
    S = _pair_correlation(Pr, Qc)
    GA = jnp.sum(Pr * Pr, axis=(-2, -1))
    GB = jnp.sum(Qc * Qc, axis=(-2, -1))
    lam = _lambda_max_variant(S, GA[:, :, None], GB[:, None, :])
    msd = (GA[:, :, None] + GB[:, None, :] - 2.0 * lam) / n_dt
    rmsd = jnp.sqrt(jnp.maximum(msd, 0.0))

    gate1 = (rmsd < rmsd_thr) & valid
    if N <= 4:
        return jnp.any(gate1, axis=2)

    ambiguous = gate1 & (jnp.sqrt(float(N)) * rmsd >= 2.0 * rmsd_thr)
    B, Lr = rmsd.shape[0], rmsd.shape[1]
    Lc = rmsd.shape[2]

    def compact(_):
        # flat pair index i = (b*Lr + p)*Lc + q: row pool is (B*Lr,),
        # col pool (B*Lc,) -> i//Lc recovers b*Lr+p directly
        return _amb_slot_hits(
            ambiguous, Pr.reshape(B * Lr, N, 3), Qc.reshape(B * Lc, N, 3),
            lambda i: i // Lc,
            lambda i: (i // (Lr * Lc)) * Lc + i % Lc,
            rmsd_thr, _AMB_SLOTS)

    def dense(_):
        K = _horn_key_matrix(S)
        q_wxyz = _quaternion_from_key(K, lam)
        q_xyzw = jnp.concatenate([q_wxyz[..., 1:], q_wxyz[..., :1]],
                                 axis=-1)
        R = quaternion_to_rotation_matrix(q_xyzw)
        rotated = jnp.einsum('bpqij,bpnj->bpqni', R, Pr)
        diff = rotated - Qc[:, None]
        maxdev = jnp.sqrt(jnp.max(jnp.sum(diff * diff, axis=-1), axis=-1))
        return ambiguous & (maxdev < 2.0 * rmsd_thr)

    n_amb = jnp.sum(ambiguous)
    hit2 = jax.lax.cond(
        n_amb == 0, lambda _: jnp.zeros_like(ambiguous),
        lambda _: jax.lax.cond(n_amb <= _AMB_SLOTS, compact, dense, 0),
        0)
    return jnp.any((gate1 & ~ambiguous) | hit2, axis=2)


def _mid_body(hs, alive, n, rmsd_thr, s_mid, band, tile=128,
              stop_below=None, skip_ks=(), axis_name=None, n_dev=1):
    '''
    Banded mid-regime passes: CURRENT actives are re-compacted at every
    eligible pass (order preserved, so same-chunk actives sit in
    contiguous runs whose lengths reflect the survivors actually left);
    each eligible pass whose largest run fits `band` evaluates its
    same-chunk pairs as (tile, tile+band) window blocks BUILT PER ROW
    GROUP inside a lax.map — every live tensor is O(G*tile*W), never
    O(S*W), so wide bands stay within HBM at million-row pools. Passes
    only run while actives still exceed `stop_below` (the finish block
    or, for the wide tier-2 band, the tier-1 regime — narrower bands
    handle the shrunken set cheaper). Returns (alive', ok): ok=False
    means an eligible pass could not run banded — the caller must NOT
    run later passes on device (order matters); host fallback resumes
    safely because re-running earlier passes is a no-op.

    skip_ks (static): schedule ks ALREADY RUN by an earlier stage of
    the same program (the fused in-place passes). Re-running a pass is
    semantically a no-op — kills require both rows alive, and any pair
    that passes the gates now also passed them when the pass first ran
    — but each banded pass costs a live-rows x W pair sweep, so the
    re-runs were pure waste (3 of ~8 passes at the 1.66M-pose tier-2
    config). Skipping them is survivor-exact by the same idempotency
    argument.

    PRECONDITION (correctness, not just capacity): the number of entry
    actives — sum(alive) — must fit s_mid. The frame design makes this
    load-bearing: the entry nonzero(size=s_mid) TRUNCATES past s_mid,
    and truncated actives are scattered back DEAD at exit — violating
    the bound silently LOSES survivors rather than skipping them (the
    old pool-space design merely left them uncompared). All current
    callers guarantee it structurally: _device_schedule enters the
    mid tier only under `active <= _MID_MAX` (= s_mid) and the mid2
    tier with s_mid = _pow2(n) >= n >= active.

    axis_name/n_dev (static): SPMD mode for shard_map callers
    (parallel/prune.py). All inputs must then be REPLICATED across the
    mesh axis (full pool + full frame mask on every chip): the frame
    bookkeeping — compaction, chunk ids, run lengths, gates — is cheap
    s_mid-sized integer work recomputed identically on every chip,
    while the window sweep (the quadratic pair work, with its per-group
    coordinate gathers) partitions the LIVE GROUPS contiguously across
    chips, and each pass combines the per-chip frame kills with one
    psum. Groups are independent and kills OR-combine, so the result is
    bit-identical to the single-device sweep.
    '''
    if stop_below is None:
        stop_below = _FINISH_MAX        # defined below (module constants)
    n_pool = hs.shape[0]
    N = hs.shape[1]
    T = s_mid // tile

    # window geometry: the band is the correctness cap — a window of
    # width >= the largest same-chunk run sees every same-chunk pair,
    # and a pass whose max run exceeds the cap hands off. (A previous
    # revision dispatched narrower window variants via lax.switch when
    # the measured runs allowed; on chip that saved ~3 ms of a 59 ms
    # stage while inflating whole-program compile times past 20 min —
    # the per-pass fixed costs, not the window pair math, dominate the
    # stage. Reverted to the single cap-width window.)
    m = -(-band // tile)                               # look-ahead tiles
    W = (m + 1) * tile
    # row-group size: bound each group's pair tensors, T divisible
    # (module constant so tests can shrink it to force multi-group
    # sweeps — and multi-chip group partitions — at small pools)
    budget = max(1, _MID_PAIR_BUDGET // (tile * W))
    G = 1
    while G * 2 <= budget and T % (G * 2) == 0:
        G *= 2
    n_groups = T // G
    Gtile = G * tile
    pad_tail = m * tile

    pos = jnp.arange(s_mid, dtype=jnp.int32)
    skip = {int(k) for k in skip_ks}
    ks = jnp.asarray([int(k) for k in K_SCHEDULE
                      if int(k) not in skip], jnp.int32)

    # FRAME: the entry actives are indexed out of the pool ONCE; all
    # later bookkeeping lives in this s_mid-sized frame of int32/bool
    # arrays — coordinates are NEVER materialized frame-wide. Every
    # eligible pass RE-COMPACTS the current survivors (an entry-only
    # compaction froze the run lengths `fits` sees at their entry
    # values — the documented 4.72M-pose handoff was exactly that),
    # but a re-compaction costs only s_mid-sized integer ops: the
    # coordinate gathers happen per LIVE GROUP inside the window sweep
    # (n_live * (Gtile + pad) rows per pass), not as the (s_mid, N, 3)
    # full-frame gather per pass that dominated the mid2 stage — at
    # tier-2 s_mid equals the pool size, so that gather moved ~360 MB
    # per pass for ~37k live rows. Survivor-exact: kill semantics
    # depend only on chunk ids and order, both carried by pool_pos0;
    # nonzero is order-preserving so frame order = pool order.
    idx0 = jnp.nonzero(alive, size=s_mid, fill_value=n_pool)[0]
    real0 = idx0 < n_pool
    idx0_c = jnp.clip(idx0, 0, n_pool - 1)
    pool_pos0 = idx0                   # original pool position per row

    def one_pass(i, state):
        a, ok, ran_k1 = state          # a: FRAME-space mask (s_mid,)
        k = ks[i]
        active = jnp.sum(a)
        eligible = ((k == 1) | (20 * k < active)) & (active > stop_below)

        def attempt(a):
            idx = jnp.nonzero(a, size=s_mid, fill_value=s_mid)[0]
            real = idx < s_mid
            idx_c = jnp.clip(idx, 0, s_mid - 1)
            ppos = pool_pos0[idx_c]
            cs = jnp.maximum(n // k, 1)
            chunk = jnp.where(real, jnp.minimum(ppos // cs, k - 1), -1)
            # largest same-chunk run among COMPACTED positions (chunk
            # ids are non-decreasing). NOT searchsorted: its binary-
            # search gathers over the full s_mid compaction cost
            # ~0.2 s/pass at 2^20 slots on TPU. A running max over
            # run-start positions gives the same first-equal-element
            # index with elementwise ops + one log-depth scan.
            run_starts = jnp.concatenate(
                [jnp.ones(1, bool), chunk[1:] != chunk[:-1]])
            first = jax.lax.associative_scan(
                jnp.maximum, jnp.where(run_starts, pos, 0))
            max_run = jnp.max(jnp.where(real, pos - first, 0)) + 1
            fits = max_run <= band

            def local_windows(x):
                '''((G+m)*tile, ...) col span -> (G, W, ...) windows
                (padding values come from the _ext concatenations
                below).'''
                blocks_ = x.reshape((G + m, tile) + x.shape[1:])
                parts = [blocks_[s:s + G] for s in range(m + 1)]
                return jnp.concatenate(parts, axis=1)

            def run(a):
                # pool row per compacted slot (fill slots clip to a
                # safe row; their real-bit is False so every pair they
                # touch is invalid)
                ppos_c = jnp.clip(jnp.where(real, ppos, 0),
                                  0, n_pool - 1)
                p_ext = jnp.concatenate(
                    [ppos_c, jnp.zeros(pad_tail, ppos_c.dtype)])
                r_ext = jnp.concatenate(
                    [real, jnp.zeros(pad_tail, bool)])
                c_ext = jnp.concatenate(
                    [chunk, jnp.full(pad_tail, -2, chunk.dtype)])

                def group_body(g):
                    start = g * Gtile
                    # coordinates gathered HERE, straight from the
                    # pool, one live group's span at a time
                    span = hs[jax.lax.dynamic_slice_in_dim(
                        p_ext, start, Gtile + pad_tail)]
                    rows = span[:Gtile].reshape(G, tile, N, 3)
                    wincols = local_windows(span)  # (G, W, N, 3)

                    r_span = jax.lax.dynamic_slice_in_dim(
                        r_ext, start, Gtile + pad_tail)
                    r_rows = r_span[:Gtile].reshape(G, tile)
                    r_cols = local_windows(r_span)
                    c_span = jax.lax.dynamic_slice_in_dim(
                        c_ext, start, Gtile + pad_tail)
                    c_rows = c_span[:Gtile].reshape(G, tile)
                    c_cols = local_windows(c_span)

                    row_pos = (start + jnp.arange(
                        Gtile, dtype=jnp.int32)).reshape(G, tile)
                    # window cols start at each row tile's first pos
                    col_pos = row_pos[:, :1] + \
                        jnp.arange(W, dtype=jnp.int32)[None, :]

                    valid = r_rows[:, :, None] & r_cols[:, None, :] \
                        & (col_pos[:, None, :] > row_pos[:, :, None]) \
                        & (c_rows[:, :, None] == c_cols[:, None, :])
                    return _pair_kill_rect(rows, wincols, valid,
                                           rmsd_thr)

                # fresh compaction packs actives into the FIRST slots,
                # so groups past ceil(active/Gtile) hold only fill rows
                # (real False -> no valid pair -> no kill): bound the
                # group sweep by the live count. Under SPMD, the live
                # groups partition contiguously across the mesh — chip
                # d sweeps groups [d*per, min((d+1)*per, n_live)).
                n_live = jnp.minimum(
                    (jnp.sum(real) + Gtile - 1) // Gtile,
                    n_groups).astype(jnp.int32)
                if axis_name is None:
                    g_lo = jnp.asarray(0, jnp.int32)
                    g_hi = n_live
                else:
                    per = (n_live + n_dev - 1) // n_dev
                    me = jax.lax.axis_index(axis_name).astype(jnp.int32)
                    g_lo = jnp.minimum(me * per, n_live)
                    g_hi = jnp.minimum(g_lo + per, n_live)

                def live_step(g, kill_buf):
                    return jax.lax.dynamic_update_slice_in_dim(
                        kill_buf, group_body(g)[None], g, 0)

                kill = jax.lax.fori_loop(
                    g_lo, g_hi, live_step,
                    jnp.zeros((n_groups, G, tile),
                              dtype=bool)).reshape(s_mid)
                # scatter kills back to FRAME space (kill is True only
                # for real rows — valid requires both real)
                frame_kill = jnp.zeros(s_mid + 1, dtype=bool)
                frame_kill = frame_kill.at[
                    jnp.where(kill, idx_c, s_mid)].set(True)
                frame_kill = frame_kill[:s_mid]
                if axis_name is not None:
                    # OR-combine the per-chip group kills (n_dev < 128
                    # keeps the int8 sum exact)
                    frame_kill = jax.lax.psum(
                        frame_kill.astype(jnp.int8), axis_name) > 0
                return a & ~frame_kill

            a2 = jax.lax.cond(fits & ok, run, lambda a: a, a)
            return a2, fits

        a, fits = jax.lax.cond(
            eligible, attempt, lambda a: (a, jnp.asarray(True)), a)
        ran = eligible & fits & ok
        ok = ok & (fits | ~eligible)
        ran_k1 = ran_k1 | (ran & (k == 1))
        return a, ok, ran_k1

    a_c, ok, ran_k1 = jax.lax.fori_loop(0, ks.shape[0], one_pass,
                                        (real0, True, False))
    # scatter the frame survivors back to pool space (fill rows start
    # dead and kills only clear bits, so only true entry actives can
    # land a pool bit)
    out = jnp.zeros(n_pool + 1, dtype=bool)
    out = out.at[jnp.where(a_c, idx0_c, n_pool)].set(True)
    return out[:n_pool], ok, ran_k1


# ensemble lengths whose whole-schedule single-program executable has
# been pre-compiled by warmup_prune_kernels (keyed (n, pool shape))
_SCHEDULE_WARMED = set()


def _inplace_ks(n):
    '''Schedule ks that can run the fused in-place pass at ensemble
    length n (superset of what any active count allows).'''
    out = []
    for k in K_SCHEDULE:
        if k == 1 or not 20 * k < n:
            continue
        k = int(k)
        if _pow2(n // k, floor=8) <= _INPLACE_SPAN_MAX:
            out.append(k)
    return tuple(out)


@functools.partial(jax.jit, static_argnames=('n', 's_pad'))
def _device_schedule(hs, alive, rmsd_thr, n, s_pad):
    '''
    The ENTIRE pruning schedule as one device program: every fused
    in-place pass (high-k regime) with its 20k<active gate evaluated
    on device, then — if the survivor count fits s_pad — the finish
    program for all remaining ks. Returns (alive', n_active, finished):
    when `finished` is False the caller must resume the host loop from
    alive' (passes are idempotent, so resuming from the start of the
    schedule is safe).
    '''
    active = jnp.sum(alive)
    for k in _inplace_ks(n):
        chunksize = n // k
        tail_real = n - (k - 1) * chunksize

        def body(al, k=k, chunksize=chunksize, tail_real=tail_real):
            return _inplace_body(
                hs, al, rmsd_thr, span_real=chunksize,
                span_pad=_pow2(chunksize, floor=8), n_chunks=k - 1,
                tail_real=tail_real, tail_pad=_pow2(tail_real, floor=8))

        alive = jax.lax.cond(20 * k < active, body, lambda al: al, alive)
        active = jnp.sum(alive)

    # tier-2 banded mid regime for VERY large survivor sets (wide band,
    # heavier windows): included in the program only for pools that can
    # need it, so the standard-bench executable is untouched. Runs the
    # early high-k passes banded until actives fit the tier-1 regime.
    if n > 16 * _MID_MAX:
        s_mid2 = _pow2(n, floor=_MID2_BAND)
        need_mid2 = active > _MID_MAX
        alive, _, _ = jax.lax.cond(
            need_mid2,
            lambda al: _mid_body(hs, al, jnp.asarray(n, jnp.int32),
                                 rmsd_thr, s_mid=s_mid2, band=_MID2_BAND,
                                 stop_below=_MID_MAX,
                                 skip_ks=_inplace_ks(n)),
            lambda al: (al, True, False), alive)
        active = jnp.sum(alive)

    # banded mid regime: shrink oversized survivor sets on device when
    # every eligible chunk's actives fit the band (may complete the
    # whole schedule itself by running k=1 banded)
    need_mid = (active > s_pad) & (active <= _MID_MAX)
    alive, mid_ok, mid_done = jax.lax.cond(
        need_mid,
        lambda al: _mid_body(hs, al, jnp.asarray(n, jnp.int32),
                             rmsd_thr, s_mid=_MID_MAX, band=_MID_BAND,
                             skip_ks=_inplace_ks(n)),
        lambda al: (al, True, False), alive)
    active = jnp.sum(alive)

    finished = mid_ok & (mid_done | (active <= s_pad))
    alive, active = jax.lax.cond(
        finished & ~mid_done,
        lambda al: _finish_body(hs, al, jnp.asarray(n, jnp.int32),
                                rmsd_thr, s_pad),
        lambda al: (al, jnp.sum(al)), alive)
    return alive, active, finished


def _pow2(x, floor=8):
    return max(floor, int(2 ** np.ceil(np.log2(max(x, 1)))))


# (block length, blocks per call): fixed buckets keep the number of
# distinct executables tiny (see prune_conformers_rmsd_device)
_BLOCK_BUCKETS = ((64, 512), (256, 32))

# passes whose chunk span (padded) is at most this run as ONE fused
# device program (_inplace_pass); larger spans use the gathered path
_INPLACE_SPAN_MAX = 256

# pair-tensor budget for one in-place evaluation step, in PAIRS: the
# (group, span, span, 3, 3) covariance block costs 36 B/pair, so 2^24
# pairs ~= 600 MB; chunk counts past group = budget/span^2 lax.map in
# group-sized steps (see _inplace_body). Sized so the 416k-pose
# headline workload (k=10^4, span_pad 32 -> group 16384 >= 9999
# chunks) keeps its original single-call executable.
_PAIR_CHUNK_BUDGET = 1 << 24

# the remainder ("tail") chunk of an in-place pass holds the last
# n - (k-1)*(n//k) rows — up to k + span rows (reference
# rmsd_pruning.py:139-148), which at multi-million-row pools is a
# multi-GB (tail, tail, 3, 3) covariance block. Past this padded size
# the tail evaluates as tiled (row-map x col-scan) pair blocks
# instead (_tail_kill_tiled). 8192 keeps every previously-measured
# workload (tails <= 8192) on its original single-block executable.
_TAIL_BLOCK_MAX = 8192
_TAIL_TILE = 1024

# once the active count fits this bound, ALL remaining schedule passes
# run as ONE device program (_finish_passes)
_FINISH_MAX = 4096
_FINISH_ROW_TILE = 256

# mid regime between the in-place passes and the finish block: actives
# up to _MID_MAX run BANDED passes (same-chunk actives are contiguous
# runs in the per-pass re-compaction, so as long as no chunk holds
# more than _MID_BAND actives, every same-chunk pair sits within
# _MID_BAND positions). NOTE: with the current constants the banded
# k=1 completion inside _mid_body is unreachable (k=1 puts every active
# in one chunk, so max_run = active > _FINISH_MAX > _MID_BAND); the mid
# regime only SHRINKS oversized survivor sets until they fit the finish
# block. The mid_done plumbing is kept for future band tuning.
# 32768 (was 16384): post-in-place active sets in (16384, 32768] used
# to fall to the WIDE tier-2 band (9x the pair work per pass) or — for
# their small eligible ks, whose chunks are huge at multi-million-row
# pools — to the host when the entry-frozen run lengths blew the band.
# With per-pass re-compaction the 128-band mid tier absorbs them: run
# lengths now track current survivor density, which at these counts is
# a few actives per chunk.
_MID_MAX = 32768
_MID_BAND = 128

# tier-2 band for pools past 16*_MID_MAX actives (wider look-ahead
# windows, ~9x the pair work per pass — only worth it when the host
# fallback alternative costs a full re-embed + host-orchestrated prune)
_MID2_BAND = 1024

# pair budget of one banded-pass row group: (tile x W) window tensors
# per group are sized so G*tile*W stays under this
_MID_PAIR_BUDGET = 1 << 22


def warmup_prune_kernels(n_atoms, dtype=np.float32, stream_sizes=(1024,),
                         n_pool=4, n_real=None):
    '''Pre-compile the pruning executables for a given (pool size, atom
    count): the blocked kernel gathers from the full pool, so its
    executable is keyed on the pool shape too. Cheap: runs on zeros.

    With n_real given, pre-compiles the whole-schedule single-call
    program instead — the gathered/stream executables are then only
    needed on its rare not-finished fallback and are left to lazy
    compilation (remote compiles are expensive on tunneled links;
    warming both paths doubles the cost for nothing).'''
    hs = jnp.zeros((n_pool, n_atoms, 3), dtype=dtype)
    thr = jnp.asarray(0.5, hs.dtype)
    if n_real is not None and n_real > 1:
        alive = jnp.zeros(n_pool, dtype=bool)
        n_eff = int(min(n_real, n_pool))
        a, _, _ = _device_schedule(hs, alive, thr, n=n_eff,
                                   s_pad=_FINISH_MAX)
        a.block_until_ready()
        _SCHEDULE_WARMED.add((n_eff, hs.shape, hs.dtype))
        return
    for L_pad, group in _BLOCK_BUCKETS:
        idx = jnp.zeros((group, L_pad), dtype=jnp.int32)
        m_real = jnp.zeros(group, dtype=jnp.int32)
        _gathered_kill_blocks(hs, idx, m_real, thr).block_until_ready()
    for S in stream_sizes:
        sub = jnp.zeros((S, n_atoms, 3), dtype=dtype)
        _gathered_kill_stream(sub, jnp.asarray(2, jnp.int32), thr,
                              col_block=min(_COL_BLOCK, S)).block_until_ready()


def prune_conformers_rmsd_device(heavy_structures, rmsd_thr=0.5,
                                 init_mask=None, small_chunk=256,
                                 n_real=None):
    '''
    Device-resident variant of prune_conformers_rmsd: identical bucketed
    keep/kill semantics. The structure pool is shipped to the device
    once; per pass, active chunks are gathered into power-of-two-padded
    blocks and evaluated in O(1) batched device calls (small chunks) or
    one streaming call per oversized chunk, with only the small kill-bit
    arrays crossing back. Returns the final (n,) bool keep mask (numpy).
    '''
    import os
    import time as _time
    trace = os.environ.get('TSCODE_PRUNE_TRACE') == '1'

    hs = jnp.asarray(heavy_structures)
    # the pool may be padded past the real ensemble (pow2 batching);
    # schedule boundaries follow the REAL length so semantics match an
    # unpadded run, and padded rows start dead
    n = int(n_real) if n_real is not None else hs.shape[0]
    mask = np.ones(hs.shape[0], dtype=bool) if init_mask is None \
        else np.array(init_mask, dtype=bool)
    mask[n:] = False
    if n <= 1:
        return mask

    thr = jnp.asarray(rmsd_thr, hs.dtype)

    # high-k regime: the whole pass fuses into one device program and
    # the mask never leaves the device (see _inplace_pass). As k drops,
    # chunk spans grow past _INPLACE_SPAN_MAX and the loop switches to
    # the host-orchestrated gathered path below (spans only grow, so
    # the switch happens at most once).
    alive_dev = jnp.asarray(mask)
    active = int(mask.sum())
    synced = True

    # fastest path: if warmup pre-compiled the whole-schedule program
    # for this exact ensemble length, the entire prune is ONE call
    if (n, hs.shape, hs.dtype) in _SCHEDULE_WARMED:
        t0 = _time.perf_counter()
        alive_dev, n_act, finished = _device_schedule(
            hs, alive_dev, thr, n=n, s_pad=_FINISH_MAX)
        done = bool(finished)
        if trace:
            import sys
            print(f'[prune] whole-schedule call -> {int(n_act)} '
                  f'(finished={done}, {_time.perf_counter() - t0:.2f}s)',
                  file=sys.stderr)
        if done:
            return np.array(alive_dev)
        # rare: survivors still exceed _FINISH_MAX — resume the host
        # loop from the device state (passes are idempotent)
        mask = np.array(alive_dev)
        active = int(mask.sum())
    for k in K_SCHEDULE:
        t_pass = _time.perf_counter()
        if not (k == 1 or 20 * k < active):
            continue
        k = int(k)
        chunksize = n // k

        if active <= _FINISH_MAX:
            # all remaining passes in ONE device program
            if synced:
                alive_dev = jnp.asarray(mask)
            alive_dev, n_act = _finish_passes(
                hs, alive_dev, jnp.asarray(n, jnp.int32), thr,
                s_pad=_pow2(active, floor=_FINISH_ROW_TILE))
            active = int(n_act)
            synced = False
            if trace:
                import sys
                print(f'[prune] k<={k} finish-pass -> {active} '
                      f'({_time.perf_counter() - t_pass:.2f}s)',
                      file=sys.stderr)
            break

        span_pad = _pow2(chunksize, floor=8)
        if k > 1 and span_pad <= _INPLACE_SPAN_MAX:
            tail_real = n - (k - 1) * chunksize
            alive_dev, n_act = _inplace_pass(
                hs, alive_dev, thr, span_real=chunksize,
                span_pad=span_pad, n_chunks=k - 1, tail_real=tail_real,
                tail_pad=_pow2(tail_real, floor=8))
            active = int(n_act)
            synced = False
            if trace:
                import sys
                print(f'[prune] k={k} fused-pass -> {active} '
                      f'({_time.perf_counter() - t_pass:.2f}s)',
                      file=sys.stderr)
            continue

        if not synced:
            mask = np.array(alive_dev)
            synced = True
        active = int(mask.sum())
        if not (k == 1 or 20 * k < active):
            continue

        act = np.flatnonzero(mask)
        bounds = np.arange(1, k) * chunksize
        chunks = [c for c in np.split(act, np.searchsorted(act, bounds))
                  if len(c) > 1]
        if not chunks:
            continue

        new_mask = mask.copy()
        small = [c for c in chunks if len(c) <= small_chunk]
        large = [c for c in chunks if len(c) > small_chunk]

        # FIXED shape buckets (L, group) so executables are reused
        # across passes, systems of the same size, and runs
        prev_L = 0
        for L_pad, group in _BLOCK_BUCKETS:
            batch = [c for c in small if prev_L < len(c) <= L_pad]
            prev_L = L_pad
            if not batch:
                continue
            B = int(np.ceil(len(batch) / group)) * group
            idx_arr = np.full((B, L_pad), n, dtype=np.int32)
            m_real = np.zeros(B, dtype=np.int32)
            for b, c in enumerate(batch):
                idx_arr[b, :len(c)] = c
                m_real[b] = len(c)

            use_pallas = os.environ.get('TSCODE_USE_PALLAS_QCP') == '1'
            for g0 in range(0, B, group):
                if use_pallas:
                    from tscode_tpu.ops.pallas.qcp import qcp_kill_blocks_pallas
                    interp = jax.default_backend() != 'tpu'
                    gathered = hs[jnp.clip(
                        jnp.asarray(idx_arr[g0:g0 + group]), 0, n - 1)]
                    bits = np.asarray(qcp_kill_blocks_pallas(
                        gathered, jnp.asarray(m_real[g0:g0 + group]),
                        float(rmsd_thr), interpret=interp))
                else:
                    bits = np.asarray(_gathered_kill_blocks(
                        hs, jnp.asarray(idx_arr[g0:g0 + group]),
                        jnp.asarray(m_real[g0:g0 + group]), thr))
                for b_rel in range(group):
                    b_abs = g0 + b_rel
                    if b_abs >= len(batch):
                        break
                    c = batch[b_abs]
                    new_mask[c[bits[b_rel, :len(c)]]] = False

        for c in large:
            Sp = _pow2(len(c), floor=_ROW_TILE)
            cb = min(_COL_BLOCK, Sp)
            idx = np.full(Sp, n, dtype=np.int32)
            idx[:len(c)] = c
            sub = hs[jnp.clip(jnp.asarray(idx), 0, n - 1)]
            bits = np.asarray(_gathered_kill_stream(
                sub, jnp.asarray(len(c), jnp.int32), thr, col_block=cb))
            new_mask[c[bits[:len(c)]]] = False

        mask = new_mask
        active = int(mask.sum())
        if trace:
            import sys
            print(f'[prune] k={k} -> {active} '
                  f'({_time.perf_counter() - t_pass:.2f}s)',
                  file=sys.stderr)

    if not synced:
        mask = np.array(alive_dev)
    return mask


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
