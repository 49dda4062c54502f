'''
Multi-chip RMSD pruning with EXACT reference semantics.

The reference pruner (rmsd_pruning.py:164-206) is order-dependent: the
k-bucket schedule cuts the ensemble into contiguous position chunks and
kills, per pass, every structure matched by a LATER structure of the
same chunk that was alive at pass start. Sharding the pose axis keeps
each chip's slice contiguous in generation order, so:

 * high-k passes (small chunk spans) are embarrassingly parallel across
   chunks — each chip evaluates the chunks that START in its slice,
   fetching a fixed-size halo of rows from the next chip over ICI
   (`ppermute`) for chunks that straddle the boundary, and returning
   kill bits for halo rows the same way;
 * the pass gates (20k < active) use the GLOBAL survivor count (psum);
 * once the survivor count fits one chip, the remaining schedule runs
   redundantly on every chip from an all-gathered compact block (the
   data is small; redundant compute beats a serialization point) and
   each chip keeps its slice of the result.

The whole schedule is ONE jitted SPMD program — no host round trips.
Single-device semantics oracle: ops/rmsd_prune.prune_conformers_rmsd.
'''

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
try:                                    # jax >= 0.8 top-level export
    from jax import shard_map
    _NOCHECK = {'check_vma': False}
except ImportError:                     # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
    _NOCHECK = {'check_rep': False}

# regime constants are read through the module at TRACE time so tests
# can monkeypatch them (and make_sharded_prune.cache_clear()) to force
# the mid/finish regimes at small pools
from tscode_tpu.ops import rmsd_prune as _rp
from tscode_tpu.ops.rmsd_prune import (_finish_body, _inplace_ks,
                                       _mid_body, _pair_kill_core, _pow2)


def _halo_perm(n_dev):
    '''(src, dst) pairs: every chip receives the NEXT chip's rows.'''
    return [((i + 1) % n_dev, i) for i in range(n_dev)]


def _back_perm(n_dev):
    '''Reverse direction: halo kill bits go back to their owner.'''
    return [(i, (i + 1) % n_dev) for i in range(n_dev)]


@functools.lru_cache(maxsize=64)
def make_sharded_prune(mesh, n, n_pool, axis_name='poses'):
    '''
    Build the jitted SPMD whole-schedule pruner for ensemble length `n`
    (chunk boundaries are fixed by it) over `mesh`. Call signature:
      fn(hs, alive) -> (alive', n_active, finished)
    with hs (n_pool, N, 3) and alive (n_pool,) sharded over axis 0
    (n_pool divisible by the mesh size). When `finished` is False
    (survivors still exceed the single-chip finish block) the caller
    falls back to the host-orchestrated path — passes are idempotent.
    '''
    n_dev = mesh.devices.size
    assert n_pool % n_dev == 0
    s_local = n_pool // n_dev
    perm_fwd = _halo_perm(n_dev)
    perm_bwd = _back_perm(n_dev)

    def step(hs, alive, rmsd_thr):
        g0 = jax.lax.axis_index(axis_name) * s_local

        def run_pass_gathered(alive, k):
            '''Fallback when a chunk can span MULTIPLE slices (halo
            would need more than one neighbor): gather everything and
            run the single-device pass redundantly on every chip.'''
            from tscode_tpu.ops.rmsd_prune import _inplace_body
            cs = n // k
            tail_real = n - (k - 1) * cs
            hs_all = jax.lax.all_gather(hs, axis_name, axis=0, tiled=True)
            alive_all = jax.lax.all_gather(alive, axis_name, axis=0,
                                           tiled=True)
            out = _inplace_body(hs_all, alive_all, rmsd_thr,
                                span_real=cs, span_pad=_pow2(cs, floor=8),
                                n_chunks=k - 1, tail_real=tail_real,
                                tail_pad=_pow2(tail_real, floor=8))
            return jax.lax.dynamic_slice_in_dim(out, g0, s_local)

        def run_pass(alive, k):
            cs = n // k
            span_pad = _pow2(cs, floor=8)
            tail_real = n - (k - 1) * cs
            tail_pad = _pow2(tail_real, floor=8)
            H = max(span_pad, tail_pad)

            # halo: next chip's first H rows (wraparound rows are never
            # inside a valid chunk — chunks end at n <= n_pool)
            halo_hs = jax.lax.ppermute(hs[:H], axis_name, perm_fwd)
            halo_alive = jax.lax.ppermute(alive[:H], axis_name, perm_fwd)
            ext_hs = jnp.concatenate([hs, halo_hs], axis=0)
            ext_alive = jnp.concatenate([alive, halo_alive], axis=0)

            # --- main chunks (width cs) starting in this slice -------
            c_first = (g0 + cs - 1) // cs
            n_blocks = s_local // cs + 1
            b = jnp.arange(n_blocks, dtype=jnp.int32)
            c_glob = c_first + b
            starts = c_glob * cs - g0                       # (C,)
            block_ok = (c_glob < k - 1) & (starts < s_local)

            r = jnp.arange(span_pad, dtype=jnp.int32)
            idx = starts[:, None] + r[None, :]
            idx_c = jnp.clip(idx, 0, s_local + H - 1)
            Pm = ext_hs[idx_c]
            am = (ext_alive[idx_c] & (r < cs)[None, :]
                  & block_ok[:, None])
            valid = am[:, :, None] & am[:, None, :] & \
                (r[None, None, :] > r[None, :, None])
            kill_m = _pair_kill_core(Pm, valid, rmsd_thr) & am

            # --- tail chunk (width tail_real), computed by its owner -
            t_start = (k - 1) * cs
            owned = (t_start >= g0) & (t_start < g0 + s_local)
            rt = jnp.arange(tail_pad, dtype=jnp.int32)
            idx_t = jnp.clip(t_start - g0 + rt, 0, s_local + H - 1)
            Pt = ext_hs[idx_t][None]
            at = (ext_alive[idx_t] & (rt < tail_real) & owned)[None]
            valid_t = at[:, :, None] & at[:, None, :] & \
                (rt[None, None, :] > rt[None, :, None])
            kill_t = _pair_kill_core(Pt, valid_t, rmsd_thr)[0] & at[0]

            # --- scatter kills over local + halo rows ----------------
            kill_ext = jnp.zeros(s_local + H, dtype=bool)
            kill_ext = kill_ext.at[idx_c.reshape(-1)].max(
                kill_m.reshape(-1))
            kill_ext = kill_ext.at[idx_t].max(kill_t)

            # halo kills travel back to the next chip's head rows
            back = jax.lax.ppermute(kill_ext[s_local:], axis_name,
                                    perm_bwd)
            kill_local = kill_ext[:s_local].at[:H].max(back)
            return alive & ~kill_local

        for k in _inplace_ks(n):
            cs = n // k
            needs = max(_pow2(cs, floor=8),
                        _pow2(n - (k - 1) * cs, floor=8))
            fn = run_pass if needs <= s_local else run_pass_gathered
            active_g = jax.lax.psum(jnp.sum(alive), axis_name)
            alive = jax.lax.cond(20 * k < active_g,
                                 functools.partial(fn, k=k),
                                 lambda al: al, alive)

        # --- banded mid/mid2 tiers: survivor sets past the finish
        # block's capacity (the 4k..2.5M regime every production-scale
        # pool lands in). The pool is all-gathered ONCE and the frame
        # bookkeeping replicates on every chip (cheap integer work);
        # the window sweep's LIVE GROUPS — the quadratic pair work and
        # its coordinate gathers — partition across chips inside
        # _mid_body, with one psum per pass combining the kills.
        # Gating mirrors ops.rmsd_prune._device_schedule exactly.
        active_g = jax.lax.psum(jnp.sum(alive), axis_name)

        def mid_tiers(alive):
            hs_all = jax.lax.all_gather(hs, axis_name, axis=0,
                                        tiled=True)
            alive_all = jax.lax.all_gather(alive, axis_name, axis=0,
                                           tiled=True)
            n_t = jnp.asarray(n, jnp.int32)
            active = jnp.sum(alive_all)
            if n > 16 * _rp._MID_MAX:
                alive_all, _, _ = jax.lax.cond(
                    active > _rp._MID_MAX,
                    lambda al: _mid_body(hs_all, al, n_t, rmsd_thr,
                                         s_mid=_pow2(n, floor=_rp._MID2_BAND),
                                         band=_rp._MID2_BAND,
                                         stop_below=_rp._MID_MAX,
                                         skip_ks=_inplace_ks(n),
                                         axis_name=axis_name,
                                         n_dev=n_dev),
                    lambda al: (al, True, False), alive_all)
                active = jnp.sum(alive_all)
            need_mid = (active > _rp._FINISH_MAX) & (active <= _rp._MID_MAX)
            alive_all, m_ok, m_done = jax.lax.cond(
                need_mid,
                lambda al: _mid_body(hs_all, al, n_t, rmsd_thr,
                                     s_mid=_rp._MID_MAX, band=_rp._MID_BAND,
                                     skip_ks=_inplace_ks(n),
                                     axis_name=axis_name, n_dev=n_dev),
                lambda al: (al, True, False), alive_all)
            return (jax.lax.dynamic_slice_in_dim(alive_all, g0, s_local),
                    m_ok, m_done)

        alive, mid_ok, mid_done = jax.lax.cond(
            active_g > _rp._FINISH_MAX, mid_tiers,
            lambda al: (al, jnp.asarray(True), jnp.asarray(False)),
            alive)

        # --- finish: remaining schedule on the gathered survivors ----
        active_g = jax.lax.psum(jnp.sum(alive), axis_name)
        finished = mid_ok & (mid_done | (active_g <= _rp._FINISH_MAX))

        def fin(alive):
            hs_all = jax.lax.all_gather(hs, axis_name, axis=0,
                                        tiled=True)
            alive_all = jax.lax.all_gather(alive, axis_name, axis=0,
                                           tiled=True)
            out_all, _ = _finish_body(hs_all, alive_all,
                                      jnp.asarray(n, jnp.int32),
                                      rmsd_thr, s_pad=_rp._FINISH_MAX,
                                      axis_name=axis_name, n_dev=n_dev)
            return jax.lax.dynamic_slice_in_dim(out_all, g0, s_local)

        alive = jax.lax.cond(finished & ~mid_done, fin,
                             lambda al: al, alive)
        n_active = jax.lax.psum(jnp.sum(alive), axis_name)
        return alive, n_active, finished

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P()),
        out_specs=(P(axis_name), P(), P()),
        **_NOCHECK)
    return jax.jit(sharded)


# measured single-chip pass-start survivor trajectory of the TIER-2
# bench config (1,663,488 poses -> 884,401 clash survivors pruned to
# 29; BASELINE.md round-3 diagnostic 884,401 -> 37,246 -> 4,347 ->
# 1,626 -> 29 mapped to the passes whose gates those counts satisfy):
# {pass k: actives at that pass's start}. Passes between recorded
# points reuse the nearest earlier value (actives only shrink).
TIER2_SURVIVORS = {20000: 884401, 10000: 37246, 500: 4347, 100: 1626,
                   1: 29}


def prune_collective_model(n, n_pool, n_atoms, n_devices, dtype_bytes=4,
                           entry_actives=None, survivors=None,
                           pair_rate=5.4e9, ici_bw=45e9):
    '''Analytic ICI-traffic + roofline wall model of the sharded
    whole-schedule prune. Pure shape arithmetic — no devices touched —
    so drivers can print the multi-chip budget and a PROJECTED speedup
    curve without multi-chip hardware.

    Communication model (per chip): an in-place halo pass moves 2
    forward ppermute messages (H pose rows + H alive bits) and 1
    backward (H kill bits), H = max(span_pad, tail_pad); passes whose H
    exceeds the local slice all_gather the pool instead and compute
    redundantly; the mid tiers all_gather the pool ONCE at entry and
    psum s_mid kill bytes per eligible pass; the finish block (if the
    mid tier did not already complete) all_gathers and computes
    redundantly. Every in-place pass gate costs one scalar psum.

    Compute model (per chip): masked-QCP pair evaluations at pair_rate
    pairs/s/chip (the measured single-chip banded-schedule rate,
    BASELINE.md round-2 tier-2 analysis). In-place halo passes split
    their (k-1)*span_pad^2/2 + tail_pad^2/2 pair budget ~evenly over
    chips; mid passes partition ceil(n_live_groups / n_devices) whole
    groups per chip (the actual _mid_body partition — so the projected
    speedup saturates when groups < chips); gathered/finish stages
    replicate (no division). Per-stage wall = max(compute, ICI bytes /
    ici_bw) (full overlap assumption); stage walls add.

    entry_actives: survivors entering the prune (clash-ok count);
    defaults to n. survivors: {k: actives at pass start} trajectory
    (measured or assumed; TIER2_SURVIVORS for the 1.66M-pose config).
    Fixed per-pass launch overheads are NOT modeled, so single-chip
    projections undershoot measured walls at small pools — the model
    is for RELATIVE scaling, not absolute rates.

    Returns (rows, totals): one dict per schedule step with mode, byte
    counts, per-chip pair work and wall seconds; totals aggregates
    them and adds `projected_speedup` vs the same model at 1 chip.'''
    from tscode_tpu.ops.rmsd_prune import K_SCHEDULE

    s_local = n_pool // n_devices
    row_bytes = n_atoms * 3 * dtype_bytes
    rows = []
    totals = dict(ppermute_bytes=0, allgather_bytes=0, psum_calls=0,
                  pair_work_per_chip=0.0, wall_s=0.0)
    survivors = dict(survivors or {})
    # pass-start actives per schedule k: ONE forward walk of the
    # schedule applies the recorded checkpoints, so every later tier
    # loop reads a consistent value (a per-loop running variable went
    # stale across tiers and skipped checkpoint keys — r5 review)
    active = int(entry_actives) if entry_actives is not None else int(n)
    active_at = {}
    for k in K_SCHEDULE:
        if int(k) in survivors:
            active = survivors[int(k)]
        active_at[int(k)] = active

    def comm(b):
        return b if n_devices > 1 else 0        # 1 chip moves nothing

    def emit(row, pairs_chip, bytes_moved):
        bytes_moved = comm(bytes_moved)
        row['pair_work_per_chip'] = pairs_chip
        row['wall_s'] = max(pairs_chip / pair_rate, bytes_moved / ici_bw)
        totals['pair_work_per_chip'] += pairs_chip
        totals['wall_s'] += row['wall_s']
        rows.append(row)

    inplace = _inplace_ks(n)
    for k in inplace:
        # the SPMD program psums the gate for EVERY in-place k,
        # gated or not
        totals['psum_calls'] += 1
        if not 20 * k < active_at[int(k)]:
            continue
        cs = n // k
        span_pad = _pow2(cs, floor=8)
        tail_pad = _pow2(n - (k - 1) * cs, floor=8)
        H = max(span_pad, tail_pad)
        pairs = ((k - 1) * span_pad ** 2 + tail_pad ** 2) / 2
        if H <= s_local:
            fwd = H * (row_bytes + 1)          # pose rows + alive bits
            bwd = H                            # kill bits return
            totals['ppermute_bytes'] += comm(fwd + bwd)
            emit(dict(k=int(k), mode='halo', halo_rows=H,
                      ppermute_bytes=fwd + bwd),
                 pairs / n_devices, fwd + bwd)
        else:
            ag = n_pool * (row_bytes + 1)
            totals['allgather_bytes'] += comm(ag)
            emit(dict(k=int(k), mode='all_gather', allgather_bytes=ag),
                 pairs, ag)                     # redundant compute

    # --- banded mid tiers (entry all_gather + per-pass psum reduce) --
    from tscode_tpu.ops import rmsd_prune as _c
    tiers = []
    if n > 16 * _c._MID_MAX:
        tiers.append(('mid2', _pow2(n, floor=_c._MID2_BAND),
                      _c._MID2_BAND, _c._MID_MAX))
    tiers.append(('mid', _c._MID_MAX, _c._MID_BAND, _c._FINISH_MAX))
    mid_entered = False
    mid_done = False
    tile = 128
    for label, s_mid, band, stop_below in tiers:
        m = -(-band // tile)
        W = (m + 1) * tile
        budget = max(1, _c._MID_PAIR_BUDGET // (tile * W))
        G, T = 1, s_mid // tile
        while G * 2 <= budget and T % (G * 2) == 0:
            G *= 2
        Gtile = G * tile
        for k in K_SCHEDULE:
            if int(k) in inplace:
                continue
            active = active_at[int(k)]
            if not ((k == 1 or 20 * k < active) and active > stop_below):
                continue
            if not mid_entered:                 # entry pool all_gather
                mid_entered = True
                ag = n_pool * (row_bytes + 1)
                totals['allgather_bytes'] += comm(ag)
                emit(dict(k=None, mode=f'{label} entry all_gather',
                          allgather_bytes=ag), 0.0, ag)
            n_live = -(-active // Gtile)
            per_chip_groups = -(-n_live // n_devices)
            pairs_chip = per_chip_groups * G * tile * W
            red = 2 * s_mid                     # psum'd kill bytes
            totals['ppermute_bytes'] += comm(red)
            emit(dict(k=int(k), mode=f'{label} banded', band=band,
                      live_groups=n_live, ppermute_bytes=red),
                 pairs_chip, red)
            if k == 1:
                mid_done = True

    # --- finish block (gathered survivors; row tiles partition across
    # chips with one psum'd kill combine per live pass) ---------------
    if not mid_done:
        totals['psum_calls'] += 2
        ag = n_pool * (row_bytes + 1)
        totals['allgather_bytes'] += comm(ag)
        s_pad = _c._FINISH_MAX
        n_passes = 3                            # ~3 live finish passes
        pairs = s_pad ** 2 / 2 * n_passes / n_devices
        red = 2 * s_pad * n_passes              # psum'd kill bytes
        totals['ppermute_bytes'] += comm(red)
        emit(dict(k=1, mode='finish all_gather', allgather_bytes=ag,
                  ppermute_bytes=red),
             pairs, ag + red)

    if n_devices > 1:
        _, t1 = prune_collective_model(
            n, n_pool, n_atoms, 1, dtype_bytes=dtype_bytes,
            entry_actives=entry_actives, survivors=survivors,
            pair_rate=pair_rate, ici_bw=ici_bw)
        totals['projected_speedup'] = (t1['wall_s'] / totals['wall_s']
                                       if totals['wall_s'] else 1.0)
    else:
        totals['projected_speedup'] = 1.0
    return rows, totals


def sharded_prune_rmsd(heavy_structures, mesh, rmsd_thr=0.5, n_real=None,
                       axis_name='poses'):
    '''
    Convenience wrapper: pad the pose axis to the mesh size, run the
    SPMD schedule, fall back to the host path for oversized remainders.
    Returns the (n,) keep mask (numpy).
    '''
    from tscode_tpu.ops.rmsd_prune import prune_conformers_rmsd_device

    hs = np.asarray(heavy_structures)
    n = int(n_real) if n_real is not None else len(hs)
    n_dev = mesh.devices.size
    # pow2 pool bucket (multiple of the mesh size) so the big sharded
    # tensors reuse executables across ensemble sizes; the semantic
    # length n still keys the program (the reference's chunk boundaries
    # derive from it), which is inherent to exact order parity
    n_pool = max(8, 1 << max(0, (len(hs) - 1)).bit_length())
    n_pool = -(-n_pool // n_dev) * n_dev
    hs_pad = np.zeros((n_pool,) + hs.shape[1:], dtype=hs.dtype)
    hs_pad[:len(hs)] = hs
    alive = np.zeros(n_pool, dtype=bool)
    alive[:n] = True

    fn = make_sharded_prune(mesh, n=n, n_pool=n_pool,
                            axis_name=axis_name)
    alive_out, n_active, finished = fn(
        jnp.asarray(hs_pad), jnp.asarray(alive),
        jnp.asarray(rmsd_thr, hs_pad.dtype))
    mask = np.asarray(alive_out)[:len(hs)]
    if not bool(finished):
        mask = prune_conformers_rmsd_device(
            jnp.asarray(hs_pad), rmsd_thr=rmsd_thr,
            init_mask=np.asarray(alive_out), n_real=n)[:len(hs)]
    return mask
