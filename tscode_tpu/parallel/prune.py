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

from tscode_tpu.ops.rmsd_prune import (_FINISH_MAX,
                                       _finish_body, _inplace_ks,
                                       _pair_kill_core, _pow2)


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

        # --- finish: remaining schedule on the gathered survivors ----
        active_g = jax.lax.psum(jnp.sum(alive), axis_name)
        finished = active_g <= _FINISH_MAX

        def fin(alive):
            hs_all = jax.lax.all_gather(hs, axis_name, axis=0,
                                        tiled=True)
            alive_all = jax.lax.all_gather(alive, axis_name, axis=0,
                                           tiled=True)
            out_all, _ = _finish_body(hs_all, alive_all,
                                      jnp.asarray(n, jnp.int32),
                                      rmsd_thr, s_pad=_FINISH_MAX)
            return jax.lax.dynamic_slice_in_dim(out_all, g0, s_local)

        alive = jax.lax.cond(finished, fin, lambda al: al, alive)
        n_active = jax.lax.psum(jnp.sum(alive), axis_name)
        return alive, n_active, finished

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P()),
        out_specs=(P(axis_name), P(), P()),
        **_NOCHECK)
    return jax.jit(sharded)


def prune_collective_model(n, n_pool, n_atoms, n_devices, dtype_bytes=4):
    '''Analytic ICI-traffic model of the sharded whole-schedule prune:
    per in-place pass, the halo path moves 2 forward ppermute messages
    (H pose rows + H alive bits to the previous chip) and 1 backward
    (H kill bits), where H = max(span_pad, tail_pad); passes whose H
    exceeds the local slice fall back to one tiled all_gather of the
    pool; every pass gate costs one scalar psum, and the finish block
    adds one psum + one pool all_gather. Pure shape arithmetic — no
    devices touched — so drivers can print the multi-chip message
    budget without multi-chip hardware.

    Returns (rows, totals): one dict per schedule step with its mode
    and byte counts, plus aggregate ppermute/all_gather bytes (per
    device) and psum call count.'''
    s_local = n_pool // n_devices
    row_bytes = n_atoms * 3 * dtype_bytes
    rows = []
    totals = dict(ppermute_bytes=0, allgather_bytes=0, psum_calls=0)
    for k in _inplace_ks(n):
        cs = n // k
        H = max(_pow2(cs, floor=8), _pow2(n - (k - 1) * cs, floor=8))
        totals['psum_calls'] += 1
        if H <= s_local:
            fwd = H * (row_bytes + 1)          # pose rows + alive bits
            bwd = H                            # kill bits return
            rows.append(dict(k=int(k), mode='halo', halo_rows=H,
                             ppermute_bytes=fwd + bwd))
            totals['ppermute_bytes'] += fwd + bwd
        else:
            ag = n_pool * (row_bytes + 1)
            rows.append(dict(k=int(k), mode='all_gather',
                             allgather_bytes=ag))
            totals['allgather_bytes'] += ag
    # finish block: gate psum + pool all_gather + final count psum
    totals['psum_calls'] += 2
    totals['allgather_bytes'] += n_pool * (row_bytes + 1)
    rows.append(dict(k=1, mode='finish all_gather',
                     allgather_bytes=n_pool * (row_bytes + 1)))
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
