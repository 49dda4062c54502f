#!/usr/bin/env python
'''Fused-stage attribution for the headline pipeline.

Builds jitted programs that run the REAL fused pipeline (bench.py
`_pipeline_fused` body) but stop after successive stages — compaction,
in-place prune passes, tier-2 banded mid, tier-1 banded mid, finish —
at the SAME memory state as the production program. Standalone stage
re-runs through the tunnel read garbage (buffer-pressure and latency
artifacts; see BASELINE.md "ROUND-3 FINAL ACT"); only this fused-stop
form attributes a rep honestly.

Mirrors `ops/rmsd_prune._device_schedule` stage-for-stage; keep the
two in sync when the schedule changes.

Usage:
    TSCODE_BENCH_CONFS=152 python tools/prof_stages.py
Prints per-stage cumulative times and the derived stage budget.
'''

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tscode_tpu.backend import ensure_backend  # noqa: E402

print('backend:', ensure_backend(quiet=True), flush=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from tscode_tpu.embeds.common import stacked_lobes  # noqa: E402
from tscode_tpu.ops import rmsd_prune as rp  # noqa: E402
from tscode_tpu.ops.clash import (cross_fragment_pair_mask,  # noqa: E402
                                  static_pairs)

STAGES = ('embed', 'compact', 'inplace', 'mid2', 'mid', 'finish')


def build_args():
    mol1, mol2 = bench.build_workload()
    ids = (mol1.n_atoms, mol2.n_atoms)
    atomnos = np.concatenate([mol1.atomnos, mol2.atomnos])
    heavy_idx = jnp.asarray(np.nonzero(atomnos != 1)[0])
    c1, v1 = stacked_lobes(mol1)
    c2, v2 = stacked_lobes(mol2)
    angles = np.linspace(0.0, 360.0 - 360.0 / bench.N_ANGLES,
                         bench.N_ANGLES)
    pair_mask = cross_fragment_pair_mask(ids)
    args = (jnp.asarray(mol1.atomcoords), jnp.asarray(mol2.atomcoords),
            jnp.asarray(c1), jnp.asarray(v1), jnp.asarray(c2),
            jnp.asarray(v2), jnp.asarray(pair_mask), jnp.asarray(angles))
    pp = static_pairs(pair_mask)

    n1c, n2c = mol1.n_confs, mol2.n_confs
    k1 = c1.shape[1] if c1.ndim == 3 else 2
    k2 = c2.shape[1] if c2.ndim == 3 else 2
    B = n1c * n2c * k1 * k2 * bench.N_ANGLES
    tiling = {}
    if B > bench._WHOLE_GRID_MAX:
        stride = n1c * k2 * k1 * bench.N_ANGLES
        c2_per_tile = max(1, bench._GRID_TILE // stride)
        tiling = dict(n_tiles=-(-n2c // c2_per_tile),
                      c2_per_tile=c2_per_tile)
    return args, pp, heavy_idx, tiling


def main():
    args, pp, heavy_idx, tiling = build_args()
    poses0, ok0 = bench._embed_clash(args, bench.N_ANGLES, pp)
    n_ok = int(jnp.sum(ok0))
    s_pool = int(2 ** np.ceil(np.log2(max(n_ok, 2))))
    del poses0, ok0
    print(f'n_ok={n_ok} s_pool={s_pool} tiling={tiling or None}',
          flush=True)
    n = n_ok
    thr = 0.5

    @functools.partial(jax.jit, static_argnames=('upto',))
    def staged(a, upto):
        # --- embed + clash (whole-grid or c2-tiled, as production) ---
        if tiling:
            poses, ok = bench._embed_clash_all_mapped.__wrapped__(
                *a, n_angles=bench.N_ANGLES, pallas_pairs=pp, **tiling)
        else:
            poses, ok = bench._embed_clash_all.__wrapped__(
                *a, n_angles=bench.N_ANGLES, pallas_pairs=pp)
        B = poses.shape[0]
        if upto == 'embed':
            return poses.sum(), jnp.sum(ok)

        # --- survivor compaction (heavy-slice before the row gather) ---
        idx = jnp.nonzero(ok, size=s_pool, fill_value=B)[0]
        alive = idx < B
        hs = poses[:, heavy_idx][jnp.clip(idx, 0, B - 1)]
        if upto == 'compact':
            return hs.sum(), jnp.sum(alive)
        t = jnp.asarray(thr, hs.dtype)

        # --- fused in-place passes (mirrors _device_schedule) ---
        active = jnp.sum(alive)
        for k in rp._inplace_ks(n):
            chunksize = n // k
            tail_real = n - (k - 1) * chunksize

            def body(al, k=k, chunksize=chunksize, tail_real=tail_real):
                return rp._inplace_body(
                    hs, al, t, span_real=chunksize,
                    span_pad=rp._pow2(chunksize, floor=8), n_chunks=k - 1,
                    tail_real=tail_real,
                    tail_pad=rp._pow2(tail_real, floor=8))

            alive = jax.lax.cond(20 * k < active, body, lambda al: al,
                                 alive)
            active = jnp.sum(alive)
        if upto == 'inplace':
            return hs.sum(), active

        # --- tier-2 banded mid (wide band) ---
        if n > 16 * rp._MID_MAX:
            s_mid2 = rp._pow2(n, floor=rp._MID2_BAND)
            alive, _, _ = jax.lax.cond(
                active > rp._MID_MAX,
                lambda al: rp._mid_body(
                    hs, al, jnp.asarray(n, jnp.int32), t, s_mid=s_mid2,
                    band=rp._MID2_BAND, stop_below=rp._MID_MAX,
                    skip_ks=rp._inplace_ks(n)),
                lambda al: (al, True, False), alive)
            active = jnp.sum(alive)
        if upto == 'mid2':
            return hs.sum(), active

        # --- tier-1 banded mid ---
        need_mid = (active > rp._FINISH_MAX) & (active <= rp._MID_MAX)
        alive, mid_ok, mid_done = jax.lax.cond(
            need_mid,
            lambda al: rp._mid_body(hs, al, jnp.asarray(n, jnp.int32), t,
                                    s_mid=rp._MID_MAX, band=rp._MID_BAND,
                                    skip_ks=rp._inplace_ks(n)),
            lambda al: (al, True, False), alive)
        active = jnp.sum(alive)
        if upto == 'mid':
            return hs.sum(), active

        # --- finish block ---
        finished = mid_ok & (mid_done | (active <= rp._FINISH_MAX))
        alive, active = jax.lax.cond(
            finished & ~mid_done,
            lambda al: rp._finish_body(hs, al, jnp.asarray(n, jnp.int32),
                                       t, rp._FINISH_MAX),
            lambda al: (al, jnp.sum(al)), alive)
        return hs.sum(), active

    reps = int(os.environ.get('TSCODE_PROF_REPS', '4'))
    cum = {}
    for st in STAGES:
        ts, out = [], None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jax.block_until_ready(staged(args, st))
            ts.append(time.perf_counter() - t0)
        cum[st] = min(ts[1:]) if len(ts) > 1 else ts[0]
        print(f'up to {st:8s}: first {ts[0]:6.2f}s, '
              f'best {cum[st]:.4f}s -> active {int(out[1])}', flush=True)

    print('\nstage budget (deltas of fused-stop programs):')
    prev = 0.0
    for st in STAGES:
        print(f'  {st:8s} {cum[st] - prev:+.4f}s')
        prev = cum[st]


if __name__ == '__main__':
    main()
