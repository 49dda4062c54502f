#!/usr/bin/env python
'''Banded-pass statistics for the bench workload, on the LOCAL CPU
backend: runs embed+clash+compact+in-place exactly as the fused
pipeline does, then reports, for the first eligible wide-band pass,
the per-chunk live run lengths (max_run vs the _mid_body band decides
whether a pass stays on device) and the exact ambiguous-pair count
(sizes _AMB_SLOTS).

These statistics depend only on the survivor PATTERN, so the CPU x64
lane is a faithful proxy for the chip (counts differ by a few per
mille from f32 kernel rounding). History: the run-length stats (max 51
vs band 1024 here) motivated a narrower-window lax.switch in _mid_body;
on chip it bought ~3 ms of a 59 ms stage — the per-pass fixed costs
dominate, which led to the frame-compaction design instead
(BASELINE.md round-4).

Usage: TSCODE_BENCH_CONFS=152 python tools/prune_pass_stats.py
'''
import os
import sys

# hard-set: the deployment shell exports JAX_PLATFORMS=axon and
# ensure_backend prefers the env value — setdefault would silently
# route this "CPU" analysis through the TPU tunnel
os.environ['JAX_PLATFORMS'] = 'cpu'

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np
import jax.numpy as jnp

import prof_stages
import bench
from tscode_tpu.ops import rmsd_prune as rp


def main():
    args, _pp, heavy_idx, _tiling = prof_stages.build_args()
    poses, ok = bench._embed_clash(args, bench.N_ANGLES, None)  # XLA lane
    n_ok = int(jnp.sum(ok))
    s_pool = int(2 ** np.ceil(np.log2(max(n_ok, 2))))
    B = poses.shape[0]
    print(f'n_ok={n_ok} s_pool={s_pool}', flush=True)

    idx = jnp.nonzero(ok, size=s_pool, fill_value=B)[0]
    alive = np.asarray(idx < B)
    hs = np.asarray(poses[:, heavy_idx][jnp.clip(idx, 0, B - 1)])
    del poses, ok
    n = n_ok
    thr = 0.5

    a = jnp.asarray(alive)
    active = int(jnp.sum(a))
    for k in rp._inplace_ks(n):
        if not 20 * k < active:
            continue
        chunksize = n // k
        tail_real = n - (k - 1) * chunksize
        a = rp._inplace_body(
            hs, a, jnp.asarray(thr, hs.dtype), span_real=chunksize,
            span_pad=rp._pow2(chunksize, floor=8), n_chunks=k - 1,
            tail_real=tail_real, tail_pad=rp._pow2(tail_real, floor=8))
        active = int(jnp.sum(a))
        print(f'inplace k={k}: active={active}', flush=True)

    av = np.asarray(a)
    skip = set(rp._inplace_ks(n))
    print(f'banded entry active={av.sum()}', flush=True)
    for k in [int(k) for k in rp.K_SCHEDULE if int(k) not in skip]:
        act = int(av.sum())
        if not ((k == 1 or 20 * k < act) and act > rp._MID_MAX):
            continue
        pos = np.nonzero(av)[0]
        cs = max(n // k, 1)
        chunk = np.minimum(pos // cs, k - 1)
        _, counts = np.unique(chunk, return_counts=True)
        print(f'pass k={k}: runs max={counts.max()} '
              f'mean={counts.mean():.1f} '
              f'p99={np.percentile(counts, 99):.0f} '
              f'chunks={len(counts)}', flush=True)

        sub = hs[pos]
        N = sub.shape[1]
        n_amb = n_gate1 = 0
        for c in np.unique(chunk):
            rows = sub[chunk == c]
            if len(rows) < 2:
                continue
            r, _md = rp._pair_gate_matrices(jnp.asarray(rows), N)
            rv = np.asarray(r)[np.triu_indices(len(rows), 1)]
            g1 = rv < thr
            n_gate1 += int(g1.sum())
            n_amb += int((g1 & (np.sqrt(N) * rv >= 2 * thr)).sum())
        print(f'  gate1 pairs={n_gate1}  ambiguous pairs={n_amb} '
              f'(slots={rp._AMB_SLOTS})', flush=True)
        break


if __name__ == '__main__':
    main()
