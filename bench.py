#!/usr/bin/env python
'''
Headline benchmark: poses/sec through the embed + clash + RMSD-prune
pipeline on a ~416k-pose string-embed workload (BASELINE.md target:
>= 50x the CPU reference on one chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "poses/sec", "vs_baseline": N}

Design notes:
 * the whole pipeline is DEVICE-RESIDENT — one embed+clash program over
   the full grid (indices decoded on device), on-device survivor
   compaction, and the device-resident bucketed RMSD pruner
   (ops/rmsd_prune.prune_conformers_rmsd_device). Only per-pass scalar
   active counts cross the host boundary, which matters both for real
   deployments and for this environment's high-latency device link.
 * the CPU baseline is the sequential numpy/LAPACK oracle (the
   reference's own Numba kernels cannot run here — numba is absent —
   so the oracle implements the identical formulas; tests/oracles.py).
   Measured on a subsample on first run, cached in-repo.
'''

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_CONFS = int(os.environ.get('TSCODE_BENCH_CONFS', '76'))
                      # tiled noisy conformers per molecule
N_ANGLES = 36
NOISE = 0.35          # A of per-conformer jitter: a genuinely DIVERSE
                      # ensemble, representative of multiembed-scale
                      # docking where the quadratic prune cannot collapse
                      # after a handful of comparisons
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              '.bench_cpu_baseline.json')
BASE_SAMPLE = 1024    # poses measured for the CPU baseline


def build_workload():
    '''Two fixture molecules tiled to N_CONFS noisy conformers each ->
    a 76*76*2*36 = 415,872-pose string grid.'''
    from tscode_tpu.molecule import Molecule

    fixdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          'tests', 'fixtures')
    rng = np.random.default_rng(2026)

    mols = []
    for name, r_idx in (('C2H4.xyz', [0]), ('CH3Cl.xyz', [0])):
        mol = Molecule(os.path.join(fixdir, name), reactive_indices=r_idx)
        base = mol.atomcoords[0]
        noisy = base[None] + rng.normal(size=(N_CONFS,) + base.shape) * NOISE
        mol.atomcoords = noisy
        mol.compute_orbitals()
        mols.append(mol)
    return mols


def _embed_clash_body(r, coords1, coords2, centers1, vecs1, centers2,
                      vecs2, pair_mask, angles, n_angles, pallas_pairs,
                      n_total):
    '''Decode flat grid indices `r` -> (poses, clash_ok). Indices past
    n_total (tile padding) clamp to a valid pose and report clash_ok
    False, so padded tails never contribute survivors.'''
    import jax.numpy as jnp
    from tscode_tpu.ops.linalg import (rot_mat_from_pointer,
                                       rotation_matrix_from_vectors)

    n1c, k1 = centers1.shape[0], centers1.shape[1]
    k2 = centers2.shape[1]

    real = r < n_total
    rc = jnp.minimum(r, n_total - 1)
    ai = rc % n_angles
    rest = rc // n_angles
    l1 = rest % k1
    rest = rest // k1
    l2 = rest % k2
    rest = rest // k2
    c1 = rest % n1c
    c2 = rest // n1c

    p1 = centers1[c1, l1]
    p2 = centers2[c2, l2]
    ref_vec = vecs1[c1, l1]
    mol_vec = vecs2[c2, l2]

    align = rotation_matrix_from_vectors(mol_vec, -ref_vec)
    spin = rot_mat_from_pointer(ref_vec, angles[ai])
    R = jnp.einsum('bij,bjk->bik', spin, align)
    t = p1 - jnp.einsum('bij,bj->bi', R, p2)

    f1 = coords1[c1]
    f2 = jnp.einsum('bij,bnj->bni', R, coords2[c2]) + t[:, None, :]
    poses = jnp.concatenate([f1, f2], axis=1)

    if pallas_pairs is not None:
        from tscode_tpu.ops.pallas.clash import clash_ok_traced
        clash_ok = clash_ok_traced(poses, pallas_pairs, 1.5)
    else:
        a2 = jnp.sum(poses * poses, axis=-1)
        ab = jnp.einsum('bni,bmi->bnm', poses, poses)
        d2 = jnp.maximum(a2[:, :, None] + a2[:, None, :] - 2.0 * ab, 0.0)
        clash_ok = jnp.sum((d2 < 1.5 * 1.5) & pair_mask,
                           axis=(-2, -1)) <= 0
    return poses, clash_ok & real


@functools.partial(__import__('jax').jit,
                   static_argnames=('n_angles', 'pallas_pairs'))
def _embed_clash_all(coords1, coords2, centers1, vecs1, centers2, vecs2,
                     pair_mask, angles, n_angles, pallas_pairs=None):
    '''Whole-grid string embed + clash screen in ONE device program,
    BROADCAST form. The grid is a pure cartesian product, so every
    tensor is built by broadcasting over the (c2, c1, l2, l1, ai) axes
    — whose C-order reshape IS the flat grid order the index decoder
    produces — instead of decoding flat indices and GATHERING per-pose
    conformer rows (coords[c], centers[c, l]). Measured in the fused
    pipeline at 1.66M poses: embed+clash+compaction 0.228 -> 0.065 s
    with the SAME 884,401 clash survivors (per-pose gathers were 61%
    of the tier-2 rep; the round-3 gather rule again). Poses agree
    with the flat-decode form to f32 fusion-order noise; the tiled
    >2^21-pose path keeps the flat decoder.
    pallas_pairs: STATIC cross-fragment (i, j) tuple — when given, the
    clash screen runs the Pallas lane-layout kernel fused into this
    program instead of the XLA matmul form (accelerator backends;
    ops/clash.use_pallas_clash decides).'''
    import jax.numpy as jnp

    from tscode_tpu.ops.linalg import (rot_mat_from_pointer,
                                       rotation_matrix_from_vectors)

    n1c, k1 = centers1.shape[0], centers1.shape[1]
    n2c, k2 = centers2.shape[0], centers2.shape[1]
    A = n_angles
    B = n1c * n2c * k1 * k2 * A

    p1 = centers1[None, :, None, :, None]        # (1, n1c, 1, k1, 1, 3)
    ref_vec = vecs1[None, :, None, :, None]
    p2 = centers2[:, None, :, None, None]        # (n2c, 1, k2, 1, 1, 3)
    mol_vec = vecs2[:, None, :, None, None]
    ang = angles[None, None, None, None, :]      # (1, 1, 1, 1, A)

    align = rotation_matrix_from_vectors(mol_vec, -ref_vec)
    spin = rot_mat_from_pointer(
        jnp.broadcast_to(ref_vec, ref_vec.shape[:4] + (A, 3)),
        jnp.broadcast_to(ang, ref_vec.shape[:4] + (A,)))
    R = jnp.einsum('...ij,...jk->...ik', spin, align)
    t = p1 - jnp.einsum('...ij,...j->...i', R, p2)

    f2 = jnp.einsum('...ij,...nj->...ni', R,
                    coords2[:, None, None, None, None]) + t[..., None, :]
    shape5 = (n2c, n1c, k2, k1, A)
    f1 = jnp.broadcast_to(coords1[None, :, None, None, None],
                          shape5 + coords1.shape[1:])
    f2 = jnp.broadcast_to(f2, shape5 + f2.shape[-2:])
    poses = jnp.concatenate([f1, f2], axis=-2).reshape(
        (B, coords1.shape[1] + coords2.shape[1], 3))

    if pallas_pairs is not None:
        from tscode_tpu.ops.pallas.clash import clash_ok_traced
        clash_ok = clash_ok_traced(poses, pallas_pairs, 1.5)
    else:
        a2 = jnp.sum(poses * poses, axis=-1)
        ab = jnp.einsum('bni,bmi->bnm', poses, poses)
        d2 = jnp.maximum(a2[:, :, None] + a2[:, None, :] - 2.0 * ab, 0.0)
        clash_ok = jnp.sum((d2 < 1.5 * 1.5) & pair_mask,
                           axis=(-2, -1)) <= 0
    return poses, clash_ok


# whole-grid embed programs past this many poses exceed single-chip HBM
# (XLA holds several whole-grid intermediates at once; the 3.36M-pose
# compile died 278 MB past 15.75 GB — BASELINE.md scale table). Above
# it, a lax.map over grid tiles bounds live intermediates to one tile.
_WHOLE_GRID_MAX = int(os.environ.get('TSCODE_BENCH_WHOLE_GRID_MAX',
                                     str(1 << 21)))
_GRID_TILE = 1 << 18


@functools.partial(__import__('jax').jit,
                   static_argnames=('n_angles', 'n_tiles', 'c2_per_tile',
                                    'pallas_pairs'))
def _embed_clash_all_mapped(coords1, coords2, centers1, vecs1, centers2,
                            vecs2, pair_mask, angles, n_angles, n_tiles,
                            c2_per_tile, pallas_pairs=None):
    '''Tiled form of _embed_clash_all: a lax.map over blocks of the
    OUTERMOST (c2) grid axis keeps the live intermediates at one tile's
    footprint while still being ONE dispatch. Tiling by c2 keeps every
    tile axis-aligned, so each tile is the same gather-free BROADCAST
    program as the whole-grid form (a flat-index tile would cut across
    the cartesian axes and force per-pose gathers — 61% of the tier-2
    rep before the broadcast rewrite). Returns (poses, clash_ok)
    padded to n_tiles*c2_per_tile*stride rows; padded tails (clamped
    duplicate c2 rows) report clash_ok False.'''
    import jax
    import jax.numpy as jnp

    from tscode_tpu.ops.linalg import (rot_mat_from_pointer,
                                       rotation_matrix_from_vectors)

    n1c, k1 = centers1.shape[0], centers1.shape[1]
    n2c, k2 = centers2.shape[0], centers2.shape[1]
    A = n_angles
    stride = n1c * k2 * k1 * A               # rows per c2 value
    B = n2c * stride
    g = c2_per_tile
    tile_b = g * stride

    # pad the c2 axis so every tile's slice is in-bounds (a CLAMPED
    # tail slice would shift its c2 content against the tile's flat
    # row labels and corrupt real rows — caught by the CPU equality
    # check at n2c % g != 0). Edge rows keep the math NaN-free; their
    # poses land at flat rows >= B and are masked dead below.
    pad_c2 = n_tiles * g - n2c
    if pad_c2:
        centers2 = jnp.concatenate(
            [centers2, jnp.repeat(centers2[-1:], pad_c2, axis=0)])
        vecs2 = jnp.concatenate(
            [vecs2, jnp.repeat(vecs2[-1:], pad_c2, axis=0)])
        coords2 = jnp.concatenate(
            [coords2, jnp.repeat(coords2[-1:], pad_c2, axis=0)])

    p1 = centers1[None, :, None, :, None]    # (1, n1c, 1, k1, 1, 3)
    ref_vec = vecs1[None, :, None, :, None]
    ang = angles[None, None, None, None, :]
    align_ref = -ref_vec
    spin = rot_mat_from_pointer(
        jnp.broadcast_to(ref_vec, ref_vec.shape[:4] + (A, 3)),
        jnp.broadcast_to(ang, ref_vec.shape[:4] + (A,)))

    def tile(k):
        c2_lo = k * g                        # clamped slice: tail tiles
        c2b = jax.lax.dynamic_slice_in_dim(centers2, c2_lo, g)
        v2b = jax.lax.dynamic_slice_in_dim(vecs2, c2_lo, g)
        x2b = jax.lax.dynamic_slice_in_dim(coords2, c2_lo, g)

        p2 = c2b[:, None, :, None, None]     # (g, 1, k2, 1, 1, 3)
        mol_vec = v2b[:, None, :, None, None]
        align = rotation_matrix_from_vectors(mol_vec, align_ref)
        R = jnp.einsum('...ij,...jk->...ik', spin, align)
        t = p1 - jnp.einsum('...ij,...j->...i', R, p2)
        f2 = jnp.einsum('...ij,...nj->...ni', R,
                        x2b[:, None, None, None, None]) + t[..., None, :]
        shape5 = (g, n1c, k2, k1, A)
        f1 = jnp.broadcast_to(coords1[None, :, None, None, None],
                              shape5 + coords1.shape[1:])
        f2 = jnp.broadcast_to(f2, shape5 + f2.shape[-2:])
        poses = jnp.concatenate([f1, f2], axis=-2).reshape(
            (tile_b, coords1.shape[1] + coords2.shape[1], 3))

        if pallas_pairs is not None:
            from tscode_tpu.ops.pallas.clash import clash_ok_traced
            ok = clash_ok_traced(poses, pallas_pairs, 1.5)
        else:
            a2 = jnp.sum(poses * poses, axis=-1)
            ab = jnp.einsum('bni,bmi->bnm', poses, poses)
            d2 = jnp.maximum(
                a2[:, :, None] + a2[:, None, :] - 2.0 * ab, 0.0)
            ok = jnp.sum((d2 < 1.5 * 1.5) & pair_mask,
                         axis=(-2, -1)) <= 0
        rows = k * tile_b + jnp.arange(tile_b, dtype=jnp.int32)
        return poses, ok & (rows < B)

    poses, ok = jax.lax.map(tile, jnp.arange(n_tiles, dtype=jnp.int32))
    return (poses.reshape((-1,) + poses.shape[2:]), ok.reshape(-1))


def _embed_clash(args, n_angles, pallas_pairs):
    '''Select whole-grid vs tiled embed+clash by grid size.'''
    centers1, centers2 = args[2], args[4]
    n1c, k1 = centers1.shape[0], centers1.shape[1]
    n2c, k2 = centers2.shape[0], centers2.shape[1]
    B = n1c * n2c * k1 * k2 * n_angles
    if B <= _WHOLE_GRID_MAX:
        return _embed_clash_all(*args, n_angles=n_angles,
                                pallas_pairs=pallas_pairs)
    stride = n1c * k2 * k1 * n_angles
    c2_per_tile = max(1, _GRID_TILE // stride)
    n_tiles = -(-n2c // c2_per_tile)
    return _embed_clash_all_mapped(*args, n_angles=n_angles,
                                   n_tiles=n_tiles,
                                   c2_per_tile=c2_per_tile,
                                   pallas_pairs=pallas_pairs)


@functools.partial(
    __import__('jax').jit,
    static_argnames=('n_angles', 'n_ok', 's_pool', 'pallas_pairs',
                     'n_tiles', 'c2_per_tile'))
def _pipeline_fused(coords1, coords2, centers1, vecs1, centers2, vecs2,
                    pair_mask, angles, heavy_idx, n_angles, n_ok, s_pool,
                    pallas_pairs=None, n_tiles=None, c2_per_tile=None):
    '''The ENTIRE pipeline as one device program: embed grid -> clash ->
    survivor compaction -> whole-schedule RMSD prune. The pruned
    ensemble stays device-resident (as it would feeding a downstream
    refinement stage); only the keep mask and counters leave.
    n_ok is the (deterministic) clash survivor count — it fixes the
    prune schedule's chunk boundaries at trace time and is re-checked
    on device.'''
    import jax.numpy as jnp

    from tscode_tpu.ops.rmsd_prune import _device_schedule, _FINISH_MAX

    if n_tiles is None:
        poses, ok = _embed_clash_all.__wrapped__(
            coords1, coords2, centers1, vecs1, centers2, vecs2,
            pair_mask, angles, n_angles, pallas_pairs=pallas_pairs)
    else:
        poses, ok = _embed_clash_all_mapped.__wrapped__(
            coords1, coords2, centers1, vecs1, centers2, vecs2,
            pair_mask, angles, n_angles, n_tiles=n_tiles,
            c2_per_tile=c2_per_tile, pallas_pairs=pallas_pairs)
    B = poses.shape[0]
    n_ok_dev = jnp.sum(ok)

    idx = jnp.nonzero(ok, size=s_pool, fill_value=B)[0]
    alive0 = idx < B
    # slice heavy atoms BEFORE the survivor row-gather: 77 ms/rep
    # cheaper at tier-2 (gathered bytes drop 23->4 atoms/row;
    # measured 0.306 vs 0.229 s embed+clash+compact, same hs)
    heavy_survivors = poses[:, heavy_idx][jnp.clip(idx, 0, B - 1)]

    keep, n_final, finished = _device_schedule(
        heavy_survivors, alive0, jnp.asarray(0.5, poses.dtype),
        n=n_ok, s_pad=_FINISH_MAX)
    # counters packed into one array: a single host pull closes a rep
    stats = jnp.stack([n_final.astype(jnp.int32),
                       n_ok_dev.astype(jnp.int32),
                       finished.astype(jnp.int32)])
    return keep, stats


def run_device_pipeline(mol1, mol2):
    '''Embed + clash + RMSD-prune, device-resident. Returns
    (n_poses, seconds, n_clash_ok, n_final).'''
    import jax
    import jax.numpy as jnp

    from tscode_tpu.embeds.common import stacked_lobes
    from tscode_tpu.ops.clash import cross_fragment_pair_mask
    from tscode_tpu.ops.rmsd_prune import prune_conformers_rmsd_device

    ids = (mol1.n_atoms, mol2.n_atoms)
    atomnos = np.concatenate([mol1.atomnos, mol2.atomnos])
    heavy = np.nonzero(atomnos != 1)[0]

    centers1, vecs1 = stacked_lobes(mol1)
    centers2, vecs2 = stacked_lobes(mol2)
    angles = np.linspace(0.0, 360.0 - 360.0 / N_ANGLES, N_ANGLES)

    args = (jnp.asarray(mol1.atomcoords), jnp.asarray(mol2.atomcoords),
            jnp.asarray(centers1), jnp.asarray(vecs1),
            jnp.asarray(centers2), jnp.asarray(vecs2),
            jnp.asarray(cross_fragment_pair_mask(ids)),
            jnp.asarray(angles))

    verbose = os.environ.get('TSCODE_BENCH_VERBOSE') == '1'

    def vlog(msg):
        if verbose:
            print(f'[bench] {msg} (t={time.perf_counter() - t_init:.1f}s)',
                  file=sys.stderr)

    t_init = time.perf_counter()
    # warm the device link (first device->host pull can pay a large
    # one-time session cost on tunneled deployments)
    _ = float(jnp.sum(jnp.ones(8)))
    vlog('device link warm')

    # backend A/B policy: Pallas lane-layout clash kernel on
    # accelerators, XLA matmul form on CPU (override with
    # TSCODE_USE_PALLAS_CLASH=0/1)
    from tscode_tpu.ops.clash import static_pairs, use_pallas_clash
    pallas_pairs = (static_pairs(cross_fragment_pair_mask(ids))
                    if use_pallas_clash(n_pairs=ids[0] * ids[1]) else None)
    vlog(f'clash kernel: {"pallas" if pallas_pairs else "xla"}')

    # warmup compile of the embed program (whole-grid or tiled by size)
    k1, k2 = centers1.shape[1], centers2.shape[1]
    B_total = mol1.n_confs * mol2.n_confs * k1 * k2 * N_ANGLES
    if B_total <= _WHOLE_GRID_MAX:
        tiling = dict(n_tiles=None, c2_per_tile=None)
    else:
        stride = mol1.n_confs * k2 * k1 * N_ANGLES
        c2_per_tile = max(1, _GRID_TILE // stride)
        tiling = dict(n_tiles=-(-mol2.n_confs // c2_per_tile),
                      c2_per_tile=c2_per_tile)
    poses, ok = _embed_clash(args, N_ANGLES, pallas_pairs)
    poses.block_until_ready()
    B = poses.shape[0]                 # padded rows for the tiled form
    vlog(f'embed program compiled, B={B_total}'
         + (f' (tiled x{tiling["n_tiles"]})' if tiling['n_tiles']
            else ''))

    # warm the fully fused single-program pipeline: the clash survivor
    # count fixes the prune schedule's chunk boundaries at trace time
    n_ok_warm = int(jnp.sum(ok))
    pool_pad = int(2 ** np.ceil(np.log2(max(n_ok_warm, 2))))
    heavy_idx = jnp.asarray(heavy)
    fused_args = args + (heavy_idx,)
    keep, stats = _pipeline_fused(
        *fused_args, n_angles=N_ANGLES, n_ok=n_ok_warm, s_pool=pool_pad,
        pallas_pairs=pallas_pairs, **tiling)
    keep.block_until_ready()
    stats = np.asarray(stats)
    assert stats[1] == n_ok_warm
    vlog(f'fused pipeline warm (single-program finish: {bool(stats[2])})')

    if os.environ.get('TSCODE_BENCH_STAGE') == '1':
        # stage split: time the (already-compiled) embed+clash program
        # alone — the fused-rep delta is the prune schedule's share
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            poses_s, ok_s = _embed_clash(args, N_ANGLES, pallas_pairs)
            ok_s.block_until_ready()
            ts.append(time.perf_counter() - t0)
        vlog(f'stage split: embed+clash alone {min(ts):.3f}s best of 3')

    # best-of-3 timed reps: the tunneled device link has rare
    # multi-second stalls that would otherwise corrupt the measurement.
    # One program runs embed -> clash -> compaction -> full RMSD-prune
    # schedule; the pruned ensemble stays on device (it would feed the
    # refinement stage there) and one scalar round trip closes the rep.
    best = None
    for rep in range(3):
        t0 = time.perf_counter()
        keep, stats = _pipeline_fused(
            *fused_args, n_angles=N_ANGLES, n_ok=n_ok_warm,
            s_pool=pool_pad, pallas_pairs=pallas_pairs, **tiling)
        stats = np.asarray(stats)                 # single host pull
        if not stats[2]:
            # survivors exceeded the single-program finish block:
            # complete the schedule on the host-orchestrated path
            # (timed — the fallback is part of the honest pipeline)
            from tscode_tpu.ops.rmsd_prune import \
                prune_conformers_rmsd_device
            poses2, ok2 = _embed_clash(args, N_ANGLES, pallas_pairs)
            idx2 = jnp.nonzero(ok2, size=pool_pad, fill_value=B)[0]
            hs2 = poses2[:, heavy_idx][jnp.clip(idx2, 0, B - 1)]
            mask = prune_conformers_rmsd_device(
                hs2, rmsd_thr=0.5, init_mask=np.array(keep),
                n_real=n_ok_warm)
            stats = np.array([int(mask.sum()), n_ok_warm, 1])
        elapsed = time.perf_counter() - t0
        n_final, n_ok = int(stats[0]), int(stats[1])
        assert n_ok == n_ok_warm
        vlog(f'rep {rep}: {n_ok} clash-ok, {n_final} final '
             f'({elapsed:.2f}s)')
        if best is None or elapsed < best[1]:
            best = (B_total, elapsed, n_ok, n_final)

    return best


def fit_cpu_baseline(mol1, mol2, sizes=(512, 1024, 2048, 4096)):
    '''Measure the sequential oracle at growing STRIDED sample sizes
    and extrapolate t(n) = a*n + b*n^2 to the full workload. The two
    phases are timed SEPARATELY and each coefficient comes from its own
    phase — embed+clash is linear (a = sum t_embed / sum n), the
    all-pairs prune is quadratic in survivors (b = sum t_prune /
    sum n^2) — which is far more robust than a joint least-squares fit
    whose quadratic term drowns in small-sample noise.
    Returns {sizes, seconds, embed_seconds, prune_seconds, coeffs,
    measured_rate, n_full, extrapolated_rate}; extrapolated_rate is the
    defensible vs_baseline denominator (the small-sample rate flatters
    the oracle: its quadratic prune has barely started).'''
    ns, t_embed, t_prune = [], [], []
    for n in sizes:
        n_done, te, tp = run_cpu_baseline(mol1, mol2, n_sample=n)
        ns.append(n_done)
        t_embed.append(te)
        t_prune.append(tp)
    ns_arr = np.asarray(ns, dtype=float)
    a = float(np.sum(t_embed) / np.sum(ns_arr))
    b = float(np.sum(t_prune) / np.sum(ns_arr ** 2))
    n_full = mol1.n_confs * mol2.n_confs * 2 * N_ANGLES
    t_full = a * n_full + b * n_full ** 2
    return {
        'sizes': ns,
        'seconds': [te + tp for te, tp in zip(t_embed, t_prune)],
        'embed_seconds': t_embed, 'prune_seconds': t_prune,
        'coeffs': [a, b],
        'measured_rate': ns[-1] / (t_embed[-1] + t_prune[-1]),
        'n_full': n_full,
        'extrapolated_rate': n_full / t_full,
    }


def run_cpu_baseline(mol1, mol2, n_sample=BASE_SAMPLE):
    '''Sequential numpy oracle on a strided subsample; returns
    (n, embed_seconds, prune_seconds).'''
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), 'tests'))
    import oracles

    ids = np.array([mol1.n_atoms, mol2.n_atoms])
    atomnos = np.concatenate([mol1.atomnos, mol2.atomnos])
    heavy = atomnos != 1

    angles = np.linspace(0.0, 360.0 - 360.0 / N_ANGLES, N_ANGLES)
    k1 = len(mol1.get_r_atoms(0)[0].center)
    k2 = len(mol2.get_r_atoms(0)[0].center)

    # STRIDED sample across the whole grid: the grid enumerates angles
    # innermost, so a prefix sample sees mostly rotations of a handful
    # of conformer pairs — their near-duplicates die on the pruner's
    # first comparisons, hiding the quadratic cost entirely (a fitted
    # b of ~0). An evenly-strided sample has the full workload's
    # conformer diversity, which is what the extrapolation needs.
    total = mol1.n_confs * mol2.n_confs * k1 * k2 * N_ANGLES
    stride = max(1, total // n_sample)

    t0 = time.perf_counter()
    poses = []
    n_done = 0
    flat = 0
    for c1 in range(mol1.n_confs):
        for c2 in range(mol2.n_confs):
            for ai1 in range(k1):
                for ai2 in range(k2):
                    for angle in angles:
                        flat += 1
                        if (flat - 1) % stride or n_done >= n_sample:
                            continue
                        ra1 = mol1.get_r_atoms(c1)[0]
                        ra2 = mol2.get_r_atoms(c2)[0]
                        rot = oracles.rotation_matrix_from_vectors(
                            ra2.orb_vecs[ai2], -ra1.orb_vecs[ai1])
                        if angle != 0:
                            rot = oracles.rot_mat_from_pointer(
                                ra1.orb_vecs[ai1], angle) @ rot
                        pos = ra1.center[ai1] - rot @ ra2.center[ai2]
                        pose = np.concatenate([
                            mol1.atomcoords[c1],
                            (rot @ mol2.atomcoords[c2].T).T + pos])
                        if oracles.compenetration_check(pose, ids=ids):
                            poses.append(pose)
                        n_done += 1
    t_embed = time.perf_counter() - t0

    # sequential all-pairs prune with the reference accept rule
    t1 = time.perf_counter()
    hs = np.array([p[heavy] for p in poses])
    mask = np.ones(len(hs), dtype=bool)
    for i in range(len(hs)):
        if not mask[i]:
            continue
        for j in range(i + 1, len(hs)):
            if mask[j]:
                r, md = oracles.rmsd_and_max(hs[i].copy(), hs[j].copy())
                if r < 0.5 and md < 1.0:
                    mask[i] = False
                    break
    t_prune = time.perf_counter() - t1
    return n_done, t_embed, t_prune


def _probe_backend(timeout_s):
    '''Probe, in a SUBPROCESS with a hard timeout, the backend that
    `ensure_backend()` itself would resolve (NOT just the env var — the
    host sitecustomize can select the accelerator with the var unset).
    A wedged device tunnel blocks inside PJRT init (not catchable
    in-process), which would hang the whole benchmark; probing from a
    child lets the parent fall back to CPU and still emit a result.
    Returns the resolved backend name, or None on hang/failure.'''
    from tscode_tpu.backend import subprocess_probe
    result = subprocess_probe(timeout_s=timeout_s)
    if not result['ok']:
        print(f'[bench] probe: {result["detail"]}', file=sys.stderr)
    return result['backend']


def _acquire_backend():
    '''Probe -> on failure wait and re-probe (a wedged tunnel often
    clears within minutes) -> only then fall back to CPU. Returns the
    backend name the run will use.'''
    tries = int(os.environ.get('TSCODE_BENCH_PROBE_TRIES', '3'))
    wait_s = int(os.environ.get('TSCODE_BENCH_PROBE_WAIT', '90'))
    base_timeout = int(os.environ.get('TSCODE_BENCH_PROBE_TIMEOUT', '300'))
    for attempt in range(tries):
        timeout_s = base_timeout + 120 * attempt   # cold init can be slow
        backend = _probe_backend(timeout_s)
        if backend is not None:
            return backend
        print(f'[bench] probe {attempt + 1}/{tries} failed '
              f'(timeout {timeout_s}s)', file=sys.stderr)
        if attempt < tries - 1:
            print(f'[bench] waiting {wait_s}s for the tunnel to clear',
                  file=sys.stderr)
            time.sleep(wait_s)
    # the round-4 driver run lost its on-chip number to a wedge that
    # cleared in ~10 min (BASELINE.md): one long cool-down, then one
    # final probe, before surrendering to the CPU fallback
    cooldown = int(os.environ.get('TSCODE_BENCH_PROBE_COOLDOWN', '600'))
    if cooldown > 0:
        print(f'[bench] all probes failed — cooling down {cooldown}s '
              f'before one final probe', file=sys.stderr)
        time.sleep(cooldown)
        backend = _probe_backend(base_timeout + 120 * tries)
        if backend is not None:
            return backend
        print('[bench] final post-cooldown probe failed', file=sys.stderr)
    return None


def _pipeline_only():
    '''Child-process entry: run the timed device pipeline and print ONE
    JSON line {total, seconds, n_ok, n_final, backend}. Isolating the
    accelerator attempt in a child lets the parent survive a hanging
    Mosaic compile or a mid-run tunnel wedge and still emit a result.'''
    from tscode_tpu.backend import ensure_backend
    backend = ensure_backend(quiet=True)
    mols = build_workload()
    total, elapsed, n_ok, n_final = run_device_pipeline(*mols)
    print('PIPELINE_RESULT ' + json.dumps({
        'total': total, 'seconds': elapsed, 'n_ok': n_ok,
        'n_final': n_final, 'backend': backend}))


def _run_pipeline_child(env_overrides, timeout_s):
    '''Run `bench.py --pipeline-only` in a child; returns the parsed
    result dict or None on timeout/crash.'''
    import subprocess
    env = dict(os.environ, **env_overrides)
    env['PYTHONPATH'] = (os.path.dirname(os.path.abspath(__file__))
                         + os.pathsep + env.get('PYTHONPATH', ''))
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--pipeline-only'],
            env=env, capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(f'[bench] pipeline child timed out after {timeout_s}s '
              f'(overrides={env_overrides})', file=sys.stderr)
        return None, 'timeout'
    sys.stderr.write(r.stderr[-2000:])
    for line in r.stdout.splitlines():
        if line.startswith('PIPELINE_RESULT '):
            return json.loads(line[len('PIPELINE_RESULT '):]), 'ok'
    print(f'[bench] pipeline child rc={r.returncode}, no result '
          f'(overrides={env_overrides})', file=sys.stderr)
    return None, 'crash'


def main():
    global N_CONFS
    run_timeout = int(os.environ.get('TSCODE_BENCH_RUN_TIMEOUT', '1500'))
    probed = _acquire_backend()

    res = None
    ab = {}
    if probed is not None and probed != 'cpu':
        # accelerator attempt, isolated per clash-kernel variant: the
        # A/B is recorded, the parent survives a compile hang, and a
        # Pallas-specific failure still yields the XLA number.
        for label, flag in (('pallas', '1'), ('xla', '0')):
            attempt, status = _run_pipeline_child(
                {'TSCODE_USE_PALLAS_CLASH': flag,
                 'TSCODE_BENCH_VERBOSE':
                     os.environ.get('TSCODE_BENCH_VERBOSE', '0')},
                run_timeout)
            if attempt is not None:
                attempt['clash_kernel'] = label
                if attempt.get('backend') == 'cpu':
                    # the child's flaky plugin registration can fall
                    # back to CPU even after a successful parent probe;
                    # never record that as an accelerator A/B number
                    print(f'[bench] {label} child ran on CPU '
                          f'(plugin registration failed?) — not '
                          f'recording as accelerator result',
                          file=sys.stderr)
                    continue
                ab[label] = attempt['total'] / attempt['seconds']
                if res is None or ab[label] > res['total'] / res['seconds']:
                    res = attempt
            elif status == 'timeout':
                # a killed remote compile can wedge the tunnel for all
                # later clients — do NOT resubmit another monster
                # program on top of it; take the fallback instead
                print('[bench] skipping further device attempts after '
                      'a timeout (resubmitting compounds a tunnel '
                      'wedge)', file=sys.stderr)
                break
        if ab:
            print(f'[bench] clash-kernel A/B (poses/s): '
                  + ', '.join(f'{k}={v:,.0f}' for k, v in ab.items()),
                  file=sys.stderr)
            with open(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    '.bench_ab.json'), 'w') as f:
                json.dump(ab, f)

    if res is None:
        if probed != 'cpu':
            # wedged/unreachable accelerator (or both device attempts
            # failed): run the same pipeline on CPU at a reduced size
            # rather than hanging the driver. The emitted metric is
            # labeled backend=cpu so the number is not mistaken for a
            # TPU result.
            print('[bench] no accelerator result, falling back to CPU',
                  file=sys.stderr)
            if 'TSCODE_BENCH_CONFS' not in os.environ:
                N_CONFS = 24
        os.environ['JAX_PLATFORMS'] = 'cpu'
        import jax
        jax.config.update('jax_platforms', 'cpu')
        from tscode_tpu.backend import ensure_backend
        backend = ensure_backend(quiet=True)
        mols = build_workload()
        total, elapsed, n_ok, n_final = run_device_pipeline(*mols)
    else:
        backend = res['backend']
        total, elapsed = res['total'], res['seconds']
        n_ok, n_final = res['n_ok'], res['n_final']
        mols = build_workload()        # for the baseline fit below

    device_rate = total / elapsed

    key = f'fitv3-{N_CONFS}x{N_CONFS}x{N_ANGLES}-n{NOISE}'
    cache = {}
    if os.path.isfile(BASELINE_CACHE):
        try:
            cache = json.load(open(BASELINE_CACHE))
        except Exception:
            cache = {}
    fit = cache.get(key)
    if fit is None or 'extrapolated_rate' not in fit:
        print('[bench] measuring CPU oracle at growing sizes for the '
              'quadratic baseline fit', file=sys.stderr)
        fit = fit_cpu_baseline(*mols)
        cache[key] = fit
        with open(BASELINE_CACHE, 'w') as f:
            json.dump(cache, f)

    # vs_baseline denominator: the oracle's FITTED rate at the actual
    # workload size (t = a*n + b*n^2, coefficients measured above) —
    # the small-sample rate flatters the oracle because its quadratic
    # prune has barely started there. Both are printed.
    baseline_rate = fit['extrapolated_rate']
    print(f'[bench] CPU oracle: measured {fit["measured_rate"]:.0f} '
          f'poses/s at n={fit["sizes"][-1]}; fitted '
          f't(n) = {fit["coeffs"][0]:.3e}*n + {fit["coeffs"][1]:.3e}*n^2 '
          f'-> {baseline_rate:.2f} poses/s at n={fit["n_full"]} '
          f'(vs_baseline uses the fitted full-workload rate)',
          file=sys.stderr)

    ab_note = (' clash A/B poses/s: '
               + '/'.join(f'{k}={v:,.0f}' for k, v in ab.items()) + ';'
               if len(ab) > 1 else '')
    if not ab and backend == 'cpu' and probed != 'cpu':
        # CPU fallback after a failed accelerator acquisition: point at
        # the last recorded on-chip A/B (committed .bench_ab.json) so
        # the artifact self-documents that this is a wedged-tunnel
        # number, not the chip's capability
        try:
            prev = json.load(open(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                '.bench_ab.json')))
            best = max(prev.values())
            ab_note = (f' TPU unreachable this run; last recorded '
                       f'on-chip rate {best:,.0f} poses/s '
                       f'(.bench_ab.json, BASELINE.md);')
        except Exception:
            pass
    result = {
        'metric': (f'poses/sec through embed+clash+RMSD-prune '
                   f'({total} poses, backend={backend}, '
                   f'{n_ok} clash-ok, {n_final} final;{ab_note} '
                   f'CPU oracle fitted at this size: '
                   f'{baseline_rate:.2f} poses/s, '
                   f'measured {fit["measured_rate"]:.0f} poses/s at '
                   f'n={fit["sizes"][-1]})'),
        'value': round(device_rate, 1),
        'unit': 'poses/sec',
        'vs_baseline': round(device_rate / baseline_rate, 2),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    if '--pipeline-only' in sys.argv:
        _pipeline_only()
    else:
        main()
