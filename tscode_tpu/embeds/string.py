'''
String embed: two molecules, one reactive atom each.

TPU re-design of the reference's triple Python loop
(/root/reference/tscode/embeds.py:36-133): the whole
(conf1 x conf2 x lobe1 x lobe2 x angle) grid is evaluated as ONE batched
device program — alignment rotations, spin rotations, pose
materialization, clash screening and torsion fingerprints all ride the
VPU/MXU; only the order-dependent TFD novelty filter (a sequential
prefix scan over generated poses) replays on host from the
device-computed fingerprints.
'''

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tscode_tpu.embeds.common import materialize_two_mol, stacked_lobes
from tscode_tpu.errors import ZeroCandidatesError
from tscode_tpu.graphs import get_quadruplets, get_sum_graph
from tscode_tpu.ops.clash import cross_fragment_pair_mask
from tscode_tpu.ops.linalg import rot_mat_from_pointer, rotation_matrix_from_vectors
from tscode_tpu.ops.tfd import (is_new_structure_lru, tfd_novelty_device,
                                torsion_fingerprints)

_CHUNK = 4096
# lax.map tile size cap for the fused sweep (pow2; tests shrink it to
# force multi-tile maps at small grids)
_SWEEP_TILE_CAP = 1 << 16


@functools.partial(jax.jit, static_argnames=('pallas_pairs',))
def _string_chunk(coords1, coords2, centers1, vecs1, centers2, vecs2,
                  pair_mask, quadruplets, angles,
                  c1, c2, a1, a2, ai, clash_thresh, pallas_pairs=None):
    '''
    One grid chunk: index arrays (B,) -> poses (B, N, 3), clash accept
    (B,) bool, torsion fingerprints (B, Q) f32.
    pallas_pairs: STATIC cross-fragment pair tuple — routes the clash
    screen through the Pallas lane-layout kernel (accelerator backends,
    ops/clash.use_pallas_clash policy) instead of the XLA matmul form.
    '''
    p1 = centers1[c1, a1]                       # (B, 3) target lobe
    p2 = centers2[c2, a2]
    ref_vec = vecs1[c1, a1]
    mol_vec = vecs2[c2, a2]

    # align mol2's orbital antiparallel to mol1's, then spin about it
    align = rotation_matrix_from_vectors(mol_vec, -ref_vec)
    spin = rot_mat_from_pointer(ref_vec, angles[ai])
    R = jnp.einsum('bij,bjk->bik', spin, align)
    t = p1 - jnp.einsum('bij,bj->bi', R, p2)

    poses = materialize_two_mol(coords1, coords2, c1, c2, R, t)

    if pallas_pairs is not None:
        from tscode_tpu.ops.pallas.clash import clash_ok_traced
        clash_ok = clash_ok_traced(poses, pallas_pairs, clash_thresh)
    else:
        d2 = _pairwise_d2(poses)
        clash_ok = jnp.sum((d2 < clash_thresh * clash_thresh) & pair_mask,
                           axis=(-2, -1)) <= 0

    tfps = torsion_fingerprints(poses, quadruplets)
    return poses, clash_ok, tfps


def _pairwise_d2(poses):
    a2 = jnp.sum(poses * poses, axis=-1)
    ab = jnp.einsum('bni,bmi->bnm', poses, poses)
    return jnp.maximum(a2[..., :, None] + a2[..., None, :] - 2.0 * ab, 0.0)


def _string_bcast_block(coords1, coords2b, centers1, vecs1, centers2b,
                        vecs2b, pair_mask, quadruplets, angles,
                        clash_thresh, pallas_pairs=None):
    '''BROADCAST (gather-free) string embed of a c2-aligned conformer
    block: the grid is a pure cartesian product, so every tensor is
    built by broadcasting over the (c2, c1, l2, l1, angle) axes — whose
    C-order reshape IS the flat grid order flat_grid(n2c, n1c, k2, k1,
    n_ang) produces — instead of decoding flat indices and GATHERING
    per-pose conformer/lobe rows. The per-pose gathers (coords2[c2],
    centers[c, l]) were 61% of the tier-2 bench rep; the fused
    embed+clash+compact dropped 0.228 -> 0.065 s at 1.66M poses when
    bench.py adopted this form (BASELINE.md round-3 final act).

    coords2b/centers2b/vecs2b: a contiguous (Cb, ...) slice of molecule
    2's conformer tensors. Returns (poses (Cb*n1c*k2*k1*A, N1+N2, 3),
    clash_ok (B,), tfps (B, Q)) in flat grid order.'''
    n1c, k1 = centers1.shape[0], centers1.shape[1]
    cb, k2 = centers2b.shape[0], centers2b.shape[1]
    A = angles.shape[0]
    B = cb * n1c * k2 * k1 * A

    p1 = centers1[None, :, None, :, None]        # (1, n1c, 1, k1, 1, 3)
    ref_vec = vecs1[None, :, None, :, None]
    p2 = centers2b[:, None, :, None, None]       # (cb, 1, k2, 1, 1, 3)
    mol_vec = vecs2b[:, None, :, None, None]
    ang = angles[None, None, None, None, :]      # (1, 1, 1, 1, A)

    align = rotation_matrix_from_vectors(mol_vec, -ref_vec)
    spin = rot_mat_from_pointer(
        jnp.broadcast_to(ref_vec, ref_vec.shape[:4] + (A, 3)),
        jnp.broadcast_to(ang, ref_vec.shape[:4] + (A,)))
    R = jnp.einsum('...ij,...jk->...ik', spin, align)
    t = p1 - jnp.einsum('...ij,...j->...i', R, p2)

    f2 = jnp.einsum('...ij,...nj->...ni', R,
                    coords2b[:, None, None, None, None]) + t[..., None, :]
    shape5 = (cb, n1c, k2, k1, A)
    f1 = jnp.broadcast_to(coords1[None, :, None, None, None],
                          shape5 + coords1.shape[1:])
    f2 = jnp.broadcast_to(f2, shape5 + f2.shape[-2:])
    poses = jnp.concatenate([f1, f2], axis=-2).reshape(
        (B, coords1.shape[1] + coords2b.shape[1], 3))

    if pallas_pairs is not None:
        from tscode_tpu.ops.pallas.clash import clash_ok_traced
        clash_ok = clash_ok_traced(poses, pallas_pairs, clash_thresh)
    else:
        d2 = _pairwise_d2(poses)
        clash_ok = jnp.sum((d2 < clash_thresh * clash_thresh) & pair_mask,
                           axis=(-2, -1)) <= 0

    tfps = torsion_fingerprints(poses, quadruplets)
    return poses, clash_ok, tfps


@functools.partial(jax.jit,
                   static_argnames=('n_tiles', 'c2_per_tile',
                                    'pallas_pairs'))
def _string_sweep_bcast(coords1, coords2p, centers1, vecs1, centers2p,
                        vecs2p, pair_mask, quadruplets, angles,
                        clash_thresh, c2_base, n2c_real, n_tiles,
                        c2_per_tile, pallas_pairs=None):
    '''Grid-slab string sweep as ONE device program, broadcast form: a
    lax.map over c2-ALIGNED tiles — each tile is the gather-free
    broadcast block of `c2_per_tile` molecule-2 conformers against the
    whole (c1, l2, l1, angle) sub-grid, and live intermediates stay at
    one tile's footprint. Tiling by the OUTERMOST grid axis keeps every
    tile axis-aligned; a flat-index tile would cut across the cartesian
    axes and force the per-pose gather form back in. coords2p/centers2p/
    vecs2p must be edge-padded along the conformer axis so a tail
    tile's dynamic_slice never clamps (a clamped slice would shift
    content against row labels and corrupt real rows); pad rows report
    clash_ok False via the n2c_real mask and sit at the END of the
    flattened output (tiles ascend in c2), so callers trim them by row
    count. c2_base/n2c_real are traced: same-shape slabs share one
    executable.'''
    n1c, k1 = centers1.shape[0], centers1.shape[1]
    k2 = centers2p.shape[1]
    A = angles.shape[0]
    stride = n1c * k2 * k1 * A

    def tile(t):
        c0 = c2_base + t * c2_per_tile
        c2s = jax.lax.dynamic_slice_in_dim(coords2p, c0, c2_per_tile)
        p2 = jax.lax.dynamic_slice_in_dim(centers2p, c0, c2_per_tile)
        v2 = jax.lax.dynamic_slice_in_dim(vecs2p, c0, c2_per_tile)
        poses, ok, tfps = _string_bcast_block(
            coords1, c2s, centers1, vecs1, p2, v2, pair_mask,
            quadruplets, angles, clash_thresh,
            pallas_pairs=pallas_pairs)
        real = (c0 + jnp.arange(c2_per_tile, dtype=jnp.int32)) < n2c_real
        return poses, ok & jnp.repeat(real, stride), tfps

    starts = jnp.arange(n_tiles, dtype=jnp.int32)
    poses, ok, tfps = jax.lax.map(tile, starts)
    return (poses.reshape((-1,) + poses.shape[2:]),
            ok.reshape(-1),
            tfps.reshape((-1,) + tfps.shape[2:]))


def _string_sweep_slab(base_args, clash_thresh, c2_lo, n2c, n_tiles,
                       c2_per_tile, pallas_pairs):
    return _string_sweep_bcast(
        *base_args, jnp.asarray(float(clash_thresh)),
        jnp.asarray(c2_lo, jnp.int32), jnp.asarray(n2c, jnp.int32),
        n_tiles=n_tiles, c2_per_tile=c2_per_tile,
        pallas_pairs=pallas_pairs)


@functools.lru_cache(maxsize=16)
def _string_sweep_sharded(mesh, c2_per_tile, axis_name='poses'):
    '''shard_map form of _string_sweep_bcast: the c2-aligned TILE axis
    is sharded over devices — each device lax.maps the SAME broadcast
    tile program over its contiguous block of tile starts, with the
    (small) molecule tensors replicated and no collective needed (the
    TFD novelty filter is a host-side sequential replay either way).
    Device outputs concatenate in mesh order = ascending c2, so global
    row order equals the single-device sweep's. The clash screen keeps
    the XLA matmul form inside shard_map (Pallas kernels do not lower
    through it on all backends). Outputs match the single-device
    broadcast sweep to fusion-order ulps — see the allclose contract in
    tests/test_mesh_pipeline.py.'''
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:                 # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    def sweep(coords1, coords2p, centers1, vecs1, centers2p, vecs2p,
              pair_mask, quadruplets, angles, clash_thresh, n2c_real,
              starts):
        stride = (centers1.shape[0] * centers2p.shape[1]
                  * centers1.shape[1] * angles.shape[0])

        def tile(c0):
            c2s = jax.lax.dynamic_slice_in_dim(coords2p, c0, c2_per_tile)
            p2 = jax.lax.dynamic_slice_in_dim(centers2p, c0, c2_per_tile)
            v2 = jax.lax.dynamic_slice_in_dim(vecs2p, c0, c2_per_tile)
            poses, ok, tfps = _string_bcast_block(
                coords1, c2s, centers1, vecs1, p2, v2, pair_mask,
                quadruplets, angles, clash_thresh)
            real = (c0 + jnp.arange(c2_per_tile, dtype=jnp.int32)) \
                < n2c_real
            return poses, ok & jnp.repeat(real, stride), tfps

        poses, ok, tfps = jax.lax.map(tile, starts)
        return (poses.reshape((-1,) + poses.shape[2:]),
                ok.reshape(-1),
                tfps.reshape((-1,) + tfps.shape[2:]))

    rep, sh = P(), P(axis_name)
    fn = shard_map(sweep, mesh=mesh,
                   in_specs=(rep,) * 11 + (sh,),
                   out_specs=(sh, sh, sh))
    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def _string_chunk_sharded(mesh, axis_name='poses'):
    '''shard_map form of _string_chunk over the pose (grid) axis: each
    device materializes and screens ITS OWN slice of the chunk — the
    molecule tensors are replicated (small), the grid index arrays are
    sharded, and no collective is needed (the TFD novelty filter is a
    host-side sequential replay either way). Bit-identical outputs.'''
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:                 # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    rep, sh = P(None), P(axis_name)
    fn = shard_map(_string_chunk.__wrapped__, mesh=mesh,
                   in_specs=(rep,) * 9 + (sh,) * 5 + (P(),),
                   out_specs=(sh, sh, sh))
    return jax.jit(fn)


def string_embed(mol1, mol2, angles, clash_thresh=1.5, tfd_thresh=10,
                 log=print, chunk=_CHUNK, mesh=None):
    '''
    Generate string-embed poses for two single-reactive-atom molecules.

    angles: iterable of spin angles in degrees (the embedder's
    systematic_angles, reference embedder.py:735).
    Returns (poses (B, N1+N2, 3) float64, constrained_indices (B, 1, 2)).
    Raises ZeroCandidatesError when nothing survives, like the reference.

    mesh: optional jax.sharding.Mesh — when given and the grid is large
    enough (parallel.sharding.mesh_wants), every chunk is materialized
    and clash-screened sharded over the pose axis.
    '''
    ids = (mol1.n_atoms, mol2.n_atoms)
    r1 = int(mol1.reactive_indices[0])
    r2 = int(mol2.reactive_indices[0]) + ids[0]

    quadruplets = get_quadruplets(
        get_sum_graph((mol1.graph, mol2.graph), [[r1, r2]]))

    centers1, vecs1 = stacked_lobes(mol1)
    centers2, vecs2 = stacked_lobes(mol2)
    n1c, n2c = mol1.n_confs, mol2.n_confs
    k1, k2 = centers1.shape[1], centers2.shape[1]
    angles = np.asarray(angles, dtype=np.float64)
    n_ang = len(angles)

    # grid in the reference's generation order:
    # for (c1, c2) in cartesian (c1 fastest) -> for (ai1, ai2) (ai1 fastest)
    # -> for angle; expressed as a C-order grid with (c2, c1, a2, a1,
    # angle) outermost-to-innermost
    from tscode_tpu.embeds.common import flat_grid
    c2g, c1g, a2g, a1g, aig = flat_grid(n2c, n1c, k2, k1, n_ang)
    total = len(c1g)
    log(f'--> Performing string embed ({total} candidates)')

    # backend A/B policy for the clash screen (Pallas on accelerators);
    # the mesh-sharded variant keeps the XLA form inside shard_map
    from tscode_tpu.ops.clash import static_pairs, use_pallas_clash
    pallas_pairs = (static_pairs(cross_fragment_pair_mask(ids))
                    if use_pallas_clash(n_pairs=ids[0] * ids[1]) else None)

    want_mesh = False
    chunk_fn = _string_chunk
    if mesh is not None and mesh.devices.size > 1:
        from tscode_tpu.parallel.sharding import mesh_wants
        if mesh_wants(total):
            want_mesh = True
            n_dev = mesh.devices.size
            chunk = -(-chunk // n_dev) * n_dev     # divisible shards
            chunk_fn = _string_chunk_sharded(mesh)

    pair_mask = jnp.asarray(cross_fragment_pair_mask(ids))
    dev = dict(coords1=jnp.asarray(mol1.atomcoords),
               coords2=jnp.asarray(mol2.atomcoords),
               centers1=jnp.asarray(centers1), vecs1=jnp.asarray(vecs1),
               centers2=jnp.asarray(centers2), vecs2=jnp.asarray(vecs2),
               pair_mask=pair_mask,
               quadruplets=jnp.asarray(quadruplets, dtype=jnp.int32),
               angles=jnp.asarray(angles))

    # dispatch the sweep before pulling anything, and keep even the
    # clash SURVIVORS device-resident (pull=False): the TFD novelty
    # filter below cuts ~10^5 survivors to a few hundred poses, so
    # only the (small) fingerprint block and the bitmask cross the
    # link before that cut, and the pose pull happens once, for the
    # novel rows alone. On a tunneled accelerator these pulls — not
    # math — dominated this sweep.
    import os as _os
    import time as _time
    from tscode_tpu.embeds.common import MaskedPullAccumulator
    trace = _os.environ.get('TSCODE_EMBED_TRACE') == '1'
    t_0 = _time.perf_counter()
    acc = MaskedPullAccumulator(pull=False)

    if _os.environ.get('TSCODE_FUSED_SWEEP', '1') != '0':
        # the WHOLE grid as memory-bounded slabs of ONE lax.map program
        # each, in the gather-free broadcast form over c2-ALIGNED tiles
        # (single-device) or with the tile axis sharded over the mesh.
        # A slab costs ~10 uploads + 1 dispatch regardless of grid size.
        itemsize = 8 if jax.config.jax_enable_x64 else 4
        n_atoms = mol1.n_atoms + mol2.n_atoms
        stride = n1c * k2 * k1 * n_ang            # rows per c2 value
        c2_per_tile = max(1, min(n2c, _SWEEP_TILE_CAP // max(1, stride)))
        tile_rows = c2_per_tile * stride
        slab_tiles = max(1, int(1.2e9)
                         // max(1, tile_rows * n_atoms * 3 * itemsize))
        if want_mesh:
            n_dev = mesh.devices.size
            slab_tiles = -(-slab_tiles // n_dev) * n_dev

        tiles_total = -(-n2c // c2_per_tile)
        slabs = []                                # (tile_lo, n_tiles)
        for t_lo in range(0, tiles_total, slab_tiles):
            t_n = min(slab_tiles, tiles_total - t_lo)
            if want_mesh:
                t_n = -(-t_n // n_dev) * n_dev    # whole-mesh shards
            slabs.append((t_lo, t_n))

        # edge-pad the conformer axis so no tile's dynamic_slice can
        # clamp (a clamped slice shifts content against row labels)
        pad_to = max(t + n for t, n in slabs) * c2_per_tile
        def pad2(a):
            a = np.asarray(a)
            return jnp.asarray(np.pad(
                a, ((0, pad_to - n2c),) + ((0, 0),) * (a.ndim - 1),
                mode='edge'))
        base_args = (
            dev['coords1'], pad2(mol2.atomcoords), dev['centers1'],
            dev['vecs1'], pad2(centers2), pad2(vecs2), dev['pair_mask'],
            dev['quadruplets'], dev['angles'])

        for t_lo, t_n in slabs:
            c2_lo = t_lo * c2_per_tile
            n_valid = (min(n2c, (t_lo + t_n) * c2_per_tile)
                       - c2_lo) * stride
            if want_mesh:
                starts = jnp.asarray(
                    (t_lo + np.arange(t_n)) * c2_per_tile, jnp.int32)
                poses, ok, tfps = _string_sweep_sharded(
                    mesh, c2_per_tile)(
                        *base_args, jnp.asarray(float(clash_thresh)),
                        jnp.asarray(n2c, jnp.int32), starts)
            else:
                poses, ok, tfps = _string_sweep_slab(
                    base_args, float(clash_thresh), c2_lo, n2c, t_n,
                    c2_per_tile, pallas_pairs)
            acc.add((poses, tfps), ok, n_valid)
    else:
        for lo in range(0, total, chunk):
            hi = min(lo + chunk, total)
            pad = chunk - (hi - lo)
            sl = lambda g: jnp.asarray(
                np.pad(g[lo:hi], (0, pad), mode='edge'))
            # positional call: shard_map-wrapped programs take no kwargs
            pos_args = (
                dev['coords1'], dev['coords2'], dev['centers1'],
                dev['vecs1'], dev['centers2'], dev['vecs2'],
                dev['pair_mask'], dev['quadruplets'], dev['angles'],
                sl(c1g), sl(c2g), sl(a1g), sl(a2g), sl(aig),
                jnp.asarray(float(clash_thresh)))
            if chunk_fn is _string_chunk and pallas_pairs is not None:
                poses, ok, tfps = chunk_fn(*pos_args,
                                           pallas_pairs=pallas_pairs)
            else:
                poses, ok, tfps = chunk_fn(*pos_args)
            acc.add((poses, tfps), ok, hi - lo)

    t_sweep = _time.perf_counter()
    fields, ok_all = acc.finish()
    if not ok_all.any():
        raise ZeroCandidatesError(
            '--> String embed did not find any suitable disposition of '
            'molecules.\n    Try expanding the conformational space with '
            'the csearch> operator or see the SHRINK keyword.')
    kept_poses_dev, kept_tfps_dev = fields
    t_finish = _time.perf_counter()

    # order-dependent TFD novelty filter (reference embeds.py:47-69 via
    # is_new_structure). On accelerator backends the filter itself runs
    # ON DEVICE (ops/tfd.tfd_novelty_device — exact block-scan replay of
    # the sequential leader rule) so only the novelty BITMASK crosses
    # the link; the fingerprint pull + host LRU replay remain the
    # fallback (cache overflow, torsion-free systems, CPU backend where
    # the native loop is already link-free). TSCODE_DEVICE_TFD=0/1
    # overrides the backend policy.
    dev_tfd_env = _os.environ.get('TSCODE_DEVICE_TFD')
    use_dev_tfd = (dev_tfd_env == '1'
                   or (dev_tfd_env != '0'
                       and jax.default_backend() not in ('cpu',)))
    novel, tfd_lane = None, 'host'
    if use_dev_tfd and len(kept_tfps_dev):
        novel_dev, dev_ok = tfd_novelty_device(kept_tfps_dev,
                                               thresh=tfd_thresh)
        if dev_ok:
            novel, tfd_lane = novel_dev, 'device'
    if novel is None:
        kept_tfps = np.asarray(kept_tfps_dev)
        novel = is_new_structure_lru(kept_tfps,
                                     np.ones(len(kept_tfps), dtype=bool),
                                     thresh=tfd_thresh)
    novel_idx = np.nonzero(novel)[0]
    t_lru = _time.perf_counter()

    if len(novel_idx) == 0:
        raise ZeroCandidatesError(
            '--> String embed did not find any suitable disposition of '
            'molecules (all poses torsionally redundant).')

    # the one pose pull of the sweep: the novel survivor rows only
    final = np.asarray(jnp.take(kept_poses_dev,
                                jnp.asarray(novel_idx), axis=0))
    if trace:
        import sys as _sys
        t_end = _time.perf_counter()
        n_surv = len(kept_tfps_dev)
        print(f'[embed trace] sweep {t_sweep - t_0:.3f}s, '
              f'survivor compaction {t_finish - t_sweep:.3f}s, '
              f'tfd filter ({tfd_lane}) {t_lru - t_finish:.3f}s '
              f'({n_surv} survivor rows), '
              f'novel pose pull {t_end - t_lru:.3f}s '
              f'({len(novel_idx)} rows)', file=_sys.stderr, flush=True)

    constrained = np.array([[[r1, r2]]] * len(final))
    return final, constrained
