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
from tscode_tpu.ops.tfd import is_new_structure_lru, torsion_fingerprints

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


@functools.partial(jax.jit,
                   static_argnames=('n_tiles', 'tile_b', 'pallas_pairs'))
def _string_sweep_mapped(coords1, coords2, centers1, vecs1, centers2,
                         vecs2, pair_mask, quadruplets, angles,
                         clash_thresh, r_base, r_hi, n_tiles, tile_b,
                         pallas_pairs=None):
    '''Grid-slab string sweep as ONE device program: flat grid indices
    [r_base, r_hi) are decoded on device (C order matching
    embeds.common.flat_grid(n2c, n1c, k2, k1, n_ang) — the reference's
    nested-loop generation order) and a lax.map over tiles bounds live
    intermediates at one tile. Zero per-chunk uploads/dispatches — on a
    tunneled accelerator the host loop's index uploads were the
    dominant sweep cost after the survivor-pull fix. Rows are padded
    to n_tiles*tile_b; padded tails report clash_ok False. r_base/r_hi
    are traced, so every same-shape slab reuses one executable.'''
    n1c, k1 = centers1.shape[0], centers1.shape[1]
    n2c, k2 = centers2.shape[0], centers2.shape[1]
    n_ang = angles.shape[0]
    total = n2c * n1c * k2 * k1 * n_ang

    def tile(r0):
        r = r_base + r0 + jnp.arange(tile_b, dtype=jnp.int32)
        real = r < r_hi
        rc = jnp.minimum(r, total - 1)
        ai = rc % n_ang
        rest = rc // n_ang
        a1 = rest % k1
        rest = rest // k1
        a2 = rest % k2
        rest = rest // k2
        c1 = rest % n1c
        c2 = rest // n1c
        poses, ok, tfps = _string_chunk.__wrapped__(
            coords1, coords2, centers1, vecs1, centers2, vecs2,
            pair_mask, quadruplets, angles, c1, c2, a1, a2, ai,
            clash_thresh, pallas_pairs=pallas_pairs)
        return poses, ok & real, tfps

    starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile_b
    poses, ok, tfps = jax.lax.map(tile, starts)
    return (poses.reshape((-1,) + poses.shape[2:]),
            ok.reshape(-1),
            tfps.reshape((-1,) + tfps.shape[2:]))


def _string_sweep_slab(base_args, clash_thresh, lo, hi, n_tiles, tile_b,
                       pallas_pairs):
    return _string_sweep_mapped(
        *base_args, jnp.asarray(float(clash_thresh)),
        jnp.asarray(lo, jnp.int32), jnp.asarray(hi, jnp.int32),
        n_tiles=n_tiles, tile_b=tile_b, pallas_pairs=pallas_pairs)


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

    chunk_fn = _string_chunk
    if mesh is not None and mesh.devices.size > 1:
        from tscode_tpu.parallel.sharding import mesh_wants
        if mesh_wants(total):
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

    # dispatch the sweep before pulling anything, and pull ONLY the
    # clash survivors: the pose and fingerprint tensors stay device-
    # resident; the accumulator pulls the ok bitmask plus the gathered
    # survivor rows (reference-order). On a tunneled accelerator the
    # full-grid pose pull — not math — dominated this sweep.
    from tscode_tpu.embeds.common import MaskedPullAccumulator
    acc = MaskedPullAccumulator()

    import os as _os
    if chunk_fn is _string_chunk \
            and _os.environ.get('TSCODE_FUSED_SWEEP', '1') != '0':
        # single-device: the WHOLE grid as memory-bounded slabs of ONE
        # lax.map program each — indices decode on device, so a slab
        # costs ~9 uploads + 1 dispatch regardless of grid size
        itemsize = 8 if jax.config.jax_enable_x64 else 4
        n_atoms = mol1.n_atoms + mol2.n_atoms
        tile_b = min(_SWEEP_TILE_CAP,
                     1 << max(1, (total - 1).bit_length()))
        rows_cap = tile_b * max(
            1, int(1.2e9) // max(1, tile_b * n_atoms * 3 * itemsize))
        base_args = (
            dev['coords1'], dev['coords2'], dev['centers1'], dev['vecs1'],
            dev['centers2'], dev['vecs2'], dev['pair_mask'],
            dev['quadruplets'], dev['angles'])
        for lo in range(0, total, rows_cap):
            hi = min(lo + rows_cap, total)
            n_tiles = -(-(hi - lo) // tile_b)
            # shift the decode window: slabs after the first start at
            # lo, handled by offsetting the flat arange
            poses, ok, tfps = _string_sweep_slab(
                base_args, float(clash_thresh), lo, hi, n_tiles, tile_b,
                pallas_pairs)
            acc.add((poses, tfps), ok, hi - lo)
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

    fields, ok_all = acc.finish()
    if not ok_all.any():
        raise ZeroCandidatesError(
            '--> String embed did not find any suitable disposition of '
            'molecules.\n    Try expanding the conformational space with '
            'the csearch> operator or see the SHRINK keyword.')
    kept_poses, kept_tfps = fields

    # order-dependent TFD novelty filter, replayed over survivors only
    # (reference embeds.py:47-69 via is_new_structure)
    novel = is_new_structure_lru(kept_tfps,
                                 np.ones(len(kept_tfps), dtype=bool),
                                 thresh=tfd_thresh)
    final = kept_poses[novel]

    if len(final) == 0:
        raise ZeroCandidatesError(
            '--> String embed did not find any suitable disposition of '
            'molecules (all poses torsionally redundant).')

    constrained = np.array([[[r1, r2]]] * len(final))
    return final, constrained
