'''
Cyclical embed (rigid, 2 molecules): Diels-Alder-class bimolecular TS
pose generation.

TPU re-design of the reference's per-pose Python loop
(/root/reference/tscode/embeds.py:734-860,
 _fast_bimol_rigid_cyclical_embed): the sweep is decomposed into

  blocks = (conformer pair) x (pivot pair passing the norm-delta gate)
           x (polygon orientation)

with all block-level geometry (pair alignments via batched 2-vector
Kabsch, rotation axes, centers of rotation) computed in one device pass,
then every block expanded over the systematic angle grid in a second
batched pass that materializes poses, clash-screens them, and evaluates
the block-local pairwise RMSD matrix used for angular deduplication.
The only sequential element — the greedy "skip poses similar to an
already-kept pose of the same block" rule — replays on host over the
device-computed similarity bits, preserving the reference's exact
keep/kill order.
'''

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tscode_tpu.errors import ZeroCandidatesError
from tscode_tpu.ops.clash import cross_fragment_pair_mask
from tscode_tpu.ops.linalg import (align_vec_pair, polygonize,
                                   rot_mat_from_pointer)
from tscode_tpu.ops.rmsd_prune import (_maxdev_pairs,
                                       _pair_gate_matrices,
                                       _rmsd_matrix_lambda_only)

_DIRECTIONS = np.array([[0., 1., 0.], [0., -1., 0.]])


def _auto_chunk(n_rows, n_angles, n_atoms):
    '''Pow2 row-chunk size for the block screens, sized by the two
    dominant intermediates — the (chunk*A, N, N) pose distance matrix
    and the (chunk, A, A) angular-similarity matrices — instead of a
    fixed tiny constant. On a tunneled accelerator every chunk costs
    ~10 small uploads + a dispatch (~latency-bound at the old fixed 64
    rows = 1.6k poses/dispatch); adaptive chunks put ~50k+ poses in
    each program while keeping the intermediates bounded.'''
    by_pairs = int(6e7) // max(1, n_angles * n_atoms * n_atoms)
    # the angular-dedup pair tensor (chunk, A, A, N, 3) is the worst
    # case if XLA materializes the broadcast (CPU does)
    by_dedup = int(3e7) // max(1, n_angles * n_angles * n_atoms * 3)
    # the memory bounds win over the latency floor: a dense angle grid
    # on a large system (A=216, N=150) NEEDS a tiny chunk
    want = max(8, min(by_pairs, by_dedup))
    want = 1 << (int(want).bit_length() - 1)             # pow2 floor
    cap = 1 << (max(1, int(n_rows)) - 1).bit_length()    # pow2 ceil
    return int(min(want, cap, 4096))


def _cyclical_ids_bimol(pivots, orientation, offsets):
    '''Constrained atom-index couples for a 2-molecule arrangement
    (reference _get_cyclical_reactive_indices, embeds.py:862-883).'''
    swaps = [(0, 0), (0, 1)]
    cumnums = []
    for m, p in enumerate(pivots):
        ids = [p.start_atom.index + offsets[m], p.end_atom.index + offsets[m]]
        if swaps[orientation][m]:
            ids = list(reversed(ids))
        cumnums.append(ids)
    return [[cumnums[0][0], cumnums[1][0]], [cumnums[0][1], cumnums[1][1]]]




def _pad_rows(arr, n):
    '''Pad axis 0 to n by repeating row 0 (compile-shape bucketing).'''
    arr = np.asarray(arr)
    if len(arr) == n:
        return arr
    pad = np.broadcast_to(arr[:1], (n - len(arr),) + arr.shape[1:])
    return np.concatenate([arr, pad])

def _pairwise_maxdev(pb):
    '''Blockwise (A, A) max-deviation matrices from (Bb, A, N, 3) poses
    WITHOUT materializing the Bb*A*A pose-pair copies a .repeat would
    create (hundreds of MB at trimolecular A=125) — the broadcast stays
    lazy inside XLA.

    ORACLE ONLY: the production screens use the fused
    _pair_gate_matrices (one correlation pass for rmsd AND maxdev);
    this per-pair form is kept as the independent implementation the
    fused path is parity-tested against (tests/test_embeds.py).'''
    def one_block(P):
        def row(pi):
            return _maxdev_pairs(jnp.broadcast_to(pi, P.shape), P)
        return jax.vmap(row)(P)
    return jax.vmap(one_block)(pb)

@jax.jit
def _block_geometry(starts, ends, dirs, pvs, mds, apms, mps, rc_axes):
    '''
    Per-(block, mol) alignment geometry.
    starts/ends (Bb, M, 3): polygon side endpoints per molecule
    dirs (Bb, M, 3): facing directions
    pvs/mds/apms/mps (Bb, M, 3): pivot vector, mol direction,
      atomic pivot mean, pivot meanpoint
    rc_axes (Bb, M, 3): reactive-atom axis (rc0 - rc1)
    Returns R_align (Bb, M, 3, 3), axis (Bb, M, 3), cor (Bb, M, 3),
    pos0 (Bb, M, 3).
    '''
    ref = jnp.stack([ends - starts, dirs], axis=-2)        # (Bb, M, 2, 3)
    tgt = jnp.stack([pvs, mds], axis=-2)
    R_align = align_vec_pair(ref, tgt)                     # (Bb, M, 3, 3)

    axis = jnp.einsum('bmij,bmj->bmi', R_align, rc_axes)
    cor = jnp.einsum('bmij,bmj->bmi', R_align, apms)
    pos0 = (starts + ends) / 2.0 - jnp.einsum('bmij,bmj->bmi', R_align, mps)
    return R_align, axis, cor, pos0


@jax.jit
def _block_poses(coords1, coords2, c1, c2, R_align, axis, cor, pos0,
                 angle_grid, pair_mask, clash_thresh):
    '''
    Expand blocks over the angle grid and materialize + screen poses.
    c1/c2 (Bb,) conformer ids; angle_grid (A, M) degrees.
    Returns poses (Bb, A, N, 3), clash_ok (Bb, A),
    rmsd matrix (Bb, A, A), maxdev matrix (Bb, A, A).
    '''
    # step rotations: (Bb, A, M, 3, 3)
    R_step = rot_mat_from_pointer(axis[:, None, :, :],
                                  angle_grid[None, :, :])
    R = jnp.einsum('bamij,bmjk->bamik', R_step, R_align)
    t = (cor[:, None] - jnp.einsum('bamij,bmj->bami', R_step, cor)
         + pos0[:, None])

    Bb = R.shape[0]
    # conformer rows are gathered ONCE PER BLOCK and broadcast over the
    # angle axis inside the einsum — gathering per pose (repeat(c, A)
    # then coords[cf]) materialized A-fold redundant gather traffic,
    # the same gather-shaped cost class the round-3 profiling work
    # eliminated from the string sweep (BASELINE.md round-3 final act)
    f1 = jnp.einsum('baij,bnj->bani', R[:, :, 0], coords1[c1]) \
        + t[:, :, 0][:, :, None]
    f2 = jnp.einsum('baij,bnj->bani', R[:, :, 1], coords2[c2]) \
        + t[:, :, 1][:, :, None]
    pb = jnp.concatenate([f1, f2], axis=2)                 # (Bb, A, N, 3)

    a2 = jnp.sum(pb * pb, axis=-1)
    ab = jnp.einsum('bani,bami->banm', pb, pb)
    d2 = jnp.maximum(a2[..., :, None] + a2[..., None, :] - 2 * ab, 0.0)
    clash_ok = jnp.sum((d2 < clash_thresh * clash_thresh) & pair_mask,
                       axis=(-2, -1)) <= 0                 # (Bb, A)

    # block-local pairwise RMSD + maxdev for the angular dedup
    # (_rmsd_similarity with rmsd_thr=1 on the FULL pose, reference
    # embeds.py:843) — one correlation pass feeds both gates
    n_atoms = pb.shape[2]
    rmsd, maxdev = jax.vmap(
        lambda P: _pair_gate_matrices(P, n_atoms))(pb)

    return pb, clash_ok, rmsd, maxdev


@functools.lru_cache(maxsize=8)
def _block_program_sharded(mesh, multi, axis_name='poses'):
    '''shard_map form of the fused cyclical block screen (geometry +
    pose expansion + clash + angular gates + greedy dedup) over the
    BLOCK axis: each device owns a slice of the (conf-pair x
    pivot-pair x orientation) blocks, molecule tensors and the angle
    grid are replicated, and no collective is needed — the greedy
    dedup's angle scan is block-local. Bit-identical outputs.'''
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:                 # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    rep, sh = P(None), P(axis_name)
    if multi:
        def step(coords1, coords2, coords3, c1, c2, c3,
                 starts, ends, dirs, pvs, mds, apms, mps, rc_axes,
                 angle_grid, pair_mask, clash_thresh):
            return _block_screen_multi.__wrapped__(
                coords1, coords2, coords3, c1, c2, c3,
                starts, ends, dirs, pvs, mds, apms, mps, rc_axes,
                angle_grid, pair_mask, clash_thresh)
        in_specs = (rep, rep, rep, sh, sh, sh) + (sh,) * 8 \
            + (rep, P(None, None), P())
    else:
        def step(coords1, coords2, c1, c2,
                 starts, ends, dirs, pvs, mds, apms, mps, rc_axes,
                 angle_grid, pair_mask, clash_thresh):
            return _block_screen.__wrapped__(
                coords1, coords2, c1, c2,
                starts, ends, dirs, pvs, mds, apms, mps, rc_axes,
                angle_grid, pair_mask, clash_thresh)
        in_specs = (rep, rep, sh, sh) + (sh,) * 8 \
            + (rep, P(None, None), P())
    # the greedy dedup's angle scan is block-local, so the fused screen
    # (poses + keep) shards over blocks with no collectives
    sharded = shard_map(step, mesh=mesh, in_specs=in_specs,
                        out_specs=(sh, sh))
    return jax.jit(sharded)


def _greedy_angular_keep(clash_ok, similar):
    '''Host reference implementation of the greedy angular dedup in
    generation order (reference embeds.py:621-628): keep angle t when
    it passed the clash screen and is unlike every previously kept
    angle of its block. The PRODUCTION sweep runs _greedy_keep_device
    (the same scan fused into the block program — no host pull of the
    similarity matrices); this host form (native C++ scan when built,
    interpreted loop otherwise) is kept as the semantics oracle the
    device scan is tested against (tests/test_embeds.py).
    clash_ok (B, A) bool, similar (B, A, A) bool -> keep (B, A) bool.'''
    from tscode_tpu import native
    if native.tfd_available():
        return native.greedy_angular_dedup(clash_ok, similar)
    keep = np.zeros_like(clash_ok, dtype=bool)
    for b in range(len(clash_ok)):
        kept = []
        for t in range(clash_ok.shape[1]):
            if not clash_ok[b, t]:
                continue
            if any(similar[b, t, t0] for t0 in kept):
                continue
            kept.append(t)
            keep[b, t] = True
    return keep


@jax.jit
def _greedy_keep_device(clash_ok, similar):
    '''Device form of the greedy angular dedup: a lax.scan over the
    angle axis (sequential by construction — each acceptance extends
    the kept set), vectorized over blocks. Bit-identical to
    _greedy_angular_keep. clash_ok (B, A); similar (B, A, A).'''
    A = clash_ok.shape[1]

    def body(kept, t):
        sim_prev = jnp.any(similar[:, t, :] & kept, axis=1)
        take = clash_ok[:, t] & ~sim_prev
        kept = kept.at[:, t].set(take)
        return kept, take

    _, keeps = jax.lax.scan(body, jnp.zeros_like(clash_ok),
                            jnp.arange(A))
    return keeps.T


@jax.jit
def _block_screen(coords1, coords2, c1, c2, starts, ends, dirs, pvs,
                  mds, apms, mps, rc_axes, angle_grid, pair_mask,
                  clash_thresh):
    '''Geometry + pose expansion + clash screen + angular-similarity
    gates + greedy dedup as ONE device program returning only
    (poses (Bb, A, N, 3), keep (Bb, A)). Folding the whole block
    pipeline keeps the (Bb, A, A) similarity matrices out of HBM/host
    and cuts the per-chunk host pulls from 3-4 to 2 — on a tunneled
    deployment each pull costs ~tens of ms of pure latency (profiled:
    the pulls, not the math, dominated the cyclical sweep).'''
    R_align, axis, cor, pos0 = _block_geometry(
        starts, ends, dirs, pvs, mds, apms, mps, rc_axes)
    poses, clash_ok, rmsd, maxdev = _block_poses.__wrapped__(
        coords1, coords2, c1, c2, R_align, axis, cor, pos0,
        angle_grid, pair_mask, clash_thresh)
    keep = _greedy_keep_device.__wrapped__(
        clash_ok, (rmsd < 1.0) & (maxdev < 2.0))
    return poses, keep


@functools.partial(jax.jit, static_argnames=('n_chunks',))
def _block_screen_mapped(coords1, coords2, c1, c2, starts, ends, dirs,
                         pvs, mds, apms, mps, rc_axes, angle_grid,
                         pair_mask, clash_thresh, n_chunks):
    '''Whole-sweep form of the fused block screen: the row axis arrives
    padded to n_chunks * chunk and a lax.map over chunk tiles runs
    _block_screen sequentially on device. Peak memory stays at ONE
    chunk's intermediates (as in the host-orchestrated loop), but the
    entire sweep is a single dispatch: on a tunneled accelerator the
    per-chunk cost of the loop form is ~10 argument uploads + a
    dispatch (~0.5-1 s of pure link latency each), which at multiembed
    scale (48+ chunks) dwarfed the device math by ~20x. Chunking is
    semantically invisible — the greedy angular dedup is block-local.'''

    def tile(args):
        return _block_screen.__wrapped__(
            coords1, coords2, *args, angle_grid, pair_mask, clash_thresh)

    def resh(x):
        return x.reshape((n_chunks, x.shape[0] // n_chunks) + x.shape[1:])

    tiles = tuple(resh(x) for x in (c1, c2, starts, ends, dirs, pvs,
                                    mds, apms, mps, rc_axes))
    poses, keep = jax.lax.map(tile, tiles)
    return (poses.reshape((-1,) + poses.shape[2:]),
            keep.reshape((-1,) + keep.shape[2:]))


@functools.partial(jax.jit, static_argnames=('n_chunks',))
def _block_screen_mapped_compact(coords1, coords2, tab1, tab2, tidx,
                                 angle_grid, pair_mask, clash_thresh,
                                 n_chunks):
    '''_block_screen_mapped fed by the compact block form: per-row
    geometry is GATHERED on device from the (T, 5, 3) per-(conf, pivot)
    tables [pv, md, apm, mp, rc_axis] via the (rows, 5) int32 index
    [t1, t2, c1, c2, v], and the digon endpoints are rebuilt from the
    pivot norms in-program (the same -L/2..L/2 x-axis layout the host
    builder emits; reference polygonize orientation rule,
    utils.py:210-261). Upload volume per slab drops from eight
    (rows, 2, 3) float tensors to one (rows, 5) int32 — the expanded
    form cost ~6 MB of link traffic per multiembed sweep.'''

    def tile(ti):
        r1 = tab1[ti[:, 0]]                          # (rows, 5, 3)
        r2 = tab2[ti[:, 1]]
        c1, c2, v = ti[:, 2], ti[:, 3], ti[:, 4]
        pv1, pv2 = r1[:, 0], r2[:, 0]
        # explicit sum-of-squares: same add order as the host builder's
        # (pv*pv).sum(-1), so CPU-x64 parity is bitwise
        L1 = jnp.sqrt(pv1[:, 0] * pv1[:, 0] + pv1[:, 1] * pv1[:, 1]
                      + pv1[:, 2] * pv1[:, 2])
        L2 = jnp.sqrt(pv2[:, 0] * pv2[:, 0] + pv2[:, 1] * pv2[:, 1]
                      + pv2[:, 2] * pv2[:, 2])
        zero = jnp.zeros_like(L1)
        s2x = jnp.where(v == 0, -1.0, 1.0) * L2 / 2
        starts = jnp.stack([jnp.stack([-L1 / 2, zero, zero], axis=-1),
                            jnp.stack([s2x, zero, zero], axis=-1)], axis=1)
        ends = jnp.stack([jnp.stack([L1 / 2, zero, zero], axis=-1),
                          jnp.stack([-s2x, zero, zero], axis=-1)], axis=1)
        dirs = jnp.broadcast_to(jnp.asarray(_DIRECTIONS, dtype=starts.dtype),
                                starts.shape)
        pair = (lambda a, b: jnp.stack([a, b], axis=1))
        return _block_screen.__wrapped__(
            coords1, coords2, c1, c2, starts, ends, dirs,
            pair(pv1, pv2), pair(r1[:, 1], r2[:, 1]),
            pair(r1[:, 2], r2[:, 2]), pair(r1[:, 3], r2[:, 3]),
            pair(r1[:, 4], r2[:, 4]), angle_grid, pair_mask, clash_thresh)

    tiles = tidx.reshape((n_chunks, tidx.shape[0] // n_chunks, 5))
    poses, keep = jax.lax.map(tile, tiles)
    return (poses.reshape((-1,) + poses.shape[2:]),
            keep.reshape((-1,) + keep.shape[2:]))


@jax.jit
def _block_screen_multi(coords1, coords2, coords3, c1, c2, c3, starts,
                        ends, dirs, pvs, mds, apms, mps, rc_axes,
                        angle_grid, pair_mask, clash_thresh):
    '''Trimolecular twin of _block_screen.'''
    R_align, axis, cor, pos0 = _block_geometry(
        starts, ends, dirs, pvs, mds, apms, mps, rc_axes)
    poses, clash_ok, rmsd, maxdev = _block_poses_multi.__wrapped__(
        coords1, coords2, coords3, c1, c2, c3, R_align, axis, cor,
        pos0, angle_grid, pair_mask, clash_thresh)
    keep = _greedy_keep_device.__wrapped__(
        clash_ok, (rmsd < 1.0) & (maxdev < 2.0))
    return poses, keep


@functools.partial(jax.jit, static_argnames=('n_chunks',))
def _block_screen_multi_mapped(coords1, coords2, coords3, c1, c2, c3,
                               starts, ends, dirs, pvs, mds, apms, mps,
                               rc_axes, angle_grid, pair_mask,
                               clash_thresh, n_chunks):
    '''Trimolecular twin of _block_screen_mapped: the whole row sweep
    as ONE lax.map dispatch over chunk tiles (see that docstring for
    the tunnel-latency rationale).'''

    def tile(args):
        return _block_screen_multi.__wrapped__(
            coords1, coords2, coords3, *args, angle_grid, pair_mask,
            clash_thresh)

    def resh(x):
        return x.reshape((n_chunks, x.shape[0] // n_chunks) + x.shape[1:])

    tiles = tuple(resh(x) for x in (c1, c2, c3, starts, ends, dirs,
                                    pvs, mds, apms, mps, rc_axes))
    poses, keep = jax.lax.map(tile, tiles)
    return (poses.reshape((-1,) + poses.shape[2:]),
            keep.reshape((-1,) + keep.shape[2:]))


# per-chunk device (poses, keep) tuples pulled with one transfer per
# field per flush — see embeds/common.ChunkAccumulator
from tscode_tpu.embeds.common import ChunkAccumulator as _ChunkAccumulator
from tscode_tpu.embeds.common import \
    SurvivorAccumulator as _SurvivorAccumulator


def _pick_mesh(n_candidates, mesh):
    '''Apply the size gate; returns the mesh to use or None.'''
    if mesh is None or mesh.devices.size < 2:
        return None
    from tscode_tpu.parallel.sharding import mesh_wants
    return mesh if mesh_wants(n_candidates) else None


def _bimol_rigid_blocks(mol1, mol2, max_norm_delta=10, pairing_ok=None):
    '''Host section of the rigid bimolecular embed: enumerate blocks in
    reference order (conf pairs, c1 fastest -> pivot pairs, p1 fastest
    -> orientation; reference embeds.py:753-785) and pack their geometry
    into plain numpy arrays. Returns None when no block passes the
    norm-delta + pairing gates.

    Dispatches to a fully vectorized grid builder when every conformer
    has the same pivot structure (the common case — profiled at ~4.5 s
    of pure Python/numpy scalar work per 12-arrangement multiembed
    otherwise); the scalar loop below remains as the fallback for
    ragged pivot lists (suprafacial / sigmastar filters can differ per
    conformer) and as the oracle for the equality test.'''
    for mol in (mol1, mol2):
        if not hasattr(mol, 'pivots'):
            raise ValueError(f'{mol.name}: call set_pivots() before embedding')

    fast = _bimol_rigid_blocks_fast(mol1, mol2, max_norm_delta, pairing_ok)
    if fast is not NotImplemented:
        return fast
    return _bimol_rigid_blocks_loop(mol1, mol2, max_norm_delta, pairing_ok)


def _pivot_tensors(mol, offset):
    '''(pv (nc, Q, 3), mp (nc, Q, 3), sa (Q,), ea (Q,)) pivot tensors,
    or None when conformers disagree on pivot count or atom order (the
    vectorized block builder requires a rectangular grid).'''
    pivs = mol.pivots
    Q = len(pivs[0])
    if Q == 0 or any(len(pl) != Q for pl in pivs):
        return None
    sa = [p.start_atom.index for p in pivs[0]]
    ea = [p.end_atom.index for p in pivs[0]]
    for pl in pivs[1:]:
        if [p.start_atom.index for p in pl] != sa \
                or [p.end_atom.index for p in pl] != ea:
            return None
    pv = np.array([[p.pivot for p in pl] for pl in pivs], dtype=float)
    mp = np.array([[p.meanpoint for p in pl] for pl in pivs], dtype=float)
    return pv, mp, np.asarray(sa) + offset, np.asarray(ea) + offset


def _bimol_rigid_blocks_fast(mol1, mol2, max_norm_delta, pairing_ok):
    '''Vectorized _bimol_rigid_blocks: the (c2, c1, q2, q1, v) block
    grid is evaluated with array ops and compacted with one nonzero()
    — C-order flat indices ARE the reference generation order (c1
    fastest within c2, q1 within q2, orientation last). Returns
    NotImplemented when the pivot grid is ragged (caller falls back).'''
    t1 = _pivot_tensors(mol1, 0)
    t2 = _pivot_tensors(mol2, mol1.n_atoms)
    if t1 is None or t2 is None:
        return NotImplemented
    pv1, mp1, sa1, ea1 = t1
    pv2, mp2, sa2, ea2 = t2
    n1c, Q1 = pv1.shape[:2]
    n2c, Q2 = pv2.shape[:2]
    N1 = np.sqrt((pv1 * pv1).sum(-1))          # (n1c, Q1), norm_of form
    N2 = np.sqrt((pv2 * pv2).sum(-1))          # (n2c, Q2)

    # conf-independent pairing gate + constraint ids per (q2, q1, v)
    # (the v=1 orientation reverses mol2's pivot ends — swaps table in
    # _cyclical_ids_bimol)
    pair_ok = np.ones((Q2, Q1, 2), dtype=bool)
    ids_grid = np.empty((Q2, Q1, 2, 2, 2), dtype=np.int64)
    for q2 in range(Q2):
        for q1 in range(Q1):
            for v in range(2):
                s2, e2 = (sa2[q2], ea2[q2]) if v == 0 \
                    else (ea2[q2], sa2[q2])
                arr_ids = [[int(sa1[q1]), int(s2)],
                           [int(ea1[q1]), int(e2)]]
                ids_grid[q2, q1, v] = arr_ids
                if pairing_ok is not None and not pairing_ok(arr_ids):
                    pair_ok[q2, q1, v] = False

    norm_ok = (np.abs(N1[None, :, None, :] - N2[:, None, :, None])
               <= max_norm_delta)              # (n2c, n1c, Q2, Q1)
    mask = norm_ok[..., None] & pair_ok[None, None]
    flat = np.nonzero(mask.reshape(-1))[0]
    if flat.size == 0:
        return None
    c2g, c1g, q2g, q1g, vg = np.unravel_index(flat, mask.shape)

    Bb = flat.size
    L1 = N1[c1g, q1g]
    L2 = N2[c2g, q2g]
    starts = np.zeros((Bb, 2, 3))
    ends = np.zeros((Bb, 2, 3))
    starts[:, 0, 0] = -L1 / 2
    ends[:, 0, 0] = +L1 / 2
    s2x = np.where(vg == 0, -1.0, 1.0) * L2 / 2    # polygonize orient. 1
    starts[:, 1, 0] = s2x
    ends[:, 1, 0] = -s2x

    apm1 = mol1.atomcoords[:, mol1.reactive_indices].mean(axis=1)
    apm2 = mol2.atomcoords[:, mol2.reactive_indices].mean(axis=1)
    md1 = mp1 - apm1[:, None]
    md1 = np.where(np.all(md1 == 0., axis=-1)[..., None], mp1, md1)
    md2 = mp2 - apm2[:, None]
    md2 = np.where(np.all(md2 == 0., axis=-1)[..., None], mp2, md2)

    if len(mol1.reactive_indices) == 2:
        rca1_cq = np.broadcast_to(
            (mol1.atomcoords[:, mol1.reactive_indices[0]]
             - mol1.atomcoords[:, mol1.reactive_indices[1]])[:, None],
            pv1.shape)
    else:
        rca1_cq = pv1
    if len(mol2.reactive_indices) == 2:
        rca2_cq = np.broadcast_to(
            (mol2.atomcoords[:, mol2.reactive_indices[0]]
             - mol2.atomcoords[:, mol2.reactive_indices[1]])[:, None],
            pv2.shape)
    else:
        rca2_cq = pv2

    # compact sweep form: all five per-row 3-vectors of one molecule
    # are functions of (conf, pivot) alone, so the device program can
    # gather them from a (n_confs*Q, 5, 3) table via a (Bb, 5) int32
    # index instead of receiving eight expanded (Bb, 2, 3) tensors —
    # on a tunneled accelerator the expanded upload (~6 MB at
    # multiembed scale) was the dominant warm screen cost
    tab1 = np.stack([pv1, md1,
                     np.broadcast_to(apm1[:, None], mp1.shape),
                     mp1, rca1_cq], axis=2).reshape(-1, 5, 3)
    tab2 = np.stack([pv2, md2,
                     np.broadcast_to(apm2[:, None], mp2.shape),
                     mp2, rca2_cq], axis=2).reshape(-1, 5, 3)
    tidx = np.stack([c1g * Q1 + q1g, c2g * Q2 + q2g,
                     c1g, c2g, vg], axis=1).astype(np.int32)

    blk = {
        'starts': starts,
        'ends': ends,
        'pvs': np.stack([pv1[c1g, q1g], pv2[c2g, q2g]], axis=1),
        'mds': np.stack([md1[c1g, q1g], md2[c2g, q2g]], axis=1),
        'apms': np.stack([apm1[c1g], apm2[c2g]], axis=1),
        'mps': np.stack([mp1[c1g, q1g], mp2[c2g, q2g]], axis=1),
        'rc_axes': np.stack([rca1_cq[c1g, q1g], rca2_cq[c2g, q2g]], axis=1),
        'c1': c1g.astype(np.int32),
        'c2': c2g.astype(np.int32),
        'ids': ids_grid[q2g, q1g, vg],
        'dirs': np.broadcast_to(_DIRECTIONS, (Bb, 2, 3)).copy(),
        'tab1': tab1,
        'tab2': tab2,
        'tidx': tidx,
    }
    return blk


def _bimol_rigid_blocks_loop(mol1, mol2, max_norm_delta=10,
                             pairing_ok=None):
    '''Scalar-loop block builder (fallback + oracle; see
    _bimol_rigid_blocks).'''
    mols = (mol1, mol2)
    offsets = (0, mol1.n_atoms)

    blocks = []      # (c1, c2, piv1, piv2, orientation, ids)
    conf_pairs = [(i1, i2) for i2 in range(mol2.n_confs)
                  for i1 in range(mol1.n_confs)]
    for (c1, c2) in conf_pairs:
        p1l, p2l = mol1.pivots[c1], mol2.pivots[c2]
        pivot_pairs = [(q1, q2) for q2 in range(len(p2l))
                       for q1 in range(len(p1l))]
        for (q1, q2) in pivot_pairs:
            piv1, piv2 = p1l[q1], p2l[q2]
            # explicit sum-of-squares (reference norm_of semantics,
            # algebra.py:89-96) — np.linalg.norm on a single vector
            # routes through BLAS dot whose FMA rounding differs by
            # 1 ulp from the batched fast path's add.reduce
            n1 = np.sqrt((piv1.pivot * piv1.pivot).sum())
            n2 = np.sqrt((piv2.pivot * piv2.pivot).sum())
            if abs(n1 - n2) > max_norm_delta:
                continue
            polygon = polygonize([n1, n2])          # (2, 2 mols, 2 pts, 3)
            for v in range(2):
                arr_ids = _cyclical_ids_bimol((piv1, piv2), v, offsets)
                if pairing_ok is not None and not pairing_ok(arr_ids):
                    continue
                blocks.append((c1, c2, piv1, piv2, v, polygon[v], arr_ids))

    if not blocks:
        return None

    Bb = len(blocks)
    blk = {k: np.zeros((Bb, 2, 3)) for k in
           ('starts', 'ends', 'pvs', 'mds', 'apms', 'mps', 'rc_axes')}
    blk['c1'] = np.zeros(Bb, dtype=np.int32)
    blk['c2'] = np.zeros(Bb, dtype=np.int32)
    blk['ids'] = np.zeros((Bb, 2, 2), dtype=np.int64)

    for b, (c1, c2, piv1, piv2, v, polygon, arr_ids) in enumerate(blocks):
        blk['c1'][b], blk['c2'][b] = c1, c2
        blk['ids'][b] = arr_ids
        for m, (mol, piv, conf) in enumerate(((mol1, piv1, c1),
                                              (mol2, piv2, c2))):
            blk['starts'][b, m] = polygon[m][0]
            blk['ends'][b, m] = polygon[m][1]
            blk['pvs'][b, m] = piv.pivot
            blk['mps'][b, m] = piv.meanpoint
            rc = mol.atomcoords[conf][mol.reactive_indices]
            apm = rc.mean(axis=0)
            blk['apms'][b, m] = apm
            md = piv.meanpoint - apm
            if np.all(md == 0.):
                md = piv.meanpoint
            blk['mds'][b, m] = md
            blk['rc_axes'][b, m] = (rc[0] - rc[1]) if len(rc) == 2 \
                else piv.pivot

    blk['dirs'] = np.broadcast_to(_DIRECTIONS, (Bb, 2, 3)).copy()
    return blk


_SWEEP_FIELDS = ('c1', 'c2', 'starts', 'ends', 'dirs', 'pvs', 'mds',
                 'apms', 'mps', 'rc_axes')
_COMPACT_FIELDS = ('tab1', 'tab2', 'tidx')


def _concat_blocks(blks):
    '''Row-wise union of block dicts (multiembed batches every
    arrangement's rows into one sweep). Expanded fields concatenate
    directly; the compact table form survives only when EVERY block
    carries it, with each block's table indices offset into the
    concatenated tables.'''
    out = {k: np.concatenate([b[k] for b in blks])
           for k in blks[0].keys() if k not in _COMPACT_FIELDS}
    if all('tidx' in b for b in blks):
        tabs1, tabs2, tidxs = [], [], []
        off1 = off2 = 0
        for b in blks:
            t = b['tidx'].copy()
            t[:, 0] += off1
            t[:, 1] += off2
            tidxs.append(t)
            tabs1.append(b['tab1'])
            tabs2.append(b['tab2'])
            off1 += len(b['tab1'])
            off2 += len(b['tab2'])
        out['tab1'] = np.concatenate(tabs1)
        out['tab2'] = np.concatenate(tabs2)
        out['tidx'] = np.concatenate(tidxs)
    return out


def _mapped_slabs(cols, block_chunk, A, N, call):
    '''Yield (poses_dev (rows, A, N, 3), keep_dev (rows, A), n_valid)
    per memory-bounded slab of a whole-sweep lax.map program.

    cols: tuple of row-aligned host arrays (uploaded once per slab);
    call(args, n_chunks) dispatches the mapped screen on the padded
    device args. Row counts are padded to pow2 multiples of the chunk
    so executables stay in fixed shape buckets; each slab costs
    ~len(cols) uploads and ONE dispatch regardless of its chunk count.'''
    Bb = len(cols[0])
    itemsize = 8 if jax.config.jax_enable_x64 else 4
    rows_cap = max(block_chunk,
                   int(1.2e9) // max(1, A * N * 3 * itemsize))
    rows_cap = block_chunk * max(1, rows_cap // block_chunk)

    for lo in range(0, Bb, rows_cap):
        hi = min(lo + rows_cap, Bb)
        n = hi - lo
        n_pad = max(1 << (n - 1).bit_length(), block_chunk)
        args = tuple(jnp.asarray(_pad_rows(c[lo:hi], n_pad))
                     for c in cols)
        poses, keep = call(args, n_pad // block_chunk)
        yield poses, keep, n


def _bimol_rigid_screen_survivors(blk, coords1, coords2, angle_grid,
                                  pair_mask, clash_thresh, mesh=None,
                                  block_chunk=None):
    '''Sweep the block rows and pull ONLY the survivors: returns
    (surv_poses (S, N, 3), keep (Bb, A)), host numpy, survivors in
    row-major (row, angle) generation order.

    This is the tunnel-bandwidth fix for the pull-everything row API:
    a multiembed-scale sweep materializes ~10^6 poses (hundreds of MB)
    of which a few thousand survive the clash + angular-dedup gates —
    pulling the full pose tensor over a ~5 MB/s tunneled link cost
    ~50 s/rep. Here the device program's pose output stays device-
    resident; the host pulls the (Bb, A) keep bitmask (~1 MB), gathers
    the S survivor rows on device, and pulls just those (~100s of KB).
    '''
    Bb = len(blk['c1'])
    A = angle_grid.shape[0]
    N = coords1.shape[1] + coords2.shape[1]
    if block_chunk is None:
        block_chunk = _auto_chunk(Bb, A, N)

    use_mesh = _pick_mesh(Bb * A, mesh)
    if use_mesh is None \
            and os.environ.get('TSCODE_FUSED_SWEEP', '1') != '0':
        thresh_dev = jnp.asarray(float(clash_thresh))

        if 'tidx' in blk \
                and os.environ.get('TSCODE_COMPACT_SWEEP', '1') != '0':
            # compact form: only the (Bb, 5) int32 index crosses the
            # link per slab; the small per-(conf, pivot) tables upload
            # once for the whole sweep
            tab1_dev = jnp.asarray(blk['tab1'])
            tab2_dev = jnp.asarray(blk['tab2'])

            def call(args, n_chunks):
                return _block_screen_mapped_compact(
                    coords1, coords2, tab1_dev, tab2_dev, args[0],
                    angle_grid, pair_mask, thresh_dev,
                    n_chunks=n_chunks)

            cols = (blk['tidx'],)
        else:
            def call(args, n_chunks):
                return _block_screen_mapped(
                    coords1, coords2, *args, angle_grid, pair_mask,
                    thresh_dev, n_chunks=n_chunks)

            cols = tuple(blk[k] for k in _SWEEP_FIELDS)

        trace = os.environ.get('TSCODE_SWEEP_TRACE') == '1'
        t0 = time.perf_counter() if trace else 0.0
        acc = _SurvivorAccumulator()
        last_keep = None
        for poses, keep_dev, n in _mapped_slabs(cols, block_chunk,
                                                A, N, call):
            acc.add(poses, keep_dev, n)
            last_keep = keep_dev
        if trace:
            import sys
            t1 = time.perf_counter()
            if last_keep is not None:
                last_keep.block_until_ready()
            t2 = time.perf_counter()
            out = acc.finish(N)
            t3 = time.perf_counter()
            print(f'[sweep] rows={Bb} angles={A} dispatch={t1 - t0:.3f}s '
                  f'compute={t2 - t1:.3f}s pull={t3 - t2:.3f}s',
                  file=sys.stderr)
            return out
        return acc.finish(N)

    # mesh / loop fallback (local backends): pull-everything semantics
    results = _bimol_rigid_screen_rows(
        blk, coords1, coords2, angle_grid, pair_mask, clash_thresh,
        mesh=mesh, block_chunk=block_chunk)
    poses_all = np.concatenate([p for p, _ in results])
    keep = np.concatenate([k for _, k in results])
    flat = np.nonzero(keep.reshape(-1))[0]
    return poses_all.reshape((-1,) + poses_all.shape[2:])[flat], keep


def _assemble_survivors(surv_poses, keep, ids_arr):
    '''Fold the compacted survivor poses into per-row pose lists +
    per-pose constraint ids, preserving generation order (reference
    embeds.py:820-853 appends survivors block by block). The survivor
    rows already sit in block order, so the pose side is the compacted
    array itself and the constraint ids are one vectorized repeat —
    the previous per-block Python loop cost ~1.5 s at the 46k-block
    bench-scale cyclical config.'''
    keep = np.asarray(keep)
    if keep.size == 0:
        return [], []
    counts = keep.sum(axis=1).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return [], []
    cons_out = list(np.repeat(np.asarray(ids_arr), counts, axis=0))
    return [np.asarray(surv_poses)[:total]], cons_out


def _bimol_rigid_screen_rows(blk, coords1, coords2, angle_grid, pair_mask,
                             clash_thresh, mesh=None, block_chunk=None):
    '''Device section of the rigid bimolecular embed: chunked fused
    screens (geometry + poses + clash + angular gates + greedy dedup)
    over the block rows of `blk`. coords1/coords2/angle_grid/pair_mask
    are DEVICE arrays (callers share uploads across sweeps). Returns the
    accumulator's host (poses, keep) pairs in row order.

    Every chunk is dispatched before anything is pulled: the fused
    screen returns only (poses, keep) and the accumulator fetches them
    in ~2 host pulls total instead of 3-4 per chunk — pull latency, not
    math, dominated this sweep on the tunneled deployment (profiled at
    ~40 ms/pull, ~100 pulls per multiembed arrangement).'''
    Bb = len(blk['c1'])
    A = angle_grid.shape[0]
    if block_chunk is None:
        block_chunk = _auto_chunk(
            Bb, A, coords1.shape[1] + coords2.shape[1])

    use_mesh = _pick_mesh(Bb * A, mesh)
    sharded_fn = (_block_program_sharded(use_mesh, multi=False)
                  if use_mesh is not None else None)
    if use_mesh is not None:
        block_chunk = -(-block_chunk // use_mesh.devices.size) \
            * use_mesh.devices.size

    fields = _SWEEP_FIELDS

    if sharded_fn is None \
            and os.environ.get('TSCODE_FUSED_SWEEP', '1') != '0':
        thresh_dev = jnp.asarray(float(clash_thresh))

        def call(args, n_chunks):
            return _block_screen_mapped(
                coords1, coords2, *args, angle_grid, pair_mask,
                thresh_dev, n_chunks=n_chunks)

        acc = _ChunkAccumulator()
        for poses, keep, n in _mapped_slabs(
                tuple(blk[k] for k in fields), block_chunk, A,
                coords1.shape[1] + coords2.shape[1], call):
            acc.add((poses, keep), n)
        acc.flush()
        return acc.results

    acc = _ChunkAccumulator()
    for lo in range(0, Bb, block_chunk):
        hi = min(lo + block_chunk, Bb)
        pad = block_chunk - (hi - lo)

        def slc(x):
            return jnp.asarray(np.concatenate(
                [x[lo:hi]] + ([x[hi - 1:hi]] * pad if pad else []), axis=0)
                if pad else x[lo:hi])

        chunk_args = tuple(slc(blk[k]) for k in fields)
        if sharded_fn is not None:
            poses, keep = sharded_fn(
                coords1, coords2, *chunk_args,
                angle_grid, pair_mask, jnp.asarray(float(clash_thresh)))
        else:
            poses, keep = _block_screen(
                coords1, coords2, *chunk_args,
                angle_grid, pair_mask, float(clash_thresh))
        acc.add((poses, keep), hi - lo)
    acc.flush()
    return acc.results


def cyclical_embed_bimol_rigid(mol1, mol2, systematic_angles,
                               clash_thresh=1.5, max_norm_delta=10,
                               pairing_ok=None, log=print,
                               block_chunk=None, mesh=None):
    '''
    Rigid bimolecular cyclical embed.

    systematic_angles: (A, 2) array of per-molecule step angles
    (the embedder's cartesian angle grid, reference embedder.py:714-715).
    pairing_ok: optional callable(ids) -> bool enforcing user pairings
    (reference embeds.py:777).
    Returns (poses (B, N, 3), constrained_indices (B, 2, 2)).
    '''
    import time as _time
    trace = os.environ.get('TSCODE_EMBED_TRACE') == '1'
    t0 = _time.perf_counter()
    ids = (mol1.n_atoms, mol2.n_atoms)
    angles = np.asarray(systematic_angles, dtype=float)
    A = len(angles)

    blk = _bimol_rigid_blocks(mol1, mol2, max_norm_delta=max_norm_delta,
                              pairing_ok=pairing_ok)
    if blk is None:
        raise ZeroCandidatesError(
            '--> Cyclical embed did not find any suitable disposition of '
            'molecules (no compatible pivot pairs).')

    log(f'--> Performing cyclical embed '
        f'({len(blk["c1"]) * A} candidates, {len(blk["c1"])} blocks)')
    t1 = _time.perf_counter()

    surv, keep = _bimol_rigid_screen_survivors(
        blk, jnp.asarray(mol1.atomcoords), jnp.asarray(mol2.atomcoords),
        jnp.asarray(angles), jnp.asarray(cross_fragment_pair_mask(ids)),
        clash_thresh, mesh=mesh, block_chunk=block_chunk)
    t2 = _time.perf_counter()

    poses_out, cons_out = _assemble_survivors(surv, keep, blk['ids'])

    if not poses_out:
        raise ZeroCandidatesError(
            '--> Cyclical embed did not find any suitable disposition of '
            'molecules.\n    This is probably because one molecule has two '
            'reactive centers at a great distance,\n    preventing the '
            'other two molecules from forming a closed, cyclical structure.')

    out = np.concatenate(poses_out), np.array(cons_out)
    if trace:
        import sys as _sys
        print(f'[cyc trace] blocks {t1 - t0:.3f}s, screen {t2 - t1:.3f}s, '
              f'assemble {_time.perf_counter() - t2:.3f}s '
              f'({len(blk["c1"])} blocks, {len(out[0])} survivors)',
              file=_sys.stderr, flush=True)
    return out


def _get_directions(norms):
    '''Facing directions for 2 or 3 molecules: toward the polygon center,
    via the triangle circumcenter with obtuse-angle sign fixes
    (reference embeds.py:244-312).'''
    norms = np.array(norms, dtype=float)
    if len(norms) == 2:
        return np.array([[0., 1., 0.], [0., -1., 0.]])

    vertices = np.zeros((3, 2))
    vertices[1] = np.array([norms[0], 0])
    a, b, c = norms[0] ** 2, norms[1] ** 2, norms[2] ** 2
    x = (a - b + c) / (2 * a ** 0.5)
    y = (c - x ** 2) ** 0.5
    vertices[2] = np.array([x, y])

    a = vertices[1, 0]
    b = vertices[2, 0]
    c = vertices[2, 1]
    cc = np.array([a / 2, (b ** 2 + c ** 2 - a * b) / (2 * c)])

    v0, v1, v2 = vertices
    dirs = [cc - (v0 + v1) / 2, cc - (v1 + v2) / 2, cc - (v2 + v0) / 2]

    if any(np.all(d == 0) for d in dirs):
        # right triangle: perturb to avoid a zero direction
        norms = norms.copy()
        norms[0] += 1e-5
        return _get_directions(norms)

    def _ang(u, w):
        cosv = np.clip(u @ w / np.linalg.norm(u) / np.linalg.norm(w), -1, 1)
        return np.degrees(np.arccos(cosv))

    obtuse = [_ang(v1 - v0, v2 - v0) > 90,
              _ang(v0 - v1, v2 - v1) > 90,
              _ang(v0 - v2, v1 - v2) > 90]
    # circumcenter falls outside the triangle when an angle is obtuse
    if obtuse[2]:
        dirs[0] = -dirs[0]
    if obtuse[0]:
        dirs[1] = -dirs[1]
    if obtuse[1]:
        dirs[2] = -dirs[2]

    out = np.zeros((3, 3))
    for i, d in enumerate(dirs):
        d3 = np.concatenate([d, [0.]])
        out[i] = d3 / np.linalg.norm(d3)
    return out


_ADJ_STEPS = 6
_ADJ_RANGE = 30


def _adjust_core(p_axes, p_means, a_pts, verts, angle_grid):
    '''
    One block of the trimolecular pre-alignment correction
    (reference _adjust_directions, embeds.py:314-451): scan a 7^3
    per-molecule rotation grid about the triangle sides and pick the
    angle triple minimizing the orbital misalignment cost; the returned
    "directions" are the side-midpoint-to-reactive-atom-mean
    displacement vectors of the winner.
    p_axes/p_means/verts (3, 3); a_pts (6, 3): embedded reactive-atom
    positions a01,a02,a10,a12,a20,a21; angle_grid (A, 3).
    Returns (3, 3) directions.
    '''
    # rotation matrices per (angle, mol): rotate about p_axes[m]
    R = rot_mat_from_pointer(p_axes[None, :, :], angle_grid)   # (A, 3, 3, 3)

    a01, a02 = a_pts[0], a_pts[1]
    a10, a12 = a_pts[2], a_pts[3]
    a20, a21 = a_pts[4], a_pts[5]

    def rot(m, pt):
        return jnp.einsum('aij,j->ai', R[:, m], pt)

    new_a01, new_a02 = rot(0, a01), rot(0, a02)
    new_a10, new_a12 = rot(1, a10), rot(1, a12)
    new_a20, new_a21 = rot(2, a20), rot(2, a21)

    d0 = p_means[None, 0] - (new_a01 + new_a02) / 2
    d1 = p_means[None, 1] - (new_a10 + new_a12) / 2
    d2 = p_means[None, 2] - (new_a20 + new_a21) / 2

    def ang(u, w):
        cosv = jnp.sum(u * w, axis=-1) / jnp.maximum(
            jnp.linalg.norm(u, axis=-1) * jnp.linalg.norm(w, axis=-1), 1e-30)
        return jnp.degrees(jnp.arccos(jnp.clip(cosv, -1.0, 1.0)))

    v0, v1, v2 = verts[None, 0], verts[None, 1], verts[None, 2]
    cost = (ang(v0 - new_a02, new_a20 - v0)
            + ang(v1 - new_a01, new_a10 - v1)
            + ang(v2 - new_a21, new_a12 - v2))              # (A,)

    best = jnp.argmin(cost)
    return jnp.stack([d0[best], d1[best], d2[best]], axis=0)


@jax.jit
def _adjust_chain(starts, ends, pvs, mds, mps, rc_src, verts, reset, dirs0,
                  angle_grid):
    '''
    CHAINED direction adjustment over a block sequence: the reference
    rebinds `directions = _adjust_directions(...)` inside its polygon
    orientation loop (embeds.py:633,652), so each orientation's
    adjustment starts from the PREVIOUS orientation's result within the
    same (conformer, pivot) combination. One lax.scan reproduces that
    data flow on device: blocks with reset=True (first kept orientation
    of a combo) restart from that combo's _get_directions estimate.

    starts/ends/pvs/mds/mps/verts (B, 3, 3); rc_src (B, 6, 3) raw
    conformer-0 reactive-atom coords (reference quirk, embeds.py:404-411)
    ordered a01,a02,a10,a12,a20,a21; reset (B,); dirs0 (B, 3, 3);
    angle_grid (A, 3). Returns (B, 3, 3) adjusted directions.
    '''
    owner = jnp.array([0, 0, 1, 1, 2, 2])

    def body(carry, x):
        starts_v, ends_v, pvs_v, mds_v, mps_v, rc_v, verts_v, reset_v, d0_v = x
        dirs_in = jnp.where(reset_v, d0_v, carry)
        # initial per-mol alignment (reference _adjust_directions:359-371)
        ref = jnp.stack([ends_v - starts_v, dirs_in], axis=-2)   # (3, 2, 3)
        tgt = jnp.stack([pvs_v, mds_v], axis=-2)
        R = align_vec_pair(ref, tgt)                             # (3, 3, 3)
        pos = (starts_v + ends_v) / 2 - jnp.einsum('mij,mj->mi', R, mps_v)
        apts = jnp.einsum('kij,kj->ki', R[owner], rc_v) + pos[owner]
        d_new = _adjust_core(ends_v - starts_v, (starts_v + ends_v) / 2,
                             apts, verts_v, angle_grid)
        return d_new, d_new

    _, dirs = jax.lax.scan(
        body, jnp.zeros((3, 3), dtype=starts.dtype),
        (starts, ends, pvs, mds, mps, rc_src, verts, reset, dirs0))
    return dirs


def _cyclical_ids_trimol(pivots, orientation, offsets):
    '''Constrained couples for a 3-molecule arrangement
    (reference embeds.py:885-898), sorted per couple.'''
    swaps = [(0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1),
             (1, 0, 0), (1, 1, 0), (1, 0, 1), (1, 1, 1)]
    cums = []
    for m, p in enumerate(pivots):
        ids = [p.start_atom.index + offsets[m], p.end_atom.index + offsets[m]]
        if swaps[orientation][m]:
            ids = list(reversed(ids))
        cums.append(ids)
    couples = [[cums[0][1], cums[1][0]],
               [cums[1][1], cums[2][0]],
               [cums[2][1], cums[0][0]]]
    return [sorted(c) for c in couples]


def cyclical_embed_trimol_rigid(mols, systematic_angles, clash_thresh=1.5,
                                pairing_ok=None, log=print,
                                block_chunk=None, mesh=None):
    '''
    Rigid trimolecular cyclical embed: triangle construction from pivot
    norms, 8 oriented triangles, device-batched direction adjustment,
    then the same batched alignment/angle expansion as the bimolecular
    path (reference embeds.py:453-732, rigid branches).
    '''
    offsets = (0, mols[0].n_atoms, mols[0].n_atoms + mols[1].n_atoms)
    ids = tuple(m.n_atoms for m in mols)
    angles = np.asarray(systematic_angles, dtype=float)
    A = len(angles)

    # ---------------- host: enumerate blocks --------------------------
    blocks = []
    # numpy meshgrid 'xy' ordering for THREE arrays: the 3rd index varies
    # fastest, the 1st next, the 2nd slowest — this is the reference's
    # cartesian_product iteration order (utils.py:180-181), which the
    # order-dependent dedups make observable
    conf_triples = [(i1, i2, i3)
                    for i2 in range(mols[1].n_confs)
                    for i1 in range(mols[0].n_confs)
                    for i3 in range(mols[2].n_confs)]
    for conf_ids in conf_triples:
        piv_lists = [m.pivots[conf_ids[i]] for i, m in enumerate(mols)]
        piv_triples = [(q1, q2, q3)
                       for q2 in range(len(piv_lists[1]))
                       for q1 in range(len(piv_lists[0]))
                       for q3 in range(len(piv_lists[2]))]
        for qi in piv_triples:
            pivots = [piv_lists[m][qi[m]] for m in range(3)]
            norms = np.array([np.linalg.norm(p.pivot) for p in pivots])
            if not all(norms[i] < norms[i - 1] + norms[i - 2]
                       for i in (0, 1, 2)):
                continue    # impossible triangle (bending needs a calculator)
            polygon = polygonize(norms)             # (8, 3, 2, 3)
            directions0 = _get_directions(norms)
            first_of_combo = True
            for v in range(8):
                arr_ids = _cyclical_ids_trimol(pivots, v, offsets)
                if pairing_ok is not None and not pairing_ok(arr_ids):
                    continue
                blocks.append((conf_ids, pivots, norms, v, polygon[v],
                               directions0, arr_ids, first_of_combo))
                first_of_combo = False

    if not blocks:
        raise ZeroCandidatesError(
            '--> Cyclical embed did not find any suitable disposition of '
            'molecules (no valid pivot triangles).')

    log(f'--> Performing cyclical embed '
        f'({len(blocks) * A} candidates, {len(blocks)} blocks)')

    Bb = len(blocks)

    # ------------- host: adjust-directions inputs per block -----------
    # the adjustment chain consumes conformer-0 reactive-atom coords
    # (reference quirk, _adjust_directions:404-411) and reset flags at
    # combo starts; alignments happen inside the device scan
    adj_rc_src = np.zeros((Bb, 6, 3))
    adj_verts = np.zeros((Bb, 3, 3))
    adj_reset = np.zeros(Bb, dtype=bool)
    adj_dirs0 = np.zeros((Bb, 3, 3))

    # main sweep arrays
    starts = np.zeros((Bb, 3, 3))
    ends = np.zeros((Bb, 3, 3))
    pvs = np.zeros((Bb, 3, 3))
    mds = np.zeros((Bb, 3, 3))
    apms = np.zeros((Bb, 3, 3))
    mps = np.zeros((Bb, 3, 3))
    rc_axes = np.zeros((Bb, 3, 3))
    conf_arr = np.zeros((Bb, 3), dtype=np.int32)
    ids_arr = np.zeros((Bb, 3, 2), dtype=np.int64)

    for b, (conf_ids, pivots, norms, v, polygon, directions0,
            arr_ids, first_of_combo) in enumerate(blocks):
        conf_arr[b] = conf_ids
        ids_arr[b] = arr_ids
        adj_reset[b] = first_of_combo
        adj_dirs0[b] = directions0

        # triangle vertices (2D -> 3D, z=0) like _adjust_directions:331-357
        verts2 = np.zeros((3, 2))
        verts2[1] = [norms[0], 0]
        a, bb_, c = norms[0] ** 2, norms[1] ** 2, norms[2] ** 2
        x = (a - bb_ + c) / (2 * a ** 0.5)
        verts2[2] = [x, (c - x ** 2) ** 0.5]
        adj_verts[b, :, :2] = verts2

        r = _facing_matrix(arr_ids, offsets)

        for i in range(3):
            start, end = polygon[i]
            rc = mols[i].atomcoords[conf_ids[i]][mols[i].reactive_indices]
            apm = rc.mean(axis=0)
            md = pivots[i].meanpoint - apm
            if np.all(md == 0.):
                md = pivots[i].meanpoint

            starts[b, i] = start
            ends[b, i] = end
            pvs[b, i] = pivots[i].pivot
            mps[b, i] = pivots[i].meanpoint
            apms[b, i] = apm
            mds[b, i] = md
            rc_axes[b, i] = (rc[0] - rc[1]) if len(rc) == 2 \
                else pivots[i].pivot

        # raw conformer-0 reactive-atom coords (reference quirk)
        adj_rc_src[b, 0] = mols[0].atomcoords[0][r[0, 1]]
        adj_rc_src[b, 1] = mols[0].atomcoords[0][r[0, 2]]
        adj_rc_src[b, 2] = mols[1].atomcoords[0][r[1, 0]]
        adj_rc_src[b, 3] = mols[1].atomcoords[0][r[1, 2]]
        adj_rc_src[b, 4] = mols[2].atomcoords[0][r[2, 0]]
        adj_rc_src[b, 5] = mols[2].atomcoords[0][r[2, 1]]

    # ------------- device: CHAINED direction adjustment ---------------
    step_angle = 2 * _ADJ_RANGE / _ADJ_STEPS
    grid = np.stack(np.meshgrid(*[np.arange(_ADJ_STEPS + 1)] * 3),
                    -1).reshape(-1, 3) * step_angle - _ADJ_RANGE
    Bp = max(8, int(2 ** np.ceil(np.log2(Bb))))
    directions = np.asarray(_adjust_chain(
        jnp.asarray(_pad_rows(starts, Bp)), jnp.asarray(_pad_rows(ends, Bp)),
        jnp.asarray(_pad_rows(pvs, Bp)), jnp.asarray(_pad_rows(mds, Bp)),
        jnp.asarray(_pad_rows(mps, Bp)),
        jnp.asarray(_pad_rows(adj_rc_src, Bp)),
        jnp.asarray(_pad_rows(adj_verts, Bp)),
        jnp.asarray(_pad_rows(adj_reset, Bp)),
        jnp.asarray(_pad_rows(adj_dirs0, Bp)),
        jnp.asarray(grid)))[:Bb]

    # ------------- device: main sweep ---------------------------------
    coords = [jnp.asarray(m.atomcoords) for m in mols]
    pair_mask = jnp.asarray(cross_fragment_pair_mask(ids))
    angle_grid = jnp.asarray(angles)
    if block_chunk is None:
        block_chunk = _auto_chunk(Bb, A, sum(ids))

    use_mesh = _pick_mesh(Bb * A, mesh)
    sharded_fn = (_block_program_sharded(use_mesh, multi=True)
                  if use_mesh is not None else None)
    if use_mesh is not None:
        block_chunk = -(-block_chunk // use_mesh.devices.size) \
            * use_mesh.devices.size

    cols = (conf_arr[:, 0], conf_arr[:, 1], conf_arr[:, 2],
            starts, ends, directions, pvs, mds, apms, mps, rc_axes)

    if sharded_fn is None \
            and os.environ.get('TSCODE_FUSED_SWEEP', '1') != '0':
        # whole sweep as slabbed lax.map dispatches; only survivors
        # cross the device link (same restructure as the bimol sweep)
        thresh_dev = jnp.asarray(float(clash_thresh))

        def call(args, n_chunks):
            return _block_screen_multi_mapped(
                coords[0], coords[1], coords[2], *args, angle_grid,
                pair_mask, thresh_dev, n_chunks=n_chunks)

        sacc = _SurvivorAccumulator()
        for poses, keep, n in _mapped_slabs(cols, block_chunk, A,
                                            sum(ids), call):
            sacc.add(poses, keep, n)
        surv, keep_all = sacc.finish(sum(ids))
        poses_out, cons_out = _assemble_survivors(surv, keep_all, ids_arr)
    else:
        acc = _ChunkAccumulator()
        for lo in range(0, Bb, block_chunk):
            hi = min(lo + block_chunk, Bb)
            pad = block_chunk - (hi - lo)

            def slc(x):
                return jnp.asarray(np.concatenate(
                    [x[lo:hi]] + ([x[hi - 1:hi]] * pad if pad else []),
                    axis=0) if pad else x[lo:hi])

            chunk_args = tuple(slc(c) for c in cols)
            if sharded_fn is not None:
                poses, keep = sharded_fn(
                    coords[0], coords[1], coords[2], *chunk_args,
                    angle_grid, pair_mask, jnp.asarray(float(clash_thresh)))
            else:
                poses, keep = _block_screen_multi(
                    coords[0], coords[1], coords[2], *chunk_args,
                    angle_grid, pair_mask, float(clash_thresh))
            acc.add((poses, keep), hi - lo)
        acc.flush()

        poses_out, cons_out = [], []
        lo = 0
        for poses, keep in acc.results:
            for b in range(len(poses)):
                kept = np.nonzero(keep[b])[0]
                if len(kept):
                    poses_out.append(poses[b, kept])
                    cons_out.extend([ids_arr[lo + b]] * len(kept))
            lo += len(poses)

    if not poses_out:
        raise ZeroCandidatesError(
            '--> Cyclical embed did not find any suitable disposition of '
            'molecules.\n    This is probably because one molecule has two '
            'reactive centers at a great distance,\n    preventing the '
            'other two molecules from forming a closed, cyclical structure.')

    return np.concatenate(poses_out), np.array(cons_out)


@jax.jit
def _block_poses_multi(coords1, coords2, coords3, c1, c2, c3,
                       R_align, axis, cor, pos0, angle_grid, pair_mask,
                       clash_thresh):
    '''Three-molecule analog of _block_poses.'''
    R_step = rot_mat_from_pointer(axis[:, None, :, :],
                                  angle_grid[None, :, :])
    R = jnp.einsum('bamij,bmjk->bamik', R_step, R_align)
    t = (cor[:, None] - jnp.einsum('bamij,bmj->bami', R_step, cor)
         + pos0[:, None])

    # per-BLOCK conformer gathers broadcast over the angle axis, as in
    # _block_poses (per-pose gathers were A-fold redundant)
    frags = []
    for m, (coords, cm) in enumerate(((coords1, c1), (coords2, c2),
                                      (coords3, c3))):
        frags.append(jnp.einsum('baij,bnj->bani', R[:, :, m], coords[cm])
                     + t[:, :, m][:, :, None])
    pb = jnp.concatenate(frags, axis=2)                    # (Bb, A, N, 3)

    a2 = jnp.sum(pb * pb, axis=-1)
    ab = jnp.einsum('bani,bami->banm', pb, pb)
    d2 = jnp.maximum(a2[..., :, None] + a2[..., None, :] - 2 * ab, 0.0)
    clash_ok = jnp.sum((d2 < clash_thresh * clash_thresh) & pair_mask,
                       axis=(-2, -1)) <= 0

    n_atoms = pb.shape[2]
    rmsd, maxdev = jax.vmap(
        lambda P: _pair_gate_matrices(P, n_atoms))(pb)

    return pb, clash_ok, rmsd, maxdev


def _bend_blocked_by_bonded_pair(mol):
    '''True when the molecule's two reactive atoms are directly bonded,
    which makes bending it toward a pivot target meaningless.

    Reference embeds.py:526-528: `tuple(sorted(mol.reactive_indices))
    not in list(mol.graph.edges)` — for a single-reactive-atom molecule
    the 1-tuple is never an edge, so this returns False (the triangle
    branch would bend it; defensive there, since production embed
    classification gives every cyclical/trimolecular molecule exactly
    two reactive atoms). NOTE: False does NOT mean "bendable" — the
    digon branch (reference embeds.py:599-608) ALSO requires
    `len(mol.reactive_indices) > 1` before bending; that outer guard at
    the digon call site is load-bearing, not redundant.'''
    return (len(mol.reactive_indices) > 1
            and mol.graph.has_edge(*sorted(
                int(x) for x in mol.reactive_indices[:2])))


def cyclical_embed_nonrigid(embedder, max_norm_delta=5):
    '''
    General (non-rigid) cyclical embed for 2-3 molecules: pivot-length
    mismatches that prevent a digon/triangle are corrected by BENDING
    the offending molecules (reference embeds.py:453-732). Bends mutate
    the working molecule list persistently across pivot iterations, like
    the reference's in-place embedder.objects updates (:545, :617).
    Each (conformer, pivot) combination still runs its orientation x
    angle sweep as one batched device program.
    '''
    from tscode_tpu.bending import bend_molecule

    mols = list(embedder.objects)
    n_mols = len(mols)
    offsets = tuple(int(x) for x in np.concatenate(
        [[0], np.cumsum([m.n_atoms for m in mols])[:-1]]))
    ids = tuple(m.n_atoms for m in mols)
    angles = np.asarray(embedder.systematic_angles, dtype=float)
    A = len(angles)
    pairing_ok = embedder.pairing_ok_fn()
    clash_thresh = embedder.options.clash_thresh
    cache = getattr(embedder, 'bent_mols_cache', None)
    if cache is None:
        cache = embedder.bent_mols_cache = {}

    pair_mask = jnp.asarray(cross_fragment_pair_mask(ids))
    angle_grid = jnp.asarray(angles)

    # conformer combos in the reference cartesian order
    if n_mols == 2:
        conf_combos = [(i1, i2) for i2 in range(mols[1].n_confs)
                       for i1 in range(mols[0].n_confs)]
    else:
        conf_combos = [(i1, i2, i3)
                       for i2 in range(mols[1].n_confs)
                       for i1 in range(mols[0].n_confs)
                       for i3 in range(mols[2].n_confs)]

    total = sum(int(np.prod([len(m.pivots[c[i]])
                             for i, m in enumerate(mols)]))
                for c in conf_combos)
    embedder.log(f'--> Performing {embedder.embed} embed '
                 f'(non-rigid, {total} pivot combinations)')

    # ---------- phase 1: host-sequential bends; emit numpy rows --------
    # The per-combo control flow (bend decisions mutating `mols`) is
    # inherently host-sequential, but the SCREENS are pure sinks: no
    # screen result feeds back into the loop. So the loop only BUILDS
    # per-orientation rows (plain numpy — zero device traffic), grouped
    # by the molecules' coordinate version (a bend starts a new group),
    # and phase 2 dispatches each group to the device in a few large
    # chunked programs. Previously every (conf, pivot) combo paid ~13
    # small host->device transfers + 1-2 dispatches; on a tunneled
    # accelerator that latency (~40 ms/op x hundreds of combos)
    # dominated the embed wall time.
    groups = []     # {'key', 'coords': [np arrays], 'rows': [dict...]}

    def _row_group():
        key = tuple(id(m.atomcoords) for m in mols)
        if not groups or groups[-1]['key'] != key:
            groups.append({'key': key,
                           'coords': [m.atomcoords for m in mols],
                           'rows': []})
        return groups[-1]['rows']

    for conf_ids in conf_combos:
        if n_mols == 2:
            piv_combos = [(q1, q2)
                          for q2 in range(len(mols[1].pivots[conf_ids[1]]))
                          for q1 in range(len(mols[0].pivots[conf_ids[0]]))]
        else:
            piv_combos = [(q1, q2, q3)
                          for q2 in range(len(mols[1].pivots[conf_ids[1]]))
                          for q1 in range(len(mols[0].pivots[conf_ids[0]]))
                          for q3 in range(len(mols[2].pivots[conf_ids[2]]))]

        for qi in piv_combos:
            try:
                pivots = [mols[m].pivots[conf_ids[m]][qi[m]]
                          for m in range(n_mols)]
            except IndexError:
                continue   # a bend reduced this molecule's pivot count
            norms = np.array([np.linalg.norm(p.pivot) for p in pivots])

            # classify / correct geometry
            if n_mols == 2:
                if abs(norms[0] - norms[1]) >= max_norm_delta:
                    # bend both bendable molecules toward a shared length
                    if embedder.embed == 'chelotropic':
                        target = float(min(norms))
                    else:
                        # reference embeds.py:585 evaluates to 0.8 always
                        r = 0.8
                        target = float(min(norms) * r + max(norms) * (1 - r))
                    for i, mol in enumerate(mols):
                        # digon branch additionally skips single-
                        # reactive-atom molecules (reference
                        # embeds.py:603-608 — unlike the triangle
                        # branch, which bends them)
                        if len(mol.reactive_indices) > 1 and not \
                                _bend_blocked_by_bonded_pair(mol):
                            from tscode_tpu.operators import \
                                qm_gradient_source
                            mols[i] = bend_molecule(
                                mol, conf_ids[i], pivots[i], target,
                                cache=cache,
                                suprafacial=embedder.options.suprafacial,
                                protect_double_bonds=embedder.options
                                .double_bond_protection,
                                logfunction=embedder.log,
                                gradient_fn=qm_gradient_source(
                                    embedder, mol))
                    try:
                        pivots = [mols[m].pivots[conf_ids[m]][qi[m]]
                                  for m in range(n_mols)]
                    except IndexError:
                        continue
                    norms = np.array([np.linalg.norm(p.pivot)
                                      for p in pivots])
                    # the reference embeds whatever the bend achieved —
                    # it goes straight to polygonize without re-checking
                    # the norm delta (embeds.py:621-628)
            else:
                if not all(norms[i] < norms[i - 1] + norms[i - 2]
                           for i in (0, 1, 2)):
                    deltas = [norms[i] - (norms[i - 1] + norms[i - 2])
                              for i in range(3)]
                    rel_delta = max(deltas[i] / norms[i] for i in range(3))
                    if rel_delta >= 0.2:
                        continue
                    index = int(np.argmax(deltas))
                    mol = mols[index]
                    if _bend_blocked_by_bonded_pair(mol):
                        continue
                    maxval = norms[index - 1] + norms[index - 2]
                    from tscode_tpu.operators import qm_gradient_source
                    mols[index] = bend_molecule(
                        mol, conf_ids[index], pivots[index],
                        0.9 * float(maxval), cache=cache,
                        suprafacial=embedder.options.suprafacial,
                        protect_double_bonds=embedder.options
                        .double_bond_protection,
                        logfunction=embedder.log,
                        gradient_fn=qm_gradient_source(embedder, mol))
                    try:
                        pivots = [mols[m].pivots[conf_ids[m]][qi[m]]
                                  for m in range(n_mols)]
                    except IndexError:
                        continue
                    norms = np.array([np.linalg.norm(p.pivot)
                                      for p in pivots])
                    if not all(norms[i] < norms[i - 1] + norms[i - 2]
                               for i in (0, 1, 2)):
                        continue

            try:
                polygon = polygonize(norms)
            except Exception:
                continue
            n_orient = polygon.shape[0]

            directions0 = _get_directions(norms) if n_mols == 3 else None

            # per-combo block values (constant across orientations)
            pvs_c = np.array([p.pivot for p in pivots])
            mps_c = np.array([p.meanpoint for p in pivots])
            apms_c = np.zeros((n_mols, 3))
            mds_c = np.zeros((n_mols, 3))
            rc_axes_c = np.zeros((n_mols, 3))
            for m in range(n_mols):
                rc = mols[m].atomcoords[conf_ids[m]][mols[m].reactive_indices]
                apm = rc.mean(axis=0)
                md = pivots[m].meanpoint - apm
                if np.all(md == 0.):
                    md = pivots[m].meanpoint
                apms_c[m] = apm
                mds_c[m] = md
                rc_axes_c[m] = (rc[0] - rc[1]) if len(rc) == 2 \
                    else pivots[m].pivot

            if n_mols == 3:
                verts3 = np.zeros((3, 3))
                verts2 = np.zeros((3, 2))
                verts2[1] = [norms[0], 0]
                a_, b_, c_ = norms ** 2
                x_ = (a_ - b_ + c_) / (2 * a_ ** 0.5)
                verts2[2] = [x_, (c_ - x_ ** 2) ** 0.5]
                verts3[:, :2] = verts2

            rows = None
            first_of_combo = True
            for v in range(n_orient):
                arr_ids = (_cyclical_ids_bimol(pivots, v, offsets)
                           if n_mols == 2 else
                           _cyclical_ids_trimol(pivots, v, offsets))
                if pairing_ok is not None and not pairing_ok(arr_ids):
                    continue
                if rows is None:
                    rows = _row_group()
                row = {'start': np.array([polygon[v][m][0]
                                          for m in range(n_mols)]),
                       'end': np.array([polygon[v][m][1]
                                        for m in range(n_mols)]),
                       'pvs': pvs_c, 'mps': mps_c, 'apms': apms_c,
                       'mds': mds_c, 'rc_axes': rc_axes_c,
                       'confs': np.array(conf_ids, dtype=np.int32),
                       'ids': arr_ids}
                if n_mols == 3:
                    # adjustment-chain inputs: the chain is CHAINED
                    # across the kept orientations of a combo as the
                    # reference rebinding does (embeds.py:633,652) and
                    # restarts (reset) at each combo's first kept row;
                    # rc coords are raw conformer-0 values (reference
                    # quirk, _adjust_directions:404-411)
                    r = _facing_matrix(arr_ids, offsets)
                    rc_src = np.array([
                        mols[0].atomcoords[0][r[0, 1]],
                        mols[0].atomcoords[0][r[0, 2]],
                        mols[1].atomcoords[0][r[1, 0]],
                        mols[1].atomcoords[0][r[1, 2]],
                        mols[2].atomcoords[0][r[2, 0]],
                        mols[2].atomcoords[0][r[2, 1]]])
                    row.update(rc_src=rc_src, verts=verts3,
                               dirs0=directions0, reset=first_of_combo)
                rows.append(row)
                first_of_combo = False

    # ---------- phase 2: grouped, chunked device dispatches ------------
    all_rows = [row for g in groups for row in g['rows']]
    n_rows = len(all_rows)

    if n_mols == 3 and n_rows:
        # ONE chained direction-adjustment program over every row (the
        # scan restarts at reset rows, so concatenating combos is
        # bit-identical to the per-combo chains), pow2-padded for
        # compile-shape bucketing, pulled once
        step_angle = 2 * _ADJ_RANGE / _ADJ_STEPS
        grid = np.stack(np.meshgrid(*[np.arange(_ADJ_STEPS + 1)] * 3),
                        -1).reshape(-1, 3) * step_angle - _ADJ_RANGE
        Bp = max(8, int(2 ** np.ceil(np.log2(n_rows))))

        def col(k):
            return _pad_rows(np.array([row[k] for row in all_rows]), Bp)

        dirs_all = np.asarray(_adjust_chain(
            jnp.asarray(col('start')), jnp.asarray(col('end')),
            jnp.asarray(col('pvs')), jnp.asarray(col('mds')),
            jnp.asarray(col('mps')), jnp.asarray(col('rc_src')),
            jnp.asarray(col('verts')), jnp.asarray(col('reset')),
            jnp.asarray(col('dirs0')), jnp.asarray(grid)))[:n_rows]
    else:
        dirs_all = np.broadcast_to(_DIRECTIONS, (n_rows, 2, 3))

    # screens: per coordinate-version group, fixed-size chunks over the
    # row axis (the greedy dedup is row-local, so rows from different
    # combos batch freely); device coordinate uploads are cached per
    # coordinates array so unchanged molecules upload once
    acc = _SurvivorAccumulator()
    dev_cache = {}

    def _dev(arr):
        key = id(arr)
        if key not in dev_cache:
            dev_cache[key] = jnp.asarray(arr)
        return dev_cache[key]

    base_chunk = _auto_chunk(n_rows, A, sum(ids))
    row_lo = 0
    for g in groups:
        gn = len(g['rows'])
        if not gn:
            continue
        coords = [_dev(c) for c in g['coords']]
        gcols = {k: np.array([row[k] for row in g['rows']])
                 for k in ('start', 'end', 'pvs', 'mds', 'apms', 'mps',
                           'rc_axes', 'confs')}
        gdirs = dirs_all[row_lo:row_lo + gn]
        row_lo += gn

        # clamp to the group's pow2 ceiling so small bend-bounded
        # groups don't pad to the global chunk
        block_chunk = min(base_chunk, 1 << (gn - 1).bit_length())
        for lo in range(0, gn, block_chunk):
            hi = min(lo + block_chunk, gn)
            pad = block_chunk - (hi - lo)

            def slc(x):
                return jnp.asarray(np.concatenate(
                    [x[lo:hi]] + ([x[hi - 1:hi]] * pad if pad else []),
                    axis=0) if pad else x[lo:hi])

            geom_args = (slc(gcols['start']), slc(gcols['end']),
                         slc(gdirs), slc(gcols['pvs']),
                         slc(gcols['mds']), slc(gcols['apms']),
                         slc(gcols['mps']), slc(gcols['rc_axes']))
            conf_cols = [slc(gcols['confs'][:, m])
                         for m in range(n_mols)]
            if n_mols == 2:
                poses, keep = _block_screen(
                    coords[0], coords[1], conf_cols[0], conf_cols[1],
                    *geom_args, angle_grid, pair_mask,
                    float(clash_thresh))
            else:
                poses, keep = _block_screen_multi(
                    coords[0], coords[1], coords[2],
                    conf_cols[0], conf_cols[1], conf_cols[2],
                    *geom_args, angle_grid, pair_mask,
                    float(clash_thresh))
            acc.add(poses, keep, hi - lo)

    surv, keep_all = acc.finish(sum(ids))
    poses_out, cons_out = [], []
    lo = 0
    for b in range(len(keep_all)):
        n_kept = int(keep_all[b].sum())
        if n_kept:
            poses_out.append(surv[lo:lo + n_kept])
            cons_out.extend([np.array(all_rows[b]['ids'])] * n_kept)
        lo += n_kept

    if not poses_out:
        raise ZeroCandidatesError(
            '--> Cyclical embed did not find any suitable disposition of '
            'molecules.')

    return np.concatenate(poses_out), np.array(cons_out)


def _facing_matrix(arr_ids, offsets):
    '''r[m, partner] = local reactive index of molecule m facing partner
    (reference _adjust_directions:376-399).'''
    r = np.zeros((3, 3), dtype=int)
    for pair in arr_ids:
        sides = []
        for cum in pair:
            m = 2 if cum >= offsets[2] else (1 if cum >= offsets[1] else 0)
            sides.append((m, cum - offsets[m]))
        (m1, i1), (m2, i2) = sides
        r[m1, m2] = i1
        r[m2, m1] = i2
    return r


def cyclical_embed(embedder, max_norm_delta=5):
    '''Dispatcher matching the reference entry point
    (reference embeds.py:234-242): rigid runs take the fast batched
    paths; non-rigid runs bend molecules to fix impossible polygons.
    NOTE: the reference calls the fast bimolecular path with
    max_norm_delta=5 through this dispatcher (its own default of 10 is
    effectively unused).'''
    from tscode_tpu.parallel.sharding import get_default_mesh
    mesh = get_default_mesh()
    mols = embedder.objects
    if embedder.options.rigid:
        if len(mols) == 2:
            poses, cons = cyclical_embed_bimol_rigid(
                mols[0], mols[1], embedder.systematic_angles,
                clash_thresh=embedder.options.clash_thresh,
                max_norm_delta=max_norm_delta,
                pairing_ok=embedder.pairing_ok_fn(), log=embedder.log,
                mesh=mesh)
        else:
            poses, cons = cyclical_embed_trimol_rigid(
                mols, embedder.systematic_angles,
                clash_thresh=embedder.options.clash_thresh,
                pairing_ok=embedder.pairing_ok_fn(), log=embedder.log,
                mesh=mesh)
        embedder.constrained_indices = cons
        return poses

    poses, cons = cyclical_embed_nonrigid(embedder,
                                          max_norm_delta=max_norm_delta)
    embedder.constrained_indices = cons
    return poses
