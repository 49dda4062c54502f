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

import jax
import jax.numpy as jnp
import numpy as np

from tscode_tpu.embeds.common import materialize_two_mol
from tscode_tpu.errors import ZeroCandidatesError
from tscode_tpu.ops.clash import cross_fragment_pair_mask
from tscode_tpu.ops.linalg import (align_vec_pair, polygonize,
                                   rot_mat_from_pointer)
from tscode_tpu.ops.rmsd_prune import _maxdev_pairs, _rmsd_matrix_lambda_only

_BLOCK_CHUNK = 64

_DIRECTIONS = np.array([[0., 1., 0.], [0., -1., 0.]])


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
    A = angle_grid.shape[0]

    # step rotations: (Bb, A, M, 3, 3)
    R_step = rot_mat_from_pointer(axis[:, None, :, :],
                                  angle_grid[None, :, :])
    R = jnp.einsum('bamij,bmjk->bamik', R_step, R_align)
    t = (cor[:, None] - jnp.einsum('bamij,bmj->bami', R_step, cor)
         + pos0[:, None])

    Bb = R.shape[0]
    Rf = R.reshape(Bb * A, 2, 3, 3)
    tf = t.reshape(Bb * A, 2, 3)
    c1f = jnp.repeat(c1, A)
    c2f = jnp.repeat(c2, A)

    f1 = jnp.einsum('bij,bnj->bni', Rf[:, 0], coords1[c1f]) + tf[:, 0][:, None]
    f2 = jnp.einsum('bij,bnj->bni', Rf[:, 1], coords2[c2f]) + tf[:, 1][:, None]
    poses = jnp.concatenate([f1, f2], axis=1)              # (Bb*A, N, 3)

    a2 = jnp.sum(poses * poses, axis=-1)
    ab = jnp.einsum('bni,bmi->bnm', poses, poses)
    d2 = jnp.maximum(a2[:, :, None] + a2[:, None, :] - 2 * ab, 0.0)
    clash_ok = jnp.sum((d2 < clash_thresh * clash_thresh) & pair_mask,
                       axis=(-2, -1)) <= 0

    # block-local pairwise RMSD for the angular dedup (_rmsd_similarity
    # with rmsd_thr=1 on the FULL pose, reference embeds.py:843)
    pb = poses.reshape(Bb, A, -1, 3)
    n_atoms = pb.shape[2]
    rmsd = jax.vmap(lambda P: _rmsd_matrix_lambda_only(P, P, n_atoms))(pb)
    flat_i = pb[:, :, None].repeat(A, axis=2).reshape(Bb * A * A, n_atoms, 3)
    flat_j = pb[:, None, :].repeat(A, axis=1).reshape(Bb * A * A, n_atoms, 3)
    maxdev = _maxdev_pairs(flat_i, flat_j).reshape(Bb, A, A)

    return poses.reshape(Bb, A, -1, 3), clash_ok.reshape(Bb, A), rmsd, maxdev


def cyclical_embed_bimol_rigid(mol1, mol2, systematic_angles,
                               clash_thresh=1.5, max_norm_delta=10,
                               pairing_ok=None, log=print,
                               block_chunk=_BLOCK_CHUNK):
    '''
    Rigid bimolecular cyclical embed.

    systematic_angles: (A, 2) array of per-molecule step angles
    (the embedder's cartesian angle grid, reference embedder.py:714-715).
    pairing_ok: optional callable(ids) -> bool enforcing user pairings
    (reference embeds.py:777).
    Returns (poses (B, N, 3), constrained_indices (B, 2, 2)).
    '''
    mols = (mol1, mol2)
    offsets = (0, mol1.n_atoms)
    ids = (mol1.n_atoms, mol2.n_atoms)
    angles = np.asarray(systematic_angles, dtype=float)
    A = len(angles)

    for mol in mols:
        if not hasattr(mol, 'pivots'):
            raise ValueError(f'{mol.name}: call set_pivots() before embedding')

    # ---------------- host: enumerate blocks in reference order ----------
    # conf pairs (c1 fastest) -> pivot pairs (p1 fastest) -> orientation
    blocks = []      # (c1, c2, piv1, piv2, orientation, ids)
    conf_pairs = [(i1, i2) for i2 in range(mol2.n_confs)
                  for i1 in range(mol1.n_confs)]
    for (c1, c2) in conf_pairs:
        p1l, p2l = mol1.pivots[c1], mol2.pivots[c2]
        pivot_pairs = [(q1, q2) for q2 in range(len(p2l))
                       for q1 in range(len(p1l))]
        for (q1, q2) in pivot_pairs:
            piv1, piv2 = p1l[q1], p2l[q2]
            n1 = np.linalg.norm(piv1.pivot)
            n2 = np.linalg.norm(piv2.pivot)
            if abs(n1 - n2) > max_norm_delta:
                continue
            polygon = polygonize([n1, n2])          # (2, 2 mols, 2 pts, 3)
            for v in range(2):
                arr_ids = _cyclical_ids_bimol((piv1, piv2), v, offsets)
                if pairing_ok is not None and not pairing_ok(arr_ids):
                    continue
                blocks.append((c1, c2, piv1, piv2, v, polygon[v], arr_ids))

    if not blocks:
        raise ZeroCandidatesError(
            '--> Cyclical embed did not find any suitable disposition of '
            'molecules (no compatible pivot pairs).')

    log(f'--> Performing cyclical embed '
        f'({len(blocks) * A} candidates, {len(blocks)} blocks)')

    Bb = len(blocks)
    starts = np.zeros((Bb, 2, 3))
    ends = np.zeros((Bb, 2, 3))
    pvs = np.zeros((Bb, 2, 3))
    mds = np.zeros((Bb, 2, 3))
    apms = np.zeros((Bb, 2, 3))
    mps = np.zeros((Bb, 2, 3))
    rc_axes = np.zeros((Bb, 2, 3))
    c1_arr = np.zeros(Bb, dtype=np.int32)
    c2_arr = np.zeros(Bb, dtype=np.int32)
    ids_arr = np.zeros((Bb, 2, 2), dtype=np.int64)

    for b, (c1, c2, piv1, piv2, v, polygon, arr_ids) in enumerate(blocks):
        c1_arr[b], c2_arr[b] = c1, c2
        ids_arr[b] = arr_ids
        for m, (mol, piv, conf) in enumerate(((mol1, piv1, c1),
                                              (mol2, piv2, c2))):
            starts[b, m] = polygon[m][0]
            ends[b, m] = polygon[m][1]
            pvs[b, m] = piv.pivot
            mps[b, m] = piv.meanpoint
            rc = mol.atomcoords[conf][mol.reactive_indices]
            apm = rc.mean(axis=0)
            apms[b, m] = apm
            md = piv.meanpoint - apm
            if np.all(md == 0.):
                md = piv.meanpoint
            mds[b, m] = md
            rc_axes[b, m] = (rc[0] - rc[1]) if len(rc) == 2 else piv.pivot

    dirs = np.broadcast_to(_DIRECTIONS, (Bb, 2, 3)).copy()

    # ---------------- device: batched geometry + pose expansion ----------
    coords1 = jnp.asarray(mol1.atomcoords)
    coords2 = jnp.asarray(mol2.atomcoords)
    pair_mask = jnp.asarray(cross_fragment_pair_mask(ids))
    angle_grid = jnp.asarray(angles)

    poses_out, cons_out = [], []
    for lo in range(0, Bb, block_chunk):
        hi = min(lo + block_chunk, Bb)
        pad = block_chunk - (hi - lo)

        def slc(x):
            return jnp.asarray(np.concatenate(
                [x[lo:hi]] + ([x[hi - 1:hi]] * pad if pad else []), axis=0)
                if pad else x[lo:hi])

        R_align, axis, cor, pos0 = _block_geometry(
            slc(starts), slc(ends), slc(dirs), slc(pvs), slc(mds),
            slc(apms), slc(mps), slc(rc_axes))
        poses, clash_ok, rmsd, maxdev = _block_poses(
            coords1, coords2, slc(c1_arr), slc(c2_arr),
            R_align, axis, cor, pos0, angle_grid, pair_mask,
            float(clash_thresh))

        poses = np.asarray(poses)[:hi - lo]
        clash_ok = np.asarray(clash_ok)[:hi - lo]
        similar = np.asarray((rmsd < 1.0) & (maxdev < 2.0))[:hi - lo]

        # host: greedy angular dedup in generation order
        for b in range(hi - lo):
            kept = []
            for t in range(A):
                if not clash_ok[b, t]:
                    continue
                if any(similar[b, t, t0] for t0 in kept):
                    continue
                kept.append(t)
            if kept:
                poses_out.append(poses[b, kept])
                cons_out.extend([ids_arr[lo + b]] * len(kept))

    if not poses_out:
        raise ZeroCandidatesError(
            '--> Cyclical embed did not find any suitable disposition of '
            'molecules.\n    This is probably because one molecule has two '
            'reactive centers at a great distance,\n    preventing the '
            'other two molecules from forming a closed, cyclical structure.')

    return np.concatenate(poses_out), np.array(cons_out)


def cyclical_embed(embedder):
    '''Dispatcher matching the reference entry point: rigid bimolecular
    fast path for now (reference embeds.py:240-242); trimolecular and
    non-rigid paths land with the bending subsystem.'''
    mols = embedder.objects
    if len(mols) == 2 and embedder.options.rigid:
        poses, cons = cyclical_embed_bimol_rigid(
            mols[0], mols[1], embedder.systematic_angles,
            clash_thresh=embedder.options.clash_thresh,
            pairing_ok=embedder.pairing_ok_fn(), log=embedder.log)
        embedder.constrained_indices = cons
        return poses
    raise NotImplementedError(
        'trimolecular / non-rigid cyclical embeds are not wired up yet')
