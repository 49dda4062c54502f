'''
Device-mesh scale-out for the screening pipeline.

The reference's concurrency is Numba threads + fork pools on one node
(SURVEY.md section 2.9); the TPU-native equivalent shards the POSE axis
over an ICI mesh with `shard_map`:

 * pose generation and clash screening are embarrassingly parallel —
   each chip owns a contiguous pose shard (the contiguity preserves the
   reference's order-dependent prune semantics: global index = shard
   offset + local index);
 * all-pairs RMSD pruning needs cross-shard visibility — each chip
   all-gathers the (small) heavy-atom pose tensor over ICI and computes
   kill bits for its own rows against all columns, so the quadratic
   work, not the data, is what gets partitioned;
 * survivor accounting reduces with psum.
'''

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from tscode_tpu.ops.clash import compenetration_mask
from tscode_tpu.ops.linalg import _qcp_lambda_max, rot_mat_from_pointer, \
    rotation_matrix_from_vectors
from tscode_tpu.ops.rmsd_prune import _two_gate_hits


def make_mesh(n_devices=None, axis_name='poses'):
    '''Mesh over the first n devices (all by default). Raises when fewer
    than n_devices exist — a silently smaller mesh would invalidate any
    multi-chip scaling claim downstream.'''
    devices = jax.devices()
    n = n_devices or len(devices)
    if len(devices) < n:
        raise RuntimeError(
            f'requested a {n}-device mesh but only {len(devices)} '
            f'device(s) are visible — force a virtual mesh '
            f'(--xla_force_host_platform_device_count) or lower n_devices')
    return Mesh(np.array(devices[:n]), (axis_name,))


def _similar_rows(P_rows, Q_all, cand, rmsd_thr):
    '''Two-gate similarity bits (rmsd < thr AND maxdev < 2*thr, the
    reference accept rule, rmsd_pruning.py:75-77) of local rows vs all
    columns, via the shared QCP helpers from ops.rmsd_prune.'''
    n_atoms = P_rows.shape[-2]
    S = jnp.einsum('ani,bnk->abik', P_rows, Q_all)
    GA = jnp.sum(P_rows * P_rows, axis=(-2, -1))[:, None]
    GB = jnp.sum(Q_all * Q_all, axis=(-2, -1))[None, :]
    lam = _qcp_lambda_max(S, GA, GB)
    msd = (GA + GB - 2.0 * lam) / n_atoms
    rmsd = jnp.sqrt(jnp.maximum(msd, 0.0))
    return _two_gate_hits(rmsd, cand, rmsd_thr, n_atoms, S, lam,
                          P_rows, Q_all)


def sharded_screen_pipeline(mesh, rmsd_thr=0.5, clash_thresh=1.5,
                            axis_name='poses'):
    '''
    jitted (poses, pair_mask) -> (keep_mask, n_survivors): clash screen
    locally, RMSD kill bits against the all-gathered ensemble, psum count.
    poses (B, N, 3) sharded over axis 0; pair_mask (N, N) replicated.
    Kill rule: pose i dies when any NON-KILLABLE-FIRST pose j > i (global
    order) with clash-ok status has rmsd < thr — the k=1-pass rule of the
    reference pruner evaluated in one shot.
    '''

    def step(poses, pair_mask):
        # local clash screen
        clash_ok = compenetration_mask(poses, pair_mask,
                                       thresh=clash_thresh)

        # cross-shard RMSD kill: gather all poses over ICI
        all_poses = jax.lax.all_gather(poses, axis_name, axis=0, tiled=True)
        all_ok = jax.lax.all_gather(clash_ok, axis_name, axis=0, tiled=True)

        n_local = poses.shape[0]
        my_shard = jax.lax.axis_index(axis_name)
        g0 = my_shard * n_local
        i_global = g0 + jnp.arange(n_local)
        j_global = jnp.arange(all_poses.shape[0])

        cand = all_ok[None, :] & (j_global[None, :] > i_global[:, None])
        kill = jnp.any(_similar_rows(poses, all_poses, cand,
                                     jnp.asarray(rmsd_thr, poses.dtype)),
                       axis=1)

        keep = clash_ok & ~kill
        n_survivors = jax.lax.psum(jnp.sum(keep), axis_name)
        return keep, n_survivors

    sharded = shard_map(step, mesh=mesh,
                        in_specs=(P(axis_name), P(None, None)),
                        out_specs=(P(axis_name), P()))
    return jax.jit(sharded)


def sharded_embed_screen_step(mesh, rmsd_thr=0.5, clash_thresh=1.5,
                              axis_name='poses'):
    '''
    The full device "step" over the mesh: each chip materializes ITS OWN
    shard of the string-embed grid (alignment rotations + spin + pose
    assembly), clash-screens it, and cross-prunes against the gathered
    ensemble. Inputs:
      coords1 (C1, N1, 3), coords2 (C2, N2, 3)   - replicated
      centers/vecs (C, K, 3) per molecule          - replicated
      c1,c2,a1,a2 (B,) int32 grid indices          - sharded over poses
      angles (B,)                                  - sharded over poses
      pair_mask (N, N)                             - replicated
    Returns (poses sharded, keep sharded, n_survivors replicated).
    '''

    def step(coords1, coords2, centers1, vecs1, centers2, vecs2,
             c1, c2, a1, a2, angles, pair_mask):
        p1 = centers1[c1, a1]
        p2 = centers2[c2, a2]
        ref_vec = vecs1[c1, a1]
        mol_vec = vecs2[c2, a2]

        align = rotation_matrix_from_vectors(mol_vec, -ref_vec)
        spin = rot_mat_from_pointer(ref_vec, angles)
        R = jnp.einsum('bij,bjk->bik', spin, align)
        t = p1 - jnp.einsum('bij,bj->bi', R, p2)

        f1 = coords1[c1]
        f2 = jnp.einsum('bij,bnj->bni', R, coords2[c2]) + t[:, None, :]
        poses = jnp.concatenate([f1, f2], axis=1)

        clash_ok = compenetration_mask(poses, pair_mask,
                                       thresh=clash_thresh)

        all_poses = jax.lax.all_gather(poses, axis_name, axis=0, tiled=True)
        all_ok = jax.lax.all_gather(clash_ok, axis_name, axis=0, tiled=True)

        n_local = poses.shape[0]
        g0 = jax.lax.axis_index(axis_name) * n_local
        i_global = g0 + jnp.arange(n_local)
        j_global = jnp.arange(all_poses.shape[0])

        cand = all_ok[None, :] & (j_global[None, :] > i_global[:, None])
        keep = clash_ok & ~jnp.any(
            _similar_rows(poses, all_poses, cand,
                          jnp.asarray(rmsd_thr, poses.dtype)), axis=1)
        n_survivors = jax.lax.psum(jnp.sum(keep), axis_name)
        return poses, keep, n_survivors

    rep = P(None)
    sh = P(axis_name)
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep,
                  sh, sh, sh, sh, sh, P(None, None)),
        out_specs=(sh, sh, P()))
    return jax.jit(sharded)
