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

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:                                    # jax >= 0.8 top-level export
    from jax import shard_map
except ImportError:                     # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from tscode_tpu.ops.clash import compenetration_mask
from tscode_tpu.ops.linalg import _qcp_lambda_max, rot_mat_from_pointer, \
    rotation_matrix_from_vectors
from tscode_tpu.ops.rmsd_prune import _two_gate_hits


def get_default_mesh(axis_name='poses'):
    '''The mesh the production pipeline shards over: all visible
    devices, or None when only one device exists or TSCODE_DISABLE_MESH
    is set. Cached per device count (mesh construction is cheap but the
    jitted programs built on it are keyed by mesh identity).'''
    import os
    if os.environ.get('TSCODE_DISABLE_MESH') == '1':
        return None
    devices = jax.devices()
    if len(devices) < 2:
        return None
    key = (len(devices), axis_name)
    mesh = _MESH_CACHE.get(key)
    if mesh is None:
        mesh = Mesh(np.array(devices), (axis_name,))
        _MESH_CACHE[key] = mesh
    return mesh


_MESH_CACHE = {}


def mesh_wants(n_items, threshold=4096):
    '''Auto-activation rule for sharded stage variants: shard when the
    workload is big enough to amortize collective overhead, or always
    when TSCODE_MESH=1 forces it (used by the multi-chip identity tests
    and the driver dryrun, where tiny shapes must still exercise the
    sharded code path).'''
    import os
    if os.environ.get('TSCODE_MESH') == '1':
        return True
    return n_items >= threshold


def mesh_for(n_items, threshold=4096, axis_name='poses'):
    '''One-stop activation gate for sharded stage variants: the default
    mesh when one exists AND the workload clears the size gate
    (mesh_wants), else None. Call sites should use this instead of
    restating the (mesh, device count, size) checks.'''
    mesh = get_default_mesh(axis_name)
    if mesh is None or not mesh_wants(n_items, threshold):
        return None
    return mesh


def _pad_rows(arr, mult):
    '''Pad axis 0 to a FIXED pow2 bucket rounded up to a multiple of
    `mult`: device executables are keyed on shapes, and remote compiles
    cost 5-30 s each with an unreliable cross-process cache (CLAUDE.md
    env rules), so shapes must come from a small fixed set rather than
    one per exact ensemble size. Edge-repeat keeps padded rows
    numerically harmless. Returns (padded, n_real).'''
    n = len(arr)
    n_pad = max(8, 1 << max(0, (n - 1)).bit_length())
    n_pad = -(-n_pad // mult) * mult
    if n_pad == n:
        return arr, n
    pad_width = [(0, n_pad - n)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad_width, mode='edge'), n


@functools.lru_cache(maxsize=None)
def _compenetration_program(mesh, axis_name, thresh, max_clashes):
    def step(poses, pair_mask):
        return compenetration_mask(poses, pair_mask, thresh=thresh,
                                   max_clashes=max_clashes)
    sharded = shard_map(step, mesh=mesh,
                        in_specs=(P(axis_name), P(None, None)),
                        out_specs=P(axis_name))
    return jax.jit(sharded)


def sharded_compenetration_mask(poses, pair_mask, mesh, thresh=1.5,
                                max_clashes=0, axis_name='poses'):
    '''compenetration_mask sharded over the pose axis — embarrassingly
    parallel, bit-identical to the single-device op. Returns (B,) bool
    numpy.'''
    poses = np.asarray(poses)
    padded, n = _pad_rows(poses, mesh.devices.size)
    fn = _compenetration_program(mesh, axis_name, float(thresh),
                                 int(max_clashes))
    mask = fn(jnp.asarray(padded), jnp.asarray(np.asarray(pair_mask)))
    return np.asarray(mask)[:n]


@functools.lru_cache(maxsize=None)
def _moments_program(mesh, axis_name):
    from tscode_tpu.ops.linalg import get_inertia_moments

    def step(structures, masses):
        return get_inertia_moments(structures, masses)
    sharded = shard_map(step, mesh=mesh,
                        in_specs=(P(axis_name), P(None)),
                        out_specs=P(axis_name))
    return jax.jit(sharded)


def sharded_moments(structures, masses, mesh, axis_name='poses'):
    '''Principal inertia moments sharded over the structure axis.
    Returns (B, 3) numpy.'''
    structures = np.asarray(structures)
    padded, n = _pad_rows(structures, mesh.devices.size)
    fn = _moments_program(mesh, axis_name)
    moments = fn(jnp.asarray(padded), jnp.asarray(np.asarray(masses)))
    return np.asarray(moments)[:n]


@functools.lru_cache(maxsize=None)
def _tfd_first_successor_program(mesh, axis_name):
    '''Rows sharded, columns replicated: each device finds, for its row
    slice, the first later column within `thresh` wrapped-L1 TFD. The
    row/column index bookkeeping uses GLOBAL indices so the result is
    identical to the sequential tile scan.'''
    def step(tf_rows, tf_all, thresh):
        n_local = tf_rows.shape[0]
        g0 = jax.lax.axis_index(axis_name) * n_local
        i_global = g0 + jnp.arange(n_local)

        # accumulate the wrapped-L1 sum over torsions with a scan so the
        # live tensor is (n_local, L), never (n_local, L, Q)
        def body(acc, q_cols):
            a_q, b_q = q_cols
            d = jnp.abs(a_q[:, None] - b_q[None, :])
            return acc + jnp.abs(d - (d > 180) * 360.0), None
        acc0 = jnp.zeros((n_local, tf_all.shape[0]), dtype=tf_rows.dtype)
        # the scan carry must be 'varying' over the mesh axis like the
        # body output; derive it from tf_rows (free after fusion)
        acc0 = acc0 + tf_rows[:, :1] * 0
        dist, _ = jax.lax.scan(body, acc0, (tf_rows.T, tf_all.T))
        sim = dist < thresh
        j = jnp.arange(tf_all.shape[0])
        valid = sim & (j[None, :] > i_global[:, None])
        hit = jnp.any(valid, axis=1)
        first = jnp.where(hit, jnp.argmax(valid, axis=1), -1)
        return first

    sharded = shard_map(step, mesh=mesh,
                        in_specs=(P(axis_name), P(None, None), P()),
                        out_specs=P(axis_name))
    return jax.jit(sharded)


def sharded_first_similar_successor(tf_chunk, thresh, mesh,
                                    axis_name='poses'):
    '''Mesh-parallel form of ops.tfd._first_similar_successor: for each
    fingerprint row i, the smallest j > i with wrapped-L1 < thresh, or
    -1. Fingerprints are small (L x Q f32) so the column copy is
    replicated; the quadratic delta work is what gets sharded.'''
    tf_chunk = np.asarray(tf_chunk)
    n_dev = mesh.devices.size
    padded, n = _pad_rows(tf_chunk, n_dev)
    if len(padded) > n:
        # edge-padded rows would alias the last real row and "find"
        # themselves; poison padded rows instead
        padded = padded.copy()
        padded[n:] = 1.0e9
    fn = _tfd_first_successor_program(mesh, axis_name)
    first = fn(jnp.asarray(padded), jnp.asarray(padded),
               jnp.asarray(thresh, padded.dtype))
    return np.asarray(first)[:n].astype(np.int64)


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
