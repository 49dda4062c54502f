'''
Pallas TPU kernel: batched compenetration (clash) screening.

Layout note (the TPU-native choice): the POSE axis is the lane
dimension. Input arrives as (N_atoms, 3, B) so each atom coordinate is a
(3, BP) vector tile; the kernel unrolls the cross-fragment atom pairs
(static — the pair mask is compile-time) and accumulates clash counts
for BP poses at once, entirely in registers/VMEM. This sidesteps the
(B, N, 3) layout's 3-wide lane padding, whose garbage lanes would
otherwise pollute reductions.

Equivalent to ops/clash.compenetration_mask (the XLA-fused jnp path).
'''

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_POSE_BLOCK = 2048


def _make_clash_kernel(pairs, thresh2, max_clashes):
    '''Kernel closure over the STATIC cross-fragment pair list.'''

    def kernel(coords_ref, out_ref):
        # coords_ref: (N, 3, BP) VMEM; out_ref: (1, BP) int32
        counts = jnp.zeros((1, coords_ref.shape[2]), dtype=jnp.float32)
        for i, j in pairs:
            diff = coords_ref[i] - coords_ref[j]          # (3, BP)
            d2 = jnp.sum(diff * diff, axis=0, keepdims=True)
            counts = counts + jnp.where(d2 < thresh2, 1.0, 0.0)
        out_ref[:] = (counts <= max_clashes).astype(jnp.int32)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=('pairs', 'thresh', 'max_clashes',
                                    'interpret'))
def _clash_call(coords_t, pairs, thresh, max_clashes, interpret):
    N = coords_t.shape[0]
    B = coords_t.shape[2]
    bp = min(_POSE_BLOCK, B)
    if B % bp:
        raise ValueError(
            f'pose count {B} is not a multiple of the pose block {bp}; '
            f'pad the batch (a truncated grid would silently drop the '
            f'tail poses)')
    kernel = _make_clash_kernel(pairs, float(thresh) ** 2,
                                float(max_clashes))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        grid=(B // bp,),
        in_specs=[pl.BlockSpec((N, 3, bp), lambda i: (0, 0, i),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bp), lambda i: (0, i),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        interpret=interpret,
    )(coords_t)
    return out[0].astype(bool)


def compenetration_mask_pallas(poses, pair_mask, thresh=1.5,
                               max_clashes=0, interpret=False):
    '''
    Pallas clash screen: poses (B, N, 3), pair_mask (N, N) bool ->
    (B,) bool accept. B must be a multiple of 2048 (or B itself when
    smaller); pad the batch with anything and discard the padded results.
    '''
    from tscode_tpu.ops.clash import static_pairs
    pairs = static_pairs(pair_mask)
    coords_t = jnp.transpose(poses.astype(jnp.float32), (1, 2, 0))
    return _clash_call(coords_t, pairs, thresh, max_clashes, interpret)


def _make_clash_kernel_dyn(pairs, max_clashes):
    '''Like _make_clash_kernel but the squared threshold arrives as a
    runtime scalar (SMEM) so a TRACED clash_thresh can flow through.'''

    def kernel(params_ref, coords_ref, out_ref):
        thresh2 = params_ref[0, 0]
        counts = jnp.zeros((1, coords_ref.shape[2]), dtype=jnp.float32)
        for i, j in pairs:
            diff = coords_ref[i] - coords_ref[j]          # (3, BP)
            d2 = jnp.sum(diff * diff, axis=0, keepdims=True)
            counts = counts + jnp.where(d2 < thresh2, 1.0, 0.0)
        out_ref[:] = (counts <= max_clashes).astype(jnp.int32)

    return kernel


def clash_ok_traced(poses, pairs, thresh, max_clashes=0):
    '''Jit-traceable form for fusion into larger device programs:
    poses (B, N, 3) and thresh traced, `pairs` a STATIC tuple of
    cross-fragment (i, j) index pairs. Pads the pose axis to the block
    size internally and returns the (B,) accept mask. Used by the
    production screen when the backend A/B picked Pallas (see
    ops/clash.use_pallas_clash).
    '''
    B = poses.shape[0]
    bp = min(_POSE_BLOCK, B)
    B_pad = -(-B // bp) * bp
    if B_pad != B:
        poses = jnp.pad(poses, ((0, B_pad - B), (0, 0), (0, 0)))
    coords_t = jnp.transpose(poses.astype(jnp.float32), (1, 2, 0))
    params = jnp.reshape(jnp.asarray(thresh, jnp.float32) ** 2, (1, 1))
    kernel = _make_clash_kernel_dyn(pairs, float(max_clashes))
    N = coords_t.shape[0]
    # interpret mode on CPU: semantics testable everywhere, Mosaic
    # compile only on real accelerator backends
    interpret = jax.default_backend() == 'cpu'
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, B_pad), jnp.int32),
        grid=(B_pad // bp,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pl.ANY if interpret
                         else pltpu.SMEM),
            pl.BlockSpec((N, 3, bp), lambda i: (0, 0, i),
                         memory_space=pl.ANY if interpret
                         else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bp), lambda i: (0, i),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        interpret=interpret,
    )(params, coords_t)
    return out[0, :B].astype(bool)
