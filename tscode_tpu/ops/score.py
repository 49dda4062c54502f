'''
Pose scoring: sum of |distance - target| over constrained atom pairs
(reference _score_embed_poses, numba_functions.py:273-287), batched.
'''

import jax
import jax.numpy as jnp


@jax.jit
def score_embed_poses(structures, constrained_indices, constrained_distances):
    '''
    structures: (B, N, 3); constrained_indices: (B, C, 2) int;
    constrained_distances: (B, C) -> (B,) float32 scores.
    '''
    i1 = constrained_indices[..., 0]
    i2 = constrained_indices[..., 1]
    b = jnp.arange(structures.shape[0])[:, None]
    d = jnp.sqrt(jnp.sum((structures[b, i1] - structures[b, i2]) ** 2, axis=-1))
    return jnp.sum(jnp.abs(d - constrained_distances), axis=-1).astype(jnp.float32)


@jax.jit
def constrained_distances(structures, constrained_indices):
    '''Actual distances for each constrained pair: (B, N, 3), (B, C, 2) -> (B, C).'''
    b = jnp.arange(structures.shape[0])[:, None]
    i1 = constrained_indices[..., 0]
    i2 = constrained_indices[..., 1]
    return jnp.sqrt(jnp.sum((structures[b, i1] - structures[b, i2]) ** 2, axis=-1))


@jax.jit
def fitness_scores(structures, constrained_indices, targets, target_valid):
    '''
    Batched fitness error (reference fitness_check,
    optimization_methods.py:544-557): SIGNED error sum over constraints
    whose target is valid. structures (B, N, 3); constrained_indices
    (B, C, 2); targets (B, C); target_valid (B, C) bool -> (B,).
    '''
    d = constrained_distances(structures, constrained_indices)
    err = jnp.where(target_valid, d - targets, 0.0)
    return jnp.sum(err, axis=-1)
