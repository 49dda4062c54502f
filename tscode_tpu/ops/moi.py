'''
Moment-of-inertia duplicate pruning (rotamers / enantiomers).

Device side: batched principal moments via the closed-form symmetric-3x3
eigensolver (replacing the per-structure Numba loop of algebra.py:165-205).
Host side: the reference's first-match edge collection + keep-first-of-
component rule (optimization_methods.py:327-358).
'''

import jax
import jax.numpy as jnp
import networkx as nx
import numpy as np

from tscode_tpu.ops.linalg import get_inertia_moments
from tscode_tpu.pt import masses_of


@jax.jit
def _moments_batch(structures, masses):
    return get_inertia_moments(structures, masses)


@jax.jit
def _moi_sim_matrix(moments, max_deviation):
    '''(B, 3) moments -> (B, B) similarity, entirely inside one program
    (eager ops on a tunneled accelerator pay per-op dispatch).'''
    mi = moments[:, None, :]
    mj = moments[None, :, :]
    rel = jnp.abs(mi - mj) / mi
    return jnp.all(rel < max_deviation, axis=-1)


def moi_similarity_matrix(structures, masses, max_deviation=1e-2,
                          mesh=None):
    '''
    (B, B) bool: pair (i, j) similar when all three relative moment
    deviations |m_i - m_j| / m_i are below max_deviation (note the
    asymmetric denominator, faithful to algebra.py:188-205).

    mesh: optional Mesh — the per-structure moment computation shards
    over the structure axis (parallel/sharding.sharded_moments).
    '''
    if mesh is not None and mesh.devices.size > 1:
        from tscode_tpu.parallel.sharding import sharded_moments
        moments = jnp.asarray(sharded_moments(structures, masses, mesh))
    else:
        moments = _moments_batch(jnp.asarray(structures),
                                 jnp.asarray(masses))
    return np.array(_moi_sim_matrix(moments, max_deviation))


def prune_by_moment_of_inertia(structures, atomnos, max_deviation=1e-2,
                               mesh=None):
    '''
    Returns (pruned_structures, keep_mask). Heavy atoms only, like the
    reference. Edge set: each structure links to its FIRST similar
    successor (the `break` in algebra.py:198); components keep the first
    node (optimization_methods.py:343-353).
    '''
    structures = np.asarray(structures)
    atomnos = np.asarray(atomnos)
    heavy = atomnos != 1
    heavy_structures = structures[:, heavy]
    heavy_masses = masses_of(atomnos[heavy])

    n = len(structures)
    if n <= 1:
        return structures, np.ones(n, dtype=bool)

    sim = moi_similarity_matrix(heavy_structures, heavy_masses,
                                max_deviation, mesh=mesh)
    np.fill_diagonal(sim, False)

    matches = []
    for i in range(n):
        js = np.nonzero(sim[i, i + 1:])[0]
        if len(js):
            matches.append((i, i + 1 + int(js[0])))

    mask = np.ones(n, dtype=bool)
    if matches:
        g = nx.Graph(matches)
        groups = [tuple(g.subgraph(c).nodes) for c in nx.connected_components(g)]
        for group in groups:
            for i in set(group) - {group[0]}:
                mask[i] = False

    return structures[mask], mask
