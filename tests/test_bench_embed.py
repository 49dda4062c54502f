'''bench.py embed-form equality: the gather-free broadcast whole-grid
program and its c2-aligned tiled form must agree on the real grid
prefix at every tile size — including tail tiles where n2c % g != 0
(a clamped tail slice once shifted its c2 content against the tile's
flat row labels and corrupted real rows).'''

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


@pytest.fixture()
def small_grid(monkeypatch):
    import bench
    monkeypatch.setattr(bench, 'N_CONFS', 6)
    import jax.numpy as jnp

    from tscode_tpu.embeds.common import stacked_lobes
    from tscode_tpu.ops.clash import cross_fragment_pair_mask

    mol1, mol2 = bench.build_workload()
    ids = (mol1.n_atoms, mol2.n_atoms)
    c1, v1 = stacked_lobes(mol1)
    c2, v2 = stacked_lobes(mol2)
    angles = np.linspace(0.0, 350.0, 36)
    args = (jnp.asarray(mol1.atomcoords), jnp.asarray(mol2.atomcoords),
            jnp.asarray(c1), jnp.asarray(v1), jnp.asarray(c2),
            jnp.asarray(v2),
            jnp.asarray(cross_fragment_pair_mask(ids)),
            jnp.asarray(angles))
    dims = dict(n1c=c1.shape[0], k1=c1.shape[1],
                n2c=c2.shape[0], k2=c2.shape[1], A=36)
    return bench, args, dims


def test_tiled_broadcast_matches_whole_grid(small_grid):
    import jax.numpy as jnp
    bench, args, d = small_grid
    B = d['n1c'] * d['n2c'] * d['k1'] * d['k2'] * d['A']
    pw, okw = bench._embed_clash_all(*args, n_angles=d['A'])

    # g=1 single-c2 tiles; g=4 forces a padded tail at n2c=6; g=6 exact
    for g in (1, 4, 6):
        n_tiles = -(-d['n2c'] // g)
        pt, okt = bench._embed_clash_all_mapped(
            *args, n_angles=d['A'], n_tiles=n_tiles, c2_per_tile=g)
        assert pt.shape[0] == n_tiles * g * (B // d['n2c'])
        np.testing.assert_allclose(np.asarray(pt[:B]), np.asarray(pw),
                                   atol=1e-12)
        np.testing.assert_array_equal(np.asarray(okt[:B]),
                                      np.asarray(okw))
        # padded tail rows (duplicate edge-c2 poses) must be dead
        assert not np.asarray(okt[B:]).any()


def test_flat_decode_oracle_agrees_with_broadcast(small_grid):
    '''The retired flat-index decoder (kept for the oracle role) and
    the broadcast form compute the same grid.'''
    import jax.numpy as jnp
    bench, args, d = small_grid
    B = d['n1c'] * d['n2c'] * d['k1'] * d['k2'] * d['A']
    r = jnp.arange(B, dtype=jnp.int32)
    po, oko = bench._embed_clash_body(r, *args, d['A'], None, B)
    pw, okw = bench._embed_clash_all(*args, n_angles=d['A'])
    np.testing.assert_allclose(np.asarray(po), np.asarray(pw),
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(oko), np.asarray(okw))
