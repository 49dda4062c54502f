'''bench_suite smoke: the BASELINE.md benchmark configs drive the
production Embedder pipeline and report stage timings.'''

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


@pytest.fixture(autouse=True)
def _tiny(monkeypatch):
    import bench_suite
    monkeypatch.setattr(bench_suite, 'N_CONFS', 2)


@pytest.mark.parametrize('config', ['sn2_string', 'multiembed'])
def test_suite_config_runs(config):
    import bench_suite
    res = bench_suite.run_config(config)
    assert 'error' not in res, res
    assert res['config'] == config
    assert res['candidates'] > 0
    assert res['final'] > 0
    assert res['seconds'] > 0
    assert res['stages'], 'run report stages missing'
    names = [s['stage'] for s in res['stages']]
    assert 'generate_candidates' in names


@pytest.mark.parametrize('config', ['large_n_string'])
def test_large_n_config_runs(config):
    '''The MXU-regime config (148-atom poses) drives the same production
    string-embed program; at 74x74 cross pairs the Pallas unrolled
    kernel must be auto-gated off in favor of the XLA matmul form.'''
    import bench_suite
    res = bench_suite.run_config(config)
    assert 'error' not in res, res
    assert res['candidates'] > 0
    assert res['final'] > 0


def test_chloroalkane_geometry_is_chemically_sane():
    '''The synthetic large-N fixture must graphize to exactly the
    intended bond graph (no spurious/missing bonds) and resolve its sp3
    orbital hermetically — otherwise the benchmark would measure a
    different molecule than it claims.'''
    import numpy as np
    import bench_suite
    from tscode_tpu.graphs import graphize

    n_c = 24
    coords, nos = bench_suite._chloroalkane(n_c)
    assert len(coords) == n_c + 1 + (2 * n_c + 1)      # C + Cl + H
    g = graphize(coords, nos)
    # graphize keeps the reference's self-loop quirk: every node has a
    # self-edge, which nx counts as +2 degree
    degree = {i: d - 2 for i, d in g.degree}
    carbons = [i for i, z in enumerate(nos) if z == 6]
    assert all(degree[i] == 4 for i in carbons), 'every C tetravalent'
    assert all(degree[i] == 1 for i, z in enumerate(nos) if z != 6)
    # backbone is one simple chain: C-C bond count == n_c - 1
    cc_bonds = [e for e in g.edges
                if e[0] != e[1] and nos[e[0]] == 6 and nos[e[1]] == 6]
    assert len(cc_bonds) == n_c - 1
    # atom 0 carries the Cl -> sp3 leaving group resolves without input
    cl = [i for i, z in enumerate(nos) if z == 17]
    assert len(cl) == 1 and g.has_edge(0, cl[0])


def test_pallas_clash_pair_cap(monkeypatch):
    '''Past the unroll cap the clash policy must fall back to the XLA
    matmul form even on accelerator backends.'''
    from tscode_tpu.ops import clash

    monkeypatch.delenv('TSCODE_USE_PALLAS_CLASH', raising=False)
    monkeypatch.setattr(clash.jax, 'default_backend', lambda: 'tpu')
    assert clash.use_pallas_clash(n_pairs=30)
    assert not clash.use_pallas_clash(n_pairs=74 * 74)
    monkeypatch.setenv('TSCODE_PALLAS_CLASH_MAX_PAIRS', '10000')
    assert clash.use_pallas_clash(n_pairs=74 * 74)
    # explicit =1 forces Pallas regardless of size (debug/A-B override)
    monkeypatch.delenv('TSCODE_PALLAS_CLASH_MAX_PAIRS')
    monkeypatch.setenv('TSCODE_USE_PALLAS_CLASH', '1')
    assert clash.use_pallas_clash(n_pairs=74 * 74)
    monkeypatch.setenv('TSCODE_USE_PALLAS_CLASH', '0')
    assert not clash.use_pallas_clash(n_pairs=30)


def test_unknown_config_rejected():
    import bench_suite
    with pytest.raises(SystemExit):
        bench_suite._config_files('nope', '/tmp')


def test_tiled_embed_matches_whole_grid(monkeypatch):
    '''The lax.map tiled embed+clash (used past the single-program HBM
    ceiling) must reproduce the whole-grid program exactly, including
    the padded-tail clash_ok=False contract.'''
    import numpy as np
    import jax.numpy as jnp

    import bench
    monkeypatch.setattr(bench, 'N_CONFS', 4)
    mol1, mol2 = bench.build_workload()

    from tscode_tpu.embeds.common import stacked_lobes
    from tscode_tpu.ops.clash import cross_fragment_pair_mask

    centers1, vecs1 = stacked_lobes(mol1)
    centers2, vecs2 = stacked_lobes(mol2)
    ids = (mol1.n_atoms, mol2.n_atoms)
    angles = np.linspace(0.0, 350.0, bench.N_ANGLES)
    args = (jnp.asarray(mol1.atomcoords), jnp.asarray(mol2.atomcoords),
            jnp.asarray(centers1), jnp.asarray(vecs1),
            jnp.asarray(centers2), jnp.asarray(vecs2),
            jnp.asarray(cross_fragment_pair_mask(ids)),
            jnp.asarray(angles))

    poses_w, ok_w = bench._embed_clash_all(
        *args, n_angles=bench.N_ANGLES, pallas_pairs=None)
    B = poses_w.shape[0]                               # 4*4*2*36 = 1152

    # c2-aligned tiles (3 does not divide n2c=4 -> padded tail tile)
    c2_per_tile = 3
    n_tiles = -(-centers2.shape[0] // c2_per_tile)
    poses_t, ok_t = bench._embed_clash_all_mapped(
        *args, n_angles=bench.N_ANGLES, n_tiles=n_tiles,
        c2_per_tile=c2_per_tile, pallas_pairs=None)

    stride = B // centers2.shape[0]
    assert poses_t.shape[0] == n_tiles * c2_per_tile * stride
    np.testing.assert_array_equal(np.asarray(ok_t[:B]),
                                  np.asarray(ok_w))
    assert not np.asarray(ok_t[B:]).any(), 'padded tail must not survive'
    np.testing.assert_allclose(np.asarray(poses_t[:B]),
                               np.asarray(poses_w), atol=1e-12)
