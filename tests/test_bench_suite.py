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


def test_unknown_config_rejected():
    import bench_suite
    with pytest.raises(SystemExit):
        bench_suite._config_files('nope', '/tmp')
