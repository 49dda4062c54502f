'''CLI surface: -cl inline input, -c cite, -b concurrency benchmark and
the argparse plumbing (reference __main__.py:49-119).'''

import os
import shutil
import subprocess
import sys

FIX = os.path.join(os.path.dirname(__file__), 'fixtures')
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, cwd, timeout=240):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS='cpu')
    return subprocess.run([sys.executable, '-m', 'tscode_tpu'] + args,
                          capture_output=True, text=True, cwd=cwd,
                          env=env, timeout=timeout)


def test_cite_flag():
    r = _run_cli(['-c'], cwd=REPO)
    assert r.returncode == 0
    assert 'TSCoDe' in r.stdout and '2023' in r.stdout


def test_no_input_prints_help():
    r = _run_cli([], cwd=REPO)
    assert r.returncode == 2
    assert 'usage' in (r.stdout + r.stderr).lower()


def test_command_line_input_mode(tmp_path):
    '''-cl "..." writes a synthetic input file and runs it; semicolons
    become newlines (reference __main__.py:90-95).'''
    for name in ('C2H4.xyz', 'CH3Cl.xyz'):
        shutil.copy(os.path.join(FIX, name), tmp_path)
    r = _run_cli(['-cl', 'NOOPT;C2H4.xyz 0;CH3Cl.xyz 0', '-n', 'climode'],
                 cwd=str(tmp_path))
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert (tmp_path / 'tscode_unoptimized_climode.xyz').exists()
    assert 'normal termination' in r.stdout


def test_concurrency_benchmark(tmp_path):
    '''-b FILE: the proc/thread tuning harness (reference
    concurrent_test.py:16-105) runs on the internal FF when no
    calculator is present.'''
    shutil.copy(os.path.join(FIX, 'CH3Cl.xyz'), tmp_path)
    r = _run_cli(['CH3Cl.xyz', '-b'], cwd=str(tmp_path))
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert 'benchmark' in r.stdout.lower()


def test_installation_smoke_runs(tmp_path):
    '''-t: the installation smoke suite (4 hermetic embed inputs as
    subprocess runs, reference tests.py:21-149) completes cleanly.'''
    r = _run_cli(['-t'], cwd=str(tmp_path), timeout=580)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert 'All tests passed' in r.stdout
    assert r.stdout.count(' ok ') >= 4
