#!/usr/bin/env python
'''
Benchmark SUITE: every benchmark config named in BASELINE.md ("Targets
for the rebuild"), run through the PRODUCTION `Embedder` pipeline —
not a bespoke bench program — with per-stage timings from the run
report. Complements `bench.py` (the driver's single-line headline
metric, which times the fused string-embed pipeline in isolation).

Configs (BASELINE.md:23-27):
  da_cyclical     Diels-Alder-like 2-mol cyclical embed (NOOPT RIGID)
  sn2_string      SN2-type 2-mol string embed with clash screening
  torsion_drive   csearch> torsion driving + batched clash pruning
  trimolecular    3-mol cyclical embed (BYPASS dumps every pose)
  multiembed      combinatorial docking, ensemble-wide RMSD pruning

Prints one JSON line per config:
  {"config": ..., "backend": ..., "candidates": N, "final": N,
   "seconds": S, "poses_per_sec": R, "stages": [...]}
and a trailing summary line. Scale with TSCODE_SUITE_CONFS (noisy
conformers per molecule, default 16; the multiembed/cyclical grids grow
quadratically with it).

Usage: python bench_suite.py [config ...]    (default: all)
'''

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   'tests', 'fixtures')
N_CONFS = int(os.environ.get('TSCODE_SUITE_CONFS', '16'))
NOISE = 0.12


def _write_noisy(src, dst, n_confs, rng, noise=NOISE):
    '''Tile a fixture molecule into n_confs jittered conformers.'''
    from tscode_tpu.io_xyz import read_xyz, write_xyz
    data = read_xyz(src)
    base = data.atomcoords[0]
    with open(dst, 'w') as f:
        for c in range(n_confs):
            write_xyz(base + rng.normal(size=base.shape) * noise,
                      data.atomnos, f, title=f'conf {c}')


def _config_files(name, workdir):
    '''Write input.txt + molecule files for a config; returns input path.'''
    rng = np.random.default_rng(7)
    j = os.path.join

    if name == 'da_cyclical':
        _write_noisy(j(FIX, 'C2H4.xyz'), j(workdir, 'm1.xyz'), N_CONFS, rng)
        _write_noisy(j(FIX, 'CH3Cl.xyz'), j(workdir, 'm2.xyz'), N_CONFS, rng)
        content = ('NOOPT RIGID DIST(a=2.2,b=2.3)\n'
                   'm1.xyz 0a 3b\nm2.xyz 0a 4b\n')
    elif name == 'sn2_string':
        _write_noisy(j(FIX, 'C2H4.xyz'), j(workdir, 'm1.xyz'), N_CONFS, rng)
        _write_noisy(j(FIX, 'CH3Cl.xyz'), j(workdir, 'm2.xyz'), N_CONFS, rng)
        content = 'NOOPT\nm1.xyz 0\nm2.xyz 0\n'
    elif name == 'torsion_drive':
        _write_noisy(j(FIX, 'C2F2H4.xyz'), j(workdir, 'm1.xyz'),
                     max(2, N_CONFS // 4), rng, noise=0.05)
        content = 'NOOPT\ncsearch> m1.xyz 3 5\n'
    elif name == 'trimolecular':
        shutil.copy(j(FIX, 'CH3Cl.xyz'), j(workdir, 'm1.xyz'))
        _write_noisy(j(FIX, 'HCOOH.xyz'), j(workdir, 'm2.xyz'),
                     max(2, N_CONFS // 4), rng, noise=0.05)
        content = ('BYPASS DIST(A=2.5,x=2,y=2.5,C=1) SHRINK ROTRANGE=10 '
                   'STEPS=2\nm1.xyz 0A 4y\nm2.xyz 1A 4x 0C 2C\n'
                   'm2.xyz 1x 4y\n')
    elif name == 'multiembed':
        _write_noisy(j(FIX, 'HCOOH.xyz'), j(workdir, 'm1.xyz'), N_CONFS, rng)
        _write_noisy(j(FIX, 'C2H4.xyz'), j(workdir, 'm2.xyz'), N_CONFS, rng)
        content = 'NOOPT RIGID\nm1.xyz 0 1 3\nm2.xyz 0 1\n'
    else:
        raise SystemExit(f'unknown config {name!r}')

    inp = j(workdir, 'input.txt')
    with open(inp, 'w') as f:
        f.write(content)
    return inp


def run_config(name, reps=1):
    '''Run one config through Embedder.run() `reps` times in-process
    (first run pays every compile; later runs show the warm rate).
    Returns the result dict for the LAST rep with all rep times.'''
    from tscode_tpu.embedder import Embedder

    times, run, stages = [], None, []
    for rep in range(reps):
        workdir = tempfile.mkdtemp(prefix=f'suite_{name}_')
        cwd = os.getcwd()
        try:
            inp = _config_files(name, workdir)
            t0 = time.perf_counter()
            emb = Embedder(inp, stamp=f'suite_{name}')
            run = emb.run()
            times.append(round(time.perf_counter() - t0, 3))
            if run is None or not hasattr(run, 'structures'):
                return {'config': name, 'error': 'run failed'}
            rpath = os.path.join(workdir,
                                 f'tscode_report_suite_{name}.json')
            if os.path.isfile(rpath):
                stages = json.load(open(rpath)).get('stages', [])
        finally:
            os.chdir(cwd)
            shutil.rmtree(workdir, ignore_errors=True)

    candidates = getattr(run, 'candidates', None) or 0
    if stages:
        # operator-driven configs (csearch>) and multiembed do the real
        # work outside the closed-form grid count: never report fewer
        # candidates than the pose pool the embed stage produced
        candidates = max(candidates, stages[0]['structures_in'],
                         stages[0]['structures_out'])
    import jax
    return {
        'config': name,
        'backend': jax.default_backend(),
        'candidates': int(candidates),
        'final': int(len(run.structures)),
        'seconds': times[-1],
        'rep_seconds': times,
        'poses_per_sec': round(candidates / times[-1], 1),
        'stages': stages,
    }


ALL = ('sn2_string', 'da_cyclical', 'torsion_drive', 'trimolecular',
       'multiembed')


def main():
    from tscode_tpu.backend import ensure_backend
    backend = ensure_backend(quiet=True)
    names = [a for a in sys.argv[1:] if not a.startswith('-')] or list(ALL)
    reps = int(os.environ.get('TSCODE_SUITE_REPS', '1'))
    results = []
    for name in names:
        res = run_config(name, reps=reps)
        results.append(res)
        print(json.dumps(res))
    ok = [r for r in results if 'error' not in r]
    summary = {
        'suite': 'tscode_tpu',
        'backend': backend,
        'configs_ok': len(ok),
        'configs_total': len(names),
        'total_candidates': sum(r['candidates'] for r in ok),
        'total_seconds': round(sum(r['seconds'] for r in ok), 3),
    }
    print(json.dumps(summary))


if __name__ == '__main__':
    main()
