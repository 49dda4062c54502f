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
  large_n_string  148-atom poses (2x C24H49Cl): the MXU-regime config

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


def _chloroalkane(n_carbons):
    '''Idealized zigzag 1-chloroalkane Cl-(CH2)_{n-1}-CH3 as
    (coords (N, 3), atomnos (N,)) — the large-molecule benchmark
    fixture (no external SMILES/3D tool in the image, so the geometry
    is built from tetrahedral angles directly). Atom 0 is the Cl-bearing
    carbon: with exactly one leaving-group neighbor the sp3 orbital
    builder resolves it hermetically (orbitals.build_sp3).'''
    cc, ch, ccl = 1.526, 1.09, 1.79
    alpha = np.deg2rad(35.2644)          # half the 70.53 deg zigzag turn
    u = np.array([[np.cos(alpha), 0.0, np.sin(alpha)],
                  [np.cos(alpha), 0.0, -np.sin(alpha)]])
    y = np.array([0.0, 1.0, 0.0])
    sin_d, cos_d = 0.8165, 0.57735       # tetrahedral H fan components

    backbone = np.zeros((n_carbons, 3))
    for i in range(1, n_carbons):
        backbone[i] = backbone[i - 1] + cc * u[(i - 1) % 2]

    def h_pair(c, d1, d2):
        b = d1 + d2
        b /= np.linalg.norm(b)
        return [c + ch * (-cos_d * b + sin_d * y),
                c + ch * (-cos_d * b - sin_d * y)]

    coords, nos = [], []
    for i, c in enumerate(backbone):
        coords.append(c)
        nos.append(6)
        if i == 0:
            # Cl takes an OUT-OF-PLANE tetrahedral position so the sp3
            # orbital (anti to Cl) points perpendicular to the chain:
            # docked chains then extend sideways from the approach axis
            # instead of into each other (an in-plane Cl leaves the
            # orbital only ~35 deg off the chain direction and every
            # pose clashes)
            back = -u[1]                 # virtual previous-bond direction
            b = back + u[0]
            b /= np.linalg.norm(b)
            cl_dir = -cos_d * b + sin_d * y
            coords.append(c + ccl * cl_dir)
            nos.append(17)
            coords.append(c + ch * (-cos_d * b - sin_d * y))
            nos.append(1)
            coords.append(c + ch * back)
            nos.append(1)
        elif i < n_carbons - 1:
            coords.extend(h_pair(c, -u[(i - 1) % 2], u[i % 2]))
            nos.extend([1, 1])
        else:                            # terminal CH3
            cont = u[i % 2]
            coords.append(c + ch * cont)
            nos.append(1)
            coords.extend(h_pair(c, -u[(i - 1) % 2], cont))
            nos.extend([1, 1])
    return np.array(coords), np.array(nos)


def _write_chloroalkane(dst, n_carbons, n_confs, rng, noise=0.05):
    '''Write n_confs jittered conformers of the synthetic chloroalkane.'''
    from tscode_tpu.io_xyz import write_xyz
    coords, nos = _chloroalkane(n_carbons)
    with open(dst, 'w') as f:
        for c in range(n_confs):
            write_xyz(coords + rng.normal(size=coords.shape) * noise,
                      nos, f, title=f'conf {c}')


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
    elif name == 'large_n_string':
        # 74-atom molecules, 148-atom poses: the MXU-regime demo (the
        # clash screen's B x N x N distance matmul does real MXU work
        # here; the Pallas unrolled kernel is auto-gated OFF past 1024
        # cross pairs — ops/clash.use_pallas_clash). Same string-embed
        # program as sn2_string, ~25x the per-pose arithmetic.
        # DIST: at the default 1.0 A sp3 orbital the docked chain ends
        # sit 2.0 A apart and every end-group H/Cl fan clashes; 3.2 A
        # is a van-der-Waals-contact docking distance and passes the
        # anti-anti spin angles (a strict ~5% screen yield, which is
        # the interesting regime for a screening benchmark)
        _write_chloroalkane(j(workdir, 'm1.xyz'), 24, N_CONFS, rng)
        _write_chloroalkane(j(workdir, 'm2.xyz'), 24, N_CONFS, rng)
        content = 'NOOPT DIST(a=3.2)\nm1.xyz 0a\nm2.xyz 0a\n'
    elif name == 'da_cyclical_xl':
        # BENCH-SCALE cyclical: the reference's main embed family
        # (embeds.py:475-720) at >= 1M poses through the PRODUCTION
        # pipeline — 62 conformers/molecule -> 62*62*288 = 1,107,072
        # candidates through the rigid cyclical block sweep + greedy
        # angular dedup + similarity pipeline. Not in the default ALL
        # list (it is the on-chip scale measurement; run it by name).
        xl = int(os.environ.get('TSCODE_SUITE_XL_CONFS', '62'))
        _write_noisy(j(FIX, 'C2H4.xyz'), j(workdir, 'm1.xyz'), xl, rng)
        _write_noisy(j(FIX, 'CH3Cl.xyz'), j(workdir, 'm2.xyz'), xl, rng)
        content = ('NOOPT RIGID DIST(a=2.2,b=2.3)\n'
                   'm1.xyz 0a 3b\nm2.xyz 0a 4b\n')
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
       'multiembed', 'large_n_string')


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
