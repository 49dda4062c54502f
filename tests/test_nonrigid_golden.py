'''Golden regression tests for the non-rigid cyclical embed.

The goldens in tests/golden/nonrigid_embed.npz were produced by the
pre-batching per-combo implementation (one screen dispatch per
(conformer, pivot) combination) on the CPU x64 backend. The grouped,
chunked implementation (embeds/cyclical.py, cyclical_embed_nonrigid
phase 1/2) must reproduce them: same survivor sets, same constrained
indices, same coordinates — including the bend side effects that
mutate the working molecule list mid-sweep and the chained trimolecular
direction adjustment (reference embeds.py:453-732, 314-451).
'''

import os
import shutil

import numpy as np

from tscode_tpu.embedder import Embedder
from tscode_tpu.io_xyz import read_xyz, write_xyz

FIX = os.path.join(os.path.dirname(__file__), 'fixtures')
GOLD = np.load(os.path.join(os.path.dirname(__file__), 'golden',
                            'nonrigid_embed.npz'))


def _write_noisy(src, dst, n, rng, noise=0.05):
    data = read_xyz(src)
    base = data.atomcoords[0]
    with open(dst, 'w') as f:
        for c in range(n):
            write_xyz(base + rng.normal(size=base.shape) * noise,
                      data.atomnos, f, title=f'conf {c}')


def _run(tmp_path, content, copies, noisy, stamp):
    rng = np.random.default_rng(7)
    for name in copies:
        shutil.copy(os.path.join(FIX, name.split(':')[0]),
                    str(tmp_path / name.split(':')[1]))
    for src, dst, n in noisy:
        _write_noisy(os.path.join(FIX, src), str(tmp_path / dst), n, rng)
    inp = tmp_path / 'input.txt'
    inp.write_text(content)
    cwd = os.getcwd()
    try:
        emb = Embedder(str(inp), stamp=stamp)
        return emb.run()
    finally:
        os.chdir(cwd)


def _check(run, prefix):
    structures = np.asarray(run.structures)
    cons = np.asarray(run.constrained_indices)
    want_s = GOLD[f'{prefix}_structures']
    want_c = GOLD[f'{prefix}_cons']
    assert structures.shape == want_s.shape
    np.testing.assert_allclose(structures, want_s, atol=1e-8)
    np.testing.assert_array_equal(cons, want_c)


def test_bimol_nonrigid_matches_percombo_golden(tmp_path):
    run = _run(
        tmp_path,
        'NOOPT DIST(a=2.2,b=2.3)\nm1.xyz 0a 3b\nm2.xyz 0a 4b\n',
        copies=(),
        noisy=(('C2H4.xyz', 'm1.xyz', 3), ('CH3Cl.xyz', 'm2.xyz', 3)),
        stamp='gold_bimol')
    _check(run, 'bimol_nonrigid')


def test_trimol_nonrigid_matches_percombo_golden(tmp_path):
    run = _run(
        tmp_path,
        'BYPASS DIST(A=2.5,x=2,y=2.5,C=1) SHRINK ROTRANGE=10 STEPS=1\n'
        'm1.xyz 0A 4y\nm2.xyz 1A 4x 0C 2C\nm2.xyz 1x 4y\n',
        copies=('CH3Cl.xyz:m1.xyz',),
        noisy=(('HCOOH.xyz', 'm2.xyz', 2),),
        stamp='gold_tri')
    _check(run, 'tri_small')
