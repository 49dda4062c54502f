'''Golden regression test for the cross-arrangement-batched multiembed.

The golden in tests/golden/multiembed_embed.npz pins the full
NOOPT RIGID multiembed pipeline (12 arrangements of a 3x2
reactive-index grid, 6 noisy conformers per molecule) on the CPU x64
backend. The batched sweep (multiembed.py: _build_child /
_screen_arrangements / _finish_child + the precomputed_embed hook) was
verified bit-identical to the arrangement-sequential implementation
before the golden was recorded; this test keeps it that way.
Reference behavior: /root/reference/tscode/multiembed.py:26-148.
'''

import os

import numpy as np

from tscode_tpu.embedder import Embedder
from tscode_tpu.io_xyz import read_xyz, write_xyz

FIX = os.path.join(os.path.dirname(__file__), 'fixtures')


def test_multiembed_matches_golden(tmp_path):
    gold = np.load(os.path.join(os.path.dirname(__file__), 'golden',
                                'multiembed_embed.npz'))
    rng = np.random.default_rng(7)
    for src, dst in (('HCOOH.xyz', 'm1.xyz'), ('C2H4.xyz', 'm2.xyz')):
        data = read_xyz(os.path.join(FIX, src))
        base = data.atomcoords[0]
        with open(tmp_path / dst, 'w') as f:
            for c in range(6):
                write_xyz(base + rng.normal(size=base.shape) * 0.12,
                          data.atomnos, f, title=f'conf {c}')
    inp = tmp_path / 'input.txt'
    inp.write_text('NOOPT RIGID\nm1.xyz 0 1 3\nm2.xyz 0 1\n')
    cwd = os.getcwd()
    try:
        run = Embedder(str(inp), stamp='mgold').run()
    finally:
        os.chdir(cwd)

    structures = np.asarray(run.structures)
    cons = np.asarray(run.constrained_indices)
    assert structures.shape == gold['structures'].shape
    np.testing.assert_allclose(structures, gold['structures'], atol=1e-8)
    np.testing.assert_array_equal(cons, gold['cons'])
