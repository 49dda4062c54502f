'''prune_collective_model: pure shape arithmetic, no devices touched.
Locks the round-5 review fixes (consistent trajectory walk across tier
loops, unconditional in-place gate psums, 1-chip zero-comm baseline).'''

import numpy as np

from tscode_tpu.ops.rmsd_prune import _inplace_ks
from tscode_tpu.parallel.prune import (TIER2_SURVIVORS,
                                       prune_collective_model)

CFG = dict(n=884401, n_pool=1048576, n_atoms=5, entry_actives=884401)


def test_walls_scale_down_with_devices():
    walls, speedups = [], []
    for nd in (1, 2, 4, 8):
        _, tot = prune_collective_model(n_devices=nd,
                                        survivors=TIER2_SURVIVORS, **CFG)
        walls.append(tot['wall_s'])
        speedups.append(tot['projected_speedup'])
    assert walls[0] > walls[1] > walls[2] > walls[3]
    assert speedups[0] == 1.0
    assert speedups[3] > speedups[1] > 1.0
    # Amdahl: 8 chips stay well under the embarrassing 8x
    assert speedups[3] < 8.0


def test_one_chip_moves_no_bytes():
    _, tot = prune_collective_model(n_devices=1,
                                    survivors=TIER2_SURVIVORS, **CFG)
    assert tot['ppermute_bytes'] == 0
    assert tot['allgather_bytes'] == 0
    assert tot['pair_work_per_chip'] > 0


def test_gate_psums_counted_per_inplace_k():
    # the SPMD program psums every in-place gate, gated out or not,
    # plus 2 for the finish block (review finding r5)
    _, tot = prune_collective_model(n_devices=8,
                                    survivors=TIER2_SURVIVORS, **CFG)
    assert tot['psum_calls'] == len(_inplace_ks(CFG['n'])) + 2


def test_sparse_trajectory_stays_consistent():
    # regression: a per-loop running `active` went stale across the
    # tier loops — a sparse {first, last} trajectory then modeled ZERO
    # mid passes while mid2 ran at the entry count. The forward-walked
    # active_at map keeps every tier consistent: between checkpoints
    # the carried value applies, so both tiers emit passes.
    rows, tot = prune_collective_model(
        n_devices=8, survivors={20000: 884401, 1: 29}, **CFG)
    modes = [r['mode'] for r in rows]
    assert any(m == 'mid2 banded' for m in modes)
    assert any(m == 'mid banded' for m in modes)
    assert modes[-1] == 'finish all_gather'


def test_tfd_block_env_validation():
    # TSCODE_TFD_BLOCK is a tuning knob: non-pow2 / zero values must
    # round to a sane pow2 instead of crashing the embed (review r5)
    from tscode_tpu.ops import tfd
    r = np.random.default_rng(0)
    fps = ((r.uniform(-180, 180, size=(300, 5))).astype(np.float32))
    want = tfd.is_new_structure_lru(fps, np.ones(300, bool))
    for bad_block in (3000, 0, 7):
        got, ok = tfd.tfd_novelty_device(fps, block=bad_block,
                                         cache_cap=512)
        assert ok
        np.testing.assert_array_equal(got, want)
