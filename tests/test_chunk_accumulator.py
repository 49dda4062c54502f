'''ChunkAccumulator semantics: row order, padding trim, multi-flush,
bounded-arity tree concatenation (embeds/common.py).'''

import jax.numpy as jnp
import numpy as np

import tscode_tpu.embeds.common as common
from tscode_tpu.embeds.common import ChunkAccumulator


def test_order_padding_and_fields():
    acc = ChunkAccumulator()
    rng = np.random.default_rng(0)
    want_a, want_b = [], []
    for k in range(23):          # odd count exercises tree remainders
        a = rng.normal(size=(4, 3, 2))
        b = rng.integers(0, 2, size=(4,)).astype(bool)
        n_valid = 4 if k % 3 else 2      # padded chunks trim to n_valid
        acc.add((jnp.asarray(a), jnp.asarray(b)), n_valid)
        want_a.append(a[:n_valid])
        want_b.append(b[:n_valid])
    acc.flush()
    assert len(acc.results) == 23
    for (ra, rb), wa, wb in zip(acc.results, want_a, want_b):
        np.testing.assert_array_equal(ra, wa)
        np.testing.assert_array_equal(rb, wb)


def test_multi_flush_preserves_results(monkeypatch):
    monkeypatch.setattr(common, '_ACCUM_FLUSH_BYTES', 1)  # flush per add
    acc = ChunkAccumulator()
    for k in range(5):
        acc.add((jnp.full((2, 2), k), jnp.asarray([k, -k])), 2)
    acc.flush()
    assert len(acc.results) == 5
    for k, (a, b) in enumerate(acc.results):
        assert np.all(np.asarray(a) == k)
        np.testing.assert_array_equal(b, [k, -k])


def test_flush_empty_is_noop():
    acc = ChunkAccumulator()
    acc.flush()
    assert acc.results == []


def test_masked_pull_gathers_survivors_in_order():
    from tscode_tpu.embeds.common import MaskedPullAccumulator
    acc = MaskedPullAccumulator()
    rng = np.random.default_rng(1)
    want_p, want_t, want_m = [], [], []
    for k in range(9):
        p = rng.normal(size=(6, 4, 3))
        t = rng.normal(size=(6, 5)).astype(np.float32)
        m = rng.random(6) < 0.4
        n_valid = 6 if k % 2 else 3        # padded chunks trim
        acc.add((jnp.asarray(p), jnp.asarray(t)), jnp.asarray(m), n_valid)
        want_p.append(p[:n_valid][m[:n_valid]])
        want_t.append(t[:n_valid][m[:n_valid]])
        want_m.append(m[:n_valid])
    (got_p, got_t), got_m = acc.finish()
    np.testing.assert_array_equal(got_m, np.concatenate(want_m))
    np.testing.assert_allclose(got_p, np.concatenate(want_p))
    np.testing.assert_allclose(got_t, np.concatenate(want_t))


def test_masked_pull_multi_compact(monkeypatch):
    monkeypatch.setattr(common, '_ACCUM_FLUSH_BYTES', 1)  # compact per add
    from tscode_tpu.embeds.common import MaskedPullAccumulator
    acc = MaskedPullAccumulator()
    for k in range(5):
        mask = np.asarray([True, k % 2 == 0])
        acc.add((jnp.full((2, 3), k),), jnp.asarray(mask), 2)
    (vals,), mask = acc.finish()
    assert mask.tolist() == [True, True, True, False, True,
                             True, True, False, True, True]
    assert np.all(vals[:, 0] == [0, 0, 1, 2, 2, 3, 4, 4])


def test_masked_pull_no_survivors():
    from tscode_tpu.embeds.common import MaskedPullAccumulator
    acc = MaskedPullAccumulator()
    acc.add((jnp.ones((3, 2, 3)),), jnp.zeros(3, dtype=bool), 3)
    (vals,), mask = acc.finish()
    assert not mask.any()
    assert vals.shape == (0, 2, 3)


def test_masked_pull_device_resident(monkeypatch):
    """pull=False keeps survivor fields on device through multi-part
    compaction; content and order must match the pulled path."""
    monkeypatch.setattr(common, '_ACCUM_FLUSH_BYTES', 1)  # compact per add
    from tscode_tpu.embeds.common import MaskedPullAccumulator
    rng = np.random.default_rng(7)
    acc_h = MaskedPullAccumulator()
    acc_d = MaskedPullAccumulator(pull=False)
    for k in range(6):
        p_ = rng.normal(size=(5, 3, 3))
        m = rng.random(5) < 0.5
        for a in (acc_h, acc_d):
            a.add((jnp.asarray(p_),), jnp.asarray(m), 4)
    (host,), mask_h = acc_h.finish()
    (dev,), mask_d = acc_d.finish()
    assert not isinstance(host, jnp.ndarray) or isinstance(host, np.ndarray)
    import jax
    assert isinstance(dev, jax.Array)
    np.testing.assert_array_equal(mask_h, mask_d)
    np.testing.assert_allclose(np.asarray(dev), host)

    # no-survivor edge stays shaped
    acc0 = MaskedPullAccumulator(pull=False)
    acc0.add((jnp.ones((3, 2, 3)),), jnp.zeros(3, dtype=bool), 3)
    (v0,), m0 = acc0.finish()
    assert not m0.any() and v0.shape == (0, 2, 3)


def test_survivor_accumulator_row_major_order():
    from tscode_tpu.embeds.common import SurvivorAccumulator
    acc = SurvivorAccumulator()
    rng = np.random.default_rng(2)
    want_s, want_k = [], []
    for k in range(4):
        poses = rng.normal(size=(5, 3, 4, 3))      # (rows, A, N, 3)
        keep = rng.random((5, 3)) < 0.5
        n_valid = 5 if k % 2 else 2
        acc.add(jnp.asarray(poses), jnp.asarray(keep), n_valid)
        pf = poses[:n_valid].reshape(-1, 4, 3)
        kf = keep[:n_valid].reshape(-1)
        want_s.append(pf[kf])
        want_k.append(keep[:n_valid])
    surv, keep = acc.finish(4)
    np.testing.assert_array_equal(keep, np.concatenate(want_k))
    np.testing.assert_allclose(surv, np.concatenate(want_s))
