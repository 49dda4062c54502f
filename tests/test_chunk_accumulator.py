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
