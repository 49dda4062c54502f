'''Pallas kernel tests (interpreter mode on the CPU backend; the
compiled path is exercised on real TPU hardware by bench/driver runs).'''

import numpy as np
import jax.numpy as jnp

import oracles
from tscode_tpu.ops.clash import cross_fragment_pair_mask
from tscode_tpu.ops.pallas.clash import compenetration_mask_pallas

rng = np.random.default_rng(3)


def test_pallas_clash_matches_oracle():
    ids = (7, 9)
    poses = rng.normal(size=(64, 16, 3)).astype(np.float32) * 2
    pm = cross_fragment_pair_mask(ids)
    got = np.asarray(compenetration_mask_pallas(
        jnp.asarray(poses), pm, interpret=True))
    want = np.array([oracles.compenetration_check(
        p.astype(float), ids=np.array(ids)) for p in poses], dtype=bool)
    np.testing.assert_array_equal(got, want)


def test_pallas_clash_max_clashes():
    ids = (5, 5)
    poses = rng.normal(size=(32, 10, 3)).astype(np.float32) * 1.5
    pm = cross_fragment_pair_mask(ids)
    for mc in (0, 3):
        got = np.asarray(compenetration_mask_pallas(
            jnp.asarray(poses), pm, max_clashes=mc, interpret=True))
        want = np.array([oracles.compenetration_check(
            p.astype(float), ids=np.array(ids), max_clashes=mc)
            for p in poses], dtype=bool)
        np.testing.assert_array_equal(got, want)
