'''Sharding tests on the 8-device virtual CPU mesh.'''

import numpy as np
import jax
import jax.numpy as jnp

from tscode_tpu.ops.clash import cross_fragment_pair_mask
from tscode_tpu.parallel import make_mesh, sharded_screen_pipeline

rng = np.random.default_rng(31)



pytestmark = __import__("pytest").mark.mesh

def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_screen_matches_single_device():
    mesh = make_mesh()
    ids = (5, 6)
    n = sum(ids)
    B = 64                                     # divisible by 8
    poses = rng.normal(size=(B, n, 3)) * 3
    # plant near-duplicates to exercise the kill logic across shards
    poses[40] = poses[3] + 1e-4
    poses[41] = poses[3] + 2e-4
    pm = cross_fragment_pair_mask(ids)

    step = sharded_screen_pipeline(mesh, rmsd_thr=0.5, clash_thresh=1.5)
    keep, n_surv = step(jnp.asarray(poses), jnp.asarray(pm))
    keep = np.asarray(keep)
    assert int(n_surv) == keep.sum()

    # single-device oracle with the same one-shot kill rule
    from tests.oracles import rmsd_and_max, compenetration_check
    clash_ok = np.array([bool(compenetration_check(p, ids=np.array(ids)))
                         for p in poses])
    want = clash_ok.copy()
    for i in range(B):
        if not clash_ok[i]:
            continue
        for j in range(i + 1, B):
            if clash_ok[j]:
                r, md = rmsd_and_max(poses[i].copy(), poses[j].copy())
                # two-gate accept rule (reference rmsd_pruning.py:75-77)
                if r < 0.5 and md < 1.0:
                    want[i] = False
                    break
    np.testing.assert_array_equal(keep, want)
    # the planted duplicates must have been killed (they precede pose 3's
    # own index... rather: 3 dies because 40/41 are later duplicates)
    assert not keep[3]


def _clustered(n, seed, n_atoms=5):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(max(1, n // 12), n_atoms, 3)) * 3
    idx = rng.integers(0, len(base), size=n)
    out = base[idx] + rng.normal(size=(n, n_atoms, 3)) * 0.12
    return out.astype(np.float64)


def test_sharded_prune_matches_reference_semantics():
    # whole k-bucket schedule over the 8-device mesh == single-device
    # pruner (which is golden-tested against the sequential oracle)
    from tscode_tpu.ops.rmsd_prune import prune_conformers_rmsd_device
    from tscode_tpu.parallel.prune import sharded_prune_rmsd

    mesh = make_mesh()
    for n, seed in ((700, 3), (3000, 7)):
        hs = _clustered(n, seed)
        want = np.asarray(prune_conformers_rmsd_device(
            jnp.asarray(hs), rmsd_thr=0.5))
        got = sharded_prune_rmsd(hs, mesh, rmsd_thr=0.5)
        np.testing.assert_array_equal(got[:n], want[:n])
        assert 1 <= got[:n].sum() < n
