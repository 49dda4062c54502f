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


def _clustered4(n, seed, n_clusters, noise=0.05, n_atoms=4):
    r = np.random.default_rng(seed)
    base = r.normal(size=(n_clusters, n_atoms, 3)) * 3
    idx = r.integers(0, n_clusters, size=n)
    return (base[idx]
            + r.normal(size=(n, n_atoms, 3)) * noise).astype(np.float64)


def _run_sharded(hs, mesh, rmsd_thr=0.5):
    '''Run the SPMD whole-schedule program directly (not the wrapper)
    so tests can assert on its `finished` bit.'''
    from tscode_tpu.parallel.prune import make_sharded_prune
    n = len(hs)
    n_dev = mesh.devices.size
    n_pool = max(8, 1 << max(0, (n - 1)).bit_length())
    n_pool = -(-n_pool // n_dev) * n_dev
    hs_pad = np.zeros((n_pool,) + hs.shape[1:], dtype=hs.dtype)
    hs_pad[:n] = hs
    alive = np.zeros(n_pool, dtype=bool)
    alive[:n] = True
    fn = make_sharded_prune(mesh, n=n, n_pool=n_pool)
    out, n_act, fin = fn(jnp.asarray(hs_pad), jnp.asarray(alive),
                         jnp.asarray(rmsd_thr, hs_pad.dtype))
    return np.asarray(out)[:n], int(n_act), bool(fin)


def _inplace_survivors(hs, rmsd_thr=0.5):
    '''Replicate the fused in-place stage alone (host loop) to measure
    the active count the mid tiers would see at entry.'''
    from tscode_tpu.ops import rmsd_prune as rp
    n = len(hs)
    dev = jnp.asarray(hs)
    alive = jnp.ones(n, bool)
    thr = jnp.asarray(rmsd_thr, dev.dtype)
    active = n
    for k in rp._inplace_ks(n):
        cs = n // k
        tr = n - (k - 1) * cs
        if 20 * k < active:
            alive = rp._inplace_body(
                dev, alive, thr, span_real=cs,
                span_pad=rp._pow2(cs, floor=8), n_chunks=k - 1,
                tail_real=tr, tail_pad=rp._pow2(tr, floor=8))
            active = int(jnp.sum(alive))
    return active


def test_sharded_prune_gathered_pass_fallback():
    '''Tiny pool on 8 chips: every in-place pass's chunk span exceeds
    the 16-row local slice, so the run_pass_gathered fallback (gather +
    redundant compute + slice) carries the whole in-place stage — must
    still be bit-identical to the single-device pruner.'''
    from tscode_tpu.ops.rmsd_prune import prune_conformers_rmsd_device
    mesh = make_mesh()
    n = 16 * mesh.devices.size            # s_local 16 < every span_pad
    hs = _clustered4(n, 13, 12, noise=0.08)
    want = np.asarray(prune_conformers_rmsd_device(
        jnp.asarray(hs), rmsd_thr=0.5))
    got, n_act, fin = _run_sharded(hs, mesh)
    assert fin
    np.testing.assert_array_equal(got, want)
    assert n_act == want.sum()


def test_sharded_prune_mid_tier_multigroup(monkeypatch):
    '''The banded mid tier runs SHARDED (live groups partitioned over
    the 8 chips, psum-combined kills) and completes the schedule —
    constants are shrunk so the 4096-row pool lands in the mid regime
    with ~8 live groups of one Gtile each, the exact multi-chip
    partition shape a wrong group bound would corrupt.'''
    from tscode_tpu.ops import rmsd_prune as rp
    from tscode_tpu.ops.rmsd_prune import prune_conformers_rmsd_device
    from tscode_tpu.parallel.prune import make_sharded_prune

    mesh = make_mesh()
    hs = _clustered4(4096, 5, 48)
    want = np.asarray(prune_conformers_rmsd_device(
        jnp.asarray(hs), rmsd_thr=0.5))      # strategy-independent mask

    monkeypatch.setattr(rp, '_FINISH_MAX', 256)
    monkeypatch.setattr(rp, '_MID_MAX', 2048)
    monkeypatch.setattr(rp, '_MID_PAIR_BUDGET', 1 << 15)   # Gtile = 128
    make_sharded_prune.cache_clear()
    try:
        # entry actives exceed the (patched) finish capacity, so the
        # banded mid tier MUST be what closes the schedule
        assert _inplace_survivors(hs) > 256
        got, n_act, fin = _run_sharded(hs, mesh)
        assert fin, 'sharded schedule should finish through the mid tier'
        np.testing.assert_array_equal(got, want)
        assert n_act == want.sum()
    finally:
        make_sharded_prune.cache_clear()


def test_sharded_prune_mid2_tier(monkeypatch):
    '''The wide-band mid2 tier (static branch for pools past
    16*_MID_MAX) runs sharded and hands off to the narrow mid tier +
    finish, identical to the single-device pruner.'''
    from tscode_tpu.ops import rmsd_prune as rp
    from tscode_tpu.ops.rmsd_prune import prune_conformers_rmsd_device
    from tscode_tpu.parallel.prune import make_sharded_prune

    mesh = make_mesh()
    hs = _clustered4(16384, 7, 32)
    want = np.asarray(prune_conformers_rmsd_device(
        jnp.asarray(hs), rmsd_thr=0.5))

    monkeypatch.setattr(rp, '_FINISH_MAX', 128)
    monkeypatch.setattr(rp, '_MID_MAX', 512)
    monkeypatch.setattr(rp, '_MID2_BAND', 256)
    monkeypatch.setattr(rp, '_MID_PAIR_BUDGET', 1 << 15)
    make_sharded_prune.cache_clear()
    try:
        assert _inplace_survivors(hs) > 512   # mid2 entry gate holds
        got, n_act, fin = _run_sharded(hs, mesh)
        assert fin
        np.testing.assert_array_equal(got, want)
    finally:
        make_sharded_prune.cache_clear()


def test_sharded_prune_unfinished_falls_back(monkeypatch):
    '''A pool whose banded passes CANNOT absorb the survivor set (run
    lengths past every band) must come back finished=False from the
    SPMD program, and sharded_prune_rmsd must still return the exact
    mask via the host fallback.'''
    from tscode_tpu.ops import rmsd_prune as rp
    from tscode_tpu.ops.rmsd_prune import prune_conformers_rmsd_device
    from tscode_tpu.parallel.prune import (make_sharded_prune,
                                           sharded_prune_rmsd)

    mesh = make_mesh()
    hs = _clustered4(4096, 11, 96)            # too many leaders: bands fail
    want = np.asarray(prune_conformers_rmsd_device(
        jnp.asarray(hs), rmsd_thr=0.5))

    monkeypatch.setattr(rp, '_FINISH_MAX', 256)
    monkeypatch.setattr(rp, '_MID_MAX', 2048)
    make_sharded_prune.cache_clear()
    try:
        _, _, fin = _run_sharded(hs, mesh)
        assert not fin, 'this pool is designed to overflow the bands'
        got = sharded_prune_rmsd(hs, mesh, rmsd_thr=0.5)
        np.testing.assert_array_equal(got, want)
    finally:
        make_sharded_prune.cache_clear()


def test_sharded_prune_mid_tier_real_constants():
    '''Production-constant mid-regime identity: a 49,152-pose pool with
    run-structured duplication (consecutive near-identical runs + a
    twin run a short distance later — the rotational-sweep shape) lands
    past _FINISH_MAX after the in-place passes, completes through the
    SHARDED banded mid tier, and matches the single-device pruner bit
    for bit.'''
    from tscode_tpu.ops.rmsd_prune import prune_conformers_rmsd_device
    from tscode_tpu.parallel.prune import make_sharded_prune

    r = np.random.default_rng(5)
    n, blk, twin_span, n_atoms = 49152, 8, 20, 4
    n_blocks = n // blk
    base_of = np.full(n_blocks, -1)
    bases = []
    for b in range(n_blocks):
        if base_of[b] >= 0:
            continue
        base_of[b] = len(bases)
        t = b + 1 + int(r.integers(1, twin_span))
        if t < n_blocks and base_of[t] < 0:
            base_of[t] = len(bases)
        bases.append(r.normal(size=(n_atoms, 3)) * 3)
    rows = np.repeat(np.asarray(bases)[base_of], blk, axis=0)
    hs = (rows + r.normal(size=(n, n_atoms, 3)) * 0.03).astype(np.float64)

    assert _inplace_survivors(hs) > 4096      # true mid-regime entry
    want = np.asarray(prune_conformers_rmsd_device(
        jnp.asarray(hs), rmsd_thr=0.5))
    mesh = make_mesh()
    got, n_act, fin = _run_sharded(hs, mesh)
    assert fin, 'mid tier should complete the schedule on the mesh'
    np.testing.assert_array_equal(got, want)
