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


def test_pallas_qcp_kill_blocks_matches_xla_path():
    from tscode_tpu.ops.pallas.qcp import qcp_kill_blocks_pallas
    from tscode_tpu.ops.rmsd_prune import _gathered_kill_blocks

    B, L, N = 4, 32, 8
    blocks = rng.normal(size=(B, L, N, 3)).astype(np.float32) * 2
    blocks[0, 10] = blocks[0, 3] + 1e-3        # planted duplicates
    blocks[2, 20] = blocks[2, 5] + 1e-3
    blocks[2, 25] = blocks[2, 5] + 2e-3
    m_real = np.array([32, 20, 32, 5], dtype=np.int32)

    got = np.asarray(qcp_kill_blocks_pallas(
        jnp.asarray(blocks), jnp.asarray(m_real), 0.5, interpret=True))

    pool = blocks.reshape(-1, N, 3)
    idx = np.arange(B * L, dtype=np.int32).reshape(B, L)
    want = np.asarray(_gathered_kill_blocks(
        jnp.asarray(pool), jnp.asarray(idx), jnp.asarray(m_real),
        jnp.asarray(0.5, jnp.float32)))
    np.testing.assert_array_equal(got, want)
    # p dies when a LATER q matches: kills p=3 (block 0) and p=5, p=20
    # (block 2, both have later twins) — exactly 3
    assert got.sum() == 3


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


def test_clash_ok_traced_matches_xla_and_pads():
    '''The jit-fusable Pallas clash (production screen path): traced
    threshold, internal padding to the pose block, identical accept
    mask to the XLA matmul form.'''
    from tscode_tpu.ops.clash import compenetration_mask, static_pairs
    from tscode_tpu.ops.pallas.clash import clash_ok_traced

    ids = (5, 6)
    poses = rng.normal(size=(137, 11, 3)).astype(np.float32) * 2.2
    pm = cross_fragment_pair_mask(ids)
    want = np.asarray(compenetration_mask(jnp.asarray(poses),
                                          jnp.asarray(pm), thresh=1.5))
    got = np.asarray(clash_ok_traced(jnp.asarray(poses), static_pairs(pm),
                                     jnp.asarray(1.5)))
    np.testing.assert_array_equal(got, want)


def test_string_embed_pallas_path_identical(tmp_path, monkeypatch):
    '''string_embed with TSCODE_USE_PALLAS_CLASH=1 (interpret mode on
    CPU) produces the identical ensemble to the XLA screen.'''
    import os

    from tscode_tpu.embeds.string import string_embed
    from tscode_tpu.molecule import Molecule

    fix = os.path.join(os.path.dirname(__file__), 'fixtures')
    results = {}
    for flag in ('0', '1'):
        monkeypatch.setenv('TSCODE_USE_PALLAS_CLASH', flag)
        mols = []
        for name in ('C2H4.xyz', 'CH3Cl.xyz'):
            m = Molecule(os.path.join(fix, name), reactive_indices=[0])
            m.compute_orbitals()
            mols.append(m)
        poses, constrained = string_embed(
            mols[0], mols[1], np.linspace(0.0, 350.0, 36),
            log=lambda *a, **k: None)
        results[flag] = poses
    assert len(results['0']) > 0
    np.testing.assert_array_equal(results['0'], results['1'])
