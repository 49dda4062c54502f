'''Multi-chip integration: the PRODUCTION pipeline (Embedder.run)
sharded over the 8-device virtual mesh must produce bit-identical
ensembles to the single-device path.

TSCODE_MESH=1 forces every mesh-aware stage (string-embed chunks,
compenetration, TFD first-successor, MOI moments, RMSD whole-schedule
prune) through its shard_map variant regardless of ensemble size;
TSCODE_DISABLE_MESH=1 pins the single-device path. Both toggles are
read per call, so one process can compare them directly.'''

import os
import shutil

import numpy as np
import pytest

from tscode_tpu.embedder import Embedder
from tscode_tpu.io_xyz import read_xyz, write_xyz

FIX = os.path.join(os.path.dirname(__file__), 'fixtures')

pytestmark = pytest.mark.mesh


def _noisy_multi_conf(src, dst, n_confs, seed):
    '''Tile a single-conformer fixture into n_confs jittered frames.'''
    mol = read_xyz(src)
    base = mol.atomcoords[0]
    rng = np.random.default_rng(seed)
    with open(dst, 'w') as f:
        for i in range(n_confs):
            coords = base + rng.normal(size=base.shape) * 0.25
            write_xyz(coords, mol.atomnos, f, title=f'conf {i}')


def _run_pipeline(workdir, env_key):
    os.makedirs(workdir, exist_ok=True)
    _noisy_multi_conf(os.path.join(FIX, 'C2H4.xyz'),
                      os.path.join(workdir, 'm1.xyz'), 4, seed=7)
    _noisy_multi_conf(os.path.join(FIX, 'CH3Cl.xyz'),
                      os.path.join(workdir, 'm2.xyz'), 4, seed=11)
    inp = os.path.join(workdir, 'input.txt')
    with open(inp, 'w') as f:
        f.write('NOOPT\nm1.xyz 0\nm2.xyz 0\n')

    cwd = os.getcwd()
    old = {k: os.environ.pop(k, None)
           for k in ('TSCODE_MESH', 'TSCODE_DISABLE_MESH')}
    os.environ[env_key] = '1'
    try:
        emb = Embedder(inp, stamp=f'mesh_{env_key.lower()}')
        run = emb.run()
        return np.array(run.structures)
    finally:
        os.chdir(cwd)
        os.environ.pop(env_key, None)
        for k, v in old.items():
            if v is not None:
                os.environ[k] = v


def test_full_pipeline_mesh_identity(tmp_path):
    '''Embedder.run() end-to-end: 8-device sharded == single-device.'''
    single = _run_pipeline(str(tmp_path / 'single'),
                           'TSCODE_DISABLE_MESH')
    sharded = _run_pipeline(str(tmp_path / 'sharded'), 'TSCODE_MESH')
    assert len(single) > 1
    np.testing.assert_array_equal(single, sharded)


def test_multiembed_pipeline_mesh_identity(tmp_path):
    '''multiembed route: unlike string/cyclical, its RunEmbedding DOES
    run the compenetration_refining stage, so this covers the sharded
    compenetration path inside the production pipeline too.'''
    results = {}
    for env_key in ('TSCODE_DISABLE_MESH', 'TSCODE_MESH'):
        workdir = str(tmp_path / env_key.lower())
        os.makedirs(workdir)
        for name in ('HCOOH.xyz', 'C2H4.xyz'):
            shutil.copy(os.path.join(FIX, name), workdir)
        inp = os.path.join(workdir, 'input.txt')
        with open(inp, 'w') as f:
            f.write('NOOPT RIGID\nHCOOH.xyz 0 1 3\nC2H4.xyz 0 1\n')
        cwd = os.getcwd()
        old = {k: os.environ.pop(k, None)
               for k in ('TSCODE_MESH', 'TSCODE_DISABLE_MESH')}
        os.environ[env_key] = '1'
        try:
            emb = Embedder(inp, stamp=f'memb_{env_key[-4:].lower()}')
            run = emb.run()
            assert run.embed == 'multiembed'
            results[env_key] = np.array(run.structures)
        finally:
            os.chdir(cwd)
            os.environ.pop(env_key, None)
            for k, v in old.items():
                if v is not None:
                    os.environ[k] = v
    assert len(results['TSCODE_DISABLE_MESH']) > 0
    np.testing.assert_array_equal(results['TSCODE_DISABLE_MESH'],
                                  results['TSCODE_MESH'])


def _run_input_with_env(workdir, env_key, content, stamp,
                        files=('C2H4.xyz',)):
    os.makedirs(workdir, exist_ok=True)
    for name in files:
        shutil.copy(os.path.join(FIX, name), workdir)
    inp = os.path.join(workdir, 'input.txt')
    with open(inp, 'w') as f:
        f.write(content)
    cwd = os.getcwd()
    old = {k: os.environ.pop(k, None)
           for k in ('TSCODE_MESH', 'TSCODE_DISABLE_MESH')}
    os.environ[env_key] = '1'
    try:
        emb = Embedder(inp, stamp=stamp)
        run = emb.run()
        return np.array(run.structures)
    finally:
        os.chdir(cwd)
        os.environ.pop(env_key, None)
        for k, v in old.items():
            if v is not None:
                os.environ[k] = v


def test_cyclical_bimol_mesh_identity(tmp_path):
    '''Rigid bimolecular cyclical embed: the sharded block sweep must
    be bit-identical to the single-device chunk loop.'''
    content = 'NOOPT RIGID STEPS=6\nC2H4.xyz 0a 3b\nC2H4.xyz 0b 3a\n'
    single = _run_input_with_env(str(tmp_path / 'single'),
                                 'TSCODE_DISABLE_MESH', content, 'cycs')
    sharded = _run_input_with_env(str(tmp_path / 'sharded'),
                                  'TSCODE_MESH', content, 'cycm')
    assert len(single) > 0
    np.testing.assert_array_equal(single, sharded)


def test_cyclical_trimol_mesh_identity(tmp_path):
    content = ('BYPASS DIST(A=2.5,x=2,y=2.5,C=1) SHRINK ROTRANGE=10 '
               'STEPS=1\nCH3Cl.xyz 0A 4y\nHCOOH.xyz 1A 4x 0C 2C\n'
               'HCOOH.xyz 1x 4y\n')
    files = ('CH3Cl.xyz', 'HCOOH.xyz')
    single = _run_input_with_env(str(tmp_path / 'single'),
                                 'TSCODE_DISABLE_MESH', content, 'tris',
                                 files=files)
    sharded = _run_input_with_env(str(tmp_path / 'sharded'),
                                  'TSCODE_MESH', content, 'trim',
                                  files=files)
    assert len(single) > 0
    np.testing.assert_array_equal(single, sharded)


def test_csearch_mesh_identity(tmp_path):
    '''csearch> operator: the sharded torsion-rotation/back-off kernel
    and sharded TFD prune must leave the conformer ensemble
    bit-identical. Compares the csearch-replaced molecule ensembles.'''
    content = 'NOOPT\ncsearch> C2F2H4.xyz 3 5\n'
    results = {}
    for env_key in ('TSCODE_DISABLE_MESH', 'TSCODE_MESH'):
        workdir = str(tmp_path / env_key.lower())
        os.makedirs(workdir)
        shutil.copy(os.path.join(FIX, 'C2F2H4.xyz'), workdir)
        inp = os.path.join(workdir, 'input.txt')
        with open(inp, 'w') as f:
            f.write(content)
        cwd = os.getcwd()
        old = {k: os.environ.pop(k, None)
               for k in ('TSCODE_MESH', 'TSCODE_DISABLE_MESH')}
        os.environ[env_key] = '1'
        try:
            emb = Embedder(inp, stamp=f'cs_{env_key[-4:].lower()}')
            run = emb.run()
            results[env_key] = np.array(run.objects[0].atomcoords)
        finally:
            os.chdir(cwd)
            os.environ.pop(env_key, None)
            for k, v in old.items():
                if v is not None:
                    os.environ[k] = v
    assert len(results['TSCODE_DISABLE_MESH']) >= 2
    np.testing.assert_array_equal(results['TSCODE_DISABLE_MESH'],
                                  results['TSCODE_MESH'])


def test_sharded_compenetration_matches():
    import jax
    from tscode_tpu.ops.clash import (compenetration_mask,
                                      cross_fragment_pair_mask)
    from tscode_tpu.parallel.sharding import (get_default_mesh,
                                              sharded_compenetration_mask)
    mesh = get_default_mesh()
    assert mesh is not None and mesh.devices.size == 8

    rng = np.random.default_rng(0)
    poses = rng.normal(size=(37, 9, 3)) * 2.5     # deliberately non-mult-of-8
    pm = cross_fragment_pair_mask((4, 5))
    ref = np.asarray(compenetration_mask(poses, pm, thresh=1.5))
    got = sharded_compenetration_mask(poses, pm, mesh, thresh=1.5)
    np.testing.assert_array_equal(ref, got)


def test_sharded_tfd_first_successor_matches():
    from tscode_tpu.ops.tfd import _first_similar_successor
    from tscode_tpu.parallel.sharding import (
        get_default_mesh, sharded_first_similar_successor)
    mesh = get_default_mesh()

    rng = np.random.default_rng(1)
    base = rng.uniform(-180, 180, size=(5, 6)).astype(np.float32)
    tf = base[rng.integers(0, 5, size=43)] \
        + rng.normal(size=(43, 6)).astype(np.float32) * 2
    ref = _first_similar_successor(tf, 10.0)
    got = sharded_first_similar_successor(tf, 10.0, mesh)
    np.testing.assert_array_equal(ref, got)


def test_sharded_moi_prune_matches():
    from tscode_tpu.ops.moi import prune_by_moment_of_inertia
    from tscode_tpu.parallel.sharding import get_default_mesh
    mesh = get_default_mesh()

    rng = np.random.default_rng(2)
    base = rng.normal(size=(6, 8, 3)) * 2
    structures = base[rng.integers(0, 6, size=30)] \
        + rng.normal(size=(30, 8, 3)) * 0.01
    atomnos = np.array([6, 6, 8, 1, 1, 7, 6, 17])
    _, ref = prune_by_moment_of_inertia(structures, atomnos)
    _, got = prune_by_moment_of_inertia(structures, atomnos, mesh=mesh)
    np.testing.assert_array_equal(ref, got)


def test_sharded_rmsd_prune_via_op_matches():
    from tscode_tpu.ops.rmsd_prune import prune_conformers_rmsd
    from tscode_tpu.parallel.sharding import get_default_mesh
    mesh = get_default_mesh()

    rng = np.random.default_rng(3)
    base = rng.normal(size=(8, 6, 3)) * 3
    structures = base[rng.integers(0, 8, size=64)] \
        + rng.normal(size=(64, 6, 3)) * 0.05
    atomnos = np.array([6, 6, 8, 7, 6, 17])
    _, ref = prune_conformers_rmsd(structures, atomnos, rmsd_thr=0.5)
    _, got = prune_conformers_rmsd(structures, atomnos, rmsd_thr=0.5,
                                   mesh=mesh)
    np.testing.assert_array_equal(ref, got)


def test_sharded_fire_matches_single_device():
    '''Batched FIRE relaxation sharded over structures: per-structure
    state means bit-identical trajectories, including the non-multiple
    batch padding.'''
    import jax.numpy as jnp
    from tscode_tpu.optimizers import (fire_minimize_batch,
                                       fire_minimize_batch_sharded)
    from tscode_tpu.parallel.sharding import get_default_mesh

    def energy(c, center):
        return jnp.sum((c - center) ** 2, axis=(-2, -1))

    rng = np.random.default_rng(5)
    coords = rng.normal(size=(19, 6, 3))       # non-multiple of 8
    center = jnp.asarray(rng.normal(size=(6, 3)))

    ref_c, ref_e, ref_done = fire_minimize_batch(
        jnp.asarray(coords), energy, n_steps=120, energy_args=(center,))
    got_c, got_e, got_done = fire_minimize_batch_sharded(
        coords, energy, get_default_mesh(), n_steps=120,
        energy_args=(center,))
    np.testing.assert_array_equal(np.asarray(ref_c), np.asarray(got_c))
    np.testing.assert_array_equal(np.asarray(ref_e), np.asarray(got_e))
    np.testing.assert_array_equal(np.asarray(ref_done),
                                  np.asarray(got_done))
