'''Embed-generator golden tests: device sweeps vs sequential numpy oracles
replicating the reference loops (embeds.py:36-133, 734-860).'''

import os

import numpy as np
import pytest

import oracles
from tscode_tpu.embeds.string import string_embed
from tscode_tpu.embeds.cyclical import cyclical_embed_bimol_rigid
from tscode_tpu.graphs import get_quadruplets, get_sum_graph
from tscode_tpu.molecule import Molecule
from tscode_tpu.ops.linalg import cartesian_product, polygonize
from tscode_tpu.pivots import set_pivots

FIX = os.path.join(os.path.dirname(__file__), 'fixtures')


def fix(name):
    return os.path.join(FIX, name)


# ------------------------------------------------------------------ string

def _string_oracle(mol1, mol2, angles, clash_thresh=1.5, tfd_thresh=10):
    '''Sequential replication of reference string_embed (embeds.py:36-133).'''
    ids = np.array([mol1.n_atoms, mol2.n_atoms])
    r1 = int(mol1.reactive_indices[0])
    r2 = int(mol2.reactive_indices[0]) + int(ids[0])
    quads = get_quadruplets(get_sum_graph((mol1.graph, mol2.graph), [[r1, r2]]))

    conf_idx = cartesian_product(np.arange(mol1.n_confs), np.arange(mol2.n_confs))
    k1 = len(mol1.get_r_atoms(0)[0].center)
    k2 = len(mol2.get_r_atoms(0)[0].center)
    lobe_idx = cartesian_product(np.arange(k1), np.arange(k2))

    lru = []
    poses = []
    for c1, c2 in conf_idx:
        for ai1, ai2 in lobe_idx:
            for angle in angles:
                ra1 = mol1.get_r_atoms(c1)[0]
                ra2 = mol2.get_r_atoms(c2)[0]
                p1, p2 = ra1.center[ai1], ra2.center[ai2]
                ref_vec, mol_vec = ra1.orb_vecs[ai1], ra2.orb_vecs[ai2]

                rot = oracles.rotation_matrix_from_vectors(mol_vec, -ref_vec)
                if angle != 0:
                    rot = oracles.rot_mat_from_pointer(ref_vec, angle) @ rot
                pos = p1 - rot @ p2
                pose = np.concatenate([
                    mol1.atomcoords[c1],
                    (rot @ mol2.atomcoords[c2].T).T + pos])

                if oracles.compenetration_check(pose, ids=ids,
                                                thresh=clash_thresh):
                    tfp = oracles.get_torsion_fingerprint(pose, quads)
                    if not any(oracles.tfd_similarity(tfp, ref, tfd_thresh)
                               for ref in lru):
                        lru.append(tfp)
                        poses.append(pose)
    return np.array(poses)


def test_string_embed_vs_oracle():
    mol1 = Molecule(fix('C2H4.xyz'), reactive_indices=[0])
    mol2 = Molecule(fix('CH3Cl.xyz'), reactive_indices=[0])
    mol1.compute_orbitals()
    mol2.compute_orbitals()

    angles = [n * 360 / 12 for n in range(12)]
    got, cons = string_embed(mol1, mol2, angles, log=lambda *a, **k: None)
    want = _string_oracle(mol1, mol2, angles)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)
    # constrained indices: [r1, r2 + n1] for every pose
    assert cons.shape == (len(got), 1, 2)
    assert cons[0].tolist() == [[0, 6]]


def test_string_embed_zero_candidates():
    from tscode_tpu.errors import ZeroCandidatesError
    mol1 = Molecule(fix('C2H4.xyz'), reactive_indices=[0])
    mol2 = Molecule(fix('CH3Cl.xyz'), reactive_indices=[0])
    mol1.compute_orbitals()
    mol2.compute_orbitals()
    # an absurd clash threshold kills every pose
    with pytest.raises(ZeroCandidatesError):
        string_embed(mol1, mol2, [0.0], clash_thresh=100.0,
                     log=lambda *a, **k: None)


# ---------------------------------------------------------------- cyclical

def _cyclical_oracle(mol1, mol2, systematic_angles, clash_thresh=1.5,
                     max_norm_delta=10):
    '''Sequential replication of _fast_bimol_rigid_cyclical_embed
    (embeds.py:734-860).'''
    mols = (mol1, mol2)
    ids = np.array([mol1.n_atoms, mol2.n_atoms])
    offsets = (0, mol1.n_atoms)
    directions = np.array([[0., 1., 0.], [0., -1., 0.]])

    conf_idx = cartesian_product(*[np.arange(m.n_confs) for m in mols])
    poses, all_ids = [], []

    for conf_ids in conf_idx:
        piv_idx = cartesian_product(*[np.arange(len(m.pivots[conf_ids[i]]))
                                      for i, m in enumerate(mols)])
        for pi in piv_idx:
            pivots = [mols[m].pivots[conf_ids[m]][pi[m]] for m in range(2)]
            norms = np.array([np.linalg.norm(p.pivot) for p in pivots])
            if abs(norms[0] - norms[1]) > max_norm_delta:
                continue
            polygon_vectors = polygonize(norms)

            for v, vecs in enumerate(polygon_vectors):
                swaps = [(0, 0), (0, 1)]
                cums = []
                for m, p in enumerate(pivots):
                    pair = [p.start_atom.index + offsets[m],
                            p.end_atom.index + offsets[m]]
                    if swaps[v][m]:
                        pair = list(reversed(pair))
                    cums.append(pair)
                arr_ids = [[cums[0][0], cums[1][0]], [cums[0][1], cums[1][1]]]

                angular_poses = []
                for angles in systematic_angles:
                    rots, positions = [], []
                    for i in range(2):
                        start, end = vecs[i]
                        angle = angles[i]
                        rc = mols[i].atomcoords[conf_ids[i]][mols[i].reactive_indices]
                        apm = rc.mean(axis=0)
                        md = pivots[i].meanpoint - apm
                        if np.all(md == 0.):
                            md = pivots[i].meanpoint
                        ra = oracles.align_vec_pair(
                            np.array([end - start, directions[i]]),
                            np.array([pivots[i].pivot, md]))
                        if len(rc) == 2:
                            axis = ra @ (rc[0] - rc[1])
                        else:
                            axis = ra @ pivots[i].pivot
                        rs = oracles.rot_mat_from_pointer(axis, angle)
                        cor = ra @ apm
                        rot = rs @ ra
                        pos = (cor - rs @ cor
                               + (np.mean(vecs[i], axis=0) - ra @ pivots[i].meanpoint))
                        rots.append(rot)
                        positions.append(pos)

                    pose = np.concatenate([
                        (rots[m] @ mols[m].atomcoords[conf_ids[m]].T).T
                        + positions[m] for m in range(2)])

                    if oracles.compenetration_check(pose, ids=ids,
                                                    thresh=clash_thresh):
                        similar = False
                        for ap in angular_poses:
                            r, md_ = oracles.rmsd_and_max(pose.copy(), ap.copy())
                            if r < 1.0 and md_ < 2.0:
                                similar = True
                                break
                        if not similar:
                            poses.append(pose)
                            angular_poses.append(pose)
                            all_ids.append(arr_ids)

    return np.array(poses), np.array(all_ids)


def _angle_grid(steps, rot_range, n_mols=2):
    grid = cartesian_product(*[np.arange(steps + 1) for _ in range(n_mols)])
    return grid * 2 * rot_range / steps - rot_range


def test_cyclical_embed_vs_oracle():
    # pseudo-Diels-Alder: two ethylenes, both carbons reactive on each
    mol1 = Molecule(fix('C2H4.xyz'), reactive_indices=[0, 3])
    mol2 = Molecule(fix('C2H4.xyz'), reactive_indices=[0, 3])
    for m in (mol1, mol2):
        m.compute_orbitals()
        set_pivots(m)

    assert len(mol1.pivots[0]) == 4       # 2 lobes x 2 lobes

    angles = _angle_grid(2, 45)           # 9 angle pairs for test speed
    got, got_ids = cyclical_embed_bimol_rigid(
        mol1, mol2, angles, log=lambda *a, **k: None)
    want, want_ids = _cyclical_oracle(mol1, mol2, angles)

    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=5e-6)
    np.testing.assert_array_equal(got_ids, want_ids)


# ------------------------------------------------------------- trimolecular

def _trimol_oracle(mols, systematic_angles, clash_thresh=1.5):
    '''Sequential replication of the reference's rigid trimolecular
    cyclical embed (embeds.py:453-732) incl. _get_directions and
    _adjust_directions (:244-451).'''
    from tscode_tpu.embeds.cyclical import _get_directions
    offsets = (0, mols[0].n_atoms, mols[0].n_atoms + mols[1].n_atoms)
    ids = np.array([m.n_atoms for m in mols])

    def adjust(directions, constrained, triangle_vectors, pivots, conf_ids,
               norms):
        p_vecs = [end - start for start, end in triangle_vectors]
        p_means = [(end + start) / 2 for start, end in triangle_vectors]

        verts = np.zeros((3, 2))
        verts[1] = [norms[0], 0]
        a, b, c = norms[0] ** 2, norms[1] ** 2, norms[2] ** 2
        x = (a - b + c) / (2 * a ** 0.5)
        verts[2] = [x, (c - x ** 2) ** 0.5]
        v0, v1, v2 = [np.concatenate([v, [0.]]) for v in verts]

        rots, poss = [], []
        for i in range(3):
            start, end = triangle_vectors[i]
            rc = mols[i].atomcoords[conf_ids[i]][mols[i].reactive_indices]
            md = pivots[i].meanpoint - rc.mean(axis=0)
            if np.all(md == 0.):
                md = pivots[i].meanpoint
            Ra = oracles.align_vec_pair(
                np.array([end - start, directions[i]]),
                np.array([pivots[i].pivot, md]))
            rots.append(Ra)
            poss.append((start + end) / 2 - Ra @ pivots[i].meanpoint)

        r = np.zeros((3, 3), dtype=int)
        for pair in constrained:
            sides = []
            for cum in pair:
                m = 2 if cum >= offsets[2] else (1 if cum >= offsets[1] else 0)
                sides.append((m, cum - offsets[m]))
            (m1, i1), (m2, i2) = sides
            r[m1, m2] = i1
            r[m2, m1] = i2

        a01 = rots[0] @ mols[0].atomcoords[0][r[0, 1]] + poss[0]
        a02 = rots[0] @ mols[0].atomcoords[0][r[0, 2]] + poss[0]
        a10 = rots[1] @ mols[1].atomcoords[0][r[1, 0]] + poss[1]
        a12 = rots[1] @ mols[1].atomcoords[0][r[1, 2]] + poss[1]
        a20 = rots[2] @ mols[2].atomcoords[0][r[2, 0]] + poss[2]
        a21 = rots[2] @ mols[2].atomcoords[0][r[2, 1]] + poss[2]

        def vec_angle(u, w):
            cosv = np.clip(u @ w / np.linalg.norm(u) / np.linalg.norm(w),
                           -1, 1)
            return np.degrees(np.arccos(cosv))

        steps, arange_ = 6, 30
        grid = cartesian_product(*[np.arange(steps + 1)] * 3) \
            * (2 * arange_ / steps) - arange_
        best = None
        for angles in grid:
            r0 = oracles.rot_mat_from_pointer(p_vecs[0], angles[0])
            na01, na02 = r0 @ a01, r0 @ a02
            d0 = p_means[0] - (na01 + na02) / 2
            r1_ = oracles.rot_mat_from_pointer(p_vecs[1], angles[1])
            na10, na12 = r1_ @ a10, r1_ @ a12
            d1 = p_means[1] - (na10 + na12) / 2
            r2_ = oracles.rot_mat_from_pointer(p_vecs[2], angles[2])
            na20, na21 = r2_ @ a20, r2_ @ a21
            d2 = p_means[2] - (na20 + na21) / 2
            cost = (vec_angle(v0 - na02, na20 - v0)
                    + vec_angle(v1 - na01, na10 - v1)
                    + vec_angle(v2 - na21, na12 - v2))
            if best is None or cost < best[0]:
                best = (cost, np.array([d0, d1, d2]))
        return best[1]

    conf_idx = cartesian_product(*[np.arange(m.n_confs) for m in mols])
    poses, all_ids = [], []
    for conf_ids in conf_idx:
        piv_idx = cartesian_product(*[np.arange(len(m.pivots[conf_ids[i]]))
                                      for i, m in enumerate(mols)])
        for pi in piv_idx:
            pivots = [mols[m].pivots[conf_ids[m]][pi[m]] for m in range(3)]
            norms = np.array([np.linalg.norm(p.pivot) for p in pivots])
            if not all(norms[i] < norms[i - 1] + norms[i - 2]
                       for i in (0, 1, 2)):
                continue
            polygon_vectors = polygonize(norms)
            directions = _get_directions(norms)
            # the reference REBINDS directions inside the orientation
            # loop (embeds.py:633,652): each orientation's adjustment
            # chains from the previous orientation's result

            for v, vecs in enumerate(polygon_vectors):
                swaps = [(0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1),
                         (1, 0, 0), (1, 1, 0), (1, 0, 1), (1, 1, 1)]
                cums = []
                for m, p in enumerate(pivots):
                    pair = [p.start_atom.index + offsets[m],
                            p.end_atom.index + offsets[m]]
                    if swaps[v][m]:
                        pair = list(reversed(pair))
                    cums.append(pair)
                arr_ids = [sorted([cums[0][1], cums[1][0]]),
                           sorted([cums[1][1], cums[2][0]]),
                           sorted([cums[2][1], cums[0][0]])]

                directions = adjust(directions, arr_ids, vecs, pivots,
                                    conf_ids, norms)

                angular_poses = []
                for angles in systematic_angles:
                    rots, positions = [], []
                    for i in range(3):
                        start, end = vecs[i]
                        rc = mols[i].atomcoords[conf_ids[i]][mols[i].reactive_indices]
                        apm = rc.mean(axis=0)
                        md = pivots[i].meanpoint - apm
                        if np.all(md == 0.):
                            md = pivots[i].meanpoint
                        ra = oracles.align_vec_pair(
                            np.array([end - start, directions[i]]),
                            np.array([pivots[i].pivot, md]))
                        axis = ra @ (rc[0] - rc[1]) if len(rc) == 2 \
                            else ra @ pivots[i].pivot
                        rs = oracles.rot_mat_from_pointer(axis, angles[i])
                        cor = ra @ apm
                        rots.append(rs @ ra)
                        positions.append(cor - rs @ cor
                                         + ((start + end) / 2
                                            - ra @ pivots[i].meanpoint))

                    pose = np.concatenate([
                        (rots[m] @ mols[m].atomcoords[conf_ids[m]].T).T
                        + positions[m] for m in range(3)])

                    if oracles.compenetration_check(pose, ids=ids,
                                                    thresh=clash_thresh):
                        similar = False
                        for ap in angular_poses:
                            r_, md_ = oracles.rmsd_and_max(pose.copy(),
                                                           ap.copy())
                            if r_ < 1.0 and md_ < 2.0:
                                similar = True
                                break
                        if not similar:
                            poses.append(pose)
                            angular_poses.append(pose)
                            all_ids.append(arr_ids)
    return np.array(poses), np.array(all_ids)


def test_cyclical_trimol_vs_oracle():
    from tscode_tpu.embeds.cyclical import cyclical_embed_trimol_rigid
    g = np.random.default_rng(17)
    mols = []
    for _ in range(3):
        m = Molecule(fix('C2H4.xyz'), reactive_indices=[0, 3])
        # perturb: three identical symmetric molecules produce EXACT cost
        # ties in the direction-adjustment grid, making the winner
        # implementation-defined; generic geometry restores determinism
        m.atomcoords = m.atomcoords + g.normal(size=m.atomcoords.shape) * 0.02
        m.compute_orbitals()
        m.scale_orbs(2.5)          # enlarge the triangle so poses fit
        set_pivots(m, suprafacial=True)
        mols.append(m)
    assert len(mols[0].pivots[0]) == 2

    angles = _angle_grid(1, 45, n_mols=3)      # 8 angle triples
    got, got_ids = cyclical_embed_trimol_rigid(
        mols, angles, log=lambda *a, **k: None)
    want, want_ids = _trimol_oracle(mols, angles)

    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_array_equal(got_ids, want_ids)


def test_cyclical_suprafacial_filter():
    mol = Molecule(fix('C2H4.xyz'), reactive_indices=[0, 3])
    mol.compute_orbitals()
    set_pivots(mol, suprafacial=True)
    assert len(mol.pivots[0]) == 2
    norms = sorted(np.linalg.norm(p.pivot) for p in mol.pivots[0])
    all_norms = sorted(np.linalg.norm(p.pivot)
                       for p in __import__('tscode_tpu.pivots',
                                           fromlist=['get_pivots']).get_pivots(mol)[0])
    assert norms == all_norms[:2]


def test_bend_gate_single_reactive_atom_can_bend():
    '''Regression: the trimolecular impossible-triangle bend gate must
    NOT crash on (and must not skip) a single-reactive-atom molecule —
    the reference's edge test passes trivially there (embeds.py:526-528)
    and the molecule gets bent.'''
    import networkx as nx

    from tscode_tpu.embeds.cyclical import _bend_blocked_by_bonded_pair

    class M:
        pass

    g = nx.Graph()
    g.add_edges_from([(0, 1), (1, 2), (2, 3)])

    single = M()
    single.graph = g
    single.reactive_indices = [2]
    assert not _bend_blocked_by_bonded_pair(single)   # used to TypeError

    bonded = M()
    bonded.graph = g
    bonded.reactive_indices = [1, 2]
    assert _bend_blocked_by_bonded_pair(bonded)

    unbonded = M()
    unbonded.graph = g
    unbonded.reactive_indices = [0, 3]
    assert not _bend_blocked_by_bonded_pair(unbonded)


def test_greedy_keep_device_matches_host_oracle():
    '''The fused device greedy angular dedup (lax.scan inside the block
    screen) must reproduce the host reference scan bit for bit —
    including blocks where every angle clashes and chains of mutual
    similarity where greedy order matters.'''
    from tscode_tpu.embeds.cyclical import (_greedy_angular_keep,
                                            _greedy_keep_device)

    rng = np.random.default_rng(3)
    for trial in range(5):
        B, A = 7, 12
        clash_ok = rng.random((B, A)) < 0.7
        similar = rng.random((B, A, A)) < 0.3
        similar |= similar.transpose(0, 2, 1)          # symmetric
        for a in range(A):
            similar[:, a, a] = True
        got = np.asarray(_greedy_keep_device(clash_ok, similar))
        want = _greedy_angular_keep(clash_ok, similar)
        assert (got == want).all(), f'trial {trial}'


def test_fused_sweep_matches_chunk_loop(monkeypatch):
    '''The single-dispatch lax.map sweep (_block_screen_mapped) must be
    bit-identical to the per-chunk host loop it replaces — including
    row padding/trimming at non-pow2 row counts and multi-tile maps.'''
    from tscode_tpu.embeds.cyclical import cyclical_embed_bimol_rigid

    mol1 = Molecule(fix('C2H4.xyz'), reactive_indices=[0, 3])
    mol2 = Molecule(fix('C2H4.xyz'), reactive_indices=[0, 3])
    for m in (mol1, mol2):
        m.compute_orbitals()
        set_pivots(m)
    angles = _angle_grid(2, 45)

    outs = {}
    for flag in ('0', '1'):
        monkeypatch.setenv('TSCODE_FUSED_SWEEP', flag)
        # block_chunk=2 forces several tiles through the map (and
        # several chunks through the loop) even at test size
        outs[flag] = cyclical_embed_bimol_rigid(
            mol1, mol2, angles, log=lambda *a, **k: None, block_chunk=2)

    np.testing.assert_array_equal(outs['0'][0], outs['1'][0])
    np.testing.assert_array_equal(outs['0'][1], outs['1'][1])


def test_pair_gate_matrices_match_oracles():
    '''The fused rmsd+maxdev pair-gate (_pair_gate_matrices, one QCP
    correlation pass) must match the independent per-pair oracle path
    (_rmsd_matrix_lambda_only + _pairwise_maxdev) on CPU x64.'''
    import jax
    import jax.numpy as jnp

    from tscode_tpu.embeds.cyclical import _pairwise_maxdev
    from tscode_tpu.ops.rmsd_prune import (_pair_gate_matrices,
                                           _rmsd_matrix_lambda_only)

    rng = np.random.default_rng(11)
    pb = jnp.asarray(rng.normal(size=(3, 7, 9, 3)) * 2.0)
    n_atoms = pb.shape[2]
    rmsd, maxdev = jax.vmap(
        lambda P: _pair_gate_matrices(P, n_atoms))(pb)
    rmsd_o = jax.vmap(
        lambda P: _rmsd_matrix_lambda_only(P, P, n_atoms))(pb)
    maxdev_o = _pairwise_maxdev(pb)
    # identical-pose diagonals sit on the 2G - 2*lam cancellation,
    # which the two S-einsum layouts round differently at ~1e-7
    np.testing.assert_allclose(np.asarray(rmsd), np.asarray(rmsd_o),
                               rtol=0, atol=5e-7)
    np.testing.assert_allclose(np.asarray(maxdev), np.asarray(maxdev_o),
                               rtol=0, atol=5e-7)


def test_compact_sweep_matches_expanded(monkeypatch):
    '''The compact table-gather sweep (_block_screen_mapped_compact —
    per-row geometry rebuilt on device from (conf, pivot) tables) must
    be bit-identical to the expanded-field sweep on CPU x64, including
    padded non-pow2 row tails and multi-tile maps.'''
    from tscode_tpu.embeds.cyclical import cyclical_embed_bimol_rigid

    mol1 = Molecule(fix('C2H4.xyz'), reactive_indices=[0, 3])
    mol2 = Molecule(fix('HCOOH.xyz'), reactive_indices=[0, 1])
    for m in (mol1, mol2):
        m.compute_orbitals()
        set_pivots(m)
    angles = _angle_grid(2, 45)

    outs = {}
    for flag in ('0', '1'):
        monkeypatch.setenv('TSCODE_COMPACT_SWEEP', flag)
        outs[flag] = cyclical_embed_bimol_rigid(
            mol1, mol2, angles, log=lambda *a, **k: None, block_chunk=2)

    np.testing.assert_array_equal(outs['0'][0], outs['1'][0])
    np.testing.assert_array_equal(outs['0'][1], outs['1'][1])


def test_concat_blocks_offsets_compact_tables(tmp_path):
    '''_concat_blocks must keep the union sweep's gathered geometry
    identical to each block's own (table indices offset per block).'''
    from tscode_tpu.embeds.cyclical import (_bimol_rigid_blocks,
                                            _concat_blocks)

    mol1 = _noisy_molecule(str(tmp_path), 'C2H4.xyz', 2, [0, 3], seed=7)
    mol2 = _noisy_molecule(str(tmp_path), 'HCOOH.xyz', 2, [0, 1], seed=8)
    mol3 = _noisy_molecule(str(tmp_path), 'HCOOH.xyz', 2, [1, 2], seed=8)

    blks = [_bimol_rigid_blocks(mol1, mol2, 10, None),
            _bimol_rigid_blocks(mol1, mol3, 10, None)]
    cat = _concat_blocks(blks)
    assert len(cat['tidx']) == sum(len(b['tidx']) for b in blks)
    r1 = cat['tab1'][cat['tidx'][:, 0]]
    r2 = cat['tab2'][cat['tidx'][:, 1]]
    np.testing.assert_array_equal(r1[:, 0], cat['pvs'][:, 0])
    np.testing.assert_array_equal(r2[:, 0], cat['pvs'][:, 1])
    np.testing.assert_array_equal(r1[:, 4], cat['rc_axes'][:, 0])
    np.testing.assert_array_equal(r2[:, 4], cat['rc_axes'][:, 1])


def test_string_fused_sweep_matches_chunk_loop(tmp_path, monkeypatch):
    '''CONTRACT: the broadcast (gather-free) c2-tiled sweep agrees with
    the host-indexed gather chunk loop to ~1e-12 (f64) — NOT bitwise:
    the broadcast form contracts the same rotations in a different
    fusion order, which differs by ulps even in f64 (BASELINE.md
    round-3 final act). Survivor SETS must be identical. Multi-
    conformer molecules + a shrunk tile cap force several c2 tiles and
    a padded tail tile through the broadcast path.'''
    mol1 = _noisy_molecule(str(tmp_path), 'C2H4.xyz', 3, [0], seed=5)
    mol2 = _noisy_molecule(str(tmp_path), 'CH3Cl.xyz', 5, [0], seed=6)
    angles = np.linspace(0.0, 350.0, 36)

    import tscode_tpu.embeds.string as string_mod
    # stride = k2*k1*A*n1c; cap of 3*stride//2 -> c2_per_tile=1 and a
    # 5-tile map (padded path exercised via slab rounding below)
    k1 = len(mol1.get_r_atoms(0)[0].center)
    k2 = len(mol2.get_r_atoms(0)[0].center)
    stride = mol1.n_confs * k2 * k1 * len(angles)
    monkeypatch.setattr(string_mod, '_SWEEP_TILE_CAP', stride)

    outs = {}
    for flag in ('0', '1'):
        monkeypatch.setenv('TSCODE_FUSED_SWEEP', flag)
        # chunk=8 forces several chunks through the loop path
        outs[flag] = string_embed(mol1, mol2, angles, chunk=8,
                                  log=lambda *a, **k: None)

    assert outs['0'][0].shape == outs['1'][0].shape
    np.testing.assert_allclose(outs['0'][0], outs['1'][0],
                               rtol=0, atol=1e-12)
    np.testing.assert_array_equal(outs['0'][1], outs['1'][1])


# ------------------------------------------------- block builder fast path

def _noisy_molecule(tmp_path, name, n_confs, reactive, seed=3):
    from tscode_tpu.io_xyz import read_xyz, write_xyz
    rng = np.random.default_rng(seed)
    data = read_xyz(fix(name))
    path = os.path.join(tmp_path, f'noisy_{seed}_{name}')
    with open(path, 'w') as f:
        for c in range(n_confs):
            write_xyz(data.atomcoords[0]
                      + rng.normal(size=data.atomcoords[0].shape) * 0.08,
                      data.atomnos, f, title=f'conf {c}')
    mol = Molecule(path, reactive_indices=reactive)
    mol.compute_orbitals()
    set_pivots(mol)
    return mol


def test_string_embed_device_tfd_lane_matches_host(tmp_path, monkeypatch):
    '''The device TFD novelty lane (TSCODE_DEVICE_TFD=1 — the
    accelerator default) must produce the identical pose set as the
    host LRU replay on the production string_embed path.'''
    mol1 = _noisy_molecule(str(tmp_path), 'C2H4.xyz', 3, [0], seed=11)
    mol2 = _noisy_molecule(str(tmp_path), 'CH3Cl.xyz', 4, [0], seed=12)
    angles = np.linspace(0.0, 350.0, 24)

    outs = {}
    for flag in ('0', '1'):
        monkeypatch.setenv('TSCODE_DEVICE_TFD', flag)
        outs[flag] = string_embed(mol1, mol2, angles,
                                  log=lambda *a, **k: None)
    np.testing.assert_array_equal(outs['0'][0], outs['1'][0])
    np.testing.assert_array_equal(outs['0'][1], outs['1'][1])


def test_bimol_blocks_fast_matches_loop(tmp_path):
    '''The vectorized block-grid builder must reproduce the scalar loop
    field-for-field (values AND row order) — multi-conformer molecules,
    norm gate, pairing gate.'''
    from tscode_tpu.embeds.cyclical import (_bimol_rigid_blocks_fast,
                                            _bimol_rigid_blocks_loop)

    mol1 = _noisy_molecule(str(tmp_path), 'C2H4.xyz', 3, [0, 3], seed=3)
    mol2 = _noisy_molecule(str(tmp_path), 'HCOOH.xyz', 4, [0, 1], seed=4)

    def pairing_ok(arr_ids):             # reject one id combination
        return arr_ids[0][0] != arr_ids[0][1] - mol1.n_atoms

    for gate in (None, pairing_ok):
        for delta in (10, 0.15):         # 0.15 exercises the norm gate
            fast = _bimol_rigid_blocks_fast(mol1, mol2, delta, gate)
            loop = _bimol_rigid_blocks_loop(mol1, mol2, delta, gate)
            assert fast is not NotImplemented
            if loop is None:
                assert fast is None
                continue
            # fast additionally carries the compact sweep form
            assert set(loop.keys()) | {'tab1', 'tab2', 'tidx'} \
                == set(fast.keys())
            for k in loop:
                np.testing.assert_array_equal(
                    fast[k], loop[k], err_msg=f'field {k!r}')
            # the compact gather must reconstruct the expanded fields
            t1, t2 = fast['tidx'][:, 0], fast['tidx'][:, 1]
            r1, r2 = fast['tab1'][t1], fast['tab2'][t2]
            for m, r in ((0, r1), (1, r2)):
                for col, k in enumerate(('pvs', 'mds', 'apms', 'mps',
                                         'rc_axes')):
                    np.testing.assert_array_equal(
                        r[:, col], fast[k][:, m],
                        err_msg=f'compact col {k!r} mol {m}')


def test_bimol_blocks_ragged_pivots_fall_back(tmp_path):
    '''Conformers with differing pivot lists (suprafacial-style
    raggedness) must route through the scalar loop, not crash.'''
    from tscode_tpu.embeds.cyclical import (_bimol_rigid_blocks,
                                            _bimol_rigid_blocks_fast)

    mol1 = _noisy_molecule(str(tmp_path), 'C2H4.xyz', 3, [0, 3], seed=5)
    mol2 = _noisy_molecule(str(tmp_path), 'C2H4.xyz', 3, [0, 3], seed=6)
    mol1.pivots = list(mol1.pivots)
    mol1.pivots[1] = mol1.pivots[1][:-1]          # drop one pivot

    assert _bimol_rigid_blocks_fast(mol1, mol2, 10, None) is NotImplemented
    blk = _bimol_rigid_blocks(mol1, mol2, 10, None)
    assert blk is not None
    # 3*3 conf pairs x (4*4 minus one conf's missing pivot row) x 2
    assert len(blk['c1']) == 2 * (3 * 4 * 4 * 3 - 3 * 4)
