'''Golden tests for the screening kernels: clash, TFD, MOI, RMSD-prune.'''

import jax.numpy as jnp
import numpy as np

import oracles
from tscode_tpu.ops import clash, moi, rmsd_prune, score, tfd
from tscode_tpu.pt import masses_of

rng = np.random.default_rng(123)


def _random_poses(n_poses, ids, spread=4.0):
    n = int(sum(ids))
    return rng.normal(size=(n_poses, n, 3)) * spread


# ------------------------------------------------------------------- clash

def test_compenetration_bimolecular():
    ids = (7, 9)
    poses = _random_poses(64, ids, spread=2.0)
    pm = clash.cross_fragment_pair_mask(ids)
    got = np.asarray(clash.compenetration_mask(poses, pm, thresh=1.5, max_clashes=0))
    want = np.array([oracles.compenetration_check(p, ids=np.array(ids)) for p in poses],
                    dtype=bool)
    np.testing.assert_array_equal(got, want)


def test_compenetration_trimolecular_and_clash_counts():
    ids = (5, 6, 4)
    poses = _random_poses(48, ids, spread=2.5)
    pm = clash.cross_fragment_pair_mask(ids)
    for max_clashes in (0, 2):
        got = np.asarray(clash.compenetration_mask(poses, pm, thresh=1.5,
                                                   max_clashes=max_clashes))
        want = np.array([oracles.compenetration_check(p, ids=np.array(ids),
                                                      max_clashes=max_clashes)
                         for p in poses], dtype=bool)
        np.testing.assert_array_equal(got, want)


def test_intra_clash_double_counting():
    coords = rng.normal(size=(16, 10, 3)) * 0.8
    got = np.asarray(clash.count_intra_clashes(coords))
    for i in range(16):
        d = oracles.all_dists(coords[i], coords[i])
        want = np.count_nonzero((d < 0.5) & (d > 0))
        assert got[i] == want


def test_compenetration_padding_invariance():
    ids = (7, 9)
    poses = _random_poses(16, ids, spread=2.0)
    pm = clash.cross_fragment_pair_mask(ids)
    padded = np.concatenate([poses, np.full((16, 6, 3), 1e3)], axis=1)
    pm_pad = clash.cross_fragment_pair_mask(ids, n_pad=padded.shape[1])
    got = np.asarray(clash.compenetration_mask(poses, pm))
    got_pad = np.asarray(clash.compenetration_mask(padded, pm_pad))
    np.testing.assert_array_equal(got, got_pad)


# --------------------------------------------------------------------- TFD

def _chain_quadruplets(n_atoms):
    return np.array([[i, i + 1, i + 2, i + 3] for i in range(n_atoms - 3)])


def test_torsion_fingerprints():
    coords = rng.normal(size=(12, 10, 3)) * 2
    quads = _chain_quadruplets(10)
    got = np.asarray(tfd.torsion_fingerprints(coords, quads))
    for i in range(12):
        want = oracles.get_torsion_fingerprint(coords[i], quads)
        np.testing.assert_allclose(got[i], want, atol=1e-4)


def test_tfd_prune_matches_sequential_oracle():
    # build an ensemble with duplicate torsional profiles
    base = rng.normal(size=(12, 3)) * 2
    quads = _chain_quadruplets(12)
    structures = []
    for _ in range(30):
        if rng.random() < 0.5 and structures:
            src = structures[rng.integers(len(structures))]
            structures.append(src + rng.normal(size=(12, 3)) * 0.001)
        else:
            structures.append(base + rng.normal(size=(12, 3)) * 1.0)
    structures = np.array(structures)

    _, got_mask = tfd.prune_conformers_tfd(structures, quads, thresh=10)

    # sequential oracle replicating the reference bucket loop
    tf_mat = np.array([oracles.get_torsion_fingerprint(s, quads) for s in structures])
    n = len(structures)
    want_mask = np.ones(n, dtype=bool)
    import networkx as nx
    for k in tfd.K_SCHEDULE:
        active = int(np.count_nonzero(want_mask))
        if not (k == 1 or 5 * k < active):
            continue
        d = int(n // k)
        for step in range(int(k)):
            lo = d * step
            hi = active if step == k - 1 else int(d * (step + 1))
            _l = hi - lo
            matches = set()
            for i_rel in range(_l):
                for j_rel in range(i_rel + 1, _l):
                    if oracles.tfd_similarity(tf_mat[lo + i_rel], tf_mat[lo + j_rel]):
                        matches.add((i_rel, j_rel))
                        break
            g = nx.Graph(matches)
            for c in nx.connected_components(g):
                nodes = tuple(g.subgraph(c).nodes)
                for i in set(nodes) - {nodes[0]}:
                    want_mask[i + lo] = False
    np.testing.assert_array_equal(got_mask, want_mask)


def test_is_new_structure_lru():
    quads = _chain_quadruplets(8)
    base = rng.normal(size=(8, 3)) * 2
    coords = np.array([base, base + 1e-4, base + rng.normal(size=(8, 3)),
                       base + 2e-4, base])
    fps = np.asarray(tfd.torsion_fingerprints(coords, quads))
    mask = tfd.is_new_structure_lru(fps, np.ones(5, bool))
    assert mask.tolist() == [True, False, True, False, False]


def _clustered_fps(rng_, n, q=6, n_clusters=7, spread=0.5):
    '''Fingerprint matrix with heavy near-duplication (the string-embed
    survivor regime): cluster centers far apart, members within the
    similarity threshold of their center, angles wrapped to [-180, 180].'''
    centers = rng_.uniform(-180, 180, size=(n_clusters, q))
    who = rng_.integers(0, n_clusters, n)
    fps = centers[who] + rng_.normal(size=(n, q)) * spread
    return ((fps + 180) % 360 - 180).astype(np.float32)


def test_tfd_novelty_device_matches_host_replay():
    for seed, n, accept_p in ((0, 700, 1.0), (1, 2500, 0.8), (2, 97, 0.5)):
        r = np.random.default_rng(seed)
        fps = _clustered_fps(r, n)
        accept = r.random(n) < accept_p
        want = tfd.is_new_structure_lru(fps, accept)
        # small block/cache force multi-block scans + cache appends
        got, ok = tfd.tfd_novelty_device(fps, accept_mask=accept,
                                         block=128, cache_cap=64)
        assert ok
        np.testing.assert_array_equal(got, want)


def test_tfd_novelty_device_chain_dependency():
    # i0 accepted; i1 similar to i0 -> rejected; i2 similar ONLY to the
    # REJECTED i1 -> accepted (the leader-clustering trap a naive
    # "has similar predecessor" reduction gets wrong). The chain is
    # split across block boundaries to exercise the cache handoff.
    q = 4
    f0 = np.zeros(q, np.float32)
    f1 = f0 + 2.0          # L1 = 8 < 10 from f0
    f2 = f1 + 2.0          # L1 = 8 from f1, 16 from f0
    far = np.full(q, 90.0, np.float32)
    fps = np.stack([f0, f1, far, f2]).astype(np.float32)
    want = tfd.is_new_structure_lru(fps, np.ones(4, bool))
    assert want.tolist() == [True, False, True, True]
    for block in (2, 4, 128):
        got, ok = tfd.tfd_novelty_device(fps, block=block, cache_cap=16)
        assert ok
        np.testing.assert_array_equal(got, want)


def test_tfd_novelty_device_wrap_and_overflow():
    # wrapped similarity: +179 vs -179 is 2 degrees apart, not 358
    fps = np.array([[179.0] * 3, [-179.0] * 3], dtype=np.float32)
    got, ok = tfd.tfd_novelty_device(fps, block=8, cache_cap=8)
    assert ok and got.tolist() == [True, False]

    # cache overflow -> ok False (every row is its own cluster)
    r = np.random.default_rng(3)
    fps = _clustered_fps(r, 64, n_clusters=64, spread=0.0)
    got, ok = tfd.tfd_novelty_device(fps, block=16, cache_cap=4)
    assert not ok

    # degenerate inputs route to the host path
    assert tfd.tfd_novelty_device(np.zeros((0, 3), np.float32))[1] is False
    assert tfd.tfd_novelty_device(np.zeros((5, 0), np.float32))[1] is False


# --------------------------------------------------------------------- MOI

def test_moi_prune():
    base = rng.normal(size=(9, 3)) * 2
    atomnos = np.array([6, 6, 8, 1, 1, 7, 6, 1, 9])
    structures = [base]
    R = oracles.rot_mat_from_pointer(np.array([0.3, 1.0, -0.2]), 73.0)
    structures.append((R @ base.T).T + 5.0)               # rotamer duplicate
    structures.append(base + rng.normal(size=(9, 3)))     # distinct
    structures.append(base * np.array([1, 1, -1.0]))      # enantiomer duplicate
    structures = np.array(structures)

    pruned, mask = moi.prune_by_moment_of_inertia(structures, atomnos)

    heavy = atomnos != 1
    masses = masses_of(atomnos[heavy])
    moments = [oracles.get_inertia_moments(s[heavy].copy(), masses) for s in structures]
    # sanity on the oracle: duplicates share moments
    np.testing.assert_allclose(moments[0], moments[1], rtol=1e-6)
    np.testing.assert_allclose(moments[0], moments[3], rtol=1e-6)
    assert mask.tolist() == [True, False, True, False]


# ------------------------------------------------------------------- RMSD

def _oracle_prune_rmsd(structures, atomnos, rmsd_thr=0.5):
    heavy = atomnos != 1
    hs = structures[:, heavy]
    n = len(structures)
    mask = np.ones(n, dtype=bool)
    for k in rmsd_prune.K_SCHEDULE:
        active = int(np.count_nonzero(mask))
        if not (k == 1 or 20 * k < active):
            continue
        chunksize = int(n // k)
        new = mask.copy()
        for chunk in range(int(k)):
            first = chunk * chunksize
            last = n if chunk == k - 1 else chunksize * (chunk + 1)
            for i in range(first, last):
                if not mask[i]:
                    continue
                for j in range(i + 1, last):
                    if mask[j]:
                        r, md = oracles.rmsd_and_max(hs[i].copy(), hs[j].copy())
                        if r < rmsd_thr and md < 2 * rmsd_thr:
                            new[i] = False
                            break
        mask = new
    return mask


def _clustered_ensemble(n, n_atoms=12, seed=5):
    g = np.random.default_rng(seed)
    atomnos = g.integers(1, 9, size=n_atoms)
    atomnos[0] = 6
    structures = []
    clusters = [g.normal(size=(n_atoms, 3)) * 2 for _ in range(max(2, n // 6))]
    for _ in range(n):
        if g.random() < 0.6:
            src = clusters[g.integers(len(clusters))]
            s = src + g.normal(size=(n_atoms, 3)) * 0.05
        else:
            s = g.normal(size=(n_atoms, 3)) * 2
        structures.append(s)
    return np.array(structures), atomnos


def test_rmsd_prune_small():
    structures, atomnos = _clustered_ensemble(18)
    _, got = rmsd_prune.prune_conformers_rmsd(structures, atomnos, rmsd_thr=0.5)
    want = _oracle_prune_rmsd(structures, atomnos, rmsd_thr=0.5)
    np.testing.assert_array_equal(got, want)


def test_rmsd_prune_multipass():
    # n large enough that the k=2 pass triggers (20*2 < active)
    structures, atomnos = _clustered_ensemble(60, seed=9)
    _, got = rmsd_prune.prune_conformers_rmsd(structures, atomnos, rmsd_thr=0.5)
    want = _oracle_prune_rmsd(structures, atomnos, rmsd_thr=0.5)
    np.testing.assert_array_equal(got, want)


def test_rmsd_prune_many_pass_batched():
    # n large enough to trigger several k passes and the batched
    # small-chunk device path (k up to 14 chunks of ~21)
    structures, atomnos = _clustered_ensemble(300, seed=11)
    _, got = rmsd_prune.prune_conformers_rmsd(structures, atomnos, rmsd_thr=0.5)
    want = _oracle_prune_rmsd(structures, atomnos, rmsd_thr=0.5)
    np.testing.assert_array_equal(got, want)


def test_rmsd_prune_device_resident_matches_host():
    import jax.numpy as jnp
    for n, seed in ((60, 9), (300, 11)):
        structures, atomnos = _clustered_ensemble(n, seed=seed)
        _, want = rmsd_prune.prune_conformers_rmsd(structures, atomnos,
                                                   rmsd_thr=0.5)
        heavy = atomnos != 1
        got = np.asarray(rmsd_prune.prune_conformers_rmsd_device(
            jnp.asarray(structures[:, heavy]), rmsd_thr=0.5))
        np.testing.assert_array_equal(got, want)


def test_rmsd_prune_device_resident_large_fused():
    # n large enough that several fused in-place passes run (k=50: span
    # 30; k=20: span 75 -> pad 128), including non-trivial tail chunks
    import jax.numpy as jnp
    structures, atomnos = _clustered_ensemble(1500, seed=21)
    _, want = rmsd_prune.prune_conformers_rmsd(structures, atomnos,
                                               rmsd_thr=0.5)
    heavy = atomnos != 1
    got = np.asarray(rmsd_prune.prune_conformers_rmsd_device(
        jnp.asarray(structures[:, heavy]), rmsd_thr=0.5))
    np.testing.assert_array_equal(got, want)


def test_rmsd_prune_whole_schedule_single_call():
    # warmup registers the ensemble length -> the pruner takes the
    # single _device_schedule call; results must match the host path
    import jax.numpy as jnp
    structures, atomnos = _clustered_ensemble(700, seed=13)
    _, want = rmsd_prune.prune_conformers_rmsd(structures, atomnos,
                                               rmsd_thr=0.5)
    heavy = atomnos != 1
    hs = np.ascontiguousarray(structures[:, heavy])
    rmsd_prune.warmup_prune_kernels(hs.shape[1], dtype=hs.dtype,
                                    n_pool=len(hs), n_real=len(hs))
    assert (len(hs), (len(hs), hs.shape[1], 3), hs.dtype) \
        in rmsd_prune._SCHEDULE_WARMED
    got = np.asarray(rmsd_prune.prune_conformers_rmsd_device(
        jnp.asarray(hs), rmsd_thr=0.5))
    np.testing.assert_array_equal(got, want)


def test_rmsd_prune_device_resident_init_mask():
    import jax.numpy as jnp
    structures, atomnos = _clustered_ensemble(40, seed=3)
    heavy = atomnos != 1
    init = np.ones(40, dtype=bool)
    init[5:15] = False
    got = np.asarray(rmsd_prune.prune_conformers_rmsd_device(
        jnp.asarray(structures[:, heavy]), rmsd_thr=0.5, init_mask=init))
    # dead-on-entry structures stay dead
    assert not got[5:15].any()
    # live part matches the host pruner applied with the same liveness:
    # oracle with pass-start mask honoring init
    hs = structures[:, heavy]
    mask = init.copy()
    for k in rmsd_prune.K_SCHEDULE:
        active = int(np.count_nonzero(mask))
        if not (k == 1 or 20 * k < active):
            continue
        chunksize = int(40 // k)
        new = mask.copy()
        for chunk in range(int(k)):
            first = chunk * chunksize
            last = 40 if chunk == k - 1 else chunksize * (chunk + 1)
            for i in range(first, last):
                if not mask[i]:
                    continue
                for j in range(i + 1, last):
                    if mask[j]:
                        r, md = oracles.rmsd_and_max(hs[i].copy(), hs[j].copy())
                        if r < 0.5 and md < 1.0:
                            new[i] = False
                            break
        mask = new
    np.testing.assert_array_equal(got, mask)


def test_mid_body_banded_kills_beyond_live_count():
    '''Regression: the banded group sweep must cover the SPAN of live
    rows, not ceil(live_count / Gtile) groups. After an earlier pass of
    the same _mid_body loop kills rows, survivors sit scattered across
    the entry compaction — a count-based bound skipped trailing groups
    that still held live duplicate pairs (advisor r3 HIGH finding).

    Construction (n = 8192, band = 512 -> Gtile = 4096, 2 groups):
      * rows 0..4799 are exact duplicates in k=200-chunk-aligned blocks
        of 40 -> the first eligible pass (k=200) kills 4680 rows,
        dropping the live COUNT to 3512 (< 4096 = one group) while live
        rows still span both groups;
      * rows 6000/6040 are an exact duplicate pair in group 1 that is
        same-chunk only from the k=100 pass on -> under the buggy bound
        that pass swept group 0 only and the pair survived;
      * distinct families get distinct Frobenius norms with a 1.5 gap,
        so cross-family RMSD >= |dnorm|/sqrt(N) = 0.67 > thr regardless
        of rotation — kill decisions reduce exactly to family-id
        equality and the oracle below is exact. (Extreme translation
        offsets are NOT usable here: they push the fixed-iteration QCP
        Newton solve outside its production coordinate envelope.)
    '''
    import jax.numpy as jnp
    n, band, thr = 8192, 512, 0.5

    fam = np.arange(n)
    for c in range(120):                       # k=200 chunks: 40 rows
        fam[40 * c:40 * (c + 1)] = fam[40 * c]
    fam[6040] = fam[6000]
    g = np.random.default_rng(17)
    base = g.normal(size=(5, 3))
    base /= np.sqrt((base * base).sum())
    # fam % 1024 stays injective within any chunk window (spans <= 421)
    scale = 10.0 + 1.5 * (fam % 1024)
    hs = base[None] * scale[:, None, None]

    got, ok, _ = rmsd_prune._mid_body(
        jnp.asarray(hs), jnp.ones(n, bool), jnp.asarray(n, jnp.int32),
        jnp.asarray(thr, hs.dtype), s_mid=n, band=band, stop_below=8)
    got = np.asarray(got)

    # family-id oracle replicating _mid_body's pass semantics: chunks by
    # ORIGINAL index, simultaneous kills (entry-of-pass liveness), pass
    # gates (k==1 or 20k<active) & active>stop_below, band-fit stop.
    # Run lengths are computed over the CURRENT survivors (the device
    # re-compacts per pass), not the entry set.
    mask = np.ones(n, bool)
    oracle_ok = True
    idx = np.arange(n)
    for k in (int(k) for k in rmsd_prune.K_SCHEDULE):
        active = int(mask.sum())
        eligible = (k == 1 or 20 * k < active) and active > 8
        chunk = np.minimum(idx // max(n // k, 1), k - 1)
        ch = chunk[mask]
        runs = (np.diff(np.flatnonzero(
            np.r_[True, ch[1:] != ch[:-1], True]))
            if len(ch) else np.zeros(1, int))
        fits = runs.max() <= band
        if eligible and fits and oracle_ok:
            new = mask.copy()
            for c in np.unique(chunk):
                rows = idx[(chunk == c) & mask]
                fams = fam[rows]
                # kill i when any later same-family row is alive
                dup_later = np.array([(fams[i + 1:] == fams[i]).any()
                                      for i in range(len(rows))])
                if dup_later.any():
                    new[rows[dup_later]] = False
            mask = new
        oracle_ok = oracle_ok and (fits or not eligible)

    assert bool(ok) == oracle_ok
    # the planted group-1 pair: earlier row dies, later survives
    assert mask[6000] == False and mask[6040] == True  # noqa: E712
    np.testing.assert_array_equal(got, mask)


def test_rmsd_similarity_sequential():
    structures, _ = _clustered_ensemble(10)
    ref = structures[0]
    sims = [oracles.rmsd_and_max(ref.copy(), s.copy()) for s in structures[1:]]
    want = any(r < 1.0 and m < 2.0 for r, m in sims)
    got = rmsd_prune.rmsd_similarity_sequential(ref, structures[1:], rmsd_thr=1.0)
    assert got == want


# ------------------------------------------------------------------- score

def test_score_embed_poses():
    B, N, C = 10, 8, 2
    structures = rng.normal(size=(B, N, 3)) * 3
    cidx = rng.integers(0, N, size=(B, C, 2))
    cdist = rng.uniform(1, 3, size=(B, C))
    got = np.asarray(score.score_embed_poses(structures, cidx, cdist))
    want = oracles.score_embed_poses(structures, cidx, cdist)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fitness_scores_signed():
    B, N = 6, 8
    structures = rng.normal(size=(B, N, 3)) * 3
    cidx = rng.integers(0, N, size=(B, 2, 2))
    targets = rng.uniform(1, 3, size=(B, 2))
    valid = np.array([[True, False]] * B)
    got = np.asarray(score.fitness_scores(structures, cidx, targets, valid))
    for b in range(B):
        want = 0.0
        for c in range(2):
            if valid[b, c]:
                d = np.linalg.norm(structures[b, cidx[b, c, 0]] - structures[b, cidx[b, c, 1]])
                want += d - targets[b, c]
        np.testing.assert_allclose(got[b], want, atol=1e-9)


def test_rmsd_prune_maxdev_gate_ambiguous_band():
    # pairs engineered into the band rmsd < thr <= maxdev/2: a single
    # atom displaced by d on an N=16 structure gives rmsd ~ d/4 but
    # maxdev ~ d, so d in (1.0, 2.0) passes gate1 and FAILS gate2 —
    # the cheap sqrt(N)*rmsd bound must not shortcut these kills
    import jax.numpy as jnp
    g = np.random.default_rng(17)
    n_atoms = 16
    atomnos = np.full(n_atoms, 6)
    base = g.normal(size=(n_atoms, 3)) * 4.0

    structures = [base.copy()]
    for d in (0.2, 0.9, 1.2, 1.5, 1.9, 2.4, 0.05):
        s = base.copy()
        s[0] += np.array([d, 0.0, 0.0])
        structures.append(s)
    structures = np.array(structures)

    _, want = rmsd_prune.prune_conformers_rmsd(structures, atomnos,
                                               rmsd_thr=0.5)
    want_oracle = _oracle_prune_rmsd(structures, atomnos, rmsd_thr=0.5)
    np.testing.assert_array_equal(want, want_oracle)

    got = np.asarray(rmsd_prune.prune_conformers_rmsd_device(
        jnp.asarray(structures), rmsd_thr=0.5))
    np.testing.assert_array_equal(got, want)
    # some structure must survive BECAUSE of the maxdev veto: at least
    # one pair sits in the ambiguous band
    from tests.oracles import rmsd_and_max
    in_band = 0
    for i in range(len(structures)):
        for j in range(i + 1, len(structures)):
            r, md = rmsd_and_max(structures[i].copy(),
                                 structures[j].copy())
            if r < 0.5 and md >= 1.0:
                in_band += 1
    assert in_band > 0


def test_rmsd_prune_mid_regime_banded(monkeypatch):
    # shrink the regime thresholds so the banded mid regime engages:
    # duplicates 150 positions apart share a chunk only at k=2/k=1,
    # which the in-place regime (spans <= 128) cannot reach
    import jax.numpy as jnp
    monkeypatch.setattr(rmsd_prune, '_FINISH_MAX', 64)
    monkeypatch.setattr(rmsd_prune, '_MID_MAX', 1024)
    monkeypatch.setattr(rmsd_prune, '_MID_BAND', 640)

    g = np.random.default_rng(29)
    n = 600
    uniq = g.normal(size=(450, 4, 3)) * 3
    hs = np.empty((n, 4, 3))
    hs[:450] = uniq
    hs[450:] = uniq[:150] + g.normal(size=(150, 4, 3)) * 0.05

    atomnos = np.full(4, 6)
    _, want = rmsd_prune.prune_conformers_rmsd(hs, atomnos, rmsd_thr=0.5)

    alive, n_act, finished = rmsd_prune._device_schedule(
        jnp.asarray(hs), jnp.ones(n, dtype=bool),
        jnp.asarray(0.5, jnp.float64), n=n, s_pad=64)
    # the mid regime must complete the schedule on device (k=1 banded)
    assert bool(finished)
    got = np.asarray(alive)
    np.testing.assert_array_equal(got, want)
    assert int(n_act) == want.sum()
    # the duplicates actually got pruned
    assert want.sum() < n


def test_tfd_tiled_prune_matches_sequential_replica():
    '''The tiled first-successor TFD prune (fixed-shape device tiles,
    Q-axis scan) must reproduce the sequential bucketed loop exactly at
    a size spanning multiple row/col tiles.'''
    import jax.numpy as jnp
    import networkx as nx

    from tscode_tpu.ops.tfd import (K_SCHEDULE, prune_conformers_tfd,
                                    torsion_fingerprints)

    rng = np.random.default_rng(1)
    base = rng.normal(size=(80, 12, 3))
    dups = np.repeat(base, 4, axis=0) + rng.normal(size=(320, 12, 3)) * 1e-4
    quads = np.stack([rng.choice(12, 4, replace=False) for _ in range(8)])

    _, mask = prune_conformers_tfd(dups, quads, thresh=10)
    tf = np.asarray(torsion_fingerprints(jnp.asarray(dups),
                                         quads.astype(np.int32)))

    n = len(dups)
    want = np.ones(n, dtype=bool)
    for k in K_SCHEDULE:
        num_active = int(np.count_nonzero(want))
        if not (k == 1 or 5 * k < num_active):
            continue
        d = int(n // k)
        for step in range(int(k)):
            lo = d * step
            hi = num_active if step == k - 1 else int(d * (step + 1))
            if hi - lo <= 1:
                continue
            matches = set()
            for i in range(hi - lo):
                for j in range(i + 1, hi - lo):
                    delta = np.abs(tf[lo + i] - tf[lo + j])
                    delta = np.abs(delta - (delta > 180) * 360.0)
                    if delta.sum() < 10:
                        matches.add((i, j))
                        break
            if not matches:
                continue
            g = nx.Graph(matches)
            for group in (tuple(g.subgraph(c).nodes)
                          for c in nx.connected_components(g)):
                for i in set(group) - {group[0]}:
                    want[i + lo] = False

    np.testing.assert_array_equal(mask, want)


def test_mid_regime_band_equivalence():
    '''The wide tier-2 band must reproduce the tier-1 banded passes
    exactly whenever both fit (same kills, same order semantics).'''
    from tscode_tpu.ops.rmsd_prune import (_MID2_BAND, _MID_BAND,
                                           _mid_body)

    rng = np.random.default_rng(0)
    n = 8000                  # k=200 -> clean 40-wide chunks, no tail run
    base = rng.normal(size=(n // 8, 4, 3)) * 3
    hs0 = np.repeat(base, 8, axis=0) + rng.normal(size=(n, 4, 3)) * 0.02
    hs = jnp.asarray(hs0 - hs0.mean(axis=1, keepdims=True))
    alive = jnp.ones(n, dtype=bool)
    thr = jnp.asarray(0.5, hs.dtype)

    a1, ok1, _ = _mid_body(hs, alive, jnp.asarray(n, jnp.int32), thr,
                           s_mid=8192, band=_MID_BAND)
    a2, ok2, _ = _mid_body(hs, alive, jnp.asarray(n, jnp.int32), thr,
                           s_mid=8192, band=_MID2_BAND)
    assert bool(ok1) and bool(ok2)
    assert bool(jnp.array_equal(a1, a2))
    assert int(a1.sum()) == 1000          # 8 near-duplicates per survivor


def test_tail_kill_tiled_matches_single_block(monkeypatch):
    '''The tiled tail evaluation (row-map x col-scan) must reproduce
    the single-block _pair_kill_core kill bits exactly — for N <= 4
    (maxdev implied) AND N > 4 (rect exact/ambiguous path), with dead
    rows and padded tails. Tile shrunk so several tiles are exercised
    at CPU-test size.'''
    import tscode_tpu.ops.rmsd_prune as rp

    monkeypatch.setattr(rp, '_TAIL_TILE', 32)
    rng = np.random.default_rng(11)
    for N in (4, 8):
        Tp = 128                        # 4 tiles of 32
        tail_real = 100                 # non-pow2 real rows
        base = rng.normal(size=(15, N, 3)) * 2.0
        pool = (base[rng.integers(0, len(base), Tp)]
                + rng.normal(size=(Tp, N, 3)) * 0.05)
        alive = rng.random(Tp) < 0.8
        alive[tail_real:] = False

        Pt = jnp.asarray(pool)
        at = jnp.asarray(alive)

        rt = np.arange(Tp)
        valid = (alive[None, :, None] & alive[None, None, :]
                 & (rt[None, None, :] > rt[None, :, None]))
        want = np.asarray(rp._pair_kill_core(Pt[None], jnp.asarray(valid),
                                             0.5)[0])
        got = np.asarray(rp._tail_kill_tiled(Pt, at, 0.5))
        np.testing.assert_array_equal(got, want, err_msg=f'N={N}')
        assert want.sum() > 0           # the case actually prunes


def test_inplace_body_big_tail_matches_single_block(monkeypatch):
    '''_inplace_body with a tail past _TAIL_BLOCK_MAX (tiled path)
    must equal the single-block path, pinning the reference's
    remainder-chunk semantics (rmsd_pruning.py:139-148).'''
    import tscode_tpu.ops.rmsd_prune as rp

    rng = np.random.default_rng(12)
    n_pool = 512
    n = 480
    base = rng.normal(size=(40, 4, 3)) * 2.5
    pool = (base[rng.integers(0, len(base), n_pool)]
            + rng.normal(size=(n_pool, 4, 3)) * 0.04)
    alive = np.arange(n_pool) < n

    # 3 chunks of 64 + a 288-row tail (pad 512)
    kw = dict(rmsd_thr=jnp.asarray(0.5), span_real=64, span_pad=64,
              n_chunks=3, tail_real=288, tail_pad=512)

    monkeypatch.setattr(rp, '_TAIL_BLOCK_MAX', 256)   # force tiled
    monkeypatch.setattr(rp, '_TAIL_TILE', 64)
    got = np.asarray(rp._inplace_body(jnp.asarray(pool),
                                      jnp.asarray(alive), **kw))

    monkeypatch.setattr(rp, '_TAIL_BLOCK_MAX', 1 << 20)  # single block
    want = np.asarray(rp._inplace_body(jnp.asarray(pool),
                                       jnp.asarray(alive), **kw))

    np.testing.assert_array_equal(got, want)
    assert got.sum() < n               # the pass actually pruned


def test_mid_body_run_start_scan_matches_searchsorted():
    '''The gather-free run-start scan inside _mid_body must reproduce
    jnp.searchsorted(chunk, chunk, 'left') for sorted chunk ids with
    interleaved dead rows — the quantity that gates banded-pass
    eligibility (max same-chunk active run).'''
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    for trial in range(20):
        s = int(rng.integers(4, 400))
        # sorted, duplicated chunk ids like a compacted pass sees
        chunk = jnp.asarray(np.sort(rng.integers(0, max(2, s // 7), s))
                            .astype(np.int32))
        pos = jnp.arange(s, dtype=jnp.int32)
        want = jnp.searchsorted(chunk, chunk, side='left')
        starts = jnp.concatenate(
            [jnp.ones(1, bool), chunk[1:] != chunk[:-1]])
        got = jax.lax.associative_scan(
            jnp.maximum, jnp.where(starts, pos, 0))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _family_schedule_sim(fam, n, k_schedule):
    '''Exact simulation of the full bucketed schedule when kill
    decisions reduce to family-id equality (norm-separated families of
    exact duplicates): per eligible pass, within each chunk (original-
    index boundaries, trailing chunk capped at k-1), a row dies iff a
    LATER same-chunk row of its family was alive at pass entry.
    Returns (final mask, active count after each pass in schedule
    order — ineligible passes record the unchanged count).'''
    mask = np.ones(n, bool)
    idx = np.arange(n)
    actives_after = []
    for k in (int(k) for k in k_schedule):
        active = int(mask.sum())
        if k == 1 or 20 * k < active:
            chunk = np.minimum(idx // max(n // k, 1), k - 1)
            new = mask.copy()
            for c in np.unique(chunk):
                rows = idx[(chunk == c) & mask]
                fams = fam[rows]
                last_pos = {}
                for r, f in zip(rows, fams):
                    last_pos[f] = r
                for r, f in zip(rows, fams):
                    if last_pos[f] != r:
                        new[r] = False
            mask = new
        actives_after.append(int(mask.sum()))
    return mask, actives_after


def _norm_separated_families(fam, n_atoms=5, seed=33):
    '''One unit-Frobenius-norm base shape scaled per family id with a
    1.5 norm gap: cross-family RMSD >= 1.5/sqrt(N) = 0.67 > thr while
    same-family rows are EXACT duplicates — kill decisions reduce to
    family-id equality (same construction as the banded regression
    test above; extreme translations would leave the fixed-iteration
    QCP Newton envelope).'''
    g = np.random.default_rng(seed)
    base = g.normal(size=(n_atoms, 3))
    base /= np.sqrt((base * base).sum())
    scale = 10.0 + 1.5 * fam
    return base[None] * scale[:, None, None]


def test_device_schedule_all_tiers_stack(monkeypatch):
    '''END-TO-END _device_schedule through EVERY tier in one program —
    fused in-place passes, wide-band tier-2 mid (the production >262k-
    survivor regime the CPU lanes otherwise never compile), narrow
    tier-1 mid with its banded k=1 completion, and the finish block —
    at CPU scale via shrunken regime constants, against the exact
    family-id schedule simulation.

    Scenario A (stride-48 families): actives walk in-place -> tier-2
    -> tier-1, and the banded k=1 pass COMPLETES the schedule
    (mid_done short-circuits the finish block).
    Scenario B (stride-30): tier-2 alone shrinks actives under s_pad,
    tier-1 is skipped, and the FINISH block closes the schedule.'''
    monkeypatch.setattr(rmsd_prune, '_MID_MAX', 128)
    monkeypatch.setattr(rmsd_prune, '_MID_BAND', 128)
    monkeypatch.setattr(rmsd_prune, '_MID2_BAND', 256)
    # tier-1's pass gate stops below _FINISH_MAX (the production s_pad)
    monkeypatch.setattr(rmsd_prune, '_FINISH_MAX', 64)

    n, s_pad, thr = 4096, 64, 0.5
    assert n > 16 * rmsd_prune._MID_MAX          # tier-2 compiled in
    inplace = rmsd_prune._inplace_ks(n)
    assert len(inplace) >= 2                     # fused passes live too
    last_inplace = [int(k) for k in rmsd_prune.K_SCHEDULE].index(
        min(inplace))

    for n_fam, expect_k1_banded in ((48, True), (30, False)):
        fam = np.arange(n) % n_fam
        hs = _norm_separated_families(fam)
        want, actives = _family_schedule_sim(fam, n, rmsd_prune.K_SCHEDULE)

        # the scenario must actually cross the tiers it claims to:
        assert actives[last_inplace] > rmsd_prune._MID_MAX  # tier-2 engages
        assert want.sum() == n_fam <= s_pad

        alive, n_act, finished = rmsd_prune._device_schedule(
            jnp.asarray(hs), jnp.ones(n, bool),
            jnp.asarray(thr, jnp.float64), n=n, s_pad=s_pad)
        assert bool(finished)
        np.testing.assert_array_equal(np.asarray(alive), want)
        assert int(n_act) == n_fam

        # branch coverage: A ends inside the banded k=1 (96 actives in
        # the (s_pad, _MID_MAX] window), B undershoots s_pad in tier-2
        # (finish block runs). Derived from the sim so constant drift
        # fails loudly here, not silently skipping a tier.
        pre_k1 = actives[-2]
        if expect_k1_banded:
            assert s_pad < pre_k1 <= rmsd_prune._MID_MAX
        else:
            assert pre_k1 <= s_pad


def test_pair_kill_rect_compact_ambiguous_paths(monkeypatch):
    '''The compacted ambiguous-pair second gate (fixed gather slots)
    must agree with the dense whole-tile rotation branch, including
    the slots-overflow fallback: ensembles engineered so many pairs
    sit in the ambiguous rmsd band [thr/2, thr), some passing the
    maxdev gate (multi-atom spread) and some vetoed by it (one-atom
    spike), at N=16 where the sqrt(N) bound cannot shortcut.'''
    rng = np.random.default_rng(41)
    n, n_atoms = 512, 16
    base = rng.normal(size=(n // 8, n_atoms, 3)) * 4.0
    hs0 = np.repeat(base, 8, axis=0).copy()
    for i in range(n):
        kind = i % 4
        if kind == 1:      # gate1 direct kill: tiny noise duplicate
            hs0[i] += rng.normal(size=(n_atoms, 3)) * 0.01
        elif kind == 2:    # ambiguous + killed: spread over 4 atoms
            hs0[i, :4] += rng.normal(size=(4, 3)) * 0.32
        elif kind == 3:    # ambiguous + vetoed: one-atom spike
            hs0[i, 0] += np.array([1.5, 0.0, 0.0])
    hs = jnp.asarray(hs0 - hs0.mean(axis=1, keepdims=True))
    alive = jnp.ones(n, dtype=bool)
    thr = jnp.asarray(0.5, hs.dtype)
    nn = jnp.asarray(n, jnp.int32)

    # stop_below=0 drives every eligible k here (default _FINISH_MAX
    # would gate the whole loop off at n=512); k=1 stays ineligible
    # for the band (one 512-run) and is skipped before it, preserving
    # ok semantics for the ks that did run
    run = lambda: np.asarray(rmsd_prune._mid_body(
        hs, alive, nn, thr, s_mid=512,
        band=rmsd_prune._MID_BAND, stop_below=0)[0])

    got_compact = run()
    # dense fallback everywhere: slots=0 means n_amb <= slots only for
    # clean tiles (both cond branches trace, so slots must stay >= 0)
    monkeypatch.setattr(rmsd_prune, '_AMB_SLOTS', 0)
    got_dense = run()
    # tiny slot count: ambiguous counts overflow -> per-tile fallback mix
    monkeypatch.setattr(rmsd_prune, '_AMB_SLOTS', 2)
    got_mixed = run()
    np.testing.assert_array_equal(got_compact, got_dense)
    np.testing.assert_array_equal(got_compact, got_mixed)

    # the engineered bands actually exercised both gate outcomes: tiny-
    # noise duplicates died (gate1) while one-atom spikes with rmsd in
    # the band survived through the maxdev veto (gate2)
    assert 0 < got_compact.sum() < n
    # pairwise oracle agreement on the two engineered extremes
    p0 = np.asarray(hs[0])
    r_dup, md_dup = oracles.rmsd_and_max(p0.copy(), np.asarray(hs[1]))
    assert r_dup < 0.5 and md_dup < 1.0          # killable duplicate
    r_spk, md_spk = oracles.rmsd_and_max(p0.copy(), np.asarray(hs[3]))
    assert r_spk < 0.5 <= md_spk / 2.0           # ambiguous, vetoed


def test_mid_body_band_variant_dispatch():
    '''Each eligible banded pass dispatches the narrowest window
    covering its current max run. Long same-chunk runs (~300 rows,
    duplicate partners 300 slots apart) force the WIDE variant; the
    result must not depend on the cap width as long as the runs fit
    (cap 512 vs 1024), and must match the sequential oracle for the
    pass that can see those pairs (k=10, chunk span 409).'''
    rng = np.random.default_rng(53)
    n = 4096
    hs0 = rng.normal(size=(n, 4, 3)) * 3.0
    # duplicate partners 300 apart: same chunk only once spans >= 300
    for i in range(0, n - 300, 409):
        hs0[i + 300] = hs0[i] + rng.normal(size=(4, 3)) * 0.01
    hs = jnp.asarray(hs0 - hs0.mean(axis=1, keepdims=True))
    alive = jnp.ones(n, dtype=bool)
    thr = jnp.asarray(0.5, hs.dtype)
    nn = jnp.asarray(n, jnp.int32)

    # skip k<=5: their near-full chunk spans (819/2048/4096 rows)
    # exceed any cap and would legitimately flip ok False
    out = {}
    for cap in (512, 1024):
        a, ok, _ = rmsd_prune._mid_body(hs, alive, nn, thr,
                                        s_mid=4096, band=cap,
                                        stop_below=0, skip_ks=(5, 2, 1))
        assert bool(ok)
        out[cap] = np.asarray(a)
    np.testing.assert_array_equal(out[512], out[1024])

    # every planted 300-apart duplicate pair lost its EARLIER member
    # (kill rule: i dies to a later same-chunk match) at the k=10 pass
    for i in range(0, n - 300, 409):
        assert not out[1024][i], i
        assert out[1024][i + 300], i + 300
