'''End-to-end pipeline tests: full Embedder.run() on tiny inputs with
NOOPT (pure-geometry path, no external calculators), checking that the
output ensembles are written, finite and non-empty.

These exercise the same driver loop as the reference's installation
tests (reference tests.py:60-147) but hermetically, in pytest.'''

import os
import shutil

import numpy as np
import pytest

from tscode_tpu.embedder import Embedder

FIX = os.path.join(os.path.dirname(__file__), 'fixtures')


def _read_frames(path):
    '''Parse a multi-frame xyz, return list of (natoms, coords).'''
    frames = []
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        if not lines[i].strip():
            i += 1
            continue
        n = int(lines[i])
        coords = np.array([[float(x) for x in ln.split()[1:4]]
                           for ln in lines[i + 2:i + 2 + n]])
        frames.append((n, coords))
        i += 2 + n
    return frames


def _run(tmp_path, content, stamp, files=('C2H4.xyz', 'CH3Cl.xyz')):
    for name in files:
        shutil.copy(os.path.join(FIX, name), tmp_path)
    inp = tmp_path / 'input.txt'
    inp.write_text(content)
    cwd = os.getcwd()
    try:
        emb = Embedder(str(inp), stamp=stamp)
        run = emb.run()
        return run, tmp_path
    finally:
        os.chdir(cwd)


def test_string_embed_end_to_end(tmp_path):
    run, d = _run(tmp_path, 'NOOPT\nC2H4.xyz 0\nCH3Cl.xyz 0\n', 'e2e_str')
    out = d / f'tscode_unoptimized_{run.stamp}.xyz'
    assert out.exists()
    frames = _read_frames(out)
    assert len(frames) == len(run.structures) > 0
    natoms = run.objects[0].atomcoords.shape[1] + run.objects[1].atomcoords.shape[1]
    assert all(n == natoms for n, _ in frames)
    assert all(np.isfinite(c).all() for _, c in frames)


def test_cyclical_rigid_end_to_end(tmp_path):
    run, d = _run(tmp_path,
                  'NOOPT RIGID STEPS=6\nC2H4.xyz 0a 3b\nC2H4.xyz 0b 3a\n',
                  'e2e_cyc')
    out = d / f'tscode_unoptimized_{run.stamp}.xyz'
    assert out.exists()
    frames = _read_frames(out)
    assert len(frames) == len(run.structures) > 0
    assert all(n == 12 for n, _ in frames)
    # constrained pairing distances should sit near the orbital target
    for letter in ('a', 'b'):
        i1, i2 = run.pairings_table[letter]
        target = run.get_pairing_dist_from_letter(letter)
        d01 = np.linalg.norm(run.structures[0][i1] - run.structures[0][i2])
        assert abs(d01 - target) < 1.0


def test_monomolecular_end_to_end(tmp_path):
    run, d = _run(tmp_path, 'NOOPT CONFS=1\nC2F2H4.xyz 3 5\n',
                  'e2e_mono', files=('C2F2H4.xyz',))
    out = d / f'tscode_unoptimized_{run.stamp}.xyz'
    assert out.exists()
    frames = _read_frames(out)
    assert len(frames) == len(run.structures) > 0
    assert all(np.isfinite(c).all() for _, c in frames)


def test_chelotropic_end_to_end(tmp_path):
    # modeled on the reference's chelotropic.txt fixture (minus SADDLE,
    # which needs a QM calculator): 2 + 1 reactive atoms
    run, d = _run(tmp_path,
                  'NOOPT RIGID STEPS=3 DIST(A=2.5,B=2.5)\n'
                  'C2H4.xyz 0A 3B\nHCOOOH.xyz 4AB\n',
                  'e2e_chel', files=('C2H4.xyz', 'HCOOOH.xyz'))
    assert run.embed == 'chelotropic'
    out = d / f'tscode_unoptimized_{run.stamp}.xyz'
    assert out.exists()
    frames = _read_frames(out)
    assert len(frames) == len(run.structures) > 0
    assert all(np.isfinite(c).all() for _, c in frames)


def test_trimolecular_end_to_end(tmp_path):
    # modeled on the reference's trimolecular.txt fixture (BYPASS dumps
    # every embedded pose; x/y NCI pairings, C internal constraint)
    run, d = _run(tmp_path,
                  'BYPASS DIST(A=2.5,x=2,y=2.5,C=1) SHRINK ROTRANGE=10 '
                  'STEPS=1\nCH3Cl.xyz 0A 4y\nHCOOH.xyz 1A 4x 0C 2C\n'
                  'HCOOH.xyz 1x 4y\n',
                  'e2e_tri', files=('CH3Cl.xyz', 'HCOOH.xyz'))
    assert run.embed == 'cyclical'
    out = d / f'tscode_embedded_{run.stamp}.xyz'
    assert out.exists()
    frames = _read_frames(out)
    assert len(frames) == len(run.structures) > 0
    n_tot = sum(m.atomcoords.shape[1] for m in run.objects)
    assert all(n == n_tot for n, _ in frames)


def test_refine_operator_end_to_end(tmp_path):
    # build a small ensemble file: 3 near-duplicate + 1 distinct frame
    rng = np.random.default_rng(0)
    src = os.path.join(FIX, 'C2F2H4.xyz')
    with open(src) as f:
        lines = f.read().splitlines()
    n = int(lines[0])
    syms = [ln.split()[0] for ln in lines[2:2 + n]]
    base = np.array([[float(x) for x in ln.split()[1:4]]
                     for ln in lines[2:2 + n]])
    ens = tmp_path / 'ens.xyz'
    with open(ens, 'w') as f:
        for k, c in enumerate((base, base + 1e-4, base + 2e-4,
                               base + rng.normal(0, 1.2, base.shape))):
            f.write(f'{n}\nframe {k}\n')
            for s, xyz in zip(syms, c):
                f.write(f'{s} {xyz[0]:.6f} {xyz[1]:.6f} {xyz[2]:.6f}\n')

    inp = tmp_path / 'input.txt'
    inp.write_text('NOOPT REFINE\nens.xyz\n')
    cwd = os.getcwd()
    try:
        emb = Embedder(str(inp), stamp='e2e_ref')
        run = emb.run()
    finally:
        os.chdir(cwd)
    # the three near-duplicates collapse to one; the distinct one survives
    assert len(run.structures) == 2


def test_bypass_dumps_every_embedded_pose(tmp_path):
    run, d = _run(tmp_path,
                  'BYPASS RIGID STEPS=4\nC2H4.xyz 0a 3b\nC2H4.xyz 0b 3a\n',
                  'e2e_byp')
    out = d / f'tscode_embedded_{run.stamp}.xyz'
    frames = _read_frames(out)
    # BYPASS skips pruning/optimization: everything embedded is dumped
    assert len(frames) == len(run.structures) > 0


def test_rmsd_threshold_changes_survivors(tmp_path):
    base = 'NOOPT\nC2H4.xyz 0\nCH3Cl.xyz 0\n'
    r1, _ = _run(tmp_path, base, 'e2e_r05')
    r2, _ = _run(tmp_path, 'RMSD=0.05 ' + base, 'e2e_r005')
    # a much tighter threshold keeps at least as many structures
    assert len(r2.structures) >= len(r1.structures)


def test_clashes_keyword_loosens_screen(tmp_path):
    tight = 'NOOPT RIGID STEPS=4 CLASHES(num=0,dist=1.8)\n' \
            'C2H4.xyz 0a 3b\nC2H4.xyz 0b 3a\n'
    loose = 'NOOPT RIGID STEPS=4 CLASHES(num=5,dist=1.0)\n' \
            'C2H4.xyz 0a 3b\nC2H4.xyz 0b 3a\n'
    rt, _ = _run(tmp_path, tight, 'e2e_ct')
    rl, _ = _run(tmp_path, loose, 'e2e_cl')
    assert len(rl.structures) >= len(rt.structures)


def test_shrink_scales_orbital_length(tmp_path):
    r1, _ = _run(tmp_path, 'NOOPT DRYRUN\nC2H4.xyz 0\nCH3Cl.xyz 0\n',
                 'e2e_s1')
    r2, _ = _run(tmp_path, 'NOOPT DRYRUN SHRINK=2\nC2H4.xyz 0\n'
                           'CH3Cl.xyz 0\n', 'e2e_s2')
    l1 = r1.objects[0].get_orbital_length(0)
    l2 = r2.objects[0].get_orbital_length(0)
    assert l2 == pytest.approx(2 * l1)


def test_multiembed_end_to_end(tmp_path):
    '''2 molecules with (3, 2) reactive atoms route to the multiembed
    arrangement sweep (reference multiembed.py:26-82): every pairwise
    arrangement embedded in-process, results concatenated and pruned.'''
    run, d = _run(tmp_path, 'NOOPT RIGID\nHCOOH.xyz 0 1 3\nC2H4.xyz 0 1\n',
                  'e2e_multi', files=('HCOOH.xyz', 'C2H4.xyz'))
    assert run.embed == 'multiembed'
    out = d / f'tscode_unoptimized_{run.stamp}.xyz'
    assert out.exists()
    frames = _read_frames(out)
    assert len(frames) == len(run.structures) > 0
    natoms = (run.objects[0].atomcoords.shape[1]
              + run.objects[1].atomcoords.shape[1])
    assert all(n == natoms for n, _ in frames)
    log = (d / 'tscode_e2e_multi.log').read_text()
    assert 'Multiembed' in log


def test_run_report_written(tmp_path):
    '''A machine-readable per-stage report sits beside the log.'''
    import json

    run, d = _run(tmp_path, 'NOOPT\nC2H4.xyz 0\nCH3Cl.xyz 0\n', 'e2e_rep')
    report_path = d / f'tscode_report_{run.stamp}.json'
    assert report_path.exists()
    report = json.loads(report_path.read_text())
    stages = [s['stage'] for s in report['stages']]
    assert 'generate_candidates' in stages
    assert 'similarity_refining' in stages
    assert report['final_structures'] == len(run.structures)
    assert all(s['seconds'] >= 0 for s in report['stages'])


def test_multiconformer_cyclical_scale(tmp_path):
    '''8x8 conformer cyclical embed: 27k candidate grid through the full
    pipeline, exercising block chunking/padding at real ensemble scale.'''
    from tscode_tpu.io_xyz import read_xyz, write_xyz

    rng = np.random.default_rng(0)
    for name in ('C2H4.xyz', 'CH3Cl.xyz'):
        data = read_xyz(os.path.join(FIX, name))
        base = data.atomcoords[0]
        with open(tmp_path / name, 'w') as f:
            for c in range(8):
                write_xyz(base + rng.normal(size=base.shape) * 0.1,
                          data.atomnos, f, title=f'conf{c}')

    inp = tmp_path / 'input.txt'
    inp.write_text('NOOPT RIGID DIST(a=2.2,b=2.3)\n'
                   'C2H4.xyz 0a 3b\nCH3Cl.xyz 0a 4b\n')
    cwd = os.getcwd()
    try:
        emb = Embedder(str(inp), stamp='e2e_scale')
        run = emb.run()
    finally:
        os.chdir(cwd)

    assert len(run.structures) > 20
    # every surviving pose satisfies both imposed distances loosely
    for pose, cons in zip(run.structures[:10], run.constrained_indices[:10]):
        for (i, j) in cons:
            d = np.linalg.norm(pose[i] - pose[j])
            assert 1.0 < d < 4.0, (i, j, d)


def test_debug_keyword_writes_stage_dumps(tmp_path):
    '''DEBUG: hypermolecule files + per-stage structure/energy/constraint
    dumps and the state pickle (reference embedder.py:1179-1228).'''
    run, d = _run(tmp_path, 'NOOPT DEBUG\nC2H4.xyz 0\nCH3Cl.xyz 0\n',
                  'e2e_dbg')
    assert (d / 'C2H4_hypermolecule.xyz').exists()
    dumps = list(d.glob('*_structures.xyz'))
    assert dumps, 'no stage structure dumps written'
    assert list(d.glob('*_constraints.dat'))


def test_neb_operator_two_structures(tmp_path):
    '''neb> with reagent+product frames: IDPP band + CI-NEB on the
    internal FF, MEP and TS-guess artifacts written.'''
    from tscode_tpu.io_xyz import read_xyz, write_xyz

    data = read_xyz(os.path.join(FIX, 'HCOOH.xyz'))
    base = data.atomcoords[0]
    # product: OH proton moved toward the carbonyl O (toy rearrangement)
    prod = base.copy()
    prod[4] = base[1] + (base[4] - base[1]) * 0.4
    with open(tmp_path / 'ends.xyz', 'w') as f:
        write_xyz(base, data.atomnos, f, title='reagent')
        write_xyz(prod, data.atomnos, f, title='product')

    inp = tmp_path / 'input.txt'
    inp.write_text('NOOPT IMAGES=7\nneb> ends.xyz\n')
    cwd = os.getcwd()
    try:
        emb = Embedder(str(inp), stamp='nebop')
        emb.run()
    finally:
        os.chdir(cwd)

    assert (tmp_path / 'ends_MEP.xyz').exists()
    assert (tmp_path / 'ends_NEB_TS.xyz').exists()
    assert (tmp_path / 'ends_NEB_plt.svg').exists()
    frames = _read_frames(tmp_path / 'ends_MEP.xyz')
    assert len(frames) == 7


def test_neb_operator_three_structures_interpolates_through_guess(tmp_path):
    from tscode_tpu.io_xyz import read_xyz, write_xyz

    data = read_xyz(os.path.join(FIX, 'HCOOH.xyz'))
    base = data.atomcoords[0]
    mid = base + 0.1
    end = base + 0.2
    with open(tmp_path / 'chain3.xyz', 'w') as f:
        for s, t in ((base, 'r'), (mid, 'ts'), (end, 'p')):
            write_xyz(s, data.atomnos, f, title=t)

    inp = tmp_path / 'input.txt'
    inp.write_text('NOOPT IMAGES=9\nneb> chain3.xyz\n')
    cwd = os.getcwd()
    try:
        emb = Embedder(str(inp), stamp='nebop3')
        emb.run()
    finally:
        os.chdir(cwd)

    frames = _read_frames(tmp_path / 'chain3_MEP.xyz')
    # 3 structures expand into the requested image count (half-bands
    # through the TS guess), not a 3-image band
    assert len(frames) == 9


def test_saddle_operator_writes_artifact(tmp_path):
    run, d = _run(tmp_path, 'NOOPT\nsaddle> HCOOH.xyz\n', 'sadop',
                  files=('HCOOH.xyz',))
    assert (d / 'HCOOH_saddle.xyz').exists()
    log = (d / 'tscode_sadop.log').read_text()
    assert 'dimer saddle refinement' in log


def test_csearch_operator_replaces_ensemble(tmp_path):
    '''csearch> on 1,2-difluoroethane (one rotable C-C bond): the
    molecule's ensemble is replaced by torsional conformers.'''
    run, d = _run(tmp_path, 'NOOPT\ncsearch> C2F2H4.xyz 3 5\n', 'csop',
                  files=('C2F2H4.xyz',))
    mol = run.objects[0]
    assert mol.n_confs >= 2           # systematic rotation found rotamers
    log = (d / 'tscode_csop.log').read_text()
    assert 'CSearch' in log
