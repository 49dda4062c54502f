'''scan> operator end-to-end: 2-index distance scans and 4-index
dihedral (atropisomer) scans on the hermetic internal-FF path
(reference operators.py:586-752, atropisomer_module.py:38-511).'''

import os
import shutil

import numpy as np
import pytest

from tscode_tpu.embedder import Embedder

FIX = os.path.join(os.path.dirname(__file__), 'fixtures')


def _run_scan(tmp_path, content, stamp, files):
    for name in files:
        shutil.copy(os.path.join(FIX, name), tmp_path)
    inp = tmp_path / 'input.txt'
    inp.write_text(content)
    cwd = os.getcwd()
    try:
        emb = Embedder(str(inp), stamp=stamp)
        # scan runs during operator application; the run() call routes
        # to the 'data' termination (reference embedder.py:628-634)
        emb.run()
        return emb
    finally:
        os.chdir(cwd)


def _reference_peaks(data, min_thr, max_thr):
    '''Sequential transcription of the reference rule (reference
    atropisomer_module.py:286-307) for oracle comparison: range(l-2)
    bound, python negative-index wrap at i=0, strict-left/loose-right
    neighbor test, threshold window, 5-point window maximum. i < 2
    window slices that the reference would crash on (empty max) are
    clipped exactly like the production function.'''
    l = len(data)
    return [i for i in range(l - 2) if (
        data[i - 1] < data[i] >= data[i + 1]
        and max_thr > data[i] > min_thr
        and data[i] == max(data[max(i - 2, 0):i + 3])
    )]


def test_atropisomer_peaks_reference_oracle():
    from tscode_tpu.scans import atropisomer_peaks

    # hand-built trace: shoulder peak at 4 (8.0) is NOT the 5-window
    # max (10.0 at index 6 within [4, 9)) -> rejected by the window
    # rule; the real peak at 6 survives; 14 is a plateau (loose right);
    # 18/19 are excluded by the range(l-2) bound
    trace = [0.0, 1.0, 0.5, 6.0, 8.0, 9.0, 10.0, 3.0, 2.0, 1.0,
             0.5, 0.8, 0.2, 5.0, 6.0, 6.0, 0.4, 0.1, 7.0, 7.5]
    got = atropisomer_peaks(trace, min_thr=0.1, max_thr=75)
    want = _reference_peaks(trace, 0.1, 75)
    assert got == want
    assert 4 not in got and 6 in got            # window rule
    assert 18 not in got and 19 not in got      # last-two exclusion

    # the shoulder at index 3 of a 1-degree-like noisy re-scan: local
    # max by neighbors but dominated within the 5-point window
    shoulder = [0.0, 2.0, 1.9, 2.1, 1.8, 2.5, 0.3, 0.2, 0.1, 0.0]
    got = atropisomer_peaks(shoulder, min_thr=0.1, max_thr=75)
    assert got == _reference_peaks(shoulder, 0.1, 75)
    assert 3 not in got and 5 in got

    # randomized traces: noisy scans over many seeds
    for seed in range(20):
        g = np.random.default_rng(seed)
        data = np.abs(np.cumsum(g.normal(size=36))) * 3.0
        data[0] = 0.0
        got = atropisomer_peaks(data, min_thr=0.5, max_thr=50)
        assert got == _reference_peaks(list(data), 0.5, 50)

    # wraparound quirk at i=0: the left neighbor is the LAST element,
    # so a final value >= the first rejects index 0
    wrap = [5.0, 1.0, 0.5, 0.2, 0.1, 0.3, 0.2, 6.0]
    got = atropisomer_peaks(wrap, min_thr=0.1, max_thr=75)
    assert got == _reference_peaks(wrap, 0.1, 75) == []
    # ...while a smaller final value admits it (clipped window)
    wrap[-1] = 4.0
    got = atropisomer_peaks(wrap, min_thr=0.1, max_thr=75)
    assert got == _reference_peaks(wrap, 0.1, 75) == [0]


def test_distance_scan_end_to_end(tmp_path):
    '''O...H approach scan on HCOOH: writes the trajectory, the peak
    structure and the SVG plot; energies finite.'''
    _run_scan(tmp_path, 'NOOPT\nscan> HCOOH.xyz 1 4\n', 'dscan',
              ('HCOOH.xyz',))
    scan_out = tmp_path / 'HCOOH_scan.xyz'
    max_out = tmp_path / 'HCOOH_scan_max.xyz'
    assert scan_out.exists(), 'scan trajectory not written'
    assert max_out.exists(), 'scan peak structure not written'
    svgs = list(tmp_path.glob('*_plt.svg'))
    assert svgs, 'scan SVG plot not written'

    # every frame in the scan has 5 atoms and finite coords; the scanned
    # O...H distance varies monotonically (approach: 2.4 A -> contact)
    lines = scan_out.read_text().splitlines()
    n = int(lines[0])
    assert n == 5
    dists = []
    i = 0
    while i < len(lines):
        if not lines[i].strip():
            i += 1
            continue
        frame = np.array([[float(x) for x in ln.split()[1:4]]
                          for ln in lines[i + 2:i + 2 + n]])
        assert np.isfinite(frame).all()
        dists.append(np.linalg.norm(frame[1] - frame[4]))
        i += 2 + n
    assert len(dists) > 3
    # approach scan: first frame is the most separated
    assert dists[0] == max(dists)
    assert min(dists) < dists[0] - 0.3


def test_dihedral_scan_end_to_end(tmp_path):
    '''F-C-C-F torsion drive on 1,2-difluoroethane: full-turn coarse
    scans complete on the FF surface in BOTH directions, each writing
    its own trajectory and SVG plot (reference runs a clockwise and a
    counterclockwise preliminary scan, atropisomer_module.py:107-131).'''
    _run_scan(tmp_path, 'NOOPT\nscan> C2F2H4.xyz 3 0 1 5\n', 'tscan',
              ('C2F2H4.xyz',))

    for direction in ('clockwise', 'counterclockwise'):
        out = tmp_path / f'C2F2H4_torsion_scan_{direction}.xyz'
        assert out.exists(), f'{direction} torsion trajectory not written'
        assert (tmp_path / f'C2F2H4_torsion_scan_{direction}_plt.svg'
                ).exists(), f'{direction} scan SVG not written'

        lines = out.read_text().splitlines()
        n = int(lines[0])
        assert n == 8
        # 10-degree preliminary steps over the full turn
        frames = []
        i = 0
        while i < len(lines):
            if not lines[i].strip():
                i += 1
                continue
            frames.append(np.array([[float(x) for x in ln.split()[1:4]]
                                    for ln in lines[i + 2:i + 2 + n]]))
            i += 2 + n
        assert len(frames) == 36

        # the driven dihedral actually sweeps: consecutive-frame deltas
        # cluster near the 10-degree step
        import jax.numpy as jnp

        from tscode_tpu.ops.linalg import dihedral as dihedral_fn
        angles = [float(np.asarray(dihedral_fn(
            jnp.asarray(f[[3, 0, 1, 5]])))) for f in frames]
        deltas = np.abs((np.diff(angles) + 180) % 360 - 180)
        assert np.median(deltas) == pytest.approx(10, abs=3)


def test_scan_rejects_bad_index_count(tmp_path):
    with pytest.raises(Exception):
        _run_scan(tmp_path, 'NOOPT\nscan> HCOOH.xyz 1 2 4\n', 'badscan',
                  ('HCOOH.xyz',))


def test_two_distance_scans_write_cumulative_plot(tmp_path):
    '''>1 scan> molecules trigger the unified scan plot at termination
    (reference embedder.py:2390, :2451-2475); a single scan must not.'''
    shutil.copy(os.path.join(FIX, 'HCOOH.xyz'), tmp_path / 'molB.xyz')
    _run_scan(tmp_path,
              'NOOPT\nscan> HCOOH.xyz 1 4\nscan> molB.xyz 1 4\n',
              'dscan2', ('HCOOH.xyz',))
    assert (tmp_path / 'tscode_dscan2_cumulative_plt.svg').exists() or \
        list(tmp_path.glob('*cumulative*.svg')), \
        'cumulative scan plot missing for a 2-scan run'


def test_single_scan_no_cumulative_plot(tmp_path):
    _run_scan(tmp_path, 'NOOPT\nscan> HCOOH.xyz 1 4\n', 'dscan3',
              ('HCOOH.xyz',))
    assert not list(tmp_path.glob('*cumulative*.svg'))


def test_dihedral_scan_peak_refinement(tmp_path, monkeypatch):
    '''Peak detection + 1-degree ad-libitum re-scan + pruned MOI-aligned
    maxima output, driven by an analytic 2-fold torsion potential
    patched into _relax_point (the internal FF has no torsion terms, so
    real peaks need this).'''
    import jax.numpy as jnp

    from tscode_tpu.ops.linalg import dihedral as dihedral_fn

    def fake_relax(embedder, mol, coords, pair=None, pair_dist=None,
                   dihedral=None, dihedral_angle=None, move_mask=None):
        # impose the requested dihedral exactly, energy = 2-fold cosine
        from tscode_tpu.rot_rmsd import _rotate
        from tscode_tpu.torsions import get_rotation_mask
        i1, i2, i3, i4 = dihedral
        cur = float(np.asarray(dihedral_fn(
            jnp.asarray(coords[[i1, i2, i3, i4]]))))
        mask = get_rotation_mask(mol.graph, tuple(dihedral))
        cand = _rotate(coords, tuple(dihedral), dihedral_angle - cur, mask)
        ach = float(np.asarray(dihedral_fn(
            jnp.asarray(cand[[i1, i2, i3, i4]]))))
        if abs((ach - dihedral_angle + 180) % 360 - 180) > 1e-3:
            cand = _rotate(coords, tuple(dihedral), cur - dihedral_angle,
                           mask)
            ach = float(np.asarray(dihedral_fn(
                jnp.asarray(cand[[i1, i2, i3, i4]]))))
        # barrier maxima at 90/270 degrees, 12 kcal/mol tall
        energy = 6.0 * (1 - np.cos(np.radians(2 * ach - 180.0)))
        return cand, energy

    monkeypatch.setattr('tscode_tpu.scans._relax_point', fake_relax)
    _run_scan(tmp_path, 'NOOPT\nscan> C2F2H4.xyz 3 0 1 5\n', 'tspeak',
              ('C2F2H4.xyz',))

    out = tmp_path / 'tscode_maxima_tspeak.xyz'
    assert out.exists(), 'scan produced no maxima ensemble'
    lines = out.read_text().splitlines()
    titles = [ln for ln in lines if 'maxima' in ln]
    # 2-fold potential, 2 directions: 1-4 distinct maxima after the
    # RMSD prune of the collected sub-peaks
    assert 1 <= len(titles) <= 4
    log = (tmp_path / 'tscode_tspeak.log').read_text()
    assert 'refined to' in log
    # barrier heights: relative energies within the maxima ensemble are
    # all ~equal (same 2-fold barrier) -> Rel. E. spread near zero
    import re
    rel_es = [float(re.search(r'Rel. E. = ([-\d.]+)', t).group(1))
              for t in titles]
    assert all(abs(e - rel_es[0]) < 0.2 for e in rel_es)
    # and the log records the ~12 kcal/mol barrier during refinement
    barriers = [float(m) for m in
                re.findall(r'refined to [-\d.]+ deg \(([-\d.]+) kcal',
                           log)]
    assert barriers and all(b > 6.0 for b in barriers)


def test_dihedral_scan_noncontiguous_needs_let(tmp_path):
    '''Non-contiguous quad indices abort without LET (reference
    atropisomer_module.py:86-92).'''
    with pytest.raises(Exception, match='LET|non-contiguous|syntax'):
        _run_scan(tmp_path, 'NOOPT\nscan> C2F2H4.xyz 3 0 1 4\n',
                  'tsnc', ('C2F2H4.xyz',))


def test_dihedral_scan_saddle_subpeak_refinement(tmp_path, monkeypatch):
    '''SADDLE keyword routes every sub-peak through the saddle driver
    (reference atropisomer_module.py:218-235): the refined geometries
    land in the maxima ensemble.'''
    import jax.numpy as jnp

    from tscode_tpu.ops.linalg import dihedral as dihedral_fn

    def fake_relax(embedder, mol, coords, pair=None, pair_dist=None,
                   dihedral=None, dihedral_angle=None, move_mask=None):
        from tscode_tpu.rot_rmsd import _rotate
        from tscode_tpu.torsions import get_rotation_mask
        i1, i2, i3, i4 = dihedral
        cur = float(np.asarray(dihedral_fn(
            jnp.asarray(coords[[i1, i2, i3, i4]]))))
        mask = get_rotation_mask(mol.graph, tuple(dihedral))
        cand = _rotate(coords, tuple(dihedral), dihedral_angle - cur, mask)
        ach = float(np.asarray(dihedral_fn(
            jnp.asarray(cand[[i1, i2, i3, i4]]))))
        if abs((ach - dihedral_angle + 180) % 360 - 180) > 1e-3:
            cand = _rotate(coords, tuple(dihedral), cur - dihedral_angle,
                           mask)
            ach = float(np.asarray(dihedral_fn(
                jnp.asarray(cand[[i1, i2, i3, i4]]))))
        return cand, 6.0 * (1 - np.cos(np.radians(2 * ach - 180.0)))

    calls = []

    def fake_saddle(coords, atomnos, graph, fmax=0.05):
        calls.append(1)
        return coords, 12.0, True

    monkeypatch.setattr('tscode_tpu.scans._relax_point', fake_relax)
    monkeypatch.setattr('tscode_tpu.saddle.saddle_refine_structure',
                        fake_saddle)
    _run_scan(tmp_path, 'SADDLE\nscan> C2F2H4.xyz 3 0 1 5\n',
              'tssad', ('C2F2H4.xyz',))

    assert calls, 'SADDLE scan never reached the saddle driver'
    assert (tmp_path / 'tscode_maxima_tssad.xyz').exists()
    log = (tmp_path / 'tscode_tssad.log').read_text()
    assert 'Saddle opt on sub-peak' in log
