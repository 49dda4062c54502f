'''Full refinement pipeline (FF pre-opt/loose/tight + semiempirical
loose/tight) driven end-to-end with a canned xtb — the production path
that normally requires external binaries (reference
embedder.py:1390-1829).'''

import os
import shutil

import numpy as np
import pytest

from tscode_tpu.embedder import Embedder

FIX = os.path.join(os.path.dirname(__file__), 'fixtures')


def _fake_xtb_opt(coords, atomnos, constrained_indices=None,
                  constrained_distances=None, method=None, **kw):
    '''Deterministic stand-in: tiny contraction toward the centroid plus
    an energy keyed on the geometry so sorting is stable.'''
    coords = np.asarray(coords, dtype=float)
    out = coords * 0.999 + coords.mean(axis=0) * 0.001
    energy = float(np.sum(out ** 2)) * 0.01
    return out, energy, True


def _fake_xtb_pre_opt(coords, atomnos, graphs=None, **kw):
    return _fake_xtb_opt(coords, atomnos)


def test_full_refinement_pipeline_with_canned_xtb(tmp_path, monkeypatch):
    monkeypatch.setattr('tscode_tpu.calculators.xtb.xtb_opt',
                        _fake_xtb_opt)
    monkeypatch.setattr('tscode_tpu.calculators.xtb.xtb_pre_opt',
                        _fake_xtb_pre_opt)

    for name in ('C2H4.xyz', 'CH3Cl.xyz'):
        shutil.copy(os.path.join(FIX, name), tmp_path)
    inp = tmp_path / 'input.txt'
    inp.write_text('CALC=XTB FFCALC=XTB FFOPT=ON ONLYREFINED KCAL=50\n'
                   'C2H4.xyz 0\nCH3Cl.xyz 0\n')
    cwd = os.getcwd()
    try:
        emb = Embedder(str(inp), stamp='refine_e2e')
        assert emb.options.optimization
        assert emb.options.ff_opt
        run = emb.run()
    finally:
        os.chdir(cwd)

    assert len(run.structures) > 0
    # energies populated and sorted ascending by the final sort
    rel = run.energies - run.energies.min()
    assert np.all(np.diff(rel) >= -1e-9)
    # every survivor passed the canned optimizer
    assert run.exit_status.astype(bool).all()

    log = (tmp_path / 'tscode_refine_e2e.log').read_text()
    assert 'Structure optimization (loose)' in log
    assert 'Structure optimization (tight)' in log
    # checkpoint artifacts from both levels
    assert (tmp_path / 'tscode_checkpoint_refine_e2e.xyz').exists() or \
        (tmp_path / 'tscode_poses_refine_e2e.xyz').exists()

    import json
    report = json.loads(
        (tmp_path / 'tscode_report_refine_e2e.json').read_text())
    stages = [s['stage'] for s in report['stages']]
    assert 'force_field_refining' in stages
    assert 'optimization_refining' in stages


def test_resume_after_mid_refinement_crash(tmp_path, monkeypatch):
    '''An xtb crash mid-FF-refinement leaves the pruned-stage
    checkpoint; resuming with a working calculator completes the run
    without regenerating or re-pruning.'''
    calls = {'n': 0}

    def crashing_xtb(coords, atomnos, **kw):
        calls['n'] += 1
        raise RuntimeError('xtb exploded')

    monkeypatch.setattr('tscode_tpu.calculators.xtb.xtb_opt', crashing_xtb)
    monkeypatch.setattr('tscode_tpu.calculators.xtb.xtb_pre_opt',
                        crashing_xtb)

    for name in ('C2H4.xyz', 'CH3Cl.xyz'):
        shutil.copy(os.path.join(FIX, name), tmp_path)
    inp = tmp_path / 'input.txt'
    inp.write_text('CALC=XTB FFCALC=XTB FFOPT=ON\n'
                   'C2H4.xyz 0\nCH3Cl.xyz 0\n')
    cwd = os.getcwd()
    try:
        emb = Embedder(str(inp), stamp='crash1')
        with pytest.raises(Exception):
            emb.run()
        pkl = tmp_path / 'tscode_resume_crash1.pkl'
        assert pkl.exists(), 'no checkpoint before the crash'

        # second attempt: calculator fixed, resume from the checkpoint
        monkeypatch.setattr('tscode_tpu.calculators.xtb.xtb_opt',
                            _fake_xtb_opt)
        monkeypatch.setattr('tscode_tpu.calculators.xtb.xtb_pre_opt',
                            _fake_xtb_pre_opt)
        emb2 = Embedder(str(inp), stamp='crash2')
        run = emb2.run(resume_from=str(pkl))
    finally:
        os.chdir(cwd)

    assert len(run.structures) > 0
    assert run.exit_status.astype(bool).all()
    log = (tmp_path / 'tscode_crash2.log').read_text()
    assert 'Resumed' in log
    assert 'Performing string embed' not in log     # generation skipped


def test_saddle_refining_stage(tmp_path, monkeypatch):
    '''SADDLE: every optimized candidate goes through the dimer
    refinement on the run's QM surface (reference embedder.py:1985-2051
    uses Sella + the QM calculator); here with a canned gradient.'''
    monkeypatch.setattr('tscode_tpu.calculators.xtb.xtb_opt',
                        _fake_xtb_opt)
    monkeypatch.setattr('tscode_tpu.calculators.xtb.xtb_pre_opt',
                        _fake_xtb_pre_opt)

    def fake_xtb_gradient(coords, atomnos, **kw):
        # harmonic well around the current geometry: dimer converges
        coords = np.asarray(coords)
        return float(np.sum(coords ** 2)) * 0.01, coords * 0.02

    monkeypatch.setattr('tscode_tpu.calculators.gradients.xtb_gradient',
                        fake_xtb_gradient)

    for name in ('C2H4.xyz', 'CH3Cl.xyz'):
        shutil.copy(os.path.join(FIX, name), tmp_path)
    inp = tmp_path / 'input.txt'
    inp.write_text('CALC=XTB FFOPT=OFF SADDLE\n'
                   'C2H4.xyz 0\nCH3Cl.xyz 0\n')
    cwd = os.getcwd()
    try:
        emb = Embedder(str(inp), stamp='sad_e2e')
        run = emb.run()
    finally:
        os.chdir(cwd)

    log = (tmp_path / 'tscode_sad_e2e.log').read_text()
    assert 'Saddle refinement' in log
    assert (tmp_path / f'tscode_saddle_{run.stamp}.xyz').exists()
    assert np.isfinite(run.structures).all()


def test_mtd_augmentation_stage(tmp_path, monkeypatch):
    '''MTD keyword: each candidate is augmented with metadynamics
    conformers between FF and SE refinement (reference
    embedder.py:1858-1891).'''
    monkeypatch.setattr('tscode_tpu.calculators.xtb.xtb_opt',
                        _fake_xtb_opt)
    monkeypatch.setattr('tscode_tpu.calculators.xtb.xtb_pre_opt',
                        _fake_xtb_pre_opt)

    def fake_metadyn(coords, atomnos, constrained_indices=None,
                     new_structures=5, title='x', **kw):
        rng = np.random.default_rng(0)
        return np.asarray(coords)[None] + rng.normal(
            size=(new_structures,) + np.asarray(coords).shape) * 0.02

    monkeypatch.setattr(
        'tscode_tpu.calculators.xtb.xtb_metadyn_augmentation',
        fake_metadyn)

    for name in ('C2H4.xyz', 'CH3Cl.xyz'):
        shutil.copy(os.path.join(FIX, name), tmp_path)
    inp = tmp_path / 'input.txt'
    inp.write_text('CALC=XTB FFOPT=OFF MTD\nC2H4.xyz 0\nCH3Cl.xyz 0\n')
    cwd = os.getcwd()
    try:
        emb = Embedder(str(inp), stamp='mtd_e2e')
        run = emb.run()
    finally:
        os.chdir(cwd)

    log = (tmp_path / 'tscode_mtd_e2e.log').read_text()
    assert 'Metadynamics augmentation completed' in log
    assert len(run.structures) > 0
