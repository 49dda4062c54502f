'''Checkpoint/resume: an interrupted run continues from its
tscode_resume_<stamp>.pkl with identical results (the reference never
implemented its -r flag, __main__.py:104-111 — here resume is real).'''

import os
import shutil

import numpy as np
import pytest

from tscode_tpu.embedder import Embedder
from tscode_tpu.errors import InputError

FIX = os.path.join(os.path.dirname(__file__), 'fixtures')


def _embedder(tmp_path, content, stamp, files=('C2H4.xyz', 'CH3Cl.xyz')):
    for name in files:
        if not (tmp_path / name).exists():
            shutil.copy(os.path.join(FIX, name), tmp_path)
    inp = tmp_path / 'input.txt'
    inp.write_text(content)
    return Embedder(str(inp), stamp=stamp)


def test_resume_skips_completed_stages(tmp_path):
    content = 'NOOPT\nC2H4.xyz 0\nCH3Cl.xyz 0\n'
    cwd = os.getcwd()
    try:
        emb = _embedder(tmp_path, content, 'res1')
        run1 = emb.run()
        first = np.array(run1.structures)
        pkl = tmp_path / 'tscode_resume_res1.pkl'
        assert pkl.exists(), 'resume checkpoint not written'

        emb2 = _embedder(tmp_path, content, 'res2')
        run2 = emb2.run(resume_from=str(pkl))
        second = np.array(run2.structures)
    finally:
        os.chdir(cwd)

    assert first.shape == second.shape
    assert np.allclose(first, second)
    log = (tmp_path / 'tscode_res2.log').read_text()
    assert 'Resumed' in log
    # the embed stage must NOT have rerun
    assert 'Performing string embed' not in log


def test_resume_rejects_mismatched_embed(tmp_path):
    cwd = os.getcwd()
    try:
        emb = _embedder(tmp_path, 'NOOPT\nC2H4.xyz 0\nCH3Cl.xyz 0\n', 'resa')
        emb.run()
        pkl = tmp_path / 'tscode_resume_resa.pkl'

        # different embed type (monomolecular) must refuse the checkpoint
        shutil.copy(os.path.join(FIX, 'HCOOOH.xyz'), tmp_path)
        emb2 = _embedder(tmp_path, 'NOOPT\nHCOOOH.xyz 0 4\n', 'resb',
                         files=('HCOOOH.xyz',))
        with pytest.raises(InputError):
            emb2.run(resume_from=str(pkl))
    finally:
        os.chdir(cwd)
