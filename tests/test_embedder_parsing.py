'''Input DSL parsing tests: keywords, pairings, internal constraints,
operators, attributes — hermetic (no embed run).'''

import os
import shutil

import numpy as np
import pytest

from tscode_tpu.embedder import Embedder

FIX = os.path.join(os.path.dirname(__file__), 'fixtures')


def _make_embedder(tmp_path, content, stamp='parse'):
    for name in ('C2H4.xyz', 'CH3Cl.xyz', 'C2F2H4.xyz'):
        shutil.copy(os.path.join(FIX, name), tmp_path)
    inp = tmp_path / 'input.txt'
    inp.write_text(content)
    cwd = os.getcwd()
    try:
        return Embedder(str(inp), stamp=stamp)
    finally:
        os.chdir(cwd)


def test_pairings_letters_and_cumulative_indices(tmp_path):
    emb = _make_embedder(tmp_path,
                         'NOOPT RIGID\nC2H4.xyz 0a 3b\nC2H4.xyz 0b 3a\n')
    # cumulative: second molecule offsets by 6
    assert emb.pairings_table == {'a': [0, 9], 'b': [3, 6]}
    assert emb.embed == 'cyclical'


def test_unbalanced_letter_raises(tmp_path):
    with pytest.raises(SyntaxError, match="only specified once"):
        _make_embedder(tmp_path, 'NOOPT\nC2H4.xyz 0a 3\nC2H4.xyz 0 3\n')


def test_internal_constraint_detection(tmp_path):
    # same letter twice on one molecule + DIST -> internal constraint,
    # and those indices are NOT reactive
    emb = _make_embedder(
        tmp_path, 'NOOPT RIGID DIST(a=2.5)\n'
                  'C2F2H4.xyz 3a 5a 0 1\nC2H4.xyz 0 3\n')
    assert [3, 5] in emb.internal_constraints.tolist()
    assert sorted(emb.objects[0].reactive_indices.tolist()) == [0, 1]


def test_unlabeled_pair_becomes_question_pairing(tmp_path):
    emb = _make_embedder(tmp_path,
                         'NOOPT RIGID\nC2H4.xyz 0 3\nC2H4.xyz 0 3\n')
    # two unlabeled indices per molecule: no '?' (that needs exactly 2
    # unlabeled TOTAL)
    assert '?' not in emb.pairings_table

    emb2 = _make_embedder(tmp_path,
                          'NOOPT\nC2H4.xyz 0\nCH3Cl.xyz 0\n',
                          stamp='parse2')
    assert emb2.pairings_table.get('?') == [0, 6]


def test_molecule_attributes_and_operators(tmp_path):
    emb = _make_embedder(
        tmp_path, 'NOOPT\nC2F2H4.xyz 3 5 charge=-1\nC2H4.xyz 0 3\n')
    assert emb.objects[0].attrs['charge'] == '-1'

    emb2 = _make_embedder(
        tmp_path, 'NOOPT DRYRUN\nrsearch> C2F2H4.xyz\nC2H4.xyz\n',
        stamp='parse3')
    # operator recorded (dryrun skips execution)
    assert emb2.options.operators_dict.get(0) == ['rsearch']
    assert emb2.embed is None


def test_keyword_case_and_paren_args(tmp_path):
    emb = _make_embedder(
        tmp_path, 'noopt rigid clashes(num=2,dist=1.1) rmsd=0.3 '
                  'rotrange=30\nC2H4.xyz 0 3\nC2H4.xyz 0 3\n',
        stamp='parse4')
    assert emb.options.max_clashes == 2
    assert emb.options.clash_thresh == 1.1
    assert emb.options.rmsd == 0.3
    assert emb.options.rotation_range == 30


def test_dist_updates_orbitals_and_pairing_dists(tmp_path):
    emb = _make_embedder(
        tmp_path, 'NOOPT RIGID DIST(a=3.0)\nC2H4.xyz 0a 3\nC2H4.xyz 0a 3\n',
        stamp='parse5')
    assert emb.pairing_dists['a'] == 3.0
    # orbital half-length becomes dist/2 on the paired atoms
    assert emb.objects[0].get_orbital_length(0) == pytest.approx(1.5)
    assert emb.get_pairing_dist_from_letter('a') == 3.0


def test_check_keyword_writes_hypermolecules_and_exits(tmp_path):
    '''CHECK writes orbital-inspection files and stops the run
    (reference embedder.py:164-165, :922-934 — GUI replaced by files).'''
    import shutil

    import pytest

    from tscode_tpu.embedder import Embedder

    for name in ('C2H4.xyz', 'CH3Cl.xyz'):
        shutil.copy(os.path.join(FIX, name), tmp_path)
    inp = tmp_path / 'input.txt'
    inp.write_text('NOOPT CHECK\nC2H4.xyz 0\nCH3Cl.xyz 0\n')
    cwd = os.getcwd()
    try:
        with pytest.raises(SystemExit):
            Embedder(str(inp), stamp='chk')
    finally:
        os.chdir(cwd)
    assert (tmp_path / 'C2H4_hypermolecule.xyz').exists()
    assert (tmp_path / 'CH3Cl_hypermolecule.xyz').exists()


def test_keyword_presets_and_values(tmp_path):
    '''DEEP presets, NEWBONDS, ROTRANGE, SOLVENT synonym mapping, LET,
    CONFS in one parse (reference embedder_options.py setters).'''
    emb = _make_embedder(
        tmp_path,
        'NOOPT DEEP NEWBONDS=2 ROTRANGE=30 SOLVENT=etoh LET CONFS=17\n'
        'C2H4.xyz 0\nCH3Cl.xyz 0\n', stamp='parsekw')
    o = emb.options
    assert o.rmsd == 0.1                 # DEEP preset
    assert o.max_clashes == 1            # DEEP loosens clashes
    assert o.max_newbonds == 2
    assert o.rotation_range == 30
    assert o.solvent == 'ethanol'        # synonym resolved
    assert o.let is True
    assert o.max_confs == 17


def test_unknown_keyword_raises(tmp_path):
    import shutil

    for name in ('C2H4.xyz', 'CH3Cl.xyz'):
        shutil.copy(os.path.join(FIX, name), tmp_path)
    inp = tmp_path / 'input.txt'
    inp.write_text('NOOPT FROBNICATE\nC2H4.xyz 0\nCH3Cl.xyz 0\n')
    cwd = os.getcwd()
    try:
        with pytest.raises(SyntaxError):
            Embedder(str(inp), stamp='parsebad')
    finally:
        os.chdir(cwd)
