'''NCI spotting tests on synthetic geometries.'''

import numpy as np

from tscode_tpu.nci import get_nci, _get_aromatic_centers


def test_hydrogen_bond_nci():
    # two fragments: an O-H pointing at an O of the other molecule
    coords = np.array([
        [0.0, 0.0, 0.0],     # O (mol 1)
        [0.95, 0.0, 0.0],    # H (mol 1)
        [2.8, 0.0, 0.0],     # O (mol 2) -> H...O 1.85 A, under 2.2
        [3.2, 0.9, 0.0],     # H (mol 2)
    ])
    atomnos = np.array([8, 1, 8, 1])
    nci, prints = get_nci(coords, atomnos, np.array([]), ids=(2, 2))
    types = [t for t, *_ in nci]
    assert 'O-H hydrogen bond' in types
    assert any('indices 1/2' in p for p in prints)


def test_constrained_atoms_excluded():
    coords = np.array([
        [0.0, 0.0, 0.0], [0.95, 0.0, 0.0],
        [2.8, 0.0, 0.0], [3.2, 0.9, 0.0]])
    atomnos = np.array([8, 1, 8, 1])
    nci, _ = get_nci(coords, atomnos, np.array([[1, 2]]), ids=(2, 2))
    assert not any(1 in n[1:] or 2 in n[1:] for n in nci)


def _benzene(center=np.zeros(3), z=0.0):
    ring = []
    for k in range(6):
        ang = np.radians(60 * k)
        ring.append(center + [1.39 * np.cos(ang), 1.39 * np.sin(ang), z])
    return np.array(ring)


def test_aromatic_center_detection_and_stacking():
    ring1 = _benzene()
    ring2 = _benzene(center=np.array([0.0, 0.0, 3.5]))
    coords = np.concatenate([ring1, ring2])
    atomnos = np.full(12, 6)
    symbols = ['C'] * 12
    centers = _get_aromatic_centers(coords, symbols, (6, 6))
    assert len(centers) == 2
    assert centers[0][0] == 0 and centers[1][0] == 1

    nci, prints = get_nci(coords, atomnos, np.array([]), ids=(6, 6))
    assert any('pi-stacking' in p for p in prints)
