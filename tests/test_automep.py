'''AutoMEP pure-helper tests (the full protocol needs XTB).'''

import numpy as np
import networkx as nx

from tscode_tpu.automep import cycle_to_dihedrals, get_exocyclic_dihedrals
from tscode_tpu.graphs import graphize


def _ring_coords(n=8, r=1.9):
    angles = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ring = np.stack([r * np.cos(angles), r * np.sin(angles),
                     0.05 * np.cos(3 * angles)], axis=1)
    return ring


def test_cycle_to_dihedrals():
    cycle = [0, 1, 2, 3, 4, 5, 6, 7]
    dihs = cycle_to_dihedrals(cycle)
    assert len(dihs) == 8
    assert dihs[0] == [0, 1, 2, 3]
    assert dihs[-1] == [7, 0, 1, 2]            # wraps around


def test_exocyclic_dihedrals():
    # 8-ring of carbons with one exocyclic H
    ring = _ring_coords(8)
    exo = ring[0] * 1.6                       # substituent on atom 0
    coords = np.vstack([ring, exo])
    atomnos = np.array([6] * 8 + [1])
    graph = graphize(coords, atomnos)
    cycle = next(c for c in nx.cycle_basis(graph) if len(c) == 8)
    exo_dihs = get_exocyclic_dihedrals(graph, cycle)
    assert len(exo_dihs) == 1
    assert exo_dihs[0][0] == 8                # exocyclic atom first
    assert exo_dihs[0][1] == 0                # anchored on ring atom 0
    assert all(i in cycle for i in exo_dihs[0][1:])
