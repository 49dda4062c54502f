'''
Pivot construction for cyclical embeds.

Builds, per conformer, every vector connecting two orbital lobes (on the
two reactive atoms, or on the single reactive atom for chelotropic
embeds) and applies the suprafacial / sigmastar filters.
(reference /root/reference/tscode/embedder.py:542-621)
'''

import numpy as np

from tscode_tpu.ops.linalg import cartesian_product
from tscode_tpu.molecule import Pivot


def get_pivots(mol):
    '''List (per conformer) of np.arrays of Pivot objects.'''
    if not mol.reactive_atoms:
        return []

    pivots_list = [[] for _ in range(mol.n_confs)]

    for c in range(mol.n_confs):
        r_atoms = mol.get_r_atoms(c)

        if len(r_atoms) == 2:
            a1, a2 = r_atoms
            indices = cartesian_product(np.arange(len(a1.center)),
                                        np.arange(len(a2.center)))
            for i, j in indices:
                pivots_list[c].append(
                    Pivot(a1.center[i], a2.center[j], a1, a2, i, j))

        elif len(r_atoms) == 1:
            # chelotropic: pivots connect two lobes of the same atom,
            # keeping only ordered index pairs (i < j)
            a1 = r_atoms[0]
            indices = cartesian_product(np.arange(len(a1.center)),
                                        np.arange(len(a1.center)))
            for i, j in indices:
                if i < j:
                    pivots_list[c].append(
                        Pivot(a1.center[i], a1.center[j], a1, a1, i, j))

    return [np.array(l, dtype=object) for l in pivots_list]


def set_pivots(mol, suprafacial=False):
    '''
    Attach mol.pivots with the embedder's filters:
     * suprafacial: of 4 pivots (2 lobes x 2 lobes), keep the 2 shortest
     * sigmastar molecules keep only the shortest pivot length
    (reference embedder.py:542-573)
    '''
    mol.pivots = get_pivots(mol)

    for c in range(mol.n_confs):
        if suprafacial and len(mol.pivots[c]) == 4:
            norms = np.array([np.linalg.norm(p.pivot) for p in mol.pivots[c]])
            # keep the two shortest (the reference scans samples until a
            # threshold keeps exactly 2, embedder.py:557-563)
            for sample in norms:
                to_keep = [n for n in norms if sample >= n]
                if len(to_keep) == 2:
                    mask = np.array([n in to_keep for n in norms])
                    mol.pivots[c] = mol.pivots[c][mask]
                    break

        if getattr(mol, 'sp3_sigmastar', False) and len(mol.pivots[c]):
            lengths = [np.linalg.norm(p.pivot) for p in mol.pivots[c]]
            shortest = min(lengths)
            mask = np.array([(l - shortest) < 1e-5 for l in lengths])
            mol.pivots[c] = mol.pivots[c][mask]

    return mol.pivots
