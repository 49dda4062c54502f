'''
Non-covalent interaction (NCI) guessing: hydrogen bonds, pi-stacking and
halogen contacts between molecular fragments, from distance thresholds
and aromatic-ring detection (reference /root/reference/tscode/nci.py and
print_nci, embedder.py:2053-2096).
'''

from itertools import combinations

import numpy as np

from tscode_tpu.graphs import is_phenyl
from tscode_tpu.parameters import NCI_DICT
from tscode_tpu.pt import SYMBOLS


def get_nci(coords, atomnos, constrained_indices, ids):
    '''Guessed intermolecular NCIs: returns (nci tuples, print strings).'''
    symbols = [SYMBOLS[int(a)] for a in atomnos]
    constrained_flat = np.asarray(constrained_indices).ravel()

    print_list, nci = _get_nci_atomic_pairs(coords, symbols,
                                            constrained_flat, ids)
    aromatic_centers = _get_aromatic_centers(coords, symbols, ids)
    pl, nc = _get_nci_aromatic_rings(coords, symbols, ids, aromatic_centers)
    return nci + nc, print_list + pl


def _owner_of(index, cum_ids):
    return next(i for i, n in enumerate(cum_ids) if index < n)


def _get_nci_atomic_pairs(coords, symbols, constrained_flat, ids):
    '''Intermolecular atom-pair NCIs (reference nci.py:54-89).'''
    print_list, nci = [], []
    cum_ids = np.cumsum(ids)

    for i1 in range(len(coords)):
        start_of_next_mol = cum_ids[_owner_of(i1, cum_ids)]
        for i2 in range(start_of_next_mol, len(coords)):
            if i1 in constrained_flat or i2 in constrained_flat:
                continue
            tag = ''.join(sorted((symbols[i1], symbols[i2])))
            if tag in NCI_DICT:
                threshold, nci_type = NCI_DICT[tag]
                dist = np.linalg.norm(coords[i1] - coords[i2])
                if dist < threshold:
                    print_list.append(
                        f'{nci_type} ({round(dist, 2)} A, indices {i1}/{i2})')
                    nci.append((nci_type, i1, i2))
    return print_list, nci


def _get_nci_aromatic_rings(coords, symbols, ids, aromatic_centers):
    '''Phenyl-atom and phenyl-phenyl NCIs (reference nci.py:91-139).'''
    cum_ids = np.cumsum(ids)
    print_list, nci = [], []

    for owner, center in aromatic_centers:
        for i in range(len(coords)):
            if _owner_of(i, cum_ids) == owner:
                continue
            tag = ''.join(sorted(('Ph', symbols[i])))
            if tag in NCI_DICT:
                threshold, nci_type = NCI_DICT[tag]
                dist = np.linalg.norm(center - coords[i])
                if dist < threshold:
                    print_list.append(
                        f'{nci_type} ({round(dist, 2)} A, atom {i}/ring)')
                    nci.append((nci_type, i, 'ring'))

    for a, (owner1, center1) in enumerate(aromatic_centers):
        for owner2, center2 in aromatic_centers[a + 1:]:
            if owner1 == owner2:
                continue
            threshold, nci_type = NCI_DICT['PhPh']
            dist = np.linalg.norm(center1 - center2)
            if dist < threshold:
                print_list.append(
                    f'{nci_type} ({round(dist, 2)} A, ring/ring)')
                nci.append((nci_type, 'ring', 'ring'))
    return print_list, nci


def _get_aromatic_centers(coords, symbols, ids):
    '''(owner, ring centroid) for every phenyl-like 6-ring
    (reference nci.py:141-181).'''
    cum_ids = np.cumsum(ids)
    centers = []
    for mol in range(len(ids)):
        lo = 0 if mol == 0 else cum_ids[mol - 1]
        hi = cum_ids[mol]
        aromatics = np.array([i for i in range(lo, hi)
                              if symbols[i] in ('C', 'N')])
        if len(aromatics) <= 5:
            continue
        for comb in combinations(aromatics, 6):
            sub = coords[list(comb)]
            if is_phenyl(sub):
                centers.append((mol, sub.mean(axis=0)))
    return centers


def print_nci(embedder):
    '''Log guessed NCIs per pose + a differential report
    (reference embedder.py:2053-2096).'''
    embedder.log('--> Non-covalent interactions spotting')
    embedder.nci = []

    if getattr(embedder, 'ids', None) is None:
        # refine>/REFINE runs carry no molecule partition, and NCIs here
        # are inter-fragment by definition (the reference crashes on
        # np.cumsum(None) in the same situation — fixed to a clear skip)
        embedder.log('    Skipped: no intermolecular partition available '
                     'for a refine run.\n')
        return

    for i, structure in enumerate(embedder.structures):
        nci, print_list = get_nci(structure, embedder.atomnos,
                                  embedder.constrained_indices[i],
                                  embedder.ids)
        embedder.nci.append(nci)
        if nci:
            embedder.log(f'Structure {i + 1}: {len(nci)} interactions')
            for p in print_list:
                embedder.log('    ' + p)

    # differential report: interactions not shared by every pose
    if len([_f for _f in embedder.nci if _f]) == 0:
        embedder.log('No particular NCIs spotted for these structures\n')
    else:
        unshared = []
        shared = set.intersection(*[set(map(repr, n))
                                    for n in embedder.nci]) \
            if all(embedder.nci) else set()
        for i, nci_list in enumerate(embedder.nci):
            extra = [n for n in nci_list if repr(n) not in shared]
            if extra:
                unshared.append((i + 1, extra))
        if unshared:
            embedder.log('\n--> Differential NCIs found - these are '
                         'the structure-specific ones:')
            for idx, extra in unshared:
                embedder.log(f'Structure {idx}: {extra}')
        embedder.log()
