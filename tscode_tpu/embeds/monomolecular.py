'''
Monomolecular embed: one molecule, two reactive atoms — bend every
conformer about each pivot until the orbitals approach bonding distance
(reference embeds.py:900-947; bending target: within 1 A of the summed
orbital dimensions, embeds.py:921-931).
'''

import numpy as np

from tscode_tpu.bending import bend_molecule
from tscode_tpu.errors import ZeroCandidatesError


def monomolecular_embed(embedder):
    '''Returns structures; sets embedder bookkeeping like the reference.'''
    assert len(embedder.objects) == 1
    mol = embedder.objects[0]

    embedder.log(f'\n--> Performing monomolecular embed '
                 f'({embedder.candidates} candidates)')

    cache = getattr(embedder, 'bent_mols_cache', None)
    if cache is None:
        cache = embedder.bent_mols_cache = {}

    structures = []
    for c in range(mol.n_confs):
        for p, pivot in enumerate(mol.pivots[c]):
            # bend until within 1 A of the target orbital meeting distance
            target = 1.0
            from tscode_tpu.operators import qm_gradient_source
            bent = bend_molecule(
                mol, c, pivot, target, cache=cache,
                suprafacial=embedder.options.suprafacial,
                fix_angles=embedder.options.fix_angles_in_deformation,
                protect_double_bonds=embedder.options
                .double_bond_protection,
                logfunction=embedder.log,
                title=f'{mol.rootname} - pivot {p}',
                gradient_fn=qm_gradient_source(embedder, mol))
            for conformer in bent.atomcoords:
                structures.append(conformer)

    if not structures:
        raise ZeroCandidatesError(
            '--> Monomolecular embed generated no structures.')

    embedder.structures = np.array(structures)
    embedder.atomnos = mol.atomnos
    embedder.energies = np.zeros(len(embedder.structures))
    embedder.exit_status = np.zeros(len(embedder.structures), dtype=bool)
    embedder.graphs = [mol.graph]

    if embedder.pairings_table:
        embedder.constrained_indices = np.array(
            [list(embedder.pairings_table.values())
             for _ in embedder.structures])
    else:
        embedder.constrained_indices = np.array(
            [[] for _ in embedder.structures])

    return embedder.structures
