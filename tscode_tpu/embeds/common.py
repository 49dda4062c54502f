'''
Shared embed machinery: lobe stacking, pose materialization, grids.

The reference materializes one pose per Python-loop iteration
(`get_embed`, /root/reference/tscode/embeds.py:961-969). Here a whole
batch of (rotation, position) pairs is applied at once: the per-molecule
transform is a (B, N, 3) einsum against (B, 3, 3) rotations — MXU work —
and fragments are concatenated along the atom axis.
'''

import numpy as np

import jax.numpy as jnp


def stacked_lobes(mol, atom_position=0):
    '''
    Per-conformer lobe centers and orbital vectors of the
    `atom_position`-th reactive atom, stacked to (n_confs, K, 3) arrays.
    Lobe counts must be conformer-invariant (they are for every orbital
    type; sigmatropic flags are per-molecule-consistent across confs
    by construction).
    '''
    centers, vecs = [], []
    for c in range(mol.n_confs):
        atom = mol.get_r_atoms(c)[atom_position]
        centers.append(atom.center)
        vecs.append(atom.orb_vecs)
    k = {len(c) for c in centers}
    if len(k) != 1:
        raise ValueError(
            f'{mol.name}: lobe count varies across conformers ({k}); '
            f'pad or restrict conformers first.')
    return np.array(centers), np.array(vecs)


def materialize_two_mol(coords1, coords2, c1_idx, c2_idx, R2, t2):
    '''
    Build a pose batch for two molecules where molecule 1 stays fixed and
    molecule 2 is rotated+translated:
      coords1 (C1, N1, 3), coords2 (C2, N2, 3), c*_idx (B,) int,
      R2 (B, 3, 3), t2 (B, 3)  ->  (B, N1+N2, 3).
    '''
    f1 = coords1[c1_idx]                                   # (B, N1, 3)
    f2 = jnp.einsum('bij,bnj->bni', R2, coords2[c2_idx]) + t2[:, None, :]
    return jnp.concatenate([f1, f2], axis=1)


def materialize_multi(coords_list, conf_idx_list, R_list, t_list):
    '''
    General pose batch: every molecule gets its own (B, 3, 3) rotation and
    (B, 3) position. Returns (B, sum(N_i), 3).
    '''
    frags = []
    for coords, c_idx, R, t in zip(coords_list, conf_idx_list, R_list, t_list):
        frags.append(jnp.einsum('bij,bnj->bni', R, coords[c_idx])
                     + t[:, None, :])
    return jnp.concatenate(frags, axis=1)


def flat_grid(*sizes):
    '''
    Index arrays for a nested loop over `sizes` where the FIRST size is
    the outermost loop. Returns one (prod(sizes),) int32 array per size,
    in C order (last index varies fastest) — matching the reference's
    nested for-loops so pose ordering (and therefore order-dependent
    dedup) is identical.
    '''
    grids = np.indices(sizes).reshape(len(sizes), -1)
    return [g.astype(np.int32) for g in grids]
