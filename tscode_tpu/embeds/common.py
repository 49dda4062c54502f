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


# flush accumulated device chunks to the host once they exceed this many
# bytes of data in the leading array (bounds HBM growth on very large
# sweeps while keeping the pull count ~O(1) for typical runs)
_ACCUM_FLUSH_BYTES = 512 * 1024 * 1024


class ChunkAccumulator:
    '''Collects per-chunk device array tuples and pulls them in as few
    host transfers as possible: chunks are concatenated ON DEVICE and
    fetched with one pull per field per flush instead of several per
    chunk (dispatch of chunk i+1 overlaps the accumulated compute, and
    pull latency — the tunnel bottleneck — is paid once per flush).'''

    def __init__(self):
        self._chunks = []        # (arrays tuple, n_valid)
        self._bytes = 0
        self.results = []        # host tuples, sliced to n_valid

    def add(self, arrays, n_valid):
        '''All fields must share arrays[0]'s leading length (flush
        slices every field by the same row offsets), and the FIRST
        field should be the byte-dominant one (only it counts toward
        the flush budget).'''
        arrays = tuple(arrays)
        assert all(len(a) == len(arrays[0]) for a in arrays[1:]), \
            'ChunkAccumulator fields must share a leading length'
        self._chunks.append((arrays, n_valid))
        self._bytes += arrays[0].size * arrays[0].dtype.itemsize
        if self._bytes >= _ACCUM_FLUSH_BYTES:
            self.flush()

    @staticmethod
    def _tree_concat(parts, arity=8):
        '''Device concatenate with BOUNDED operand count: an eager
        N-operand jnp.concatenate compiles an N-input XLA program whose
        compile time explodes for large N (a ~400-chunk multiembed
        union took minutes on CPU and wedged a remote-compile tunnel).
        Fixed-arity rounds keep every executable small, and equal chunk
        shapes mean each round reuses one compiled program.'''
        while len(parts) > 1:
            parts = [parts[i] if len(parts[i:i + arity]) == 1
                     else jnp.concatenate(parts[i:i + arity])
                     for i in range(0, len(parts), arity)]
        return parts[0]

    def flush(self):
        if not self._chunks:
            return
        n_fields = len(self._chunks[0][0])
        cats = [np.asarray(self._tree_concat(
            [arrays[f] for arrays, _ in self._chunks]))
            for f in range(n_fields)]
        lo = 0
        for arrays, n_valid in self._chunks:
            self.results.append(tuple(
                cat[lo:lo + n_valid] for cat in cats))
            lo += len(arrays[0])
        self._chunks = []
        self._bytes = 0

class MaskedPullAccumulator:
    '''Like ChunkAccumulator, but for screen results where only the
    MASK-TRUE rows are ever needed on the host: the data tensors stay
    device-resident, and `finish()` pulls the concatenated mask (small)
    plus ONLY the surviving rows of each field (device gather, one
    small pull per field). On a tunneled accelerator this is the
    difference between pulling ~10^6 screened poses (hundreds of MB,
    ~50 s at link bandwidth) and pulling a few thousand survivors
    (~100s of KB).

    add(arrays, mask, n_valid): `arrays` a tuple of device arrays
    sharing a leading dimension with `mask` (a device bool vector),
    trimmed to the first n_valid rows. Survivor order across add()
    calls is generation order.

    HBM growth is bounded: once accumulated bytes (first field) pass
    the flush budget, the pending chunks are compacted early (device
    gather of their survivors) so the full tensors can be freed.

    pull=False keeps the compacted survivor fields DEVICE-resident:
    finish() then returns jnp arrays (mask still host). For pipelines
    that cut survivors down further before materializing them (e.g.
    string_embed's TFD novelty filter keeps a few hundred of ~10^5
    clash survivors), this defers the big pull until after that cut —
    the caller gathers the final rows on device and pulls only those.
    '''

    def __init__(self, pull=True):
        self._pull = pull
        self._chunks = []        # tuples of trimmed device arrays
        self._masks = []         # trimmed device bool vectors
        self._bytes = 0
        self._parts = []         # tuples of survivor arrays (host or dev)
        self._mask_parts = []    # host mask arrays, in order

    def add(self, arrays, mask, n_valid):
        arrays = tuple(a[:n_valid] for a in arrays)
        self._chunks.append(arrays)
        self._masks.append(mask[:n_valid])
        self._bytes += arrays[0].size * arrays[0].dtype.itemsize
        if self._bytes >= _ACCUM_FLUSH_BYTES:
            self._compact()

    def _compact(self):
        if not self._chunks:
            return
        mask = np.asarray(ChunkAccumulator._tree_concat(self._masks))
        mask = mask.astype(bool)
        idx = np.nonzero(mask)[0]
        n_fields = len(self._chunks[0])
        gathered = []
        for f in range(n_fields):
            cat = ChunkAccumulator._tree_concat(
                [c[f] for c in self._chunks])
            g = (jnp.take(cat, jnp.asarray(idx), axis=0)
                 if len(idx) else cat[:0])
            gathered.append(np.asarray(g) if self._pull else g)
        self._parts.append(tuple(gathered))
        self._mask_parts.append(mask)
        self._chunks = []
        self._masks = []
        self._bytes = 0

    def finish(self):
        '''Returns (fields tuple of (S, ...) arrays — host when
        pull=True, device otherwise — and the host mask (B,)).'''
        self._compact()
        mask = (np.concatenate(self._mask_parts) if self._mask_parts
                else np.zeros(0, dtype=bool))
        if not self._parts:
            return (), mask
        cat = np.concatenate if self._pull else jnp.concatenate
        fields = tuple(
            cat([p[f] for p in self._parts]) if len(self._parts) > 1
            else self._parts[0][f]
            for f in range(len(self._parts[0])))
        return fields, mask


class SurvivorAccumulator:
    '''MaskedPullAccumulator specialization for the cyclical block
    screens' (poses (rows, A, N, 3), keep (rows, A)) results: rows are
    flattened to row-major (row, angle) order — generation order — and
    only surviving poses are pulled.'''

    def __init__(self):
        self._g = MaskedPullAccumulator()
        self._A = None

    def add(self, poses, keep, n_valid):
        self._A = keep.shape[1]
        pf = poses[:n_valid].reshape((-1,) + poses.shape[2:])
        kf = keep[:n_valid].reshape(-1)
        self._g.add((pf,), kf, len(kf))

    def finish(self, n_atoms):
        '''Returns (surv_poses (S, N, 3), keep (B, A)) host arrays.'''
        fields, mask = self._g.finish()
        surv = fields[0] if fields else np.zeros((0, n_atoms, 3))
        keep = (mask.reshape(-1, self._A) if self._A
                else np.zeros((0, 0), dtype=bool))
        return surv, keep
