'''
Torsional conformer search (csearch).

Host side: rotable-bond discovery (graph classification, dummy-rotor
isomorphism checks, hydrogen-bond detection, DBSCAN torsion grouping) —
small graph work, faithful to /root/reference/tscode/torsion_module.py.

Device side: the hot loop. The reference rotates one dihedral at a time
in Python with a 5-degree back-off on clash
(torsion_module.py:736-781); here every (starting point x angle set)
candidate of a torsion group is evaluated in ONE batched device program:
the back-off becomes a per-torsion scan over the 5-degree retreat
schedule selecting the first clash-free retreat amount — identical
accepted geometry, no Python in the loop.
'''

import functools
import time

import jax
import jax.numpy as jnp
import networkx as nx
import numpy as np

from tscode_tpu.errors import SegmentedGraphError
from tscode_tpu.graphs import (get_phenyl_ids, get_quadruplets,
                               get_sp_n, graphize, is_amide_n, is_ester_o,
                               is_sp_n, neighbors)
from tscode_tpu.molecule import align_structures
from tscode_tpu.ops.linalg import cartesian_product, rot_mat_from_pointer
from tscode_tpu.ops.tfd import prune_conformers_tfd
from tscode_tpu.pt import SYMBOLS
from tscode_tpu.utils import flatten, time_to_string


# --------------------------------------------------------- double bonds

# bond-length thresholds below which a bond counts as double (pair tag in
# alphabetical order). DELIBERATE EXTENSION of the reference table
# (utils.py:288-291 lists only CC and CN): the extra entries stop
# csearch from driving azo/carbonyl/thiocarbonyl and other pi bonds the
# reference would wrongly treat as rotable single bonds.
DOUBLE_BONDS_THRESHOLDS = {
    'CC': 1.4,
    'CN': 1.3,
    'CO': 1.29,
    'NN': 1.3,
    'NO': 1.25,
    'OO': 1.24,
    'CS': 1.6,
    'OS': 1.5,
    'NS': 1.58,
    'SS': 1.9,
}


def get_double_bonds_indices(coords, atomnos):
    '''Pairs of atom indices bonded more tightly than the double-bond
    threshold for their element pair (heavy atoms only).'''
    atomnos = np.asarray(atomnos)
    mask = atomnos != 1
    numbering = np.arange(len(atomnos))[mask]
    sub_coords = np.asarray(coords)[mask]
    sub_nos = atomnos[mask]

    out = []
    for a in range(len(sub_coords)):
        for b in range(a + 1, len(sub_coords)):
            tag = ''.join(sorted((SYMBOLS[int(sub_nos[a])],
                                  SYMBOLS[int(sub_nos[b])])))
            thr = DOUBLE_BONDS_THRESHOLDS.get(tag)
            if thr is not None and \
                    np.linalg.norm(sub_coords[a] - sub_coords[b]) < thr:
                out.append((int(numbering[a]), int(numbering[b])))
    return out


# -------------------------------------------------------------- Torsion

class Torsion:
    '''A rotable-bond candidate (reference torsion_module.py:41-132).'''

    def __init__(self, i1, i2, i3, i4):
        self.i1, self.i2, self.i3, self.i4 = i1, i2, i3, i4
        self.torsion = (i1, i2, i3, i4)

    def __repr__(self):
        if hasattr(self, 'n_fold'):
            return f'Torsion{self.torsion} {self.n_fold}-fold'
        return f'Torsion{self.torsion}'

    def in_cycle(self, graph):
        graph.remove_edge(self.i2, self.i3)
        cyclical = nx.has_path(graph, self.i1, self.i4)
        graph.add_edge(self.i2, self.i3)
        return cyclical

    def is_rotable(self, graph, hydrogen_bonds, keepdummy=False):
        if sorted((self.i2, self.i3)) in hydrogen_bonds:
            return False
        if _is_free(self.i2, graph) or _is_free(self.i3, graph):
            if keepdummy or (_is_nondummy(self.i2, self.i3, graph) and
                             _is_nondummy(self.i3, self.i2, graph)):
                self.n_fold = self.get_n_fold(graph)
                return True
        return False

    def get_n_fold(self, graph):
        nums = (graph.nodes[self.i2]['atomnos'],
                graph.nodes[self.i3]['atomnos'])
        if 1 in nums:
            return 6                      # H-N / H-O hydrogen-bond rotors
        if is_amide_n(self.i2, graph, mode=2) or \
                is_amide_n(self.i3, graph, mode=2):
            return 2                      # tertiary amides
        if 6 in nums or 7 in nums or 16 in nums:
            sp2 = get_sp_n(self.i2, graph)
            sp3 = get_sp_n(self.i3, graph)
            if 3 in (sp2, sp3):
                return 3
            if 2 in (sp2, sp3):
                return 2
        return 4

    def get_angles(self):
        return {2: (0, 180),
                3: (0, 120, 240),
                4: (0, 90, 180, 270),
                6: (0, 60, 120, 180, 240, 300)}[self.n_fold]

    def sort_torsion(self, graph, constrained_indices):
        '''Orient the quadruplet so rotation moves the side NOT containing
        constrained atoms (reference torsion_module.py:120-132).'''
        graph.remove_edge(self.i2, self.i3)
        for d in np.asarray(constrained_indices).flatten():
            if nx.has_path(graph, self.i2, int(d)):
                self.torsion = tuple(reversed(self.torsion))
        graph.add_edge(self.i2, self.i3)


def _is_free(index, graph):
    '''Whether a torsion hinged on this atom is conformationally free:
    conjugation locks carbonyl carbons, ester sp3 oxygens and
    secondary-amide nitrogens (reference torsion_module.py:134-156).'''
    carbonyl_like = (graph.nodes[index]['atomnos'] == 6
                     and is_sp_n(index, graph, 2)
                     and any(graph.nodes[n]['atomnos'] == 8
                             for n in neighbors(graph, index)))
    return not (carbonyl_like
                or is_amide_n(index, graph, mode=1)
                or is_ester_o(index, graph))


def _elements_match(n1, n2):
    return n1['atomnos'] == n2['atomnos']


def _is_nondummy(i, root, graph):
    '''A rotation about the (root, i) bond is "dummy" when every
    substituent branch on the far side of i is equivalent up to
    element-labeled isomorphism: spinning a methyl/CF3/tBu group or a
    symmetric flat ring (phenyl, N-pyrrolyl) yields no new conformer.
    Returns True when the rotation is worth sampling. Pinned to
    reference torsion_module.py:158-231, including its documented
    blind spots: only C/N hinge atoms are screened, and stereocenters
    are ignored (branches differing only by chirality count as equal,
    over-pruning in principle).'''
    if graph.nodes[i]['atomnos'] not in (6, 7):
        return True

    branches = [n for n in neighbors(graph, i) if n != root]

    # single linear continuation (that atom bonds only back to i and
    # one more): an alkyne/H-bond-like axis whose freedom some other
    # torsion already owns
    if len(branches) == 1 and len(neighbors(graph, branches[0])) == 2:
        return False

    if len(branches) == 2:
        ring = get_phenyl_ids(i, graph)
        if ring is not None:
            # cut the aromatic 6-ring along its para axis and compare
            # the ortho/meta halves (substituents included)
            r1, r2, r3, r4, r5, r6 = ring
            split = nx.restricted_view(
                graph, [], [(r3, r4), (r4, r5), (r1, r2), (r1, r6)])
            halves = [split.subgraph(c)
                      for c in nx.connected_components(split)
                      if r2 in c or r6 in c]
            if len(halves) == 2:
                return not nx.is_isomorphic(halves[0], halves[1],
                                            node_match=_elements_match)
            return True      # unexpected ring topology: keep sampling

    # general case: detach every branch from i and compare the
    # root-free components to each other
    pruned = nx.restricted_view(graph, [], [(i, n) for n in branches])
    detached = [c for c in nx.connected_components(pruned) if root not in c]
    if len(detached) == 1:
        # the branches reconnect away from i (e.g. tetramethylguanidyl
        # alanine's C(beta)-N bond): rotable
        return True
    parts = [pruned.subgraph(c) for c in detached]
    return not all(nx.is_isomorphic(parts[0], p,
                                    node_match=_elements_match)
                   for p in parts[1:])


def get_hydrogen_bonds(coords, atomnos, graph, d_min=2.5, d_max=3.3,
                       max_angle=45, fragments=None):
    '''Pairs of hydrogen-bonded atom indices
    (reference torsion_module.py:233-299).'''
    coords = np.asarray(coords)
    hbs = []
    het_idx = np.array([i for i, a in enumerate(atomnos) if a in (7, 8)],
                       dtype=int)

    def _angle(u, w):
        cos = np.clip(u @ w / np.linalg.norm(u) / np.linalg.norm(w), -1, 1)
        return np.degrees(np.arccos(cos))

    for a, i1 in enumerate(het_idx):
        for i2 in het_idx[a + 1:]:
            if fragments is not None:
                if any((i1 in f and i2 in f) for f in fragments):
                    continue
            d = np.linalg.norm(coords[i1] - coords[i2])
            if d_min < d < d_max:
                Hs = [i for i in (neighbors(graph, int(i1))
                                  + neighbors(graph, int(i2)))
                      if graph.nodes[i]['atomnos'] == 1]
                versor = (coords[i2] - coords[i1]) / d
                for iH in Hs:
                    v1 = coords[iH] - coords[i1]
                    v2 = coords[iH] - coords[i2]
                    d1, d2 = np.linalg.norm(v1), np.linalg.norm(v2)
                    l1 = v1 @ versor
                    l2 = v2 @ -versor
                    alfa = _angle(v1, versor) if l1 < l2 else _angle(v2, -versor)
                    if alfa < max_angle:
                        hbs.append(sorted((int(iH), int(i2 if d1 < d2 else i1))))
                        break
    return hbs


def get_rotation_mask(graph, torsion):
    '''Bool mask of atoms to move when rotating about the i2-i3 bond
    (reference torsion_module.py:301-325).'''
    i1, i2, i3, _ = torsion
    graph.remove_edge(i2, i3)
    reachable = nx.shortest_path(graph, i1).keys()
    graph.add_edge(i2, i3)
    mask = np.array([i in reachable for i in graph.nodes], dtype=bool)
    if np.count_nonzero(mask) > len(mask) // 2:
        mask = ~mask
    mask[i2] = False
    return mask


def get_torsions(graph, hydrogen_bonds, double_bonds, keepdummy=False):
    '''Rotable Torsion objects (reference torsion_module.py:352-371).'''
    torsions = []
    db_set = {tuple(sorted(db)) for db in double_bonds}
    for path in get_quadruplets(graph):
        _, i2, i3, _ = path
        if tuple(sorted((i2, i3))) in db_set:
            continue
        t = Torsion(*(int(x) for x in path))
        if (not t.in_cycle(graph)) and \
                t.is_rotable(graph, hydrogen_bonds, keepdummy=keepdummy):
            torsions.append(t)
    return torsions


def group_torsions_dbscan(coords, torsions, max_size=5):
    '''Spatially group torsions so each group is <= max_size
    (reference torsion_module.py:373-397).'''
    from sklearn.cluster import dbscan

    centers = np.array([(coords[t.torsion[1]] + coords[t.torsion[2]]) / 2
                        for t in torsions])
    n_clusters = 1
    labels = np.zeros(len(torsions), dtype=int)
    for eps in np.arange(10, 1.5, -0.5):
        labels = dbscan(centers, eps=eps, min_samples=1)[1]
        n_clusters = max(labels) + 1
        biggest = max(np.count_nonzero(labels == i) for i in set(labels))
        if biggest <= max_size:
            break

    groups = [[] for _ in range(n_clusters)]
    for torsion, cluster in zip(torsions, labels):
        groups[cluster].append(torsion)
    return sorted(groups, key=len)


# ------------------------------------------------------ device hot loop

_BACKOFF_STEP = 5.0


@jax.jit
def _rotate_batch_with_backoff(coords_batch, quad, move_mask, angles,
                               other_mask, max_backoff_steps):
    '''
    Rotate one torsion by per-candidate angles with the reference's
    5-degree clash back-off (torsion_module.py:754-776 semantics):
    starting from the full rotation, retreat in 5-degree steps until the
    moved/static fragments stop clashing (<=0 contacts under 1.5 A) or
    the rotation is fully undone. Returns (new_coords, rotated flags).

    coords_batch (B, N, 3); quad (4,) int; move_mask / other_mask (N,)
    bool (other_mask excludes i2/i3); angles (B,) degrees;
    max_backoff_steps: static int bounding the retreat scan.
    '''
    i2, i3 = quad[1], quad[2]
    axis = coords_batch[:, i2] - coords_batch[:, i3]
    center = coords_batch[:, i3]

    def clash_free(c):
        d2 = jnp.sum((c[:, :, None, :] - c[:, None, :, :]) ** 2, axis=-1)
        pm = other_mask[:, None] & move_mask[None, :]
        return jnp.sum((d2 < 1.5 * 1.5) & pm[None], axis=(-2, -1)) <= 0

    # candidate retreat amounts: angle - s*5 for s = 0..max_backoff_steps;
    # the reference stops the retreat loop after angle//5 steps, i.e. it
    # never rotates past zero
    def eval_retreat(s):
        eff = angles - s * _BACKOFF_STEP
        # the reference retreats at most angle//5 times, i.e. down to a
        # net rotation of exactly zero for its 5-degree-divisible angle
        # sets — and a clash-free zero retreat still counts as rotated
        valid = eff >= 0.0
        R = rot_mat_from_pointer(axis, eff)
        moved = jnp.einsum('bij,bnj->bni', R,
                           coords_batch - center[:, None]) + center[:, None]
        cand = jnp.where(move_mask[None, :, None], moved, coords_batch)
        ok = clash_free(cand) & valid
        return cand, ok

    def body(s, state):
        best, found = state
        cand, ok = eval_retreat(s)
        take = ok & ~found
        best = jnp.where(take[:, None, None], cand, best)
        return best, found | ok

    # s=0 is the full rotation; angle==0 candidates keep their coords and
    # count as not-rotated. The all-False init derives from `angles` so
    # its mesh-varying type matches the loop body's under shard_map.
    init = (coords_batch, angles > jnp.inf)
    best, found = jax.lax.fori_loop(0, max_backoff_steps + 1, body, init)

    nonzero = angles != 0.0
    rotated = found & nonzero
    new_coords = jnp.where((rotated)[:, None, None], best, coords_batch)
    return new_coords, rotated


@functools.lru_cache(maxsize=8)
def _rotate_backoff_sharded(mesh, axis_name='poses'):
    '''shard_map form of _rotate_batch_with_backoff over the candidate
    axis: each device rotates and back-off-screens its own slice (the
    work is per-candidate, no collectives). Bit-identical outputs.'''
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:                 # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    rep, sh = P(None), P(axis_name)
    sharded = shard_map(
        _rotate_batch_with_backoff.__wrapped__, mesh=mesh,
        in_specs=(sh, rep, rep, sh, rep, P()),
        out_specs=(sh, sh))
    return jax.jit(sharded)


def _apply_torsion_group(coords_batch, torsions_group, graph, angle_sets):
    '''Apply one angle set column per torsion sequentially (torsions in a
    group interact through their masks), each fully batched over the
    candidate axis. Returns (coords (B, N, 3), n_rotated (B,)).

    The batch axis is padded to a pow2 bucket with angle=0 rows (no-ops)
    so device executables are keyed on a handful of shapes instead of
    one per (molecule, torsion group) — remote compiles cost 5-30 s each
    (see CLAUDE.md). The retreat-step bound is likewise bucketed; extra
    steps are masked by the eff >= 0 validity gate.'''
    B = coords_batch.shape[0]
    if B == 0:
        return coords_batch, jnp.zeros(0, dtype=jnp.int32)
    B_pad = max(8, int(2 ** np.ceil(np.log2(B))))
    if B_pad != B:
        coords_batch = jnp.concatenate(
            [coords_batch,
             jnp.broadcast_to(coords_batch[:1],
                              (B_pad - B,) + coords_batch.shape[1:])])
        angle_sets = np.concatenate(
            [angle_sets, np.zeros((B_pad - B, angle_sets.shape[1]),
                                  dtype=angle_sets.dtype)])
    n_rotated = jnp.zeros(B_pad, dtype=jnp.int32)

    # mesh scale-out: per-candidate work shards cleanly (B_pad is a
    # pow2 bucket, so any pow2 mesh size divides it)
    from tscode_tpu.parallel.sharding import mesh_for
    mesh = mesh_for(B_pad)
    rotate_fn = _rotate_batch_with_backoff
    if mesh is not None and B_pad % mesh.devices.size == 0:
        rotate_fn = _rotate_backoff_sharded(mesh)

    for t, torsion in enumerate(torsions_group):
        quad = np.asarray(torsion.torsion, dtype=np.int32)
        move_mask = get_rotation_mask(graph, torsion.torsion)
        other_mask = ~move_mask.copy()
        other_mask[torsion.torsion[1]] = False
        other_mask[torsion.torsion[2]] = False

        angles = angle_sets[:, t].astype(float)
        max_steps = int(np.max(angles) // _BACKOFF_STEP) \
            if len(angles) and np.max(angles) > 0 else 0
        for bucket in (0, 12, 24, 48, 72):
            if max_steps <= bucket:
                max_steps = bucket
                break
        coords_batch, rotated = rotate_fn(
            coords_batch, jnp.asarray(quad), jnp.asarray(move_mask),
            jnp.asarray(angles), jnp.asarray(other_mask),
            jnp.asarray(max_steps))
        n_rotated = n_rotated + rotated.astype(jnp.int32)

    return coords_batch[:B], n_rotated[:B]


# ------------------------------------------------------------- csearch

def csearch(coords, atomnos, constrained_indices=None, keep_hb=False,
            ff_opt=False, n=100, n_out=100, mode=1, calc=None, method=None,
            title='test', logfunction=print, embedder=None):
    '''
    Torsional conformer search entry point
    (reference torsion_module.py:523-653).
    mode 0: clustered, keep lowest-energy per cluster (needs ff_opt)
    mode 1: clustered, keep most diverse
    mode 2: random angle sets
    '''
    coords = np.asarray(coords)
    if constrained_indices is not None and len(constrained_indices) > 0:
        logfunction(f'Constraining {len(constrained_indices)} distance'
                    f'{"s" if len(constrained_indices) > 1 else ""} - '
                    f'{constrained_indices}')
    else:
        logfunction('Free conformational search: no constraints provided.')
        constrained_indices = np.array([])

    graph = graphize(coords, atomnos)
    for i1, i2 in np.asarray(constrained_indices).reshape(-1, 2):
        graph.add_edge(int(i1), int(i2))

    if keep_hb:
        hydrogen_bonds = get_hydrogen_bonds(coords, atomnos, graph)
        for hb in hydrogen_bonds:
            graph.add_edge(*hb)
        logfunction(f'Preserving {len(hydrogen_bonds)} hydrogen bonds - '
                    f'{hydrogen_bonds}' if hydrogen_bonds
                    else 'No hydrogen bonds found.')
    else:
        hydrogen_bonds = []

    fragments = list(nx.connected_components(graph))
    if len(fragments) > 1:
        s = (f'{title} has a segmented connectivity graph: double check '
             'the input geometry.\nIf this is supposed to be a complex, '
             'no hydrogen bonds connecting the molecules were found, and '
             'the algorithm is not designed to reliably search loosely '
             'bound multimolecular arrangements.')
        if keep_hb:
            raise SegmentedGraphError(s)
        hydrogen_bonds.extend(get_hydrogen_bonds(coords, atomnos, graph,
                                                 fragments=fragments))
        if not hydrogen_bonds:
            raise SegmentedGraphError(s)
        for hb in hydrogen_bonds:
            graph.add_edge(*hb)
        if len(list(nx.connected_components(graph))) > 1:
            raise SegmentedGraphError(s)

    double_bonds = get_double_bonds_indices(coords, atomnos)
    torsions = get_torsions(graph, hydrogen_bonds, double_bonds)
    for t in torsions:
        t.sort_torsion(graph, np.asarray(constrained_indices))

    if not torsions:
        logfunction(f'No rotable bonds found for {title}.')
        return np.array([coords])

    if mode in (0, 1):
        return clustered_csearch(coords, atomnos, torsions, graph,
                                 constrained_indices=constrained_indices,
                                 ff_opt=ff_opt, n=n, n_out=n_out, mode=mode,
                                 calc=calc, method=method, title=title,
                                 logfunction=logfunction, embedder=embedder)
    return random_csearch(coords, atomnos, torsions, graph, n_out=n_out,
                          title=title, logfunction=logfunction)


def _log_torsions(torsions, atomnos, logfunction):
    logfunction('\n> Torsion list: (indices: n-fold)')
    for i, t in enumerate(torsions):
        logfunction(f' {i:2} - {str(t.torsion):21s} : {t.n_fold}-fold')
    central = set(flatten([t.torsion[1:3] for t in torsions], int))
    logfunction(f'\n> Rotable bonds ids: '
                f'{" ".join(str(int(i)) for i in sorted(central))}')


def random_csearch(coords, atomnos, torsions, graph, n_out=100,
                   max_tries=10000, rotations=None, title='test',
                   logfunction=print):
    '''Random angle sets, batched on device
    (reference torsion_module.py:399-521).'''
    t_start = time.perf_counter()
    _log_torsions(torsions, atomnos, logfunction)
    logfunction(f'\n--> Random dihedral CSearch on {title}\n    mode 2 '
                f'(random) - {len(torsions)} torsions')

    if len(torsions) == 0:
        logfunction('  No rotable bonds - returning no conformers')
        return np.zeros((0,) + coords.shape)
    angles = cartesian_product(*[np.array(t.get_angles())
                                 for t in torsions])
    if rotations is not None:
        angles = angles[np.count_nonzero(angles, axis=1) == rotations]
    if len(angles) == 0:
        logfunction('  No candidate angle sets - returning no conformers')
        return np.zeros((0,) + coords.shape)
    np.random.shuffle(angles)

    # the reference walks the WHOLE shuffled pool, stopping when n_out
    # structures are accepted or when one is accepted at pool index ==
    # max_tries exactly (torsion_module.py:509-510 — the bound check
    # lives inside the acceptance branch). Same semantics, evaluated in
    # device chunks with early exit between chunks.
    accepted = []
    chunk = 8192
    stop = False
    for start in range(0, len(angles), chunk):
        block = angles[start:start + chunk]
        coords_batch = jnp.broadcast_to(jnp.asarray(coords),
                                        (len(block),) + coords.shape)
        new_coords, n_rotated = _apply_torsion_group(
            coords_batch, torsions, graph, block)
        new_coords = np.asarray(new_coords)
        for j in np.nonzero(np.asarray(n_rotated) > 0)[0]:
            accepted.append(new_coords[j])
            if len(accepted) == n_out or start + int(j) == max_tries:
                stop = True
                break
        if stop:
            break
    new_structures = np.array(accepted) if accepted else \
        np.zeros((0,) + coords.shape)

    exhaustiveness = len(new_structures) / np.prod(
        [t.n_fold for t in torsions])
    logfunction(f'  Generated {len(new_structures)} conformers, (est. '
                f'{round(100 * exhaustiveness, 2)} % of the total '
                f'conformational space) - CSearch time '
                f'{time_to_string(time.perf_counter() - t_start)}')
    return new_structures


def clustered_csearch(coords, atomnos, torsions, graph,
                      constrained_indices=None, ff_opt=False, n=100,
                      n_out=100, mode=1, calc=None, method=None,
                      title='test', logfunction=print, embedder=None):
    '''Grouped systematic rotation (reference torsion_module.py:655-847).'''
    assert mode != 0 or ff_opt, \
        'Either leave mode=1 or turn on force field optimization'
    assert mode in (0, 1)

    t_start_run = time.perf_counter()
    tag = ('stable', 'diverse')[mode]

    if len(torsions) < 9:
        grouped_torsions = [torsions]
    else:
        grouped_torsions = group_torsions_dbscan(
            coords, torsions, max_size=3 if ff_opt else 5)

    _log_torsions(torsions, atomnos, logfunction)
    logfunction(f'\n--> Clustered CSearch on {title}\n    mode {mode} '
                f'({"stability" if mode == 0 else "diversity"}) - '
                f'{len(torsions)} torsions in {len(grouped_torsions)} '
                f'group{"s" if len(grouped_torsions) != 1 else ""} - '
                f'{[len(t) for t in grouped_torsions]}')

    torsion_array = np.array([t.torsion for t in torsions])
    output_structures = []
    output_energies = []
    starting_points = np.array([coords])

    for tg, torsions_group in enumerate(grouped_torsions):
        angles = cartesian_product(*[np.array(t.get_angles())
                                     for t in torsions_group])
        candidates = len(angles) * len(starting_points)
        logfunction(f'\n> Group {tg + 1}/{len(grouped_torsions)} - '
                    f'{len(torsions_group)} bonds, '
                    f'{[t.n_fold for t in torsions_group]} n-folds, '
                    f'{len(starting_points)} starting point'
                    f'{"s" if len(starting_points) > 1 else ""} = '
                    f'{candidates} conformers')

        # batched evaluation: (starting points x angle sets), starting
        # point varying slowest to preserve the reference output order
        S, A = len(starting_points), len(angles)
        sp_batch = jnp.asarray(np.repeat(starting_points, A, axis=0))
        angle_batch = np.tile(angles, (S, 1))
        rotated_coords, n_rotated = _apply_torsion_group(
            sp_batch, torsions_group, graph, angle_batch)
        rotated_coords = np.asarray(rotated_coords)
        n_rotated = np.asarray(n_rotated)

        # the reference emits each starting point, then its accepted
        # rotations (torsion_module.py:736-781)
        new_structures = []
        for s in range(S):
            new_structures.append(starting_points[s])
            block = slice(s * A, (s + 1) * A)
            accepted = rotated_coords[block][n_rotated[block] > 0]
            new_structures.extend(accepted)
        new_structures = np.array(new_structures)

        energies = None
        if ff_opt:
            from tscode_tpu.optimization import optimize_batch
            new_structures, energies = optimize_batch(
                embedder, new_structures, atomnos, calc=calc, method=method,
                constrained_indices=constrained_indices,
                logfunction=logfunction)

        if tg + 1 != len(grouped_torsions):
            if n is not None and len(new_structures) > n:
                if mode == 0:
                    order = np.argsort(energies, kind='stable')
                    new_structures = new_structures[order][:n]
                    energies = np.asarray(energies)[order][:n]
                else:
                    new_structures, energies = most_diverse_conformers(
                        n, new_structures, torsion_array, energies=energies,
                        return_energies=True)
            logfunction(f'  Kept the most {tag} {len(new_structures)} '
                        f'starting points for next rotation cluster')

        # energies kept ALIGNED with the aggregated structures: the
        # reference pairs the final selection against the last group's
        # stale energies through silently-truncating zip()
        # (torsion_module.py:830-840) — a bug, fixed here
        output_structures.extend(new_structures)
        output_energies.extend(
            energies if energies is not None else [0.0] * len(new_structures))
        starting_points = new_structures

    output_structures = np.array(output_structures)
    output_energies = np.array(output_energies)
    from tscode_tpu.parallel.sharding import mesh_for
    output_structures, keep = prune_conformers_tfd(
        output_structures, torsion_array,
        mesh=mesh_for(len(output_structures)))
    output_energies = output_energies[keep]

    # gate on the LAST group's count, as the reference does (:829)
    if len(new_structures) > n_out:
        if mode == 0:
            order = np.argsort(output_energies, kind='stable')
            output_structures = output_structures[order][:n_out]
        else:
            output_structures = most_diverse_conformers(
                n_out, output_structures, torsion_array,
                energies=output_energies if ff_opt else None)

    exhaustiveness = len(output_structures) / np.prod(
        [t.n_fold for t in torsions])
    logfunction(f'  Selected the '
                f'{"best" if mode == 0 else "most diverse"} '
                f'{len(output_structures)} conformers, corresponding\n  to '
                f'about {round(100 * exhaustiveness, 2)} % of the total '
                f'conformational space - CSearch time '
                f'{time_to_string(time.perf_counter() - t_start_run)}')
    return output_structures


def most_diverse_conformers(n, structures, torsion_array, energies=None,
                            return_energies=False):
    '''TFD-prune then KMeans-select the n most diverse structures
    (reference torsion_module.py:849-924). energies, when given, must be
    aligned with structures; with return_energies=True the selected
    structures' energies come back too (the reference pairs mismatched
    arrays through zip truncation — fixed here).'''
    structures = np.asarray(structures)
    if energies is not None:
        energies = np.asarray(energies)
        assert len(energies) == len(structures)

    def ret(structs, ens):
        return (structs, ens) if return_energies else structs

    if len(structures) <= n:
        return ret(structures, energies)
    if n > 300:
        # reference BUG fixed and noted: torsion_module.py:864 samples
        # WITH replacement (np.random.choice default), so the "n most
        # diverse" selection can contain duplicate structures and fewer
        # than n distinct conformers; replace=False returns n distinct
        # structures as intended
        indices = np.sort(np.random.choice(len(structures), size=n,
                                           replace=False))
        return ret(structures[indices],
                   energies[indices] if energies is not None else None)

    structures, keep = prune_conformers_tfd(structures, torsion_array)
    if energies is not None:
        energies = energies[keep]
    if len(structures) <= n:
        return ret(structures, energies)

    from sklearn.cluster import KMeans
    aligned = align_structures(structures)
    features = aligned.reshape(len(aligned), -1)
    kmeans = KMeans(n_clusters=n, n_init=10)
    kmeans.fit(features)

    if energies is not None:
        clusters = [[] for _ in range(n)]
        for c_coords, energy, c in zip(aligned, energies, kmeans.labels_):
            clusters[c].append((c_coords, energy))
        picked = [sorted(group, key=lambda x: x[1])[0]
                  for group in clusters if group]
        output = [p[0] for p in picked]
        out_energies = np.array([p[1] for p in picked])
    else:
        centers = kmeans.cluster_centers_.reshape((n, *aligned.shape[1:3]))
        clusters = [[] for _ in range(n)]
        for c_coords, c in zip(aligned, kmeans.labels_):
            clusters[c].append(c_coords)
        r = np.arange(n)
        output = []
        for ci, cluster in enumerate(clusters):
            if cluster:
                cumdists = [np.sum(np.linalg.norm(centers[r != ci] - ref,
                                                  axis=2))
                            for ref in cluster]
                output.append(cluster[int(np.argmax(cumdists))])
        out_energies = None
    return ret(np.array(output), out_energies)


def csearch_operator(embedder, mol, mode=1, keep_hb=False):
    '''csearch>/csearch_hb>/rsearch> operator: replace a molecule's
    ensemble with searched conformers
    (reference operators.py:158-224).'''
    embedder.log(f'--> {mol.rootname}: csearch operator (mode {mode})')

    keep_hb = keep_hb or embedder.options.keep_hb

    # internal constraints for this molecule (same letter twice), as the
    # reference passes (operators.py:187)
    mol_id = embedder.objects.index(mol) if mol in embedder.objects else None
    internal = None
    if mol_id is not None and mol_id in getattr(embedder, 'pairings_dict', {}):
        pairs = [tgt for tgt in embedder.pairings_dict[mol_id].values()
                 if isinstance(tgt, tuple)]
        internal = np.array(pairs) if pairs else None

    # one search from EACH input conformer, n_out split between them
    # (reference operators.py:170-199)
    n_confs = len(mol.atomcoords)
    if n_confs > 1:
        embedder.log('    multimolecular file: individual search from '
                     'each conformer')
    batches = []
    for i, start in enumerate(mol.atomcoords):
        # NOTE: the reference operator always calls csearch WITHOUT FF
        # optimization (operators.py:184-194 passes no ff_opt) — the
        # run-level ff_opt option governs the refinement stages, not
        # the conformer search inside csearch>
        batch = csearch(
            start, mol.atomnos, constrained_indices=internal,
            keep_hb=keep_hb, mode=mode,
            n_out=max(embedder.options.max_confs // n_confs, 1),
            title=f'{mol.rootname}_conf{i}' if n_confs > 1 else mol.rootname,
            logfunction=embedder.log, embedder=embedder)
        if len(batch):
            batches.append(np.asarray(batch))
    conformers = np.concatenate(batches) if batches else \
        mol.atomcoords[:1]

    from tscode_tpu.molecule import Molecule
    new_mol = Molecule.__new__(Molecule)
    new_mol.__dict__.update(mol.__dict__)
    new_mol.atomcoords = np.asarray(conformers)
    new_mol.reactive_atoms = {}
    if len(mol.reactive_indices):
        new_mol.compute_orbitals()
    return new_mol
