'''
Internal harmonic force field (device-resident, batched).

The reference keeps molecules physical during bending / pre-optimization
by combining real QM forces with graph-derived constraints
(PreventScramblingConstraint, ase_manipulations.py:595-634; OrbitalSpring
:528-593). This module provides the TPU-native analog: a graph-derived
harmonic force field — bonds and angles restrained to their input
geometry plus a soft nonbonded repulsion — whose energy/forces evaluate
for a WHOLE BATCH of structures in one fused device program (jax.grad
over a vectorized energy). It is the calculator-free fallback for
bending, chain relaxation and pose sanitization; when an external QM
binary is available the same drivers can use it instead.
'''

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tscode_tpu.graphs import neighbors
from tscode_tpu.pt import COVALENT_RADII

K_BOND = 100.0      # kcal/mol/A^2
K_ANGLE = 30.0      # kcal/mol/rad^2
K_REP = 50.0        # kcal/mol at full overlap
K_DIH = 30.0        # kcal/mol/rad^2 (double-bond E/Z protection)
REP_SCALE = 0.85    # fraction of summed covalent radii where repulsion starts

@dataclass
class FFParams:
    '''Static parameter set for one topology (padded-batch friendly).'''
    bonds: np.ndarray           # (NB, 2) int
    bond_r0: np.ndarray         # (NB,)
    angles: np.ndarray          # (NA, 3) int (i-j-k, j central)
    angle_t0: np.ndarray        # (NA,) radians
    nb_pairs: np.ndarray        # (NP, 2) int, nonbonded (>= 1-3 separated)
    nb_r0: np.ndarray           # (NP,) repulsion onset distances
    dihedrals: np.ndarray = None   # (ND, 4) int (E/Z-protected quads)
    dihedral_t0: np.ndarray = None  # (ND,) radians

    def __post_init__(self):
        if self.dihedrals is None:
            # fresh per instance — a shared module-level empty array
            # would alias every FFParams against in-place mutation
            self.dihedrals = np.zeros((0, 4), dtype=int)
            self.dihedral_t0 = np.zeros(0)


def build_ff_params(coords0, atomnos, graph, protect_double_bonds=False):
    '''Derive harmonic reference values from the input geometry and the
    bond graph; nonbonded pairs are all pairs at graph distance >= 3.

    protect_double_bonds adds a restraint on one dihedral across every
    double bond (EZPROT keyword) — the FF analog of the reference's
    PreventScramblingConstraint(double_bond_protection=True)
    (ase_manipulations.py:618-633).'''
    coords0 = np.asarray(coords0)
    atomnos = np.asarray(atomnos)
    n = len(atomnos)

    bonds = np.array([(a, b) for a, b in graph.edges if a != b],
                     dtype=int).reshape(-1, 2)   # (0, 2) when bond-less
    bond_r0 = np.linalg.norm(coords0[bonds[:, 0]] - coords0[bonds[:, 1]],
                             axis=1) if len(bonds) else np.zeros(0)

    angles = []
    for j in range(n):
        nbs = neighbors(graph, j)
        for a in range(len(nbs)):
            for b in range(a + 1, len(nbs)):
                angles.append((nbs[a], j, nbs[b]))
    angles = np.array(angles, dtype=int) if angles else \
        np.zeros((0, 3), dtype=int)

    def _angle(i, j, k):
        v1 = coords0[i] - coords0[j]
        v2 = coords0[k] - coords0[j]
        cos = np.clip(v1 @ v2 / np.linalg.norm(v1) / np.linalg.norm(v2),
                      -1, 1)
        return np.arccos(cos)

    angle_t0 = np.array([_angle(*a) for a in angles]) if len(angles) \
        else np.zeros(0)

    # nonbonded: pairs at topological distance >= 3
    import networkx as nx
    dist = dict(nx.all_pairs_shortest_path_length(graph, cutoff=2))
    nb_pairs = [(i, j) for i in range(n) for j in range(i + 1, n)
                if j not in dist.get(i, {})]
    nb_pairs = np.array(nb_pairs, dtype=int) if nb_pairs else \
        np.zeros((0, 2), dtype=int)
    radii = COVALENT_RADII[atomnos]
    nb_r0 = REP_SCALE * (radii[nb_pairs[:, 0]] + radii[nb_pairs[:, 1]]) \
        if len(nb_pairs) else np.zeros(0)

    dihedrals, dihedral_t0 = np.zeros((0, 4), dtype=int), np.zeros(0)
    if protect_double_bonds:
        from tscode_tpu.torsions import get_double_bonds_indices
        quads = []
        for a, b in get_double_bonds_indices(coords0, atomnos):
            n_a = [n for n in neighbors(graph, a) if n != b]
            n_b = [n for n in neighbors(graph, b) if n != a]
            if n_a and n_b:
                quads.append((n_a[0], a, b, n_b[0]))
        if quads:
            dihedrals = np.array(quads, dtype=int)
            dihedral_t0 = np.array([_dihedral_np(coords0[list(q)])
                                    for q in quads])

    return FFParams(bonds=bonds, bond_r0=bond_r0, angles=angles,
                    angle_t0=angle_t0, nb_pairs=nb_pairs, nb_r0=nb_r0,
                    dihedrals=dihedrals, dihedral_t0=dihedral_t0)


def _dihedral_np(p):
    '''Praxeolitic dihedral of 4 points, radians (host-side).'''
    b0, b1, b2 = p[0] - p[1], p[2] - p[1], p[3] - p[2]
    b1 = b1 / np.linalg.norm(b1)
    v = b0 - np.dot(b0, b1) * b1
    w = b2 - np.dot(b2, b1) * b1
    return np.arctan2(np.dot(np.cross(b1, v), w), np.dot(v, w))


def ff_energy(coords, params_arrays):
    '''Batched FF energy: coords (..., N, 3) -> (...).
    params_arrays: tuple of jnp arrays (bonds, bond_r0, angles, angle_t0,
    nb_pairs, nb_r0[, dihedrals, dihedral_t0]) — static per topology.'''
    if len(params_arrays) == 8:
        (bonds, bond_r0, angles, angle_t0, nb_pairs, nb_r0,
         dihedrals, dihedral_t0) = params_arrays
    else:
        bonds, bond_r0, angles, angle_t0, nb_pairs, nb_r0 = params_arrays
        dihedrals = None
    e = jnp.zeros(coords.shape[:-2], dtype=coords.dtype)

    if bonds.shape[0]:
        d = jnp.linalg.norm(coords[..., bonds[:, 0], :]
                            - coords[..., bonds[:, 1], :], axis=-1)
        e = e + K_BOND * jnp.sum((d - bond_r0) ** 2, axis=-1)

    if angles.shape[0]:
        v1 = coords[..., angles[:, 0], :] - coords[..., angles[:, 1], :]
        v2 = coords[..., angles[:, 2], :] - coords[..., angles[:, 1], :]
        cos = jnp.sum(v1 * v2, axis=-1) / jnp.maximum(
            jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1),
            1e-12)
        theta = jnp.arccos(jnp.clip(cos, -1.0 + 1e-9, 1.0 - 1e-9))
        e = e + K_ANGLE * jnp.sum((theta - angle_t0) ** 2, axis=-1)

    if nb_pairs.shape[0]:
        d = jnp.linalg.norm(coords[..., nb_pairs[:, 0], :]
                            - coords[..., nb_pairs[:, 1], :], axis=-1)
        overlap = jnp.maximum(nb_r0 - d, 0.0)
        e = e + K_REP * jnp.sum(overlap ** 2, axis=-1)

    if dihedrals is not None and dihedrals.shape[0]:
        p0 = coords[..., dihedrals[:, 0], :]
        p1 = coords[..., dihedrals[:, 1], :]
        p2 = coords[..., dihedrals[:, 2], :]
        p3 = coords[..., dihedrals[:, 3], :]
        b0, b1, b2 = p0 - p1, p2 - p1, p3 - p2
        b1 = b1 / jnp.maximum(
            jnp.linalg.norm(b1, axis=-1, keepdims=True), 1e-12)
        v = b0 - jnp.sum(b0 * b1, axis=-1, keepdims=True) * b1
        w = b2 - jnp.sum(b2 * b1, axis=-1, keepdims=True) * b1
        phi = jnp.arctan2(jnp.sum(jnp.cross(b1, v) * w, axis=-1),
                          jnp.sum(v * w, axis=-1))
        # wrapped deviation so +pi/-pi do not fight each other
        delta = jnp.arctan2(jnp.sin(phi - dihedral_t0),
                            jnp.cos(phi - dihedral_t0))
        e = e + K_DIH * jnp.sum(delta ** 2, axis=-1)

    return e


def params_to_device(params):
    '''FFParams -> tuple of jnp arrays for jit closures.'''
    return (jnp.asarray(params.bonds), jnp.asarray(params.bond_r0),
            jnp.asarray(params.angles), jnp.asarray(params.angle_t0),
            jnp.asarray(params.nb_pairs), jnp.asarray(params.nb_r0),
            jnp.asarray(params.dihedrals), jnp.asarray(params.dihedral_t0))


def merge_ff_params(params_list, offsets):
    '''Concatenate per-molecule FF params into one multimolecular set
    (indices shifted by each molecule's atom offset).'''
    def cat(field, shift_cols=None):
        parts = []
        for p, off in zip(params_list, offsets):
            arr = getattr(p, field)
            if shift_cols and len(arr):
                arr = arr + off
            parts.append(arr)
        return np.concatenate(parts) if any(len(p) for p in parts) else \
            parts[0]

    return FFParams(
        bonds=cat('bonds', True), bond_r0=cat('bond_r0'),
        angles=cat('angles', True), angle_t0=cat('angle_t0'),
        nb_pairs=cat('nb_pairs', True), nb_r0=cat('nb_r0'),
        dihedrals=cat('dihedrals', True), dihedral_t0=cat('dihedral_t0'))
