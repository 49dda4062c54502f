'''Symmetry-corrected RMSD pruning tests on a synthetic CF3-CH2-Cl rotor.'''

import numpy as np

from tscode_tpu.graphs import graphize
from tscode_tpu.rot_rmsd import (_dummy_torsion_setup, _rotate,
                                 prune_conformers_rmsd_rot_corr,
                                 rotationally_corrected_rmsd)


def _cf3_ch2_cl():
    '''Synthetic 1-chloro-2,2,2-trifluoroethane-like geometry.
    Atom order chosen so the torsion representative is all-heavy
    (F-C-C-Cl).'''
    # C1 at origin with 3 F (tetrahedral-ish), C2 along +x with Cl + 2 H
    c1 = np.zeros(3)
    c2 = np.array([1.54, 0.0, 0.0])
    def tet(base, axis, r, phase):
        # three substituents ringed about -axis
        out = []
        axis = axis / np.linalg.norm(axis)
        perp = np.array([0.0, 1.0, 0.0])
        perp = perp - (perp @ axis) * axis
        perp /= np.linalg.norm(perp)
        third = np.cross(axis, perp)
        for k in range(3):
            ang = np.radians(phase + 120 * k)
            direction = (-axis * np.cos(np.radians(70.5))
                         + (perp * np.cos(ang) + third * np.sin(ang))
                         * np.sin(np.radians(70.5)))
            out.append(base + r * direction)
        return out

    f1, f2, f3 = tet(c1, c2 - c1, 1.33, 0.0)
    cl_and_hs = tet(c2, c1 - c2, 1.2, 60.0)
    cl = c2 + (cl_and_hs[0] - c2) / 1.2 * 1.77       # stretch first to Cl
    h1, h2 = cl_and_hs[1], cl_and_hs[2]

    coords = np.array([f1, f2, f3, c1, c2, cl, h1, h2])
    atomnos = np.array([9, 9, 9, 6, 6, 17, 1, 1])
    return coords, atomnos


def test_dummy_rotor_discovery():
    coords, atomnos = _cf3_ch2_cl()
    graph = graphize(coords, atomnos)
    quads, angles, masks, local_nodes, _ = _dummy_torsion_setup(
        np.array([coords]), atomnos, graph)
    assert len(quads) == 1
    assert set(quads[0][1:3]) == {3, 4}          # central C-C bond
    assert tuple(angles[0]) == (0, 120, 240)     # 3-fold CF3
    # the quad is reoriented dummy-side-last (reference :1049), so the
    # rotation mask moves the NON-dummy CH2Cl fragment — equivalent
    # relative twist under the Kabsch-corrected comparison
    assert masks[0].sum() == 3
    assert set(np.nonzero(masks[0])[0]) == {5, 6, 7}


def test_corrected_rmsd_identifies_symmetric_twin():
    coords, atomnos = _cf3_ch2_cl()
    graph = graphize(coords, atomnos)
    quads, angles, masks, local_nodes, _ = _dummy_torsion_setup(
        np.array([coords]), atomnos, graph)

    from tscode_tpu.rot_rmsd import _kabsch_rmsd
    cf3_mask = np.zeros(8, bool)
    cf3_mask[[0, 1, 2]] = True
    heavy = atomnos != 1

    ref = coords - coords.mean(axis=0)
    # twin: CF3 physically rotated by exactly 120 deg (a symmetry op)
    twin = _rotate(coords, (0, 3, 4, 5), 120.0, cf3_mask)
    twin = twin - twin.mean(axis=0)
    r_plain = _kabsch_rmsd(ref[heavy], twin[heavy])
    r = rotationally_corrected_rmsd(ref, twin.copy(), atomnos, quads,
                                    angles, masks, local_nodes)
    # the correction recovers most of the difference; a small residual
    # remains because the reference's kabsch_rmsd does not re-center
    # (the corrective rotation axis does not pass through the centroid)
    assert r < 0.25 < r_plain

    # 60-degree twist is NOT a symmetry operation
    off = _rotate(coords, (0, 3, 4, 5), 60.0, cf3_mask)
    off = off - off.mean(axis=0)
    r_off = rotationally_corrected_rmsd(ref, off.copy(), atomnos, quads,
                                        angles, masks, local_nodes)
    assert r_off > 0.25


def test_prune_rot_corr():
    coords, atomnos = _cf3_ch2_cl()
    graph = graphize(coords, atomnos)
    quads, angles, masks, _, _ = _dummy_torsion_setup(
        np.array([coords]), atomnos, graphize(coords, atomnos))

    twin = _rotate(coords, quads[0], 240.0, masks[0])
    distinct = _rotate(coords, quads[0], 60.0, masks[0])
    structures = np.array([coords, twin, distinct])

    pruned, mask = prune_conformers_rmsd_rot_corr(
        structures, atomnos, graph, max_rmsd=0.25)
    assert mask.tolist() == [True, False, True]


def test_prune_skips_when_no_dummy_rotors():
    # ethylene has no rotors at all
    from tscode_tpu.molecule import Molecule
    import os
    mol = Molecule(os.path.join(os.path.dirname(__file__), 'fixtures',
                                'C2H4.xyz'))
    structures = np.array([mol.atomcoords[0], mol.atomcoords[0] + 0.01])
    pruned, mask = prune_conformers_rmsd_rot_corr(
        structures, mol.atomnos, mol.graph)
    assert mask.all()
