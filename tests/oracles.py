'''
Numpy reference oracles implementing the formulas of the reference's
Numba kernel layer (algebra.py, rmsd_pruning.py, numba_functions.py,
utils.py). These use LAPACK (np.linalg.svd / eig) directly and serve as
the golden standard the TPU kernels are tested against at 1e-6 A.
'''

import numpy as np


def norm_of(v):
    return float(np.sqrt(np.dot(v, v)))


def norm(v):
    return v / norm_of(v)


def dihedral(p):
    '''Praxeolitic dihedral (degrees) from 4 points (algebra.py:23-56).'''
    p0, p1, p2, p3 = p
    b0 = -1.0 * (p1 - p0)
    b1 = p2 - p1
    b2 = p3 - p2
    b1 = b1 / norm_of(b1)
    v = b0 - np.dot(b0, b1) * b1
    w = b2 - np.dot(b2, b1) * b1
    x = np.dot(v, w)
    y = np.dot(np.cross(b1, v), w)
    return np.degrees(np.arctan2(y, x))


def quaternion_to_rotation_matrix(Q):
    '''(algebra.py:284-323), scalar-last quaternion.'''
    q0, q1, q2, q3 = Q[3], Q[0], Q[1], Q[2]
    return np.array([
        [2 * (q0 * q0 + q1 * q1) - 1, 2 * (q1 * q2 - q0 * q3), 2 * (q1 * q3 + q0 * q2)],
        [2 * (q1 * q2 + q0 * q3), 2 * (q0 * q0 + q2 * q2) - 1, 2 * (q2 * q3 - q0 * q1)],
        [2 * (q1 * q3 - q0 * q2), 2 * (q2 * q3 + q0 * q1), 2 * (q0 * q0 + q3 * q3) - 1],
    ])


def rot_mat_from_pointer(pointer, angle):
    '''(algebra.py:325-344)'''
    pointer = norm(pointer)
    angle = angle * np.pi / 180
    quat = np.array([np.sin(angle / 2) * pointer[0],
                     np.sin(angle / 2) * pointer[1],
                     np.sin(angle / 2) * pointer[2],
                     np.cos(angle / 2)])
    return quaternion_to_rotation_matrix(quat)


def rotation_matrix_from_vectors(vec1, vec2):
    '''(utils.py:183-208)'''
    a, b = norm(vec1), norm(vec2)
    v = np.cross(a, b)
    if norm_of(v) != 0:
        c = np.dot(a, b)
        s = norm_of(v)
        kmat = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        return np.eye(3) + kmat + kmat.dot(kmat) * ((1 - c) / (s ** 2))
    if norm_of(a + b) == 0:
        return rot_mat_from_pointer(np.array([0., 0., 1.]), 180)
    return np.eye(3)


def align_vec_pair(ref, tgt):
    '''SVD two-vector Kabsch (algebra.py:258-282).'''
    B = np.zeros((3, 3))
    for i in range(3):
        for k in range(3):
            B[i, k] = sum(ref[j][i] * tgt[j][k] for j in range(2))
    u, s, vh = np.linalg.svd(B)
    if np.linalg.det(u @ vh) < 0:
        u[:, -1] = -u[:, -1]
    return u @ vh


def rmsd_and_max(p, q):
    '''SVD Kabsch RMSD + max deviation, NO centering (rmsd_pruning.py:6-41).'''
    cov = p.T @ q
    v, _, w = np.linalg.svd(cov)
    if (np.linalg.det(v) * np.linalg.det(w)) < 0.0:
        v[:, -1] = -v[:, -1]
    rot = v @ w
    p2 = p @ rot
    diff = p2 - q
    rmsd = np.sqrt((diff * diff).sum() / len(diff))
    maxdev = np.linalg.norm(diff, axis=1).max()
    return rmsd, maxdev


def center_of_mass(coords, masses):
    return (coords * masses[:, None]).sum(axis=0) / masses.sum()


def get_inertia_moments(coords, masses):
    '''(algebra.py:165-186): diagonalized inertia tensor, sorted by |eig|.'''
    coords = coords - center_of_mass(coords, masses)
    T = np.zeros((3, 3))
    for i in range(3):
        for j in range(3):
            k = 1.0 if i == j else 0.0
            T[i, j] = sum(masses[n] * ((np.dot(coords[n], coords[n])) * k
                                       - coords[n][i] * coords[n][j])
                          for n in range(len(coords)))
    evals = np.linalg.eigvalsh(T)
    return evals[np.argsort(np.abs(evals))]


def all_dists(A, B):
    '''Dense Euclidean distance matrix (algebra.py:98-157 semantics).'''
    return np.sqrt(((A[:, None, :] - B[None, :, :]) ** 2).sum(-1))


def compenetration_check(coords, ids=None, thresh=1.5, max_clashes=0):
    '''(numba_functions.py:59-105) exact counting semantics.'''
    if ids is None:
        d = all_dists(coords, coords)
        return 0 if np.count_nonzero((d < 0.5) & (d > 0)) > max_clashes else 1
    if len(ids) == 2:
        m1, m2 = coords[:ids[0]], coords[ids[0]:]
        return 0 if np.count_nonzero(all_dists(m2, m1) < thresh) > max_clashes else 1
    m1 = coords[0:ids[0]]
    m2 = coords[ids[0]:ids[0] + ids[1]]
    m3 = coords[ids[0] + ids[1]:]
    clashes = np.count_nonzero(all_dists(m2, m1) < thresh)
    if clashes > max_clashes:
        return 0
    clashes += np.count_nonzero(all_dists(m3, m2) < thresh)
    if clashes > max_clashes:
        return 0
    clashes += np.count_nonzero(all_dists(m1, m3) < thresh)
    return 0 if clashes > max_clashes else 1


def get_torsion_fingerprint(coords, quadruplets):
    '''(numba_functions.py:262-271), float32 like the reference.'''
    out = np.zeros(len(quadruplets), dtype=np.float32)
    for i, (i1, i2, i3, i4) in enumerate(quadruplets):
        out[i] = dihedral(np.array([coords[i1], coords[i2], coords[i3], coords[i4]]))
    return out


def tfd_similarity(tfp1, tfp2, thresh=10):
    '''(numba_functions.py:245-260)'''
    deltas = np.abs(tfp1 - tfp2)
    deltas = np.abs(deltas - (deltas > 180) * 360)
    return bool(np.sum(deltas) < thresh)


def score_embed_poses(structures, constrained_indices, constrained_distances):
    '''(numba_functions.py:273-287)'''
    scores = np.zeros(len(structures), dtype=np.float32)
    for j in range(len(structures)):
        for i, (i1, i2) in enumerate(constrained_indices[j]):
            dist = np.linalg.norm(structures[j][i1] - structures[j][i2])
            scores[j] += np.abs(dist - constrained_distances[j][i])
    return scores
