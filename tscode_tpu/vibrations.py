'''
Vibrational analysis and ideal-gas RRHO thermochemistry on device.

The reference exposes frequency calculations through ASE
(`ase_vib`, /root/reference/tscode/ase_manipulations.py:348-380 —
finite-difference displacements, one force call each) and obtains free
energies by shelling out to `xtb --ohess`
(/root/reference/tscode/calculators/_xtb.py:440-512). The TPU-native
form needs neither displacements nor subprocesses for FF-backed paths:
the internal force field (ff.py) is differentiable, so the full
mass-weighted Hessian of a structure — or of a whole batch of
structures via vmap — comes from one `jax.hessian` program, and the
RRHO partition-function corrections are closed-form on top of the
eigenvalues.

Conventions: coordinates in Angstrom, energies in kcal/mol, masses in
amu. Frequencies are returned in cm^-1, with imaginary modes encoded as
negative numbers (the count of imaginary modes is returned alongside,
mirroring the reference's `np.count_nonzero(freqs.imag > 1e-3)`).
'''

import jax
import jax.numpy as jnp
import numpy as np

from tscode_tpu.pt import MASSES

# sqrt(kcal/mol / (amu * A^2)) -> cm^-1
# lambda_SI = lambda * 4184 / (N_A * amu_kg * 1e-20)  [s^-2]; amu_kg*N_A = 1e-3
_KCAL_PER_MOL = 4184.0                      # J/mol
_C_CM = 2.99792458e10                       # speed of light, cm/s
_FREQ_FACTOR = np.sqrt(_KCAL_PER_MOL / 1e-23) / (2.0 * np.pi * _C_CM)

# thermochemistry constants
_KB = 0.0019872042586408316                 # kcal/mol/K (R in kcal)
_H_PLANCK = 6.62607015e-34                  # J s
_KB_J = 1.380649e-23                        # J/K
_AMU = 1.66053906892e-27                    # kg
_NA = 6.02214076e23


def mass_weighted_hessian(energy_fn, coords, masses):
    '''Dense mass-weighted Hessian (3N, 3N) of a differentiable
    energy_fn(coords)->scalar at coords (N, 3); masses (N,) in amu.'''
    n = coords.shape[-2]
    flat = coords.reshape(-1)
    hess = jax.hessian(lambda x: energy_fn(x.reshape(n, 3)))(flat)
    w = 1.0 / jnp.sqrt(jnp.repeat(masses, 3))
    return hess * w[:, None] * w[None, :]


def _tr_rot_projector(coords, masses):
    '''Projector removing translations and infinitesimal rotations from a
    mass-weighted Hessian (Eckart frame). Returns (3N, 3N).'''
    n = coords.shape[0]
    sqm = jnp.sqrt(masses)
    com = jnp.sum(coords * masses[:, None], axis=0) / jnp.sum(masses)
    x = coords - com

    basis = []
    for ax in range(3):                               # translations
        t = jnp.zeros((n, 3)).at[:, ax].set(sqm)
        basis.append(t.reshape(-1))
    eye = jnp.eye(3)
    for ax in range(3):                               # rotations
        r = jnp.cross(jnp.broadcast_to(eye[ax], (n, 3)), x) * sqm[:, None]
        basis.append(r.reshape(-1))
    b = jnp.stack(basis, axis=1)                      # (3N, 6)

    # orthonormalize, dropping near-null vectors (linear molecules)
    q, r = jnp.linalg.qr(b)
    keep = jnp.abs(jnp.diag(r)) > 1e-8
    q = q * keep[None, :]
    return jnp.eye(3 * n) - q @ q.T


import contextlib


@contextlib.contextmanager
def _x64_cpu_scope():
    '''Vibrational analysis is f64-only: in f32, the mass-weighted
    Hessian eigensolve reports spurious near-zero imaginary modes that
    corrupt n_imag and g_corr. When the ambient config already has x64
    (CPU parity lane) this is a no-op; otherwise (f32 accelerator
    backend) the computation is SCOPED to x64 on the host CPU backend
    via the jax.enable_x64 config context — frequencies are a tiny
    dense eigenproblem, not worth a device round-trip — so
    thermochemistry works from any backend instead of raising. The scoped config is
    part of the jit trace context, so f32 executables elsewhere are
    unaffected.

    Yields the CPU device the scope pins (None when it is a no-op) so
    callers can `jax.device_put` their inputs onto it — a committed
    accelerator-resident input would otherwise raise a device mismatch
    inside the scope. CONTRACT for energy_fn builders: keep captured
    parameter arrays UNCOMMITTED (plain `jnp.asarray`, as
    ff.params_to_device does — uncommitted arrays follow the scoped
    default device); never `jax.device_put(..., device)` them.'''
    if jax.config.jax_enable_x64:
        yield None
        return
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu), jax.enable_x64(True):
        yield cpu


def frequencies(coords, atomnos, energy_fn, project=True):
    '''Harmonic frequencies of one structure.

    Returns (freqs_cm (3N,), n_imag). Imaginary modes appear as negative
    wavenumbers; the six (five) projected rigid-body modes come out as
    ~0 and are zeroed. Mirrors the contract of the reference's ase_vib
    (ase_manipulations.py:348-380) without the per-displacement loop.
    '''
    with _x64_cpu_scope():
        coords = jnp.asarray(np.asarray(coords), dtype=jnp.float64)
        masses = jnp.asarray(MASSES[np.asarray(atomnos)],
                             dtype=coords.dtype)
        h = mass_weighted_hessian(energy_fn, coords, masses)
        h = 0.5 * (h + h.T)
        if project:
            p = _tr_rot_projector(coords, masses)
            h = p @ h @ p
        evals = jnp.linalg.eigvalsh(h)
        freqs = jnp.sign(evals) * _FREQ_FACTOR * jnp.sqrt(jnp.abs(evals))
        # zero out the projected rigid-body modes
        freqs = jnp.where(jnp.abs(freqs) < 1.0, 0.0, freqs)
        n_imag = int(jnp.sum(freqs < -1e-3))
        return np.asarray(freqs), n_imag


import functools


@functools.lru_cache(maxsize=32)
def _freqs_batch_program(energy_fn, project):
    '''Jitted vmapped frequency program, cached per (energy_fn, project)
    so repeated batches reuse the compiled executable (jit keys on
    function identity — a fresh closure per call would recompile).'''
    def one(c, masses):
        h = mass_weighted_hessian(energy_fn, c, masses)
        h = 0.5 * (h + h.T)
        if project:
            p = _tr_rot_projector(c, masses)
            h = p @ h @ p
        evals = jnp.linalg.eigvalsh(h)
        f = jnp.sign(evals) * _FREQ_FACTOR * jnp.sqrt(jnp.abs(evals))
        return jnp.where(jnp.abs(f) < 1.0, 0.0, f)

    return jax.jit(jax.vmap(one, in_axes=(0, None)))


def frequencies_batch(coords_batch, atomnos, energy_fn, project=True):
    '''vmapped frequencies over a (B, N, 3) batch — one device program
    computes every Hessian. Returns (freqs (B, 3N), n_imag (B,)).'''
    with _x64_cpu_scope():
        coords_batch = jnp.asarray(np.asarray(coords_batch),
                                   dtype=jnp.float64)
        masses = jnp.asarray(MASSES[np.asarray(atomnos)],
                             dtype=coords_batch.dtype)
        freqs = _freqs_batch_program(energy_fn, project)(coords_batch,
                                                         masses)
        return np.asarray(freqs), np.asarray(jnp.sum(freqs < -1e-3,
                                                     axis=1))


def _maps_onto_itself(coords, atomnos, rot, tol=0.15):
    '''True when `rot @ coords` is a same-element permutation of coords
    (each rotated atom lands within tol of exactly one original atom of
    the same element, bijectively).'''
    moved = coords @ rot.T
    taken = np.zeros(len(coords), dtype=bool)
    for i, (pos, a) in enumerate(zip(moved, atomnos)):
        dists = np.linalg.norm(coords - pos, axis=1)
        dists[(atomnos != a) | taken] = np.inf
        j = int(np.argmin(dists))
        if dists[j] > tol:
            return False
        taken[j] = True
    return True


def _axis_rotation(axis, angle):
    axis = axis / np.linalg.norm(axis)
    k = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)


def detect_symmetry_number(coords, atomnos):
    '''External rotational symmetry number sigma from geometry: the
    order of the proper-rotation subgroup, found by testing Cn
    (n = 2,3,4,5,6) about each principal inertia axis and perpendicular
    C2 axes (through atoms and bond midpoints) for the Cn -> n,
    Dn -> 2n rule. Linear molecules: 1 (C-inf-v) or 2 (D-inf-h).
    Conservative by construction — an undetected symmetry only makes
    the rotational entropy slightly too positive, the same direction as
    the reference's sigma-blind free energies (_xtb.py:440-512).'''
    coords = np.asarray(coords, dtype=float)
    atomnos = np.asarray(atomnos)
    if len(coords) == 1:
        return 1

    masses = MASSES[atomnos]
    com = np.sum(coords * masses[:, None], axis=0) / np.sum(masses)
    x0 = coords - com

    inert = np.zeros((3, 3))
    for xi, mi in zip(x0, masses):
        inert += mi * (np.dot(xi, xi) * np.eye(3) - np.outer(xi, xi))
    moments, axes = np.linalg.eigh(inert)

    if moments[0] < 1e-3 * max(moments[2], 1e-12):      # linear
        axis = axes[:, 0]
        # D-inf-h iff a perpendicular C2 (end-over-end flip) holds
        perp = np.eye(3)[np.argmin(np.abs(axis))]
        perp = perp - np.dot(perp, axis) * axis
        flip = _axis_rotation(perp, np.pi)
        return 2 if _maps_onto_itself(x0, atomnos, flip) else 1

    # highest-order Cn about any principal axis
    best_n, best_axis = 1, axes[:, 2]
    for col in range(3):
        axis = axes[:, col]
        for n in (6, 5, 4, 3, 2):
            if n <= best_n:
                break
            if _maps_onto_itself(x0, atomnos,
                                 _axis_rotation(axis, 2 * np.pi / n)):
                best_n, best_axis = n, axis
                break

    # Dn: any C2 perpendicular to the main axis (axes through atoms,
    # bond midpoints, and the remaining principal axes)
    candidates = [axes[:, c] for c in range(3)]
    candidates += [xi for xi in x0 if np.linalg.norm(xi) > 1e-3]
    candidates += [x0[i] + x0[j]
                   for i in range(min(len(x0), 12))
                   for j in range(i + 1, min(len(x0), 12))]
    for cand in candidates:
        perp = cand - np.dot(cand, best_axis) * best_axis
        norm = np.linalg.norm(perp)
        if norm < 1e-3:
            continue
        if _maps_onto_itself(x0, atomnos,
                             _axis_rotation(perp / norm, np.pi)):
            return 2 * best_n
    return best_n


def thermochemistry(freqs_cm, atomnos, coords, temperature=298.15,
                    pressure=101325.0, symmetry_number=None):
    '''Ideal-gas RRHO corrections from harmonic frequencies.

    Returns a dict (kcal/mol unless noted): zpe, e_vib, e_rot, e_trans,
    h_corr (enthalpy correction incl. RT), s (entropy, kcal/mol/K),
    g_corr (Gibbs correction, add to the electronic energy). Imaginary
    and rigid-body modes are excluded, matching the convention of the
    reference's xtb `--ohess` free-energy route (_xtb.py:440-512).

    symmetry_number: external rotational sigma; None (default)
    auto-detects it from the geometry (detect_symmetry_number) so the
    -R*T*ln(sigma) rotational-entropy term (~0.4 kcal/mol at sigma=2,
    298 K) is included without the caller knowing the point group.
    '''
    if symmetry_number is None:
        symmetry_number = detect_symmetry_number(coords, atomnos)
    t = float(temperature)
    freqs = np.asarray(freqs_cm, dtype=float)
    freqs = freqs[freqs > 1.0]                  # real vibrational modes

    masses = MASSES[np.asarray(atomnos)]
    coords = np.asarray(coords, dtype=float)

    # vibrational: ZPE + thermal, entropy (harmonic oscillator)
    theta = _H_PLANCK * _C_CM * freqs / _KB_J          # K per mode
    x = theta / t
    zpe = float(np.sum(0.5 * _KB * theta))
    expm = np.expm1(x)
    e_vib = float(np.sum(_KB * theta / expm))
    s_vib = float(np.sum(_KB * (x / expm - np.log1p(-np.exp(-x)))))

    # translational
    m_kg = float(np.sum(masses)) * _AMU
    q_trans = ((2 * np.pi * m_kg * _KB_J * t / _H_PLANCK ** 2) ** 1.5
               * _KB_J * t / pressure)
    e_trans = 1.5 * _KB * t
    s_trans = _KB * (np.log(q_trans) + 2.5)

    # rotational (rigid rotor from the inertia tensor)
    com = np.sum(coords * masses[:, None], axis=0) / np.sum(masses)
    x0 = coords - com
    inert = np.zeros((3, 3))
    for xi, mi in zip(x0, masses):
        inert += mi * (np.dot(xi, xi) * np.eye(3) - np.outer(xi, xi))
    moments = np.sort(np.linalg.eigvalsh(inert))       # amu A^2
    moments_si = moments * _AMU * 1e-20
    linear = moments_si[0] < 1e-3 * moments_si[2] or len(atomnos) == 2
    if len(atomnos) == 1:
        e_rot = s_rot = 0.0
    elif linear:
        theta_r = _H_PLANCK ** 2 / (8 * np.pi ** 2 * _KB_J * moments_si[2])
        q_rot = t / (symmetry_number * theta_r)
        e_rot = _KB * t
        s_rot = _KB * (np.log(q_rot) + 1.0)
    else:
        theta_r = _H_PLANCK ** 2 / (8 * np.pi ** 2 * _KB_J * moments_si)
        q_rot = (np.sqrt(np.pi) / symmetry_number
                 * np.sqrt(t ** 3 / np.prod(theta_r)))
        e_rot = 1.5 * _KB * t
        s_rot = _KB * (np.log(q_rot) + 1.5)

    s_tot = s_vib + s_trans + s_rot
    h_corr = zpe + e_vib + e_trans + e_rot + _KB * t
    g_corr = h_corr - t * s_tot
    return {'zpe': zpe, 'e_vib': e_vib, 'e_rot': e_rot, 'e_trans': e_trans,
            'h_corr': h_corr, 's': s_tot, 'g_corr': g_corr}


def frequencies_from_gradients(coords, atomnos, gradient_fn, dx=0.01,
                               project=True, maxthreads=4):
    '''Harmonic frequencies from an EXTERNAL (energy, gradient)
    callback — central finite differences of the gradient build the
    Hessian (6N single-point gradient calls, dispatched maxthreads-wide
    on a thread pool since the intended callbacks are subprocess-bound),
    then the same mass-weighting/Eckart-projection/eigensolve as the
    analytic path. The ASE-free analog of the reference's ase_vib with
    a QM calculator (ase_manipulations.py:348-380; displacement scheme
    of ase.vibrations.Vibrations). Returns (freqs_cm (3N,), n_imag).'''
    from concurrent.futures import ThreadPoolExecutor

    coords = np.asarray(coords, dtype=float)
    n = len(coords)
    flat = coords.reshape(-1)

    def displaced_grad(job):
        i, sign = job
        x = flat.copy()
        x[i] += sign * dx
        return np.asarray(gradient_fn(x.reshape(n, 3))[1]).reshape(-1)

    jobs = [(i, s) for i in range(3 * n) for s in (+1.0, -1.0)]
    with ThreadPoolExecutor(max_workers=maxthreads) as pool:
        grads = list(pool.map(displaced_grad, jobs))

    hess = np.zeros((3 * n, 3 * n))
    for i in range(3 * n):
        hess[i] = (grads[2 * i] - grads[2 * i + 1]) / (2.0 * dx)
    hess = 0.5 * (hess + hess.T)

    masses = np.asarray(MASSES[np.asarray(atomnos)], dtype=float)
    w = 1.0 / np.sqrt(np.repeat(masses, 3))
    # the Hessian is assembled in host f64 above; only the projection +
    # eigensolve need the x64 scope on an f32 accelerator backend
    with _x64_cpu_scope():
        h = jnp.asarray(hess * w[:, None] * w[None, :])
        if project:
            p = _tr_rot_projector(jnp.asarray(coords),
                                  jnp.asarray(masses))
            h = p @ h @ p
        evals = np.asarray(jnp.linalg.eigvalsh(h))
    freqs = np.sign(evals) * _FREQ_FACTOR * np.sqrt(np.abs(evals))
    freqs = np.where(np.abs(freqs) < 1.0, 0.0, freqs)
    n_imag = int(np.sum(freqs < -1e-3))
    return freqs, n_imag


def ff_free_energy(coords, atomnos, energy_fn, temperature=298.15,
                   symmetry_number=None):
    '''Electronic (FF) energy + RRHO Gibbs correction — the hermetic
    analog of xtb_get_free_energy for calculator-free runs.

    symmetry_number: external rotational symmetry sigma; None (default)
    auto-detects it from the geometry, keeping the -R*T*ln(sigma)
    rotational-entropy term (~0.4 kcal/mol at sigma=2, 298 K) that a
    sigma-blind RRHO would drop.'''
    freqs, n_imag = frequencies(coords, atomnos, energy_fn)
    thermo = thermochemistry(freqs, atomnos, coords, temperature,
                             symmetry_number=symmetry_number)
    with _x64_cpu_scope():
        e_el = float(energy_fn(jnp.asarray(np.asarray(coords),
                                           dtype=jnp.float64)))
    return e_el + thermo['g_corr'], n_imag
