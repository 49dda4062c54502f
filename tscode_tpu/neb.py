'''
Nudged elastic band (NEB) with climbing image — device-resident chain.

The reference relaxes MEPs through ASE's DyNEB with an external
calculator per image (ase_manipulations.py:382-526, mep_relaxer.py).
Here the WHOLE CHAIN is one device tensor (I, N, 3): tangents, spring
forces, perpendicular projections and the climbing-image inversion are
fused array ops, and the band relaxes under batched FIRE. The potential
is any differentiable energy function — the internal harmonic FF, a toy
surface for validation, or (host-callback) an external QM gradient.
'''

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def interpolate_chain(start, end, n_images):
    '''Linear interpolation including endpoints: (N, 3) x2 -> (I, N, 3)
    (reference mep_relaxer.interpolate_structures:155-200, linear mode).'''
    t = np.linspace(0.0, 1.0, n_images)[:, None, None]
    return (1 - t) * np.asarray(start)[None] + t * np.asarray(end)[None]


def _idpp_energy(chain, targets, weights):
    '''Per-image IDPP objective (Smidstrup et al., JCP 140, 214106):
    chain (I, N, 3), targets/weights (I, N, N) -> (I,).'''
    diff = chain[:, :, None, :] - chain[:, None, :, :]
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    return jnp.sum(weights * (d - targets) ** 2, axis=(-2, -1))


def idpp_interpolate(start, end, n_images, n_steps=300):
    '''Image-dependent pair potential interpolation: start from the
    linear chain, then relax interior images toward linearly-interpolated
    pairwise-DISTANCE targets (weights 1/d^4). The device form relaxes
    every interior image simultaneously under batched FIRE — the analog
    of ASE's `interpolate(method='idpp')` used by the reference
    (mep_relaxer.py:155-200, ase_manipulations.py:411-422).'''
    from tscode_tpu.optimizers import fire_minimize_batch

    chain = interpolate_chain(start, end, n_images)
    if n_images <= 2:
        return chain
    n = chain.shape[1]

    def dmat(c):
        diff = c[:, None, :] - c[None, :, :]
        return np.sqrt(np.sum(diff * diff, axis=-1))

    d0, d1 = dmat(chain[0]), dmat(chain[-1])
    t = np.linspace(0.0, 1.0, n_images)[:, None, None]
    targets = (1 - t) * d0[None] + t * d1[None]
    weights = 1.0 / np.maximum(targets, 1e-2) ** 4
    weights[:, np.arange(n), np.arange(n)] = 0.0

    freeze = np.zeros((n_images, n), dtype=bool)
    freeze[0] = freeze[-1] = True

    refined, _, _ = fire_minimize_batch(
        jnp.asarray(chain), _idpp_energy, n_steps=n_steps,
        freeze_mask=jnp.asarray(freeze),
        energy_args=(jnp.asarray(targets), jnp.asarray(weights)))
    return np.asarray(refined)


def interpolate_structures(structures, atomnos, n, method='idpp'):
    '''Expand m >= 2 structures into an n-image chain, keeping the input
    structures mapped at proportional positions and filling each gap by
    linear or IDPP interpolation. Mirrors the reference's
    interpolate_structures (mep_relaxer.py:155-200) but returns a plain
    (n, N, 3) array instead of ASE Atoms objects.'''
    structures = np.asarray(structures, dtype=float)
    m = len(structures)
    fill = idpp_interpolate if method == 'idpp' else interpolate_chain

    if m == 2:
        return fill(structures[0], structures[-1], n)

    if n <= m:                      # nothing to expand: sample evenly
        idx = np.round(np.linspace(0, m - 1, n)).astype(int)
        return structures[idx]

    ratio = n / m
    mappings = [round(i * ratio) for i in range(m)]
    mappings[-1] = n - 1

    images = np.zeros((n, structures.shape[1], 3))
    for i, pos in enumerate(mappings):
        images[pos] = structures[i]

    group_ranges = [(mappings[i], mappings[i + 1])
                    for i in range(m - 1) if mappings[i + 1] - mappings[i] > 1]
    for r1, r2 in group_ranges:
        images[r1:r2 + 1] = fill(images[r1], images[r2], r2 - r1 + 1)
    return images


def _tangents(chain, energies):
    '''Improved upwind tangents (Henkelman & Jonsson 2000).'''
    prev = chain[:-2]
    nxt = chain[2:]
    mid = chain[1:-1]

    t_plus = nxt - mid
    t_minus = mid - prev

    e_prev = energies[:-2]
    e_mid = energies[1:-1]
    e_next = energies[2:]

    up = (e_next > e_mid) & (e_mid > e_prev)
    down = (e_next < e_mid) & (e_mid < e_prev)

    dE_max = jnp.maximum(jnp.abs(e_next - e_mid), jnp.abs(e_prev - e_mid))
    dE_min = jnp.minimum(jnp.abs(e_next - e_mid), jnp.abs(e_prev - e_mid))
    higher_next = e_next > e_prev

    t_mix_hi = t_plus * dE_max[:, None, None] + t_minus * dE_min[:, None, None]
    t_mix_lo = t_plus * dE_min[:, None, None] + t_minus * dE_max[:, None, None]

    tang = jnp.where(up[:, None, None], t_plus,
                     jnp.where(down[:, None, None], t_minus,
                               jnp.where(higher_next[:, None, None],
                                         t_mix_hi, t_mix_lo)))
    norm = jnp.sqrt(jnp.sum(tang * tang, axis=(-2, -1)))[:, None, None]
    return tang / jnp.maximum(norm, 1e-12)


def band_forces(chain, energies, grad, k_spring=1.0, climbing=False):
    '''
    Pure band-math composition (jittable): given per-image energies and
    TRUE-potential gradients — from jax.grad of a differentiable surface
    or from an external QM callback — assemble the NEB force on every
    image: true force perpendicular to the tangent + spring force along
    it; the highest image climbs when requested.
    chain (I, N, 3), energies (I,), grad (I, N, 3)
    -> forces (I, N, 3) with zeroed endpoints.
    '''
    true_force = -grad

    tang = _tangents(chain, energies)                       # (I-2, N, 3)
    f_mid = true_force[1:-1]

    f_par = jnp.sum(f_mid * tang, axis=(-2, -1))[:, None, None] * tang
    f_perp = f_mid - f_par

    d_next = jnp.sqrt(jnp.sum((chain[2:] - chain[1:-1]) ** 2,
                              axis=(-2, -1)))
    d_prev = jnp.sqrt(jnp.sum((chain[1:-1] - chain[:-2]) ** 2,
                              axis=(-2, -1)))
    f_spring = (k_spring * (d_next - d_prev))[:, None, None] * tang

    neb_f = f_perp + f_spring

    if climbing:
        # highest interior image: full force with inverted parallel part
        i_max = jnp.argmax(energies[1:-1])
        climb_f = f_mid - 2.0 * f_par
        neb_f = neb_f.at[i_max].set(climb_f[i_max])

    out = jnp.zeros_like(chain)
    return out.at[1:-1].set(neb_f)


def neb_forces(chain, energy_fn, k_spring=1.0, climbing=False):
    '''NEB forces on a DIFFERENTIABLE surface: energies and gradients
    via energy_fn/jax.grad, then the shared band composition.'''
    energies = energy_fn(chain)
    grad = jax.grad(lambda c: jnp.sum(energy_fn(c)))(chain)
    return band_forces(chain, energies, grad, k_spring=k_spring,
                       climbing=climbing)


def _fire_band_update(state, f, dt0, fmax):
    '''One FIRE step of the band given precomputed NEB forces `f`.
    Shared by the fused differentiable-surface scan and the
    host-callback (external QM) loop — identical integrator either way.'''
    c, v, dt, alpha, n_pos, done = state

    # convergence: largest per-atom NEB force under fmax freezes the
    # band (remaining steps become no-ops)
    done = done | (jnp.max(jnp.linalg.norm(f, axis=-1)) < fmax)

    power = jnp.sum(f * v)
    f_norm = jnp.sqrt(jnp.sum(f * f))
    v_norm = jnp.sqrt(jnp.sum(v * v))
    v_mixed = (1 - alpha) * v + alpha * f * v_norm / jnp.maximum(f_norm, 1e-12)

    uphill = power <= 0.0
    v_new = jnp.where(uphill, 0.0, v_mixed)
    n_pos_new = jnp.where(uphill, 0, n_pos + 1)
    grow = n_pos_new > 5
    dt_new = jnp.where(uphill, dt * 0.5,
                       jnp.where(grow, jnp.minimum(dt * 1.1, dt0 * 4),
                                 dt))
    alpha_new = jnp.where(uphill, 0.1,
                          jnp.where(grow, alpha * 0.99, alpha))

    v_stepped = v_new + dt_new * f
    step = dt_new * v_stepped
    # conservative displacement cap: stiff bonded potentials make
    # the band integrator prone to runaway otherwise
    max_disp = jnp.max(jnp.linalg.norm(step, axis=-1))
    scale = jnp.minimum(1.0, 0.05 / jnp.maximum(max_disp, 1e-12))
    step = jnp.where(done, 0.0, step * scale)
    v_capped = jnp.where(done, 0.0, v_stepped * scale)
    return (c + step, v_capped, dt_new, alpha_new, n_pos_new, done)


def _fire_init(chain, dt0):
    return (chain, jnp.zeros_like(chain), jnp.asarray(dt0),
            jnp.asarray(0.1), jnp.asarray(0, dtype=jnp.int32),
            jnp.asarray(False))


@partial(jax.jit, static_argnames=('energy_fn', 'n_steps', 'climbing'))
def _neb_relax(chain, energy_fn, n_steps, k_spring, dt0, fmax, climbing):
    '''FIRE relaxation of the whole band (endpoints frozen).'''
    def body(state, _):
        f = neb_forces(state[0], energy_fn, k_spring=k_spring,
                       climbing=climbing)
        return _fire_band_update(state, f, dt0, fmax), None

    (chain, *_), _ = jax.lax.scan(body, _fire_init(chain, dt0), None,
                                  length=n_steps)
    return chain


@partial(jax.jit, static_argnames=('climbing',))
def _band_step(state, energies, grad, k_spring, dt0, fmax, climbing):
    '''One jitted band step from externally-supplied energies/gradients
    (the QM-callback path): band composition + FIRE update on device.'''
    f = band_forces(state[0], energies, grad, k_spring=k_spring,
                    climbing=climbing)
    return _fire_band_update(state, f, dt0, fmax)


def run_neb_callback(start, end, grad_chain_fn, n_images=7, k_spring=1.0,
                     n_steps=100, climb_after=50, dt0=0.01, fmax=0.05,
                     chain=None, checkpoint_fn=None, checkpoint_every=10,
                     with_status=False):
    '''
    Climbing-image NEB on a NON-differentiable surface: per step, one
    `grad_chain_fn(chain) -> (energies (I,), grads (I, N, 3))` callback
    (e.g. xtb --grad subprocesses, one per image, dispatched
    concurrently) supplies the true potential; tangents, projections,
    springs, the climbing inversion and the FIRE update all run as one
    jitted device program. The in-process analog of the reference's
    ASE DyNEB + external calculator (ase_manipulations.py:382-526).
    Returns (chain (I, N, 3), energies (I,), ts_index).

    checkpoint_fn(band (I, N, 3) np): called with the latest
    SUCCESSFULLY EVALUATED band every `checkpoint_every` callback steps
    — QM gradients are hours of subprocess work per band, and a crashed
    image must not lose the whole run (reference neb_operator restarts
    from its mid-band file, operators.py:352-375). with_status=True
    appends a 4th return: True when the band converged (rather than
    exhausting n_steps — the reference's MAX ITER restart trigger).
    '''
    if chain is None:
        chain = idpp_interpolate(start, end, n_images)
    chain = jnp.asarray(chain)
    if chain.shape[0] < 3:
        from tscode_tpu.errors import InputError
        raise InputError(
            f'NEB needs at least 3 images (got {chain.shape[0]}): '
            f'a band without interior images cannot relax a path.')

    # two phases with a FRESH FIRE state each, exactly like the
    # differentiable path's two _neb_relax calls: a band that converges
    # early in the pre-relax still gets its climbing refinement
    state = _fire_init(chain, dt0)
    climbing = False
    converged = False
    energies = None
    coords_evaluated = None
    for step in range(n_steps):
        if not climbing and (step >= climb_after
                             or (energies is not None
                                 and bool(state[5]))):
            # pre-relax done (by schedule or convergence): climb when an
            # interior barrier exists (same guard as run_neb)
            has_barrier = (energies is not None
                           and np.max(energies[1:-1])
                           > max(energies[0], energies[-1]) + 1e-6)
            if not has_barrier and bool(state[5]):
                converged = True
                break               # converged, nothing to climb
            if not has_barrier:
                pass                # keep relaxing without climbing
            else:
                climbing = True
                state = _fire_init(state[0], dt0)
        elif climbing and bool(state[5]):
            converged = True
            break                   # climbing phase converged

        coords_evaluated = np.asarray(state[0])
        energies, grads = grad_chain_fn(coords_evaluated)
        if checkpoint_fn is not None and step % checkpoint_every == 0:
            checkpoint_fn(coords_evaluated)
        state = _band_step(state, jnp.asarray(energies),
                           jnp.asarray(grads),
                           jnp.asarray(k_spring, chain.dtype),
                           jnp.asarray(dt0, chain.dtype),
                           jnp.asarray(fmax, chain.dtype), climbing)

    converged = converged or bool(state[5])
    final = np.asarray(state[0])
    if (coords_evaluated is None
            or not np.array_equal(final, coords_evaluated)):
        # only pay another chain evaluation when the band actually
        # moved after its last evaluation (converged exits leave the
        # coords identical to the step that latched `done`)
        energies, _ = grad_chain_fn(final)
    ts_index = int(1 + np.argmax(energies[1:-1]))
    if with_status:
        return final, np.asarray(energies), ts_index, converged
    return final, np.asarray(energies), ts_index


def run_neb(start, end, energy_fn, n_images=7, k_spring=1.0,
            n_steps=800, climb_after=400, dt0=0.01, fmax=0.05,
            chain=None):
    '''
    Climbing-image NEB between two endpoint geometries.
    Returns (chain (I, N, 3), energies (I,), ts_index).
    '''
    if chain is None:
        # IDPP starting band, as the reference's DyNEB setup does
        # (ase_manipulations.py:411)
        chain = idpp_interpolate(start, end, n_images)
    chain = jnp.asarray(chain)
    if chain.shape[0] < 3:
        from tscode_tpu.errors import InputError
        raise InputError(
            f'NEB needs at least 3 images (got {chain.shape[0]}): '
            f'a band without interior images cannot relax a path.')

    chain = _neb_relax(chain, energy_fn, climb_after, k_spring, dt0,
                       fmax, False)

    # only climb when the band actually has an interior barrier — on a
    # monotonic profile the climbing image would just run up the nearest
    # repulsive wall
    energies = np.asarray(energy_fn(chain))
    has_barrier = energies[1:-1].max() > max(energies[0], energies[-1]) + 1e-6
    chain = _neb_relax(chain, energy_fn, n_steps - climb_after, k_spring,
                       dt0, fmax, bool(has_barrier))

    energies = np.asarray(energy_fn(chain))
    ts_index = int(1 + np.argmax(energies[1:-1]))
    return np.asarray(chain), energies, ts_index
