'''
First-order saddle refinement via the dimer method.

The reference drives saddle searches through Sella
(ase_manipulations.py:314-346); here a calculator-agnostic dimer method
runs on any differentiable energy (internal FF, analytic surfaces, or a
host-callback QM gradient): the lowest curvature mode is found by
SHIFTED POWER ITERATION on the finite-difference Hessian action (stable
for arbitrarily stiff spectra, unlike a fixed-step curvature descent),
and translation follows the force with the component along the mode
inverted — converging to first-order saddles without a Hessian.
'''

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=('energy_fn', 'n_steps', 'n_rot'))
def dimer_saddle(coords, energy_fn, n_steps=300, n_rot=12, dr=1e-3,
                 step_size=0.02, fmax=0.05, energy_args=()):
    '''
    coords (N, 3) -> (coords, energy, converged).
    energy_fn: (N, 3, *energy_args) -> scalar, differentiable.
    energy_args is a TRACED pytree — pass per-call parameters (FF
    tables) through it instead of closures, so one compiled program
    serves every structure (remote compiles cost 5-30 s each).

    Convergence requires BOTH |F| < fmax and negative curvature along
    the tracked mode — a minimum (|F| ~ 0 but all curvatures positive)
    is never reported as a saddle; instead the dimer climbs out of it
    along the softest mode.
    '''
    grad_fn = jax.grad(lambda c: energy_fn(c, *energy_args))

    def force(c):
        return -grad_fn(c)

    n = coords.shape[0]

    def project(v):
        # rigid translations are exact zero modes of any pairwise
        # energy; keep the mode search orthogonal to them (skipped for
        # single-point analytic surfaces, which are not translation
        # invariant)
        if n > 1:
            v = v - jnp.mean(v, axis=0, keepdims=True)
        return v

    def hv(c, v):
        return -(force(c + dr * v) - force(c - dr * v)) / (2 * dr)

    def normalize(v):
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)

    def lowest_mode(c, v):
        '''Shifted power iteration: v <- normalize((sigma I - H) v)
        converges to the most-negative-curvature mode for any sigma
        above lambda_max; a few plain power steps estimate lambda_max.'''
        def pow_body(u, _):
            w = project(hv(c, u))
            return normalize(w), None
        u, _ = jax.lax.scan(pow_body, v, None, length=4)
        amax = jnp.abs(jnp.sum(u * hv(c, u)))
        sigma = 1.1 * amax + 1.0

        def shift_body(vv, _):
            w = project(sigma * vv - hv(c, vv))
            return normalize(w), None
        v, _ = jax.lax.scan(shift_body, v, None, length=n_rot)
        curv = jnp.sum(v * hv(c, v))
        return v, curv

    def body(state, _):
        c, v, done = state
        v, curv = lowest_mode(c, v)
        f = force(c)
        f_along = jnp.sum(f * v)
        f_par = f_along * v

        # negative curvature: standard dimer translation (force with the
        # mode component inverted). Positive curvature near a stationary
        # point (|F| small, e.g. starting at a minimum): climb the
        # softest mode — reversed parallel force plus a gentle kick so
        # an exact minimum still moves. Positive curvature with a LARGE
        # force means the climb is running up a wall with no saddle on
        # this mode; fall back to the inverted-force step, which keeps
        # the walker bounded near the stationary region instead of
        # diverging (convergence still honestly reports False).
        fmax_now = jnp.max(jnp.linalg.norm(f, axis=-1))
        climbing = (curv >= 0.0) & (fmax_now < 10.0 * fmax)
        f_eff = jnp.where(climbing, -f_par + fmax * v, f - 2.0 * f_par)

        done_new = done | ((fmax_now < fmax) & (curv < 0.0))

        step = step_size * f_eff
        max_disp = jnp.max(jnp.linalg.norm(step, axis=-1))
        step = step * jnp.minimum(1.0, 0.1 / jnp.maximum(max_disp, 1e-12))
        c_new = jnp.where(done_new, c, c + step)
        return (c_new, v, done_new), None

    # deterministic pseudo-random initial mode, orthogonal to rigid
    # translations (an all-ones v0 would BE a translation zero mode and
    # carry no curvature information)
    v0 = jnp.sin(jnp.arange(n * 3, dtype=coords.dtype) * 12.9898
                 + 4.1414).reshape(n, 3)
    v0 = normalize(project(v0))

    (c, _, done), _ = jax.lax.scan(body, (coords, v0, False), None,
                                   length=n_steps)
    return c, energy_fn(c, *energy_args), done


def dimer_saddle_callback(coords, gradient_fn, n_steps=60, n_rot=8,
                          dr=1e-3, step_size=0.02, fmax=0.05):
    '''
    Host-loop dimer for NON-differentiable surfaces (external QM):
    `gradient_fn(coords (N,3)) -> (energy, grad (N,3))` — e.g. one
    `xtb --grad` subprocess per call (calculators/gradients.py). Same
    shifted-power-iteration mode tracking and translation rule as the
    jitted `dimer_saddle`, with a trimmed rotation budget because every
    Hessian action costs two QM calls. The in-process analog of the
    reference's Sella saddle with an ASE calculator
    (ase_manipulations.py:314-346).
    Returns (coords, energy, converged).
    '''
    c = np.asarray(coords, dtype=float).copy()
    n = len(c)

    def force(x):
        return -gradient_fn(x)[1]

    def project(v):
        return v - v.mean(axis=0, keepdims=True) if n > 1 else v

    def normalize(v):
        return v / max(np.linalg.norm(v), 1e-12)

    def hv(x, v):
        return -(force(x + dr * v) - force(x - dr * v)) / (2 * dr)

    def lowest_mode(x, v):
        # one Hessian action (2 gradient calls) per v-update, reused
        # across the sigma estimate / shift / curvature lines — each
        # hv() costs two QM subprocesses, so no argument repeats
        hv_v = hv(x, v)
        for _ in range(2):                      # lambda_max estimate
            v = normalize(project(hv_v))
            hv_v = hv(x, v)
        sigma = 1.1 * abs(np.sum(v * hv_v)) + 1.0
        for _ in range(n_rot):
            v = normalize(project(sigma * v - hv_v))
            hv_v = hv(x, v)
        return v, float(np.sum(v * hv_v))

    v = normalize(project(np.sin(
        np.arange(n * 3, dtype=float) * 12.9898 + 4.1414).reshape(n, 3)))
    done = False
    for _ in range(n_steps):
        v, curv = lowest_mode(c, v)
        f = force(c)
        f_par = np.sum(f * v) * v
        fmax_now = float(np.max(np.linalg.norm(f, axis=-1)))
        if fmax_now < fmax and curv < 0.0:
            done = True
            break
        climbing = curv >= 0.0 and fmax_now < 10.0 * fmax
        f_eff = (-f_par + fmax * v) if climbing else (f - 2.0 * f_par)
        step = step_size * f_eff
        max_disp = float(np.max(np.linalg.norm(step, axis=-1)))
        c = c + step * min(1.0, 0.1 / max(max_disp, 1e-12))

    energy = float(gradient_fn(c)[0])
    return c, energy, done


def _ff_energy_single(c, params):
    from tscode_tpu.ff import ff_energy
    return ff_energy(c[None], params)[0]


def saddle_refine_structure(coords, atomnos, graph, fmax=0.05):
    '''Refine one structure to a first-order saddle on the internal FF.
    The FF tables flow through energy_args, so every structure shares
    one compiled dimer program.'''
    from tscode_tpu.ff import build_ff_params, params_to_device
    params = params_to_device(build_ff_params(coords, atomnos, graph))

    c, e, done = dimer_saddle(jnp.asarray(coords), _ff_energy_single,
                              fmax=fmax, energy_args=(params,))
    return np.asarray(c), float(e), bool(done)
