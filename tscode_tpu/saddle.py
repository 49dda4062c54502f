'''
First-order saddle refinement via the dimer method.

The reference drives saddle searches through Sella
(ase_manipulations.py:314-346); here a calculator-agnostic dimer method
runs on any differentiable energy (internal FF, analytic surfaces, or a
host-callback QM gradient): the lowest curvature mode is tracked by
rotating a dimer to minimal energy, and translation follows the force
with the component along the mode INVERTED — converging to first-order
saddles without a Hessian.
'''

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=('energy_fn', 'n_steps', 'n_rot'))
def dimer_saddle(coords, energy_fn, n_steps=300, n_rot=8, dr=1e-3,
                 step_size=0.02, fmax=0.05):
    '''
    coords (N, 3) -> (coords, energy, converged).
    energy_fn: (N, 3) -> scalar, differentiable.
    '''
    grad_fn = jax.grad(energy_fn)

    def force(c):
        return -grad_fn(c)

    key_init = coords / jnp.maximum(jnp.linalg.norm(coords), 1.0)

    def rotate_mode(c, v):
        '''Approximate lowest mode by minimizing dimer energy: iterate
        v <- normalized (F(c + dr v) - F(c - dr v)) projection steps.'''
        def body(v, _):
            f_plus = force(c + dr * v)
            f_minus = force(c - dr * v)
            df = (f_plus - f_minus) / (2 * dr)       # ~ -H @ v
            # steepest descent on curvature: rotate v toward df
            v_new = v + 0.5 * (df - jnp.sum(df * v) * v)
            v_new = v_new / jnp.maximum(jnp.linalg.norm(v_new), 1e-12)
            return v_new, None
        v, _ = jax.lax.scan(body, v, None, length=n_rot)
        return v

    def body(state, _):
        c, v, done = state
        v = rotate_mode(c, v)
        f = force(c)
        f_par = jnp.sum(f * v) * v
        f_eff = f - 2.0 * f_par                       # invert along mode

        fmax_now = jnp.max(jnp.linalg.norm(f, axis=-1))
        done_new = done | (fmax_now < fmax)

        step = step_size * f_eff
        max_disp = jnp.max(jnp.linalg.norm(step, axis=-1))
        step = step * jnp.minimum(1.0, 0.1 / jnp.maximum(max_disp, 1e-12))
        c_new = jnp.where(done_new, c, c + step)
        return (c_new, v, done_new), None

    v0 = jnp.ones_like(coords)
    v0 = v0 / jnp.linalg.norm(v0)
    (c, _, done), _ = jax.lax.scan(body, (coords, v0, False), None,
                                   length=n_steps)
    return c, energy_fn(c), done


def saddle_refine_structure(coords, atomnos, graph, fmax=0.05):
    '''Refine one structure to a first-order saddle on the internal FF.'''
    from tscode_tpu.ff import build_ff_params, ff_energy, params_to_device
    params = params_to_device(build_ff_params(coords, atomnos, graph))

    def energy(c):
        return ff_energy(c[None], params)[0]

    c, e, done = dimer_saddle(jnp.asarray(coords), energy, fmax=fmax)
    return np.asarray(c), float(e), bool(done)
