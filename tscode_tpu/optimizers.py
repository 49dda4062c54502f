'''
Batched first-order geometry optimization on device.

The reference relaxes structures one at a time through ASE's
LBFGS/FIRE with a QM calculator in the loop (ase_manipulations.py:636-681).
The TPU-native form is a BATCHED FIRE minimizer: one fused device
program advances every structure of an ensemble simultaneously, with
per-structure adaptive timesteps, arbitrary differentiable energy
functions (jax.grad supplies forces), optional harmonic pair constraints
and frozen-atom masks. 10k poses relax in the time the reference takes
for a handful.
'''

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# FIRE hyperparameters (standard values)
_ALPHA0 = 0.1
_F_INC = 1.1
_F_DEC = 0.5
_F_ALPHA = 0.99
_N_MIN = 5
_DT_MAX_FACTOR = 10.0


def spring_energy(coords, pairs, targets, k=5.0):
    '''Harmonic pair-distance restraints: coords (..., N, 3),
    pairs (C, 2) int, targets (C,) -> (...).'''
    if pairs.shape[0] == 0:
        return jnp.zeros(coords.shape[:-2], dtype=coords.dtype)
    d = jnp.linalg.norm(coords[..., pairs[:, 0], :]
                        - coords[..., pairs[:, 1], :], axis=-1)
    return k * jnp.sum((d - targets) ** 2, axis=-1)


@partial(jax.jit, static_argnames=('energy_fn', 'n_steps'))
def fire_minimize_batch(coords, energy_fn, n_steps=500, dt0=0.05,
                        fmax=0.05, freeze_mask=None, energy_args=()):
    '''
    Batched FIRE relaxation.
    coords: (B, N, 3); energy_fn: (B, N, 3, *energy_args) -> (B,)
    differentiable. energy_args is a TRACED pytree — pass changing
    parameters (spring targets, FF tables) through it rather than
    closures, so one compiled program serves every parameter value.
    freeze_mask: optional (N,) or (B, N) bool — True atoms do not move.
    Returns (coords, energies, converged (B,) bool).
    '''
    B = coords.shape[0]

    grad_fn = jax.grad(lambda c: jnp.sum(energy_fn(c, *energy_args)))

    def force(c):
        f = -grad_fn(c)
        if freeze_mask is not None:
            f = jnp.where(jnp.asarray(freeze_mask)[..., None], 0.0, f)
        return f

    dt_max = dt0 * _DT_MAX_FACTOR

    def body(state, _):
        c, v, dt, alpha, n_pos, done = state
        f = force(c)

        # per-structure FIRE controls
        power = jnp.sum(f * v, axis=(-2, -1))                    # (B,)
        f_norm = jnp.sqrt(jnp.sum(f * f, axis=(-2, -1)))[:, None, None]
        v_norm = jnp.sqrt(jnp.sum(v * v, axis=(-2, -1)))[:, None, None]
        v_mixed = (1 - alpha)[:, None, None] * v + \
            alpha[:, None, None] * f * v_norm / jnp.maximum(f_norm, 1e-12)

        uphill = power <= 0.0
        v_new = jnp.where(uphill[:, None, None], 0.0, v_mixed)
        n_pos_new = jnp.where(uphill, 0, n_pos + 1)
        grow = (n_pos_new > _N_MIN)
        dt_new = jnp.where(uphill, dt * _F_DEC,
                           jnp.where(grow, jnp.minimum(dt * _F_INC, dt_max),
                                     dt))
        alpha_new = jnp.where(uphill, _ALPHA0,
                              jnp.where(grow, alpha * _F_ALPHA, alpha))

        # semi-implicit Euler step
        v_stepped = v_new + dt_new[:, None, None] * f
        step = dt_new[:, None, None] * v_stepped
        # cap the displacement per step for stability, rescaling the
        # VELOCITY by the same factor (an uncapped velocity would keep
        # integrating upward while positions are clamped, distorting the
        # FIRE mixing term on stiff starts)
        max_disp = jnp.max(jnp.linalg.norm(step, axis=-1),
                           axis=-1)[:, None, None]
        scale = jnp.minimum(1.0, 0.2 / jnp.maximum(max_disp, 1e-12))
        step = step * scale
        v_stepped = v_stepped * scale

        fmax_now = jnp.max(jnp.linalg.norm(f, axis=-1), axis=-1)    # (B,)
        newly_done = fmax_now < fmax
        done_new = done | newly_done

        c_new = jnp.where(done_new[:, None, None], c, c + step)
        v_out = jnp.where(done_new[:, None, None], 0.0, v_stepped)
        return (c_new, v_out, dt_new, alpha_new, n_pos_new, done_new), None

    # the (B,) control-state inits derive from coords (0 * sum) so their
    # mesh-varying type matches the loop body's under shard_map; on a
    # single device this is exactly full(dt0)/full(alpha0)/zeros
    zero_b = 0.0 * jnp.sum(coords, axis=(-2, -1))
    init = (coords, jnp.zeros_like(coords),
            dt0 + zero_b, _ALPHA0 + zero_b,
            zero_b.astype(jnp.int32), zero_b > 0.5)
    (c, _, _, _, _, done), _ = jax.lax.scan(body, init, None,
                                            length=n_steps)
    return c, energy_fn(c, *energy_args), done


def fire_minimize_batch_sharded(coords, energy_fn, mesh, n_steps=500,
                                dt0=0.05, fmax=0.05, energy_args=(),
                                axis_name='poses'):
    '''fire_minimize_batch sharded over the structure axis: FIRE state
    is fully per-structure, so each device relaxes its own slice with
    no collectives and bit-identical results. energy parameters are
    replicated (one topology per call, the ensemble-relax pattern).
    The batch pads to the mesh size with copies of the first structure
    (discarded). freeze_mask is not supported here — the ensemble
    callers do not use it.'''
    coords = jnp.asarray(coords)
    B = coords.shape[0]
    n_dev = mesh.devices.size
    # fixed pow2 bucket (multiple of the mesh size): executables are
    # keyed on shapes and remote compiles are expensive (CLAUDE.md)
    B_pad = max(8, 1 << max(0, (B - 1)).bit_length())
    B_pad = -(-B_pad // n_dev) * n_dev
    if B_pad != B:
        coords = jnp.concatenate(
            [coords, jnp.broadcast_to(coords[:1],
                                      (B_pad - B,) + coords.shape[1:])])

    fn = _fire_sharded_program(mesh, energy_fn, n_steps, float(dt0),
                               float(fmax), axis_name)
    c, e, done = fn(coords, tuple(energy_args))
    return c[:B], e[:B], done[:B]


@functools.lru_cache(maxsize=32)
def _fire_sharded_program(mesh, energy_fn, n_steps, dt0, fmax, axis_name):
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:                 # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    def step(c, args):
        return fire_minimize_batch.__wrapped__(
            c, energy_fn, n_steps=n_steps, dt0=dt0, fmax=fmax,
            energy_args=args)

    return jax.jit(shard_map(step, mesh=mesh,
                             in_specs=(P(axis_name), P()),
                             out_specs=(P(axis_name), P(axis_name),
                                        P(axis_name))))


def fire_minimize(coords, energy_fn, **kwargs):
    '''Single-structure convenience wrapper.'''
    c, e, done = fire_minimize_batch(jnp.asarray(coords)[None], energy_fn,
                                     **kwargs)
    return np.asarray(c[0]), float(e[0]), bool(done[0])
