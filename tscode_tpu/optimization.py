'''
Refinement orchestration: force-field and semiempirical/DFT optimization
stages (reference /root/reference/tscode/optimization_methods.py and
embedder.py:1390-1829).

The external-calculator adapters land in tscode_tpu/calculators; until a
calculator is present on PATH these stages raise a clear error, keeping
all pure-geometry pipelines (NOOPT/BYPASS) fully functional.
'''

import functools

import numpy as np

from tscode_tpu.errors import InputError


def _no_calc_error(stage):
    return InputError(
        f'{stage} requires an external calculator (xtb/orca/gaussian/mopac) '
        f'but none was found on PATH. Re-run with NOOPT to skip '
        f'optimization, or install a calculator.')


def force_field_refine(embedder, conv_thr='tight',
                       only_fixed_constraints=False,
                       prevent_scrambling=False):
    if embedder.options.ff_calc is None:
        raise _no_calc_error('Force-field refinement')
    from tscode_tpu.calculators.dispatch import ff_refine_pipeline
    ff_refine_pipeline(embedder, conv_thr=conv_thr,
                       only_fixed_constraints=only_fixed_constraints,
                       prevent_scrambling=prevent_scrambling)


def optimization_refine(embedder, conv_thr='tight', maxiter=None,
                        only_fixed_constraints=False):
    if embedder.options.calculator is None:
        raise _no_calc_error('Structure optimization')
    from tscode_tpu.calculators.dispatch import optimization_refine_pipeline
    optimization_refine_pipeline(
        embedder, conv_thr=conv_thr, maxiter=maxiter,
        only_fixed_constraints=only_fixed_constraints)


def saddle_refine(embedder):
    raise _no_calc_error('Saddle-point refinement')


def _spacing_energy(coords, params, sp, st, ncip, k_spring, k_nci):
    '''Module-level (cache-friendly for fire_minimize_batch's jit) FF +
    spring + halfspring objective for adjust_spacings_batch.'''
    import jax.numpy as jnp

    from tscode_tpu.ff import ff_energy

    e = ff_energy(coords, params)
    if sp.shape[0]:
        d = jnp.linalg.norm(coords[..., sp[:, 0], :]
                            - coords[..., sp[:, 1], :], axis=-1)
        e = e + k_spring * jnp.sum((d - st) ** 2, axis=-1)
    if ncip.shape[0]:
        dn = jnp.linalg.norm(coords[..., ncip[:, 0], :]
                             - coords[..., ncip[:, 1], :], axis=-1)
        e = e + k_nci * jnp.sum(jnp.maximum(dn - 2.5, 0.0) ** 2, axis=-1)
    return e


def adjust_spacings_batch(embedder, structures, atomnos):
    '''Pull every pairing with a target distance to that distance while
    keeping the rest of the geometry physical — the batched analog of the
    reference's ase_adjust_spacings (ase_manipulations.py:216-312).

    The reference runs, per structure, a coarse LBFGS with Spring
    (k=100) + HalfSpring (NCI pairs, active beyond 2.5 A) +
    PreventScramblingConstraint, then tightens the springs (k=1000),
    drops the PSC and re-runs. Here the internal FF plays the role of
    both the calculator forces and the PSC, and BOTH phases run as one
    batched FIRE program over all structures at once. Returns
    (structures (B, N, 3), energies (B,), success (B,) bool).
    '''
    import jax.numpy as jnp

    from tscode_tpu.ff import (build_ff_params, merge_ff_params,
                               params_to_device)
    from tscode_tpu.graphs import graphize
    from tscode_tpu.optimizers import fire_minimize_batch
    from tscode_tpu.utils import scramble_check

    structures = np.asarray(structures, dtype=float)
    atomnos = np.asarray(atomnos)

    # springs: pairings with a known target distance; x/y/z letters are
    # non-covalent contacts with NO target (reference embedder.py:1592-1607)
    # and only get the >2.5 A halfspring like every lowercase pairing
    spring_pairs, spring_targets = [], []
    nci_pairs = []
    for letter, pair in embedder.pairings_table.items():
        is_nci = isinstance(letter, str) and letter in 'xyz'
        target = None if is_nci else \
            embedder.get_pairing_dist_from_letter(letter)
        if target is not None:
            spring_pairs.append(tuple(pair))
            spring_targets.append(float(target))
        if isinstance(letter, str) and letter.islower():
            nci_pairs.append(tuple(pair))

    if not spring_pairs:
        # no targets: plain constrained optimization is equivalent
        # (reference ase_manipulations.py:233-249)
        from tscode_tpu.calculators.dispatch import optimize_batch_pipeline
        return optimize_batch_pipeline(embedder, structures, atomnos)

    graphs = getattr(embedder, 'graphs', None) or \
        [graphize(structures[0], atomnos)]
    offsets = np.cumsum([0] + [g.number_of_nodes() for g in graphs])[:-1]
    params = params_to_device(merge_ff_params(
        [build_ff_params(structures[0][off:off + g.number_of_nodes()],
                         atomnos[off:off + g.number_of_nodes()], g)
         for g, off in zip(graphs, offsets)], offsets))

    sp = jnp.asarray(np.array(spring_pairs, dtype=int))
    st = jnp.asarray(np.array(spring_targets))
    ncip = jnp.asarray(np.array(nci_pairs, dtype=int)
                       if nci_pairs else np.zeros((0, 2), dtype=int))

    # mesh scale-out: FIRE state is per-structure, so the ensemble
    # relax shards exactly over the pose axis when a mesh is available
    from tscode_tpu.parallel.sharding import mesh_for
    mesh = mesh_for(len(structures))
    if mesh is not None:
        from tscode_tpu.optimizers import fire_minimize_batch_sharded
        relax = functools.partial(fire_minimize_batch_sharded, mesh=mesh)
    else:
        relax = fire_minimize_batch

    batch = jnp.asarray(structures)
    # coarse phase: springs + halfsprings (reference :264-270)
    batch, _, _ = relax(
        batch, _spacing_energy, n_steps=500,
        energy_args=(params, sp, st, ncip,
                     jnp.asarray(50.0), jnp.asarray(500.0)))
    # tight phase: springs only, 10x stiffer (reference Spring.tighten +
    # set_constraint(springs) at :271-279)
    batch, _, _ = relax(
        batch, _spacing_energy, n_steps=200,
        energy_args=(params, sp, st, ncip,
                     jnp.asarray(500.0), jnp.asarray(0.0)))
    # report the FF energy without the biasing springs: a 0-step pass of
    # the same (cached) program with zeroed spring constants
    _, pure, _ = relax(
        batch, _spacing_energy, n_steps=0,
        energy_args=(params, sp, st, ncip,
                     jnp.asarray(0.0), jnp.asarray(0.0)))

    out = np.asarray(batch)
    constrained = np.array(spring_pairs, dtype=int)
    success = np.array([
        scramble_check(s, atomnos, constrained.ravel(), graphs,
                       max_newbonds=embedder.options.max_newbonds)
        for s in out])
    return out, np.asarray(pure), success


def optimize_batch(embedder, structures, atomnos, calc=None, method=None,
                   constrained_indices=None, logfunction=print):
    '''Optimize every structure of a batch (csearch ff_opt hook,
    reference torsion_module.py:787-807). Requires a calculator.'''
    if calc is None and (embedder is None or
                         embedder.options.ff_calc is None):
        raise _no_calc_error('Batch force-field optimization')
    from tscode_tpu.calculators.dispatch import optimize_batch_pipeline
    return optimize_batch_pipeline(embedder, structures, atomnos,
                                   calc=calc, method=method,
                                   constrained_indices=constrained_indices,
                                   logfunction=logfunction)


def optimize_ensemble(embedder, mol):
    if embedder.options.calculator is None:
        raise _no_calc_error('Ensemble optimization (opt>)')
    from tscode_tpu.calculators.dispatch import optimize_ensemble_pipeline
    return optimize_ensemble_pipeline(embedder, mol)
