'''
Refinement orchestration: force-field and semiempirical/DFT optimization
stages (reference /root/reference/tscode/optimization_methods.py and
embedder.py:1390-1829).

The external-calculator adapters land in tscode_tpu/calculators; until a
calculator is present on PATH these stages raise a clear error, keeping
all pure-geometry pipelines (NOOPT/BYPASS) fully functional.
'''

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
