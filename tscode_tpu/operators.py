'''
Operator dispatcher: `op>` prefixes executed before the embed
(reference /root/reference/tscode/operators.py:48-156).

Each operator takes and returns a Molecule. Operators that require
external binaries raise a clear error when those are unavailable.
'''

import numpy as np

from tscode_tpu.errors import InputError


def operate(op, embedder, mol):
    '''Dispatch a single operator string (without the trailing >).'''
    name = op.split('>')[0].strip() if '>' in op else op.strip()

    handlers = {
        'refine': _refine_operator,
        'opt': _opt_operator,
        'csearch': _csearch_operator,
        'csearch_hb': _csearch_hb_operator,
        'rsearch': _rsearch_operator,
        'mtd_search': _mtd_operator,
        'mtd': _mtd_operator,
        'neb': _neb_operator,
        'saddle': _saddle_operator,
        'scan': _scan_operator,
        'automep': _automep_operator,
        'mep_relax': _mep_relax_operator,
        'pka': _pka_operator,
    }

    handler = handlers.get(name)
    if handler is None:
        raise InputError(f'Operator {name!r}> not recognized.')
    return handler(embedder, mol, name)


def _refine_operator(embedder, mol, name):
    # handled by OptionSetter._refine_operator_routine via options.operators
    return mol


def _scan_operator(embedder, mol, name):
    # the scan runs here, during operator application; _setup then routes
    # the run to the 'data' termination (reference embedder.py:628-634)
    from tscode_tpu.scans import scan_operator
    return scan_operator(embedder, mol)


def _require_calc(embedder, what):
    if embedder.options.calculator is None:
        raise InputError(
            f'{what} requires an external calculator (xtb/orca/gaussian/'
            f'mopac), none of which was found on PATH.')


def _opt_operator(embedder, mol, name):
    _require_calc(embedder, 'opt>')
    from tscode_tpu.optimization import optimize_ensemble
    return optimize_ensemble(embedder, mol)


def _csearch_operator(embedder, mol, name):
    from tscode_tpu.torsions import csearch_operator
    return csearch_operator(embedder, mol, mode=1)


def _csearch_hb_operator(embedder, mol, name):
    from tscode_tpu.torsions import csearch_operator
    return csearch_operator(embedder, mol, mode=1, keep_hb=True)


def _rsearch_operator(embedder, mol, name):
    from tscode_tpu.torsions import csearch_operator
    return csearch_operator(embedder, mol, mode=2)


def _mtd_operator(embedder, mol, name):
    _require_calc(embedder, 'mtd_search>')
    from tscode_tpu.calculators.xtb import crest_mtd_search_operator
    return crest_mtd_search_operator(embedder, mol)


def qm_gradient_source(embedder, mol, chain=False):
    '''(energy, gradient) callback resolved from the run's calculator
    and theory level — the analog of get_ase_calc resolution
    (reference ase_manipulations.py:123-214). Returns None when no
    gradient-capable calculator is available, in which case the
    procedures fall back to the internal FF surface.
    chain=True returns the batched per-image form for NEB bands.'''
    from tscode_tpu.settings import XTB_AVAILABLE
    if embedder.options.calculator != 'XTB' or not XTB_AVAILABLE:
        return None
    from tscode_tpu.calculators.gradients import (make_chain_gradient_fn,
                                                  make_gradient_fn)
    from tscode_tpu.settings import DEFAULT_LEVELS
    make = make_chain_gradient_fn if chain else make_gradient_fn
    return make(
        mol.atomnos,
        calculator='XTB',
        method=embedder.options.theory_level or DEFAULT_LEVELS['XTB'],
        solvent=embedder.options.solvent,
        charge=embedder.options.charge,
        procs=getattr(embedder, 'procs', None) or 1,
        maxthreads=getattr(embedder, 'threads', None) or 4)


def _make_ff_energy(mol):
    '''Batched FF energy closure for one topology (neb/saddle drivers).'''
    from tscode_tpu.ff import build_ff_params, ff_energy, params_to_device
    params = params_to_device(build_ff_params(
        mol.atomcoords[0], mol.atomnos, mol.graph))

    def energy(c):
        return ff_energy(c, params)
    return energy


def _neb_operator(embedder, mol, name):
    '''neb>: climbing-image NEB from 2 (ends), 3 (ends + TS guess) or an
    odd-N chain of input structures (reference operators.py:281-395;
    internal-FF surface when no calculator is present).'''
    from tscode_tpu.io_xyz import write_xyz
    from tscode_tpu.neb import interpolate_chain, run_neb

    n = mol.n_confs
    if n < 2:
        raise InputError('neb> needs at least two structures '
                         '(reagent and product).')

    images = getattr(embedder.options, 'images', None) or \
        (embedder.options.neb.images if embedder.options.neb else 7)

    energy = _make_ff_energy(mol)
    # center + Kabsch-align every image to the first so interpolation
    # does not sweep through rigid-rotation garbage
    from tscode_tpu.molecule import align_structures
    aligned = align_structures(mol.atomcoords)
    if n == 2:
        chain = None
        start, end = aligned[0], aligned[-1]
    elif n == 3:
        # ends + TS guess: two IDPP half-bands THROUGH the guess
        # (reference ase_manipulations.py:413-426), so the band has
        # `images` movable resolution instead of one interior image
        from tscode_tpu.neb import idpp_interpolate
        images = max(int(images), 5)
        half = images // 2 + 1
        chain = np.concatenate([
            idpp_interpolate(aligned[0], aligned[1], half),
            idpp_interpolate(aligned[1], aligned[2], images - half + 1)[1:]])
        start, end = aligned[0], aligned[-1]
    else:
        # user-provided chain becomes the starting band
        chain = aligned
        start, end = aligned[0], aligned[-1]
        images = n

    qm_grad = qm_gradient_source(embedder, mol, chain=True)
    if qm_grad is not None:
        from tscode_tpu.neb import run_neb_callback
        embedder.log(f'--> {mol.rootname}: CI-NEB with {images} images '
                     f'({embedder.options.calculator} '
                     f'{embedder.options.theory_level} forces)')

        # fault tolerance matching the reference's neb_operator
        # (operators.py:281,352-375): the band is periodically
        # checkpointed to disk, and a crashed gradient subprocess or an
        # unconverged (max-iter) band restarts from the last checkpoint
        # for up to `attempts` tries instead of losing hours of QM work
        attempts = 5
        chkpt_path = f'{mol.rootname}_MEP_chkpt.xyz'
        last = {'chain': chain}

        def _checkpoint(band):
            last['chain'] = np.asarray(band)
            with open(chkpt_path, 'w') as f:
                for i, s in enumerate(last['chain']):
                    write_xyz(s, mol.atomnos, f,
                              title=f'NEB checkpoint image '
                                    f'{i + 1}/{len(last["chain"])}')

        for attempt in range(attempts):
            try:
                chain, energies, ts, converged = run_neb_callback(
                    start, end, qm_grad, n_images=images,
                    chain=last['chain'], checkpoint_fn=_checkpoint,
                    with_status=True)
            except Exception as e:
                if attempt + 1 >= attempts:
                    raise
                embedder.log(f'    NEB gradient evaluation failed '
                             f'({type(e).__name__}: {e}) - restarting '
                             f'from checkpoint. Attempt '
                             f'{attempt + 2}/{attempts}.')
                continue
            if converged or attempt + 1 >= attempts:
                break
            embedder.log(f'--> Band not converged: restarting NEB from '
                         f'checkpoint. Attempt {attempt + 2}/{attempts}.')
            last['chain'] = chain
    else:
        embedder.log(f'--> {mol.rootname}: CI-NEB with {images} images '
                     f'(internal FF surface)')
        chain, energies, ts = run_neb(start, end, energy, n_images=images,
                                      chain=chain)

    with open(f'{mol.rootname}_MEP.xyz', 'w') as f:
        for i, (s, e) in enumerate(zip(chain, energies)):
            write_xyz(s, mol.atomnos, f,
                      title=f'MEP image {i + 1}/{len(chain)} - Rel. E = '
                            f'{round(e - energies[0], 2)} kcal/mol')
    with open(f'{mol.rootname}_NEB_TS.xyz', 'w') as f:
        write_xyz(chain[ts], mol.atomnos, f,
                  title=f'NEB TS guess - Rel. E = '
                        f'{float(energies[ts] - energies[0]):.2f} kcal/mol')
    _write_neb_plot(mol.rootname, energies, ts)
    embedder.log(f'    TS guess at image {ts + 1}, barrier '
                 f'{float(energies[ts] - energies[0]):.2f} kcal/mol; wrote '
                 f'{mol.rootname}_MEP.xyz, {mol.rootname}_NEB_TS.xyz and '
                 f'{mol.rootname}_NEB_plt.svg')
    return mol


def _write_neb_plot(rootname, energies, ts):
    '''Relative-energy band plot with the TS image marked (reference
    ase_neb write_plot, ase_manipulations.py:500-524).'''
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    energies = np.asarray(energies, dtype=float)
    rel = energies - energies.min()
    plt.figure()
    plt.plot(range(1, len(rel) + 1), rel, color='tab:blue',
             label='Image energies', linewidth=3)
    plt.plot([ts + 1], [rel[ts]], color='gold', label='TS guess',
             marker='o', markersize=3)
    plt.legend()
    plt.title(rootname)
    plt.xlabel('Image number')
    plt.ylabel('Rel. E. (kcal/mol)')
    plt.savefig(f'{rootname}_NEB_plt.svg')
    plt.close()


def _mep_relax_operator(embedder, mol, name):
    '''mep_relax>: relax a user-provided image chain
    (reference operators.py:107-150, mep_relaxer.py). The reference runs
    a bond-locked "safe" DyNEB pass before the free pass; the internal
    FF surface is graph-restrained by construction, so every pass here
    is inherently the safe pass — with an external calculator wired into
    the band energy the same two-pass structure would apply.'''
    return _neb_operator(embedder, mol, name)


def _saddle_operator(embedder, mol, name):
    '''saddle>: first-order saddle refinement of a single structure
    (reference operators.py:397-431; dimer method on the internal FF).'''
    from tscode_tpu.io_xyz import write_xyz
    from tscode_tpu.saddle import saddle_refine_structure

    qm_grad = qm_gradient_source(embedder, mol)
    if qm_grad is not None:
        from tscode_tpu.saddle import dimer_saddle_callback
        embedder.log(f'--> {mol.rootname}: dimer saddle refinement '
                     f'({embedder.options.calculator} '
                     f'{embedder.options.theory_level} forces)')
        coords, energy, done = dimer_saddle_callback(
            mol.atomcoords[0], qm_grad)
    else:
        embedder.log(f'--> {mol.rootname}: dimer saddle refinement '
                     f'(internal FF surface)')
        coords, energy, done = saddle_refine_structure(
            mol.atomcoords[0], mol.atomnos, mol.graph)
    with open(f'{mol.rootname}_saddle.xyz', 'w') as f:
        write_xyz(coords, mol.atomnos, f,
                  title=f'Saddle structure - E = {float(energy):.2f} '
                        f'kcal/mol - converged: {done}')
    embedder.log(f'    wrote {mol.rootname}_saddle.xyz '
                 f'(converged: {done})')
    return mol


def _automep_operator(embedder, mol, name):
    from tscode_tpu.automep import automep
    n_images = getattr(embedder.options, 'images', None) or 9
    automep(embedder, n_images=n_images)
    return mol


def _pka_operator(embedder, mol, name):
    from tscode_tpu.pka import pka_routine
    pka_routine(mol.name, embedder)
    return mol

