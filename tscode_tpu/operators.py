'''
Operator dispatcher: `op>` prefixes executed before the embed
(reference /root/reference/tscode/operators.py:48-156).

Each operator takes and returns a Molecule. Operators that require
external binaries raise a clear error when those are unavailable.
'''

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
        'neb': _not_implemented,
        'saddle': _not_implemented,
        'scan': _scan_operator,
        'automep': _not_implemented,
        'mep_relax': _not_implemented,
        'pka': _not_implemented,
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


def _not_implemented(embedder, mol, name):
    raise InputError(
        f'Operator {name}> is not wired up yet in tscode_tpu.')
