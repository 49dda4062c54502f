'''
Engine: input DSL parsing, embed-type state machine, and the refinement
pipeline driver.

Re-design of the reference Embedder / RunEmbedding
(/root/reference/tscode/embedder.py:72-2379). Differences in shape, not
behavior:
 * the pipeline is a plain method sequence over array state (structures,
   energies, constrained_indices, exit_status) with explicit masking —
   every pruning stage runs as a batched device kernel with a host
   bookkeeping tail;
 * termination returns instead of sys.exit-ing, so the engine is usable
   as a library (the CLI wraps it);
 * calculators are optional: pure-geometry paths (NOOPT/BYPASS, embeds,
   pruning) never require external binaries.
'''

import logging
import os
import re
import time
from collections import Counter
from copy import deepcopy

import numpy as np

from tscode_tpu import __version__
from tscode_tpu.embeds.string import string_embed
from tscode_tpu.errors import InputError, ZeroCandidatesError
from tscode_tpu.graphs import get_quadruplets, get_sum_graph, graphize
from tscode_tpu.io_xyz import write_xyz
from tscode_tpu.molecule import Molecule, align_by_moi, align_structures
from tscode_tpu.ops import clash as clash_ops
from tscode_tpu.ops import moi as moi_ops
from tscode_tpu.ops import rmsd_prune as rmsd_ops
from tscode_tpu.ops import tfd as tfd_ops
from tscode_tpu.ops.linalg import cartesian_product, rmsd_and_max
from tscode_tpu.options import Options, OptionSetter
from tscode_tpu.pivots import set_pivots
from tscode_tpu.references import references
from tscode_tpu.pt import SYMBOLS
from tscode_tpu.settings import DEFAULT_LEVELS
from tscode_tpu.utils import (auto_newline, clean_directory,
                              saturation_check, time_to_string)

import jax.numpy as jnp


class Embedder:
    '''
    Set-up state machine: parses the input file, loads molecules, reads
    pairings, applies keywords/operators, and decides the embed type.
    '''

    def __init__(self, filename, stamp=None, procs=None, threads=None,
                 run_in_place=False):
        self.t_start_run = time.perf_counter()
        if not run_in_place:
            d = os.path.dirname(os.path.abspath(filename))
            os.chdir(d)
            filename = os.path.basename(filename)

        self.stamp = stamp if stamp is not None else \
            time.ctime().replace(' ', '_').replace(':', '-')[4:-8]

        self.avail_cpus = len(os.sched_getaffinity(0))
        self.threads = int(threads) if threads is not None else \
            max(self.avail_cpus // 4, 1)
        self.procs = int(procs) if procs is not None else 4

        log_filename = f'tscode_{self.stamp}.log'
        try:
            os.remove(log_filename)
        except FileNotFoundError:
            pass
        self.logfile = open(log_filename, 'a', buffering=1, encoding='utf-8')

        from tscode_tpu.backend import ensure_backend
        self.jax_backend = ensure_backend()

        try:
            self.write_banner_and_info()

            self.options = Options()
            self.embed = None
            self.warnings = []
            self.pairing_dists = {}

            inp = self._parse_input(filename)
            self.objects = [Molecule(name, c_ids, attrs=attrs)
                            for name, c_ids, attrs in inp]
            self.ids = np.array([mol.n_atoms for mol in self.objects])
            self.graphs = [mol.graph for mol in self.objects]

            self._read_pairings()
            self.check_objects_compenetration()
            self.check_saturation()
            self._set_options(filename)
            self._calculator_setup()
            self._print_references()
            self._apply_operators()
            self._setup()

            if self.options.debug:
                for mol in self.objects:
                    if mol.reactive_atoms and len(mol.reactive_atoms[0]) > 0:
                        mol.write_hypermolecule()
                        self.log(f'--> DEBUG: written hypermolecule file for ({mol.name})')
                self.log()

            if self.options.check_structures:
                self._inspect_structures()

        except SystemExit:
            raise
        except Exception as e:
            logging.exception(e)
            raise

    def _inspect_structures(self):
        '''CHECK keyword: write every molecule's hypermolecule file
        (conformers + orbital lobes as X dummy atoms) for inspection,
        then exit. The reference opens the ASE GUI instead
        (embedder.py:922-934) — on a headless TPU host the artifact IS
        the inspection surface.'''
        self.log('--> Structures check requested. Writing hypermolecule '
                 'files and shutting down.\n')
        for mol in self.objects:
            if mol.reactive_atoms and len(mol.reactive_atoms[0]) > 0:
                name = mol.write_hypermolecule()
                self.log(f'    {mol.name}: orbital geometry written to '
                         f'{name}')
            else:
                self.log(f'    {mol.name}: no reactive atoms — nothing '
                         f'to inspect')
        import sys
        sys.exit()

    # ------------------------------------------------------------ logging

    def log(self, string='', p=True):
        if p:
            print(string)
        self.logfile.write(str(string) + '\n')

    def write_banner_and_info(self):
        banner = (
            '\n'
            '  ================================================================\n'
            '   tscode_tpu - TPU-native Transition State Conformational Docker\n'
            f'   version {__version__:<12} | procs {self.procs:<4} '
            f'| threads {self.threads:<4} | cpus {self.avail_cpus:<4}\n'
            f'   {time.ctime()[0:-8]}\n'
            '  ================================================================\n')
        self.log(banner)

    # ------------------------------------------------------------ parsing

    def _echo_input(self, filename, raw_lines):
        '''Render the input file into the log, framed and line-numbered.'''
        body = [line.rstrip('\n') for line in raw_lines]
        width = max(map(len, body), default=0)
        frame = '    ' + '=' * (width + 8)
        self.log(f'--> Input file: {filename}\n')
        self.log(frame)
        for num, text in enumerate(body, start=1):
            self.log(f'{num:>3} |  {text:<{width}}  |')
        self.log(frame + '\n')

    @staticmethod
    def _reactive_indices_of(fragments):
        '''Bare reactive indices from letter-tagged fragments like
        ["2a", "5b", "7"]. A letter appearing on two fragments of the
        SAME line marks an internal constraint, whose indices are not
        reactive (reference embedder.py:265-269).'''
        parsed = [(int(re.sub(r'\D', '', frag)),
                   re.sub(r'[^A-Za-z]', '', frag)) for frag in fragments]
        tag_uses = Counter(tag for _, tag in parsed if tag)
        return tuple(idx for idx, tag in parsed
                     if tag_uses.get(tag, 0) <= 1)

    def _parse_input(self, filename):
        '''
        Input DSL: an optional keyword line, then one molecule line each:
        `op1> op2> file.xyz 2a 5b k=v` (reference embedder.py:243-305).
        Returns [(filename, reactive_indices, attrs)].
        '''
        with open(filename, 'r') as f:
            raw_lines = f.readlines()

        self._echo_input(filename, raw_lines)

        # drop comments/blanks; allow "DIST(a=1.8, b=2.0)"-style spaces
        lines = [line.replace(', ', ',') for line in raw_lines
                 if line[0] not in ('#', '\n')]

        from tscode_tpu.options import KEYWORDS
        try:
            # the first line is a keyword line iff any token's stem
            # (before any '=' or '(') is a known keyword
            first_stems = (re.split(r'[=(]', tok, maxsplit=1)[0].upper()
                           for tok in lines[0].split())
            if any(stem in KEYWORDS for stem in first_stems):
                self.kw_line, *self.mol_lines = lines
            else:
                self.kw_line = ''
                self.mol_lines = lines

            inp = []
            for _l, line in enumerate(self.mol_lines):
                if '>' in line:
                    # nested operators apply right-to-left
                    *ops, line = (part.strip()
                                  for part in line.rstrip('\n').split('>'))
                    self.options.operators_dict[_l] = list(reversed(ops))
                    self.options.operators.append(
                        self.mol_lines[_l].rstrip('\n'))

                molname, *fragments = line.split()
                attrs = {}
                reactive = []
                for frag in fragments:
                    if '=' in frag:
                        key, eq, value = frag.partition('=')
                        if not key or not value or '=' in value:
                            raise InputError(
                                f"Error reading attribute '{frag}'. "
                                f"Syntax: 'var=value'")
                        attrs[key] = value
                    else:
                        reactive.append(frag)

                reactive_indices = (self._reactive_indices_of(reactive)
                                    if reactive else None)
                inp.append((molname, reactive_indices, attrs))
            return inp

        except InputError:
            raise
        except Exception as e:
            print(e)
            raise InputError(
                f'Error in reading molecule input for {filename}. '
                f'Please check your syntax.')

    # one molecule-line fragment: an atom index plus optional letter tags
    _TAGGED_INDEX = re.compile(r'(\d+)([A-Za-z]*)\Z')

    def _read_pairings(self):
        '''Letter pairings (a-z interactions, A-Z fixed, x/y/z NCI) from
        molecule lines (reference embedder.py:369-499).

        Builds, in global (concatenated-pose) atom numbering:
          pairings_table  {letter: [atom, atom]}  across molecules
          pairings_dict   {mol: {letter: local_atom | (atom, atom)}}
          internal_constraints  pairs tagged twice on ONE molecule that
            also carry an imposed distance on the keyword line
        '''
        self.pairings_dict = {m: {} for m in range(len(self.objects))}
        self.kw_line = getattr(self, 'kw_line', '')
        mol_offsets = np.concatenate([[0], np.cumsum(self.ids)])[:-1] \
            if self.ids is not None else np.zeros(len(self.mol_lines), int)

        by_letter = {}          # letter -> [global atom, ...]
        untagged = []           # bare indices (implicit '?' pairing)

        for mol, line in enumerate(self.mol_lines):
            tokens = line.split('>')[-1].split()[1:]
            offset = int(mol_offsets[mol]) if mol < len(mol_offsets) else 0

            for token in tokens:
                if '=' in token:
                    continue    # molecule attribute, not an index
                match = self._TAGGED_INDEX.match(token)
                if match is None:
                    continue
                local = int(match.group(1))
                tags = match.group(2)

                if not tags:
                    untagged.append(local + offset)
                    continue
                for letter in tags:
                    by_letter.setdefault(letter, []).append(local + offset)
                    # per-molecule view keeps LOCAL numbering; a repeat
                    # on the same molecule upgrades the entry to a tuple
                    seen = self.pairings_dict[mol].get(letter)
                    self.pairings_dict[mol][letter] = \
                        local if seen is None else (seen, local)

        self.pairings_table = {letter: sorted(atoms)
                               for letter, atoms in sorted(by_letter.items())}

        for letter, atoms in self.pairings_table.items():
            if len(atoms) == 1:
                raise SyntaxError(
                    f"Letter '{letter}' is only specified once. "
                    f"Please flag the second reactive atom.")
            if len(atoms) > 2:
                raise SyntaxError(
                    f"Letter '{letter}' is specified more than two times. "
                    f"Please remove the unwanted letters.")

        if len(self.mol_lines) in (2, 3) and len(untagged) == 2:
            self.pairings_table['?'] = sorted(untagged)

        internal = [
            [pair] for letter, pair in self.pairings_table.items()
            if f'{letter}=' in self.kw_line
            and any(isinstance(view.get(letter), tuple)
                    for view in self.pairings_dict.values())]
        self.internal_constraints = (np.concatenate(internal) if internal
                                     else np.array([], dtype=int))

    # ------------------------------------------------------------- checks

    def check_objects_compenetration(self):
        # host numpy: tiny per-molecule arrays, host-consumed result —
        # an eager device call here cost ~25 s PER EMBEDDER over the
        # accelerator tunnel (profiled; multiembed builds 13 of them)
        for mol in self.objects:
            counts = clash_ops.count_intra_clashes_np(mol.atomcoords)
            for c, n in enumerate(counts):
                if n > 0:
                    s = (f'--> WARNING! {mol.name}, conformer {c + 1}, looks '
                         f'compenetrated ({n} interatomic distance'
                         f'{"s" if n > 1 else ""} < 0.5 A)')
                    self.warnings.append(s)
                    self.log(s)

    def check_saturation(self):
        self.log()
        for mol in self.objects:
            charge = int(mol.attrs.get('charge', 0))
            if saturation_check(mol.atomnos, charge):
                self.log(f'--> {mol.name}: saturation check passed '
                         f'(even saturation index)')
            else:
                s = (f'--> WARNING! {mol.name}: saturation check failed. Odd '
                     f'saturation index (charge={charge}). Radical or bad '
                     f'input geometry?')
                self.log(s)
                self.warnings.append(s)

    # ------------------------------------------------------------ options

    def _set_options(self, filename):
        try:
            OptionSetter(self).set_options()
        except SyntaxError:
            raise
        except Exception as e:
            print(e)
            raise InputError(
                f'Error in reading keywords from {filename}. '
                f'Please check your syntax.')

    def _calculator_setup(self):
        if self.options.theory_level is None and self.options.calculator:
            self.options.theory_level = DEFAULT_LEVELS.get(
                self.options.calculator)

    def _print_references(self):
        '''Log literature references relevant to the run settings
        (reference embedder.py:222-241).'''
        self.log('--> If you use this software in your publication, '
                 'please cite the TSCoDe manuscript:\n'
                 f'    {references["TSCoDe"]}')

        cite_ff = self.options.ff_calc == 'XTB'
        cite_gfn2 = self.options.calculator == 'XTB'
        # match the OPERATOR forms, not a bare substring — a filename
        # containing "mtd" must not trigger the CREST citation
        # (reference embedder.py:234 matches 'mtd>'/'mtd_search>')
        cite_crest = any('mtd>' in op or 'mtd_search>' in op
                         for op in self.options.operators)

        if any((cite_ff, cite_gfn2, cite_crest)):
            s = ''
            s += f'    GFN-FF : {references["GFN-FF"]}\n' if cite_ff else ''
            s += (f'    GFN2-XTB : {references["GFN2-XTB"]}\n'
                  if cite_gfn2 else '')
            s += f'    CREST : {references["CREST"]}\n' if cite_crest else ''
            self.log('\n--> Your run also makes use of other software: '
                     f'please cite these references as well.\n{s}')
        self.log()

    def _set_custom_orbs(self, orb_string):
        '''DIST(a=2.345,...): rebuild orbitals with imposed half-distances
        (reference embedder.py:501-540).'''
        for mol in self.objects:
            if not mol.reactive_atoms:
                mol.compute_orbitals(
                    override='Single' if self.options.simpleorbitals else None)

        self.pairing_dists = {p.split('=')[0]: float(p.split('=')[1])
                              for p in orb_string.split(',')}

        from tscode_tpu.orbitals import get_atom_builder

        for letter, dist in self.pairing_dists.items():
            if letter not in self.pairings_table:
                raise SyntaxError(
                    f"Letter '{letter}' is specified in DIST but not "
                    f"present in molecules string.")
            for i, mol in enumerate(self.objects):
                r_index = self.pairings_dict[i].get(letter)
                if r_index is None:
                    continue
                indices = (r_index,) if isinstance(r_index, (int, np.integer)) \
                    else r_index
                for r_i in indices:
                    for c in range(mol.n_confs):
                        # .get: internal-constraint indices are not
                        # reactive indices and carry no orbital objects
                        # (reference uses the same guarded lookup,
                        # embedder.py:531-536)
                        if r_i in mol.reactive_atoms.get(c, {}):
                            builder = get_atom_builder(mol.graph, r_i)
                            mol.reactive_atoms[c][r_i] = builder(
                                mol, r_i, conf=c, orb_dim=dist / 2)
        self.orb_string = orb_string

    # ---------------------------------------------------------- operators

    def _apply_operators(self):
        '''Execute op> prefixes right-to-left per molecule (reference
        embedder.py:853-907); wired to the operators module.'''
        for mol_index, op_list in self.options.operators_dict.items():
            for op in op_list:
                if self.options.dryrun:
                    self.log(f'--> Dry run requested: skipping operator '
                             f'"{op}>"')
                    continue
                from tscode_tpu.operators import operate
                self.objects[mol_index] = operate(op, self,
                                                  self.objects[mol_index])

    # -------------------------------------------------------------- setup

    def _setup(self, p=True):
        '''Embed-type decision + angle grids + pivots
        (reference embedder.py:623-779).'''
        if any(tag in op for op in self.options.operators
               for tag in ('pka>', 'scan>', 'neb>', 'saddle>',
                           'mep_relax>', 'automep>')):
            # these operators already ran in _apply_operators and the run
            # terminates with their data (reference operators.py:81-150)
            self.embed = 'data'
            return

        if any('refine>' in op for op in self.options.operators) or \
                self.options.noembed:
            self.embed = 'refine'
            return

        for mol in self.objects:
            if self.options.max_confs < mol.n_confs:
                self.log(f'--> {mol.name} - kept {self.options.max_confs}/'
                         f'{mol.n_confs} conformations for the embed '
                         f'(override with CONFS=n)\n')
                mol.atomcoords = mol.atomcoords[:self.options.max_confs]

        if all(len(mol.reactive_indices) == 0 for mol in self.objects):
            self.embed = None
            return

        override = 'Single' if self.options.simpleorbitals else None

        if len(self.objects) == 1:
            mol = self.objects[0]
            if len(mol.reactive_indices) == 2:
                self.embed = 'monomolecular'
                mol.compute_orbitals(override=override)
                set_pivots(mol, suprafacial=self.options.suprafacial)
                self.options.only_refined = True
                self.options.fix_angles_in_deformation = True
            else:
                self.embed = 'error'
                # the reference returns right away here (embedder.py:672-675)
                # and run() reports the unrecognized embed cleanly
                return

        elif len(self.objects) in (2, 3):
            cyclical = all(len(mol.reactive_indices) == 2
                           for mol in self.objects)
            chelotropic = sorted(len(mol.reactive_indices)
                                 for mol in self.objects) == [1, 2]
            string = (len(self.objects) == 2 and
                      all(len(mol.reactive_indices) == 1
                          for mol in self.objects))
            multiembed = (len(self.objects) == 2 and
                          all(len(mol.reactive_indices) >= 2
                              for mol in self.objects) and not cyclical)

            if cyclical or chelotropic or multiembed:
                if cyclical:
                    self.embed = 'cyclical'
                elif multiembed:
                    self.embed = 'multiembed'
                else:
                    self.embed = 'chelotropic'
                    from tscode_tpu.orbitals import get_atom_builder
                    for mol in self.objects:
                        mol.compute_orbitals(override=override)
                        # slightly enlarge orbitals (+0.2 A) for chelotropic
                        # embeds (reference embedder.py:698-706)
                        for c in range(mol.n_confs):
                            for index, atom in list(mol.reactive_atoms[c].items()):
                                orb_dim = np.linalg.norm(
                                    atom.center[0] - atom.coord)
                                builder = get_atom_builder(mol.graph, index)
                                mol.reactive_atoms[c][index] = builder(
                                    mol, index, conf=c, orb_dim=orb_dim + 0.2)

                self.options.rotation_steps = 5
                if hasattr(self.options, 'custom_rotation_steps'):
                    self.options.rotation_steps = \
                        self.options.custom_rotation_steps

                steps = self.options.rotation_steps
                self.systematic_angles = cartesian_product(
                    *[np.arange(steps + 1) for _ in self.objects]) \
                    * 2 * self.options.rotation_range / steps \
                    - self.options.rotation_range

                if p:
                    for mol in self.objects:
                        if not mol.reactive_atoms:
                            mol.compute_orbitals(override=override)
                        set_pivots(mol,
                                   suprafacial=self.options.suprafacial)

            elif string:
                self.embed = 'string'
                self.options.rotation_steps = 36
                for mol in self.objects:
                    if not mol.reactive_atoms:
                        mol.compute_orbitals(override=override)
                if hasattr(self.options, 'custom_rotation_steps'):
                    self.options.rotation_steps = \
                        self.options.custom_rotation_steps
                self.systematic_angles = [
                    n * 360 / self.options.rotation_steps
                    for n in range(self.options.rotation_steps)]

            else:
                self.embed = 'error'

            if multiembed:
                self.embed = 'multiembed'
                for mol in self.objects:
                    mol.compute_orbitals(override=override)

            if self.embed == 'error':
                raise InputError(
                    'Bad input - The only molecular configurations accepted '
                    'are:\n'
                    '1) One molecule with two reactive centers '
                    '(monomolecular embed)\n'
                    '2) One molecule with four indices (dihedral embed)\n'
                    '3) Two or three molecules with two reactive centers '
                    'each (cyclical embed)\n'
                    '4) Two molecules with one reactive center each '
                    '(string embed)\n'
                    '5) Two molecules, one with a single reactive center '
                    'and the other with two (chelotropic embed)\n'
                    '6) Two molecules with at least two reactive centers each')
        else:
            raise InputError(
                'Bad input - could not set up an appropriate embed type '
                '(too many structures specified?)')

        if p:
            if self.options.shrink:
                for mol in self.objects:
                    mol.scale_orbs(self.options.shrink_multiplier)
                    set_pivots(mol, suprafacial=self.options.suprafacial)
                self.options.only_refined = True

            self.candidates = self._get_number_of_candidates()
            _s = self.candidates or 'Many'
            self.log(f'--> Setup performed correctly. {_s} candidates will '
                     f'be generated.\n')

    def _get_number_of_candidates(self):
        '''Candidate-count prediction (reference embedder.py:781-826).'''
        l = len(self.objects)
        if l == 1:
            return int(sum(len(self.objects[0].pivots[c])
                           for c in range(self.objects[0].n_confs)))

        if self.embed == 'string':
            return int(self.options.rotation_steps * np.prod(
                [sum(len(mol.get_r_atoms(c)[0].center)
                     for c in range(mol.n_confs)) for mol in self.objects]))

        if self.embed == 'multiembed':
            return 0

        candidates = 2 * len(self.systematic_angles) * np.prod(
            [mol.n_confs for mol in self.objects])
        if l == 3:
            candidates *= 4

        if self.pairings_table:
            if self.embed == 'cyclical':
                if len(self.objects) == 2:
                    candidates /= 2
                else:
                    candidates /= 4 if len(self.pairings_table) == 1 else 8

        candidates *= np.prod([len(mol.pivots[0]) for mol in self.objects])
        return int(candidates)

    def _set_embedder_structures_from_mol(self):
        '''refine>/REFINE runs: input ensemble becomes the structures
        (reference embedder.py:828-839).'''
        self.structures = self.objects[0].atomcoords
        self.atomnos = self.objects[0].atomnos
        if self.pairings_table:
            self.constrained_indices = np.array(
                [list(self.pairings_table.values()) for _ in self.structures])
        else:
            self.constrained_indices = np.array(
                [[] for _ in self.structures])
        self.ids = None
        self.energies = np.zeros(len(self.structures))
        self.exit_status = np.ones(len(self.structures), dtype=bool)
        self.embed_graph = get_sum_graph(
            [graphize(self.structures[0], self.atomnos)],
            self.constrained_indices[0])

    # ---------------------------------------------------------- pairings

    def pairing_ok_fn(self):
        '''Callable(ids) testing that an arrangement carries every
        user-imposed pairing (reference embeds.py:777).'''
        if not self.pairings_table:
            return None
        table = {tuple(v) for v in self.pairings_table.values()}
        internal = {tuple(sorted(pair)) for pair in
                    (self.internal_constraints.tolist()
                     if len(self.internal_constraints) else [])}

        def ok(ids):
            pairs = {tuple(sorted(pair)) for pair in ids}
            return all(p in pairs or p in internal for p in table)
        return ok

    def get_pairing_dist_from_letter(self, letter):
        '''Target distance for a pairing letter: imposed (DIST) or the sum
        of the two orbital half-dimensions (reference embedder.py:939-971).'''
        if letter in self.pairing_dists:
            return self.pairing_dists[letter]

        d = 0
        try:
            for i, mol in enumerate(self.objects):
                r_index = self.pairings_dict[i].get(letter)
                if r_index is None:
                    continue
                if isinstance(r_index, (int, np.integer)):
                    d += mol.get_orbital_length(r_index)
                else:
                    return None  # internal constraint without imposed dist
            return d if d > 0 else None
        except Exception:
            return None

    def get_pairing_dists_from_constrained_indices(self, pair):
        '''Target distance for a constrained cumulative-index pair.'''
        try:
            letter = next(
                lett for lett, ids in self.pairings_table.items()
                if (ids[0] == min(pair) and ids[1] == max(pair)))
            return self.get_pairing_dist_from_letter(letter)
        except StopIteration:
            return None

    # ------------------------------------------------------------- output

    def write_structures(self, tag, indices=None, energies=True,
                         relative=True, extra='', align='indices', p=True):
        '''(reference embedder.py:996-1043)'''
        if energies:
            rel_e = self.energies
            if relative:
                rel_e = rel_e - np.min(self.energies)

        if len(self.structures) > 10000 and not self.options.let:
            self.log(f'Truncated {tag} output structures to 10000 (from '
                     f'{len(self.structures)} - keyword LET to override).')
            output_structures = self.structures[:10000]
        else:
            output_structures = self.structures

        if align == 'moi':
            aligned = align_by_moi(output_structures, self.atomnos)
        else:
            aligned = align_structures(output_structures, indices=indices)

        self.outname = f'tscode_{tag}_{self.stamp}.xyz'
        with open(self.outname, 'w') as f:
            for i, structure in enumerate(aligned):
                title = f'Structure {i + 1} - {tag}'
                if energies:
                    title += f' - Rel. E. = {round(rel_e[i], 3)} kcal/mol '
                title += extra
                write_xyz(structure, self.atomnos, f, title=title)

        if p:
            self.log(f'Wrote {len(output_structures)} {tag} structures to '
                     f'{self.outname} file.\n')

    def write_mol_info(self):
        for mol in self.objects:
            s = f'--> {mol.name}: {mol.n_confs} conformer' \
                f'{"s" if mol.n_confs > 1 else ""}, {mol.n_atoms} atoms'
            if len(mol.reactive_indices):
                s += (f', reactive indices '
                      f'{[int(i) for i in mol.reactive_indices]}')
            self.log(s)
        self.log()

    def write_options(self):
        self.log('--> Options:\n')
        for line in repr(self.options).split('\n'):
            self.log('    ' + line)
        self.log()

    def log_warnings(self):
        for warning in self.warnings:
            self.log(warning)

    def write_quote(self):
        '''Log a random end-of-run quote (reference embedder.py:1045-1055).'''
        import random

        from tscode_tpu.quotes import quotes
        entry = random.choice(quotes)
        self.log('\n' + auto_newline(entry['quote']))
        if entry['author']:
            self.log(f'    - {entry["author"]}\n')

    def normal_termination(self):
        '''(reference embedder.py:1068-1096, minus the sys.exit)'''
        clean_directory()
        self.write_quote()
        self.log(f'\n--> tscode_tpu normal termination: total time '
                 f'{time_to_string(time.perf_counter() - self.t_start_run, verbose=True)}.')

        if hasattr(self, 'structures') and len(getattr(self, "structures", [])) > 0 \
                and hasattr(self, 'energies') and len(self.energies) > 0:
            energies = self.energies[:10]
            if np.max(energies - np.min(energies)) > 0:
                self.log(f'\n--> Energies of output structures (first 10, '
                         f'{self.options.theory_level}/'
                         f'{self.options.calculator})\n')
                self.log('> #                Rel. E.           RMSD')
                self.log('-------------------------------------------')
                for i, energy in enumerate(energies - energies[0]):
                    if i == 0:
                        rmsd_value = '(ref)'
                    else:
                        r, _ = rmsd_and_max(
                            self.structures[i] - self.structures[i].mean(0),
                            self.structures[0] - self.structures[0].mean(0))
                        rmsd_value = f'{float(r):.2f} A'
                    self.log(f'> Candidate {str(i + 1):2}  :  {energy:.2f} '
                             f'kcal/mol  :  {rmsd_value}')
        self.write_run_report()
        self.logfile.close()

    def write_run_report(self):
        '''Machine-readable run summary: per-stage timings and survivor
        counts, final energetics, warnings. Written whenever stages ran.'''
        timings = getattr(self, 'stage_timings', None)
        if not timings:
            return
        import json
        report = {
            'stamp': self.stamp,
            'embed': getattr(self, 'embed', None),
            'total_seconds': round(
                time.perf_counter() - self.t_start_run, 3),
            'stages': timings,
            'final_structures': int(len(getattr(self, 'structures', ()))),
            'warnings': len(getattr(self, 'warnings', ())),
        }
        energies = getattr(self, 'energies', None)
        if energies is not None and len(energies) and \
                np.max(energies - np.min(energies)) > 0:
            # same sentinel guard as the termination table: all-1e10
            # placeholder energies (NOOPT runs) are "never computed",
            # not "all isoenergetic"
            rel = np.asarray(energies) - float(np.min(energies))
            report['rel_energies_kcal'] = [round(float(e), 3)
                                           for e in rel[:100]]
        path = f'tscode_report_{self.stamp}.json'
        try:
            with open(path, 'w') as f:
                json.dump(report, f, indent=1)
            self.log(f'--> Wrote run report to {path}', p=False)
        except OSError as e:
            # never fail a completed run at termination over telemetry
            self.log(f'--> Could not write run report: {e}', p=False)

    def run(self, resume_from=None):
        '''Run the pipeline on a copy of this embedder's state.'''
        try:
            run = RunEmbedding(self)
            run.run(resume_from=resume_from)
            return run
        except Exception as e:
            logging.exception(e)
            raise


def _timed_stage(fn):
    '''Record (stage, wall seconds, structures in/out) on the run — the
    machine-readable counterpart of the reference's per-stage log lines
    (embedder.py:1418,1530-1534), dumped as tscode_report_<stamp>.json
    at termination.'''
    def wrapper(self, *args, **kwargs):
        t0 = time.perf_counter()
        before = len(getattr(self, 'structures', ()) if
                     getattr(self, 'structures', None) is not None else ())
        out = fn(self, *args, **kwargs)
        after = len(getattr(self, 'structures', ()) if
                    getattr(self, 'structures', None) is not None else ())
        if not hasattr(self, 'stage_timings'):
            self.stage_timings = []
        self.stage_timings.append({
            'stage': fn.__name__,
            'seconds': round(time.perf_counter() - t0, 3),
            'structures_in': int(before),
            'structures_out': int(after)})
        return out
    wrapper.__name__ = fn.__name__
    wrapper.__doc__ = fn.__doc__
    return wrapper


class RunEmbedding(Embedder):
    '''Pipeline driver over array state (reference embedder.py:1098-2379).'''

    # attributes masked together through the pruning stages
    MASKABLE = ('structures', 'energies', 'constrained_indices', 'exit_status')

    def __init__(self, embedder):
        # copy non-callable state from the set-up embedder (reference
        # embedder.py:1104-1114 shares everything; here the Options
        # object is deep-copied so in-place keyword mutations during a
        # run — auto-RIGID, rotation_steps, only_refined — never leak
        # back into the Embedder when run() is called again)
        for attr in dir(embedder):
            if not attr.startswith('__') and attr != 'run':
                value = getattr(embedder, attr)
                if not callable(value):
                    setattr(self, attr, value)
        self.options = deepcopy(embedder.options)

    def rel_energies(self):
        return self.energies - np.min(self.energies)

    def apply_mask(self, attributes, mask):
        for attr in attributes:
            if hasattr(self, attr):
                value = getattr(self, attr)
                if isinstance(value, np.ndarray) and len(value) == len(mask):
                    setattr(self, attr, value[mask])

    def zero_candidates_check(self):
        if len(self.structures) == 0:
            self.log_warnings()
            raise ZeroCandidatesError()

    def _mesh(self, n_items=None):
        '''The device mesh the pipeline shards over, or None. With
        n_items given, also applies the size gate so tiny ensembles
        skip collective overhead — TSCODE_MESH=1 forces the sharded
        paths at any size (identity tests, driver dryrun).'''
        from tscode_tpu.parallel.sharding import get_default_mesh, \
            mesh_for
        if n_items is None:
            return get_default_mesh()
        return mesh_for(n_items)

    # ---------------------------------------------------------- pipeline

    @_timed_stage
    def generate_candidates(self):
        '''(reference embedder.py:1136-1177)'''
        if self.embed == 'refine':
            self.log('\n')
            return

        if self.embed == 'string':
            structures, constrained = string_embed(
                self.objects[0], self.objects[1], self.systematic_angles,
                clash_thresh=self.options.clash_thresh, log=self.log,
                mesh=self._mesh())
            self.structures = structures
            self.constrained_indices = constrained

        elif self.embed in ('cyclical', 'chelotropic'):
            pre = getattr(self, 'precomputed_embed', None)
            if pre is not None:
                # multiembed batches every arrangement's block sweep
                # into ONE device program set (multiembed.py) and hands
                # each child its slice here; empty slices behave exactly
                # like an empty embed
                structures, constrained = pre
                if len(structures) == 0:
                    raise ZeroCandidatesError(
                        '--> Cyclical embed did not find any suitable '
                        'disposition of molecules.')
                self.structures = structures
                self.constrained_indices = constrained
            else:
                from tscode_tpu.embeds.cyclical import cyclical_embed
                self.structures = cyclical_embed(self)

        elif self.embed == 'monomolecular':
            from tscode_tpu.embeds.monomolecular import monomolecular_embed
            monomolecular_embed(self)

        elif self.embed == 'multiembed':
            from tscode_tpu.multiembed import multiembed_dispatcher
            self.structures = multiembed_dispatcher(self)

        else:
            raise InputError(f'Embed type {self.embed!r} not recognized.')

        self.atomnos = np.concatenate(
            [mol.atomnos for mol in self.objects])

        additional_bonds = self.constrained_indices[0]
        if len(self.internal_constraints) > 0:
            additional_bonds = np.concatenate(
                (self.internal_constraints, additional_bonds))
        self.embed_graph = get_sum_graph(self.graphs, additional_bonds)

        self.log(f'Generated {len(self.structures)} transition state '
                 f'candidates '
                 f'({time_to_string(time.perf_counter() - self.t_start_run)})\n')

        self.write_structures('embedded', energies=False)

        if self.options.debug:
            self.dump_status('generate_candidates')

    @_timed_stage
    def compenetration_refining(self):
        '''(reference embedder.py:1230-1266)'''
        if self.embed not in ('string', 'cyclical', 'monomolecular'):
            self.log('--> Checking structures for compenetrations')
            t_start = time.perf_counter()
            if self.ids is not None:
                pm = clash_ops.cross_fragment_pair_mask(tuple(self.ids))
                thresh = self.options.clash_thresh
                mesh = self._mesh(len(self.structures))
                if mesh is not None:
                    from tscode_tpu.parallel.sharding import \
                        sharded_compenetration_mask
                    mask = sharded_compenetration_mask(
                        self.structures, pm, mesh, thresh=thresh,
                        max_clashes=self.options.max_clashes)
                else:
                    mask = np.asarray(clash_ops.compenetration_mask(
                        jnp.asarray(self.structures), jnp.asarray(pm),
                        thresh=thresh,
                        max_clashes=self.options.max_clashes))
            else:
                # single structure (refine mode): the reference counts
                # ALL off-diagonal pairs, both orderings, under 0.5 A —
                # but only pairs with d > 0, so exactly-coincident
                # atoms are EXCLUDED (numba_functions.py:50-72);
                # count_intra_clashes_np reproduces that exclusion
                mask = (clash_ops.count_intra_clashes_np(
                    self.structures, thresh=0.5)
                    <= self.options.max_clashes)
            self.apply_mask(('structures', 'constrained_indices'), mask)
            t_end = time.perf_counter()

            if False in mask:
                self.log(f'Discarded {np.count_nonzero(~mask)} candidates '
                         f'for compenetration ({np.count_nonzero(mask)} '
                         f'left, {time_to_string(t_end - t_start)})')
            else:
                self.log(f'All {len(mask)} structures passed the '
                         f'compenetration check')
            self.log()
            self.zero_candidates_check()

        self.energies = np.full(len(self.structures), 1e10)
        self.exit_status = np.zeros(len(self.structures), dtype=bool)

    @_timed_stage
    def fitness_refining(self, threshold=5, verbose=False):
        '''(reference embedder.py:1268-1308): discard structures whose
        summed absolute deviation from the imposed pairing distances
        exceeds threshold.'''
        if verbose:
            self.log(' \n--> Fitness pruning - removing inaccurate structures')

        # targets depend only on the index pair — resolve each distinct
        # pair once instead of per structure (the lookup scans the
        # pairings table and orbital lengths on every call)
        target_cache = {}

        def target_of(pair):
            key = (int(pair[0]), int(pair[1]))
            if key not in target_cache:
                target_cache[key] = \
                    self.get_pairing_dists_from_constrained_indices(pair)
            return target_cache[key]

        mask = np.ones(len(self.structures), dtype=bool)
        for s, (structure, constraints) in enumerate(
                zip(self.structures, self.constrained_indices)):
            error = 0.0
            for pair in constraints:
                target = target_of(pair)
                if target is not None:
                    d = np.linalg.norm(structure[pair[0]] - structure[pair[1]])
                    error += abs(d - target)
            mask[s] = error <= threshold

        self.apply_mask(self.MASKABLE, mask)

        if False in mask:
            self.log(f'Discarded {np.count_nonzero(~mask)} candidates for '
                     f'unfitness ({np.count_nonzero(mask)} left)')
        elif verbose:
            self.log('All candidates meet the imposed criteria.')
        self.log()
        self.zero_candidates_check()

    @_timed_stage
    def similarity_refining(self, tfd=True, moi=True, rmsd=True,
                            verbose=False):
        '''(reference embedder.py:1310-1388): TFD -> MOI(<=500) ->
        RMSD(<=1e5) -> rot-corrected RMSD(<=500).'''
        if verbose:
            self.log('--> Similarity Processing')

        before = len(self.structures)
        attr = ('constrained_indices', 'energies', 'exit_status')

        if (tfd and len(self.objects) > 1 and hasattr(self, 'embed_graph')
                and self.embed_graph.is_single_molecule):
            t_start = time.perf_counter()
            quadruplets = get_quadruplets(self.embed_graph)
            if len(quadruplets) > 0:
                self.structures, mask = tfd_ops.prune_conformers_tfd(
                    self.structures, quadruplets,
                    mesh=self._mesh(len(self.structures)))
                self.apply_mask(attr, mask)
                if False in mask:
                    self.log(f'Discarded {np.count_nonzero(~mask)} structures '
                             f'for TFD similarity ({np.count_nonzero(mask)} '
                             f'left, {time_to_string(time.perf_counter() - t_start)})')

        if moi and len(self.structures) <= 500:
            before3 = len(self.structures)
            t_start = time.perf_counter()
            self.structures, mask = moi_ops.prune_by_moment_of_inertia(
                self.structures, self.atomnos,
                mesh=self._mesh(len(self.structures)))
            self.apply_mask(attr, mask)
            if before3 > len(self.structures):
                self.log(f'Discarded {np.count_nonzero(~mask)} candidates '
                         f'for MOI similarity ({np.count_nonzero(mask)} left, '
                         f'{time_to_string(time.perf_counter() - t_start)})')

        if rmsd and len(self.structures) <= 1e5:
            before1 = len(self.structures)
            t_start = time.perf_counter()
            self.structures, mask = rmsd_ops.prune_conformers_rmsd(
                self.structures, self.atomnos, rmsd_thr=self.options.rmsd,
                mesh=self._mesh(len(self.structures)))
            self.apply_mask(attr, mask)
            if before1 > len(self.structures):
                self.log(f'Discarded {np.count_nonzero(~mask)} candidates '
                         f'for RMSD similarity ({np.count_nonzero(mask)} '
                         f'left, {time_to_string(time.perf_counter() - t_start)})')

            # symmetry-corrected pass (<=500 structures, dummy rotors)
            if len(self.structures) <= 500 and hasattr(self, 'embed_graph'):
                from tscode_tpu.rot_rmsd import prune_conformers_rmsd_rot_corr
                before2 = len(self.structures)
                t_start = time.perf_counter()
                self.structures, mask = prune_conformers_rmsd_rot_corr(
                    self.structures, self.atomnos, self.embed_graph,
                    max_rmsd=self.options.rmsd, verbose=verbose,
                    logfunction=self.log if verbose else None)
                self.apply_mask(attr, mask)
                if before2 > len(self.structures):
                    self.log(f'Discarded {np.count_nonzero(~mask)} '
                             f'candidates for symmetry-corrected RMSD '
                             f'similarity ({np.count_nonzero(mask)} left, '
                             f'{time_to_string(time.perf_counter() - t_start)})')

        if verbose and len(self.structures) == before:
            self.log(f'All structures passed the similarity check.{" " * 15}')
        self.log()

    # ------------------------------------------------------- debug dumps

    def dump_status(self, outname, only_fixed_constraints=False):
        '''Stage-by-stage debug artifacts: energies, structures,
        constraints, and a pickle of the run state
        (reference embedder.py:1179-1228).'''
        import pickle

        if hasattr(self, 'energies'):
            with open(f'{outname}_energies.dat', 'w') as f:
                for i, energy in enumerate(self.energies):
                    txt = (f'{round(energy - np.min(self.energies), 2)} '
                           f'kcal/mol' if energy != 1e10 else 'SCRAMBLED')
                    f.write(f'Candidate {i:5} : {txt}\n')

        with open(f'{outname}_structures.xyz', 'w') as f:
            exit_status = getattr(self, 'exit_status',
                                  np.zeros(len(self.structures), bool))
            energies = (self.rel_energies() if hasattr(self, 'energies')
                        else np.zeros(len(self.structures)))
            for i, (structure, status, energy) in enumerate(zip(
                    align_structures(self.structures), exit_status,
                    energies)):
                kind = 'REFINED - ' if status else 'NOT REFINED - '
                write_xyz(structure, self.atomnos, f,
                          title=f'Structure {i + 1} - {kind}Rel. E. = '
                                f'{round(energy, 3)} kcal/mol')

        with open(f'{outname}_constraints.dat', 'w') as f:
            for i, constraints in enumerate(self.constrained_indices):
                if only_fixed_constraints:
                    constraints = np.array(
                        [v for k, v in self.pairings_table.items()
                         if k.isupper()])
                elif len(self.internal_constraints) > 0:
                    constraints = np.concatenate(
                        [constraints, self.internal_constraints])
                d_str = [self.get_pairing_dists_from_constrained_indices(c)
                         for c in constraints]
                f.write(f'Candidate {i:5} : '
                        f'{np.asarray(constraints).tolist()} -> {d_str}\n')

        state = {
            'structures': self.structures,
            'constrained_indices': self.constrained_indices,
            'graphs': self.graphs,
            'options': self.options,
            'atomnos': self.atomnos,
        }
        if hasattr(self, 'energies'):
            state['energies'] = self.energies
        with open(f'{outname}_runembedding.pickle', 'wb') as f:
            pickle.dump(state, f)

    # ---------------------------------------------- augmentation stages

    @_timed_stage
    def metadynamics_augmentation(self):
        '''XTB MTD sampling around every candidate
        (reference embedder.py:1858-1891).'''
        from tscode_tpu.calculators.xtb import xtb_metadyn_augmentation

        self.log('--> Performing XTB Metadynamic augmentation of TS '
                 'candidates')
        before = len(self.structures)
        t_start = time.perf_counter()

        for s, (structure, constraints) in enumerate(zip(
                np.copy(self.structures),
                np.copy(self.constrained_indices))):
            new_structures = xtb_metadyn_augmentation(
                structure, self.atomnos, constrained_indices=constraints,
                new_structures=5, title=s)
            self.structures = np.concatenate(
                (self.structures, new_structures))
            self.energies = np.concatenate(
                (self.energies, [0 for _ in new_structures]))
            self.constrained_indices = np.concatenate(
                (self.constrained_indices,
                 [constraints for _ in new_structures]))

        self.exit_status = np.ones(len(self.structures), dtype=bool)
        self.log(f'Metadynamics augmentation completed - found '
                 f'{len(self.structures) - before} new conformers '
                 f'({time_to_string(time.perf_counter() - t_start)})\n')

    def csearch_augmentation(self, text='', max_structs=1000):
        '''HB-preserving random torsional augmentation of every candidate
        (reference embedder.py:1893-1948).'''
        from tscode_tpu.errors import SegmentedGraphError
        from tscode_tpu.torsions import csearch

        self.log(f'--> Performing conformational augmentation of TS '
                 f'candidates {text}')
        before = len(self.structures)
        t_start = time.perf_counter()
        n_out = 100 if len(self.structures) * 100 < max_structs else \
            round(max_structs / len(self.structures))
        n_out = max(1, n_out)

        for s, (structure, constraints) in enumerate(zip(
                np.copy(self.structures),
                np.copy(self.constrained_indices))):
            try:
                new_structures = csearch(
                    structure, self.atomnos,
                    constrained_indices=constraints, keep_hb=True, mode=2,
                    n_out=n_out, title=f'Candidate_{s + 1}',
                    logfunction=lambda *_a, **_k: None)
            except SegmentedGraphError:
                new_structures = []

            if len(new_structures) != 0:
                self.structures = np.concatenate(
                    (self.structures, new_structures))
                self.energies = np.concatenate(
                    (self.energies, [1e10 for _ in new_structures]))
                self.constrained_indices = np.concatenate(
                    (self.constrained_indices,
                     [constraints for _ in new_structures]))

        self.exit_status = np.ones(len(self.structures), dtype=bool)
        self.similarity_refining(rmsd=False)
        self.log(f'Conformational augmentation completed - generated '
                 f'{len(self.structures) - before} new conformers '
                 f'({time_to_string(time.perf_counter() - t_start)})\n')

    def csearch_augmentation_routine(self):
        '''Up to 3 augmentation+FF rounds, stopping after 2 without a new
        minimum (reference embedder.py:1950-1983).'''
        if not self.options.csearch_aug:
            return
        null_runs = 0
        for i in range(3):
            min_e = np.min(self.energies)
            self.csearch_augmentation(text=f'(step {i + 1}/3)',
                                      max_structs=self.options.max_confs)
            self.force_field_refining()
            if np.min(self.energies) < min_e:
                delta = min_e - np.min(self.energies)
                self.log(f'--> Lower minima found: {round(delta, 2)} '
                         f'kcal/mol below previous best\n')
            else:
                self.log('--> No new minima found.\n')
                null_runs += 1
            if null_runs == 2:
                break

    @_timed_stage
    def saddle_refining(self):
        '''First-order saddle refinement of every candidate via the
        dimer method — on the run's QM surface when a calculator is
        configured (the reference uses Sella + the run calculator,
        embedder.py:1985-2051), on the internal FF otherwise.'''
        if self.options.calculator is not None:
            self.log(f'--> Saddle refinement (dimer method, '
                     f'{self.options.theory_level} via '
                     f'{self.options.calculator})')
            from tscode_tpu.calculators.gradients import make_gradient_fn
            from tscode_tpu.saddle import dimer_saddle_callback
            grad_fn = make_gradient_fn(
                self.atomnos, calculator=self.options.calculator,
                method=self.options.theory_level,
                solvent=self.options.solvent,
                charge=self.options.charge, procs=self.procs)

            new_structures, statuses = [], []
            for i, structure in enumerate(self.structures):
                c, e, ok = dimer_saddle_callback(structure, grad_fn)
                new_structures.append(np.asarray(c))
                statuses.append(bool(ok))
                self.energies[i] = float(e)
        else:
            self.log('--> Saddle refinement (dimer method, internal FF)')
            from tscode_tpu.ff import (build_ff_params, merge_ff_params,
                                       params_to_device)
            from tscode_tpu.saddle import _ff_energy_single, dimer_saddle

            offsets = np.cumsum(
                [0] + [len(g.nodes) for g in self.graphs])[:-1]
            params_list = []
            pos = 0
            for g in self.graphs:
                n_at = len(g.nodes)
                params_list.append(build_ff_params(
                    self.structures[0][pos:pos + n_at],
                    self.atomnos[pos:pos + n_at], g))
                pos += n_at
            params = params_to_device(merge_ff_params(params_list,
                                                      offsets))

            new_structures, statuses = [], []
            for i, structure in enumerate(self.structures):
                # params flow through energy_args: one compiled dimer
                # program serves every structure
                c, e, ok = dimer_saddle(jnp.asarray(structure),
                                        _ff_energy_single,
                                        energy_args=(params,))
                new_structures.append(np.asarray(c))
                statuses.append(bool(ok))
                self.energies[i] = float(e)

        self.structures = np.array(new_structures)
        self.exit_status = np.array(statuses)
        self.log(f'Saddle-refined {int(np.sum(self.exit_status))}/'
                 f'{len(self.structures)} candidates\n')
        self.similarity_refining()
        self.write_structures('saddle', energies=True)

    # ------------------------------------------------- optimization hooks

    @_timed_stage
    def force_field_refining(self, conv_thr='tight',
                             only_fixed_constraints=False,
                             prevent_scrambling=False):
        from tscode_tpu.optimization import force_field_refine
        force_field_refine(self, conv_thr=conv_thr,
                           only_fixed_constraints=only_fixed_constraints,
                           prevent_scrambling=prevent_scrambling)

    @_timed_stage
    def optimization_refining(self, conv_thr='tight', maxiter=None,
                              only_fixed_constraints=False):
        from tscode_tpu.optimization import optimization_refine
        optimization_refine(self, conv_thr=conv_thr, maxiter=maxiter,
                            only_fixed_constraints=only_fixed_constraints)

    # ------------------------------------------------------------ resume

    RESUME_STAGES = ('generated', 'pruned', 'ff_pre', 'ff_loose',
                     'ff_tight', 'opt_loose', 'opt_tight')

    def save_resume(self, stage):
        '''Persist the run state so an interrupted run can continue
        (the reference only ever wrote forward checkpoints; its
        -r/--restart flag was never implemented, __main__.py:104-111).'''
        import pickle
        state = {
            'stage': stage,
            'structures': self.structures,
            'energies': getattr(self, 'energies', None),
            'constrained_indices': self.constrained_indices,
            'exit_status': getattr(self, 'exit_status', None),
            'atomnos': self.atomnos,
            'embed': self.embed,
            'kw_line': self.kw_line,
        }
        with open(f'tscode_resume_{self.stamp}.pkl', 'wb') as f:
            pickle.dump(state, f)

    def load_resume(self, path):
        '''Restore array state; returns the completed stage name.'''
        import pickle
        with open(path, 'rb') as f:
            state = pickle.load(f)
        if state['embed'] != self.embed:
            raise InputError(
                f'Resume file embed type {state["embed"]!r} does not '
                f'match this input ({self.embed!r}).')
        self.structures = state['structures']
        self.constrained_indices = state['constrained_indices']
        self.atomnos = state['atomnos']
        if state['energies'] is not None:
            self.energies = state['energies']
        if state['exit_status'] is not None:
            self.exit_status = state['exit_status']
        # embed graph must be rebuilt (not picklable with attributes)
        additional_bonds = self.constrained_indices[0] if \
            len(self.constrained_indices) else []
        if len(self.internal_constraints) > 0 and len(additional_bonds):
            additional_bonds = np.concatenate(
                (self.internal_constraints, additional_bonds))
        self.embed_graph = get_sum_graph(self.graphs, additional_bonds)
        self.log(f'--> Resumed {len(self.structures)} structures from '
                 f'{path} (completed stage: {state["stage"]})')
        return state['stage']

    def _stage_done(self, stage):
        if self.resume_stage is None:
            return False
        return self.RESUME_STAGES.index(stage) <= \
            self.RESUME_STAGES.index(self.resume_stage)

    # --------------------------------------------------------------- run

    def run(self, resume_from=None):
        '''(reference embedder.py:2244-2379)'''
        self.resume_stage = None
        if resume_from is not None:
            self.resume_stage = self.load_resume(resume_from)
        self.write_mol_info()

        if self.embed is None:
            self.log('--> No embed requested, exiting.\n')
            self.normal_termination()
            return

        if self.embed == 'error':
            self.log('--> Embed type not recognized, exiting.\n')
            self.normal_termination()
            return

        if self.embed == 'data':
            self.data_termination()
            return

        if not self.options.let and \
                self.embed in ('cyclical', 'chelotropic') and \
                max(mol.n_confs for mol in self.objects) > 100 and \
                not self.options.rigid:
            self.options.rigid = True
            self.log('--> Large embed: RIGID keyword added for efficiency '
                     '(override with LET)')

        self.write_options()

        if self.options.dryrun:
            self.log('\n--> Dry run requested: exiting.')
            self.normal_termination()
            return

        try:
            if not self._stage_done('generated'):
                self.generate_candidates()
                self.save_resume('generated')

            if self.options.bypass:
                self.write_structures('unoptimized', energies=False)
                self.normal_termination()
                return

            if not self._stage_done('pruned'):
                self.compenetration_refining()
                self.similarity_refining(
                    rmsd=(self.embed == 'refine'), verbose=True)
                self.save_resume('pruned')

            if self.options.optimization:
                if self.options.ff_opt:
                    if len(self.objects) > 1 and \
                            self.options.ff_calc == 'XTB' and \
                            not self._stage_done('ff_pre'):
                        self.force_field_refining(conv_thr='loose',
                                                  prevent_scrambling=True)
                        self.save_resume('ff_pre')
                    if not self._stage_done('ff_loose'):
                        self.force_field_refining(conv_thr='loose')
                        self.save_resume('ff_loose')
                    if not self._stage_done('ff_tight'):
                        self.force_field_refining(
                            conv_thr='tight', only_fixed_constraints=True)
                        self.save_resume('ff_tight')

                if not (self.options.ff_opt and
                        self.options.theory_level == getattr(
                            self.options, 'ff_level', None)):
                    if self.options.calculator == 'ORCA' and \
                            not self._stage_done('opt_loose'):
                        # stepwise ensemble pruning for expensive levels
                        # (reference embedder.py:2313-2323)
                        self.log('--> Performing ORCA optimization '
                                 '(3 iterations, step 1/3)\n')
                        self.optimization_refining(maxiter=3)
                        self.log('--> Performing ORCA optimization '
                                 '(5 iterations, step 2/3)\n')
                        self.optimization_refining(maxiter=5)
                        self.log('--> Performing ORCA optimization '
                                 '(convergence, step 3/3)\n')
                    if not self._stage_done('opt_loose'):
                        self.optimization_refining(conv_thr='loose')
                        self.save_resume('opt_loose')
                    if not self._stage_done('opt_tight'):
                        self.optimization_refining(
                            conv_thr='tight', only_fixed_constraints=True)
                        self.save_resume('opt_tight')
            else:
                self.write_structures('unoptimized', energies=False)

        except ZeroCandidatesError:
            t_end_run = time.perf_counter()
            s = ('    Every embedded pose was discarded along the way. '
                 'First double-check the reactive indices and letter '
                 'pairings in the input; if those are right, some knobs '
                 'worth turning:\n'
                 '    - SHRINK pulls orbital centers outward, which helps '
                 'when the compenetration check rejects everything (see '
                 'the docs).\n'
                 '    - Widening the pairing distances with DIST gives the '
                 'fragments more room for the same reason.\n'
                 '    - SOLVENT can rescue candidates that die at the '
                 'fitness check.\n'
                 '    - CLASHES relaxes the clash-rejection thresholds '
                 'directly.\n'
                 '    - Higher STEPS and ROTRANGE values simply generate a '
                 'larger starting pool.\n')
            self.log(f'\n--> Program termination: No candidates found - '
                     f'Total time '
                     f'{time_to_string(t_end_run - self.t_start_run)}')
            self.log(s)
            self.logfile.close()
            clean_directory()
            return

        if self.options.metadynamics:
            self.metadynamics_augmentation()
            self.optimization_refining()
            self.similarity_refining()

        self.csearch_augmentation_routine()

        if self.options.saddle:
            self.saddle_refining()

        if self.options.nci and self.options.optimization:
            from tscode_tpu.nci import print_nci
            print_nci(self)

        self.log_warnings()
        self.normal_termination()

    def data_termination(self):
        '''pka>/scan> runs show data instead of embedding
        (reference embedder.py:2381-2393).'''
        # per-molecule operator names only (the full input lines in
        # options.operators would double-count and match filenames)
        ops = [op.split('>')[0].strip()
               for mol_ops in self.options.operators_dict.values()
               for op in mol_ops]
        if any(op == 'pka' for op in ops):
            self.pka_termination()
        if len([op for op in ops if op == 'scan']) > 1:
            self.scan_termination()
        self.log('--> Data run (pka>/scan>) complete.\n')
        self.normal_termination()

    def pka_termination(self):
        '''Formatted pKa ladder for every pka> molecule: free-energy
        legs, and absolute pKas vs the PKA(mol)=n reference when given
        (reference embedder.py:2395-2449).'''
        self.log('\n--> pKa energetics (from best conformers)')
        solv = self.options.solvent or 'gas phase'

        rows = [(mol.rootname,
                 f'{mol.reactive_indices[0]}'
                 f'({SYMBOLS[mol.atomnos[mol.reactive_indices[0]]]})',
                 mol.pka_data[0], round(mol.pka_data[1], 3))
                for mol in self.objects if hasattr(mol, 'pka_data')]
        headers = ['Name', '#(Symb)', 'Process', 'Energy (kcal/mol)']

        if hasattr(self, 'pka_ref'):
            dg_ref = next(mol.pka_data[1] for mol in self.objects
                          if mol.name == self.pka_ref[0])
            rt_ln10 = np.log(10) * 1.9872036e-3 * 298.15
            headers.append(f'pKa ({solv}, 298.15 K)')
            rows = [row + (round(
                ((mol.pka_data[1] - dg_ref) if 'HA' in mol.pka_data[0]
                 else (dg_ref - mol.pka_data[1])) / rt_ln10
                + self.pka_ref[1], 3),)
                for row, mol in zip(rows, (
                    m for m in self.objects if hasattr(m, 'pka_data')))]

        widths = [max(len(str(r[c])) for r in rows + [tuple(headers)])
                  for c in range(len(headers))]
        fmt = ' | '.join(f'{{:<{w}}}' for w in widths)
        self.log('    ' + fmt.format(*headers))
        self.log('    ' + '-+-'.join('-' * w for w in widths))
        for row in rows:
            self.log('    ' + fmt.format(*row))

        if self.options.theory_level is not None:
            self.log(f'\n  Level used is {self.options.theory_level} via '
                     f'{self.options.calculator}' +
                     (f', using the ALPB solvation model for '
                      f'{self.options.solvent}'
                      if self.options.solvent is not None else ''))

        # acid/base pair: report the proton-transfer equilibrium
        with_data = [m for m in self.objects if hasattr(m, 'pka_data')]
        if len(with_data) == 2:
            tags = tuple(m.pka_data[0] for m in with_data)
            if 'HA -> A-' in tags and 'B -> BH+' in tags:
                dg = sum(m.pka_data[1] for m in with_data)
                k_eq = np.exp(-dg / (1.9872036e-3 * 298.15))
                self.log(f'\n  Equilibrium data:')
                self.log(f'    HA + B -> BH+ + A-    '
                         f'K({solv}, 298.15 K) = {round(k_eq, 3)}')
                self.log(f'                         '
                         f'dG({solv}, 298.15 K) = {round(dg, 3)} kcal/mol')

    def scan_termination(self):
        '''Cumulative scan plot across every scan> molecule
        (reference embedder.py:2451-2475).'''
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        plt.figure()
        for mol in self.objects:
            if hasattr(mol, 'scan_data'):
                plt.plot(*mol.scan_data, label=mol.rootname)
        plt.legend()
        plt.title('Unified scan energetics')
        plt.xlabel('Distance (A)')
        plt.gca().invert_xaxis()
        plt.ylabel('Rel. E. (kcal/mol)')
        plt.savefig(f'{self.stamp}_cumulative_plt.svg')
        plt.close()
        self.log(f'\n--> Written cumulative scan plot at '
                 f'{self.stamp}_cumulative_plt.svg')
