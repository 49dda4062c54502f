'''
CLI entry point: `python -m tscode_tpu input.txt [options]`
(reference /root/reference/tscode/__main__.py:49-119).
'''

import argparse
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog='tscode_tpu',
        description='TPU-native Transition State Conformational Docker')
    parser.add_argument('inputfile', nargs='?',
                        help='input file (.txt DSL)')
    parser.add_argument('-n', '--name', default=None,
                        help='custom name stamp for the run')
    parser.add_argument('-cl', '--command-line', dest='cl', default=None,
                        help='pass the input text directly on the command line')
    parser.add_argument('-t', '--test', action='store_true',
                        help='run installation smoke tests')
    parser.add_argument('-p', '--profile', action='store_true',
                        help='profile the run with cProfile')
    parser.add_argument('--procs', type=int, default=None,
                        help='cores per external QM job')
    parser.add_argument('--threads', type=int, default=None,
                        help='concurrent external QM jobs')
    parser.add_argument('-r', '--restart', default=None,
                        help='resume from a tscode_resume_*.pkl state file')
    parser.add_argument('-b', '--benchmark', action='store_true',
                        help='run the proc/thread tuning benchmark on the '
                             'input file')
    parser.add_argument('-s', '--setup', action='store_true',
                        help='guided calculator setup (writes overrides '
                             'to ~/.tscode_tpu_settings.json)')
    parser.add_argument('-c', '--cite', action='store_true',
                        help='print the literature citation and exit')
    parser.add_argument('--trace', metavar='DIR', default=None,
                        help='capture a JAX device profile of the run into '
                             'DIR (open with xprof/tensorboard); the device-'
                             'level analog of -p host profiling')
    args = parser.parse_args(argv)

    if args.cite:
        from tscode_tpu.references import references
        print(references['TSCoDe'])
        return 0

    if args.setup:
        from tscode_tpu.modify_settings import run_setup
        run_setup()
        return 0

    if args.test:
        from tscode_tpu.tests_install import run_tests
        run_tests()
        return 0

    if args.cl is not None:
        filename = os.path.abspath(f'tscode_tpu_cl_input.txt')
        with open(filename, 'w') as f:
            f.write(args.cl.replace(';', '\n') + '\n')
    elif args.inputfile is not None:
        filename = os.path.abspath(args.inputfile)
    else:
        parser.print_help()
        return 2

    if args.benchmark:
        from tscode_tpu.concurrent_test import run_concurrent_test
        run_concurrent_test(filename)
        return 0

    from tscode_tpu.embedder import Embedder

    def _run():
        embedder = Embedder(filename, stamp=args.name,
                            procs=args.procs, threads=args.threads)
        embedder.run(resume_from=args.restart)

    def _cprofile(fn):
        import cProfile
        import pstats
        with cProfile.Profile() as pr:
            fn()
        stats = pstats.Stats(pr)
        stats.sort_stats('cumtime').print_stats(30)

    if args.trace:
        # device-side tracing (reference only has host cProfile,
        # profiler.py:8-18; on TPU the interesting time is in XLA
        # programs, which the JAX profiler attributes per-op).
        # jax.profiler.trace resolves the backend, so the platform must
        # be pinned FIRST (the axon plugin registration is flaky and
        # ensure_backend handles the CPU fallback)
        from tscode_tpu.backend import ensure_backend
        ensure_backend(quiet=True)
        import jax
        with jax.profiler.trace(os.path.abspath(args.trace)):
            if args.profile:
                _cprofile(_run)
            else:
                _run()
    elif args.profile:
        _cprofile(_run)
    else:
        _run()

    return 0


if __name__ == '__main__':
    sys.exit(main())
