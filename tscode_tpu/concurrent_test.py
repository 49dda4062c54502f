'''
Proc/thread tuning benchmark (`python -m tscode_tpu input.xyz -b`).

The reference grid-searches procs x threads for xtb jobs under a process
pool (/root/reference/tscode/concurrent_test.py:16-105). Same idea here
over the threaded dispatch queue; without xtb on PATH it benchmarks the
internal-FF batched optimizer instead (which is what replaces per-
structure FF jobs on TPU anyway).
'''

import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from tscode_tpu.settings import XTB_AVAILABLE


def run_concurrent_test(filename, n_structures=8):
    from tscode_tpu.io_xyz import read_xyz
    data = read_xyz(filename)
    coords, atomnos = data.atomcoords[0], data.atomnos
    print(f'--> Concurrency benchmark on {filename} '
          f'({len(atomnos)} atoms, {n_structures} jobs per point)\n')

    rng = np.random.default_rng(0)
    jobs = [coords + rng.normal(size=coords.shape) * 0.05
            for _ in range(n_structures)]

    if XTB_AVAILABLE:
        from tscode_tpu.calculators.xtb import xtb_opt
        results = {}
        for procs in (1, 2, 4):
            for threads in (1, 2, 4, 8):
                t0 = time.perf_counter()
                with ThreadPoolExecutor(max_workers=threads) as ex:
                    futs = [ex.submit(xtb_opt, j, atomnos,
                                      method='GFN-FF', procs=procs,
                                      title=f'bench_{i}')
                            for i, j in enumerate(jobs)]
                    for f in futs:
                        f.result()
                dt = time.perf_counter() - t0
                results[(procs, threads)] = dt
                print(f'    procs={procs} threads={threads}: '
                      f'{dt / n_structures:.2f} s/structure')
        best = min(results, key=results.get)
        print(f'\n--> Recommended: --procs {best[0]} --threads {best[1]}')
    else:
        print('    xtb not found: benchmarking the internal-FF batched '
              'optimizer instead\n')
        from tscode_tpu.backend import ensure_backend
        ensure_backend(quiet=True)
        import jax.numpy as jnp
        from tscode_tpu.ff import build_ff_params, ff_energy, params_to_device
        from tscode_tpu.graphs import graphize
        from tscode_tpu.optimizers import fire_minimize_batch

        graph = graphize(coords, atomnos)
        params = params_to_device(build_ff_params(coords, atomnos, graph))

        def energy(c, p):
            return ff_energy(c, p)

        for batch in (8, 64, 512):
            batch_jobs = jnp.asarray(
                np.array([coords + rng.normal(size=coords.shape) * 0.05
                          for _ in range(batch)]))
            # warm compile
            fire_minimize_batch(batch_jobs, energy, n_steps=200,
                                energy_args=(params,))[0].block_until_ready()
            t0 = time.perf_counter()
            fire_minimize_batch(batch_jobs, energy, n_steps=200,
                                energy_args=(params,))[0].block_until_ready()
            dt = time.perf_counter() - t0
            print(f'    batch={batch:4}: {dt:.2f} s total, '
                  f'{dt / batch * 1000:.1f} ms/structure')
        print('\n--> Larger batches amortize better on the accelerator; '
              'size to your ensemble.')
