'''
JAX backend initialization with graceful fallback.

The deployment environment may pin JAX_PLATFORMS to an experimental TPU
plugin whose registration can fail per-process (e.g. a busy tunnel).
`ensure_backend()` probes the configured platform once and falls back to
CPU instead of crashing the run. On CPU it also enables x64 so the
geometry paths hold 1e-6 A parity; on TPU the default f32 is kept for
screening throughput (pruning decisions are mask-identical at f32 for
the thresholds involved — 0.5 A RMSD, 1.5 A clash).
'''

import os

_initialized = False


def host_cache_tag():
    '''Short signature of the host CPU, appended to compile-cache dirs.

    XLA:CPU persistent-cache entries are AOT executables that embed the
    COMPILE-TIME target config; loading them under a different target
    logs "machine type doesn't match" errors and can SIGILL. Two skews
    produce that: (a) a container image migrating between hosts with
    different CPUs, and (b) the same host under a different jaxlib —
    XLA's LLVM layer injects tuning pseudo-features (e.g.
    prefer-no-scatter) that change across builds, observed when a
    newer image loaded a previous round's entries. Key the directory
    by CPU signature AND jaxlib version so each (host, toolchain)
    pair gets its own cache.'''
    import hashlib
    try:
        with open('/proc/cpuinfo') as f:
            lines = f.read().splitlines()
        sig = '|'.join(sorted({ln for ln in lines
                               if ln.startswith(('model name', 'flags'))}))
    except OSError:
        import platform
        sig = platform.processor() or platform.machine()
    try:
        import jaxlib.version
        sig += '|jaxlib=' + jaxlib.version.__version__
    except Exception:
        pass
    return hashlib.sha1(sig.encode()).hexdigest()[:8]


def ensure_backend(prefer=None, quiet=False):
    '''Initialize JAX, falling back to CPU when the configured platform
    cannot start. Returns the active backend name.'''
    global _initialized
    import jax

    if prefer is None:
        # the deployment sitecustomize re-points jax_platforms to the
        # accelerator AT REGISTRATION TIME, overriding the env var — a
        # JAX_PLATFORMS=cpu process would still try (and, on a wedged
        # tunnel, hang) to initialize the accelerator unless the config
        # is re-asserted here, after that registration
        prefer = os.environ.get('JAX_PLATFORMS') or None
    if prefer is not None:
        if prefer != 'cpu' and 'cpu' not in prefer.split(','):
            # register the LOCAL CPU backend alongside the accelerator:
            # tiny one-off relaxations (bending, single-structure FIRE)
            # are latency-bound, and a local CPU call costs ~0.02 ms vs
            # ~40 ms per round trip over a tunneled accelerator (the
            # accelerator stays first in the list = default backend)
            prefer = prefer + ',cpu'
        jax.config.update('jax_platforms', prefer)

    try:
        backend = jax.default_backend()
    except RuntimeError as e:
        if not quiet:
            print(f'--> JAX platform '
                  f'{os.environ.get("JAX_PLATFORMS", "?")!r} failed to '
                  f'initialize ({str(e).splitlines()[0]}); falling back to CPU.')
        jax.config.update('jax_platforms', 'cpu')
        backend = jax.default_backend()

    if backend == 'cpu' and not jax.config.jax_enable_x64:
        jax.config.update('jax_enable_x64', True)

    # persistent compilation cache: compiles can be expensive (remote
    # compile over a device tunnel); cache them across processes
    if not jax.config.jax_compilation_cache_dir:
        cache_dir = os.environ.get(
            'TSCODE_TPU_CACHE',
            os.path.join(os.path.expanduser('~'),
                         f'.tscode_tpu_jax_cache-{host_cache_tag()}'))
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    _initialized = True
    return backend


def local_device_ctx():
    '''Fresh context manager pinning eager ops and tiny device programs
    (a one-structure FIRE relaxation, a scalar dihedral evaluation) to
    the LOCAL CPU backend when the default device is a tunneled
    accelerator: host-sequential loops pay one dispatch + one pull per
    iteration — ~40 ms of pure latency remotely vs ~0.02 ms locally
    (the math itself is microseconds either way). Returns a new context
    manager per call (jax config contexts are not reentrant). No-op
    when no CPU backend is registered or CPU is already the default.'''
    import contextlib

    import jax
    dev = small_job_device()
    return (jax.default_device(dev) if dev is not None
            else contextlib.nullcontext())


def small_job_device():
    '''The local CPU device for tiny one-off device programs (a bend
    relaxation, a single-structure FIRE): on a tunneled accelerator
    every dispatch/pull pays ~tens of ms of network latency, so
    latency-bound micro-jobs run locally. Returns None when no CPU
    backend is registered (callers fall back to the default device) or
    when CPU IS the default (nothing to gain).'''
    import jax
    try:
        if jax.default_backend() == 'cpu':
            return None
        return jax.devices('cpu')[0]
    except RuntimeError:
        return None


def subprocess_probe(timeout_s=120):
    '''Warm-link probe (`ensure_backend` + `float(jnp.sum(jnp.ones(8)))`)
    in a SUBPROCESS with a hard timeout — a wedged device tunnel blocks
    inside PJRT init, which is not catchable in-process. Shared by the
    driver health entry (__graft_entry__.health) and the benchmark's
    backend acquisition. Returns
    {"ok": bool, "backend": str|None, "seconds": float, "detail": str};
    a timeout (tunnel wedged) is distinguishable from a crash (broken
    code, rc + stderr tail in "detail").'''
    import subprocess
    import sys
    import time

    code = (
        "from tscode_tpu.backend import ensure_backend\n"
        "backend = ensure_backend(quiet=True)\n"
        "import jax.numpy as jnp\n"
        "assert float(jnp.sum(jnp.ones(8))) == 8.0\n"
        "print('PROBE_OK', backend)\n")
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env['PYTHONPATH'] = (pkg_parent + os.pathsep
                         + env.get('PYTHONPATH', ''))
    t0 = time.perf_counter()
    try:
        r = subprocess.run([sys.executable, '-c', code], env=env,
                           capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {'ok': False, 'backend': None,
                'seconds': time.perf_counter() - t0,
                'detail': f'probe timed out after {timeout_s}s '
                          '(tunnel wedged?)'}
    dt = time.perf_counter() - t0
    for line in r.stdout.splitlines():
        if line.startswith('PROBE_OK'):
            return {'ok': True, 'backend': line.split()[1],
                    'seconds': dt, 'detail': 'warm-link probe passed'}
    return {'ok': False, 'backend': None, 'seconds': dt,
            'detail': f'probe rc={r.returncode}: '
                      f'{(r.stderr or r.stdout).strip()[-400:]}'}
