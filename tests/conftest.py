'''
Test configuration: force an 8-device virtual CPU platform (so sharding
tests exercise a real multi-device mesh without TPU hardware) and enable
x64 so geometry parity can be checked at 1e-6 A.
'''

import os

# hard override: the host sitecustomize registers the axon TPU tunnel in
# every interpreter and forces the platform via jax config, so the env var
# alone is not enough — parity tests need f64 and must run on CPU.
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

# single-core CI box: persistent compilation cache makes re-runs cheap.
# The dir is keyed by host CPU signature: XLA:CPU cache entries are AOT
# executables tied to the compile host's features, and a migrated image
# reloading a previous host's entries logs errors / risks SIGILL.
from tscode_tpu.backend import host_cache_tag  # noqa: E402

jax.config.update('jax_compilation_cache_dir',
                  f'/root/.jax_test_cache-{host_cache_tag()}')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
