'''Driver entry points (__graft_entry__) regression checks: entry()
must stay jittable with numpy-only example args, and dryrun_multichip
must compile + execute the full sharded step on the virtual 8-device
mesh the conftest provides.'''

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_is_jittable_with_numpy_args():
    import __graft_entry__ as g

    fn, args = g.entry()
    # arg construction must not have touched the device (a wedged tunnel
    # would hang there) — every array arg is plain numpy
    for a in args:
        assert not hasattr(a, 'addressable_shards'), type(a)

    out = jax.jit(fn)(*args)
    poses, ok, tfps = out[0], out[1], out[2]
    assert poses.shape[0] == ok.shape[0]
    assert np.isfinite(np.asarray(poses)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    assert len(jax.devices()) >= 8, 'conftest virtual mesh missing'
    g.dryrun_multichip(8)          # asserts internally


def test_dryrun_multichip_2():
    '''Smaller mesh: shard shapes change, collectives must still close.'''
    import __graft_entry__ as g

    g.dryrun_multichip(2)


def test_health_probe_resolves_cpu_under_test_env():
    '''health() runs a real subprocess probe; under the test env
    (JAX_PLATFORMS=cpu inherited from conftest) it must come back ok
    on the CPU backend well inside the timeout.'''
    import __graft_entry__ as g

    h = g.health(timeout_s=240)
    assert h['ok'], h
    assert h['backend'] == 'cpu'
    assert h['seconds'] < 240
