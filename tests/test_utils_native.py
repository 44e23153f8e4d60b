"""Direct coverage for utils (reference pufferlib/utils.py contracts:
Profiler, @profile, Suppress, unroll_nested_dict, compare_space_samples,
get_init_args) and the C++ envpool driver core (csrc/envpool.cpp via
native.py: wait_ready spin semantics, slab gather/scatter)."""
import os
import time

import numpy as np
import pytest

from pufferlib_tpu import utils


def test_profiler_times_and_counts():
    p = utils.Profiler()
    with p:
        time.sleep(0.02)
    with p:
        time.sleep(0.01)
    assert p.calls == 2
    assert 0.025 < p.elapsed < 0.5
    assert p.prev <= p.elapsed


def test_profile_decorator_populates_timers():
    class Thing:
        @utils.profile
        def work(self):
            time.sleep(0.01)
            return 42

    t = Thing()
    assert t.work() == 42
    assert t.work() == 42
    assert 'work' in t._timers
    assert t._timers['work'].calls == 2


def test_suppress_swallows_python_and_c_output(capfd):
    """Reference tests/test_utils.py contract: fd-level silencing."""
    with utils.Suppress():
        print('python noise')
        os.write(1, b'c-level noise\n')
        os.write(2, b'c-level err\n')
    print('visible')
    out, err = capfd.readouterr()
    assert 'noise' not in out and 'noise' not in err
    assert 'visible' in out


def test_unroll_nested_dict():
    nested = {'a': {'b': 1, 'c': {'d': 2}}, 'e': 3}
    flat = dict(utils.unroll_nested_dict(nested))
    assert flat == {'a/b': 1, 'a/c/d': 2, 'e': 3}


def test_get_init_args():
    def creator(foo=3, bar='x', **kw):
        pass
    args = utils.get_init_args(creator)
    assert args == {'foo': 3, 'bar': 'x'}


def test_compare_space_samples():
    a = {'x': np.ones(3, np.float32), 'y': (np.int32(2), np.zeros(2))}
    b = {'x': np.ones(3, np.float32), 'y': (np.int32(2), np.zeros(2))}
    assert utils.compare_space_samples(a, b)
    b['x'] = np.zeros(3, np.float32)
    assert not utils.compare_space_samples(a, b)


# --------------------------------------------------------------------------
# native C++ core

def _lib():
    from pufferlib_tpu import native
    lib = native.load()
    if lib is None:
        pytest.skip('no C++ toolchain available')
    return lib


def test_wait_ready_immediate_and_order():
    from pufferlib_tpu import native
    lib = _lib()
    sem = np.array([5, 0, 6, 0], np.uint8)  # MAIN=5, INFO=6 are ready
    ready = native.wait_ready(lib, sem,
        np.arange(4, dtype=np.int32), needed=2, timeout_us=1_000_000)
    assert sorted(ready.tolist()) == [0, 2]


def test_wait_ready_timeout():
    from pufferlib_tpu import native
    lib = _lib()
    sem = np.zeros(2, np.uint8)
    with pytest.raises(TimeoutError):
        native.wait_ready(lib, sem, np.arange(2, dtype=np.int32),
            needed=1, timeout_us=50_000, spin_us=0)


def test_gather_and_scatter_rows():
    from pufferlib_tpu import native
    lib = _lib()
    src = np.arange(6 * 4, dtype=np.uint8).reshape(6, 4)
    dst = np.zeros((3, 4), np.uint8)
    native.gather_rows(lib, src, dst, np.array([4, 0, 2]), row_bytes=4)
    assert np.array_equal(dst, src[[4, 0, 2]])

    back = np.zeros_like(src)
    native.scatter_rows(lib, dst, back, np.array([4, 0, 2]), row_bytes=4)
    assert np.array_equal(back[[4, 0, 2]], src[[4, 0, 2]])
    assert back[[1, 3, 5]].sum() == 0
