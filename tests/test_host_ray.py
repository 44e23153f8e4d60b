"""HostRay backend against a fake (synchronous) ray: exercises the
actor protocol, per-future kind tracking, env-pool ray.wait path, and
equivalence with HostSerial (reference vector.py:449-574). ray is not
installed in this image."""
import sys
import types

import numpy as np
import pytest

import gymnasium


class _FakeFuture:
    _counter = [0]

    def __init__(self, value):
        self.value = value
        _FakeFuture._counter[0] += 1
        self.order = _FakeFuture._counter[0]


class _FakeMethod:
    def __init__(self, method):
        self._method = method

    def remote(self, *args, **kwargs):
        return _FakeFuture(self._method(*args, **kwargs))


class _FakeActor:
    def __init__(self, obj):
        self._obj = obj

    def __getattr__(self, name):
        return _FakeMethod(getattr(self._obj, name))


class _FakeRemoteClass:
    def __init__(self, cls):
        self._cls = cls

    def remote(self, *args, **kwargs):
        return _FakeActor(self._cls(*args, **kwargs))


def _install_fake_ray(monkeypatch):
    ray = types.ModuleType('ray')
    ray.is_initialized = lambda: True
    ray.init = lambda **kw: None
    ray.kill = lambda actor: None
    ray.remote = lambda cls: _FakeRemoteClass(cls)
    ray.get = lambda futures: [f.value for f in futures] \
        if isinstance(futures, list) else futures.value
    ray.wait = lambda futures, num_returns=1: (
        sorted(futures, key=lambda f: f.order)[:num_returns],
        sorted(futures, key=lambda f: f.order)[num_returns:])
    monkeypatch.setitem(sys.modules, 'ray', ray)
    return ray


class CountingEnv(gymnasium.Env):
    """Deterministic counter env for cross-backend equivalence."""
    observation_space = gymnasium.spaces.Box(0, 1000, (2,), np.float32)
    action_space = gymnasium.spaces.Discrete(2)
    render_mode = None

    def __init__(self):
        self.t = 0

    def reset(self, seed=None, options=None):
        self.t = 0 if seed is None else seed % 5
        return np.array([self.t, 0], np.float32), {}

    def step(self, action):
        self.t += 1
        done = self.t % 4 == 0
        return (np.array([self.t, float(action)], np.float32),
            float(self.t), done, False, {})


def _creator():
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    return GymnasiumPufferEnv(env=CountingEnv())


def test_host_ray_sync_matches_serial(monkeypatch):
    _install_fake_ray(monkeypatch)
    from pufferlib_tpu import vector_host

    ray_vec = vector_host.make(_creator, num_envs=4,
        backend=vector_host.HostRay)
    ser_vec = vector_host.make(_creator, num_envs=4,
        backend=vector_host.HostSerial)
    obs_r, _ = ray_vec.reset(seed=7)
    obs_s, _ = ser_vec.reset(seed=7)
    assert np.allclose(obs_r, obs_s)
    rng = np.random.RandomState(0)
    for _ in range(6):
        atn = rng.randint(0, 2, 4)
        o_r, r_r, t_r, _, _ = ray_vec.step(atn)[:5]
        o_s, r_s, t_s, _, _ = ser_vec.step(atn)[:5]
        assert np.allclose(o_r, o_s)
        assert np.allclose(r_r, r_s)
        assert np.array_equal(np.asarray(t_r), np.asarray(t_s))
    ray_vec.close()
    ser_vec.close()


def test_host_ray_env_pool(monkeypatch):
    """batch_size < num_envs: ray.wait returns first-ready workers and
    agent_ids map back to the right rows."""
    _install_fake_ray(monkeypatch)
    from pufferlib_tpu import vector_host

    vec = vector_host.make(_creator, num_envs=4, num_workers=4,
        batch_size=2, backend=vector_host.HostRay)
    vec.async_reset(seed=0)
    obs, rew, term, trunc, infos, agent_ids, mask = vec.recv()
    assert obs.shape == (2, 2)
    assert len(agent_ids) == 2
    vec.send(np.zeros(2, np.int64))
    obs2, rew2, *_, agent_ids2, _ = vec.recv()
    assert obs2.shape == (2, 2)
    vec.close()
