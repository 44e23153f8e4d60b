"""Host-env bridge: gymnasium wrapping + host vectorization backends
(reference tests/test.py emulation round-trips + vector equivalence)."""
import numpy as np
import pytest

gymnasium = pytest.importorskip('gymnasium')

from pufferlib_tpu import spaces
from pufferlib_tpu.exceptions import APIUsageError
from pufferlib_tpu.host_env import GymnasiumPufferEnv, PettingZooPufferEnv
from pufferlib_tpu import vector_host


def make_cartpole():
    return gymnasium.make('CartPole-v1')


class DictObsEnv(gymnasium.Env):
    """Mixed-dtype Dict obs + Dict action test env."""

    def __init__(self):
        self.observation_space = gymnasium.spaces.Dict({
            'image': gymnasium.spaces.Box(0, 255, (4, 4), np.uint8),
            'flat': gymnasium.spaces.Box(-1, 1, (3,), np.float32),
        })
        self.action_space = gymnasium.spaces.Dict({
            'a': gymnasium.spaces.Discrete(2),
            'b': gymnasium.spaces.Discrete(3),
        })
        self.tick = 0

    def reset(self, seed=None, options=None):
        self.tick = 0
        self.rng = np.random.RandomState(seed or 0)
        return self._obs(), {}

    def _obs(self):
        return {
            'image': self.rng.randint(0, 255, (4, 4)).astype(np.uint8),
            'flat': self.rng.uniform(-1, 1, 3).astype(np.float32),
        }

    def step(self, action):
        assert isinstance(action, dict) and set(action) == {'a', 'b'}
        self.tick += 1
        return self._obs(), 1.0, self.tick >= 3, False, {}


def test_gymnasium_wrapper_box_passthrough():
    env = GymnasiumPufferEnv(env=make_cartpole())
    obs, info = env.reset(seed=0)
    assert obs.shape == (4,)
    obs, rew, done, trunc, info = env.step(np.array([1]))
    assert obs.shape == (4,)


def test_gymnasium_wrapper_errors():
    env = GymnasiumPufferEnv(env=make_cartpole())
    with pytest.raises(APIUsageError):
        env.step(np.array([0]))  # step before reset
    env.reset(seed=0)
    done = False
    while not done:
        _, _, d, t, _ = env.step(np.array([0]))
        done = d or t
    with pytest.raises(APIUsageError):
        env.step(np.array([0]))  # step after done


def test_gymnasium_wrapper_dict_roundtrip():
    env = GymnasiumPufferEnv(env=DictObsEnv())
    obs, _ = env.reset(seed=1)
    assert obs.dtype == np.uint8  # mixed dtypes -> bytes
    assert isinstance(env.action_space, spaces.MultiDiscrete)
    # MultiDiscrete action nativizes back into the Dict action
    obs, rew, done, trunc, info = env.step(np.array([1, 2]))
    assert rew == 1.0


def test_host_serial_cartpole():
    vec = vector_host.make(make_cartpole, backend=vector_host.HostSerial,
        num_envs=4)
    obs, infos = vec.reset(seed=0)
    assert obs.shape == (4, 4)
    for _ in range(8):
        obs, rew, term, trunc, infos = vec.step(
            np.random.randint(0, 2, (4, 1)))
        assert obs.shape == (4, 4)
    vec.close()


def test_host_serial_autoreset():
    vec = vector_host.make(DictObsEnv,
        backend=vector_host.HostSerial, num_envs=2)
    vec.reset(seed=0)
    rews = []
    for _ in range(8):
        obs, rew, term, trunc, infos = vec.step(
            np.zeros((2, 2), np.int64))
        rews.append(rew.copy())
    # episodes are 3 steps; the reset step must report reward 0
    rews = np.stack(rews)
    assert (rews == 0).any() and (rews == 1).any()
    vec.close()


@pytest.mark.slow
def test_host_multiprocessing_matches_serial():
    """MP envpool returns the same data as Serial for deterministic
    envs (reference tests/test.py:104-160 contract)."""
    ser = vector_host.make(DictObsEnv,
        backend=vector_host.HostSerial, num_envs=2)
    mp = vector_host.make(DictObsEnv,
        backend=vector_host.HostMultiprocessing, num_envs=2,
        num_workers=2)
    obs_s, _ = ser.reset(seed=0)
    obs_m, _ = mp.reset(seed=0)
    assert np.array_equal(obs_s, obs_m)
    for _ in range(5):
        actions = np.zeros((2, 2), np.int64)
        os_, rs, ts, us, _ = ser.step(actions)
        om, rm, tm, um, _ = mp.step(actions)
        assert np.array_equal(os_, om)
        assert np.array_equal(rs, rm)
        assert np.array_equal(ts, tm)
    ser.close()
    mp.close()


@pytest.mark.slow
def test_restart_workers_recovers_from_crash(tmp_path, monkeypatch):
    """Elastic recovery (beyond the reference, which only fail-fasts —
    SURVEY.md aux): with restart_workers=N, a worker process that DIES
    mid-step is respawned over the same shared-memory slabs, its env
    slice re-seeded, and stepping continues. Budget exhaustion falls
    back to the fail-fast RuntimeError."""
    import functools
    from pufferlib_tpu.environments.test.host_fixtures import (
        GymnasiumCrashOnceEnv)

    monkeypatch.setenv('PUFFER_HOST_TIMEOUT_S', '3')
    creators = [
        functools.partial(GymnasiumCrashOnceEnv,
            sentinel=str(tmp_path / f'crashed_{i}'))
        for i in range(2)
    ]
    vec = vector_host.make(creators,
        backend=vector_host.HostMultiprocessing, num_envs=2,
        num_workers=2, restart_workers=2)
    obs, _ = vec.reset(seed=0)
    action = np.zeros((2, 1), np.int64) if len(
        np.shape(vec.single_action_space.sample())) else np.zeros(2, np.int64)
    # both workers os._exit on their 3rd step; the pool must recover
    # and keep serving batches
    saw_abort_trunc = False
    for _ in range(12):
        obs, rew, term, trunc, infos = vec.step(action)
        assert obs.shape[0] == 2
        # the revived workers' first batch must surface the aborted
        # episodes as zero-reward truncations (driver-side marking —
        # the worker's own reset clears the slab flags)
        if np.any(trunc):
            assert np.all(rew[np.asarray(trunc)] == 0.0)
            saw_abort_trunc = True
    assert saw_abort_trunc, 'aborted episodes never surfaced as truncations'
    assert vec._restarts_left == 0  # both respawns were consumed
    assert (tmp_path / 'crashed_0').exists()
    assert (tmp_path / 'crashed_1').exists()
    # envs stepped past the crash point after recovery
    assert float(np.max(obs)) >= 1.0
    vec.close()


@pytest.mark.slow
def test_restart_workers_envpool_mode(tmp_path, monkeypatch):
    """Envpool mode (batch < num_envs): a crashed worker never blocks a
    wait (live workers keep serving batches), so recovery must come from
    the periodic liveness sweep — its env slice has to rejoin the pool
    rather than silently dropping out of training."""
    import functools
    import time
    from pufferlib_tpu.environments.test.host_fixtures import (
        GymnasiumCrashOnceEnv)

    monkeypatch.setenv('PUFFER_HOST_TIMEOUT_S', '5')
    creators = [
        functools.partial(GymnasiumCrashOnceEnv,
            sentinel=str(tmp_path / f'crashed_{i}'))
        for i in range(4)
    ]
    vec = vector_host.make(creators,
        backend=vector_host.HostMultiprocessing, num_envs=4,
        num_workers=4, batch_size=2, restart_workers=4)
    vec.async_reset(seed=0)
    seen_workers = set()
    deadline = time.time() + 60
    while time.time() < deadline:
        obs, rew, term, trunc, infos, ids, masks = vec.recv()
        seen_workers.update(int(i) for i in ids)
        vec.send(np.zeros((len(ids), 1), np.int64))
        crashed = sum((tmp_path / f'crashed_{i}').exists()
            for i in range(4))
        if crashed == 4 and vec._restarts_left == 0:
            break
    # every worker crashed once and was revived
    assert vec._restarts_left == 0
    # all worker slices keep serving batches after their revival
    post = set()
    deadline = time.time() + 30
    while len(post) < 4 and time.time() < deadline:
        obs, rew, term, trunc, infos, ids, masks = vec.recv()
        post.update(int(i) // vec.agents_per_worker for i in ids)
        vec.send(np.zeros((len(ids), 1), np.int64))
    assert post == {0, 1, 2, 3}, post
    vec.close()


def test_first_contact_allowance_is_per_worker():
    """The generous spawn/import watchdog budget applies to each
    worker's FIRST wait: with batch < num_envs the fastest workers
    finishing import must not revoke the allowance for stragglers."""
    vec = vector_host.HostMultiprocessing.__new__(
        vector_host.HostMultiprocessing)
    vec._timeout_s = 30.0
    vec._first_timeout_s = 300.0
    vec._contacted = set()
    vec._spin_us = 0
    vec.workers_per_batch = 2
    vec.num_workers = 4
    vec.processes = []
    vec._restarts_left = 0
    vec._last_alive_check = 0.0

    timeouts = []

    class FakeNative:
        @staticmethod
        def wait_ready(lib, sem, cands, k, timeout_us, spin_us):
            timeouts.append(timeout_us)
            return np.asarray(cands[:k])

    vec._lib = object()
    vec._native = FakeNative
    vec.sem = [0, 0, 0, 0]
    assert vec._wait([0, 1]) == [0, 1]   # first contact for 0,1
    vec._wait([0, 1])                    # steady state for 0,1
    vec._wait([2, 3])                    # 2,3 still get the allowance
    vec._wait([2, 3])
    assert timeouts == [int(300e6), int(30e6), int(300e6), int(30e6)]
    assert vec._contacted == {0, 1, 2, 3}


def test_host_ray_gated():
    """HostRay mirrors the reference Ray backend (vector.py:449-574);
    without ray installed it must raise a clear ImportError."""
    try:
        import ray  # noqa: F401
        has_ray = True
    except ImportError:
        has_ray = False
    if not has_ray:
        import pytest
        with pytest.raises(ImportError, match='ray'):
            vector_host.make(DictObsEnv,
                backend=vector_host.HostRay, num_envs=2, num_workers=2)
        return
    rv = vector_host.make(DictObsEnv,
        backend=vector_host.HostRay, num_envs=2, num_workers=2)
    ser = vector_host.make(DictObsEnv,
        backend=vector_host.HostSerial, num_envs=2)
    obs_s, _ = ser.reset(seed=0)
    obs_r, _ = rv.reset(seed=0)
    assert np.array_equal(obs_s, obs_r)
    for _ in range(3):
        actions = np.zeros((2, 2), np.int64)
        os_, rs, *_ = ser.step(actions)
        orr, rr, *_ = rv.step(actions)
        assert np.array_equal(os_, orr)
        assert np.array_equal(rs, rr)
    ser.close()
    rv.close()


def test_pettingzoo_emulated_actions_not_broadcast():
    """Multi-component actions reach the env intact (regression: the
    structured-dtype cast broadcast component 0 to every leaf)."""
    import gymnasium
    from pufferlib_tpu.host_env import PettingZooPufferEnv

    got = {}

    class TupleActEnv:
        possible_agents = ['p0']
        agents = ['p0']
        render_mode = None

        def observation_space(self, agent):
            return gymnasium.spaces.Box(low=0, high=1, shape=(2,),
                dtype=np.float32)

        def action_space(self, agent):
            return gymnasium.spaces.Tuple(
                (gymnasium.spaces.Discrete(3), gymnasium.spaces.Discrete(7)))

        def reset(self, seed=None):
            self.agents = ['p0']
            return {'p0': np.zeros(2, np.float32)}, {'p0': {}}

        def step(self, actions):
            got['action'] = actions['p0']
            return ({'p0': np.zeros(2, np.float32)}, {'p0': 0.0},
                {'p0': False}, {'p0': False}, {'p0': {}})

        def close(self):
            pass

    env = PettingZooPufferEnv(env=TupleActEnv())
    env.reset(seed=0)
    env.step({'p0': np.array([2, 5])})
    assert tuple(got['action']) == (2, 5), got['action']
