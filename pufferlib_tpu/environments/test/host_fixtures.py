"""Synthetic-delay host env fixtures (reference test/environment.py:
252-310). Kept jax-free: envpool workers unpickle these creators in
spawned processes, and importing jax there costs multi-second startup
per worker.
"""
import numpy as np


def _do_work(delay_mean, delay_std):
    import time as _time
    start = _time.process_time()
    target = delay_mean + delay_std * np.random.randn()
    while _time.process_time() - start < target:
        pass


class GymnasiumPerformanceEnv:
    """Busy-spins `delay_mean +- delay_std` seconds of CPU per step."""

    def __init__(self, delay_mean=0, delay_std=0, obs_size=1):
        import gymnasium
        self.observation_space = gymnasium.spaces.Box(
            low=-1, high=1, shape=(obs_size,), dtype=np.float32)
        self.action_space = gymnasium.spaces.Discrete(2)
        self.observation = np.zeros(obs_size, np.float32)
        self.delay_mean = delay_mean
        self.delay_std = delay_std
        self.render_mode = None

    def reset(self, seed=None, options=None):
        return self.observation, {}

    def step(self, action):
        _do_work(self.delay_mean, self.delay_std)
        return self.observation, 0.0, False, False, {}

    def close(self):
        pass


class GymnasiumCrashOnceEnv:
    """Kills its PROCESS (os._exit) on the 3rd step unless the sentinel
    file already exists; the crash leaves the sentinel behind, so a
    respawned worker's instance runs normally. Fixture for the host
    envpool's elastic recovery (restart_workers)."""

    def __init__(self, sentinel=None):
        import gymnasium
        self.observation_space = gymnasium.spaces.Box(
            low=0, high=100, shape=(2,), dtype=np.float32)
        self.action_space = gymnasium.spaces.Discrete(2)
        self.sentinel = sentinel
        self.render_mode = None
        self.t = 0

    def reset(self, seed=None, options=None):
        self.t = 0
        return np.zeros(2, np.float32), {}

    def step(self, action):
        import os
        self.t += 1
        if self.t == 3 and self.sentinel \
                and not os.path.exists(self.sentinel):
            open(self.sentinel, 'w').close()
            os._exit(1)
        obs = np.full(2, float(self.t), np.float32)
        return obs, 1.0, self.t >= 5, False, {}

    def close(self):
        pass


class GymnasiumSleepEnv(GymnasiumPerformanceEnv):
    """time.sleep-based delay fixture: models envs whose step latency
    releases the GIL/CPU (IO, subprocess games). Unlike the busy-spin
    variant, an async pool overlaps these even on a single core."""

    def step(self, action):
        import time as _time
        _time.sleep(self.delay_mean)
        return self.observation, 0.0, False, False, {}


class PettingZooPerformanceEnv:
    """Single-agent parallel-API variant of the delay fixture."""

    def __init__(self, delay_mean=0, delay_std=0):
        self.possible_agents = [1]
        self.agents = [1]
        self.delay_mean = delay_mean
        self.delay_std = delay_std
        self.render_mode = None

    def observation_space(self, agent):
        import gymnasium
        return gymnasium.spaces.Box(
            low=-1, high=1, shape=(1,), dtype=np.float32)

    def action_space(self, agent):
        import gymnasium
        return gymnasium.spaces.Discrete(2)

    def reset(self, seed=None):
        return {1: np.zeros(1, np.float32)}, {1: {}}

    def step(self, actions):
        _do_work(self.delay_mean, self.delay_std)
        return ({1: np.zeros(1, np.float32)}, {1: 1.0}, {1: False},
            {1: False}, {1: {}})

    def close(self):
        pass


# --------------------------------------------------------------------------
# Deterministic host-side mock envs (reference test/environment.py:312-360:
# GymnasiumTestEnv / PettingZooTestEnv with seeded episodes) — the fixture
# for the vectorization-vs-manual-loop byte-exactness contract.

def host_mock_spaces():
    """Gymnasium obs/action space registry for host mock envs (jax-free
    sibling of the device MOCK_* suite)."""
    import gymnasium
    obs = {
        'box': gymnasium.spaces.Box(-1, 1, (6,), np.float32),
        'image': gymnasium.spaces.Box(0, 255, (3, 4, 4), np.uint8),
        'dict_mixed': gymnasium.spaces.Dict({
            'a': gymnasium.spaces.Box(0, 255, (3, 3), np.uint8),
            'b': gymnasium.spaces.Box(-128, 127, (4,), np.int8),
        }),
        'tuple_nested': gymnasium.spaces.Tuple([
            gymnasium.spaces.Box(0, 1, (2,), np.float32),
            gymnasium.spaces.Box(0, 255, (3,), np.uint8),
        ]),
    }
    atn = {
        'discrete': gymnasium.spaces.Discrete(4),
        'multidiscrete': gymnasium.spaces.MultiDiscrete([2, 3]),
        'dict_discrete': gymnasium.spaces.Dict({
            'x': gymnasium.spaces.Discrete(2),
            'y': gymnasium.spaces.Discrete(3),
        }),
    }
    return obs, atn


def _action_leaf_sum(action):
    if isinstance(action, dict):
        return sum(_action_leaf_sum(v) for v in action.values())
    if isinstance(action, (tuple, list)):
        return sum(_action_leaf_sum(v) for v in action)
    return int(np.sum(np.asarray(action)))


class GymnasiumTestEnv:
    """Deterministic seeded episodes: obs are a pure function of
    (seed, tick); reward = tick; episodes last episode_length steps."""

    def __init__(self, obs_name='box', atn_name='discrete',
            episode_length=5):
        obs_spaces, atn_spaces = host_mock_spaces()
        self.observation_space = obs_spaces[obs_name]
        self.action_space = atn_spaces[atn_name]
        self.episode_length = episode_length
        self.render_mode = None
        self._seed = 0
        self._episode = 0

    def _obs(self, t):
        # fold the action history in so byte-exactness catches action
        # mis-routing, not just obs plumbing
        self.observation_space.seed(
            int(self._seed * 10007 + self._episode * 101 + t
                + self._action_sum * 13))
        return self.observation_space.sample()

    def reset(self, seed=None, options=None):
        if seed is not None:
            self._seed = seed
            self._episode = 0
        else:
            self._episode += 1
        self.t = 0
        self._action_sum = 0
        return self._obs(0), {}

    def step(self, action):
        self.t += 1
        self._action_sum += _action_leaf_sum(action)
        done = self.t >= self.episode_length
        info = {'score': float(self.t)} if done else {}
        # reward depends on the received action (0.125 multiples are
        # exact in float32)
        reward = float(self.t) + (self._action_sum % 7) * 0.125
        return self._obs(self.t), reward, done, False, info

    def close(self):
        pass


class PettingZooTestEnv:
    """Deterministic 2-agent parallel mock with seeded episodes."""

    def __init__(self, obs_name='box', atn_name='discrete',
            episode_length=5):
        obs_spaces, atn_spaces = host_mock_spaces()
        self._obs_space = obs_spaces[obs_name]
        self._atn_space = atn_spaces[atn_name]
        self.episode_length = episode_length
        self.possible_agents = [1, 2]
        self.agents = []
        self.render_mode = None
        self._seed = 0
        self._episode = 0

    def observation_space(self, agent):
        return self._obs_space

    def action_space(self, agent):
        return self._atn_space

    def _obs(self, agent, t):
        self._obs_space.seed(int(self._seed * 10007
            + self._episode * 101 + agent * 31 + t
            + self._action_sum * 13))
        return self._obs_space.sample()

    def reset(self, seed=None):
        if seed is not None:
            self._seed = seed
            self._episode = 0
        else:
            self._episode += 1
        self.t = 0
        self._action_sum = 0
        self.agents = list(self.possible_agents)
        return {a: self._obs(a, 0) for a in self.agents}, \
            {a: {} for a in self.agents}

    def step(self, actions):
        self.t += 1
        self._action_sum += _action_leaf_sum(actions)
        done = self.t >= self.episode_length
        obs = {a: self._obs(a, self.t) for a in self.agents}
        rewards = {a: float(self.t * a)
            + (self._action_sum % 5) * 0.125 for a in self.agents}
        dones = {a: done for a in self.agents}
        truncs = {a: False for a in self.agents}
        infos = {a: {} for a in self.agents}
        if done:
            self.agents = []
        return obs, rewards, dones, truncs, infos

    def close(self):
        pass
