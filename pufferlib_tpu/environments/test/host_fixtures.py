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
