"""GymnasiumPufferEnv conforms to the gymnasium.Env contract that
third-party consumers (SB3, CleanRL scripts, gymnasium wrappers) rely
on — validated with gymnasium's OWN env checker (the in-image stand-in
for the reference's SB3 interop demos, ref sb3_demo.py /
examples/puffer_ppo_minihack.py)."""
import warnings

import numpy as np
import pytest

import gymnasium

from pufferlib_tpu.host_env import GymnasiumPufferEnv


class _DictEnv(gymnasium.Env):
    observation_space = gymnasium.spaces.Dict({
        'image': gymnasium.spaces.Box(0, 255, (4, 4), np.uint8),
        'flat': gymnasium.spaces.Box(-1, 1, (3,), np.float32),
    })
    action_space = gymnasium.spaces.Dict({
        'a': gymnasium.spaces.Discrete(2),
        'b': gymnasium.spaces.Discrete(3),
    })
    render_mode = None

    def reset(self, seed=None, options=None):
        super().reset(seed=seed)
        return self.observation_space.sample(), {}

    def step(self, action):
        return (self.observation_space.sample(), 1.0,
            self.np_random.random() < 0.1, False, {})


class _GymnasiumShim(gymnasium.Env):
    """Present a GymnasiumPufferEnv as a registered gymnasium.Env so the
    official checker accepts it (the puffer wrapper is duck-typed)."""

    def __init__(self, puffer):
        self._p = puffer
        self.observation_space = _to_gymnasium(
            puffer.single_observation_space)
        self.action_space = _to_gymnasium(puffer.single_action_space)
        self.render_mode = None

    def reset(self, seed=None, options=None):
        super().reset(seed=seed)  # seeds self.np_random for the checker
        return self._p.reset(seed=seed)

    def step(self, action):
        return self._p.step(np.asarray(action))


def _to_gymnasium(space):
    from pufferlib_tpu import spaces as our
    if isinstance(space, our.Box):
        return gymnasium.spaces.Box(low=space.low, high=space.high,
            shape=space.shape, dtype=space.dtype)
    if isinstance(space, our.Discrete):
        return gymnasium.spaces.Discrete(space.n)
    if isinstance(space, our.MultiDiscrete):
        return gymnasium.spaces.MultiDiscrete(np.asarray(space.nvec))
    raise NotImplementedError(type(space))


@pytest.mark.parametrize('make_raw', [
    lambda: gymnasium.make('CartPole-v1'),
    _DictEnv,
], ids=['cartpole', 'dict_spaces'])
def test_puffer_env_passes_gymnasium_checker(make_raw):
    from gymnasium.utils.env_checker import check_env

    puffer = GymnasiumPufferEnv(env=make_raw())
    shim = _GymnasiumShim(puffer)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')  # checker warns about determinism
        check_env(shim, skip_render_check=True)
