"""Fake-backend tests, batch 2: slimevolley / bsuite / pokemon_red /
butterfly / crafter / vizdoom binding logic without the third-party
packages (same method as test_zoo_fake_backends.py)."""
import sys
import types

import numpy as np
import pytest

import gymnasium

from pufferlib_tpu.host_env import GymnasiumPufferEnv, PettingZooPufferEnv


@pytest.fixture
def fake_module(monkeypatch):
    def install(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        monkeypatch.setitem(sys.modules, name, mod)
        return mod
    return install


# --------------------------------------------------------------------------
# SlimeVolley: old-gym 4-tuple env + MultiBinary actions

class FakeSlimeVolley:
    """Old-gym API: reset() -> obs (no info), step -> 4-tuple,
    MultiBinary(3) actions (reference MultiDiscrete-ifies these,
    slimevolley/environment.py:26-36)."""

    def __init__(self):
        self.observation_space = gymnasium.spaces.Box(
            -1, 1, (12,), np.float64)
        self.action_space = gymnasium.spaces.MultiBinary(3)
        self.received = []

    def reset(self):
        return np.zeros(12, np.float64)

    def step(self, action):
        self.received.append(np.asarray(action).copy())
        return np.zeros(12, np.float64), 1.0, False, {}

    def close(self):
        pass


def test_slimevolley_binding_multibinary_actions(fake_module, monkeypatch):
    # old `gym` is absent from this image too: fake it with gymnasium
    # spaces (the binding only calls gym.make)
    fake_module('slimevolleygym')
    raw = FakeSlimeVolley()
    fake_module('gym', make=lambda name, **kw: raw,
        spaces=gymnasium.spaces)
    from pufferlib_tpu.environments import slimevolley

    env = slimevolley.make()
    assert isinstance(env, GymnasiumPufferEnv)
    # MultiBinary(3) emulates to a 3-component flat discrete vector
    atn_space = env.single_action_space
    assert np.prod(atn_space.shape) == 3 or getattr(
        atn_space, 'nvec', None) is not None
    env.reset(seed=0)
    env.step(np.array([1, 0, 1]))
    assert np.array_equal(np.ravel(raw.received[-1]), [1, 0, 1])
    env.close()


# --------------------------------------------------------------------------
# bsuite: dm_env loaded through bsuite's own gym_wrapper

class FakeDMEnv:
    pass


class FakeGymFromDMEnv:
    """Stand-in for bsuite.utils.gym_wrapper.GymFromDMEnv: old-gym API."""

    def __init__(self, dm_env):
        self.observation_space = gymnasium.spaces.Box(
            -1, 1, (1, 4), np.float32)
        self.action_space = gymnasium.spaces.Discrete(2)
        self.t = 0

    def reset(self):
        self.t = 0
        return np.zeros((1, 4), np.float32)

    def step(self, action):
        self.t += 1
        return (np.zeros((1, 4), np.float32), 1.0, self.t >= 3, {})

    def close(self):
        pass


def test_bsuite_stopper_enforces_episode_budget(fake_module):
    from pufferlib_tpu.environments.bsuite import BSuiteStopper

    class Limited:
        bsuite_num_episodes = 2
        observation_space = gymnasium.spaces.Box(0, 1, (1,), np.float32)
        action_space = gymnasium.spaces.Discrete(2)

        def reset(self):
            return np.zeros(1, np.float32)

    from pufferlib_tpu.exceptions import EpisodeLimitExceeded
    env = BSuiteStopper(Limited())
    env.reset()
    env.reset()
    with pytest.raises(EpisodeLimitExceeded):
        env.reset()  # third episode exceeds the mandate


def test_bsuite_binding_with_fake_backend(fake_module):
    loaded = {}

    def load_from_id(name):
        loaded['name'] = name
        return FakeDMEnv()

    fake_module('bsuite', load_from_id=load_from_id)
    fake_module('bsuite.utils')
    fake_module('bsuite.utils.gym_wrapper', GymFromDMEnv=FakeGymFromDMEnv)
    from pufferlib_tpu.environments import bsuite as bsuite_binding

    env = bsuite_binding.make('bandit/0')
    assert loaded['name'] == 'bandit/0'
    obs, _ = env.reset(seed=0)
    assert obs.shape == (1, 4)
    for _ in range(3):
        obs, reward, term, trunc, info = env.step(np.array([0]))
    assert term and info.get('episode_return') == pytest.approx(3.0)
    env.close()


# --------------------------------------------------------------------------
# pokemon_red: pokegym screen env + channels-last NatureCNN policy

class FakePokegym(gymnasium.Env):
    observation_space = gymnasium.spaces.Box(0, 255, (80, 96, 4), np.uint8)
    action_space = gymnasium.spaces.Discrete(7)
    render_mode = None

    def __init__(self, headless=True, state_path=None):
        self.headless = headless
        self.t = 0

    def reset(self, seed=None, options=None):
        self.t = 0
        return np.zeros((80, 96, 4), np.uint8), {}

    def step(self, action):
        self.t += 1
        info = {}
        if self.t >= 4:
            info['pokemon_exploration_map'] = np.ones((4, 4))
        return (np.zeros((80, 96, 4), np.uint8), 0.1, self.t >= 4,
            False, info)


def test_pokemon_red_binding_and_policy(fake_module):
    import jax
    import jax.numpy as jnp
    fake_module('pokegym', Environment=FakePokegym)
    from pufferlib_tpu.environments import pokemon_red

    env = pokemon_red.make()
    obs, _ = env.reset(seed=0)
    assert obs.shape == (80, 96, 4)

    # channels-last NatureCNN consumes the binding's obs
    pol = pokemon_red.Policy(obs_shape=obs.shape,
        action_space=env.single_action_space)
    batch = jnp.asarray(np.stack([np.asarray(obs)] * 2))
    params = pol.init(jax.random.PRNGKey(0), batch)
    logits, value = pol.apply(params, batch)
    logit0 = logits[0] if isinstance(logits, (list, tuple)) else logits
    assert logit0.shape[0] == 2
    env.close()


# --------------------------------------------------------------------------
# butterfly: pettingzoo parallel_env module lookup

class FakeButterflyParallel:
    def __init__(self):
        self.possible_agents = ['paddle_0', 'paddle_1']
        self.agents = []
        self.render_mode = None

    def observation_space(self, agent):
        return gymnasium.spaces.Box(0, 255, (6, 6, 3), np.uint8)

    def action_space(self, agent):
        return gymnasium.spaces.Discrete(3)

    def reset(self, seed=None):
        self.t = 0
        self.agents = list(self.possible_agents)
        obs = {a: np.zeros((6, 6, 3), np.uint8) for a in self.agents}
        return obs, {a: {} for a in self.agents}

    def step(self, actions):
        self.t += 1
        done = self.t >= 2
        if done:
            self.agents = []
        agents = self.possible_agents
        return ({a: np.zeros((6, 6, 3), np.uint8) for a in agents},
            {a: 1.0 for a in agents}, {a: done for a in agents},
            {a: False for a in agents}, {a: {} for a in agents})

    def close(self):
        pass


def test_butterfly_binding_with_fake_backend(fake_module):
    pong = types.SimpleNamespace(
        parallel_env=lambda render_mode=None: FakeButterflyParallel())
    fake_module('pettingzoo.butterfly', cooperative_pong_v5=pong,
        knights_archers_zombies_v10=pong)
    from pufferlib_tpu.environments import butterfly

    env = butterfly.make('cooperative_pong_v5')
    assert isinstance(env, PettingZooPufferEnv)
    obs, _ = env.reset(seed=0)
    assert set(obs) == {'paddle_0', 'paddle_1'}
    atn = np.zeros(2, np.int64)
    env.step(atn)
    obs, rewards, terms, truncs, infos = env.step(atn)
    assert all(terms.values())
    # per-agent episode stats emitted at the end
    stats = [i for i in infos.values() if i]
    assert stats and stats[0].get('episode_return') == pytest.approx(2.0)
    env.close()


# --------------------------------------------------------------------------
# crafter: old-gym env via GymToGymnasium

class FakeCrafter:
    def __init__(self):
        self.observation_space = gymnasium.spaces.Box(
            0, 255, (8, 8, 3), np.uint8)
        self.action_space = gymnasium.spaces.Discrete(17)

    def reset(self):
        return np.zeros((8, 8, 3), np.uint8)

    def step(self, action):
        return np.zeros((8, 8, 3), np.uint8), 0.0, True, {}

    def close(self):
        pass


def test_crafter_binding_with_fake_backend(fake_module):
    fake_module('crafter', Env=FakeCrafter)
    from pufferlib_tpu.environments import crafter as crafter_binding

    env = crafter_binding.make()
    obs, _ = env.reset(seed=0)
    assert obs.shape == (8, 8, 3)
    obs, reward, term, trunc, info = env.step(np.array([0]))
    assert term  # 4-tuple old-gym done mapped to terminated
    env.close()


# --------------------------------------------------------------------------
# vizdoom: gymnasium-registered env

def test_vizdoom_binding_with_fake_backend(fake_module, monkeypatch):
    fake_module('vizdoom')
    fake_module('vizdoom.gymnasium_wrapper')

    class FakeDoom(gymnasium.Env):
        observation_space = gymnasium.spaces.Dict({
            'screen': gymnasium.spaces.Box(0, 255, (60, 80, 3), np.uint8),
            'gamevariables': gymnasium.spaces.Box(
                -np.inf, np.inf, (1,), np.float32),
        })
        action_space = gymnasium.spaces.Discrete(8)
        render_mode = None

        def reset(self, seed=None, options=None):
            return {'screen': np.zeros((60, 80, 3), np.uint8),
                'gamevariables': np.zeros(1, np.float32)}, {}

        def step(self, action):
            return ({'screen': np.zeros((60, 80, 3), np.uint8),
                'gamevariables': np.zeros(1, np.float32)},
                1.0, True, False, {})

    monkeypatch.setattr(gymnasium, 'make', lambda name, **kw: FakeDoom())
    from pufferlib_tpu.environments import vizdoom

    env = vizdoom.make()
    obs, _ = env.reset(seed=0)
    assert obs.dtype == np.uint8 and obs.ndim == 1  # mixed Dict -> bytes
    env.close()
