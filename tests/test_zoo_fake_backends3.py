"""Fake-backend tests, batch 3: the formerly-stubbed bindings —
nmmo3 (native PufferEnv fast path), dm_lab, nocturne, microrts,
links_awaken — plus smac/magent/griddly/open_spiel-adjacent wrapper
stacks where practical."""
import sys
import types

import numpy as np
import pytest

import gymnasium

from pufferlib_tpu.host_env import (
    GymnasiumPufferEnv, NativePufferEnv, PettingZooPufferEnv)


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
# nmmo3: native PufferEnv (pre-flattened per-agent arrays, no emulation)

class FakePuffEnv:
    """nmmo3-style native env: flat (num_agents, D) obs arrays."""

    def __init__(self, width=1024, height=1024, num_envs=1):
        self.num_agents = 4
        self.single_observation_space = gymnasium.spaces.Box(
            0, 255, (11,), np.uint8)
        self.single_action_space = gymnasium.spaces.Discrete(6)
        self.observation_space = self.single_observation_space
        self.action_space = self.single_action_space
        self.t = 0

    def reset(self, seed=None):
        self.t = 0
        return np.zeros((4, 11), np.uint8), {}

    def step(self, actions):
        assert np.asarray(actions).shape[0] == 4
        self.t += 1
        done = self.t >= 3
        return (np.full((4, 11), self.t, np.uint8),
            np.ones(4, np.float32), np.full(4, done),
            np.zeros(4, bool), {})

    def close(self):
        pass


def test_nmmo3_native_puffer_env_binding(fake_module):
    fake_module('nmmo3', PuffEnv=FakePuffEnv)
    from pufferlib_tpu.environments import nmmo3

    env = nmmo3.make()
    assert isinstance(env, NativePufferEnv)
    assert env.num_agents == 4
    assert env.emulated is None  # native envs skip emulation
    obs, _ = env.reset(seed=0)
    assert obs.shape == (4, 11)
    obs, rew, term, trunc, _ = env.step(np.zeros(4, np.int64))
    assert rew.sum() == 4.0
    env.close()


def test_nmmo3_through_host_serial(fake_module):
    """The native fast path rides HostSerial with injected buffers
    (reference vector.py:652-655 accepts PufferEnv directly)."""
    from pufferlib_tpu import vector_host
    fake_module('nmmo3', PuffEnv=FakePuffEnv)
    from pufferlib_tpu.environments import nmmo3

    vec = vector_host.make(nmmo3.env_creator(), num_envs=2,
        backend=vector_host.HostSerial)
    obs, _ = vec.reset(seed=0)
    assert obs.shape == (8, 11)  # 2 envs x 4 agents
    obs, rew, term, trunc, infos = vec.step(np.zeros(8, np.int64))
    assert rew.sum() == 8.0
    vec.close()


# --------------------------------------------------------------------------
# dm_lab

class FakeLab:
    def __init__(self):
        self.t = 0
        self.steps = []

    def observations(self):
        return {'RGB_INTERLEAVED': np.full((72, 96, 3), self.t, np.uint8)}

    def reset(self, seed=None):
        self.t = 0

    def step(self, raw_action, num_steps=1):
        self.steps.append((np.asarray(raw_action).copy(), num_steps))
        self.t += 1
        return 2.0

    def is_running(self):
        return self.t < 3

    def close(self):
        pass


def test_dm_lab_binding_with_fake_backend(fake_module):
    lab = FakeLab()
    fake_module('deepmind_lab', Lab=lambda name, obs, config=None: lab)
    from pufferlib_tpu.environments import dm_lab

    env = dm_lab.make()
    obs, _ = env.reset(seed=0)
    assert obs.shape == (72, 96, 3)
    obs, reward, term, trunc, _ = env.step(np.array([0]))
    assert reward == 2.0
    # action 0 = forward with 4-step action repeat
    raw, num_steps = lab.steps[-1]
    assert num_steps == 4 and raw[3] == 1
    env.step(np.array([4]))  # look left
    raw, _ = lab.steps[-1]
    assert raw[0] == -20
    obs, reward, term, trunc, info = env.step(np.array([0]))
    assert term  # lab stopped running -> episode end
    env.close()


# --------------------------------------------------------------------------
# nocturne

class FakeNocturneBase:
    def __init__(self, config=None):
        self.config = config
        self.files = ['a.json', 'b.json']
        self.observation_space = gymnasium.spaces.Box(
            -np.inf, np.inf, (10,), np.float32)
        self.action_space = gymnasium.spaces.Discrete(9)
        self.t = 0

    def reset(self):
        self.t = 0
        return {f'veh_{i}': np.zeros(10, np.float64) for i in range(2)}

    def step(self, actions):
        self.t += 1
        done = self.t >= 2
        agents = [f'veh_{i}' for i in range(2)]
        return ({a: np.zeros(10, np.float64) for a in agents},
            {a: 1.0 for a in agents}, {a: done for a in agents},
            {a: {} for a in agents})

    def close(self):
        pass


def test_nocturne_binding_with_fake_backend(fake_module):
    fake_module('nocturne')
    fake_module('nocturne.envs')
    fake_module('nocturne.envs.base_env', BaseEnv=FakeNocturneBase)
    from pufferlib_tpu.environments import nocturne

    env = nocturne.make()
    assert isinstance(env, PettingZooPufferEnv)
    obs, _ = env.reset(seed=0)
    assert set(obs) == {'veh_0', 'veh_1'}
    # float32 cast happens in the wrapper
    assert obs['veh_0'].dtype == np.float32
    atn = np.zeros(2, np.int64)
    env.step(atn)
    obs, rewards, terms, truncs, infos = env.step(atn)
    assert all(terms.values())
    env.close()


def test_nocturne_truncates_scenario_files(fake_module):
    fake_module('nocturne')
    fake_module('nocturne.envs')
    captured = {}

    class CapturingBase(FakeNocturneBase):
        def __init__(self, config=None):
            super().__init__(config)
            captured['env'] = self

    fake_module('nocturne.envs.base_env', BaseEnv=CapturingBase)
    from pufferlib_tpu.environments import nocturne

    nocturne.make()
    assert captured['env'].files == ['a.json']  # ref :27 truncates to 1


# --------------------------------------------------------------------------
# microrts

class FakeMicroRTSEnv:
    def __init__(self):
        self.observation_space = gymnasium.spaces.Box(
            0, 255, (4, 4, 2), np.float64)
        self.action_space = gymnasium.spaces.MultiDiscrete([4, 4, 3])

    def reset(self):
        return np.zeros((4, 4, 2), np.float64)

    def step(self, action):
        return np.ones((4, 4, 2), np.float64), 1.0, False, {}

    def close(self):
        pass


def test_microrts_binding_with_fake_backend(fake_module):
    fake_module('gym_microrts',
        envs=types.SimpleNamespace(
            GlobalAgentCombinedRewardEnv=FakeMicroRTSEnv))
    sys.modules['gym_microrts'].envs = types.SimpleNamespace(
        GlobalAgentCombinedRewardEnv=FakeMicroRTSEnv)
    fake_module('gym_microrts.envs',
        GlobalAgentCombinedRewardEnv=FakeMicroRTSEnv)
    from pufferlib_tpu.environments import microrts

    env = microrts.make()
    obs, _ = env.reset(seed=0)
    # int32 cast wrapper (reference microrts/environment.py:36-49)
    assert obs.dtype == np.int32
    obs, reward, term, trunc, _ = env.step(np.zeros(3, np.int64))
    assert reward == 1.0 and not term
    with pytest.raises(ValueError):
        microrts.make('NoSuchEnv')
    env.close()


# --------------------------------------------------------------------------
# links_awaken

class FakeLinksAwaken(gymnasium.Env):
    observation_space = gymnasium.spaces.Box(0, 255, (144, 160, 3), np.uint8)
    action_space = gymnasium.spaces.Discrete(8)
    render_mode = None
    metadata = {}

    def __init__(self, headless=True, state_path=None):
        pass

    def reset(self, seed=None, options=None):
        return np.zeros((144, 160, 3), np.uint8), {}

    def step(self, action):
        return np.zeros((144, 160, 3), np.uint8), 0.0, False, False, {}


def test_links_awaken_binding_with_fake_backend(fake_module):
    fake_module('links_awaken', LinksAwakenV1=FakeLinksAwaken)
    from pufferlib_tpu.environments import links_awaken

    env = links_awaken.make()
    obs, _ = env.reset(seed=0)
    assert obs.shape == (72, 80, 3)  # resized (reference :14)
    env.close()


# --------------------------------------------------------------------------
# smac / magent / griddly thin stacks

class FakeSMACParallel:
    def __init__(self):
        self.possible_agents = list(range(3))
        self.agents = list(self.possible_agents)
        self.render_mode = None

    def observation_space(self, agent):
        return gymnasium.spaces.Box(-1, 1, (14,), np.float32)

    def action_space(self, agent):
        return gymnasium.spaces.Discrete(9)

    def reset(self, seed=None):
        self.agents = list(self.possible_agents)
        return {a: np.zeros(14, np.float32) for a in self.agents}, \
            {a: {} for a in self.agents}

    def step(self, actions):
        agents = self.agents
        return ({a: np.zeros(14, np.float32) for a in agents},
            {a: 0.5 for a in agents}, {a: False for a in agents},
            {a: False for a in agents}, {a: {} for a in agents})

    def close(self):
        pass


def test_smac_binding_with_fake_backend(fake_module):
    fake_module('smac')
    fake_module('smac.env')
    fake_module('smac.env.pettingzoo',
        StarCraft2PZEnv=types.SimpleNamespace(
            parallel_env=lambda: FakeSMACParallel()))
    from pufferlib_tpu.environments import smac

    env = smac.make()
    assert isinstance(env, PettingZooPufferEnv)
    obs, _ = env.reset(seed=0)
    assert len(obs) == 3
    obs, rewards, terms, truncs, infos = env.step(np.zeros(3, np.int64))
    assert sum(rewards.values()) == pytest.approx(1.5)
    env.close()


def test_magent_binding_with_fake_backend(fake_module):
    fake_module('magent2')
    fake_module('magent2.environments',
        battle_v4=types.SimpleNamespace(
            parallel_env=lambda render_mode=None: FakeSMACParallel()))
    from pufferlib_tpu.environments import magent

    env = magent.make('battle_v4')
    obs, _ = env.reset(seed=0)
    assert len(obs) == 3
    env.close()


def test_griddly_binding_with_fake_backend(fake_module, monkeypatch):
    fake_module('griddly')

    class FakeGriddlyEnv(gymnasium.Env):
        observation_space = gymnasium.spaces.Box(0, 255, (5, 5, 2), np.uint8)
        action_space = gymnasium.spaces.Discrete(5)
        render_mode = None

        def reset(self, seed=None, options=None):
            return np.zeros((5, 5, 2), np.uint8), {}

        def step(self, action):
            return np.zeros((5, 5, 2), np.uint8), 1.0, True, False, {}

    monkeypatch.setattr(gymnasium, 'make',
        lambda name, **kw: FakeGriddlyEnv())
    from pufferlib_tpu.environments import griddly

    env = griddly.make()
    obs, _ = env.reset(seed=0)
    assert obs.shape == (5, 5, 2)
    obs, reward, term, trunc, info = env.step(np.array([0]))
    assert term and info.get('episode_return') == pytest.approx(1.0)
    env.close()
