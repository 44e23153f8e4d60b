"""RLlib bridge logic against a fake ray (ray is not installed here;
reference pufferlib/frameworks/rllib.py:24-108)."""
import sys
import types

import numpy as np
import pytest

import gymnasium


def _install_fake_ray(monkeypatch):
    registry = {}

    ray = types.ModuleType('ray')
    tune = types.ModuleType('ray.tune')
    tune_registry = types.ModuleType('ray.tune.registry')
    tune_registry.register_env = lambda name, fn: registry.update(
        {name: fn})
    rllib = types.ModuleType('ray.rllib')
    rllib_env = types.ModuleType('ray.rllib.env')

    class ParallelPettingZooEnv:
        def __init__(self, env):
            self.par_env = env

    rllib_env.ParallelPettingZooEnv = ParallelPettingZooEnv
    policy_mod = types.ModuleType('ray.rllib.policy')
    policy_policy = types.ModuleType('ray.rllib.policy.policy')

    class PolicySpec:
        def __init__(self, policy_class=None, observation_space=None,
                action_space=None, config=None):
            self.policy_class = policy_class
            self.observation_space = observation_space
            self.action_space = action_space
            self.config = config

    policy_policy.PolicySpec = PolicySpec
    models = types.ModuleType('ray.rllib.models')
    models_torch = types.ModuleType('ray.rllib.models.torch')
    modelv2 = types.ModuleType('ray.rllib.models.torch.torch_modelv2')

    class TorchModelV2:
        def __init__(self, *args):
            self.model_args = args

    modelv2.TorchModelV2 = TorchModelV2
    recurrent = types.ModuleType('ray.rllib.models.torch.recurrent_net')

    class RecurrentNetwork(TorchModelV2):
        pass

    recurrent.RecurrentNetwork = RecurrentNetwork

    for name, mod in {
            'ray': ray, 'ray.tune': tune,
            'ray.tune.registry': tune_registry,
            'ray.rllib': rllib, 'ray.rllib.env': rllib_env,
            'ray.rllib.policy': policy_mod,
            'ray.rllib.policy.policy': policy_policy,
            'ray.rllib.models': models,
            'ray.rllib.models.torch': models_torch,
            'ray.rllib.models.torch.torch_modelv2': modelv2,
            'ray.rllib.models.torch.recurrent_net': recurrent,
    }.items():
        monkeypatch.setitem(sys.modules, name, mod)
    return registry


class _TinyGym(gymnasium.Env):
    observation_space = gymnasium.spaces.Box(0, 1, (3,), np.float32)
    action_space = gymnasium.spaces.Discrete(2)

    def reset(self, seed=None, options=None):
        return np.zeros(3, np.float32), {}

    def step(self, action):
        return np.zeros(3, np.float32), 1.0, True, False, {}


def test_register_env_gymnasium(monkeypatch):
    registry = _install_fake_ray(monkeypatch)
    from pufferlib_tpu.frameworks import rllib
    from pufferlib_tpu.host_env import GymnasiumPufferEnv

    rllib.register_env('tiny', lambda: GymnasiumPufferEnv(env=_TinyGym()))
    assert 'tiny' in registry
    env = registry['tiny']({})
    # RLlib isinstance-checks gymnasium.Env: the registered creator must
    # yield the REAL-gymnasium adapter, not the duck-typed wrapper
    assert isinstance(env, gymnasium.Env)
    assert isinstance(env.action_space, gymnasium.spaces.Discrete)
    obs, _ = env.reset(seed=0)
    assert obs.shape == (3,)

    with pytest.raises(TypeError):
        rllib.register_env(123, lambda: None)


def test_register_env_pettingzoo_wrapped(monkeypatch):
    registry = _install_fake_ray(monkeypatch)
    from pufferlib_tpu.frameworks import rllib

    class FakeParallel:
        possible_agents = [1, 2]

    rllib.register_env('multi', FakeParallel)
    wrapped = registry['multi']({})
    assert type(wrapped).__name__ == 'ParallelPettingZooEnv'
    assert isinstance(wrapped.par_env, FakeParallel)


def test_create_policies(monkeypatch):
    _install_fake_ray(monkeypatch)
    from pufferlib_tpu.frameworks import rllib

    specs = rllib.create_policies(3, config={'gamma': 0.9})
    assert set(specs) == {'policy_0', 'policy_1', 'policy_2'}
    assert specs['policy_1'].config == {'gamma': 0.9}


def test_make_policy_wraps_torch_module(monkeypatch):
    _install_fake_ray(monkeypatch)
    import torch
    from pufferlib_tpu.frameworks import rllib

    class TorchPolicy(torch.nn.Module):
        def __init__(self, hidden=8):
            super().__init__()
            self.fc = torch.nn.Linear(3, hidden)
            self.head = torch.nn.Linear(hidden, 2)
            self.critic = torch.nn.Linear(hidden, 1)

        def encode_observations(self, x):
            return self.fc(x)

        def decode_actions(self, hidden):
            return self.head(hidden)

    cls = rllib.make_policy(TorchPolicy, lstm_layers=0)
    model = cls('modelv2-args', hidden=8)
    logits, state = model.forward(
        {'obs': torch.zeros(4, 3)}, [], None)
    assert logits.shape == (4, 2)
    assert model.value_function().shape == (4,)


def test_make_policy_recurrent(monkeypatch):
    _install_fake_ray(monkeypatch)
    import torch
    from pufferlib_tpu.frameworks import rllib

    class RecurrentTorchPolicy(torch.nn.Module):
        def __init__(self, hidden=8):
            super().__init__()
            self.fc = torch.nn.Linear(3, hidden)
            self.lstm = torch.nn.LSTM(hidden, hidden, num_layers=1)
            self.head = torch.nn.Linear(hidden, 2)
            self.critic = torch.nn.Linear(hidden, 1)

        def encode_observations(self, x, state):
            hidden, state = self.lstm(self.fc(x), state)
            return hidden, state

        def decode_actions(self, hidden):
            return self.head(hidden)

    cls = rllib.make_policy(RecurrentTorchPolicy, lstm_layers=1)
    model = cls('modelv2-args', hidden=8)
    h0, c0 = model.get_initial_state()
    assert h0.shape == (1, 8) and c0.shape == (1, 8)
    state = (h0.unsqueeze(1), c0.unsqueeze(1))
    logits, state = model.forward_rnn(torch.zeros(5, 1, 3), state, None)
    assert logits.shape == (5, 1, 2)
    assert model.value_function().shape == (5,)
    # parameters of the wrapped module are registered on the adapter
    assert any(p.requires_grad for p in model.parameters())


def test_read_checkpoints_empty(monkeypatch, tmp_path):
    _install_fake_ray(monkeypatch)
    from pufferlib_tpu.frameworks import rllib
    assert rllib.read_checkpoints(tmp_path) == []
    (tmp_path / 'trial_a').mkdir()
    (tmp_path / 'trial_b').mkdir()
    with pytest.raises(ValueError):
        rllib.read_checkpoints(tmp_path)
