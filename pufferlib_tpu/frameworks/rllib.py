"""RLlib bridge (reference pufferlib/frameworks/rllib.py:24-141).

RLlib consumes gymnasium / PettingZoo environments and (for custom
models) torch modules, so the bridge has two halves:

- env side: `register_env` puts a puffer env creator into Ray Tune's
  registry (PettingZoo envs wrapped as ParallelPettingZooEnv, matching
  ref :27-29); `read_checkpoints` / `create_policies` mirror ref
  :31-57. Our GymnasiumPufferEnv/PettingZooPufferEnv already satisfy
  the gymnasium/ParallelEnv contracts RLlib expects, flat spaces
  included.
- model side: `make_policy` wraps a TORCH module class with the
  encode/decode split (the reference's model API, ref :59-108) into a
  TorchModelV2 / RecurrentNetwork. The jax-native policies train
  through training.ppo; this adapter exists for users bringing torch
  models to RLlib, exactly like the reference.

ray is imported lazily inside each function — it is not installed in
this image; the logic is exercised against a fake ray in
tests/test_rllib_bridge.py.
"""
import os


def _pettingzoo_like(env):
    return hasattr(env, 'possible_agents')


def register_env(name, env_creator):
    """Register a puffer env creator with Ray Tune (ref rllib.py:27-29).

    PettingZoo-style envs (anything exposing possible_agents) are
    wrapped in RLlib's ParallelPettingZooEnv; gymnasium-style envs
    register directly.
    """
    if not isinstance(name, str):
        raise TypeError('Name must be a str')
    from ray.tune.registry import register_env as tune_register_env

    def make(config):
        env = env_creator()
        if _pettingzoo_like(env):
            from ray.rllib.env import ParallelPettingZooEnv
            return ParallelPettingZooEnv(env)
        from pufferlib_tpu.host_env import (
            GymnasiumAdapter, GymnasiumPufferEnv)
        if isinstance(env, GymnasiumPufferEnv):
            # RLlib isinstance-checks gymnasium.Env and gymnasium
            # spaces; the duck-typed puffer wrapper must be adapted
            return GymnasiumAdapter(env)
        return env

    tune_register_env(name, make)


def read_checkpoints(tune_path):
    """Checkpoints of the single trial under `tune_path`
    (ref rllib.py:31-48)."""
    folders = sorted(f.path for f in os.scandir(tune_path) if f.is_dir())
    if len(folders) > 1:
        raise ValueError('Tune folder contains multiple trials')
    if not folders:
        return []
    from ray.train.rl import RLCheckpoint
    out = []
    for f in sorted(os.listdir(folders[0])):
        if f.startswith('checkpoint'):
            path = os.path.join(folders[0], f)
            out.append([f, RLCheckpoint(path)])
    return out


def create_policies(n, observation_space=None, action_space=None,
        config=None):
    """n named PolicySpecs for multi-policy training
    (ref rllib.py:50-57)."""
    from ray.rllib.policy.policy import PolicySpec
    return {f'policy_{i}': PolicySpec(
        policy_class=None,
        observation_space=observation_space,
        action_space=action_space,
        config=dict(config or {}),
    ) for i in range(n)}


def make_policy(policy_cls, lstm_layers=0):
    """Adapt a torch module class exposing the puffer model API
    (encode_observations / decode_actions / critic) to RLlib's custom
    model interface. lstm_layers > 0 yields a RecurrentNetwork whose
    forward_rnn carries (h, c).

    Design: composition, not mixin — the user's module is constructed
    as a submodule (`self.net`, so nn.Module parameter registration
    still sees it) and the RLlib hooks delegate to its encode/decode
    split. Positional args go to the RLlib base (obs_space,
    action_space, num_outputs, model_config, name); kwargs go to the
    user's module. Behavioral spec: reference rllib.py:59-108.
    """
    import torch

    recurrent = lstm_layers > 0
    if recurrent:
        from ray.rllib.models.torch.recurrent_net import (
            RecurrentNetwork as _Base)
    else:
        from ray.rllib.models.torch.torch_modelv2 import (
            TorchModelV2 as _Base)

    class _PufferAdapter(_Base, torch.nn.Module):
        def __init__(self, *rllib_args, **policy_kwargs):
            torch.nn.Module.__init__(self)
            _Base.__init__(self, *rllib_args)
            self.net = policy_cls(**policy_kwargs)
            self._value_out = None

        def value_function(self):
            # critic output cached by the most recent forward pass
            return torch.reshape(self._value_out, (-1,))

    if recurrent:

        class PufferRLlibRecurrentModel(_PufferAdapter):
            def get_initial_state(self, batch_size=1):
                cell = self.net.lstm
                dims = (cell.num_layers, cell.hidden_size)
                return [torch.zeros(dims), torch.zeros(dims)]

            def forward_rnn(self, inputs, state, seq_lens):
                hidden, state = self.net.encode_observations(
                    inputs, state)
                self._value_out = self.net.critic(hidden)
                return self.net.decode_actions(hidden), state

        return PufferRLlibRecurrentModel

    class PufferRLlibModel(_PufferAdapter):
        def forward(self, input_dict, state, seq_lens):
            obs = input_dict['obs']
            if obs.dtype != torch.float32:
                obs = obs.to(torch.float32)
            hidden = self.net.encode_observations(obs)
            self._value_out = self.net.critic(hidden)
            return self.net.decode_actions(hidden), state

    return PufferRLlibModel
