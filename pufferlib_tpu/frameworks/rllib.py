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
    """Wrap a torch module class exposing the puffer model API
    (encode_observations / decode_actions / critic) as an RLlib model
    (ref rllib.py:59-108). lstm_layers > 0 produces a RecurrentNetwork
    carrying (h, c) through forward_rnn."""
    import torch

    if lstm_layers > 0:
        from ray.rllib.models.torch.recurrent_net import (
            RecurrentNetwork as RLlibRecurrentNetwork)

        class RLlibRecurrentPolicy(RLlibRecurrentNetwork, policy_cls):
            def __init__(self, *args, **kwargs):
                policy_cls.__init__(self, **kwargs)
                RLlibRecurrentNetwork.__init__(self, *args)

            def get_initial_state(self, batch_size=1):
                return tuple(
                    torch.zeros(self.lstm.num_layers,
                        self.lstm.hidden_size)
                    for _ in range(2))

            def value_function(self):
                return self.value.view(-1)

            def forward_rnn(self, x, state, seq_lens):
                hidden, state = self.encode_observations(x, state)
                self.value = self.critic(hidden)
                logits = self.decode_actions(hidden)
                return logits, state

        return RLlibRecurrentPolicy

    from ray.rllib.models.torch.torch_modelv2 import TorchModelV2

    class RLlibPolicy(TorchModelV2, policy_cls):
        def __init__(self, *args, **kwargs):
            policy_cls.__init__(self, **kwargs)
            TorchModelV2.__init__(self, *args)

        def value_function(self):
            return self.value.view(-1)

        def forward(self, x, state, seq_lens):
            hidden = self.encode_observations(x['obs'].float())
            self.value = self.critic(hidden)
            logits = self.decode_actions(hidden)
            return logits, state

    return RLlibPolicy
