"""RLlib bridge (legacy in the reference: pufferlib/frameworks/rllib.py
— TorchModelV2 adapters over Ray RLlib). Ray/RLlib are torch/TF-centric
and are not meaningful targets for a JAX/TPU framework; the supported
integration path is the cleanrl-style wrappers (frameworks.cleanrl) and
the native trainer (training.ppo). This module exists to give the
reference's import path a clear error."""


def register_env(*args, **kwargs):
    raise NotImplementedError(
        'RLlib integration is not supported by pufferlib_tpu; use '
        'pufferlib_tpu.training.ppo or frameworks.cleanrl instead')


def make_policy(*args, **kwargs):
    raise NotImplementedError(
        'RLlib integration is not supported by pufferlib_tpu; use '
        'pufferlib_tpu.training.ppo or frameworks.cleanrl instead')
