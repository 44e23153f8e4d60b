"""pufferlib_tpu: a TPU-native high-throughput RL framework.

A from-scratch JAX/XLA/Pallas rebuild of the PufferLib feature set
(emulation, vectorization, PPO training) designed TPU-first:

- envs are pure functions over pytree state (environment.PufferEnv)
- vectorization is jax.vmap inside one jitted program (vector)
- rollout + GAE + PPO update fuse into a single XLA program (training.ppo)
- scaling is a jax.sharding.Mesh data axis, not worker processes (parallel)
"""
__version__ = '0.1.0'

from pufferlib_tpu.namespace import Namespace, namespace, dataclass
from pufferlib_tpu.exceptions import APIUsageError, InvalidAgentError

__all__ = [
    'Namespace', 'namespace', 'dataclass',
    'APIUsageError', 'InvalidAgentError',
    'PufferEnv', 'Step', 'EpisodeStats',
]

_LAZY = {'PufferEnv', 'Step', 'EpisodeStats'}


def __getattr__(name):
    # PufferEnv/Step/EpisodeStats pull in jax; deferring them keeps the
    # host-only import chain (vector_host worker processes, emulation)
    # jax-free — spawned envpool workers start ~10x faster
    if name in _LAZY:
        from pufferlib_tpu import environment
        return getattr(environment, name)
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
