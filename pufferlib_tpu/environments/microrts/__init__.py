"""Gym-MicroRTS binding (reference pufferlib/environments/microrts)."""
import functools


def env_creator(name='GlobalAgentCombinedRewardEnv'):
    return functools.partial(make, name)


def make(name='GlobalAgentCombinedRewardEnv', render_mode=None):
    try:
        from gym_microrts import microrts_ai  # noqa: F401
        from gym_microrts.envs.vec_env import MicroRTSGridModeVecEnv
    except ImportError as e:
        raise ImportError('gym-microrts is not installed') from e
    raise NotImplementedError(
        'microrts requires the vec-env adapter; see reference binding')
