"""bsuite binding (reference pufferlib/environments/bsuite)."""
import functools


def env_creator(name='bandit/0'):
    return functools.partial(make, name)


def make(name='bandit/0', render_mode=None):
    try:
        import bsuite
        from bsuite.utils import gym_wrapper
    except ImportError as e:
        raise ImportError('bsuite is not installed in this image') from e
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    from pufferlib_tpu.postprocess import EpisodeStats
    from pufferlib_tpu.wrappers import GymToGymnasium

    env = bsuite.load_from_id(name)
    env = gym_wrapper.GymFromDMEnv(env)
    env = GymToGymnasium(env)
    env = EpisodeStats(env)
    return GymnasiumPufferEnv(env=env)
