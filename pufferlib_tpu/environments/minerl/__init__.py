"""MineRL binding (reference pufferlib/environments/minerl)."""
import functools


def env_creator(name='MineRLBasaltFindCave-v0'):
    return functools.partial(make, name)


def make(name='MineRLBasaltFindCave-v0', render_mode=None):
    try:
        import minerl  # noqa: F401
    except ImportError as e:
        raise ImportError('minerl is not installed in this image') from e
    import gym as old_gym
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    from pufferlib_tpu.postprocess import EpisodeStats
    from pufferlib_tpu.wrappers import GymToGymnasium

    env = old_gym.make(name)
    env = GymToGymnasium(env)
    env = EpisodeStats(env)
    return GymnasiumPufferEnv(env=env)
