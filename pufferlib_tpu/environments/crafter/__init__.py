"""Crafter binding (reference pufferlib/environments/crafter)."""
import functools


def env_creator(name='CrafterReward-v1'):
    return functools.partial(make, name)


def make(name='CrafterReward-v1', render_mode=None):
    try:
        import crafter  # noqa: F401
    except ImportError as e:
        raise ImportError('crafter is not installed in this image') from e
    import gymnasium
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    from pufferlib_tpu.postprocess import EpisodeStats
    from pufferlib_tpu.wrappers import GymToGymnasium

    env = crafter.Env()
    env = GymToGymnasium(env)
    env = EpisodeStats(env)
    return GymnasiumPufferEnv(env=env)
