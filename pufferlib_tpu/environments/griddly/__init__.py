"""Griddly binding (reference pufferlib/environments/griddly)."""
import functools


def env_creator(name='GDY-Spiders-v0'):
    return functools.partial(make, name)


def make(name='GDY-Spiders-v0', render_mode=None):
    try:
        import griddly  # noqa: F401
    except ImportError as e:
        raise ImportError('griddly is not installed in this image') from e
    import gymnasium
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    from pufferlib_tpu.postprocess import EpisodeStats

    env = gymnasium.make(name)
    env = EpisodeStats(env)
    return GymnasiumPufferEnv(env=env)
