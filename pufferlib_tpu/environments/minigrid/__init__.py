"""MiniGrid binding (reference pufferlib/environments/minigrid)."""
import functools


def env_creator(name='MiniGrid-Empty-8x8-v0'):
    return functools.partial(make, name)


def make(name='MiniGrid-Empty-8x8-v0', render_mode=None):
    try:
        import minigrid  # noqa: F401
    except ImportError as e:
        raise ImportError(
            'minigrid is not installed in this image') from e
    import gymnasium
    from minigrid.wrappers import ImgObsWrapper
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    from pufferlib_tpu.postprocess import EpisodeStats

    env = gymnasium.make(name, render_mode=render_mode)
    env = ImgObsWrapper(env)
    env = EpisodeStats(env)
    return GymnasiumPufferEnv(env=env)
