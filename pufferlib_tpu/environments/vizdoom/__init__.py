"""ViZDoom binding (reference pufferlib/environments/vizdoom)."""
import functools


def env_creator(name='VizdoomHealthGatheringSupreme-v0'):
    return functools.partial(make, name)


def make(name='VizdoomHealthGatheringSupreme-v0', render_mode=None):
    try:
        import vizdoom.gymnasium_wrapper  # noqa: F401
    except ImportError as e:
        raise ImportError('vizdoom is not installed in this image') from e
    import gymnasium
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    from pufferlib_tpu.postprocess import EpisodeStats

    env = gymnasium.make(name)
    env = EpisodeStats(env)
    return GymnasiumPufferEnv(env=env)
