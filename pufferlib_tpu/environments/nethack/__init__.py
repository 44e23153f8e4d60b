"""NetHack binding (reference pufferlib/environments/nethack)."""
import functools


def env_creator(name='nethack'):
    return functools.partial(make, name)


def make(name='nethack', render_mode=None):
    try:
        import nle  # noqa: F401
    except ImportError as e:
        raise ImportError('nle is not installed in this image') from e
    import gymnasium
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    from pufferlib_tpu.postprocess import EpisodeStats
    from pufferlib_tpu.wrappers import GymToGymnasium

    env = gymnasium.make('NetHackScore-v0')
    env = EpisodeStats(env)
    return GymnasiumPufferEnv(env=env)
