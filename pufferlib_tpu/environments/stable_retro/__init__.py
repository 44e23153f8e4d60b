"""Stable-Retro binding (reference pufferlib/environments/stable_retro;
note the reference binding targets a pre-1.0 API and is stale)."""
import functools


def env_creator(name='Airstriker-Genesis'):
    return functools.partial(make, name)


def make(name='Airstriker-Genesis', render_mode=None):
    try:
        import retro
    except ImportError as e:
        raise ImportError('stable-retro is not installed') from e
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    from pufferlib_tpu.postprocess import EpisodeStats
    from pufferlib_tpu.wrappers import GymToGymnasium

    env = retro.make(name)
    env = GymToGymnasium(env)
    env = EpisodeStats(env)
    return GymnasiumPufferEnv(env=env)
