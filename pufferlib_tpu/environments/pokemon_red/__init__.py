"""Pokemon Red binding (reference
pufferlib/environments/pokemon_red/environment.py:15-31)."""
import functools


def env_creator(name='pokemon_red'):
    return functools.partial(make, name)


def make(name='pokemon_red', headless=True, state_path=None,
        render_mode=None):
    try:
        from pokegym import Environment
    except ImportError as e:
        raise ImportError('pokegym is not installed in this image') from e
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    from pufferlib_tpu.postprocess import EpisodeStats

    env = Environment(headless=headless, state_path=state_path)
    env = EpisodeStats(env)
    return GymnasiumPufferEnv(env=env)
