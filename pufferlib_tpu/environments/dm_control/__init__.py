"""dm_control binding (reference pufferlib/environments/dm_control)."""
import functools


def env_creator(name='walker-walk'):
    return functools.partial(make, name)


def make(name='walker-walk', render_mode=None):
    try:
        from dm_control import suite
        from shimmy import DmControlCompatibilityV0
    except ImportError as e:
        raise ImportError(
            'dm_control/shimmy are not installed in this image') from e
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    from pufferlib_tpu.postprocess import EpisodeStats

    domain, task = name.split('-')
    env = suite.load(domain, task)
    env = DmControlCompatibilityV0(env)
    env = EpisodeStats(env)
    return GymnasiumPufferEnv(env=env)
