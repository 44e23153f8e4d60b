"""MAgent binding (reference pufferlib/environments/magent)."""
import functools


def env_creator(name='battle_v4'):
    return functools.partial(make, name)


def make(name='battle_v4', render_mode=None):
    try:
        from magent2.environments import battle_v4
    except ImportError as e:
        raise ImportError('magent2 is not installed in this image') from e
    from pufferlib_tpu.host_env import PettingZooPufferEnv
    from pufferlib_tpu.postprocess import MultiagentEpisodeStats

    env = battle_v4.parallel_env(render_mode=render_mode)
    env = MultiagentEpisodeStats(env)
    return PettingZooPufferEnv(env=env)
