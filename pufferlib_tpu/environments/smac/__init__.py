"""SMAC binding (reference pufferlib/environments/smac)."""
import functools


def env_creator(name='smac'):
    return functools.partial(make, name)


def make(name='smac', render_mode=None):
    try:
        from smac.env.pettingzoo import StarCraft2PZEnv
    except ImportError as e:
        raise ImportError('smac is not installed in this image') from e
    from pufferlib_tpu.host_env import PettingZooPufferEnv
    from pufferlib_tpu.postprocess import MultiagentEpisodeStats
    from pufferlib_tpu.wrappers import PettingZooTruncatedWrapper

    env = StarCraft2PZEnv.parallel_env()
    env = PettingZooTruncatedWrapper(env)
    env = MultiagentEpisodeStats(env)
    return PettingZooPufferEnv(env=env)
