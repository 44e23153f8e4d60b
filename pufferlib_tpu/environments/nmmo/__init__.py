"""Neural MMO binding (reference pufferlib/environments/nmmo/environment.py:15-76)."""
import functools

from pufferlib_tpu.environments.nmmo.policy import Policy  # noqa: F401

Recurrent = dict(input_size=256, hidden_size=256, num_layers=1)


def env_creator(name='nmmo'):
    return functools.partial(make, name)


def make(name='nmmo', render_mode=None):
    try:
        import nmmo
    except ImportError as e:
        raise ImportError('nmmo is not installed in this image') from e
    from pufferlib_tpu.host_env import PettingZooPufferEnv
    from pufferlib_tpu.postprocess import MeanOverAgents, MultiagentEpisodeStats
    from pufferlib_tpu.wrappers import PettingZooTruncatedWrapper

    env = nmmo.Env()
    env = PettingZooTruncatedWrapper(env)
    env = MultiagentEpisodeStats(env)
    env = MeanOverAgents(env)
    return PettingZooPufferEnv(env=env)
