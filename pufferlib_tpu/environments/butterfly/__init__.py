"""PettingZoo butterfly binding (reference
pufferlib/environments/butterfly/environment.py:1-12)."""
import functools


def env_creator(name='cooperative_pong_v5'):
    return functools.partial(make, name)


def make(name='cooperative_pong_v5', render_mode=None):
    try:
        from pettingzoo.butterfly import cooperative_pong_v5, knights_archers_zombies_v10
    except ImportError as e:
        raise ImportError('pettingzoo[butterfly] extras missing') from e
    from pufferlib_tpu.host_env import PettingZooPufferEnv
    from pufferlib_tpu.postprocess import MultiagentEpisodeStats

    mods = {
        'cooperative_pong_v5': cooperative_pong_v5,
        'knights_archers_zombies_v10': knights_archers_zombies_v10,
    }
    env = mods[name].parallel_env(render_mode=render_mode)
    env = MultiagentEpisodeStats(env)
    return PettingZooPufferEnv(env=env)
