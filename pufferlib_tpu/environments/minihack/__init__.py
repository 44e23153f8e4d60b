"""MiniHack binding; reuses the NetHack policy (reference
pufferlib/environments/minihack/torch.py:4)."""
import functools

from pufferlib_tpu.environments.nethack.policy import Policy  # noqa: F401

Recurrent = dict(input_size=256, hidden_size=256, num_layers=1)


def env_creator(name='MiniHack-River-v0'):
    return functools.partial(make, name)


def make(name='MiniHack-River-v0', render_mode=None):
    try:
        import minihack  # noqa: F401
    except ImportError as e:
        raise ImportError('minihack is not installed in this image') from e
    import gymnasium
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    from pufferlib_tpu.postprocess import EpisodeStats

    env = gymnasium.make(name,
        observation_keys=('glyphs', 'chars', 'colors', 'blstats'))
    env = EpisodeStats(env)
    return GymnasiumPufferEnv(env=env)
