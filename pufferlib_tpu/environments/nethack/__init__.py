"""NetHack binding (reference pufferlib/environments/nethack)."""
import functools

from pufferlib_tpu.environments.nethack.policy import Policy  # noqa: F401

Recurrent = dict(input_size=256, hidden_size=256, num_layers=1)


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
