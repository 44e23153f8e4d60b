"""Pokemon Red binding (reference
pufferlib/environments/pokemon_red/environment.py:15-31).

Policy: NatureCNN channels-last (reference pokemon_red/torch.py:13-26).
"""
import functools


def Policy(obs_shape, action_space, hidden_size=512, framestack=4,
        flat_size=64 * 5 * 6, **kw):
    from pufferlib_tpu.models import Convolutional
    return Convolutional(action_space=action_space, framestack=framestack,
        flat_size=flat_size, hidden_size=hidden_size, channels_last=True,
        **kw)


Recurrent = dict(input_size=512, hidden_size=512, num_layers=1)


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
