"""Link's Awakening binding (reference pufferlib/environments/
links_awaken/environment.py — note the reference targets a pre-1.0
emulation API; this is the working 1.0-style equivalent: resize to
72x80 and bridge through GymnasiumPufferEnv).

Policy: channels-last NatureCNN, same family as pokemon_red.
"""
import functools


def Policy(obs_shape, action_space, hidden_size=512, framestack=4,
        flat_size=64 * 5 * 6, **kw):
    from pufferlib_tpu.models import Convolutional
    return Convolutional(action_space=action_space, framestack=framestack,
        flat_size=flat_size, hidden_size=hidden_size, channels_last=True,
        **kw)


def env_creator(name='links_awaken'):
    return functools.partial(make, name)


def make(name='links_awaken', headless=True, state_path=None,
        render_mode=None):
    try:
        from links_awaken import LinksAwakenV1
    except ImportError as e:
        raise ImportError('links_awaken env package not installed') from e
    import gymnasium
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    from pufferlib_tpu.postprocess import EpisodeStats

    env = LinksAwakenV1(headless=headless, state_path=state_path)
    env = gymnasium.wrappers.ResizeObservation(env, shape=(72, 80))
    env = EpisodeStats(env)
    return GymnasiumPufferEnv(env=env)
