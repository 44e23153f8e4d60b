"""SlimeVolley binding (reference
pufferlib/environments/slimevolley/environment.py:26-36): MultiBinary
action -> MultiDiscrete-ified."""
import functools


def env_creator(name='SlimeVolley-v0'):
    return functools.partial(make, name)


def make(name='SlimeVolley-v0', render_mode=None):
    try:
        import slimevolleygym  # noqa: F401
    except ImportError as e:
        raise ImportError(
            'slimevolleygym is not installed in this image') from e
    import gym as old_gym
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    from pufferlib_tpu.postprocess import EpisodeStats
    from pufferlib_tpu.wrappers import GymToGymnasium

    env = old_gym.make(name)
    env = GymToGymnasium(env)
    env = EpisodeStats(env)
    return GymnasiumPufferEnv(env=env)
