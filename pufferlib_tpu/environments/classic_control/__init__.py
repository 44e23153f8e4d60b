"""Classic control binding (reference
pufferlib/environments/classic_control/environment.py:12-21)."""
import functools


def env_creator(name='cartpole'):
    return functools.partial(make, name)


def make(name='cartpole', render_mode=None):
    import gymnasium
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    from pufferlib_tpu.postprocess import EpisodeStats

    aliases = {
        'cartpole': 'CartPole-v1',
        'mountaincar': 'MountainCar-v0',
        'acrobot': 'Acrobot-v1',
        'pendulum': 'Pendulum-v1',
    }
    env = gymnasium.make(aliases.get(name, name), render_mode=render_mode)
    env = EpisodeStats(env)
    return GymnasiumPufferEnv(env=env)
