"""bsuite binding (reference pufferlib/environments/bsuite)."""
import functools


def env_creator(name='bandit/0'):
    return functools.partial(make, name)


class BSuiteStopper:
    """Stop after the bsuite-mandated episode count (the suite's scores
    are only defined over exactly bsuite_num_episodes episodes —
    reference bsuite/environment.py:26-45, which exits the whole
    process; raising EpisodeLimitExceeded instead lets the caller stop
    cleanly: HostSerial propagates it, HostMultiprocessing surfaces it
    through the worker-death watchdog)."""

    def __init__(self, env):
        self.env = env
        self.num_episodes = 0
        self.observation_space = env.observation_space
        self.action_space = env.action_space

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, *args, **kwargs):
        from pufferlib_tpu.exceptions import EpisodeLimitExceeded
        self.num_episodes += 1
        limit = getattr(self.env, 'bsuite_num_episodes', None)
        if limit is not None and self.num_episodes > limit:
            raise EpisodeLimitExceeded(
                f'bsuite mandates exactly {limit} episodes')
        return self.env.reset(*args, **kwargs)


def make(name='bandit/0', render_mode=None):
    try:
        import bsuite
        from bsuite.utils import gym_wrapper
    except ImportError as e:
        raise ImportError('bsuite is not installed in this image') from e
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    from pufferlib_tpu.postprocess import EpisodeStats
    from pufferlib_tpu.wrappers import GymToGymnasium

    env = bsuite.load_from_id(name)
    env = gym_wrapper.GymFromDMEnv(env)
    env = BSuiteStopper(env)
    env = GymToGymnasium(env)
    env = EpisodeStats(env)
    return GymnasiumPufferEnv(env=env)
