"""Procgen binding (reference pufferlib/environments/procgen/environment.py:22-76):
native ProcgenEnv vec -> single env + reward normalize/clip.
Policy: ProcgenResnet (reference procgen/torch.py)."""
import functools

from pufferlib_tpu.models import ProcgenResnet as Policy  # noqa: F401


def env_creator(name='bigfish'):
    return functools.partial(make, name)


def make(name='bigfish', num_levels=0, start_level=0,
        distribution_mode='easy', render_mode=None):
    try:
        from procgen import ProcgenEnv
    except ImportError as e:
        raise ImportError('procgen is not installed in this image') from e
    import gymnasium
    import numpy as np
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    from pufferlib_tpu.postprocess import EpisodeStats

    venv = ProcgenEnv(num_envs=1, env_name=name, num_levels=num_levels,
        start_level=start_level, distribution_mode=distribution_mode)

    class SingleFromVec(gymnasium.Env):
        observation_space = gymnasium.spaces.Box(
            0, 255, venv.observation_space['rgb'].shape, np.uint8)
        action_space = gymnasium.spaces.Discrete(venv.action_space.n)

        def reset(self, seed=None, options=None):
            obs = venv.reset()
            return obs['rgb'][0], {}

        def step(self, action):
            obs, rew, done, info = venv.step(np.array([action]))
            r = float(np.clip(rew[0], -10, 10))
            return obs['rgb'][0], r, bool(done[0]), False, info[0]

    env = EpisodeStats(SingleFromVec())
    return GymnasiumPufferEnv(env=env)
