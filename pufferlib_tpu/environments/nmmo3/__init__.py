"""NMMO3 binding (reference pufferlib/environments/nmmo3/environment.py:
19-20): the third-party env ships a NATIVE PufferEnv (`PuffEnv`) with
pre-flattened per-agent arrays that skips emulation entirely; here it
goes through host_env.NativePufferEnv, the host-bridge fast path for
such envs."""
import functools

from pufferlib_tpu.environments.nmmo3.policy import Policy  # noqa: F401

Recurrent = dict(input_size=256, hidden_size=256, num_layers=1)


def env_creator(name='nmmo3'):
    return functools.partial(make, name)


def make(name='nmmo3', width=1024, height=1024, num_envs=1,
        render_mode=None):
    try:
        from nmmo3 import PuffEnv
    except ImportError as e:
        raise ImportError('nmmo3 is not installed in this image') from e
    from pufferlib_tpu.host_env import NativePufferEnv

    env = PuffEnv(width=width, height=height, num_envs=num_envs)
    return NativePufferEnv(env=env)
