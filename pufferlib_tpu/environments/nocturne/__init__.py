"""Nocturne binding (reference pufferlib/environments/nocturne/environment.py:19-45)."""
import functools


def env_creator(name='nocturne'):
    return functools.partial(make, name)


def make(name='nocturne', render_mode=None):
    try:
        from nocturne.envs.base_env import BaseEnv  # noqa: F401
    except ImportError as e:
        raise ImportError('nocturne is not installed in this image') from e
    raise NotImplementedError(
        'nocturne requires its yaml config; see reference binding')
