"""DeepMind Lab binding (reference pufferlib/environments/dm_lab)."""
import functools


def env_creator(name='seekavoid_arena_01'):
    return functools.partial(make, name)


def make(name='seekavoid_arena_01', render_mode=None):
    try:
        import deepmind_lab  # noqa: F401
    except ImportError as e:
        raise ImportError('deepmind_lab is not installed') from e
    raise NotImplementedError('dm_lab adapter pending')
