"""NMMO3 binding (reference pufferlib/environments/nmmo3: a native
PufferEnv that skips emulation — the analog here is a jax-native env,
which third-party nmmo3 does not provide; binding is host-side)."""
import functools

from pufferlib_tpu.environments.nmmo3.policy import Policy  # noqa: F401

Recurrent = dict(input_size=256, hidden_size=256, num_layers=1)


def env_creator(name='nmmo3'):
    return functools.partial(make, name)


def make(name='nmmo3', render_mode=None):
    try:
        import nmmo3  # noqa: F401
    except ImportError as e:
        raise ImportError('nmmo3 is not installed in this image') from e
    raise NotImplementedError('nmmo3 adapter pending')
