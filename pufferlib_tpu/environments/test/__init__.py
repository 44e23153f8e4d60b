"""Mock env suite. Lazy re-exports (PEP 562): the device-side mock envs
pull in jax, but envpool worker processes unpickle the jax-free host
fixtures from this package and must not pay the jax import."""

__all__ = ['MOCK_OBSERVATION_SPACES', 'MOCK_ACTION_SPACES', 'MockEnv',
    'env_creator']


def __getattr__(name):
    if name in __all__:
        from pufferlib_tpu.environments.test import environment
        return getattr(environment, name)
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
