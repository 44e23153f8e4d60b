from pufferlib_tpu.environments.test.environment import (
    MOCK_OBSERVATION_SPACES, MOCK_ACTION_SPACES, MockEnv, env_creator,
)

__all__ = ['MOCK_OBSERVATION_SPACES', 'MOCK_ACTION_SPACES', 'MockEnv',
    'env_creator']
