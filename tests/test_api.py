"""APIUsageError contracts (reference tests/test_api.py): protocol
misuse fails loudly with clear errors, for both the device engine and
the host bridge, and the trainer validates its batch geometry."""
import numpy as np
import pytest

import pufferlib_tpu.vector as vector
import pufferlib_tpu.vector_host as vector_host
from pufferlib_tpu.exceptions import APIUsageError
from pufferlib_tpu.models import Default, Policy
from pufferlib_tpu.ocean import env_creator
from pufferlib_tpu.training import ppo


def _vecenv(n=4):
    return vector.make(env_creator('squared'), backend=vector.Device,
        num_envs=n)


def test_send_before_reset():
    v = _vecenv()
    with pytest.raises(APIUsageError):
        v.send(np.zeros(4, np.int32))


def test_recv_twice():
    v = _vecenv()
    v.async_reset(seed=1)
    v.recv()
    with pytest.raises(APIUsageError):
        v.recv()


def test_out_of_range_actions():
    v = _vecenv()
    v.reset(seed=1)
    with pytest.raises(APIUsageError):
        v.step(np.full(4, 99, np.int32))


def test_bad_batch_size_divisibility():
    with pytest.raises(APIUsageError):
        vector.make(env_creator('squared'), backend=vector.Device,
            num_envs=6, batch_size=4)


def test_trainer_geometry_contracts():
    v = _vecenv(8)
    policy = Policy(Default(obs_shape=v.single_observation_space.shape,
        action_space=v.single_action_space, hidden_size=32))
    # batch not divisible by agents
    cfg = ppo.default_config(env='squared', batch_size=100,
        minibatch_size=50, bptt_horizon=5, verbose=False,
        data_dir='/tmp/api_test')
    with pytest.raises(APIUsageError):
        ppo.create(cfg, v, policy)
    # minibatch not divisible by bptt_horizon
    cfg = ppo.default_config(env='squared', batch_size=128,
        minibatch_size=40, bptt_horizon=16, verbose=False,
        data_dir='/tmp/api_test')
    with pytest.raises(APIUsageError):
        ppo.create(cfg, v, policy)


def test_train_before_evaluate():
    v = _vecenv(8)
    policy = Policy(Default(obs_shape=v.single_observation_space.shape,
        action_space=v.single_action_space, hidden_size=32))
    cfg = ppo.default_config(env='squared', batch_size=128,
        minibatch_size=64, bptt_horizon=16, verbose=False,
        data_dir='/tmp/api_test')
    data = ppo.create(cfg, v, policy)
    with pytest.raises(APIUsageError):
        ppo.train(data)


class _TinyGym:
    def __init__(self):
        import gymnasium
        self.observation_space = gymnasium.spaces.Box(
            low=0, high=1, shape=(2,), dtype=np.float32)
        self.action_space = gymnasium.spaces.Discrete(2)
        self.render_mode = None

    def reset(self, seed=None, options=None):
        return np.zeros(2, np.float32), {}

    def step(self, action):
        return np.zeros(2, np.float32), 0.0, False, False, {}

    def close(self):
        pass


def _host_creator():
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    return GymnasiumPufferEnv(env=_TinyGym())


def test_host_env_step_before_reset():
    env = _host_creator()
    with pytest.raises(APIUsageError):
        env.step(np.int64(0))


def test_host_vector_protocol_fsm():
    v = vector_host.make(_host_creator, backend=vector_host.HostSerial,
        num_envs=2)
    with pytest.raises(APIUsageError):
        v.recv()
    v.async_reset(seed=0)
    v.recv()
    with pytest.raises(APIUsageError):
        v.recv()
    v.close()
