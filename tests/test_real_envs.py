"""Integration against REAL third-party envs available in this image:
gymnasium CartPole through the host bridge + host trainer (the
wrap-one-line UX bar, reference examples/puffer_ppo_minihack.py), and a
pettingzoo classic env through PettingZooPufferEnv.
"""
import numpy as np
import pytest

import pufferlib_tpu.vector_host as vector_host
from pufferlib_tpu.environments import classic_control


pytestmark = pytest.mark.filterwarnings('ignore')


def test_cartpole_host_bridge_steps():
    creator = classic_control.env_creator('cartpole')
    v = vector_host.make(creator, backend=vector_host.HostSerial,
        num_envs=4)
    obs, _ = v.reset(seed=0)
    assert obs.shape == (4, 4) and obs.dtype == np.float32
    for _ in range(20):
        obs, rew, term, trunc, infos = v.step(
            np.random.randint(0, 2, 4).astype(np.int64))
    v.close()


@pytest.mark.slow
def test_cartpole_learns_host_trainer():
    """End-to-end: real gymnasium env -> host envpool -> TPU/CPU PPO.
    CartPole 'learns' = mean episode length clearly above random (~22)."""
    from pufferlib_tpu.models import Default, Policy
    from pufferlib_tpu.training import ppo_host

    creator = classic_control.env_creator('cartpole')
    v = vector_host.make(creator, backend=vector_host.HostSerial,
        num_envs=16)
    policy = Policy(Default(obs_shape=v.single_observation_space.shape,
        action_space=v.single_action_space, hidden_size=64))
    config = ppo_host.default_config(env='cartpole', batch_size=2048,
        minibatch_size=512, bptt_horizon=8, total_timesteps=2048 * 20,
        learning_rate=2.5e-3, anneal_lr=False, verbose=False,
        data_dir='/tmp/cartpole_test', checkpoint_interval=10 ** 6)
    data = ppo_host.create(config, v, policy)
    stats = {}
    while data.global_step < config.total_timesteps:
        s, _ = ppo_host.evaluate(data)
        ppo_host.train(data)
        stats = s or stats
    assert stats.get('episode_length', 0) > 40, stats


def test_pettingzoo_tictactoe_bridge():
    """pettingzoo classic env through PettingZooPufferEnv: padded agent
    set, flat obs, MultiDiscrete actions."""
    from pettingzoo.classic import tictactoe_v3
    from pettingzoo.utils.conversions import turn_based_aec_to_parallel
    from pufferlib_tpu.host_env import PettingZooPufferEnv
    from pufferlib_tpu.wrappers import PettingZooTruncatedWrapper

    raw = turn_based_aec_to_parallel(tictactoe_v3.env())
    env = PettingZooPufferEnv(env=PettingZooTruncatedWrapper(raw))
    obs, infos = env.reset(seed=0)
    assert set(obs.keys()) == set(env.possible_agents)
    first = env.possible_agents[0]
    assert obs[first].ndim == 1  # flattened Dict space


def test_dm_control_adapter():
    """Real dm_control suite env through our dm_env->gymnasium adapter
    (Dict obs -> flat f64, continuous actions -> MultiDiscrete bins)."""
    pytest.importorskip('dm_control')
    from pufferlib_tpu.environments import dm_control as dmc

    env = dmc.env_creator('walker_walk')()
    obs, _ = env.reset(seed=0)
    assert obs.ndim == 1  # flattened Dict of f64 leaves
    nvec = env.action_space.nvec
    total = 0.0
    for _ in range(5):
        a = np.random.randint(0, nvec[0], len(nvec)).astype(np.int64)
        obs, r, term, trunc, info = env.step(a)
        total += r
    assert np.isfinite(total)
    env.close()


def test_dm_control_host_vectorized():
    pytest.importorskip('dm_control')
    from pufferlib_tpu.environments import dm_control as dmc

    v = vector_host.make(dmc.env_creator('cartpole-balance'),
        backend=vector_host.HostSerial, num_envs=2)
    obs, _ = v.reset(seed=0)
    assert obs.shape[0] == 2
    acts = np.zeros((2, len(v.single_action_space.nvec)), np.int64)
    obs, rew, term, trunc, _ = v.step(acts)
    assert np.isfinite(rew).all()
    v.close()
