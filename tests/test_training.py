"""End-to-end trainer tests: the fused PPO program runs, losses are
finite, metrics have the reference names, checkpoints roundtrip, and
squared actually learns (reference 'train within minutes' sanity,
ocean/README.md)."""
import numpy as np
import jax
import pytest

import pufferlib_tpu.vector as vector
from pufferlib_tpu.models import Default, LSTMWrapper, Policy, RecurrentPolicy
from pufferlib_tpu.ocean import env_creator
from pufferlib_tpu.training import ppo


def make_data(env_name='squared', recurrent=False, num_envs=16,
        batch_size=1024, minibatch_size=512, bptt_horizon=8, **cfg):
    creator = env_creator(env_name)
    vecenv = vector.make(creator, backend=vector.Device, num_envs=num_envs)
    obs_shape = vecenv.single_observation_space.shape
    atn_space = vecenv.single_action_space
    if recurrent:
        module = LSTMWrapper(
            policy=Default(obs_shape=obs_shape, action_space=atn_space,
                hidden_size=64),
            obs_shape=obs_shape, input_size=64, hidden_size=64)
        policy = RecurrentPolicy(module)
    else:
        module = Default(obs_shape=obs_shape, action_space=atn_space,
            hidden_size=64)
        policy = Policy(module)
    cfg.setdefault('data_dir', '/tmp/puffer_tpu_test')
    cfg.setdefault('total_timesteps', batch_size * 4)
    config = ppo.default_config(env=env_name, batch_size=batch_size,
        minibatch_size=minibatch_size, bptt_horizon=bptt_horizon,
        verbose=False, **cfg)
    return ppo.create(config, vecenv, policy)


def test_ppo_smoke_mlp():
    data = make_data()
    stats, infos = ppo.evaluate(data)
    assert data.global_step == 1024
    ppo.train(data)
    losses = data.losses
    for k in ['policy_loss', 'value_loss', 'entropy', 'approx_kl',
            'clipfrac', 'old_approx_kl', 'explained_variance']:
        assert np.isfinite(losses[k]), k
    # second epoch reuses compiled programs
    ppo.evaluate(data)
    ppo.train(data)
    assert data.epoch == 2
    ppo.close(data)


def test_ppo_smoke_lstm():
    data = make_data(recurrent=True)
    ppo.evaluate(data)
    ppo.train(data)
    assert np.isfinite(data.losses.policy_loss)
    h, c = data.carry['lstm']
    assert h.shape == (1, 16, 64)


def test_ppo_updates_params():
    data = make_data()
    before = jax.tree.map(np.asarray, data.params)
    ppo.evaluate(data)
    ppo.train(data)
    after = jax.tree.map(np.asarray, data.params)
    changed = any(not np.allclose(a, b) for a, b in zip(
        jax.tree.leaves(before), jax.tree.leaves(after)))
    assert changed


def test_ppo_deterministic_given_seed():
    d1 = make_data(seed=5, exp_id='det1')
    d2 = make_data(seed=5, exp_id='det2')
    ppo.evaluate(d1)
    ppo.evaluate(d2)
    ppo.train(d1)
    ppo.train(d2)
    for a, b in zip(jax.tree.leaves(d1.params), jax.tree.leaves(d2.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip(tmp_path):
    from pufferlib_tpu.training import checkpoint as ckpt
    data = make_data(data_dir=str(tmp_path), exp_id='ckpt_test')
    ppo.evaluate(data)
    ppo.train(data)
    ckpt.save_checkpoint(data)
    params_before = jax.tree.map(np.asarray, data.params)
    step_before = data.global_step

    data2 = make_data(data_dir=str(tmp_path), exp_id='ckpt_test')
    assert ckpt.try_load_checkpoint(data2)
    assert data2.global_step == step_before
    for a, b in zip(jax.tree.leaves(params_before),
            jax.tree.leaves(data2.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_memory_learns_lstm():
    """The recurrent trainer must actually learn a memory task: Memory
    with mem_length=2 requires carrying two digits across the episode,
    which only the LSTM state can do (reference ocean README 'train
    within minutes'; config.yaml memory section). Converges in ~18
    epochs; 60 is the give-up budget."""
    creator = env_creator('memory')
    vecenv = vector.make(creator,
        env_kwargs=dict(mem_length=2, mem_delay=0),
        backend=vector.Device, num_envs=128)
    obs_shape = vecenv.single_observation_space.shape
    module = LSTMWrapper(
        policy=Default(obs_shape=obs_shape,
            action_space=vecenv.single_action_space, hidden_size=64),
        obs_shape=obs_shape, input_size=64, hidden_size=64)
    policy = RecurrentPolicy(module)
    config = ppo.default_config(env='memory', batch_size=4096,
        minibatch_size=1024, bptt_horizon=4,
        total_timesteps=4096 * 60, learning_rate=0.01, ent_coef=0.01,
        verbose=False, data_dir='/tmp/puffer_tpu_test')
    data = ppo.create(config, vecenv, policy)
    best = 0.0
    while data.global_step < config.total_timesteps:
        stats, _ = ppo.evaluate(data)
        ppo.train(data)
        best = max(best, stats.get('score', 0.0))
        if best > 0.9:
            break
    assert best > 0.9, f'memory never solved (best score {best})'
    ppo.close(data)


@pytest.mark.slow
def test_squared_learns():
    """Score on squared should clearly exceed random play after a short
    training run (reference: squared trains in ~30k steps on CPU)."""
    data = make_data(env_name='squared', num_envs=64, batch_size=8192,
        minibatch_size=2048, bptt_horizon=8, total_timesteps=8192 * 12,
        learning_rate=0.017, ent_coef=0.01, anneal_lr=True)
    scores = []
    while data.global_step < data.config.total_timesteps:
        stats, _ = ppo.evaluate(data)
        if 'score' in stats:
            scores.append(stats['score'])
        ppo.train(data)
    assert scores[-1] > scores[0] + 0.1 or scores[-1] > 0.8, scores


def _learn(env_name, env_kwargs, lr, epochs, threshold, batch=4096,
        num_envs=128, bptt=4):
    creator = env_creator(env_name)
    vecenv = vector.make(creator, env_kwargs=env_kwargs,
        backend=vector.Device, num_envs=num_envs)
    policy = Policy(Default(
        obs_shape=vecenv.single_observation_space.shape,
        action_space=vecenv.single_action_space, hidden_size=64))
    config = ppo.default_config(env=env_name, batch_size=batch,
        minibatch_size=batch // 4, bptt_horizon=bptt,
        total_timesteps=batch * epochs, learning_rate=lr,
        verbose=False, data_dir='/tmp/puffer_tpu_test')
    data = ppo.create(config, vecenv, policy)
    best = 0.0
    while data.global_step < config.total_timesteps:
        stats, _ = ppo.evaluate(data)
        ppo.train(data)
        best = max(best, stats.get('score', 0.0))
        if best > threshold:
            break
    ppo.close(data)
    assert best > threshold, f'{env_name} best score {best}'


@pytest.mark.slow
def test_password_learns():
    """Password: latch onto the sparse exact-match reward (reference
    ocean README 'train within minutes')."""
    _learn('password', dict(password_length=3), lr=0.02, epochs=60,
        threshold=0.9)


@pytest.mark.slow
def test_stochastic_learns():
    """Stochastic: learn a MIXED policy (play 0 with p=0.75) — fails
    for any argmax-deterministic learner."""
    _learn('stochastic', dict(p=0.75, horizon=100), lr=0.01, epochs=30,
        threshold=0.95)


@pytest.mark.slow
def test_bandit_learns():
    """Bandit: find the fixed solution arm."""
    _learn('bandit', dict(num_actions=4), lr=0.02, epochs=20,
        threshold=0.85)
