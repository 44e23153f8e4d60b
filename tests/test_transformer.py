"""TransformerWrapper (models/transformer.py): the beyond-reference
attention policy family. The load-bearing property is EXACT stepwise /
segment equivalence — the PPO update recomputes rollout logprobs from
per-segment state snapshots (training/ppo.py lstm0 plumbing), so a
slab forward that diverged from the rollout's step-by-step path would
silently corrupt the importance ratios."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pufferlib_tpu.vector as vector
from pufferlib_tpu.models import (
    Default, TransformerPolicy, TransformerWrapper)
from pufferlib_tpu.ocean import env_creator
from pufferlib_tpu.spaces import Discrete
from pufferlib_tpu.training import ppo

OBS = (5,)
ACT = Discrete(3)


def _build(window=4, hidden=32):
    module = TransformerWrapper(
        policy=Default(obs_shape=OBS, action_space=ACT,
            hidden_size=hidden),
        obs_shape=OBS, input_size=hidden, hidden_size=hidden,
        window=window, num_heads=4)
    key = jax.random.PRNGKey(0)
    obs = jax.random.normal(key, (6,) + OBS)
    params = module.init(key, obs)
    return module, params


def test_single_step_shapes():
    module, params = _build()
    B = 6
    obs = jax.random.normal(jax.random.PRNGKey(1), (B,) + OBS)
    state = module.initial_state(B)
    logits, value, state = module.apply(params, obs, state)
    assert logits.shape == (B, ACT.n)
    assert value.shape == (B, 1)
    mem, aux = state
    assert mem.shape == (module.window, B, module.hidden_size)
    assert aux.shape == (1, B, module.hidden_size)


@pytest.mark.parametrize('time_major', [False, True])
def test_step_vs_segment_parity(time_major):
    """T single steps carrying state == one T-length segment call,
    bitwise-close, including across a window wrap (T > window)."""
    module, params = _build(window=4)
    B, T = 6, 7
    obs_seq = jax.random.normal(jax.random.PRNGKey(2), (T, B) + OBS)
    state = module.initial_state(B)

    step_logits, step_values = [], []
    for t in range(T):
        lg, vl, state = module.apply(params, obs_seq[t], state)
        step_logits.append(lg)
        step_values.append(vl)
    step_logits = jnp.stack(step_logits)          # (T, B, A)
    step_values = jnp.stack(step_values)

    seg_state = module.initial_state(B)
    if time_major:
        lg, vl, seg_state = module.apply(params, obs_seq, seg_state,
            time_major=True)
        lg = lg.reshape(T, B, -1)
        vl = vl.reshape(T, B, -1)
    else:
        lg, vl, seg_state = module.apply(params,
            jnp.swapaxes(obs_seq, 0, 1), seg_state)
        lg = jnp.swapaxes(lg.reshape(B, T, -1), 0, 1)
        vl = jnp.swapaxes(vl.reshape(B, T, -1), 0, 1)

    np.testing.assert_allclose(np.asarray(step_logits),
        np.asarray(lg), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(step_values),
        np.asarray(vl), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state[0]),
        np.asarray(seg_state[0]), rtol=1e-6, atol=1e-6)


def test_segment_resumes_from_snapshot():
    """Splitting a rollout at a segment boundary and resuming the
    second segment from the first's final state matches the unbroken
    run — the exact contract the trainer's lstm0 snapshots rely on."""
    module, params = _build(window=4)
    B, T, h = 5, 8, 4
    obs_seq = jax.random.normal(jax.random.PRNGKey(3), (T, B) + OBS)

    full_lg, _, _ = module.apply(params, obs_seq,
        module.initial_state(B), time_major=True)
    full_lg = full_lg.reshape(T, B, -1)

    _, _, mid_state = module.apply(params, obs_seq[:h],
        module.initial_state(B), time_major=True)
    lg2, _, _ = module.apply(params, obs_seq[h:], mid_state,
        time_major=True)
    np.testing.assert_allclose(np.asarray(full_lg[h:]),
        np.asarray(lg2.reshape(T - h, B, -1)), rtol=1e-5, atol=1e-5)


def _memory_trainer(total_epochs, window=8, num_envs=128):
    creator = env_creator('memory')
    vecenv = vector.make(creator,
        env_kwargs=dict(mem_length=2, mem_delay=0),
        backend=vector.Device, num_envs=num_envs)
    obs_shape = vecenv.single_observation_space.shape
    module = TransformerWrapper(
        policy=Default(obs_shape=obs_shape,
            action_space=vecenv.single_action_space, hidden_size=64),
        obs_shape=obs_shape, input_size=64, hidden_size=64,
        window=window, num_heads=4)
    policy = TransformerPolicy(module)
    config = ppo.default_config(env='memory', batch_size=num_envs * 32,
        minibatch_size=num_envs * 8, bptt_horizon=4,
        total_timesteps=num_envs * 32 * total_epochs,
        learning_rate=0.01, ent_coef=0.01, verbose=False,
        data_dir='/tmp/puffer_tpu_test_xf')
    return ppo.create(config, vecenv, policy), config


def test_trainer_integration():
    """TransformerPolicy drops into the unchanged PPO trainer: state
    snapshots thread through the time-slab minibatch path and losses
    stay finite."""
    data, config = _memory_trainer(total_epochs=2, num_envs=32)
    stats, _ = ppo.evaluate(data)
    logs = ppo.train(data)
    assert np.isfinite(float(data.losses['policy_loss']))
    assert np.isfinite(float(data.losses['value_loss']))
    assert float(data.losses['grad_norm']) > 0.0
    ppo.close(data)


@pytest.mark.slow
def test_memory_learns_transformer():
    """The attention window must actually carry information: Memory
    with mem_length=2 is solvable only by recalling two past digits
    (the same fixture the LSTM learning proof uses,
    tests/test_training.py::test_memory_learns_lstm)."""
    data, config = _memory_trainer(total_epochs=60)
    best = 0.0
    while data.global_step < config.total_timesteps:
        stats, _ = ppo.evaluate(data)
        ppo.train(data)
        best = max(best, stats.get('score', 0.0))
        if best > 0.9:
            break
    assert best > 0.9, f'memory never solved (best score {best})'
    ppo.close(data)
