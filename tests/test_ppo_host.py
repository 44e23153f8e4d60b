"""Host-env trainer: CartPole via the host bridge, policy/update on the
accelerator (reference clean_pufferl end-to-end flow)."""
import numpy as np
import pytest

gymnasium = pytest.importorskip('gymnasium')

from pufferlib_tpu import vector_host
from pufferlib_tpu.models import Default, LSTMWrapper, Policy, RecurrentPolicy
from pufferlib_tpu.training import ppo, ppo_host


def make_cartpole():
    return gymnasium.make('CartPole-v1')


def make_data(recurrent=False, **cfg):
    vecenv = vector_host.make(make_cartpole,
        backend=vector_host.HostSerial, num_envs=8)
    obs_shape = vecenv.single_observation_space.shape
    atn_space = vecenv.single_action_space
    if recurrent:
        module = LSTMWrapper(
            policy=Default(obs_shape=obs_shape, action_space=atn_space,
                hidden_size=32),
            obs_shape=obs_shape, input_size=32, hidden_size=32)
        policy = RecurrentPolicy(module)
    else:
        policy = Policy(Default(obs_shape=obs_shape,
            action_space=atn_space, hidden_size=32))
    cfg.setdefault('total_timesteps', 1024)
    cfg.setdefault('batch_size', 512)
    config = ppo.default_config(env='cartpole',
        minibatch_size=128, bptt_horizon=8,
        verbose=False, data_dir='/tmp/puffer_host_test', **cfg)
    return ppo_host.create(config, vecenv, policy)


def test_host_trainer_smoke():
    data = make_data()
    stats, infos = ppo_host.evaluate(data)
    assert data.experience.full
    ppo_host.train(data)
    for k in ['policy_loss', 'value_loss', 'entropy', 'approx_kl']:
        assert np.isfinite(data.losses[k]), k
    # another cycle reuses buffers
    ppo_host.evaluate(data)
    ppo_host.train(data)
    assert data.epoch == 2
    ppo_host.close(data)


def test_host_trainer_lstm():
    data = make_data(recurrent=True)
    ppo_host.evaluate(data)
    ppo_host.train(data)
    assert np.isfinite(data.losses.policy_loss)
    assert data.experience.lstm_h.shape == (1, 8, 32)
    ppo_host.close(data)


@pytest.mark.slow
def test_host_trainer_learns_cartpole():
    data = make_data(total_timesteps=512 * 30, batch_size=512,
        learning_rate=5e-3)
    lengths = []
    while data.global_step < data.config.total_timesteps:
        stats, infos = ppo_host.evaluate(data)
        ppo_host.train(data)
        # mean episode length proxy: fraction of non-terminal steps
        lengths.append(1.0 - data.experience.dones.mean())
    assert np.mean(lengths[-5:]) > np.mean(lengths[:5])
    ppo_host.close(data)


def test_recurrent_segments_start_from_rollout_state():
    """BPTT minibatches must start from the LSTM state the rollout had
    at each segment boundary, not zeros (device-path parity; regression
    for silently-biased PPO ratios)."""
    import jax.numpy as jnp
    from pufferlib_tpu.models import Default, LSTMWrapper, RecurrentPolicy

    data = make_data(recurrent=True, batch_size=512,
        total_timesteps=10 ** 9)
    ppo_host.evaluate(data)
    exp = data.experience
    assert exp.lstm_snap, 'no LSTM segment snapshots captured'
    # later segments (t>0) must have nonzero states once the LSTM ran
    nonzero = [k for k, (h, c) in exp.lstm_snap.items()
        if k[1] > 0 and np.abs(h).sum() > 0]
    assert nonzero, 'segment snapshots are all zeros'
    ppo_host.train(data)
    assert np.isfinite(data.losses.policy_loss)


def test_cpu_offload_matches_fused_update():
    """cpu_offload streams minibatches from host RAM through the
    single-minibatch jit (reference clean_pufferl.py:388-391 analog);
    the resulting params must match the fused epoch runner."""
    import jax

    d_off = make_data(seed=5, cpu_offload=True)
    d_ref = make_data(seed=5)
    assert d_off.run_minibatch is not None
    assert d_ref.run_minibatch is None
    ppo_host.evaluate(d_off)
    ppo_host.evaluate(d_ref)
    ppo_host.train(d_off)
    ppo_host.train(d_ref)
    for a, b in zip(jax.tree.leaves(d_off.params),
            jax.tree.leaves(d_ref.params)):
        assert np.allclose(np.asarray(a), np.asarray(b),
            rtol=1e-5, atol=1e-6)
    for k in ('policy_loss', 'value_loss', 'approx_kl'):
        assert np.isclose(float(d_off.losses[k]), float(d_ref.losses[k]),
            rtol=1e-4, atol=1e-5), k
    ppo_host.close(d_off)
    ppo_host.close(d_ref)


def test_cpu_offload_shuffled_minibatches_run():
    """shuffle_minibatches is honored on the offload path (review fix:
    it was silently dropped)."""
    data = make_data(seed=9, cpu_offload=True, shuffle_minibatches=True)
    ppo_host.evaluate(data)
    ppo_host.train(data)
    assert np.isfinite(data.losses.policy_loss)
    ppo_host.close(data)
