"""Extra trainer contracts: multiagent envs, fused step/step_many parity,
target_kl early stop, loss metric names (reference clean_pufferl
make_losses :369-378)."""
import numpy as np
import jax
import pytest

import pufferlib_tpu.vector as vector
from pufferlib_tpu.models import Default, Policy
from pufferlib_tpu.ocean import env_creator
from pufferlib_tpu.training import ppo


def make_data(env_name='squared', num_envs=16, **cfg):
    creator = env_creator(env_name)
    vecenv = vector.make(creator, backend=vector.Device, num_envs=num_envs)
    policy = Policy(Default(obs_shape=vecenv.single_observation_space.shape,
        action_space=vecenv.single_action_space, hidden_size=32))
    cfg.setdefault('batch_size', 512 * (2 if env_name == 'multiagent'
        else 1))
    cfg.setdefault('minibatch_size', cfg['batch_size'] // 2)
    config = ppo.default_config(env=env_name, bptt_horizon=8,
        total_timesteps=10 ** 9, verbose=False,
        data_dir='/tmp/puffer_extra_test', **cfg)
    return ppo.create(config, vecenv, policy)


def test_multiagent_fused_trainer():
    data = make_data('multiagent')
    ppo.evaluate(data)
    ppo.train(data)
    assert np.isfinite(data.losses.policy_loss)
    # both agents' rewards flow: multiagent gives 0/1 per agent
    assert 'score' in data.stats


def test_fused_step_matches_split_path():
    d1 = make_data(seed=3, exp_id='fused')
    d2 = make_data(seed=3, exp_id='split')
    ppo.step(d1)
    ppo.evaluate(d2)
    ppo.train(d2)
    for a, b in zip(jax.tree.leaves(d1.params), jax.tree.leaves(d2.params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_step_many_matches_repeated_step():
    d1 = make_data(seed=4, exp_id='many', anneal_lr=False)
    d2 = make_data(seed=4, exp_id='single', anneal_lr=False)
    ppo.step_many(d1, 3)
    for _ in range(3):
        ppo.step(d2)
    assert d1.epoch == d2.epoch == 3
    assert d1.global_step == d2.global_step
    for a, b in zip(jax.tree.leaves(d1.params), jax.tree.leaves(d2.params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_step_losses_fresh_on_read():
    """Reading data.losses/data.stats right after step() must reflect
    THAT step's metrics, even though the fused path keeps them on
    device until the dashboard interval (VERDICT r2 weak #7)."""
    data = make_data(seed=5, exp_id='fresh')
    before = dict(data.losses.items())
    ppo.step(data)
    assert data.pending is not None  # still lazy until read
    after = data.losses
    assert data.pending is None  # attribute access materialized
    assert np.isfinite(after.policy_loss)
    assert dict(after.items()) != before
    # step_many also leaves pending metrics that a read materializes
    ppo.step_many(data, 2)
    assert data.pending is not None
    assert isinstance(data.stats, dict)
    assert data.pending is None


def test_target_kl_freezes_params():
    """target_kl = 0 stops all updates after the first minibatch of the
    first epoch (the stop flag masks everything downstream)."""
    d_stop = make_data(seed=5, exp_id='kl0', target_kl=0.0,
        update_epochs=4)
    d_free = make_data(seed=5, exp_id='klfree', target_kl=None,
        update_epochs=4)
    ppo.step(d_stop)
    ppo.step(d_free)
    diff = [not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(d_stop.params),
            jax.tree.leaves(d_free.params))]
    assert any(diff)  # stopping changed the outcome


def test_loss_metric_names():
    data = make_data()
    ppo.step(data)
    ppo._materialize_metrics(data)
    for k in ['policy_loss', 'value_loss', 'entropy', 'old_approx_kl',
            'approx_kl', 'clipfrac', 'explained_variance']:
        assert k in data.losses


@pytest.mark.slow
def test_spaces_env_trains_fused():
    """Dict obs (mixed dtype -> byte emulation) + Dict action
    (-> MultiDiscrete) through the full fused trainer — the end-to-end
    emulation contract (reference ocean Spaces env, demo 'train within
    minutes')."""
    import pufferlib_tpu.vector as vector
    from pufferlib_tpu.models import Default, Policy
    from pufferlib_tpu.ocean import env_creator
    from pufferlib_tpu.training import ppo

    vecenv = vector.make(env_creator('spaces'), backend=vector.Device,
        num_envs=64)
    policy = Policy(Default(
        obs_shape=vecenv.single_observation_space.shape,
        action_space=vecenv.single_action_space, hidden_size=64,
        emulated=vecenv.emulated))
    config = ppo.default_config(env='spaces', batch_size=2048,
        minibatch_size=512, bptt_horizon=8, total_timesteps=2048 * 40,
        learning_rate=0.02, verbose=False, data_dir='/tmp/spaces_test',
        checkpoint_interval=10 ** 6)
    data = ppo.create(config, vecenv, policy)
    score = None
    while data.global_step < config.total_timesteps:
        ppo.step(data)
    ppo._materialize_metrics(data)
    score = data.stats.get('score')
    # random play scores 0.5; with trace-time nativize the MLP sees
    # true typed values and learns both halves
    assert score is not None and score > 0.8, score


@pytest.mark.slow
def test_conv_policy_trains_fused():
    """NatureCNN on image observations through the fused trainer
    (device-side stand-in for the Atari path)."""
    import numpy as np
    import pufferlib_tpu.vector as vector
    from pufferlib_tpu.environments.test.environment import MockEnv
    from pufferlib_tpu.models import Convolutional, Policy
    from pufferlib_tpu import spaces as sp
    from pufferlib_tpu.training import ppo

    def creator():
        return MockEnv(
            observation_space=sp.Box(low=0, high=255, shape=(4, 36, 36),
                dtype=np.uint8),
            action_space=sp.Discrete(4), episode_length=8)

    vecenv = vector.make(creator, backend=vector.Device, num_envs=16)
    policy = Policy(Convolutional(
        action_space=vecenv.single_action_space, framestack=4,
        flat_size=64 * 1 * 1, hidden_size=128))
    config = ppo.default_config(env='mock_conv', batch_size=512,
        minibatch_size=128, bptt_horizon=8, total_timesteps=512 * 2,
        verbose=False, data_dir='/tmp/conv_test',
        checkpoint_interval=10 ** 6)
    data = ppo.create(config, vecenv, policy)
    ppo.evaluate(data)
    ppo.train(data)
    assert np.isfinite(data.losses.policy_loss)


def test_agent_mask_excludes_dead_agents():
    """Variable-agent-count envs: rows of dead agents are masked out of
    the PPO loss (reference PettingZoo padding + experience.store mask,
    emulation.py:391-418, clean_pufferl.py:437-439)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pufferlib_tpu.vector as vector
    from pufferlib_tpu import spaces as sp
    from pufferlib_tpu.environment import PufferEnv, Step
    from pufferlib_tpu.models import Default, Policy
    from pufferlib_tpu.training import ppo

    class DyingAgents(PufferEnv):
        """2 agents; agent 1 dies after 2 ticks; episode ends at 6."""
        num_agents = 2
        info_spec = {'score': {'shape': (2,), 'dtype': jnp.float32}}

        def __init__(self):
            self.observation_space = sp.Box(low=-1, high=1, shape=(2,))
            self.action_space = sp.Discrete(2)
            self.render_mode = 'ansi'

        def reset(self, key):
            state = dict(tick=jnp.int32(0))
            obs = jnp.zeros((2, 2), jnp.float32)
            return state, obs

        def agent_mask(self, state):
            alive1 = state['tick'] < 2
            return jnp.stack([jnp.bool_(True), alive1])

        def step(self, state, action, key):
            tick = state['tick'] + 1
            done_ep = tick >= 6
            obs = jnp.full((2, 2), tick, jnp.float32) / 6
            reward = jnp.ones(2, jnp.float32)
            done = jnp.stack([done_ep, done_ep])
            info = {'score': jnp.where(done, reward, 0.0)}
            return Step(dict(tick=tick), obs, reward, done,
                jnp.zeros(2, jnp.bool_), info)

    vecenv = vector.make(DyingAgents, backend=vector.Device, num_envs=8)
    policy = Policy(Default(obs_shape=(2,),
        action_space=sp.Discrete(2), hidden_size=32))
    config = ppo.default_config(env='dying', batch_size=16 * 12,
        minibatch_size=16 * 6, bptt_horizon=6, total_timesteps=10 ** 9,
        verbose=False, data_dir='/tmp/mask_test',
        checkpoint_interval=10 ** 6)
    data = ppo.create(config, vecenv, policy)

    c = dict(data.carry)
    c, batch, info_sums, cnt = data.rollout_fn(data.params, c)
    assert 'mask' in batch
    mask = np.asarray(batch['mask'])  # (T, 16 agents)
    # agent columns alternate [a0, a1] per lane; a1 dies when tick >= 2
    a1 = mask[:, 1::2]
    a0 = mask[:, 0::2]
    assert (a0 == 1).all()
    assert a1.min() == 0.0 and a1.max() == 1.0
    # and training consumes the masked batch without error
    p, o, stats = data.update_fn(data.params, data.opt_state, batch,
        jax.random.PRNGKey(0), jnp.float32(1e-3))
    assert np.isfinite(float(stats['policy_loss']))


def test_rollout_batch_stores_flat_obs():
    """The rollout batch must store obs flattened to (T, N, numel):
    TPU pads the minor two dims of every array to tile boundaries, so
    native small spatial shapes like (7,7) inflate the batch ~40x in
    HBM (docs/PERF.md item 11). Guards the layout optimization."""
    import jax
    import pufferlib_tpu.vector as vector
    from pufferlib_tpu.models import Default, Policy
    from pufferlib_tpu.ocean import env_creator
    from pufferlib_tpu.training import ppo

    vecenv = vector.make(env_creator('squared'), backend=vector.Device,
        num_envs=16)
    obs_shape = vecenv.single_observation_space.shape
    assert len(obs_shape) == 2  # squared obs are a 2-D grid
    policy = Policy(Default(obs_shape=obs_shape,
        action_space=vecenv.single_action_space, hidden_size=32))
    config = ppo.default_config(env='squared', batch_size=512,
        minibatch_size=256, bptt_horizon=8, total_timesteps=1024,
        verbose=False, data_dir='/tmp/puffer_tpu_test')
    data = ppo.create(config, vecenv, policy)
    _, batch, _, _ = data.rollout_fn(data.params, data.carry)
    T = 512 // 16
    assert batch['obs'].shape == (T, 16, int(np.prod(obs_shape)))
    vecenv.close()


def test_lstm_time_major_matches_batch_major():
    """LSTMWrapper(time_major=True) on (T, B, obs) input produces the
    transpose-permutation of the batch-major outputs and identical
    final states (the transpose-free update path relies on this)."""
    import jax.numpy as jnp
    from pufferlib_tpu import spaces
    from pufferlib_tpu.models import Default, LSTMWrapper

    obs_shape = (5,)
    B, T = 6, 4
    module = LSTMWrapper(
        policy=Default(obs_shape=obs_shape,
            action_space=spaces.Discrete(3), hidden_size=16),
        obs_shape=obs_shape, input_size=16, hidden_size=16,
        use_pallas=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T) + obs_shape)
    params = module.init(jax.random.PRNGKey(1), x)
    lo_b, v_b, (h_b, c_b) = module.apply(params, x)
    lo_t, v_t, (h_t, c_t) = module.apply(
        params, jnp.swapaxes(x, 0, 1), time_major=True)
    A = lo_b.shape[-1]
    assert np.allclose(np.asarray(lo_t).reshape(T, B, A).swapaxes(0, 1),
        np.asarray(lo_b).reshape(B, T, A), atol=1e-5)
    assert np.allclose(np.asarray(v_t).reshape(T, B).swapaxes(0, 1),
        np.asarray(v_b).reshape(B, T), atol=1e-5)
    assert np.allclose(np.asarray(h_t), np.asarray(h_b), atol=1e-5)
    assert np.allclose(np.asarray(c_t), np.asarray(c_b), atol=1e-5)


def make_lstm_data(num_envs=16, batch_size=512, minibatch_size=128,
        bptt=8, **cfg):
    """Recurrent trainer with minibatch geometry hitting the time-slab
    path (num_minibatches == T // bptt)."""
    from pufferlib_tpu.models import LSTMWrapper, RecurrentPolicy
    creator = env_creator('memory')
    vecenv = vector.make(creator, backend=vector.Device,
        num_envs=num_envs)
    obs_shape = vecenv.single_observation_space.shape
    module = Default(obs_shape=obs_shape,
        action_space=vecenv.single_action_space, hidden_size=32)
    policy = RecurrentPolicy(LSTMWrapper(policy=module,
        obs_shape=obs_shape, input_size=32, hidden_size=32))
    config = ppo.default_config(env='memory', batch_size=batch_size,
        minibatch_size=minibatch_size, bptt_horizon=bptt,
        total_timesteps=10 ** 9, verbose=False,
        data_dir='/tmp/puffer_slab_test', **cfg)
    return ppo.create(config, vecenv, policy)


@pytest.mark.slow
def test_lstm_time_slab_minibatches_train():
    """Time-slab geometry (T=32, h=8, M=4): fused step trains with the
    transpose-free path; the flag-off path also trains; both produce
    finite losses and identical minibatch COUNT semantics."""
    d_slab = make_lstm_data(seed=7, exp_id='slab')
    ppo.step(d_slab)
    assert np.isfinite(d_slab.losses.policy_loss)

    d_ref = make_lstm_data(seed=7, exp_id='noslab',
        lstm_time_slab_minibatches=False)
    ppo.step(d_ref)
    assert np.isfinite(d_ref.losses.policy_loss)
    # same data budget consumed either way
    assert d_slab.global_step == d_ref.global_step


def test_lstm_slab_inactive_when_geometry_mismatch():
    """num_minibatches != T//h falls back to the segment-major path
    and still trains."""
    # T = 512/16 = 32, h=8 -> n_seg=4, but M = 512/256 = 2 != 4
    data = make_lstm_data(minibatch_size=256, seed=9, exp_id='mismatch')
    ppo.step(data)
    assert np.isfinite(data.losses.policy_loss)


def test_lstm_bptt_horizon_one_trains():
    """bptt_horizon=1 hits the LSTMWrapper T==1 fast path through the
    time-major minibatch layout; regression for a trace-time crash
    (the cell indexed the batch axis as time on time-major input)."""
    data = make_lstm_data(bptt=1, minibatch_size=128, seed=13,
        exp_id='bptt1')
    ppo.step(data)
    assert np.isfinite(data.losses.policy_loss)


def test_model_axis_requires_non_pallas_lstm():
    """A 'model' mesh axis with a Pallas-capable LSTMWrapper must fail
    fast at create() with APIUsageError, not deep inside GSPMD."""
    from pufferlib_tpu.exceptions import APIUsageError
    from pufferlib_tpu.models import LSTMWrapper, RecurrentPolicy
    from pufferlib_tpu.parallel import make_mesh_2d

    creator = env_creator('memory')
    vecenv = vector.make(creator, backend=vector.Device, num_envs=16)
    obs_shape = vecenv.single_observation_space.shape
    module = Default(obs_shape=obs_shape,
        action_space=vecenv.single_action_space, hidden_size=32)
    policy = RecurrentPolicy(LSTMWrapper(policy=module,
        obs_shape=obs_shape, input_size=32, hidden_size=32))
    config = ppo.default_config(env='memory', batch_size=512,
        minibatch_size=128, bptt_horizon=8, total_timesteps=2048,
        verbose=False, data_dir='/tmp/puffer_tpu_test')
    with pytest.raises(APIUsageError, match='use_pallas'):
        ppo.create(config, vecenv, policy, mesh=make_mesh_2d(4, 2))
    vecenv.close()


def test_track_history_on_fused_path():
    """The sweep objective's series must populate on the fused step()
    path when track_history is set, even with no verbose/wandb sink."""
    data = make_data(seed=11, exp_id='hist-on', track_history=True)
    data.profile.interval = 0.0  # fire the metrics interval every step
    for _ in range(2):
        ppo.step(data)
    assert len(data.stats_history) >= 1
    d2 = make_data(seed=11, exp_id='hist-off')
    for _ in range(2):
        ppo.step(d2)
    assert d2.pending is not None  # no sink: metrics stayed lazy
