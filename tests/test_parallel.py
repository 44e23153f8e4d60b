"""Multi-device sharding: training on an 8-device CPU mesh must work and
agree with single-device training (the analog of the reference's
multi-backend equivalence contract, extended to the mesh)."""
import numpy as np
import jax
import pytest

import pufferlib_tpu.vector as vector
from pufferlib_tpu.models import Default, LSTMWrapper, Policy, RecurrentPolicy
from pufferlib_tpu.ocean import env_creator
from pufferlib_tpu.parallel import make_mesh
from pufferlib_tpu.training import ppo


def make_data(mesh=None, recurrent=False, seed=3, **cfg):
    creator = env_creator('squared')
    vecenv = vector.make(creator, backend=vector.Device, num_envs=16)
    obs_shape = vecenv.single_observation_space.shape
    atn_space = vecenv.single_action_space
    # use_pallas=False: model-axis meshes require the XLA path (GSPMD
    # cannot partition a pallas_call) and ppo.create enforces it
    if recurrent:
        module = LSTMWrapper(
            policy=Default(obs_shape=obs_shape, action_space=atn_space,
                hidden_size=32),
            obs_shape=obs_shape, input_size=32, hidden_size=32,
            use_pallas=False)
        policy = RecurrentPolicy(module)
    else:
        policy = Policy(Default(obs_shape=obs_shape,
            action_space=atn_space, hidden_size=32, use_pallas=False))
    config = ppo.default_config(env='squared', batch_size=512,
        minibatch_size=256, bptt_horizon=8, total_timesteps=2048,
        verbose=False, seed=seed, data_dir='/tmp/puffer_tpu_test',
        **cfg)
    return ppo.create(config, vecenv, policy, mesh=mesh)


def test_mesh_training_runs():
    assert len(jax.devices()) == 8, 'conftest should give 8 CPU devices'
    mesh = make_mesh(8)
    data = make_data(mesh=mesh)
    ppo.evaluate(data)
    ppo.train(data)
    assert np.isfinite(data.losses.policy_loss)
    # env lanes really sharded across devices
    leaf = jax.tree.leaves(data.carry['env'])[0]
    assert len(leaf.sharding.device_set) == 8


def test_mesh_training_lstm():
    mesh = make_mesh(8)
    data = make_data(mesh=mesh, recurrent=True)
    ppo.evaluate(data)
    ppo.train(data)
    assert np.isfinite(data.losses.policy_loss)


def test_mesh_matches_single_device():
    # the mesh path keeps the agent-major minibatch layout; disable the
    # single-device contiguous fast path so both run the identical
    # algorithm and must agree bitwise
    mesh = make_mesh(8)
    d_mesh = make_data(mesh=mesh, seed=11)
    d_single = make_data(mesh=None, seed=11,
        mlp_contiguous_minibatches=False)
    ppo.evaluate(d_mesh)
    ppo.evaluate(d_single)
    ppo.train(d_mesh)
    ppo.train(d_single)
    for a, b in zip(jax.tree.leaves(d_mesh.params),
            jax.tree.leaves(d_single.params)):
        assert np.allclose(np.asarray(a), np.asarray(b),
            rtol=1e-4, atol=1e-5)


def test_host_sharded_batch_single_process():
    """make_array_from_process_local_data path: per-host rows become a
    globally sharded array (single-process degenerate case here; the
    same call shards across processes on a pod)."""
    import numpy as np
    from pufferlib_tpu.parallel import global_mesh, host_sharded_batch

    mesh = global_mesh()
    n = len(jax.devices())
    local = {
        'obs': np.arange(n * 4 * 3, dtype=np.float32).reshape(n * 4, 3),
        'rew': np.ones(n * 4, np.float32),
    }
    arr = host_sharded_batch(local, mesh)
    assert arr['obs'].shape == (n * 4, 3)
    assert len(arr['obs'].sharding.device_set) == n
    assert np.allclose(np.asarray(arr['obs']), local['obs'])


def test_tensor_parallel_2d_mesh():
    """2-D (env x model) mesh: param hidden dims shard over the model
    axis (the reference has NO model parallelism — SURVEY.md 2.4; this
    is TPU-native headroom for large policies). Training must run, and
    the kernels must actually be laid out across the model axis."""
    from pufferlib_tpu.parallel import make_mesh_2d

    mesh = make_mesh_2d(4, 2)
    data = make_data(mesh=mesh, seed=5)
    ppo.evaluate(data)
    ppo.train(data)
    assert np.isfinite(data.losses.policy_loss)
    # at least one 2-D kernel is genuinely split over the model axis:
    # its per-device shard is smaller than the full leaf
    split = [
        p for p in jax.tree.leaves(data.params)
        if p.ndim >= 2 and any(
            s.data.shape != p.shape for s in p.addressable_shards)
    ]
    assert split, 'no param leaf sharded over the model axis'
    # env lanes still sharded over the env axis
    leaf = jax.tree.leaves(data.carry['env'])[0]
    assert len(leaf.sharding.device_set) >= 4


def test_tensor_parallel_matches_replicated():
    """TP must compute the same algorithm: losses after one
    evaluate+train agree with the pure-DP (replicated-param) run up to
    reduction-order rounding."""
    from pufferlib_tpu.parallel import make_mesh_2d
    mesh2 = make_mesh_2d(2, 4)
    d_tp = make_data(mesh=mesh2, seed=17)
    d_dp = make_data(mesh=make_mesh(8), seed=17)
    ppo.evaluate(d_tp)
    ppo.evaluate(d_dp)
    ppo.train(d_tp)
    ppo.train(d_dp)
    assert np.isfinite(d_tp.losses.policy_loss)
    assert np.allclose(d_tp.losses.policy_loss, d_dp.losses.policy_loss,
        rtol=1e-3, atol=1e-4)
    for a, b in zip(jax.tree.leaves(d_tp.params),
            jax.tree.leaves(d_dp.params)):
        assert np.allclose(np.asarray(a), np.asarray(b),
            rtol=1e-3, atol=1e-4)
