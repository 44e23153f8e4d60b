"""Vector engine contracts: Device (vmapped) must be bit-exact vs Serial
(python loop) — the analog of the reference's key equivalence test
(reference tests/test.py:104-160), plus API-misuse FSM checks
(reference tests/test_api.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pufferlib_tpu.vector as vector
from pufferlib_tpu.exceptions import APIUsageError
from pufferlib_tpu.ocean import ocean, env_creator


def random_actions(space_n, batch, rng):
    return rng.randint(0, space_n, size=batch).astype(np.int32)


@pytest.mark.parametrize('name', ['squared', 'password', 'stochastic',
    'memory', 'bandit'])
def test_device_matches_serial(name):
    creator = env_creator(name)
    kwargs = dict(episode_stats=False)
    n = 4
    dev = vector.make(creator, env_kwargs=kwargs, backend=vector.Device,
        num_envs=n, seed=7)
    ser = vector.make(creator, env_kwargs=kwargs, backend=vector.Serial,
        num_envs=n, seed=7)

    obs_d, _ = dev.reset(seed=7)
    obs_s, _ = ser.reset(seed=7)
    assert np.allclose(np.asarray(obs_d), np.asarray(obs_s))

    rng = np.random.RandomState(0)
    atn_n = dev.env.action_space.n
    for t in range(12):
        actions = random_actions(atn_n, n, rng)
        od, rd, dd, td, infd = dev.step(actions)
        os_, rs, ds, ts, infs = ser.step(actions)
        # jitted (fused) vs eager float math differs at ~1e-7; the
        # behavioral contract is equality up to fusion rounding
        assert np.allclose(np.asarray(od), np.asarray(os_),
            atol=1e-5), (name, t)
        assert np.allclose(np.asarray(rd), np.asarray(rs),
            atol=1e-5), (name, t)
        assert np.array_equal(np.asarray(dd), np.asarray(ds)), (name, t)
        assert np.array_equal(np.asarray(td), np.asarray(ts)), (name, t)
        for k in infd:
            assert np.allclose(np.asarray(infd[k]), np.asarray(infs[k]),
                atol=1e-5)


def test_multiagent_device_matches_serial():
    creator = env_creator('multiagent')
    kwargs = dict(episode_stats=False)
    n = 3
    dev = vector.make(creator, env_kwargs=kwargs, backend=vector.Device,
        num_envs=n)
    ser = vector.make(creator, env_kwargs=kwargs, backend=vector.Serial,
        num_envs=n)
    obs_d, _ = dev.reset()
    obs_s, _ = ser.reset()
    assert obs_d.shape == (2 * n, 1)
    assert np.allclose(np.asarray(obs_d), np.asarray(obs_s))
    rng = np.random.RandomState(0)
    for _ in range(4):
        actions = random_actions(2, 2 * n, rng)
        od, rd, dd, td, _ = dev.step(actions)
        os_, rs, ds, ts, _ = ser.step(actions)
        assert np.allclose(np.asarray(od), np.asarray(os_))
        assert np.allclose(np.asarray(rd), np.asarray(rs))
        assert np.array_equal(np.asarray(dd), np.asarray(ds))


def test_spaces_env_through_vector():
    """Dict obs flatten to bytes; dict actions nativize from MultiDiscrete."""
    creator = env_creator('spaces')
    dev = vector.make(creator, env_kwargs=dict(episode_stats=False),
        backend=vector.Device, num_envs=2)
    obs, _ = dev.reset(seed=1)
    assert obs.dtype == jnp.uint8
    # reconstruct and check signs produce reward 1
    native = dev.nativize(obs)
    img_sign = (np.asarray(native['image']).reshape(2, -1).sum(1) > 0)
    flat_sign = (np.asarray(native['flat']).reshape(2, -1).sum(1) > 0)
    actions = np.stack([flat_sign, img_sign], axis=1).astype(np.int32)
    # action columns follow sorted dict keys: flat, image
    _, rew, done, _, infos = dev.step(actions)
    assert np.allclose(np.asarray(rew), 1.0)
    assert np.asarray(done).all()


def test_autoreset_semantics():
    """After done, next step resets: reward 0, done False, fresh obs."""
    creator = env_creator('bandit')
    dev = vector.make(creator, env_kwargs=dict(
        episode_stats=False, reward_noise=0), backend=vector.Device,
        num_envs=2)
    obs, _ = dev.reset()
    _, rew, done, _, _ = dev.step(np.zeros(2, np.int32))
    assert np.asarray(done).all()
    obs, rew, done, _, _ = dev.step(np.zeros(2, np.int32))
    assert not np.asarray(done).any()
    assert np.allclose(np.asarray(rew), 0.0)
    assert np.allclose(np.asarray(obs), 1.0)


def test_api_misuse_errors():
    creator = env_creator('password')
    dev = vector.make(creator, env_kwargs=dict(episode_stats=False),
        backend=vector.Device, num_envs=2)
    with pytest.raises(APIUsageError):
        dev.send(np.zeros(2, np.int32))  # send before reset
    dev.async_reset()
    with pytest.raises(APIUsageError):
        dev.async_reset and dev.send(np.zeros(2, np.int32))
    dev.recv()
    with pytest.raises(APIUsageError):
        dev.recv()  # recv twice
    with pytest.raises(APIUsageError):
        dev.send(np.full(2, 99, np.int32))  # invalid actions

    with pytest.raises(APIUsageError):
        vector.make(creator, num_envs=3, batch_size=2)
    with pytest.raises(APIUsageError):
        vector.make(creator, num_envs=0)


def test_batched_groups():
    """batch_size < num_envs cycles contiguous lane groups."""
    creator = env_creator('stochastic')
    dev = vector.make(creator, env_kwargs=dict(episode_stats=False),
        backend=vector.Device, num_envs=4, batch_size=2)
    dev.async_reset()
    seen = []
    rng = np.random.RandomState(0)
    for _ in range(6):
        obs, rew, done, trunc, infos, ids, mask = dev.recv()
        assert obs.shape[0] == 2
        seen.append(tuple(ids))
        dev.send(random_actions(2, 2, rng))
    assert seen[0] == (0, 1) and seen[1] == (2, 3) and seen[2] == (0, 1)


def test_sync_step_full_batch():
    creator = env_creator('squared')
    dev = vector.make(creator, env_kwargs=dict(episode_stats=False),
        backend=vector.Device, num_envs=8)
    obs, _ = dev.reset()
    assert obs.shape == (8, 7, 7)  # Box obs keep native shape
    rng = np.random.RandomState(0)
    for _ in range(3):
        obs, rew, done, trunc, infos = dev.step(random_actions(8, 8, rng))
        assert obs.shape == (8, 7, 7)
        assert rew.shape == (8,)
