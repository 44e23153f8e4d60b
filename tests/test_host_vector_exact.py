"""The reference's central vectorization contract for the HOST path:
Serial and Multiprocessing backends must produce BYTE-IDENTICAL
obs/rewards/terminals to N raw envs stepped manually with cloned
auto-reset semantics (reference tests/test.py:104-160, across the mock
space grid). The manual loop is an independent re-implementation of
the stepping order — it never touches the vector backends."""
import functools

import numpy as np
import pytest

from pufferlib_tpu import vector_host
from pufferlib_tpu.environments.test.host_fixtures import (
    GymnasiumTestEnv, PettingZooTestEnv)
from pufferlib_tpu.host_env import GymnasiumPufferEnv, PettingZooPufferEnv

COMBOS = [
    ('box', 'discrete'),
    ('image', 'multidiscrete'),
    ('dict_mixed', 'discrete'),
    ('tuple_nested', 'dict_discrete'),
]
NUM_ENVS = 3
STEPS = 13  # crosses the 5-step episode boundary twice (auto-reset)


def _creator(obs_name, atn_name):
    return GymnasiumPufferEnv(env=GymnasiumTestEnv(obs_name, atn_name))


def _actions(vec, rng):
    space = vec.single_action_space
    shape = getattr(space, 'shape', ())
    n = vec.num_agents
    if shape:
        nvec = np.asarray(space.nvec)
        return np.stack([rng.randint(0, nvec) for _ in range(n)])
    return rng.randint(0, space.n, n)


def _manual_rollout(obs_name, atn_name, action_log, seed):
    """Independently step raw puffer envs replicating HostSerial's
    auto-reset order: reset(seed+i) up front; per send, done envs reset
    (unseeded) instead of stepping."""
    envs = [GymnasiumPufferEnv(env=GymnasiumTestEnv(obs_name, atn_name))
        for _ in range(NUM_ENVS)]
    stream = []
    obs0 = [env.reset(seed=seed + i)[0] for i, env in enumerate(envs)]
    stream.append((np.stack([np.asarray(o).ravel() for o in obs0]),
        np.zeros(NUM_ENVS, np.float32), np.zeros(NUM_ENVS, bool)))
    for actions in action_log:
        obs, rew, term = [], [], []
        for i, env in enumerate(envs):
            if env.done:
                o, _ = env.reset()
                r, t = 0.0, False
            else:
                o, r, t, trunc, _ = env.step(actions[i])
            obs.append(np.asarray(o).ravel())
            rew.append(r)
            term.append(t)
        stream.append((np.stack(obs), np.asarray(rew, np.float32),
            np.asarray(term, bool)))
    return stream


@pytest.mark.parametrize('obs_name,atn_name', COMBOS)
def test_host_serial_byte_exact_vs_manual(obs_name, atn_name):
    creator = functools.partial(_creator, obs_name, atn_name)
    vec = vector_host.make(creator, num_envs=NUM_ENVS,
        backend=vector_host.HostSerial)
    rng = np.random.RandomState(0)
    obs, _ = vec.reset(seed=11)
    action_log = []
    stream = [(np.array([np.asarray(o).ravel() for o in obs]),
        np.zeros(NUM_ENVS, np.float32), np.zeros(NUM_ENVS, bool))]
    for _ in range(STEPS):
        actions = _actions(vec, rng)
        action_log.append(np.asarray(actions).copy())
        obs, rew, term, trunc, _ = vec.step(actions)
        stream.append((np.array([np.asarray(o).ravel() for o in obs]),
            np.asarray(rew, np.float32).copy(),
            np.asarray(term, bool).copy()))
    vec.close()

    manual = _manual_rollout(obs_name, atn_name, action_log, seed=11)
    for t, ((vo, vr, vt), (mo, mr, mt)) in enumerate(zip(stream, manual)):
        assert vo.tobytes() == mo.tobytes(), f'{obs_name} obs t={t}'
        assert np.array_equal(vr, mr), f'{obs_name} rew t={t}'
        assert np.array_equal(vt, mt), f'{obs_name} term t={t}'


@pytest.mark.parametrize('obs_name,atn_name', COMBOS[:2])
def test_host_multiprocessing_byte_exact_vs_manual(obs_name, atn_name):
    creator = functools.partial(_creator, obs_name, atn_name)
    vec = vector_host.make(creator, num_envs=NUM_ENVS,
        num_workers=NUM_ENVS, backend=vector_host.HostMultiprocessing)
    rng = np.random.RandomState(0)
    obs, _ = vec.reset(seed=11)
    action_log = []
    stream = [(np.array([np.asarray(o).ravel() for o in obs]),
        np.zeros(NUM_ENVS, np.float32), np.zeros(NUM_ENVS, bool))]
    for _ in range(STEPS):
        actions = _actions(vec, rng)
        action_log.append(np.asarray(actions).copy())
        obs, rew, term, trunc, _ = vec.step(actions)
        stream.append((np.array([np.asarray(o).ravel() for o in obs]),
            np.asarray(rew, np.float32).copy(),
            np.asarray(term, bool).copy()))
    vec.close()

    manual = _manual_rollout(obs_name, atn_name, action_log, seed=11)
    for t, ((vo, vr, vt), (mo, mr, mt)) in enumerate(zip(stream, manual)):
        assert vo.tobytes() == mo.tobytes(), f'{obs_name} obs t={t}'
        assert np.array_equal(vr, mr), f'{obs_name} rew t={t}'
        assert np.array_equal(vt, mt), f'{obs_name} term t={t}'


def test_pettingzoo_host_serial_byte_exact_vs_manual():
    """Same contract for the pettingzoo bridge incl. dead-agent padding
    (reference tests/test.py:173-200)."""
    def creator():
        return PettingZooPufferEnv(env=PettingZooTestEnv('box',
            'discrete'))

    vec = vector_host.make(creator, num_envs=2,
        backend=vector_host.HostSerial)
    rng = np.random.RandomState(1)
    obs, _ = vec.reset(seed=5)
    action_log = []
    stream = [np.asarray(obs).copy()]
    rew_stream = []
    for _ in range(STEPS):
        actions = rng.randint(0, 4, vec.num_agents)
        action_log.append(actions.copy())
        obs, rew, term, trunc, _ = vec.step(actions)
        stream.append(np.asarray(obs).copy())
        rew_stream.append(np.asarray(rew, np.float32).copy())
    vec.close()

    envs = [PettingZooPufferEnv(env=PettingZooTestEnv('box', 'discrete'))
        for _ in range(2)]
    m_obs0 = []
    for i, env in enumerate(envs):
        o, _ = env.reset(seed=5 + i)
        m_obs0.extend(np.asarray(o[a]).ravel() for a in (1, 2))
    assert np.array_equal(stream[0],
        np.stack(m_obs0).reshape(stream[0].shape))
    for t, actions in enumerate(action_log):
        rows, rews = [], []
        for i, env in enumerate(envs):
            atns = actions[2 * i:2 * i + 2]
            if env.done:
                o, _ = env.reset()
                r = {1: 0.0, 2: 0.0}
            else:
                o, r, te, tr, _ = env.step(atns)
            rows.extend(np.asarray(o[a]).ravel() for a in (1, 2))
            rews.extend(r[a] for a in (1, 2))
        assert np.array_equal(stream[t + 1],
            np.stack(rows).reshape(stream[t + 1].shape)), f't={t}'
        assert np.allclose(rew_stream[t], rews), f't={t}'
