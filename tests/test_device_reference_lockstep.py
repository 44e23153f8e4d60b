"""Batched Device engine vs the ACTUAL reference Ocean envs.

tests/test_reference_parity.py pins single-env step semantics to the
reference implementation; tests/test_vector.py pins Device == Serial but
both sides share the repo's env code (the common-mode blind spot called
out in round 2). This suite closes that gap: the reference Ocean envs
(/root/reference/pufferlib/environments/ocean/ocean.py) are driven by a
hand-written python loop that clones the reference Serial backend's
auto-reset contract (reference vector.py:147-151: a done env's next send
resets it — action discarded, reward 0, done False), and the repo envs
are driven THROUGH `vector.Device` — vmapped, jitted, autoreset folded
into the step program — over multiple lanes with decorrelated action
streams crossing several episode boundaries. Every step's
obs/reward/terminal/truncation must match per lane.

Only reset-deterministic reference envs qualify (no RNG to inject
mid-rollout, since Device's autoreset resets inside the jitted step):
Bandit/Password (hard_fixed_seed), Stochastic and Multiagent (no reset
RNG). Bandit's one-step episodes autoreset every step — the hardest
exercise of the boundary semantics.
"""
import importlib.util
import sys

import numpy as np
import pytest

import pufferlib_tpu.vector as vector
from pufferlib_tpu.ocean import ocean as ocean_repo

REF_PATH = '/root/reference/pufferlib/environments/ocean/ocean.py'


@pytest.fixture(scope='module')
def ref():
    spec = importlib.util.spec_from_file_location(
        'ref_ocean_device', REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules['ref_ocean_device'] = mod
    spec.loader.exec_module(mod)
    return mod


def drive_reference_serial(envs, action_streams, steps):
    """Step N independent reference envs with reference-Serial autoreset
    semantics (reference vector.py:147-151). Returns per-step stacked
    (obs, rew, term, trunc) lists."""
    for e in envs:
        e.reset()
    env_done = [False] * len(envs)
    out = []
    for t in range(steps):
        obs_t, rew_t, term_t, trunc_t = [], [], [], []
        for i, e in enumerate(envs):
            if env_done[i]:
                o, _ = e.reset()
                r, tm, tc = 0.0, False, False
            else:
                o, r, tm, tc, _ = e.step(int(action_streams[i][t]))
            env_done[i] = bool(tm) or bool(tc)
            obs_t.append(np.array(o, np.float32, copy=True).ravel())
            rew_t.append(float(r))
            term_t.append(bool(tm))
            trunc_t.append(bool(tc))
        out.append((np.stack(obs_t), np.asarray(rew_t, np.float32),
            np.asarray(term_t), np.asarray(trunc_t)))
    return out


def drive_device(creator, n, action_streams, steps, batch_size=None):
    """Roll the repo env through vector.Device; returns the same per-step
    tuples, rows ordered by absolute lane id."""
    vec = vector.Device(creator, num_envs=n, batch_size=batch_size)
    vec.async_reset(seed=0)
    apl = vec.agents_per_env
    groups = vec.num_groups
    obs = rew = term = trunc = None
    # strict recv/send alternation over round-robin lane groups; each
    # group's k-th recv (k >= 1) carries the result of its step k-1
    total = (steps + 1) * groups
    for it in range(total):
        o, r, tm, tc, _, ids, _ = vec.recv()
        g = it % groups
        k = it // groups
        if obs is None:
            obs_dim = int(np.prod(np.asarray(o).shape[1:])) or 1
            obs = np.zeros((steps, n * apl, obs_dim), np.float32)
            rew = np.zeros((steps, n * apl), np.float32)
            term = np.zeros((steps, n * apl), bool)
            trunc = np.zeros((steps, n * apl), bool)
        if k >= 1:
            t = k - 1
            rows = slice(g * vec.batch_envs * apl,
                (g + 1) * vec.batch_envs * apl)
            assert np.array_equal(np.asarray(ids),
                np.arange(rows.start, rows.stop))
            obs[t, rows] = np.asarray(o, np.float32).reshape(-1, obs_dim)
            rew[t, rows] = np.asarray(r)
            term[t, rows] = np.asarray(tm)
            trunc[t, rows] = np.asarray(tc)
        if it == total - 1:
            break
        # the FSM demands a send between recvs; past-the-end sends (the
        # drain of the final results) replay the last action, discarded
        ai = min(k, steps - 1)
        lanes = range(g * vec.batch_envs, (g + 1) * vec.batch_envs)
        acts = np.concatenate([
            np.repeat(action_streams[i][ai:ai + 1], apl) for i in lanes])
        vec.send(acts.astype(np.int32))
    vec.close()
    return obs, rew, term, trunc


def _compare(name, ref_steps, dev):
    obs_d, rew_d, term_d, trunc_d = dev
    for t, (o, r, tm, tc) in enumerate(ref_steps):
        tag = f'{name} t={t}'
        assert np.allclose(obs_d[t].reshape(o.shape), o, atol=1e-6), tag
        assert np.allclose(rew_d[t], r, atol=1e-6), tag
        assert np.array_equal(term_d[t], tm), tag
        assert np.array_equal(trunc_d[t], tc), tag


def test_password_device_lockstep(ref):
    n, steps, L = 4, 17, 5
    rng = np.random.RandomState(3)
    streams = [rng.randint(0, 2, steps) for _ in range(n)]
    ref_steps = drive_reference_serial(
        [ref.Password(password_length=L) for _ in range(n)], streams, steps)
    dev = drive_device(
        lambda: ocean_repo.Password(password_length=L), n, streams, steps)
    _compare('password', ref_steps, dev)


def test_password_device_lockstep_async(ref):
    """batch_size < num_envs: round-robin lane groups must still match."""
    n, steps, L = 4, 12, 3
    rng = np.random.RandomState(5)
    streams = [rng.randint(0, 2, steps) for _ in range(n)]
    ref_steps = drive_reference_serial(
        [ref.Password(password_length=L) for _ in range(n)], streams, steps)
    dev = drive_device(
        lambda: ocean_repo.Password(password_length=L), n, streams, steps,
        batch_size=2)
    _compare('password-async', ref_steps, dev)


def test_stochastic_device_lockstep(ref):
    n, steps, H = 4, 23, 7
    rng = np.random.RandomState(7)
    streams = [rng.randint(0, 2, steps) for _ in range(n)]
    ref_steps = drive_reference_serial(
        [ref.Stochastic(p=0.75, horizon=H) for _ in range(n)],
        streams, steps)
    dev = drive_device(
        lambda: ocean_repo.Stochastic(p=0.75, horizon=H), n, streams, steps)
    _compare('stochastic', ref_steps, dev)


def test_bandit_device_lockstep(ref):
    """One-step episodes: every other send is an autoreset."""
    n, steps, A = 4, 9, 4
    rng = np.random.RandomState(11)
    streams = [rng.randint(0, A, steps) for _ in range(n)]
    ref_steps = drive_reference_serial(
        [ref.Bandit(num_actions=A, reward_scale=1, reward_noise=0)
            for _ in range(n)], streams, steps)
    dev = drive_device(
        lambda: ocean_repo.Bandit(num_actions=A, reward_scale=1,
            reward_noise=0), n, streams, steps)
    _compare('bandit', ref_steps, dev)


def test_multiagent_device_lockstep(ref):
    """2 agents/lane through Device vs the pettingzoo reference env with
    manual padding; one-step episodes, all-done autoreset."""
    n, steps = 3, 6
    rng = np.random.RandomState(13)
    # per-lane per-agent action streams
    acts = rng.randint(0, 2, size=(n, steps, 2))

    envs = [ref.Multiagent() for _ in range(n)]
    for e in envs:
        e.reset()
    env_done = [False] * n
    ref_out = []
    for t in range(steps):
        obs_t, rew_t, term_t = [], [], []
        for i, e in enumerate(envs):
            if env_done[i]:
                o, _ = e.reset()
                r = {1: 0.0, 2: 0.0}
                tm = {1: False, 2: False}
            else:
                o, r, tm, _, _ = e.step(
                    {1: int(acts[i, t, 0]), 2: int(acts[i, t, 1])})
            env_done[i] = all(tm.values())
            obs_t.append(np.stack([np.asarray(o[1], np.float32),
                np.asarray(o[2], np.float32)]))
            rew_t.append([float(r[1]), float(r[2])])
            term_t.append([bool(tm[1]), bool(tm[2])])
        ref_out.append((np.concatenate(obs_t),
            np.asarray(rew_t, np.float32).ravel(),
            np.asarray(term_t).ravel()))

    vec = vector.Device(ocean_repo.Multiagent, num_envs=n)
    vec.reset(seed=0)
    for t in range(steps):
        flat = acts[:, t, :].ravel().astype(np.int32)
        o, r, tm, tc, _ = vec.step(flat)
        o_ref, r_ref, tm_ref = ref_out[t]
        tag = f'multiagent t={t}'
        assert np.allclose(np.asarray(o, np.float32).reshape(
            o_ref.shape), o_ref, atol=1e-6), tag
        assert np.allclose(np.asarray(r), r_ref, atol=1e-6), tag
        assert np.array_equal(np.asarray(tm), tm_ref), tag
    vec.close()
