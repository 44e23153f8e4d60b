"""Device-engine equivalence against INDEPENDENTLY-AUTHORED env logic:
batched rollouts through vector.Device must match N reference Ocean
envs (/root/reference/.../ocean.py) stepped manually in a python loop
with puffer autoreset semantics (after done, the next step is a reset
yielding reward 0, done False).

This closes the shared-env-code blind spot of tests/test_vector.py
(where Device and Serial both run the SAME jax env logic): here the
comparison side is the reference's numpy/python implementation
(reference tests/test.py:104-160 is the analogous contract).

Deterministic-reset envs (Password/Bandit hard_fixed_seed, Stochastic
no-RNG) compare across MULTIPLE autoreset boundaries; Squared injects
the reference-sampled targets per lane (as test_reference_parity does
single-env) and compares until each lane's first done.
"""
import importlib.util
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pufferlib_tpu.vector as vector
from pufferlib_tpu.ocean import env_creator, ocean as ocean_repo

REF_PATH = '/root/reference/pufferlib/environments/ocean/ocean.py'


@pytest.fixture(scope='module')
def ref():
    spec = importlib.util.spec_from_file_location(
        'ref_ocean_dev', REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules['ref_ocean_dev'] = mod
    spec.loader.exec_module(mod)
    return mod


def _rollout_vs_reference(dev, ref_envs, atn_n, steps, seed=0,
        compare_obs=True):
    """Step the Device engine and the reference python loop together.
    Reference side clones the puffer autoreset convention (reference
    vector.py:147-151 / multi_env.py:104-107)."""
    n = len(ref_envs)
    rng = np.random.RandomState(seed)
    ref_obs = []
    for e in ref_envs:
        o, _ = e.reset()
        ref_obs.append(np.array(o, np.float32, copy=True))
    obs_d, _ = dev.reset()
    if compare_obs:
        assert np.allclose(np.asarray(obs_d, np.float64),
            np.stack(ref_obs).reshape(np.asarray(obs_d).shape),
            atol=1e-6), 'reset obs'

    done_flags = [False] * n
    for t in range(steps):
        actions = rng.randint(0, atn_n, size=n).astype(np.int32)
        od, rd, dd, td, _ = dev.step(actions)
        od, rd, dd = (np.asarray(od, np.float64), np.asarray(rd),
            np.asarray(dd))
        for i, e in enumerate(ref_envs):
            if done_flags[i]:
                ro, _ = e.reset()
                rr, rdone = 0.0, False
            else:
                ro, rr, rdone, _, _ = e.step(int(actions[i]))
            if compare_obs:
                assert np.allclose(od[i].ravel(),
                    np.asarray(ro, np.float64).ravel(),
                    atol=1e-6), (t, i)
            assert np.allclose(float(rd[i]), float(rr), atol=1e-6), (t, i)
            assert bool(dd[i]) == bool(rdone), (t, i)
            done_flags[i] = rdone


def test_password_batched_rollout(ref):
    """hard_fixed_seed makes every reset identical, so the comparison
    runs across several autoreset boundaries (ref ocean.py:228-282)."""
    n = 4
    dev = vector.make(env_creator('password'),
        env_kwargs=dict(episode_stats=False), backend=vector.Device,
        num_envs=n)
    refs = [ref.Password(password_length=5) for _ in range(n)]
    # 5-step episodes x several generations
    _rollout_vs_reference(dev, refs, atn_n=2, steps=23)


def test_bandit_batched_rollout(ref):
    n = 3
    refs = [ref.Bandit(num_actions=4, reward_scale=1, reward_noise=0)
        for _ in range(n)]
    dev = vector.make(env_creator('bandit'),
        env_kwargs=dict(episode_stats=False, reward_noise=0,
            num_actions=4),
        backend=vector.Device, num_envs=n)
    _rollout_vs_reference(dev, refs, atn_n=4, steps=9)


def test_stochastic_batched_rollout(ref):
    n = 4
    horizon = 10
    dev = vector.make(env_creator('stochastic'),
        env_kwargs=dict(episode_stats=False, p=0.7, horizon=horizon),
        backend=vector.Device, num_envs=n)
    refs = [ref.Stochastic(p=0.7, horizon=horizon) for _ in range(n)]
    # constant zero obs; rewards/dones carry the behavior
    _rollout_vs_reference(dev, refs, atn_n=2, steps=3 * horizon + 4)


def test_squared_batched_rollout_injected(ref):
    """Inject each lane's reference-sampled targets into the Device
    engine's batched state, then compare full-grid obs/reward/done per
    lane until that lane's first done (autoreset resamples with jax RNG
    afterwards, so comparison stops there; the multi-episode contract
    is covered by the deterministic envs above)."""
    n, d = 4, 3
    dev = vector.make(env_creator('squared'),
        env_kwargs=dict(episode_stats=False, distance_to_target=d,
            num_targets=1),
        backend=vector.Device, num_envs=n)
    j = dev.env
    refs = [ref.Squared(distance_to_target=d, num_targets=1)
        for _ in range(n)]
    dev.reset()

    perim_index = {tuple(p): i for i, p in enumerate(j.perimeter)}
    chosen = np.zeros((n, len(j.perimeter)), bool)
    for i, e in enumerate(refs):
        e.reset(seed=200 + i)
        for t_xy in e.targets:
            chosen[i, perim_index[t_xy]] = True

    # overwrite the batched lane states with the injected episodes
    state = dict(dev._state.env)
    assert set(state) >= {'chosen', 'alive', 'agent_pos', 'tick'}
    state['chosen'] = jnp.asarray(chosen)
    state['alive'] = jnp.asarray(chosen)
    state['agent_pos'] = jnp.tile(
        jnp.array([[d, d]], jnp.int32), (n, 1))
    state['tick'] = jnp.zeros(n, state['tick'].dtype)
    dev._state.env = state
    dev._state.done = jnp.zeros_like(dev._state.done)

    rng = np.random.RandomState(11)
    live = [True] * n
    compared = 0
    while any(live):
        actions = rng.randint(0, 8, size=n).astype(np.int32)
        od, rd, dd, td, _ = dev.step(actions)
        od, rd, dd = np.asarray(od), np.asarray(rd), np.asarray(dd)
        for i, e in enumerate(refs):
            if not live[i]:
                continue
            ro, rr, rdone, _, _ = e.step(int(actions[i]))
            assert np.allclose(od[i].astype(np.float64),
                np.asarray(ro, np.float64), atol=1e-6), i
            assert np.allclose(float(rd[i]), float(rr), atol=1e-6), i
            assert bool(dd[i]) == bool(rdone), i
            compared += 1
            if rdone:
                live[i] = False
    assert compared >= n  # every lane contributed steps
