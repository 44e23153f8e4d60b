"""Reference-lockstep Ocean parity suite.

Loads the ACTUAL reference ocean module
(/root/reference/pufferlib/environments/ocean/ocean.py — imports only
gymnasium/pettingzoo/numpy, all present in this image) and steps each
reference env against the jax rewrite in lockstep for fixed action
sequences, asserting per-step obs/reward/done/score equality
(ref ocean.py:8-582; BASELINE.md "exact match to reference").

Where the reference samples at reset with numpy/python global RNG
(Memory solutions, Spaces observations, Squared targets), the sampled
values are injected into the jax state so the comparison is exact; envs
with hard_fixed_seed (Bandit, Password) or no RNG (Multiagent,
Stochastic) compare with no injection. This also de-risks the
Device-vs-Serial equivalence tests' shared-env-code blind spot
(tests/test_vector.py): env semantics are now pinned to an independent
implementation.
"""
import importlib.util
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pufferlib_tpu import ocean as ocean_repo

REF_PATH = '/root/reference/pufferlib/environments/ocean/ocean.py'


@pytest.fixture(scope='module')
def ref():
    spec = importlib.util.spec_from_file_location('ref_ocean', REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules['ref_ocean'] = mod
    spec.loader.exec_module(mod)
    return mod


KEY = jax.random.PRNGKey(0)


def _np(x):
    return np.asarray(jax.device_get(x))


def _assert_step(tag, r_obs, r_rew, r_done, r_info, j_step):
    """Compare one reference step against one jax Step."""
    assert np.allclose(np.ravel(_np(j_step.obs)).astype(np.float64),
        np.ravel(np.asarray(r_obs, np.float64)), atol=1e-6), tag
    assert np.allclose(float(np.sum(_np(j_step.reward)))
        if np.ndim(_np(j_step.reward)) else float(_np(j_step.reward)),
        float(r_rew), atol=1e-6), tag
    assert bool(np.all(_np(j_step.done))) == bool(r_done), tag
    if 'score' in r_info:
        j_score = float(np.sum(_np(j_step.info['score']))) \
            if np.ndim(_np(j_step.info.get('score'))) \
            else float(_np(j_step.info['score']))
        assert np.allclose(j_score, float(r_info['score']), atol=1e-6), tag


def test_bandit_lockstep(ref):
    """Bandit: hard_fixed_seed makes the solution arm identical; every
    action must yield identical reward/score (ref ocean.py:8-62)."""
    for num_actions in (2, 4, 7):
        r = ref.Bandit(num_actions=num_actions)
        j = ocean_repo.ocean.Bandit(num_actions=num_actions)
        r.reset()
        state, obs = j.reset(KEY)
        for action in range(num_actions):
            r.reset()
            r_obs, r_rew, r_done, _, r_info = r.step(action)
            step = j.step(state, jnp.int32(action), KEY)
            _assert_step(f'bandit a={action}', r_obs, r_rew, r_done,
                r_info, step)


def test_password_lockstep(ref):
    """Password: hard seed -> identical solution; full episodes over
    several guess patterns incl. the correct one (ref :228-281)."""
    for length in (3, 5, 8):
        r = ref.Password(password_length=length)
        j = ocean_repo.ocean.Password(password_length=length)
        r.reset()
        assert np.allclose(j.solution, r.solution), 'injected solutions'
        rng = np.random.RandomState(1)
        patterns = [rng.randint(0, 2, length) for _ in range(4)]
        patterns.append(r.solution.astype(np.int64))  # the solve
        for pat in patterns:
            r.reset()
            state, j_obs = j.reset(KEY)
            for t, action in enumerate(pat):
                r_obs, r_rew, r_done, _, r_info = r.step(int(action))
                step = j.step(state, jnp.int32(action), KEY)
                state = step.state
                _assert_step(f'password t={t}', r_obs, r_rew, r_done,
                    r_info, step)


def test_memory_lockstep(ref):
    """Memory: inject the reference's sampled solution into jax state,
    then lockstep full episodes (ref :64-123)."""
    for mem_length, mem_delay in ((1, 0), (2, 1), (3, 2)):
        r = ref.Memory(mem_length=mem_length, mem_delay=mem_delay)
        j = ocean_repo.ocean.Memory(mem_length=mem_length,
            mem_delay=mem_delay)
        rng = np.random.RandomState(2)
        for episode in range(4):
            r_obs0, _ = r.reset(seed=episode)
            state = dict(
                solution=jnp.asarray(r.solution, jnp.float32),
                submission=jnp.full(j.horizon, -1.0, jnp.float32),
                tick=jnp.int32(1),
            )
            assert np.allclose(float(np.ravel(r_obs0)[0])
                if np.ndim(r_obs0) else float(r_obs0),
                float(_np(state['solution'])[0]))
            for t in range(1, r.horizon):
                action = int(rng.randint(0, 2))
                r_obs, r_rew, r_done, _, r_info = r.step(action)
                step = j.step(state, jnp.int32(action), KEY)
                state = step.state
                _assert_step(
                    f'memory L={mem_length} D={mem_delay} t={t}',
                    r_obs, r_rew, r_done, r_info, step)


def test_multiagent_lockstep(ref):
    """Multiagent: dict-keyed reference vs padded-array jax env; all 4
    joint actions (ref :149-208)."""
    r = ref.Multiagent()
    j = ocean_repo.ocean.Multiagent()
    for a1 in (0, 1):
        for a2 in (0, 1):
            r.reset()
            state, obs = j.reset(KEY)
            r_obs, r_rew, r_done, r_trunc, r_info = r.step({1: a1, 2: a2})
            step = j.step(state, jnp.asarray([a1, a2]), KEY)
            assert np.allclose(_np(step.obs).ravel(),
                np.concatenate([r_obs[1], r_obs[2]]))
            assert np.allclose(_np(step.reward),
                [r_rew[1], r_rew[2]]), (a1, a2)
            assert bool(np.all(_np(step.done))) == (
                r_done[1] and r_done[2])
            assert np.allclose(_np(step.info['score']),
                [r_info[1]['score'], r_info[2]['score']])


def test_spaces_lockstep(ref):
    """Spaces: inject the reference's sampled Dict observation, compare
    rewards for all 4 structured actions (ref :356-404)."""
    r = ref.Spaces()
    j = ocean_repo.ocean.Spaces()
    for episode in range(4):
        np.random.seed(episode)
        r_obs0, _ = r.reset()
        image = jnp.asarray(r_obs0['image'])
        flat = jnp.asarray(r_obs0['flat'])
        state = dict(
            obs={'image': image, 'flat': flat},
            image_sign=jnp.sum(image) > 0,
            flat_sign=jnp.sum(flat) > 0,
        )
        assert bool(state['image_sign']) == bool(r.image_sign)
        assert bool(state['flat_sign']) == bool(r.flat_sign)
        for ai in (0, 1):
            for af in (0, 1):
                r.observation = r_obs0  # reference keeps obs across done
                r_obs, r_rew, r_done, _, r_info = r.step(
                    {'image': ai, 'flat': af})
                step = j.step(state, {'image': jnp.int32(ai),
                    'flat': jnp.int32(af)}, KEY)
                assert np.allclose(float(_np(step.reward)), r_rew), (
                    episode, ai, af)
                assert bool(_np(step.done)) == r_done
                assert np.allclose(
                    float(_np(step.info['score'])), r_info['score'])


def test_stochastic_lockstep(ref):
    """Stochastic: deterministic env, full horizon lockstep for several
    p values (ref :529-582)."""
    for p, horizon in ((0.75, 50), (0.3, 80)):
        r = ref.Stochastic(p=p, horizon=horizon)
        j = ocean_repo.ocean.Stochastic(p=p, horizon=horizon)
        rng = np.random.RandomState(3)
        r.reset(seed=0)
        state, _ = j.reset(KEY)
        for t in range(horizon):
            action = int(rng.randint(0, 2))
            r_obs, r_rew, r_done, _, r_info = r.step(action)
            step = j.step(state, jnp.int32(action), KEY)
            state = step.state
            _assert_step(f'stochastic p={p} t={t}', r_obs, r_rew,
                r_done, r_info, step)


def test_squared_lockstep(ref):
    """Squared: inject the reference's sampled targets into the jax
    state, lockstep full episodes comparing the FULL GRID observation,
    reward, done and score every step (ref :406-527)."""
    for d, n in ((1, -1), (2, 3), (4, 1)):
        r = ref.Squared(distance_to_target=d, num_targets=n)
        j = ocean_repo.ocean.Squared(distance_to_target=d, num_targets=n)
        # perimeter enumeration order must match for index injection
        assert [tuple(p) for p in j.perimeter] == r.possible_targets
        rng = np.random.RandomState(4)
        for episode in range(5):
            r.reset(seed=100 + episode)
            perim_index = {tuple(p): i
                for i, p in enumerate(j.perimeter)}
            chosen = np.zeros(len(j.perimeter), bool)
            for t_xy in r.targets:
                chosen[perim_index[t_xy]] = True
            state = dict(
                chosen=jnp.asarray(chosen),
                alive=jnp.asarray(chosen),
                agent_pos=jnp.array([d, d], jnp.int32),
                tick=jnp.int32(0),
            )
            obs = j._obs(state['chosen'], state['agent_pos'])
            assert np.allclose(_np(obs), r.grid), 'reset obs'
            done = False
            t = 0
            while not done:
                action = int(rng.randint(0, 8))
                r_obs, r_rew, r_done, _, r_info = r.step(action)
                step = j.step(state, jnp.int32(action), KEY)
                state = step.state
                _assert_step(f'squared d={d} n={n} ep={episode} t={t}',
                    r_obs, r_rew, r_done, r_info, step)
                done = r_done
                t += 1


def test_performance_lockstep(ref):
    """Performance probes: constant-obs contract at zero delay. The
    reference __init__ drops delay_mean/delay_std (ocean.py:306-316 never
    assigns them — step would AttributeError), so they are set here
    explicitly before stepping."""
    r = ref.Performance(delay_mean=0, delay_std=0, bandwidth=3)
    r.delay_mean = r.delay_std = 0
    j = ocean_repo.ocean.Performance(delay_mean=0, delay_std=0,
        bandwidth=3)
    r.reset()
    state, j_obs = j.reset(KEY)
    assert _np(j_obs).shape == r.observation.shape
    for t in range(3):
        r_obs, r_rew, r_done, _, _ = r.step(0)
        step = j.step(state, jnp.int32(0), KEY)
        state = step.state
        assert float(_np(step.reward)) == r_rew == 0
        assert bool(_np(step.done)) == r_done is False

    r2 = ref.PerformanceEmpiric(count_n=10, count_std=0, bandwidth=3)
    j2 = ocean_repo.ocean.PerformanceEmpiric(count_n=10, count_std=0,
        bandwidth=3)
    r2.reset()
    state2, _ = j2.reset(KEY)
    r_obs, r_rew, r_done, _, _ = r2.step(0)
    step = j2.step(state2, jnp.int32(0), KEY)
    assert float(_np(step.reward)) == r_rew == 0
    assert bool(_np(step.done)) == r_done is False


def test_spaces_match_reference(ref):
    """Observation/action space shapes and dtypes line up env by env."""
    pairs = [
        (ref.Bandit(), ocean_repo.ocean.Bandit()),
        (ref.Memory(), ocean_repo.ocean.Memory()),
        (ref.Password(), ocean_repo.ocean.Password()),
        (ref.Squared(), ocean_repo.ocean.Squared()),
        (ref.Stochastic(), ocean_repo.ocean.Stochastic()),
    ]
    for r, j in pairs:
        assert tuple(r.observation_space.shape) == tuple(
            j.observation_space.shape), type(r).__name__
        assert r.action_space.n == j.action_space.n, type(r).__name__
