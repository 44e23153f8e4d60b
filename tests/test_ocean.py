"""Ocean env behavioral tests: space contracts, reward logic, episode
structure, and parity checks against the reference semantics
(reference pufferlib/environments/ocean/ocean.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pufferlib_tpu.ocean import ocean


KEY = jax.random.PRNGKey(0)


def test_bandit_solution_parity():
    # reference: np.random.seed(42); np.random.randint(0, n)
    env = ocean.Bandit(num_actions=4, hard_fixed_seed=42)
    np.random.seed(42)
    assert env.solution_idx == np.random.randint(0, 4)


def test_bandit_episode():
    env = ocean.Bandit(num_actions=4, reward_noise=0)
    state, obs = env.reset(KEY)
    assert np.array_equal(np.asarray(obs), [1.0])
    s = env.step(state, jnp.int32(env.solution_idx), KEY)
    assert float(s.reward) == 1.0 and bool(s.done)
    s = env.step(state, jnp.int32((env.solution_idx + 1) % 4), KEY)
    assert float(s.reward) == 0.0 and bool(s.done)


def test_password_solution_parity():
    env = ocean.Password(password_length=5, hard_fixed_seed=42)
    np.random.seed(42)
    expected = np.random.randint(0, 2, size=5).astype(np.float32)
    assert np.array_equal(np.asarray(env.solution), expected)


def test_password_episode():
    env = ocean.Password(password_length=5)
    state, obs = env.reset(KEY)
    assert np.all(np.asarray(obs) == -1)
    solution = np.asarray(env.solution).astype(np.int32)
    for i, digit in enumerate(solution):
        s = env.step(state, jnp.int32(digit), KEY)
        state = s.state
        assert bool(s.done) == (i == 4)
    assert float(s.reward) == 1.0
    assert float(s.info['score']) == 1.0

    # wrong guess on last digit
    state, obs = env.reset(KEY)
    for i, digit in enumerate(solution):
        wrong = 1 - digit if i == 4 else digit
        s = env.step(state, jnp.int32(wrong), KEY)
        state = s.state
    assert float(s.reward) == 0.0


def test_memory_episode_structure():
    env = ocean.Memory(mem_length=2, mem_delay=1)
    assert env.horizon == 5
    state, obs = env.reset(jax.random.PRNGKey(3))
    solution = np.asarray(state['solution'])
    assert np.all(solution[-3:] == -1)
    assert float(obs[0]) == solution[0]
    # play perfect recall
    for t in range(1, env.horizon):
        if t >= env.mem_length + env.mem_delay:
            action = int(solution[t - env.mem_length - env.mem_delay])
        else:
            action = 0
        s = env.step(state, jnp.int32(action), KEY)
        state = s.state
        in_delay = env.mem_length <= t < env.mem_length + env.mem_delay
        assert float(s.reward) == (0.0 if in_delay else 1.0)
    assert bool(s.done)
    assert float(s.info['score']) == 1.0


def test_stochastic_reward():
    env = ocean.Stochastic(p=0.75, horizon=4)
    state, obs = env.reset(KEY)
    # deterministic replica of reference reward logic
    tick = count = 0
    for action in [0, 0, 0, 1]:
        s = env.step(state, jnp.int32(action), KEY)
        state = s.state
        tick += 1
        count += action == 0
        frac = count / tick
        prox = 1 - (0.75 - frac) ** 2
        expected = prox if ((action == 0 and frac < 0.75)
            or (action == 1 and frac >= 0.75)) else 0
        assert abs(float(s.reward) - expected) < 1e-6
    assert bool(s.done)


def test_squared_episode():
    env = ocean.Squared(distance_to_target=1, num_targets=-1)
    assert env.num_targets == 4 and env.max_ticks == 4
    state, obs = env.reset(jax.random.PRNGKey(7))
    grid = np.asarray(obs)
    assert grid.shape == (3, 3)
    assert grid[1, 1] == -1
    assert (grid == 1).sum() == 4
    # every move lands on the perimeter -> reward in {0, 1}, teleports home
    s = env.step(state, jnp.int32(0), KEY)
    assert float(s.reward) in (0.0, 1.0)
    assert np.asarray(s.state['agent_pos']).tolist() == [1, 1]
    # hitting an alive target kills it
    alive_before = np.asarray(state['alive']).sum()
    perim = np.asarray(env.perimeter)
    alive = np.asarray(state['alive'])
    target_idx = np.flatnonzero(alive)[0]
    tx, ty = perim[target_idx]
    # find the move that lands on (tx, ty) from center (1,1)
    moves = ocean.Squared.MOVES
    action = next(i for i, (dx, dy) in enumerate(moves)
        if (1 + dx, 1 + dy) == (tx, ty))
    s = env.step(state, jnp.int32(action), KEY)
    assert float(s.reward) == 1.0
    assert np.asarray(s.state['alive']).sum() == alive_before - 1


def test_squared_full_episode_score():
    env = ocean.Squared(distance_to_target=1, num_targets=1)
    state, obs = env.reset(jax.random.PRNGKey(1))
    perim = np.asarray(env.perimeter)
    target_idx = np.flatnonzero(np.asarray(state['alive']))[0]
    tx, ty = perim[target_idx]
    action = next(i for i, (dx, dy) in enumerate(ocean.Squared.MOVES)
        if (1 + dx, 1 + dy) == (tx, ty))
    s = env.step(state, jnp.int32(action), KEY)
    assert bool(s.done)
    assert float(s.info['score']) == 1.0


def test_spaces_env():
    env = ocean.Spaces()
    state, obs = env.reset(jax.random.PRNGKey(5))
    img_sign = int(np.asarray(obs['image']).sum() > 0)
    flat_sign = int(np.asarray(obs['flat']).sum() > 0)
    s = env.step(state, {'image': jnp.int32(img_sign),
        'flat': jnp.int32(flat_sign)}, KEY)
    assert float(s.reward) == 1.0 and bool(s.done)
    s = env.step(state, {'image': jnp.int32(1 - img_sign),
        'flat': jnp.int32(flat_sign)}, KEY)
    assert float(s.reward) == 0.5


def test_multiagent():
    env = ocean.Multiagent()
    state, obs = env.reset(KEY)
    assert np.asarray(obs).tolist() == [[0.0], [1.0]]
    s = env.step(state, jnp.array([0, 1]), KEY)
    assert np.asarray(s.reward).tolist() == [1.0, 1.0]
    assert np.asarray(s.done).all()
    s = env.step(state, jnp.array([1, 0]), KEY)
    assert np.asarray(s.reward).tolist() == [0.0, 0.0]


def test_envs_are_jittable_and_vmappable():
    for name, ctor in [
            ('squared', lambda: ocean.Squared(2, 3)),
            ('memory', lambda: ocean.Memory(2, 1)),
            ('password', lambda: ocean.Password(5)),
            ('stochastic', lambda: ocean.Stochastic(0.7, 10)),
            ('bandit', lambda: ocean.Bandit(4))]:
        env = ctor()
        keys = jax.random.split(KEY, 8)
        states, obs = jax.jit(jax.vmap(env.reset))(keys)
        actions = jnp.zeros(8, jnp.int32)
        step = jax.jit(jax.vmap(env.step))(states, actions, keys)
        assert jax.tree.leaves(step.obs)[0].shape[0] == 8, name


def test_episode_stats_wrapper():
    from pufferlib_tpu.environment import EpisodeStats
    env = EpisodeStats(ocean.Password(3))
    state, obs = env.reset(KEY)
    total = 0.0
    for i in range(3):
        s = env.step(state, jnp.int32(0), KEY)
        state = s.state
        total += float(s.reward)
    assert bool(s.info['_valid'])
    assert float(s.info['episode_return']) == pytest.approx(total)
    assert int(s.info['episode_length']) == 3


def test_render_all_ocean_envs():
    """render(state) returns ANSI text for a fresh state in every env
    that defines it (reference tests/test_render.py contract)."""
    for name, ctor in [
            ('squared', lambda: ocean.Squared(2, 3)),
            ('memory', lambda: ocean.Memory(2, 1)),
            ('password', lambda: ocean.Password(5))]:
        env = ctor()
        state, obs = env.reset(KEY)
        out = env.render(state)
        assert isinstance(out, str) and len(out) > 0, name


def test_performance_delay_calibrated():
    """Performance delays are anchored to a measured device work rate
    (the reference busy-spins wall seconds, ocean.py:306-328): a
    requested delay must produce steps of at least that duration and
    within ~5x of it (dispatch overhead rides on top)."""
    import time
    from pufferlib_tpu.ocean.ocean import (
        Performance, _calibrate_work_rate)

    assert _calibrate_work_rate() > 0
    delay = 2e-4
    env = Performance(delay_mean=delay)
    state, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(lambda s: env.step(s, jnp.int32(0),
        jax.random.PRNGKey(1)))
    out = step(state)
    float(out.reward)  # compile
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        out = step(out.state)
    float(out.reward)
    per_step = (time.perf_counter() - t0) / n
    assert delay * 0.8 < per_step < delay * 5, per_step
