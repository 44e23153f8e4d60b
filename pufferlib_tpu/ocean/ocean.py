"""Ocean: first-party micro-environments, pure JAX.

Functional rewrites of the reference suite
(/root/reference/pufferlib/environments/ocean/ocean.py): Bandit (:8),
Memory (:64), Multiagent (:149), Password (:228), Performance (:306),
PerformanceEmpiric (:330), Spaces (:356), Squared (:406), Stochastic
(:529). Same observation/action spaces, reward logic, episode structure
and info['score'] semantics; state lives in pytrees so thousands of
copies run as one vmapped XLA program.

RNG mapping: the reference uses numpy's global MT19937. Envs with a
hard_fixed_seed (Bandit, Password) precompute the identical solution on
the host with numpy at construction — bit-exact parity. Per-reset
randomness (Memory, Spaces, Squared) uses counter-based JAX PRNG keys;
distributionally identical, documented here as the seed mapping.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from pufferlib_tpu import spaces
from pufferlib_tpu.environment import PufferEnv, Step


def _render_blocks(vals):
    """Shared ANSI block renderer (1 -> blue, 0 -> red, else gray)."""
    chars = []
    for val in np.asarray(vals).ravel():
        if val == 1:
            c = 94
        elif val == 0:
            c = 91
        else:
            c = 90
        chars.append(f'\033[{c}m██\033[0m')
    return ''.join(chars)


class Bandit(PufferEnv):
    """Multi-armed bandit. One-step episodes; the solution arm is fixed by
    hard_fixed_seed across all instances (reference ocean.py:8-62)."""

    info_spec = {'score': {'dtype': jnp.float32}}

    def __init__(self, num_actions=4, reward_scale=1, reward_noise=0,
            hard_fixed_seed=42):
        self.num_actions = num_actions
        self.reward_scale = reward_scale
        self.reward_noise = reward_noise
        # Bit-exact parity with the reference's np.random.seed(seed);
        # np.random.randint(0, n) at every reset (a constant).
        rng = np.random.RandomState(hard_fixed_seed)
        self.solution_idx = int(rng.randint(0, num_actions))
        self.observation_space = spaces.Box(low=-1, high=1, shape=(1,))
        self.action_space = spaces.Discrete(num_actions)
        self.render_mode = 'ansi'

    def reset(self, key):
        return {}, jnp.ones(1, jnp.float32)

    def step(self, state, action, key):
        correct = (action == self.solution_idx).astype(jnp.float32)
        noise = jnp.float32(0)
        if self.reward_noise != 0:
            noise = jax.random.normal(key) * self.reward_scale
        reward = (correct + noise) * self.reward_scale
        return Step(state, jnp.ones(1, jnp.float32), reward,
            jnp.bool_(True), jnp.bool_(False), {'score': correct})


class Memory(PufferEnv):
    """Repeat the observed sequence after a delay (reference :64-123)."""

    info_spec = {'score': {'dtype': jnp.float32}}

    def __init__(self, mem_length=1, mem_delay=0):
        self.mem_length = mem_length
        self.mem_delay = mem_delay
        self.horizon = 2 * mem_length + mem_delay
        self.observation_space = spaces.Box(low=-1, high=1, shape=(1,))
        self.action_space = spaces.Discrete(2)
        self.render_mode = 'ansi'

    def reset(self, key):
        solution = jax.random.randint(
            key, (self.horizon,), 0, 2).astype(jnp.float32)
        tail = self.mem_length + self.mem_delay
        solution = solution.at[-tail:].set(-1)
        state = dict(
            solution=solution,
            submission=jnp.full(self.horizon, -1.0, jnp.float32),
            tick=jnp.int32(1),
        )
        return state, solution[0:1]

    def step(self, state, action, key):
        tick = state['tick']
        action = jnp.asarray(action, jnp.float32)
        solution, submission = state['solution'], state['submission']

        in_show = tick < self.mem_length
        in_recall = tick >= self.mem_length + self.mem_delay

        # iota compares instead of dynamic index/scatter: under vmap
        # the gather/scatter serialize on TPU, the masks fuse
        iota = jnp.arange(self.horizon)
        tick_mask = iota == tick
        ob = jnp.where(in_show, jnp.sum(solution * tick_mask), 0.0)
        idx = jnp.clip(tick - self.mem_length - self.mem_delay, 0,
            self.horizon - 1)
        sol = jnp.sum(solution * (iota == idx))
        reward = jnp.where(in_show, (action == 0).astype(jnp.float32), 0.0)
        reward = jnp.where(in_recall, (action == sol).astype(jnp.float32),
            reward)
        submission = jnp.where(in_recall & tick_mask, action, submission)

        tick = tick + 1
        terminal = tick == self.horizon
        score = jnp.all(solution[:self.mem_length]
            == submission[-self.mem_length:]).astype(jnp.float32)
        info = {'score': jnp.where(terminal, score, 0.0)}
        new_state = dict(solution=solution, submission=submission, tick=tick)
        return Step(new_state, ob.reshape(1), reward,
            terminal, jnp.bool_(False), info)

    def render(self, state):
        return (_render_blocks(state['solution']) + ' Solution\n'
            + _render_blocks(state['submission']) + ' Prediction\n')


class Multiagent(PufferEnv):
    """Two-agent one-step env: agent 0 must act 0, agent 1 must act 1
    (reference :149-208). Padded fixed agent set, mask always true."""

    num_agents = 2
    info_spec = {'score': {'shape': (2,), 'dtype': jnp.float32}}

    def __init__(self):
        self.observation_space = spaces.Box(low=0, high=1, shape=(1,))
        self.action_space = spaces.Discrete(2)
        self.render_mode = 'ansi'
        self._obs = np.array([[0.0], [1.0]], np.float32)

    def reset(self, key):
        return {}, self._obs

    def step(self, state, action, key):
        action = jnp.asarray(action).reshape(2)
        reward = jnp.stack([
            (action[0] == 0).astype(jnp.float32),
            (action[1] == 1).astype(jnp.float32),
        ])
        done = jnp.ones(2, jnp.bool_)
        trunc = jnp.zeros(2, jnp.bool_)
        return Step(state, self._obs, reward, done, trunc, {'score': reward})


class Password(PufferEnv):
    """Guess a fixed binary password digit by digit (reference :228-304).
    Solution is bit-exact with the reference's hard_fixed_seed."""

    info_spec = {'score': {'dtype': jnp.float32}}

    def __init__(self, password_length=5, hard_fixed_seed=42):
        self.password_length = password_length
        rng = np.random.RandomState(hard_fixed_seed)
        self.solution = rng.randint(
            0, 2, size=password_length).astype(np.float32)
        self.observation_space = spaces.Box(
            low=0, high=1, shape=(password_length,))
        self.action_space = spaces.Discrete(2)
        self.render_mode = 'ansi'

    def reset(self, key):
        obs = jnp.full(self.password_length, -1.0, jnp.float32)
        return dict(observation=obs, tick=jnp.int32(0)), obs

    def step(self, state, action, key):
        mask = jnp.arange(self.password_length) == state['tick']
        obs = jnp.where(mask, jnp.asarray(action, jnp.float32),
            state['observation'])
        tick = state['tick'] + 1
        terminal = tick == self.password_length
        solved = jnp.all(obs == self.solution).astype(jnp.float32)
        reward = jnp.where(terminal, solved, 0.0)
        info = {'score': reward}
        return Step(dict(observation=obs, tick=tick), obs, reward,
            terminal, jnp.bool_(False), info)

    def render(self, state):
        return (_render_blocks(self.solution) + ' Solution\n'
            + _render_blocks(state['observation']) + ' Prediction\n')


_WORK_RATE = None


def _calibrate_work_rate():
    """Measured fori_loop iterations/second on the current backend, so
    Performance delays are real seconds (the reference busy-spins
    measured process_time, ref ocean.py:306-328; the hardcoded guess
    this replaces was unanchored). Slope of two sizes cancels dispatch
    and fetch latency (the tunneled-TPU honest-timing discipline)."""
    global _WORK_RATE
    if _WORK_RATE is None:
        import time as _time
        body = lambda i, v: v * 1.0000001 + 1e-9  # noqa: E731

        def timed(k):
            f = jax.jit(functools.partial(
                lambda n, x: jax.lax.fori_loop(0, n, body, x), k))
            float(f(jnp.float32(0)))  # compile + warm
            t0 = _time.perf_counter()
            float(f(jnp.float32(0)))
            return _time.perf_counter() - t0

        k1, k2 = 1_000_000, 5_000_000
        t1, t2 = timed(k1), timed(k2)
        _WORK_RATE = max(int((k2 - k1) / max(t2 - t1, 1e-9)), 1)
    return _WORK_RATE


class Performance(PufferEnv):
    """Synthetic-delay perf probe (reference :306-328). The reference
    busy-spins host CPU; the TPU analog burns device cycles with a
    dummy fori_loop so vectorization overhead can be measured."""

    info_spec = {}

    def __init__(self, delay_mean=0, delay_std=0, bandwidth=1):
        self.delay_mean = delay_mean
        self.delay_std = delay_std
        self.bandwidth = bandwidth
        # work units per second of simulated delay: measured, but only
        # when a delay is requested (calibration costs a few dispatches)
        self.work_per_second = _calibrate_work_rate() \
            if (delay_mean or delay_std) else 10_000_000
        self.observation_space = spaces.Box(
            low=-2**20, high=2**20, shape=(bandwidth,), dtype=np.float32)
        self.action_space = spaces.Discrete(2)
        self._obs = np.random.RandomState(0).uniform(
            -1, 1, bandwidth).astype(np.float32)
        self.render_mode = 'ansi'

    def reset(self, key):
        return dict(x=jnp.float32(0)), self._obs

    def _burn(self, x, key):
        target = self.delay_mean
        if self.delay_std:
            target = target + self.delay_std * jax.random.normal(key)
        iters = jnp.maximum(
            (jnp.float32(target) * self.work_per_second).astype(jnp.int32), 0)
        return jax.lax.fori_loop(
            0, iters, lambda i, v: v * 1.0000001 + 1e-9, x)

    def step(self, state, action, key):
        x = self._burn(state['x'], key)
        return Step(dict(x=x), self._obs, jnp.float32(0),
            jnp.bool_(False), jnp.bool_(False), {})


class PerformanceEmpiric(PufferEnv):
    """Counted-work perf probe (reference :330-354)."""

    info_spec = {}

    def __init__(self, count_n=0, count_std=0, bandwidth=1):
        self.count_n = count_n
        self.count_std = count_std
        self.bandwidth = bandwidth
        self.observation_space = spaces.Box(
            low=-2**20, high=2**20, shape=(bandwidth,), dtype=np.float32)
        self.action_space = spaces.Discrete(2)
        self._obs = np.random.RandomState(0).uniform(
            -1, 1, bandwidth).astype(np.float32)
        self.render_mode = 'ansi'

    def reset(self, key):
        return dict(x=jnp.float32(0)), self._obs

    def step(self, state, action, key):
        target = jnp.float32(self.count_n)
        if self.count_std:
            target = target + self.count_std * jax.random.normal(key)
        iters = jnp.maximum(target.astype(jnp.int32), 0)
        x = jax.lax.fori_loop(
            0, iters, lambda i, v: v * 1.0000001 + 1e-9, state['x'])
        return Step(dict(x=x), self._obs, jnp.float32(0),
            jnp.bool_(False), jnp.bool_(False), {})


class Spaces(PufferEnv):
    """Hierarchical Dict obs + Dict action env (reference :356-404).
    image action = sign of image sum; flat action = sign of flat sum;
    0.5 reward each. Exercises the emulation layer end to end."""

    info_spec = {'score': {'dtype': jnp.float32}}

    def __init__(self):
        self.observation_space = spaces.Dict({
            'image': spaces.Box(low=0, high=1, shape=(5, 5),
                dtype=np.float32),
            'flat': spaces.Box(low=0, high=1, shape=(5,), dtype=np.int8),
        })
        self.action_space = spaces.Dict({
            'image': spaces.Discrete(2),
            'flat': spaces.Discrete(2),
        })
        self.render_mode = 'ansi'

    def reset(self, key):
        k1, k2 = jax.random.split(key)
        image = jax.random.normal(k1, (5, 5), jnp.float32)
        flat = jax.random.randint(k2, (5,), -1, 2).astype(jnp.int8)
        obs = {'image': image, 'flat': flat}
        state = dict(
            obs=obs,
            image_sign=jnp.sum(image) > 0,
            flat_sign=jnp.sum(flat) > 0,
        )
        return state, obs

    def step(self, state, action, key):
        a_image = jnp.asarray(action['image'])
        a_flat = jnp.asarray(action['flat'])
        reward = (0.5 * (state['image_sign'] == (a_image == 1))
            + 0.5 * (state['flat_sign'] == (a_flat == 1)))
        reward = reward.astype(jnp.float32)
        return Step(state, state['obs'], reward, jnp.bool_(True),
            jnp.bool_(False), {'score': reward})


class Squared(PufferEnv):
    """Grid navigation to perimeter targets (reference :406-527).

    Agent starts at center; targets on the perimeter; reward is
    1 - L_inf_distance_to_closest_live_target / distance_to_target.
    Reaching the perimeter teleports the agent back to center. The grid
    observation replicates the reference exactly, including hit targets
    staying visible at +1.
    """

    MOVES = np.array(
        [(0, -1), (0, 1), (-1, 0), (1, 0), (1, -1), (-1, -1), (1, 1),
         (-1, 1)], dtype=np.int32)

    info_spec = {'score': {'dtype': jnp.float32}}

    def __init__(self, distance_to_target=1, num_targets=-1):
        grid_size = 2 * distance_to_target + 1
        if num_targets == -1:
            num_targets = 4 * distance_to_target
        self.distance_to_target = distance_to_target
        self.num_targets = num_targets
        self.grid_size = grid_size
        self.max_ticks = num_targets * distance_to_target
        perim = [(x, y) for x in range(grid_size) for y in range(grid_size)
            if x == 0 or y == 0 or x == grid_size - 1 or y == grid_size - 1]
        self.perimeter = np.array(perim, dtype=np.int32)
        # static scatter pattern: perimeter slot -> flat grid cell, as a
        # one-hot matrix so obs construction is one small MXU matmul under
        # vmap instead of a batched scatter (scatters serialize on TPU)
        n_perim = len(perim)
        onehot = np.zeros((n_perim, grid_size * grid_size), np.float32)
        for i, (x, y) in enumerate(perim):
            onehot[i, x * grid_size + y] = 1.0
        self._perim_onehot = onehot
        self._cell_iota = np.arange(grid_size * grid_size, dtype=np.int32)
        self.observation_space = spaces.Box(
            low=-1, high=1, shape=(grid_size, grid_size))
        self.action_space = spaces.Discrete(8)
        self.render_mode = 'ansi'

    def _obs(self, chosen, pos):
        """Rebuild the grid from sparse state: +1 at every episode target
        (hit targets stay visible, reference :406-527), -1 at the agent.
        Scatter-free: target pattern is a (n_perim, G*G) constant matmul;
        the agent marker is an iota compare."""
        g = self.grid_size
        targets = chosen.astype(jnp.float32) @ self._perim_onehot
        agent = (self._cell_iota == pos[0] * g + pos[1]).astype(jnp.float32)
        return (targets - agent).reshape(g, g)

    def reset(self, key):
        d = self.distance_to_target
        n_perim = self.perimeter.shape[0]
        if self.num_targets == 1:
            # fast path: one random draw instead of n_perim (the reset
            # branch runs every step under the autoreset select, so its
            # RNG cost is on the rollout hot path)
            idx = jax.random.randint(key, (), 0, n_perim)
            chosen = self._perim_iota() == idx
        else:
            # k-of-n without replacement via gumbel top-k (no full sort)
            z = jax.random.uniform(key, (n_perim,))
            _, idx = jax.lax.top_k(z, self.num_targets)
            chosen = jnp.any(
                self._perim_iota()[None, :] == idx[:, None], axis=0)
        state = dict(
            chosen=chosen,
            alive=chosen,
            agent_pos=jnp.array([d, d], jnp.int32),
            tick=jnp.int32(0),
        )
        return state, self._obs(chosen, state['agent_pos'])

    def _perim_iota(self):
        return jnp.arange(self.perimeter.shape[0], dtype=jnp.int32)

    def step(self, state, action, key):
        d = self.distance_to_target
        alive = state['alive']
        x, y = state['agent_pos'][0], state['agent_pos'][1]

        # one-hot contraction instead of a row gather: under vmap the
        # gather serializes; the (8,)x(8,2) contraction is elementwise
        onehot = jax.nn.one_hot(
            jnp.asarray(action, jnp.int32), len(self.MOVES), dtype=jnp.int32)
        move = onehot @ jnp.asarray(self.MOVES)
        x, y = x + move[0], y + move[1]

        tx, ty = self.perimeter[:, 0], self.perimeter[:, 1]
        dist = jnp.maximum(jnp.abs(x - tx), jnp.abs(y - ty))
        min_dist = jnp.min(jnp.where(alive, dist, jnp.int32(1 << 20)))
        reward = 1.0 - min_dist.astype(jnp.float32) / d

        hit = alive & (tx == x) & (ty == y)
        alive = alive & ~hit

        dist_from_origin = jnp.maximum(jnp.abs(x - d), jnp.abs(y - d))
        on_perim = dist_from_origin >= d
        pos = jnp.where(on_perim, jnp.array([d, d], jnp.int32),
            jnp.stack([x, y]))

        tick = state['tick'] + 1
        done = tick >= self.max_ticks
        remaining = jnp.sum(alive.astype(jnp.int32))
        score = (self.num_targets - remaining).astype(
            jnp.float32) / self.num_targets
        info = {'score': jnp.where(done, score, 0.0)}
        new_state = dict(chosen=state['chosen'], alive=alive,
            agent_pos=pos, tick=tick)
        obs = self._obs(state['chosen'], pos)
        return Step(new_state, obs, reward, done, jnp.bool_(False), info)

    def render(self, state):
        grid = np.asarray(self._obs(
            jnp.asarray(state['chosen']), jnp.asarray(state['agent_pos'])))
        chars = []
        for row in grid:
            for val in row:
                if val == 1:
                    c = 94
                elif val == -1:
                    c = 91
                else:
                    c = 90
                chars.append(f'\033[{c}m██\033[0m')
            chars.append('\n')
        return ''.join(chars)


class Stochastic(PufferEnv):
    """Optimal policy is mixed: play 0 with probability p (reference
    :529-582). Deterministic env; tests stochastic policy learning."""

    info_spec = {'score': {'dtype': jnp.float32}}

    def __init__(self, p=0.75, horizon=1000):
        self.p = p
        self.horizon = horizon
        self.observation_space = spaces.Box(low=0, high=1, shape=(1,))
        self.action_space = spaces.Discrete(2)
        self.render_mode = 'ansi'

    def reset(self, key):
        state = dict(tick=jnp.int32(0), count=jnp.int32(0))
        return state, jnp.zeros(1, jnp.float32)

    def step(self, state, action, key):
        action = jnp.asarray(action, jnp.int32)
        tick = state['tick'] + 1
        count = state['count'] + (action == 0).astype(jnp.int32)

        terminal = tick == self.horizon
        atn0_frac = count.astype(jnp.float32) / tick.astype(jnp.float32)
        proximity = 1.0 - (self.p - atn0_frac) ** 2
        on_policy = jnp.where(action == 0, atn0_frac < self.p,
            atn0_frac >= self.p)
        reward = jnp.where(on_policy, proximity, 0.0)
        info = {'score': jnp.where(terminal, proximity, 0.0)}
        return Step(dict(tick=tick, count=count),
            jnp.zeros(1, jnp.float32), reward, terminal,
            jnp.bool_(False), info)


class VisualTarget(PufferEnv):
    """Pixel-observation navigation: CNN learning-proof micro-env.

    The agent and a target sit on a grid_size x grid_size grid, each
    rendered as a cell_px x cell_px block in its own image channel
    (uint8, torch NCHW layout so the same bytes feed the reference
    torch Convolutional, reference models.py:113-157, and this repo's
    flax Convolutional). Actions move the agent one cell; reward is
    shaped on Manhattan-distance decrease plus a terminal bonus on
    reaching the target. A policy can only solve it by *localizing
    both blobs from pixels* — the conv path's learnability fixture
    (the reference proves its CNN on Atari, which this image cannot
    install; this env carries the same burden device-natively).

    Renders entirely with iota-compare masks and outer products: no
    scatters, so thousands of envs fuse into one vmapped XLA program.
    """

    MOVES = np.array(
        [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)], dtype=np.int32)

    info_spec = {'score': {'dtype': jnp.float32}}

    def __init__(self, grid_size=10, cell_px=4, horizon=32):
        self.grid_size = grid_size
        self.cell_px = cell_px
        self.horizon = horizon
        px = grid_size * cell_px
        self.observation_space = spaces.Box(
            low=0, high=255, shape=(2, px, px), dtype=np.uint8)
        self.action_space = spaces.Discrete(5)
        self.render_mode = 'ansi'
        # pixel row/col -> grid cell (static)
        self._px_cell = np.arange(px, dtype=np.int32) // cell_px

    def _obs(self, agent, target):
        """(2, px, px) uint8: channel 0 agent block, channel 1 target."""
        cell = jnp.asarray(self._px_cell)
        def block(pos):
            row = (cell == pos[0]).astype(jnp.uint8)
            col = (cell == pos[1]).astype(jnp.uint8)
            return 255 * row[:, None] * col[None, :]
        return jnp.stack([block(agent), block(target)])

    def reset(self, key):
        k1, k2 = jax.random.split(key)
        g = self.grid_size
        agent = jax.random.randint(k1, (2,), 0, g, jnp.int32)
        target = jax.random.randint(k2, (2,), 0, g, jnp.int32)
        # collision: shift the target one column (wrapping) so start
        # and goal are always distinct
        same = jnp.all(agent == target)
        target = jnp.where(same,
            target.at[1].set((target[1] + 1) % g), target)
        state = dict(agent=agent, target=target, tick=jnp.int32(0))
        return state, self._obs(agent, target)

    def step(self, state, action, key):
        g = self.grid_size
        agent, target = state['agent'], state['target']
        onehot = jax.nn.one_hot(jnp.asarray(action, jnp.int32),
            len(self.MOVES), dtype=jnp.int32)
        new = jnp.clip(agent + onehot @ jnp.asarray(self.MOVES), 0, g - 1)

        d_prev = jnp.sum(jnp.abs(agent - target))
        d_new = jnp.sum(jnp.abs(new - target))
        reached = d_new == 0
        reward = 0.1 * (d_prev - d_new).astype(jnp.float32) \
            + reached.astype(jnp.float32)

        tick = state['tick'] + 1
        done = reached | (tick >= self.horizon)
        info = {'score': jnp.where(done,
            reached.astype(jnp.float32), 0.0)}
        new_state = dict(agent=new, target=target, tick=tick)
        return Step(new_state, self._obs(new, target), reward, done,
            jnp.bool_(False), info)

    def render(self, state):
        g = self.grid_size
        grid = np.zeros((g, g), np.int32)
        grid[tuple(np.asarray(state['target']))] = 1
        grid[tuple(np.asarray(state['agent']))] = -1
        rows = []
        for row in grid:
            rows.append(_render_blocks(
                np.where(row == -1, 0, np.where(row == 1, 1, 2))))
        return '\n'.join(rows) + '\n'
