"""Reference-side fixture for the CNN-path head-to-head.

A numpy/gymnasium twin of pufferlib_tpu.ocean.VisualTarget (same grid,
moves, shaping, horizon, score semantics; per-reset randomness via
gymnasium's np_random instead of counter-based JAX keys — the same
distributional-identity mapping documented in
pufferlib_tpu/ocean/ocean.py's RNG note), plus a reference "env module"
(env_creator + Policy + Recurrent) so tools/ref_trainer.py can train the
ACTUAL reference torch Convolutional (reference models.py:113-157) on it
through the reference trainer. This is the conv-path analog of the ocean
h2h: the two stacks train their own conv nets on identical dynamics.
"""
import functools

import numpy as np
import gymnasium

GRID = 10
CELL = 4
HORIZON = 32
MOVES = np.array([(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)], np.int32)


class VisualTargetRef(gymnasium.Env):
    """Pixel navigation: agent and target blobs in separate uint8
    channels (2, 40, 40); Discrete(5) moves; distance shaping +
    terminal bonus. Must match pufferlib_tpu.ocean.VisualTarget
    step-for-step given the same (agent, target, actions)."""

    def __init__(self, grid_size=GRID, cell_px=CELL, horizon=HORIZON):
        self.grid_size = grid_size
        self.cell_px = cell_px
        self.horizon = horizon
        px = grid_size * cell_px
        self.observation_space = gymnasium.spaces.Box(
            low=0, high=255, shape=(2, px, px), dtype=np.uint8)
        self.action_space = gymnasium.spaces.Discrete(5)
        self.render_mode = 'ansi'

    def _obs(self):
        px = self.grid_size * self.cell_px
        ob = np.zeros((2, px, px), np.uint8)
        for ch, (r, c) in enumerate((self.agent, self.target)):
            ob[ch, r * self.cell_px:(r + 1) * self.cell_px,
                c * self.cell_px:(c + 1) * self.cell_px] = 255
        return ob

    def reset(self, seed=None, options=None):
        super().reset(seed=seed)
        g = self.grid_size
        self.agent = self.np_random.integers(0, g, 2)
        self.target = self.np_random.integers(0, g, 2)
        if np.all(self.agent == self.target):
            self.target[1] = (self.target[1] + 1) % g
        self.tick = 0
        return self._obs(), {}

    def step(self, action):
        g = self.grid_size
        d_prev = np.abs(self.agent - self.target).sum()
        self.agent = np.clip(self.agent + MOVES[int(action)], 0, g - 1)
        d_new = np.abs(self.agent - self.target).sum()
        reached = d_new == 0
        reward = 0.1 * float(d_prev - d_new) + float(reached)
        self.tick += 1
        done = bool(reached or self.tick >= self.horizon)
        info = {'score': float(reached)} if done else {}
        return self._obs(), reward, done, False, info


# ---- reference env module (env_creator + Policy + Recurrent) --------

def env_creator(name='visual'):
    return functools.partial(make_visual)


def make_visual(grid_size=GRID, cell_px=CELL, horizon=HORIZON, **kwargs):
    import pufferlib.emulation
    import pufferlib.postprocess
    env = VisualTargetRef(grid_size=grid_size, cell_px=cell_px,
        horizon=horizon)
    env = pufferlib.postprocess.EpisodeStats(env)
    return pufferlib.emulation.GymnasiumPufferEnv(env=env, **kwargs)


def Policy(env, hidden_size=128):
    """The reference's own torch NatureCNN (reference
    models.py:113-157), sized for the 40x40 2-channel obs:
    40 -> 9 -> 3 -> 1 spatial, flat 64."""
    import pufferlib.models
    return pufferlib.models.Convolutional(env, framestack=2,
        flat_size=64, input_size=hidden_size, hidden_size=hidden_size,
        output_size=hidden_size)


def Recurrent(env, policy, input_size=128, hidden_size=128):
    import pufferlib.models
    return pufferlib.models.LSTMWrapper(env, policy, input_size,
        hidden_size)
