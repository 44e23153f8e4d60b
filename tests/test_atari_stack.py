"""Atari wrapper-stack fidelity tests against a fake ALE env.

ale-py is not installable in this image; these tests verify the stack's
*logic* — the contracts the reference guards with a real env:
- sign reward clipping (SB3 ClipRewardEnv, ref atari/environment.py:17-41)
- EpisodicLife life-loss/reset contract (ref tests/test_atari_reset.py:5-27
  expects >10 life transitions in 1000 random steps without real resets)
- FireReset pressing FIRE after reset
"""
import numpy as np
import pytest

from pufferlib_tpu.environments.atari.wrappers import (
    ClipRewardEnv, EpisodicLifeEnv, FireResetEnv, MaxAndSkipEnv,
    NoopResetEnv, needs_fire_reset)


class FakeALE:
    """Deterministic stand-in for an ALE Atari env: 4 lives, one life
    lost every `life_every` steps, game over when lives hit 0."""

    def __init__(self, life_every=7, reward_seq=(0.0, 0.5, -3.0, 1.0)):
        import gymnasium
        self.observation_space = gymnasium.spaces.Box(
            0, 255, (84, 84), np.uint8)
        self.action_space = gymnasium.spaces.Discrete(4)
        self.render_mode = None
        self.life_every = life_every
        self.reward_seq = reward_seq
        self.resets = 0
        self.t = 0
        self.lives = 0
        self.fire_presses = 0
        self.unwrapped = self

    def get_action_meanings(self):
        return ['NOOP', 'FIRE', 'RIGHT', 'LEFT']

    def _obs(self):
        return np.full((84, 84), self.t % 256, np.uint8)

    def reset(self, seed=None, options=None):
        self.resets += 1
        self.t = 0
        self.lives = 4
        return self._obs(), {'lives': self.lives}

    def step(self, action):
        assert self.lives > 0, 'stepped a finished episode'
        if action == 1:
            self.fire_presses += 1
        self.t += 1
        if self.t % self.life_every == 0:
            self.lives -= 1
        reward = self.reward_seq[self.t % len(self.reward_seq)]
        terminated = self.lives == 0
        return self._obs(), reward, terminated, False, {'lives': self.lives}

    def close(self):
        pass


def test_clip_reward_is_sign_not_clamp():
    env = ClipRewardEnv(FakeALE(life_every=10 ** 6,
        reward_seq=(0.5, -3.0, 0.0, 2.0)))
    env.reset()
    rewards = [env.step(0)[1] for _ in range(4)]
    # raw seq at t=1..4: -3.0, 0.0, 2.0, 0.5 -> signs
    assert rewards == [-1.0, 0.0, 1.0, 1.0]


def test_episodic_life_contract():
    """>10 life-loss terminations in 1000 steps, but only real game
    overs reset the underlying env (ref tests/test_atari_reset.py)."""
    raw = FakeALE(life_every=7)
    env = EpisodicLifeEnv(raw)
    env.reset()
    rng = np.random.RandomState(0)
    life_terms = 0
    real_resets_before = raw.resets
    for _ in range(1000):
        _, _, terminated, truncated, info = env.step(rng.randint(4))
        if terminated or truncated:
            life_terms += 1
            env.reset()
    assert life_terms > 10
    # 4 lives per game: roughly 1/4 of terminations are real resets
    real_resets = raw.resets - real_resets_before
    assert real_resets < life_terms
    assert real_resets == pytest.approx(life_terms / 4, abs=2)


def test_episodic_life_reset_advances_not_resets():
    raw = FakeALE(life_every=5)
    env = EpisodicLifeEnv(raw)
    env.reset()
    resets_before = raw.resets
    for _ in range(5):
        _, _, terminated, _, _ = env.step(0)
    assert terminated  # life lost
    env.reset()  # must be a no-op step, not a real reset
    assert raw.resets == resets_before
    assert raw.lives == 3


def test_fire_reset():
    raw = FakeALE()
    assert needs_fire_reset(raw)
    env = FireResetEnv(raw)
    env.reset()
    assert raw.fire_presses == 1


def test_max_and_skip_sums_rewards():
    raw = FakeALE(life_every=10 ** 6, reward_seq=(1.0, 1.0, 1.0, 1.0))
    env = MaxAndSkipEnv(raw, skip=4)
    env.reset()
    _, reward, _, _, _ = env.step(0)
    assert reward == 4.0
    assert raw.t == 4


def test_noop_reset_randomizes_start():
    raw = FakeALE(life_every=10 ** 6)
    env = NoopResetEnv(raw, noop_max=10)
    env.reset(seed=3)
    assert 1 <= raw.t <= 10


def test_full_stack_composes_through_host_env():
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    from pufferlib_tpu.postprocess import EpisodeStats

    raw = FakeALE(life_every=7)
    env = EpisodicLifeEnv(raw)
    env = FireResetEnv(env)
    env = ClipRewardEnv(env)
    env = EpisodeStats(env)
    env = GymnasiumPufferEnv(env=env)
    obs, _ = env.reset(seed=0)
    assert obs.shape == (84, 84)
    for _ in range(30):
        obs, reward, terminated, truncated, info = env.step(
            np.array([0]))
        assert float(reward) in (-1.0, 0.0, 1.0)
        if terminated or truncated:
            obs, _ = env.reset()
