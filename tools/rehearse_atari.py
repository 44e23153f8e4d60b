"""Atari-scale host-pipeline rehearsal.

ale-py is not installable here, so this drives the EXACT production
path for Atari-class envs — our EpisodicLife/FireReset/sign-clip
wrapper stack around a fake ALE with real frame shapes (84x84 uint8,
framestack), HostMultiprocessing shared-memory envpool, the ppo_host
trainer on the real device, and cpu_offload for the big obs batch —
and reports end-to-end SPS. This is the integration rehearsal that a
box with ale-py would run as `demo.py --env breakout --mode train`.

Usage: python tools/rehearse_atari.py [--num-envs 8] [--epochs 2]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


class FakeALE:
    """84x84 grayscale frames, 4 lives, FIRE at action 1 — the fake
    backend from tests/test_atari_stack.py at production shapes."""

    def __init__(self, life_every=97, frame_shape=(4, 84, 84)):
        import gymnasium
        self.observation_space = gymnasium.spaces.Box(
            0, 255, frame_shape, np.uint8)
        self.action_space = gymnasium.spaces.Discrete(4)
        self.render_mode = None
        self.life_every = life_every
        self.t = 0
        self.lives = 0
        self.unwrapped = self
        self._rng = np.random.RandomState(0)

    def get_action_meanings(self):
        return ['NOOP', 'FIRE', 'RIGHT', 'LEFT']

    def _obs(self):
        # cheap deterministic frame (full random fill would dominate
        # the step cost and hide pipeline overheads)
        frame = np.full(self.observation_space.shape,
            (self.t * 7) % 256, np.uint8)
        frame[:, :8, :8] = self._rng.randint(0, 255, (4, 8, 8))
        return frame

    def reset(self, seed=None, options=None):
        if seed is not None:
            self._rng = np.random.RandomState(seed)
        self.t = 0
        self.lives = 4
        return self._obs(), {'lives': self.lives}

    def step(self, action):
        self.t += 1
        if self.t % self.life_every == 0:
            self.lives -= 1
        reward = 0.5 if self.t % 31 == 0 else 0.0
        return (self._obs(), reward, self.lives == 0, False,
            {'lives': self.lives})

    def close(self):
        pass


def make_env():
    from pufferlib_tpu.environments.atari.wrappers import (
        ClipRewardEnv, EpisodicLifeEnv, FireResetEnv)
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    from pufferlib_tpu.postprocess import EpisodeStats

    env = FakeALE()
    env = EpisodicLifeEnv(env)
    env = FireResetEnv(env)
    env = ClipRewardEnv(env)
    env = EpisodeStats(env)
    return GymnasiumPufferEnv(env=env)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--num-envs', type=int, default=8)
    ap.add_argument('--batch-size', type=int, default=1024)
    ap.add_argument('--minibatch-size', type=int, default=256)
    ap.add_argument('--epochs', type=int, default=2)
    ap.add_argument('--serial', action='store_true')
    ap.add_argument('--no-offload', action='store_true')
    args = ap.parse_args()

    from pufferlib_tpu import vector_host
    from pufferlib_tpu.models import (
        Convolutional, LSTMWrapper, Policy, RecurrentPolicy)
    from pufferlib_tpu.training import ppo_host

    if args.serial:
        vecenv = vector_host.make(make_env,
            backend=vector_host.HostSerial, num_envs=args.num_envs)
    else:
        vecenv = vector_host.make(make_env,
            backend=vector_host.HostMultiprocessing,
            num_envs=args.num_envs, num_workers=args.num_envs,
            batch_size=max(args.num_envs // 2, 1))

    obs_shape = vecenv.single_observation_space.shape
    policy = Policy(Convolutional(action_space=vecenv.single_action_space,
        obs_shape=obs_shape, framestack=4, flat_size=64 * 7 * 7,
        hidden_size=512))
    config = ppo_host.default_config(env='atari_rehearsal',
        batch_size=args.batch_size,
        minibatch_size=args.minibatch_size, bptt_horizon=8,
        total_timesteps=args.batch_size * (args.epochs + 2),
        cpu_offload=not args.no_offload, verbose=False,
        data_dir='/tmp/atari_rehearsal', checkpoint_interval=10 ** 6)
    data = ppo_host.create(config, vecenv, policy)

    # warmup (compiles forward + minibatch update)
    ppo_host.evaluate(data)
    ppo_host.train(data)
    t0 = time.perf_counter()
    s0 = data.global_step
    for _ in range(args.epochs):
        ppo_host.evaluate(data)
        ppo_host.train(data)
    dt = time.perf_counter() - t0
    sps = (data.global_step - s0) / dt
    result = {
        'metric': 'atari_rehearsal_sps',
        'value': round(sps, 1),
        'unit': 'steps/s',
        'backend': 'serial' if args.serial else 'multiprocessing',
        'cpu_offload': not args.no_offload,
        'num_envs': args.num_envs,
        'obs': 'fake ALE 84x84 u8 + EpisodicLife/FireReset/sign-clip',
        'losses_finite': bool(np.isfinite(data.losses.policy_loss)),
        'episode_stats_seen': bool(data.stats),
    }
    ppo_host.close(data)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
