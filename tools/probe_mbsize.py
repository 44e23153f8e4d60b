"""Probe: update_fn time at 32k lanes vs minibatch size (knee hunt).

Usage: python tools/probe_mbsize.py [num_envs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import pufferlib_tpu.vector as vector
from pufferlib_tpu.models import Default, Policy
from pufferlib_tpu.ocean import env_creator
from pufferlib_tpu.training import ppo


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    horizon = 64
    batch_size = n * horizon
    vecenv = vector.make(env_creator('squared'),
        env_kwargs=dict(distance_to_target=3, num_targets=1),
        backend=vector.Device, num_envs=n)
    obs_shape = vecenv.single_observation_space.shape
    module = Default(obs_shape=obs_shape,
        action_space=vecenv.single_action_space, hidden_size=128,
        dtype=jnp.bfloat16)
    policy = Policy(module)

    for num_mb in (4, 8, 16, 32, 64):
        config = ppo.default_config(
            env='squared', batch_size=batch_size,
            minibatch_size=batch_size // num_mb, bptt_horizon=16,
            total_timesteps=batch_size * 1_000_000, anneal_lr=False,
            obs_store_dtype='bfloat16', verbose=False,
            data_dir='/tmp/puffer_tpu_probe', checkpoint_interval=10**6)
        data = ppo.create(config, vecenv, policy)
        c, b, _, _ = data.rollout_fn(data.params, data.carry)
        float(b['reward'][0, 0])
        key = jax.random.PRNGKey(0)
        lr = jnp.float32(1e-4)
        p, o, stats = data.update_fn(data.params, data.opt_state, b, key, lr)
        float(stats['policy_loss'])
        reps = 20
        t0 = time.time()
        for _ in range(reps):
            p, o, stats = data.update_fn(p, o, b, key, lr)
        float(stats['policy_loss'])
        upd_ms = (time.time() - t0) / reps * 1e3
        print(f'envs={n} num_mb={num_mb:3d} mb_rows={batch_size//num_mb:8d} '
              f'update={upd_ms:8.2f} ms', flush=True)
    vecenv.close()


if __name__ == '__main__':
    main()
