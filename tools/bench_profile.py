"""Decompose fused-PPO time: env-only scan vs rollout vs update.

Usage: python tools/bench_profile.py [env] [num_envs] [horizon]
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
from pufferlib_tpu.vector import make_env_ops


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / n


def main():
    env_name = sys.argv[1] if len(sys.argv) > 1 else 'squared'
    num_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    batch = num_envs * T

    vecenv = vector.make(env_creator(env_name),
        backend=vector.Device, num_envs=num_envs)
    policy = Policy(Default(
        obs_shape=vecenv.single_observation_space.shape,
        action_space=vecenv.single_action_space, hidden_size=128))
    config = ppo.default_config(env=env_name, batch_size=batch,
        minibatch_size=batch // 4, bptt_horizon=16,
        total_timesteps=batch * 100, verbose=False,
        data_dir='/tmp/puffer_prof')
    data = ppo.create(config, vecenv, policy)

    # 1. env-only scan (random actions, no policy)
    reset_batch, step_batch = make_env_ops(vecenv.env, vecenv.emulated)

    def env_only(carry):
        def body(c, _):
            split = jax.vmap(lambda k: tuple(jax.random.split(k)))
            new_keys, env_keys = split(c['keys'])
            a_key = new_keys[0]
            actions = jax.random.randint(
                a_key, (num_envs,), 0, 8).astype(jnp.int32)
            states, done_next, obs, rew, dn, tr, infos = step_batch(
                c['env'], c['done'], actions, env_keys)
            return dict(env=states, done=done_next, keys=new_keys), rew
        c = dict(env=carry['env'], done=carry['done'], keys=carry['keys'])
        c, rews = jax.lax.scan(body, c, None, length=T)
        return rews.sum()

    env_only_j = jax.jit(env_only)
    t_env = timeit(env_only_j, data.carry)
    print(f'env-only scan: {t_env*1e3:9.2f} ms -> {batch/t_env/1e6:8.2f} M steps/s')

    # 2. rollout program (donates carry: thread the returned one)
    state = {'carry': data.carry, 'batch': None}

    def roll():
        c, b, _, _ = data.rollout_fn(data.params, state['carry'])
        state['carry'] = c
        state['batch'] = b
        return b['reward']

    t_roll = timeit(roll)
    print(f'rollout:       {t_roll*1e3:9.2f} ms -> {batch/t_roll/1e6:8.2f} M steps/s')

    # 3. update program (donates params/opt: thread them)
    pstate = {'params': data.params, 'opt': data.opt_state}

    def upd():
        p, o, stats = data.update_fn(pstate['params'], pstate['opt'],
            state['batch'], jax.random.PRNGKey(0), jnp.float32(1e-3))
        pstate['params'] = p
        pstate['opt'] = o
        return stats['policy_loss']

    t_upd = timeit(upd)
    print(f'update:        {t_upd*1e3:9.2f} ms -> {batch/t_upd/1e6:8.2f} M steps/s')

    total = t_roll + t_upd
    print(f'TOTAL:         {total*1e3:9.2f} ms -> {batch/total/1e6:8.2f} M steps/s')


if __name__ == '__main__':
    main()
