"""Decompose fused-PPO time: env-only scan vs rollout vs update.

Honest timing on the tunneled TPU (see docs/PERF.md): every measurement
ends with a value fetch, and the per-call time is the slope between a
short and a long run so the ~45 ms fetch round trip cancels.

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


def slope(run_k, k1=3, k2=13):
    """Per-call seconds via (T(k2) - T(k1)) / (k2 - k1); run_k(k) must
    end with a value fetch."""
    run_k(1)  # warmup/compile
    t1 = run_k(k1)
    t2 = run_k(k2)
    return (t2 - t1) / (k2 - k1)


def main():
    env_name = sys.argv[1] if len(sys.argv) > 1 else 'squared'
    num_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    batch = num_envs * T

    vecenv = vector.make(env_creator(env_name),
        backend=vector.Device, num_envs=num_envs)
    policy = Policy(Default(
        obs_shape=vecenv.single_observation_space.shape,
        action_space=vecenv.single_action_space, hidden_size=128,
        dtype=jnp.bfloat16))
    config = ppo.default_config(env=env_name, batch_size=batch,
        minibatch_size=batch // 4, bptt_horizon=16,
        total_timesteps=batch * 10 ** 6, anneal_lr=False, verbose=False,
        data_dir='/tmp/puffer_prof', checkpoint_interval=10 ** 6,
        obs_store_dtype='bfloat16')
    data = ppo.create(config, vecenv, policy)

    # 1. env-only scan (random actions, no policy)
    reset_batch, step_batch = make_env_ops(vecenv.env, vecenv.emulated)

    def env_only(carry):
        def body(c, _):
            split = jax.vmap(lambda k: tuple(jax.random.split(k)))
            new_keys, env_keys = split(c['keys'])
            actions = jax.random.randint(
                new_keys[0], (num_envs,), 0, 8).astype(jnp.int32)
            states, done_next, obs, rew, dn, tr, infos = step_batch(
                c['env'], c['done'], actions, env_keys)
            return dict(env=states, done=done_next, keys=new_keys), rew
        c = dict(env=carry['env'], done=carry['done'], keys=carry['keys'])
        c, rews = jax.lax.scan(body, c, None, length=T)
        return rews.sum()

    env_only_j = jax.jit(env_only)

    def run_env(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = env_only_j(data.carry)
        float(out)
        return time.perf_counter() - t0

    t_env = slope(run_env)
    print(f'env-only scan: {t_env*1e3:9.2f} ms -> '
        f'{batch/t_env/1e6:8.2f} M steps/s')

    # 2. rollout program (donates carry: thread the returned one)
    st = {'carry': dict(data.carry)}

    def run_roll(k):
        t0 = time.perf_counter()
        for _ in range(k):
            c, b, _, cnt = data.rollout_fn(data.params, st['carry'])
            st['carry'] = c
        float(cnt)
        return time.perf_counter() - t0

    t_roll = slope(run_roll)
    print(f'rollout:       {t_roll*1e3:9.2f} ms -> '
        f'{batch/t_roll/1e6:8.2f} M steps/s')

    # 3. fused step (rollout + update); update = step - rollout
    ps = {'p': data.params, 'o': data.opt_state, 'c': st['carry']}

    def run_step(k):
        t0 = time.perf_counter()
        for _ in range(k):
            p, o, c, stats, _, _ = data.step_fn(ps['p'], ps['o'], ps['c'])
            ps.update(p=p, o=o, c=c)
        float(stats['policy_loss'])
        return time.perf_counter() - t0

    t_step = slope(run_step)
    t_upd = t_step - t_roll
    print(f'update:        {t_upd*1e3:9.2f} ms -> '
        f'{batch/max(t_upd,1e-9)/1e6:8.2f} M steps/s')
    print(f'fused epoch:   {t_step*1e3:9.2f} ms -> '
        f'{batch/t_step/1e6:8.2f} M steps/s')


if __name__ == '__main__':
    main()
