"""Host-vectorization benchmark harness.

Analog of reference tests/test_performance.py: per-env emulation
overhead vs the raw env, and HostSerial vs HostMultiprocessing SPS over
synthetic-delay envs (the envpool speedup the reference headlines as
"2-3x throughput").

Usage:
  python tools/bench_host.py [--delays 0 0.0001 0.001] [--steps 2000]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def emulation_overhead(steps=2000):
    """% overhead of GymnasiumPufferEnv emulation vs the raw env."""
    from pufferlib_tpu.environments.test.host_fixtures import (
        GymnasiumPerformanceEnv)
    from pufferlib_tpu.host_env import GymnasiumPufferEnv

    raw = GymnasiumPerformanceEnv(obs_size=64)
    raw.reset()
    t0 = time.perf_counter()
    for i in range(steps):
        raw.step(0)
    t_raw = time.perf_counter() - t0

    puf = GymnasiumPufferEnv(env=GymnasiumPerformanceEnv(obs_size=64))
    puf.reset()
    t0 = time.perf_counter()
    for i in range(steps):
        if puf.done:
            puf.reset()
        puf.step(np.int64(0))
    t_puf = time.perf_counter() - t0
    return 100.0 * (t_puf - t_raw) / max(t_raw, 1e-9)


def backend_sps(delay_mean, num_envs=8, num_workers=None, batch_size=None,
        steps=300, backend='serial'):
    import functools
    import pufferlib_tpu.vector_host as vector_host
    from pufferlib_tpu.environments.test.host_fixtures import (
        GymnasiumPerformanceEnv)

    creator = functools.partial(GymnasiumPerformanceEnv,
        delay_mean=delay_mean)
    if backend == 'serial':
        v = vector_host.make(creator, backend=vector_host.HostSerial,
            num_envs=num_envs)
    else:
        v = vector_host.make(creator,
            backend=vector_host.HostMultiprocessing, num_envs=num_envs,
            num_workers=num_workers or num_envs, batch_size=batch_size)
    obs, _ = v.reset(seed=0)
    batch = obs.shape[0]
    atns = np.zeros(batch, np.int64)
    t0 = time.perf_counter()
    for _ in range(steps):
        v.send(atns)
        obs = v.recv()[0]
    dt = time.perf_counter() - t0
    v.close()
    return steps * batch / dt


def backend_sps_sleep(delay_mean, num_envs=8, batch_size=None, steps=200,
        backend='serial'):
    """Same sweep over the GIL-releasing sleep fixture: an async pool
    overlaps these even on one core (the reference's 2-3x envpool claim,
    examples/README.md; its rig had 24 cores for busy-spin envs)."""
    import functools
    import pufferlib_tpu.vector_host as vector_host
    from pufferlib_tpu.environments.test.host_fixtures import (
        GymnasiumSleepEnv)

    creator = functools.partial(GymnasiumSleepEnv, delay_mean=delay_mean)
    if backend == 'serial':
        v = vector_host.make(creator, backend=vector_host.HostSerial,
            num_envs=num_envs)
    else:
        v = vector_host.make(creator,
            backend=vector_host.HostMultiprocessing, num_envs=num_envs,
            num_workers=num_envs, batch_size=batch_size)
    obs, _ = v.reset(seed=0)
    batch = obs.shape[0]
    atns = np.zeros(batch, np.int64)
    t0 = time.perf_counter()
    for _ in range(steps):
        v.send(atns)
        obs = v.recv()[0]
    dt = time.perf_counter() - t0
    v.close()
    return steps * batch / dt


def _sleep_puffer_env(delay_mean=0.001):
    # module-level so spawn workers can unpickle it
    from pufferlib_tpu.environments.test.host_fixtures import (
        GymnasiumSleepEnv)
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    return GymnasiumPufferEnv(env=GymnasiumSleepEnv(
        delay_mean=delay_mean, obs_size=8))


def trainer_sps(backend='serial', num_envs=8, batch_size=512,
        delay_mean=0.001, epochs=3, pipeline=True):
    """End-to-end host-bridge trainer SPS on the REAL device: rollout
    (recv -> jit forward -> single merged device_get -> send) + PPO
    update, over sleep-delay envs."""
    import functools
    import pufferlib_tpu.vector_host as vector_host
    from pufferlib_tpu.models import Default, Policy
    from pufferlib_tpu.training import ppo_host

    creator = functools.partial(_sleep_puffer_env, delay_mean)

    if backend == 'serial':
        vecenv = vector_host.make(creator,
            backend=vector_host.HostSerial, num_envs=num_envs)
    else:
        vecenv = vector_host.make(creator,
            backend=vector_host.HostMultiprocessing, num_envs=num_envs,
            num_workers=num_envs, batch_size=max(num_envs // 2, 1))
    policy = Policy(Default(
        obs_shape=vecenv.single_observation_space.shape,
        action_space=vecenv.single_action_space, hidden_size=64))
    config = ppo_host.default_config(env='bench_host',
        batch_size=batch_size, minibatch_size=batch_size // 2,
        bptt_horizon=8, total_timesteps=batch_size * (epochs + 1),
        pipeline_rollout=pipeline,
        verbose=False, data_dir='/tmp/bench_host',
        checkpoint_interval=10 ** 6)
    data = ppo_host.create(config, vecenv, policy)
    # warmup epoch compiles the forward + update programs
    ppo_host.evaluate(data)
    ppo_host.train(data)
    prof = data.profile
    warm_elapsed = (prof.eval_forward.elapsed + prof.env.elapsed
        + prof.eval_misc.elapsed)
    warm_calls = prof.eval_forward.calls
    t0 = time.perf_counter()
    steps0 = data.global_step
    for _ in range(epochs):
        ppo_host.evaluate(data)
        ppo_host.train(data)
    dt = time.perf_counter() - t0
    sps = (data.global_step - steps0) / dt
    # exclude the warmup (compile) epoch from the per-step figure
    rollout_ms = 1e3 * (prof.eval_forward.elapsed + prof.env.elapsed
        + prof.eval_misc.elapsed - warm_elapsed) \
        / max(prof.eval_forward.calls - warm_calls, 1)
    ppo_host.close(data)
    return sps, rollout_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--delays', type=float, nargs='+',
        default=[0.0, 1e-4, 1e-3])
    ap.add_argument('--num-envs', type=int, default=8)
    ap.add_argument('--steps', type=int, default=300)
    ap.add_argument('--trainer', action='store_true',
        help='also run the end-to-end trainer bench (uses the device)')
    args = ap.parse_args()

    ncpu = os.cpu_count() or 1
    if ncpu < args.num_envs:
        print(json.dumps({'warning': f'host has {ncpu} CPU core(s); '
            'busy-spin envpool speedups need >= num_envs cores; the '
            'sleep-env rows isolate async overlap'}))

    ov = emulation_overhead()
    print(json.dumps({'metric': 'emulation_overhead_pct',
        'value': round(ov, 2), 'unit': '%', 'cpu_count': ncpu}))

    for delay in args.delays:
        ser = backend_sps(delay, args.num_envs, steps=args.steps,
            backend='serial')
        pool = backend_sps(delay, args.num_envs,
            batch_size=max(args.num_envs // 2, 1), steps=args.steps,
            backend='multiprocessing')
        print(json.dumps({
            'fixture': 'busy_spin',
            'delay_mean_s': delay,
            'serial_sps': round(ser, 1),
            'envpool_sps': round(pool, 1),
            'speedup': round(pool / max(ser, 1e-9), 2)}))

    for delay in [d for d in args.delays if d > 0]:
        ser = backend_sps_sleep(delay, args.num_envs, steps=args.steps,
            backend='serial')
        pool = backend_sps_sleep(delay, args.num_envs,
            batch_size=max(args.num_envs // 2, 1), steps=args.steps,
            backend='multiprocessing')
        print(json.dumps({
            'fixture': 'sleep',
            'delay_mean_s': delay,
            'serial_sps': round(ser, 1),
            'envpool_sps': round(pool, 1),
            'speedup': round(pool / max(ser, 1e-9), 2)}))

    if args.trainer:
        runs = [('serial', True), ('multiprocessing', False),
            ('multiprocessing', True)]
        for backend, pipeline in runs:
            sps, rollout_ms = trainer_sps(backend=backend,
                num_envs=args.num_envs, pipeline=pipeline)
            tag = backend if backend == 'serial' else (
                'envpool_pipelined' if pipeline else 'envpool_strict')
            print(json.dumps({
                'metric': f'ppo_host_{tag}_sps',
                'value': round(sps, 1), 'unit': 'steps/s',
                'rollout_ms_per_step': round(rollout_ms, 2)}))


if __name__ == '__main__':
    main()
