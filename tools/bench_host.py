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
    from pufferlib_tpu.environments.test.environment import (
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
    from pufferlib_tpu.environments.test.environment import (
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
        obs, *_ = v.recv()[:1],
    dt = time.perf_counter() - t0
    v.close()
    return steps * batch / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--delays', type=float, nargs='+',
        default=[0.0, 1e-4, 1e-3])
    ap.add_argument('--num-envs', type=int, default=8)
    ap.add_argument('--steps', type=int, default=300)
    args = ap.parse_args()

    ncpu = os.cpu_count() or 1
    if ncpu < args.num_envs:
        print(json.dumps({'warning': f'host has {ncpu} CPU core(s); '
            'envpool speedups need >= num_envs cores'}))

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
            'delay_mean_s': delay,
            'serial_sps': round(ser, 1),
            'envpool_sps': round(pool, 1),
            'speedup': round(pool / max(ser, 1e-9), 2)}))


if __name__ == '__main__':
    main()
