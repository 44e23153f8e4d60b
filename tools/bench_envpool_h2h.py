"""Envpool-vs-envpool head-to-head on the SAME box, SAME raw envs.

Runs the ACTUAL reference Multiprocessing envpool
(/root/reference/pufferlib/vector.py:218-447, loaded under the
tools/ref_trainer.py shims) against the repo's HostMultiprocessing
(pufferlib_tpu/vector_host.py) over the same grid the reference's own
pool sweep uses (reference tests/pool/test_envpool.py:91-133):
synthetic-delay envs x workers x envs/worker x batch, plus real
gymnasium CartPole. Both sides wrap the identical raw env class with
their own emulation + vectorization, and both are driven through the
same async protocol (async_reset -> recv -> send loop), so each
measured number is the whole system's steps/s.

Box note: this host has ONE CPU core. Busy-spin envs therefore
serialize across workers for BOTH sides (no one can beat serial by
much); the sleep fixture (GIL-releasing delay, models IO-bound envs)
is where async pooling shows overlap. Both fixtures run: the spin rows
measure protocol overhead head-to-head, the sleep rows measure
batching/overlap head-to-head.

Usage:
    python tools/bench_envpool_h2h.py [--seconds 2.0] [--out docs/h2h_envpool.json]
    python tools/bench_envpool_h2h.py --quick     # reduced grid smoke
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from ref_trainer import install_shims


# ---- env creators (module-level: repo workers unpickle under spawn,
# ---- reference workers inherit under fork) --------------------------

def _raw_env(kind, delay_mean, delay_std):
    from pufferlib_tpu.environments.test.host_fixtures import (
        GymnasiumPerformanceEnv, GymnasiumSleepEnv)
    if kind == 'spin':
        return GymnasiumPerformanceEnv(
            delay_mean=delay_mean, delay_std=delay_std, obs_size=8)
    if kind == 'sleep':
        return GymnasiumSleepEnv(delay_mean=delay_mean, obs_size=8)
    if kind == 'cartpole':
        import gymnasium
        return gymnasium.make('CartPole-v1')
    raise ValueError(kind)


def repo_env(kind, delay_mean=0.0, delay_std=0.0):
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    return GymnasiumPufferEnv(env=_raw_env(kind, delay_mean, delay_std))


def ref_env(kind, delay_mean=0.0, delay_std=0.0):
    install_shims()
    from pufferlib.emulation import GymnasiumPufferEnv
    return GymnasiumPufferEnv(env=_raw_env(kind, delay_mean, delay_std))


# ---- one timed run ---------------------------------------------------

def _drive(vecenv, seconds, warmup_rounds=3):
    """Drive any puffer-protocol vecenv through async recv/send for
    `seconds`; returns agent-steps/s."""
    vecenv.async_reset(seed=1234)
    atn_space = vecenv.single_action_space
    sample = np.asarray(atn_space.sample())

    def actions(n):
        return np.zeros((n,) + sample.shape, dtype=sample.dtype)

    for _ in range(warmup_rounds):
        o = vecenv.recv()[0]
        vecenv.send(actions(len(o)))

    steps = 0
    t0 = time.perf_counter()
    while True:
        o = vecenv.recv()[0]
        vecenv.send(actions(len(o)))
        steps += len(o)
        dt = time.perf_counter() - t0
        if dt >= seconds:
            return steps / dt


def run_reference(creator, num_envs, num_workers, batch_size, seconds,
        backend='mp'):
    install_shims()
    import pufferlib.vector as ref_vector
    if backend == 'serial':
        vecenv = ref_vector.make(creator, num_envs=num_envs,
            backend=ref_vector.Serial)
    else:
        vecenv = ref_vector.make(creator, num_envs=num_envs,
            num_workers=num_workers, batch_size=batch_size,
            backend=ref_vector.Multiprocessing)
    try:
        return _drive(vecenv, seconds)
    finally:
        vecenv.close()


def run_repo(creator, num_envs, num_workers, batch_size, seconds,
        backend='mp'):
    import pufferlib_tpu.vector_host as vector_host
    if backend == 'serial':
        vecenv = vector_host.make(creator, num_envs=num_envs,
            backend=vector_host.HostSerial)
    else:
        vecenv = vector_host.make(creator, num_envs=num_envs,
            num_workers=num_workers, batch_size=batch_size,
            backend=vector_host.HostMultiprocessing)
    try:
        return _drive(vecenv, seconds)
    finally:
        vecenv.close()


# ---- the sweep -------------------------------------------------------

# (delay_mean, delay_std) pairs from the reference sweep, truncated to
# the three means; workers/envs-per-worker scaled to a 1-core host
DELAYS = ((1e-2, 1e-3), (1e-3, 1e-4), (1e-4, 1e-5))
WORKER_GRID = (1, 2, 4)
EPW_GRID = (1, 2)


def grid_points(quick=False):
    """Yields (kind, delay, workers, envs_per_worker, batch_size)."""
    delays = DELAYS[1:2] if quick else DELAYS
    workers_grid = (2,) if quick else WORKER_GRID
    for kind in ('spin', 'sleep'):
        for mean, std in delays:
            for workers in workers_grid:
                for epw in EPW_GRID:
                    num_envs = workers * epw
                    batches = [num_envs]
                    if workers > 1:
                        batches.append(num_envs // 2)
                    for batch in batches:
                        yield (kind, (mean, std), workers, epw, batch)
    # real-env rows (no synthetic delay): protocol + emulation overhead
    # against a genuine gymnasium env
    cart_grid = ((2, 2, 4), ) if quick else ((2, 2, 4), (4, 1, 4),
        (4, 2, 8), (4, 4, 8))
    for workers, epw, batch in cart_grid:
        yield ('cartpole', (0.0, 0.0), workers, epw, batch)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seconds', type=float, default=2.0)
    ap.add_argument('--quick', action='store_true')
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    rows = []
    serial_cache = {}
    for kind, (mean, std), workers, epw, batch in grid_points(args.quick):
        num_envs = workers * epw
        if kind == 'cartpole':
            repo_creator = functools.partial(repo_env, kind)
            ref_creator = functools.partial(ref_env, kind)
        else:
            repo_creator = functools.partial(repo_env, kind, mean, std)
            ref_creator = functools.partial(ref_env, kind, mean, std)

        # serial baselines once per (kind, delay, num_envs)
        skey = (kind, mean, num_envs)
        if skey not in serial_cache:
            serial_cache[skey] = (
                run_reference(ref_creator, num_envs, 1, num_envs,
                    args.seconds, backend='serial'),
                run_repo(repo_creator, num_envs, 1, num_envs,
                    args.seconds, backend='serial'),
            )
        ref_serial, repo_serial = serial_cache[skey]

        ref_sps = run_reference(ref_creator, num_envs, workers, batch,
            args.seconds)
        repo_sps = run_repo(repo_creator, num_envs, workers, batch,
            args.seconds)
        row = {
            'fixture': kind, 'delay_mean': mean, 'delay_std': std,
            'workers': workers, 'envs_per_worker': epw,
            'num_envs': num_envs, 'batch_size': batch,
            'ref_mp_sps': round(ref_sps, 1),
            'repo_mp_sps': round(repo_sps, 1),
            'ref_serial_sps': round(ref_serial, 1),
            'repo_serial_sps': round(repo_serial, 1),
            'repo_vs_ref': round(repo_sps / max(ref_sps, 1e-9), 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    wins = sum(1 for r in rows if r['repo_vs_ref'] >= 1.0)
    summary = {
        'grid_points': len(rows),
        'repo_wins': wins,
        'geomean_repo_vs_ref': round(float(np.exp(np.mean(
            [np.log(r['repo_vs_ref']) for r in rows]))), 3),
        'cpu_count': os.cpu_count(),
        'seconds_per_point': args.seconds,
    }
    print(json.dumps({'summary': summary}), flush=True)
    if args.out:
        with open(args.out, 'w') as f:
            json.dump({'rows': rows, 'summary': summary}, f, indent=1)


if __name__ == '__main__':
    main()
