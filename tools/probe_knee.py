"""Bisect the >8192-lane MLP throughput knee: time the rollout and
update programs separately across lane counts (docs/PERF.md lane sweep).

Usage: python tools/probe_knee.py [num_envs ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from profile_lstm import build  # noqa: E402


def timed(fn, *args, reps=20, sync=None):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / reps * 1e3, out


def main():
    lanes = [int(a) for a in sys.argv[1:]] or [8192, 16384, 32768]
    for n in lanes:
        data = build(n, 64, use_rnn=False)
        params, opt_state, carry = data.params, data.opt_state, data.carry

        # rollout_fn donates the carry; chain it through the loop
        c, b, _, _ = data.rollout_fn(params, carry)
        float(b['reward'][0, 0])

        t0 = time.time()
        reps = 20
        for _ in range(reps):
            c, b, _, _ = data.rollout_fn(params, c)
        float(b['reward'][0, 0])
        roll_ms = (time.time() - t0) / reps * 1e3

        key = jax.random.PRNGKey(0)
        lr = jnp.float32(1e-4)
        p, o = params, opt_state
        p, o, stats = data.update_fn(p, o, b, key, lr)
        float(stats['policy_loss'])
        t0 = time.time()
        for _ in range(reps):
            p, o, stats = data.update_fn(p, o, b, key, lr)
        float(stats['policy_loss'])
        upd_ms = (time.time() - t0) / reps * 1e3

        batch_size = n * 64
        print(f'envs={n:6d} rollout={roll_ms:8.2f} ms '
              f'update={upd_ms:8.2f} ms  '
              f'sum_sps={batch_size / (roll_ms + upd_ms) * 1e3 / 1e6:.1f}M',
              flush=True)
        data.vecenv.close()


if __name__ == '__main__':
    main()
