"""Profile update_fn alone at a given lane count and map the hot xprof
ops to their HLO definitions (shapes), to find the superlinear term in
the >8192-lane knee (docs/PERF.md).

Usage: python tools/probe_update_hlo.py [num_envs] [--hlo-only]
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from profile_lstm import build, op_profile_rows  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    n = int(args[0]) if args else 32768
    data = build(n, 64, use_rnn=False)
    params, opt_state, carry = data.params, data.opt_state, data.carry

    c, b, _, _ = data.rollout_fn(params, carry)
    float(b['reward'][0, 0])

    key = jax.random.PRNGKey(0)
    lr = jnp.float32(1e-4)

    # compiled HLO text for shape lookup
    compiled = data.update_fn.lower(params, opt_state, b, key, lr).compile()
    hlo = compiled.as_text()
    defs = {}
    for m in re.finditer(r'^\s*(?:ROOT )?%?([\w.\-]+)\s*=\s*(\S+)\s+fusion\(',
            hlo, re.M):
        defs[m.group(1)] = m.group(2)
    for m in re.finditer(
            r'^\s*(?:ROOT )?%?([\w.\-]+)\s*=\s*(\S+)\s+(?:convolution|dot|copy|custom-call)\(',
            hlo, re.M):
        defs[m.group(1)] = m.group(2)

    with open(f'/tmp/update_hlo_{n}.txt', 'w') as f:
        f.write(hlo)
    print(f'# HLO -> /tmp/update_hlo_{n}.txt ({len(hlo)} bytes)')

    p, o, stats = data.update_fn(params, opt_state, b, key, lr)
    float(stats['policy_loss'])

    logdir = f'/tmp/puffer_update_trace_{n}'
    os.system(f'rm -rf {logdir}')
    with jax.profiler.trace(logdir):
        for _ in range(8):
            p, o, stats = data.update_fn(p, o, b, key, lr)
        float(stats['policy_loss'])

    K = 20
    t0 = time.time()
    for _ in range(K):
        p, o, stats = data.update_fn(p, o, b, key, lr)
    float(stats['policy_loss'])
    step_ms = (time.time() - t0) / K * 1e3
    print(f'# update wall time: {step_ms:.2f} ms')

    rows = op_profile_rows(logdir)
    if rows is None:
        print('no xplane')
        return
    total = rows[0][0] or 1.0
    print(f'{"ms":>8s} {"%":>6s}  op [shape]')
    for t, name, depth in rows[:25]:
        frac = t / total
        base = name.split(' and its')[0]
        shape = defs.get(base, '')
        print(f'{frac * step_ms:8.3f} {100 * frac:6.1f}  '
              f'{"  " * depth}{base[:60]} {shape}')


if __name__ == '__main__':
    main()
