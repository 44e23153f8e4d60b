"""Microbenchmark LSTM kernel variants at bench minibatch shapes.

Times forward and forward+backward of the production kernels and
experimental variants on the real TPU, at the shapes the LSTM bench
actually runs (per-minibatch time-slab: T=16, B=8192, D=H=128, bf16
inputs). Honest timing: slope between short/long rep counts so the
tunnel RTT cancels.

Usage: python tools/kernel_lab.py [variant ...]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def slope(run_k, k1=50, k2=450):
    """Steady-state per-iter time. K >= 400 dispatches per fetch window
    so the tunnel's tens-of-ms RTT jitter cancels (docs/PERF.md
    'Measuring honestly on this runtime'); the earlier k1=5/k2=25
    setting produced +-2 ms swings on ~1 ms kernels."""
    run_k(1)
    t1 = run_k(k1)
    t2 = run_k(k2)
    return (t2 - t1) / (k2 - k1)


def bench(name, fn, args, grad=True):
    if grad:
        def loss(*a):
            outs, hT, cT = fn(*a)
            return (outs.astype(jnp.float32).sum()
                + hT.sum() + cT.sum())
        f = jax.jit(jax.grad(loss, argnums=tuple(range(len(args)))))
    else:
        f = jax.jit(lambda *a: fn(*a)[0].astype(jnp.float32).sum())

    def run_k(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = f(*args)
        jax.tree.leaves(out)[0].block_until_ready()
        float(jax.tree.leaves(out)[0].ravel()[0])
        return time.perf_counter() - t0

    t = slope(run_k)
    tag = 'fwd+bwd' if grad else 'fwd    '
    print(f'{name:32s} {tag} {t*1e3:8.3f} ms')
    return t


def main():
    T, B, D, H = 16, 8192, 128, 128
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 8)
    x = jax.random.normal(ks[0], (T, B, D), jnp.bfloat16)
    h0 = jax.random.normal(ks[1], (B, H), jnp.float32)
    c0 = jax.random.normal(ks[2], (B, H), jnp.float32)
    w_ih = jax.random.normal(ks[3], (D, 4 * H), jnp.float32) * 0.05
    w_hh = jax.random.normal(ks[4], (H, 4 * H), jnp.float32) * 0.05
    b = jax.random.normal(ks[5], (4 * H,), jnp.float32) * 0.05

    want = sys.argv[1:] or ['fused', 'fused-fwd']
    known = {'fused', 'fused-fwd', 'cat', 'enc', 'enc2', 'enc3',
        'enc4', 'enc5', 'enc6', 'tc'}
    unknown = [v for v in want if v not in known]
    if unknown:
        sys.exit(f'unknown variant(s) {unknown}; choose from '
            f'{sorted(known)}')

    from pufferlib_tpu.ops.pallas.lstm import lstm_scan_fused

    if 'fused' in want:
        bench('lstm_scan_fused (prod)', lstm_scan_fused,
            (x, h0, c0, w_ih, w_hh, b))
    if 'fused-fwd' in want:
        bench('lstm_scan_fused (prod)', lstm_scan_fused,
            (x, h0, c0, w_ih, w_hh, b), grad=False)
    if 'cat' in want:
        from pufferlib_tpu.ops.pallas.lstm_cat import lstm_scan_cat
        bench('lstm_scan_cat', lstm_scan_cat,
            (x, h0, c0, w_ih, w_hh, b))
        bench('lstm_scan_cat', lstm_scan_cat,
            (x, h0, c0, w_ih, w_hh, b), grad=False)
    if 'enc' in want:
        from pufferlib_tpu.ops.pallas.lstm_enc import lstm_scan_enc
        F = 49
        feats = jax.random.normal(ks[6], (T, B, F), jnp.bfloat16)
        w_enc = jax.random.normal(ks[7], (F, D), jnp.float32) * 0.1
        b_enc = jnp.zeros((D,), jnp.float32)
        eargs = (feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b)

        def enc_grad(*a):
            # grad wrt weights only (the trainer's pattern: obs are
            # stop-gradient constants)
            outs, hT, cT = lstm_scan_enc(*a)
            return outs.astype(jnp.float32).sum() + hT.sum() + cT.sum()
        f = jax.jit(jax.grad(enc_grad, argnums=(3, 4, 5, 6, 7)))

        def run_k(k):
            t0 = time.perf_counter()
            for _ in range(k):
                out = f(*eargs)
            float(jax.tree.leaves(out)[0].ravel()[0])
            return time.perf_counter() - t0
        t = slope(run_k)
        print(f'{"lstm_scan_enc":32s} fwd+bwd {t*1e3:8.3f} ms')
        bench('lstm_scan_enc', lstm_scan_enc, eargs, grad=False)
    enc_variants = ('enc2', 'enc3', 'enc4', 'enc5', 'enc6')
    for name in enc_variants:
        if name not in want:
            continue
        if name == 'enc2':
            from pufferlib_tpu.ops.pallas.archive.lstm_enc2 import (
                lstm_scan_enc2 as scan)
        elif name == 'enc3':
            from pufferlib_tpu.ops.pallas.archive.lstm_enc3 import (
                lstm_scan_enc3 as scan)
        elif name == 'enc4':
            from pufferlib_tpu.ops.pallas.archive.lstm_enc4 import (
                lstm_scan_enc4 as scan)
        elif name == 'enc6':
            from pufferlib_tpu.ops.pallas.archive.lstm_enc6 import (
                lstm_scan_enc6 as scan)
        else:
            from pufferlib_tpu.ops.pallas.lstm_enc5 import (
                lstm_scan_enc5 as scan)
        F = 49
        feats = jax.random.normal(ks[6], (T, B, F), jnp.bfloat16)
        w_enc = jax.random.normal(ks[7], (F, D), jnp.float32) * 0.1
        b_enc = jnp.zeros((D,), jnp.float32)
        eargs = (feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b)

        def enc_v_grad(*a, _scan=scan):
            outs, hT, cT = _scan(*a)
            return outs.astype(jnp.float32).sum() + hT.sum() + cT.sum()
        f = jax.jit(jax.grad(enc_v_grad, argnums=(3, 4, 5, 6, 7)))

        def run_k(k):
            t0 = time.perf_counter()
            for _ in range(k):
                out = f(*eargs)
            float(jax.tree.leaves(out)[0].ravel()[0])
            return time.perf_counter() - t0
        t = slope(run_k)
        print(f'{"lstm_scan_" + name:32s} fwd+bwd {t*1e3:8.3f} ms')
        bench('lstm_scan_' + name, scan, eargs, grad=False)
    if 'tc' in want:
        from pufferlib_tpu.ops.pallas.lstm_tc import lstm_scan_tc
        bench('lstm_scan_tc', lstm_scan_tc,
            (x, h0, c0, w_ih, w_hh, b))
        bench('lstm_scan_tc', lstm_scan_tc,
            (x, h0, c0, w_ih, w_hh, b), grad=False)


if __name__ == '__main__':
    main()
