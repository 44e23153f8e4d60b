"""Timing probes for the cat-kernel BACKWARD: where does 0.9 ms go?

Runs stripped variants of lstm_cat's backward kernel (same shapes,
streams, and grid) with pieces disabled, to attribute time between the
3 matmuls, the transcendental recompute, and the f32 elementwise chain.
NOT numerically meaningful — timing only.

Usage: python tools/probe_bwd.py [variant ...]
variants: full norecomp nomm ew-bf16 mm-only
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_bwd(T, variant, cdt=jnp.bfloat16):
    def _act(gates, H):
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        return i, f, g, o

    def kernel(x_ref, h0_ref, c0_ref, w_ref, b_ref, outs_ref,
            cseq_ref, g_outs_ref, g_ht_ref, g_ct_ref,
            dx_ref, dh0_ref, dc0_ref, dw_ref, db_ref):
        w = w_ref[:].astype(cdt)
        bias = b_ref[:].astype(jnp.float32)
        H = h0_ref.shape[-1]
        D = x_ref.shape[-1]
        b_idx = pl.program_id(0)

        @pl.when(b_idx == 0)
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)
            db_ref[:] = jnp.zeros_like(db_ref)

        ew = cdt if variant == 'ew-bf16' else jnp.float32

        def body(k, carry):
            t = T - 1 - k
            dh, dc, dw, db = carry
            h_prev = jnp.where(t == 0, h0_ref[:], outs_ref[pl.ds(
                jnp.maximum(t - 1, 0), 1)][0].astype(jnp.float32))
            c_prev = jnp.where(t == 0, c0_ref[:], cseq_ref[pl.ds(
                jnp.maximum(t - 1, 0), 1)][0].astype(jnp.float32))
            c_t = cseq_ref[t].astype(ew)

            xh = jnp.concatenate(
                [x_ref[t].astype(cdt), h_prev.astype(cdt)], axis=-1)
            if variant in ('full', 'ew-bf16'):
                gates = jnp.dot(xh, w,
                    preferred_element_type=jnp.float32) + bias
                i, f, g, o = [a.astype(ew) for a in _act(gates, H)]
            elif variant == 'norecomp':
                # no recompute matmul, no sigmoids: fake gates from the
                # streams we already hold (keeps stream traffic honest)
                i = c_t * 0.5
                f = c_prev.astype(ew) * 0.5
                g = outs_ref[t].astype(ew)
                o = g * 0.5
            else:  # nomm / mm-only
                gates = jnp.dot(xh, w,
                    preferred_element_type=jnp.float32) + bias
                i, f, g, o = _act(gates.astype(ew), H)

            dh = dh.astype(ew) + g_outs_ref[t].astype(ew)
            if variant == 'mm-only':
                dgates = jnp.concatenate([i, f, g, o], axis=-1)
            else:
                tc = jnp.tanh(c_t)
                do = dh * tc
                dc = dc.astype(ew) + dh * o * (1.0 - tc * tc)
                di, dg = dc * g, dc * i
                df = dc * c_prev.astype(ew)
                d_i = di * i * (1.0 - i)
                d_f = df * f * (1.0 - f)
                d_g = dg * (1.0 - g * g)
                d_o = do * o * (1.0 - o)
                dgates = jnp.concatenate([d_i, d_f, d_g, d_o], axis=-1)
            dgates_c = dgates.astype(cdt)

            if variant == 'nomm':
                dx_ref[t] = dgates_c[:, :D].astype(dx_ref.dtype)
                dh_prev = dgates[:, D:2 * D].astype(jnp.float32)
                dw_n, db_n = dw, db + jnp.sum(
                    dgates.astype(jnp.float32), axis=0, keepdims=True)
            else:
                dxh = jnp.dot(dgates_c, w.T,
                    preferred_element_type=jnp.float32)
                dx_ref[t] = dxh[:, :D].astype(dx_ref.dtype)
                dh_prev = dxh[:, D:]
                dw_n = dw + jnp.dot(xh.T, dgates_c,
                    preferred_element_type=jnp.float32)
                db_n = db + jnp.sum(
                    dgates.astype(jnp.float32), axis=0, keepdims=True)
            dc_prev = (dc * f).astype(jnp.float32) if variant != 'mm-only' \
                else dc
            return (dh_prev, dc_prev, dw_n, db_n)

        dh, dc, dw, db = jax.lax.fori_loop(0, T, body, (
            g_ht_ref[:], g_ct_ref[:], jnp.zeros_like(dw_ref),
            jnp.zeros_like(db_ref)))
        dh0_ref[:] = dh
        dc0_ref[:] = dc
        dw_ref[:] += dw
        db_ref[:] += db
    return kernel


def run(variant, T=16, B=8192, D=128, H=128, bt=128):
    k = jax.random.split(jax.random.PRNGKey(0), 10)
    cdt = jnp.bfloat16
    x = jax.random.normal(k[0], (T, B, D), jnp.bfloat16)
    h0 = jax.random.normal(k[1], (B, H), jnp.float32)
    c0 = jax.random.normal(k[2], (B, H), jnp.float32)
    w = jax.random.normal(k[3], (D + H, 4 * H), jnp.float32) * 0.05
    b2 = jax.random.normal(k[4], (1, 4 * H), jnp.float32) * 0.05
    outs = jax.random.normal(k[5], (T, B, H), jnp.bfloat16)
    cseq = jax.random.normal(k[6], (T, B, H), jnp.bfloat16)
    g_outs = jax.random.normal(k[7], (T, B, H), jnp.bfloat16)
    g_ht = jax.random.normal(k[8], (B, H), jnp.float32)
    g_ct = jax.random.normal(k[9], (B, H), jnp.float32)

    grid = (B // bt,)
    vm = pltpu.VMEM
    seq_h = pl.BlockSpec((T, bt, H), lambda i: (0, i, 0), memory_space=vm)
    state_spec = pl.BlockSpec((bt, H), lambda i: (i, 0), memory_space=vm)
    f = pl.pallas_call(
        make_bwd(T, variant), grid=grid,
        in_specs=[
            pl.BlockSpec((T, bt, D), lambda i: (0, i, 0), memory_space=vm),
            state_spec, state_spec,
            pl.BlockSpec((D + H, 4 * H), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, 4 * H), lambda i: (0, 0), memory_space=vm),
            seq_h, seq_h, seq_h,
            state_spec, state_spec,
        ],
        out_specs=[
            pl.BlockSpec((T, bt, D), lambda i: (0, i, 0), memory_space=vm),
            state_spec, state_spec,
            pl.BlockSpec((D + H, 4 * H), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, 4 * H), lambda i: (0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, D), x.dtype),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((D + H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * H), jnp.float32),
        ],
    )
    jf = jax.jit(lambda *a: f(*a)[3].sum())
    args = (x, h0, c0, w, b2, outs, cseq, g_outs, g_ht, g_ct)

    def run_k(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = jf(*args)
        float(out)
        return time.perf_counter() - t0

    run_k(1)
    t1, t2 = run_k(5), run_k(25)
    t = (t2 - t1) / 20
    print(f'bwd[{variant:10s}] {t*1e3:8.3f} ms')


if __name__ == '__main__':
    for v in (sys.argv[1:] or ['full', 'norecomp', 'nomm', 'ew-bf16']):
        run(v)
