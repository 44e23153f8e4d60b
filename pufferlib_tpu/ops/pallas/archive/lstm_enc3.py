"""lstm_scan_enc backward variant: gate recompute hoisted.

In the BACKWARD pass the whole h-sequence is already known (outs is a
residual), so the per-timestep gate recompute [x_t|h_{t-1}] @ W and
its sigmoid/tanh activations do not have to run inside the reverse
loop at all: ONE (T*bt, D+H) @ (D+H, 4H) pre-pass matmul + batched
activations fill a VMEM scratch, and the loop reads activated gates
per timestep. The loop drops from 3 matmuls + 6 transcendentals per
timestep to 2 matmuls + 1 tanh.

Forward pass and semantics identical to lstm_scan_enc (lstm_enc.py);
only the backward kernel differs. Selectable via
PUFFER_LSTM_KERNEL=enc3.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pufferlib_tpu.ops.pallas.lstm import _tile_budget
from pufferlib_tpu.ops.pallas.lstm_cat import _act, _compiler_params
from pufferlib_tpu.ops.pallas import lstm_enc as _enc
from pufferlib_tpu.ops.pallas.lstm_enc import _lanes


def _bwd_kernel(f_ref, h0_ref, c0_ref, we_ref, be_ref, w_ref, b_ref,
        outs_ref, cseq_ref, g_outs_ref, g_ht_ref, g_ct_ref,
        dh0_ref, dc0_ref, dwe_ref, dbe_ref, dw_ref, db_ref,
        x_scr, acts_scr, dx_scr, *, T, cdt):
    we = we_ref[:].astype(cdt)
    be = be_ref[:].astype(jnp.float32)
    w = w_ref[:].astype(cdt)
    bias = b_ref[:].astype(jnp.float32)
    H = h0_ref.shape[-1]
    D = we_ref.shape[-1]
    bt = h0_ref.shape[0]
    b_idx = pl.program_id(0)

    @pl.when(b_idx == 0)
    def _():
        dwe_ref[:] = jnp.zeros_like(dwe_ref)
        dbe_ref[:] = jnp.zeros_like(dbe_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    # pre-pass: encoder, then EVERY timestep's gates + activations in
    # one batched matmul/VPU sweep (h_prev is known from outs)
    feats2, x_all = _enc._encode_block(f_ref, we, be, cdt, T)
    x_scr[:] = x_all.astype(x_scr.dtype)
    hprev_all = jnp.concatenate([
        h0_ref[:].astype(cdt),
        outs_ref[pl.ds(0, T - 1)].reshape((T - 1) * bt, H).astype(cdt),
    ], axis=0)
    xh_all = jnp.concatenate([x_all.astype(cdt), hprev_all], axis=-1)
    gates_all = jnp.dot(xh_all, w,
        preferred_element_type=jnp.float32) + bias
    i_a, f_a, g_a, o_a = _act(gates_all, H)
    acts_scr[:] = jnp.concatenate([i_a, f_a, g_a, o_a],
        axis=-1).astype(acts_scr.dtype)

    def body(k, carry):
        t = T - 1 - k
        dh, dc, dw, db = carry
        h_prev = jnp.where(t == 0, h0_ref[:], outs_ref[pl.ds(
            jnp.maximum(t - 1, 0), 1)][0].astype(jnp.float32))
        c_prev = jnp.where(t == 0, c0_ref[:], cseq_ref[pl.ds(
            jnp.maximum(t - 1, 0), 1)][0].astype(jnp.float32))
        c_t = cseq_ref[t].astype(jnp.float32)

        acts = acts_scr[pl.ds(t * bt, bt)].astype(jnp.float32)
        i, f = acts[:, :H], acts[:, H:2 * H]
        g, o = acts[:, 2 * H:3 * H], acts[:, 3 * H:]

        dh = dh + g_outs_ref[t].astype(jnp.float32)
        tc = jnp.tanh(c_t)
        do = dh * tc
        dc = dc + dh * o * (1.0 - tc * tc)
        di, dg = dc * g, dc * i
        df = dc * c_prev
        d_i = di * i * (1.0 - i)
        d_f = df * f * (1.0 - f)
        d_g = dg * (1.0 - g * g)
        d_o = do * o * (1.0 - o)
        dgates = jnp.concatenate([d_i, d_f, d_g, d_o], axis=-1)
        dgates_c = dgates.astype(cdt)

        dxh = jnp.dot(dgates_c, w.T,
            preferred_element_type=jnp.float32)
        dx_scr[pl.ds(t * bt, bt)] = dxh[:, :D].astype(dx_scr.dtype)
        dh_prev = dxh[:, D:]
        xh = jnp.concatenate([x_scr[pl.ds(t * bt, bt)].astype(cdt),
            h_prev.astype(cdt)], axis=-1)
        dw = dw + jnp.dot(xh.T, dgates_c,
            preferred_element_type=jnp.float32)
        db = db + jnp.sum(dgates, axis=0, keepdims=True)
        dc_prev = dc * f
        return (dh_prev, dc_prev, dw, db)

    dh, dc, dw, db = jax.lax.fori_loop(0, T, body, (
        g_ht_ref[:], g_ct_ref[:], jnp.zeros_like(dw_ref),
        jnp.zeros_like(db_ref)))
    dh0_ref[:] = dh
    dc0_ref[:] = dc
    dw_ref[:] += dw
    db_ref[:] += db

    # encoder backward, once per tile (as lstm_enc)
    dpre = jnp.where(x_scr[:].astype(jnp.float32) > 0,
        dx_scr[:].astype(jnp.float32), 0.0).astype(cdt)
    dwe_ref[:] += jnp.dot(feats2.T, dpre,
        preferred_element_type=jnp.float32)
    dbe_ref[:] += jnp.sum(dpre.astype(jnp.float32), axis=0,
        keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def lstm_scan_enc3(feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b,
        cdt=jnp.bfloat16):
    return _enc._impl(feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b, cdt,
        with_cseq=False)[:3]


def _fwd(feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b, cdt):
    outs, hT, cT, cseq = _enc._impl(feats, h0, c0, w_enc, b_enc, w_ih,
        w_hh, b, cdt, with_cseq=True)
    return (outs, hT, cT), (feats, h0, c0, w_enc, b_enc, w_ih, w_hh,
        b, outs, cseq)


def _bwd(cdt, residuals, grads):
    feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b, outs, cseq = residuals
    g_outs, g_hT, g_cT = grads
    T, B, F = feats.shape
    D = w_enc.shape[-1]
    H = h0.shape[-1]
    w = jnp.concatenate([w_ih, w_hh], axis=0)
    fb = feats.dtype.itemsize
    rb = outs.dtype.itemsize

    def bwd_bytes(bt):
        seqs = T * bt * (_lanes(F) * fb + 3 * H * rb)
        weights = 2 * (F * D + (D + H + 1) * 4 * H) * 4
        states = 8 * bt * H * 4
        scratch = T * bt * (2 * D + 4 * H) * rb
        return seqs + weights + states + scratch

    bt = _tile_budget(B, 'PUFFER_LSTM_TILE_BWD', bwd_bytes)
    grid = (B // bt,)
    vm = pltpu.VMEM
    rdt = jnp.bfloat16 if cdt == jnp.bfloat16 else jnp.float32
    be2 = b_enc.reshape(1, D)
    b2 = b.reshape(1, 4 * H)
    seq_h = pl.BlockSpec((T, bt, H), lambda i: (0, i, 0),
        memory_space=vm)
    state_spec = pl.BlockSpec((bt, H), lambda i: (i, 0), memory_space=vm)
    kernel = functools.partial(_bwd_kernel, T=T, cdt=cdt)
    dh0, dc0, dwe, dbe, dw, db = pl.pallas_call(
        kernel, grid=grid, compiler_params=_compiler_params(),
        scratch_shapes=[pltpu.VMEM((T * bt, D), rdt),
            pltpu.VMEM((T * bt, 4 * H), rdt),
            pltpu.VMEM((T * bt, D), rdt)],
        in_specs=[
            pl.BlockSpec((T, bt, F), lambda i: (0, i, 0),
                memory_space=vm),
            state_spec, state_spec,
            pl.BlockSpec((F, D), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((D + H, 4 * H), lambda i: (0, 0),
                memory_space=vm),
            pl.BlockSpec((1, 4 * H), lambda i: (0, 0), memory_space=vm),
            seq_h, seq_h, seq_h,
            state_spec, state_spec,
        ],
        out_specs=[
            state_spec, state_spec,
            pl.BlockSpec((F, D), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((D + H, 4 * H), lambda i: (0, 0),
                memory_space=vm),
            pl.BlockSpec((1, 4 * H), lambda i: (0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((F, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D + H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * H), jnp.float32),
        ],
    )(feats, h0, c0, w_enc, be2, w, b2, outs, cseq, g_outs, g_hT,
        g_cT)
    return (jnp.zeros_like(feats), dh0, dc0,
        dwe.astype(w_enc.dtype), dbe.reshape(D).astype(b_enc.dtype),
        dw[:D].astype(w_ih.dtype), dw[D:].astype(w_hh.dtype),
        db.reshape(4 * H).astype(b.dtype))


lstm_scan_enc3.defvjp(_fwd, _bwd)
