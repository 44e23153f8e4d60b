"""Encoder-fused LSTM kernel, v2: all non-recurrent matmuls hoisted
out of the time loop into per-tile VMEM pre/post-passes.

The recurrence only truly needs h_{t-1}: everything else is batch
work. Per tile (bt batch rows, all T timesteps):

  fwd pre-pass   x   = relu(feats @ W_enc + b_enc)        (T*bt, D)
                 xp  = x @ W_ih + b                       (T*bt, 4H)
  fwd loop       gates_t = xp[t] + h @ W_hh   (K=H only)
  bwd pre-pass   recompute x, xp
  bwd loop       recompute gates_t; elementwise chain -> dgates[t];
                 dh_prev = dgates_t @ W_hh.T  (N=H only)
  bwd post-pass  dW_ih = x.T  @ dgates        (ONE K=T*bt matmul)
                 dW_hh = hprev.T @ dgates     (ONE K=T*bt matmul)
                 db    = sum(dgates)
                 dx    = dgates @ W_ih.T; relu mask;
                 dW_enc = feats.T @ dpre; db_enc = sum(dpre)

vs lstm_scan_enc ('enc'): the loop drops from one K=D+H combined
matmul (+ per-timestep dW accumulation at K=bt in bwd) to the minimal
K=H / N=H recurrent matmuls; the hoisted matmuls run at M or K =
T*bt = thousands, where the MXU is actually efficient. All
intermediates live in VMEM scratch — nothing extra touches HBM.

Same signature/semantics as lstm_scan_enc (lstm_enc.py); the feats
cotangent is zero by contract (observations are not differentiated).
Gate order i,f,g,o matches torch.nn.LSTM (reference models.py:64-111).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pufferlib_tpu.ops.pallas.lstm import _tile_budget
from pufferlib_tpu.ops.pallas.lstm_cat import _act, _compiler_params
from pufferlib_tpu.ops.pallas.lstm_enc import (
    _lanes, lstm_scan_enc_reference)


def _pre(f_ref, we_ref, be_ref, wih_ref, b_ref, cdt, T):
    bt = f_ref.shape[1]
    F = f_ref.shape[-1]
    feats2 = f_ref[:].reshape(T * bt, F).astype(cdt)
    pre = jnp.dot(feats2, we_ref[:].astype(cdt),
        preferred_element_type=jnp.float32) \
        + be_ref[:].astype(jnp.float32)
    x = jnp.maximum(pre, 0.0)
    xp = jnp.dot(x.astype(cdt), wih_ref[:].astype(cdt),
        preferred_element_type=jnp.float32) \
        + b_ref[:].astype(jnp.float32)
    return feats2, x, xp


def _fwd_kernel(f_ref, h0_ref, c0_ref, we_ref, be_ref, wih_ref,
        whh_ref, b_ref, outs_ref, ht_ref, ct_ref, cseq_ref, x_scr,
        xp_scr, *, T, cdt, save_cseq):
    whh = whh_ref[:].astype(cdt)
    H = h0_ref.shape[-1]
    bt = h0_ref.shape[0]

    _, x, xp = _pre(f_ref, we_ref, be_ref, wih_ref, b_ref, cdt, T)
    x_scr[:] = x.astype(x_scr.dtype)
    xp_scr[:] = xp.astype(xp_scr.dtype)

    def body(t, carry):
        h, c = carry
        gates = xp_scr[pl.ds(t * bt, bt)].astype(jnp.float32) \
            + jnp.dot(h.astype(cdt), whh,
                preferred_element_type=jnp.float32)
        i, f, g, o = _act(gates, H)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        outs_ref[t] = h.astype(outs_ref.dtype)
        if save_cseq:
            cseq_ref[t] = c.astype(cseq_ref.dtype)
        return (h, c)

    h, c = jax.lax.fori_loop(0, T, body, (h0_ref[:], c0_ref[:]))
    ht_ref[:] = h
    ct_ref[:] = c


def _bwd_kernel(f_ref, h0_ref, c0_ref, we_ref, be_ref, wih_ref,
        whh_ref, b_ref, outs_ref, cseq_ref, g_outs_ref, g_ht_ref,
        g_ct_ref, dh0_ref, dc0_ref, dwe_ref, dbe_ref, dwih_ref,
        dwhh_ref, db_ref, x_scr, xp_scr, dg_scr, *, T, cdt):
    whh = whh_ref[:].astype(cdt)
    H = h0_ref.shape[-1]
    D = we_ref.shape[-1]
    bt = h0_ref.shape[0]
    b_idx = pl.program_id(0)

    @pl.when(b_idx == 0)
    def _():
        dwe_ref[:] = jnp.zeros_like(dwe_ref)
        dbe_ref[:] = jnp.zeros_like(dbe_ref)
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    feats2, x, xp = _pre(f_ref, we_ref, be_ref, wih_ref, b_ref, cdt, T)
    x_scr[:] = x.astype(x_scr.dtype)
    xp_scr[:] = xp.astype(xp_scr.dtype)

    def body(k, carry):
        t = T - 1 - k
        dh, dc = carry
        h_prev = jnp.where(t == 0, h0_ref[:], outs_ref[pl.ds(
            jnp.maximum(t - 1, 0), 1)][0].astype(jnp.float32))
        c_prev = jnp.where(t == 0, c0_ref[:], cseq_ref[pl.ds(
            jnp.maximum(t - 1, 0), 1)][0].astype(jnp.float32))
        c_t = cseq_ref[t].astype(jnp.float32)

        gates = xp_scr[pl.ds(t * bt, bt)].astype(jnp.float32) \
            + jnp.dot(h_prev.astype(cdt), whh,
                preferred_element_type=jnp.float32)
        i, f, g, o = _act(gates, H)

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
        dg_scr[pl.ds(t * bt, bt)] = dgates.astype(dg_scr.dtype)

        dh_prev = jnp.dot(dgates.astype(cdt), whh.T,
            preferred_element_type=jnp.float32)
        dc_prev = dc * f
        return (dh_prev, dc_prev)

    dh, dc = jax.lax.fori_loop(0, T, body,
        (g_ht_ref[:], g_ct_ref[:]))
    dh0_ref[:] = dh
    dc0_ref[:] = dc

    # post-pass: every remaining gradient is ONE tall matmul/reduce
    # over the (T*bt, .) scratch blocks.
    dgates_all = dg_scr[:].astype(cdt)
    x_all = x_scr[:].astype(cdt)
    # h inputs per timestep: [h0; outs[0..T-2]] flattened to (T*bt, H)
    hprev_all = jnp.concatenate([
        h0_ref[:].astype(cdt),
        outs_ref[pl.ds(0, T - 1)].reshape((T - 1) * bt, H).astype(cdt),
    ], axis=0)
    dwih_ref[:] += jnp.dot(x_all.T, dgates_all,
        preferred_element_type=jnp.float32)
    dwhh_ref[:] += jnp.dot(hprev_all.T, dgates_all,
        preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(dg_scr[:].astype(jnp.float32), axis=0,
        keepdims=True)
    dx_all = jnp.dot(dgates_all, wih_ref[:].astype(cdt).T,
        preferred_element_type=jnp.float32)
    dpre = jnp.where(x_scr[:].astype(jnp.float32) > 0, dx_all,
        0.0).astype(cdt)
    dwe_ref[:] += jnp.dot(feats2.T, dpre,
        preferred_element_type=jnp.float32)
    dbe_ref[:] += jnp.sum(dpre.astype(jnp.float32), axis=0,
        keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def lstm_scan_enc2(feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b,
        cdt=jnp.bfloat16):
    return _impl(feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b, cdt,
        with_cseq=False)[:3]


def _impl(feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b, cdt,
        with_cseq=True):
    T, B, F = feats.shape
    D = w_enc.shape[-1]
    H = h0.shape[-1]
    fb = feats.dtype.itemsize
    rb = 2 if cdt == jnp.bfloat16 else 4

    def fwd_bytes(bt):
        seqs = T * bt * (_lanes(F) * fb
            + (2 if with_cseq else 1) * H * rb)
        weights = (F * D + (D + H + 1) * 4 * H) * 4
        states = 4 * bt * H * 4
        scratch = T * bt * (D + 4 * H) * rb
        return seqs + weights + states + scratch

    bt = _tile_budget(B, 'PUFFER_LSTM_TILE_FWD', fwd_bytes)
    grid = (B // bt,)
    vm = pltpu.VMEM
    rdt = jnp.bfloat16 if cdt == jnp.bfloat16 else jnp.float32
    be2 = b_enc.reshape(1, D)
    b2 = b.reshape(1, 4 * H)
    seq_spec = pl.BlockSpec((T, bt, H), lambda i: (0, i, 0),
        memory_space=vm)
    state_spec = pl.BlockSpec((bt, H), lambda i: (i, 0), memory_space=vm)
    in_specs = [
        pl.BlockSpec((T, bt, F), lambda i: (0, i, 0), memory_space=vm),
        state_spec,
        state_spec,
        pl.BlockSpec((F, D), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((D, 4 * H), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((H, 4 * H), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((1, 4 * H), lambda i: (0, 0), memory_space=vm),
    ]
    out_specs = [seq_spec, state_spec, state_spec]
    out_shape = [
        jax.ShapeDtypeStruct((T, B, H), rdt),
        jax.ShapeDtypeStruct((B, H), jnp.float32),
        jax.ShapeDtypeStruct((B, H), jnp.float32),
    ]
    if with_cseq:
        out_specs = out_specs + [seq_spec]
        out_shape = out_shape + [jax.ShapeDtypeStruct((T, B, H), rdt)]
        kernel = functools.partial(_fwd_kernel, T=T, cdt=cdt,
            save_cseq=True)
    else:
        def kernel(f, h0r, c0r, wer, ber, wihr, whhr, br, o, ht, ct,
                x_scr, xp_scr):
            return _fwd_kernel(f, h0r, c0r, wer, ber, wihr, whhr, br,
                o, ht, ct, None, x_scr, xp_scr, T=T, cdt=cdt,
                save_cseq=False)
    res = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, compiler_params=_compiler_params(),
        scratch_shapes=[pltpu.VMEM((T * bt, D), rdt),
            pltpu.VMEM((T * bt, 4 * H), rdt)],
    )(feats, h0, c0, w_enc, be2, w_ih, w_hh, b2)
    if with_cseq:
        return res
    return tuple(res) + (None,)


def _fwd(feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b, cdt):
    outs, hT, cT, cseq = _impl(feats, h0, c0, w_enc, b_enc, w_ih,
        w_hh, b, cdt, with_cseq=True)
    return (outs, hT, cT), (feats, h0, c0, w_enc, b_enc, w_ih, w_hh,
        b, outs, cseq)


def _bwd(cdt, residuals, grads):
    feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b, outs, cseq = residuals
    g_outs, g_hT, g_cT = grads
    T, B, F = feats.shape
    D = w_enc.shape[-1]
    H = h0.shape[-1]
    fb = feats.dtype.itemsize
    rb = outs.dtype.itemsize

    def bwd_bytes(bt):
        seqs = T * bt * (_lanes(F) * fb + 3 * H * rb)
        weights = 2 * (F * D + (D + H + 1) * 4 * H) * 4
        states = 8 * bt * H * 4
        # scratch_shapes below: (T*bt, D) + two (T*bt, 4H) slabs
        scratch = T * bt * (D + 8 * H) * rb
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
    dh0, dc0, dwe, dbe, dwih, dwhh, db = pl.pallas_call(
        kernel, grid=grid, compiler_params=_compiler_params(),
        scratch_shapes=[pltpu.VMEM((T * bt, D), rdt),
            pltpu.VMEM((T * bt, 4 * H), rdt),
            pltpu.VMEM((T * bt, 4 * H), rdt)],
        in_specs=[
            pl.BlockSpec((T, bt, F), lambda i: (0, i, 0),
                memory_space=vm),
            state_spec, state_spec,
            pl.BlockSpec((F, D), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((D, 4 * H), lambda i: (0, 0),
                memory_space=vm),
            pl.BlockSpec((H, 4 * H), lambda i: (0, 0),
                memory_space=vm),
            pl.BlockSpec((1, 4 * H), lambda i: (0, 0), memory_space=vm),
            seq_h, seq_h, seq_h,
            state_spec, state_spec,
        ],
        out_specs=[
            state_spec, state_spec,
            pl.BlockSpec((F, D), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((D, 4 * H), lambda i: (0, 0),
                memory_space=vm),
            pl.BlockSpec((H, 4 * H), lambda i: (0, 0),
                memory_space=vm),
            pl.BlockSpec((1, 4 * H), lambda i: (0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((F, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * H), jnp.float32),
        ],
    )(feats, h0, c0, w_enc, be2, w_ih, w_hh, b2, outs, cseq, g_outs,
        g_hT, g_cT)
    # zero feats cotangent by contract; DCE'd by XLA (obs are
    # stop_gradient'ed by the wrapper)
    return (jnp.zeros_like(feats), dh0, dc0,
        dwe.astype(w_enc.dtype), dbe.reshape(D).astype(b_enc.dtype),
        dwih.astype(w_ih.dtype), dwhh.astype(w_hh.dtype),
        db.reshape(4 * H).astype(b.dtype))


lstm_scan_enc2.defvjp(_fwd, _bwd)
