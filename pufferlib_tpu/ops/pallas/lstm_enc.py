"""Fully-fused encoder+LSTM kernel: relu(feats @ W_enc + b_enc) feeds
the combined-operand LSTM cell, all inside one Pallas kernel.

Motivation (measured, docs/PERF.md): with the encoder outside, every
minibatch pays the encoder output write (T,B,H), the LSTM backward's
dx write (T,B,H), the encoder backward's re-read of both, and the
standalone encoder matmul dispatches. Observations are NOT
differentiated in RL training — only the encoder's weights need
gradients — so fusing the encoder in means the kernel streams the raw
(T,B,F) features once per pass and NO intermediate or gradient
sequence ever exists in HBM. The backward recomputes the encoder
matmul (FLOPs are ~5% of the gate matmul) and accumulates dW_enc /
db_enc in VMEM across the whole grid.

Contract: the features cotangent is ZERO (callers pass
stop_gradient(feats); the wrapper does). Gate order i,f,g,o matches
torch.nn.LSTM (reference models.py:64-111).

lstm_scan_enc(feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b)
  feats: (T, B, F) pre-encoder features (obs after reshape/nativize/
         dtype cast); w_enc: (F, D); b_enc: (D,)
  -> (outs, hT, cT) with outs (T, B, H)
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pufferlib_tpu.ops.pallas.lstm import _tile_budget
from pufferlib_tpu.ops.pallas.lstm_cat import _act, _compiler_params


def _lanes(n):
    # VMEM lane padding: the minor dim rounds up to 128
    return ((n + 127) // 128) * 128


def _encode(feats_t, we, be, cdt):
    pre = jnp.dot(feats_t.astype(cdt), we,
        preferred_element_type=jnp.float32) + be
    return jnp.maximum(pre, 0.0)


def _fwd_kernel(f_ref, h0_ref, c0_ref, we_ref, be_ref, w_ref, b_ref,
        outs_ref, ht_ref, ct_ref, cseq_ref=None, *, T, cdt, save_cseq):
    we = we_ref[:].astype(cdt)
    be = be_ref[:].astype(jnp.float32)
    w = w_ref[:].astype(cdt)
    bias = b_ref[:].astype(jnp.float32)
    H = h0_ref.shape[-1]

    def body(t, carry):
        h, c = carry
        x = _encode(f_ref[t], we, be, cdt)
        xh = jnp.concatenate([x.astype(cdt), h.astype(cdt)], axis=-1)
        gates = jnp.dot(xh, w,
            preferred_element_type=jnp.float32) + bias
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


def _bwd_kernel(f_ref, h0_ref, c0_ref, we_ref, be_ref, w_ref, b_ref,
        outs_ref, cseq_ref, g_outs_ref, g_ht_ref, g_ct_ref,
        dh0_ref, dc0_ref, dwe_ref, dbe_ref, dw_ref, db_ref, *, T, cdt):
    we = we_ref[:].astype(cdt)
    be = be_ref[:].astype(jnp.float32)
    w = w_ref[:].astype(cdt)
    bias = b_ref[:].astype(jnp.float32)
    H = h0_ref.shape[-1]
    D = we_ref.shape[-1]
    b_idx = pl.program_id(0)

    @pl.when(b_idx == 0)
    def _():
        dwe_ref[:] = jnp.zeros_like(dwe_ref)
        dbe_ref[:] = jnp.zeros_like(dbe_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    def body(k, carry):
        t = T - 1 - k
        dh, dc, dwe, dbe, dw, db = carry
        h_prev = jnp.where(t == 0, h0_ref[:], outs_ref[pl.ds(
            jnp.maximum(t - 1, 0), 1)][0].astype(jnp.float32))
        c_prev = jnp.where(t == 0, c0_ref[:], cseq_ref[pl.ds(
            jnp.maximum(t - 1, 0), 1)][0].astype(jnp.float32))
        c_t = cseq_ref[t].astype(jnp.float32)

        f_t = f_ref[t]
        x = _encode(f_t, we, be, cdt)
        xh = jnp.concatenate([x.astype(cdt), h_prev.astype(cdt)],
            axis=-1)
        gates = jnp.dot(xh, w,
            preferred_element_type=jnp.float32) + bias
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
        dgates_c = dgates.astype(cdt)

        dxh = jnp.dot(dgates_c, w.T,
            preferred_element_type=jnp.float32)
        # relu backward: x > 0 iff pre > 0 (max(pre, 0))
        dpre = jnp.where(x > 0.0, dxh[:, :D], 0.0).astype(cdt)
        dwe = dwe + jnp.dot(f_t.astype(cdt).T, dpre,
            preferred_element_type=jnp.float32)
        dbe = dbe + jnp.sum(dpre.astype(jnp.float32), axis=0,
            keepdims=True)
        dh_prev = dxh[:, D:]
        dw = dw + jnp.dot(xh.T, dgates_c,
            preferred_element_type=jnp.float32)
        db = db + jnp.sum(dgates, axis=0, keepdims=True)
        dc_prev = dc * f
        return (dh_prev, dc_prev, dwe, dbe, dw, db)

    dh, dc, dwe, dbe, dw, db = jax.lax.fori_loop(0, T, body, (
        g_ht_ref[:], g_ct_ref[:], jnp.zeros_like(dwe_ref),
        jnp.zeros_like(dbe_ref), jnp.zeros_like(dw_ref),
        jnp.zeros_like(db_ref)))
    dh0_ref[:] = dh
    dc0_ref[:] = dc
    dwe_ref[:] += dwe
    dbe_ref[:] += dbe
    dw_ref[:] += dw
    db_ref[:] += db


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def lstm_scan_enc(feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b,
        cdt=jnp.bfloat16):
    return _impl(feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b, cdt,
        with_cseq=False)[:3]


def _impl(feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b, cdt,
        with_cseq=True):
    T, B, F = feats.shape
    D = w_enc.shape[-1]
    H = h0.shape[-1]
    w = jnp.concatenate([w_ih, w_hh], axis=0)  # (D+H, 4H)
    fb = feats.dtype.itemsize
    rb = 2 if cdt == jnp.bfloat16 else 4

    def fwd_bytes(bt):
        seqs = T * bt * (_lanes(F) * fb
            + (2 if with_cseq else 1) * H * rb)
        weights = (F * D + (D + H + 1) * 4 * H) * 4
        states = 4 * bt * H * 4
        return seqs + weights + states

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
        pl.BlockSpec((D + H, 4 * H), lambda i: (0, 0), memory_space=vm),
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
        save_cseq=with_cseq)
    res = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, compiler_params=_compiler_params(),
    )(feats, h0, c0, w_enc, be2, w, b2)
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
    w = jnp.concatenate([w_ih, w_hh], axis=0)
    fb = feats.dtype.itemsize
    rb = outs.dtype.itemsize

    def bwd_bytes(bt):
        seqs = T * bt * (_lanes(F) * fb + 3 * H * rb)
        weights = 2 * (F * D + (D + H + 1) * 4 * H) * 4
        states = 8 * bt * H * 4
        return seqs + weights + states

    bt = _tile_budget(B, 'PUFFER_LSTM_TILE_BWD', bwd_bytes)
    grid = (B // bt,)
    vm = pltpu.VMEM
    be2 = b_enc.reshape(1, D)
    b2 = b.reshape(1, 4 * H)
    seq_h = pl.BlockSpec((T, bt, H), lambda i: (0, i, 0),
        memory_space=vm)
    state_spec = pl.BlockSpec((bt, H), lambda i: (i, 0), memory_space=vm)
    kernel = functools.partial(_bwd_kernel, T=T, cdt=cdt)
    dh0, dc0, dwe, dbe, dw, db = pl.pallas_call(
        kernel, grid=grid, compiler_params=_compiler_params(),
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
    )(feats, h0, c0, w_enc, be2, w, b2, outs, cseq, g_outs, g_hT, g_cT)
    # feats cotangent is zero BY CONTRACT (observations are not
    # differentiated; the wrapper stop_gradients them). The zeros are
    # never materialized — XLA dead-code-eliminates the unused output.
    return (jnp.zeros_like(feats), dh0, dc0,
        dwe.astype(w_enc.dtype), dbe.reshape(D).astype(b_enc.dtype),
        dw[:D].astype(w_ih.dtype), dw[D:].astype(w_hh.dtype),
        db.reshape(4 * H).astype(b.dtype))


lstm_scan_enc.defvjp(_fwd, _bwd)


def lstm_scan_enc_reference(feats, h0, c0, w_enc, b_enc, w_ih, w_hh,
        b, cdt=jnp.float32):
    """Pure-JAX reference with identical semantics (for tests)."""
    from pufferlib_tpu.ops.pallas.lstm import lstm_scan_fused_reference
    pre = (jnp.dot(feats.astype(cdt), w_enc.astype(cdt),
        preferred_element_type=jnp.float32)
        + b_enc.astype(jnp.float32))
    x = jnp.maximum(pre, 0.0).astype(feats.dtype)
    return lstm_scan_fused_reference(x, h0, c0, w_ih, w_hh, b, cdt)
