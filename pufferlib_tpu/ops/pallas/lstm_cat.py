"""Experimental LSTM kernel: combined-operand gate matmul.

Instead of two per-timestep matmuls (x_t @ W_ih and h @ W_hh) the cell
computes one: [x_t | h] @ [W_ih ; W_hh]. Halves the number of MXU
dispatches per timestep and doubles the contraction K (128 -> 256),
which matters because the per-tile matmuls are tiny (M = batch tile)
and weight-load/pipeline overhead dominates at K=128. The backward
collapses the 6 matmuls per timestep to 3: one gate recompute, one
dgates @ W.T producing [dx | dh_prev] together, one [x|h].T @ dgates
producing the combined weight gradient.

Same semantics/signature as lstm_scan_fused (ops/pallas/lstm.py).
"""
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pufferlib_tpu.ops.pallas.lstm import _tile_budget


def _compiler_params():
    limit = os.environ.get('PUFFER_LSTM_VMEM_LIMIT')
    if limit:
        return pltpu.CompilerParams(vmem_limit_bytes=int(limit))
    return None


def _act(gates, H):
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    return i, f, g, o


def _fwd_kernel(x_ref, h0_ref, c0_ref, w_ref, b_ref, outs_ref, ht_ref,
        ct_ref, cseq_ref=None, *, T, cdt, save_cseq):
    w = w_ref[:].astype(cdt)
    bias = b_ref[:].astype(jnp.float32)
    H = h0_ref.shape[-1]

    def body(t, carry):
        h, c = carry
        xh = jnp.concatenate(
            [x_ref[t].astype(cdt), h.astype(cdt)], axis=-1)
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


def _bwd_kernel(x_ref, h0_ref, c0_ref, w_ref, b_ref, outs_ref,
        cseq_ref, g_outs_ref, g_ht_ref, g_ct_ref,
        dx_ref, dh0_ref, dc0_ref, dw_ref, db_ref, *, T, cdt):
    w = w_ref[:].astype(cdt)
    bias = b_ref[:].astype(jnp.float32)
    H = h0_ref.shape[-1]
    D = x_ref.shape[-1]
    b_idx = pl.program_id(0)

    @pl.when(b_idx == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    def body(k, carry):
        t = T - 1 - k
        dh, dc, dw, db = carry
        h_prev = jnp.where(t == 0, h0_ref[:], outs_ref[pl.ds(
            jnp.maximum(t - 1, 0), 1)][0].astype(jnp.float32))
        c_prev = jnp.where(t == 0, c0_ref[:], cseq_ref[pl.ds(
            jnp.maximum(t - 1, 0), 1)][0].astype(jnp.float32))
        c_t = cseq_ref[t].astype(jnp.float32)

        xh = jnp.concatenate(
            [x_ref[t].astype(cdt), h_prev.astype(cdt)], axis=-1)
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
        dx_ref[t] = dxh[:, :D].astype(dx_ref.dtype)
        dh_prev = dxh[:, D:]
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def lstm_scan_cat(x, h0, c0, w_ih, w_hh, b, cdt=jnp.bfloat16):
    return _impl(x, h0, c0, w_ih, w_hh, b, cdt, with_cseq=False)[:3]


def _impl(x, h0, c0, w_ih, w_hh, b, cdt, with_cseq=True):
    T, B, D = x.shape
    H = h0.shape[-1]
    w = jnp.concatenate([w_ih, w_hh], axis=0)  # (D+H, 4H)
    xb = x.dtype.itemsize
    rb = 2 if cdt == jnp.bfloat16 else 4

    def fwd_bytes(bt):
        seqs = T * bt * (D * xb + (2 if with_cseq else 1) * H * rb)
        weights = (D + H + 1) * 4 * H * 4
        states = 4 * bt * H * 4
        return seqs + weights + states

    bt = _tile_budget(B, 'PUFFER_LSTM_TILE_FWD', fwd_bytes)
    grid = (B // bt,)
    vm = pltpu.VMEM
    rdt = jnp.bfloat16 if cdt == jnp.bfloat16 else jnp.float32
    b2 = b.reshape(1, 4 * H)
    seq_spec = pl.BlockSpec((T, bt, H), lambda i: (0, i, 0),
        memory_space=vm)
    state_spec = pl.BlockSpec((bt, H), lambda i: (i, 0), memory_space=vm)
    in_specs = [
        pl.BlockSpec((T, bt, D), lambda i: (0, i, 0), memory_space=vm),
        state_spec,
        state_spec,
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
    )(x, h0, c0, w, b2)
    if with_cseq:
        return res
    return tuple(res) + (None,)


def _fwd(x, h0, c0, w_ih, w_hh, b, cdt):
    outs, hT, cT, cseq = _impl(x, h0, c0, w_ih, w_hh, b, cdt,
        with_cseq=True)
    return (outs, hT, cT), (x, h0, c0, w_ih, w_hh, b, outs, cseq)


def _bwd(cdt, residuals, grads):
    x, h0, c0, w_ih, w_hh, b, outs, cseq = residuals
    g_outs, g_hT, g_cT = grads
    T, B, D = x.shape
    H = h0.shape[-1]
    w = jnp.concatenate([w_ih, w_hh], axis=0)
    xb = x.dtype.itemsize
    rb = outs.dtype.itemsize

    def bwd_bytes(bt):
        seqs = T * bt * (2 * D * xb + 3 * H * rb)
        weights = 2 * (D + H + 1) * 4 * H * 4
        states = 8 * bt * H * 4
        return seqs + weights + states

    bt = _tile_budget(B, 'PUFFER_LSTM_TILE_BWD', bwd_bytes)
    # Same finding as the enc5 backward (lstm_enc5.py): the sequential
    # dh-chain loop is latency-bound, so the LARGEST tile that compiles
    # beats the largest that fits the conservative 12M budget — bt=256
    # with a per-call 32M vmem limit takes the measured pair 1.238 ->
    # 1.125 ms at bench shapes and the in-trainer cat-path LSTM bench
    # 17.7 -> 18.9M SPS (kernel_lab + bench 2026-08-20). The limit must
    # be per-CALL: globally raised it measurably slows the forward.
    cp = _compiler_params()
    if not os.environ.get('PUFFER_LSTM_TILE_BWD') and B % 256 == 0 \
            and bt < 256 and 2 * bwd_bytes(256) <= 24 * 1024 * 1024:
        bt = 256
        cp = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)
    grid = (B // bt,)
    vm = pltpu.VMEM
    b2 = b.reshape(1, 4 * H)
    seq_h = pl.BlockSpec((T, bt, H), lambda i: (0, i, 0),
        memory_space=vm)
    state_spec = pl.BlockSpec((bt, H), lambda i: (i, 0), memory_space=vm)
    kernel = functools.partial(_bwd_kernel, T=T, cdt=cdt)
    dx, dh0, dc0, dw, db = pl.pallas_call(
        kernel, grid=grid, compiler_params=cp,
        in_specs=[
            pl.BlockSpec((T, bt, D), lambda i: (0, i, 0),
                memory_space=vm),
            state_spec, state_spec,
            pl.BlockSpec((D + H, 4 * H), lambda i: (0, 0),
                memory_space=vm),
            pl.BlockSpec((1, 4 * H), lambda i: (0, 0), memory_space=vm),
            seq_h, seq_h, seq_h,
            state_spec, state_spec,
        ],
        out_specs=[
            pl.BlockSpec((T, bt, D), lambda i: (0, i, 0),
                memory_space=vm),
            state_spec, state_spec,
            pl.BlockSpec((D + H, 4 * H), lambda i: (0, 0),
                memory_space=vm),
            pl.BlockSpec((1, 4 * H), lambda i: (0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, D), x.dtype),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((D + H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * H), jnp.float32),
        ],
    )(x, h0, c0, w, b2, outs, cseq, g_outs, g_hT, g_cT)
    return (dx, dh0, dc0, dw[:D].astype(w_ih.dtype),
        dw[D:].astype(w_hh.dtype), db.reshape(4 * H).astype(b.dtype))


lstm_scan_cat.defvjp(_fwd, _bwd)
