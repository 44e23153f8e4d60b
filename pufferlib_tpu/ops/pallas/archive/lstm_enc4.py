"""lstm_scan_enc backward variant: weight-grad + dx matmuls hoisted.

The enc backward's reverse loop runs 3 matmuls per timestep: the gate
recompute, dxh = dgates @ w.T, and the dw accumulation. Only the FIRST
two sit on the sequential dh/dc dependency chain — and of dxh, only
the dh_prev half (dgates @ w_hh.T) is actually recurrent; the dx half
and the entire dw/db accumulation are pure functions of the per-step
dgates. This variant stores dgates to a VMEM scratch inside the loop
and hoists everything non-recurrent to tall post-loop matmuls:

  in-loop  : gate recompute (bt, D+H)@(D+H, 4H), VPU chain,
             dh_prev = dgates @ w_hh.T (bt, 4H)@(4H, H)   [half of dxh]
  post-loop: dw_ih = x_all.T    @ dg_all   (D, T*bt)@(T*bt, 4H)
             dw_hh = hprev_all.T @ dg_all  (H, T*bt)@(T*bt, 4H)
             dx_all = dg_all @ w_ih.T      (T*bt, 4H)@(4H, D)
             db     = sum(dg_all)
             encoder bwd (relu mask + dW_enc/db_enc, as enc)

The post-loop contractions have K = T*bt (thousands) instead of the
loop's K = bt accumulation — proper MXU shapes — and the loop body
drops from 3 matmuls to 1.5. Unlike enc2/enc3 (which hoisted the gate
RECOMPUTE and paid for it with a (T*bt, 4H) activation scratch that
halved the tile budget), the only added scratch here is the dgates
slab, and the budget counts scratch once (it is not double-buffered),
keeping bt at 128 at bench shapes.

Forward pass and semantics identical to lstm_scan_enc (lstm_enc.py).
Selectable via PUFFER_LSTM_KERNEL=enc4. Precision note: db is
accumulated from the stored compute-dtype dgates (bf16 in production)
where enc sums the unrounded f32 dgates per step — the same rounding
class dw already has in both variants; exact in the f32 test mode.

Reference behavior being matched: torch.nn.LSTM gate order i,f,g,o
(reference pufferlib models.py:64-111).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pufferlib_tpu.ops.pallas.lstm_cat import _act
from pufferlib_tpu.ops.pallas import lstm_enc as _enc
from pufferlib_tpu.ops.pallas.lstm_enc5 import _fwd, _hoisted_bwd


def _bwd_kernel(f_ref, h0_ref, c0_ref, we_ref, be_ref, w_ref, b_ref,
        outs_ref, cseq_ref, g_outs_ref, g_ht_ref, g_ct_ref,
        dh0_ref, dc0_ref, dwe_ref, dbe_ref, dw_ref, db_ref,
        x_scr, dg_scr, *, T, cdt):
    we = we_ref[:].astype(cdt)
    be = be_ref[:].astype(jnp.float32)
    w = w_ref[:].astype(cdt)
    bias = b_ref[:].astype(jnp.float32)
    H = h0_ref.shape[-1]
    D = we_ref.shape[-1]
    bt = h0_ref.shape[0]
    b_idx = pl.program_id(0)
    whh_t = w[D:].T  # (4H, H), loop-invariant

    @pl.when(b_idx == 0)
    def _():
        dwe_ref[:] = jnp.zeros_like(dwe_ref)
        dbe_ref[:] = jnp.zeros_like(dbe_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    feats2, x_all = _enc._encode_block(f_ref, we, be, cdt, T)
    x_scr[:] = x_all.astype(x_scr.dtype)

    def body(k, carry):
        t = T - 1 - k
        dh, dc = carry
        h_prev = jnp.where(t == 0, h0_ref[:], outs_ref[pl.ds(
            jnp.maximum(t - 1, 0), 1)][0].astype(jnp.float32))
        c_prev = jnp.where(t == 0, c0_ref[:], cseq_ref[pl.ds(
            jnp.maximum(t - 1, 0), 1)][0].astype(jnp.float32))
        c_t = cseq_ref[t].astype(jnp.float32)

        x = x_scr[pl.ds(t * bt, bt)]
        xh = jnp.concatenate([x, h_prev.astype(cdt)], axis=-1)
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
        dgates_c = jnp.concatenate([d_i, d_f, d_g, d_o],
            axis=-1).astype(cdt)
        dg_scr[pl.ds(t * bt, bt)] = dgates_c.astype(dg_scr.dtype)

        dh_prev = jnp.dot(dgates_c, whh_t,
            preferred_element_type=jnp.float32)
        dc_prev = dc * f
        return (dh_prev, dc_prev)

    dh, dc = jax.lax.fori_loop(0, T, body, (g_ht_ref[:], g_ct_ref[:]))
    dh0_ref[:] = dh
    dc0_ref[:] = dc

    # everything non-recurrent, as tall K = T*bt contractions
    dg_all = dg_scr[:].astype(cdt)
    hprev_all = jnp.concatenate([
        h0_ref[:].astype(cdt),
        outs_ref[pl.ds(0, T - 1)].reshape((T - 1) * bt, H).astype(cdt),
    ], axis=0)
    dw_ref[pl.ds(0, D)] += jnp.dot(x_all.T, dg_all,
        preferred_element_type=jnp.float32)
    dw_ref[pl.ds(D, H)] += jnp.dot(hprev_all.T, dg_all,
        preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(dg_all.astype(jnp.float32), axis=0,
        keepdims=True)

    # encoder backward (as enc): dx as one tall matmul, relu mask,
    # then the dW_enc/db_enc contractions
    dx_all = jnp.dot(dg_all, w[:D].T,
        preferred_element_type=jnp.float32)
    dpre = jnp.where(x_scr[:].astype(jnp.float32) > 0,
        dx_all, 0.0).astype(cdt)
    dwe_ref[:] += jnp.dot(feats2.T, dpre,
        preferred_element_type=jnp.float32)
    dbe_ref[:] += jnp.sum(dpre.astype(jnp.float32), axis=0,
        keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def lstm_scan_enc4(feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b,
        cdt=jnp.bfloat16):
    return _enc._impl(feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b, cdt,
        with_cseq=False)[:3]


def _bwd(cdt, residuals, grads):
    return _hoisted_bwd(_bwd_kernel, cdt, residuals, grads)


lstm_scan_enc4.defvjp(_fwd, _bwd)
