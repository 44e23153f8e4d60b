"""lstm_scan_enc5 with 2-way interleaved recurrence chains.

Hypothesis (from tools/probe_bwd.py): the sequential T-loop in both
passes is LATENCY-bound, not throughput-bound — stripped-down loop
bodies time the same or slower, because each iteration's (bt, 4H)
elementwise chain (VPU) and (bt, 4H) @ (4H, H) recurrence matmul (MXU)
form one strict dependency chain, so the two functional units strictly
alternate and each iteration pays issue+drain latency on both.

enc6 splits every tile into two INDEPENDENT half-tiles and runs both
recurrences in the same loop body. The halves share no data, so the
scheduler can overlap half A's matmul (MXU) with half B's elementwise
chain (VPU) — same total work, half the serial latency chain. The
tall pre/post-pass contractions (encoder, gate recompute, dw/db/dx,
encoder backward) are unchanged: they already run at tall-matmul
efficiency over the full tile.

Semantics identical to lstm_scan_enc5 (gate order i,f,g,o, reference
models.py:64-111).

MEASURED OUTCOME (2026-08-20, in-trainer LSTM bench): NEUTRAL — enc6
20.72M SPS vs enc5's 20.58M at default tiles, and identical (21.44 vs
21.49M) once the backward tile is 256. The latency win came from
halving the GRID iteration count (enc5 now auto-picks bwd bt=256 with
a per-call 32M vmem limit), not from intra-loop VPU/MXU overlap —
Mosaic evidently already schedules what it can there. Archived as the
record of the experiment; parity-tested in tests/test_pallas_archive.py.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pufferlib_tpu.ops.pallas.lstm_cat import _act
from pufferlib_tpu.ops.pallas import lstm_enc as _enc
from pufferlib_tpu.ops.pallas import lstm_enc5 as _enc5


def _bwd_kernel(f_ref, h0_ref, c0_ref, we_ref, be_ref, w_ref, b_ref,
        outs_ref, cseq_ref, g_outs_ref, g_ht_ref, g_ct_ref,
        dh0_ref, dc0_ref, dwe_ref, dbe_ref, dw_ref, db_ref,
        x_scr, ag_scr, *, T, cdt):
    we = we_ref[:].astype(cdt)
    be = be_ref[:].astype(jnp.float32)
    w = w_ref[:].astype(cdt)
    bias = b_ref[:].astype(jnp.float32)
    H = h0_ref.shape[-1]
    D = we_ref.shape[-1]
    bt = h0_ref.shape[0]
    hb = bt // 2
    b_idx = pl.program_id(0)
    whh_t = w[D:].T  # (4H, H), loop-invariant

    @pl.when(b_idx == 0)
    def _():
        dwe_ref[:] = jnp.zeros_like(dwe_ref)
        dbe_ref[:] = jnp.zeros_like(dbe_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    # tall pre-pass over the FULL tile (unchanged from enc5)
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
    ag_scr[:] = jnp.concatenate([i_a, f_a, g_a, o_a],
        axis=-1).astype(ag_scr.dtype)

    def _dgates(acts, c_prev, c_t, dh, dc):
        """Elementwise dgate chain for one half-tile (VPU). Returns
        (dgates, dc_prev) — dc_prev already folded through the forget
        gate, exactly like enc5's loop."""
        i, f = acts[:, :H], acts[:, H:2 * H]
        g, o = acts[:, 2 * H:3 * H], acts[:, 3 * H:]
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
        return dgates.astype(cdt), dc * f

    def body(k, carry):
        t = T - 1 - k
        dh_a, dc_a, dh_b, dc_b = carry
        c_prev = jnp.where(t == 0, c0_ref[:], cseq_ref[pl.ds(
            jnp.maximum(t - 1, 0), 1)][0].astype(jnp.float32))
        c_t = cseq_ref[t].astype(jnp.float32)
        go = g_outs_ref[t].astype(jnp.float32)
        acts = ag_scr[pl.ds(t * bt, bt)].astype(jnp.float32)

        # two independent half-tile chains: half B's elementwise (VPU)
        # is independent of half A's recurrence matmul (MXU), so the
        # scheduler can overlap them
        dg_a, dc_a = _dgates(acts[:hb], c_prev[:hb], c_t[:hb],
            dh_a + go[:hb], dc_a)
        dh_a_prev = jnp.dot(dg_a, whh_t,
            preferred_element_type=jnp.float32)
        dg_b, dc_b = _dgates(acts[hb:], c_prev[hb:], c_t[hb:],
            dh_b + go[hb:], dc_b)
        dh_b_prev = jnp.dot(dg_b, whh_t,
            preferred_element_type=jnp.float32)

        # overwrite this timestep's acts with its dgates (enc5 trick)
        ag_scr[pl.ds(t * bt, hb)] = dg_a.astype(ag_scr.dtype)
        ag_scr[pl.ds(t * bt + hb, hb)] = dg_b.astype(ag_scr.dtype)
        return (dh_a_prev, dc_a, dh_b_prev, dc_b)

    g_ht = g_ht_ref[:]
    g_ct = g_ct_ref[:]
    dh_a, dc_a, dh_b, dc_b = jax.lax.fori_loop(0, T, body,
        (g_ht[:hb], g_ct[:hb], g_ht[hb:], g_ct[hb:]))
    dh0_ref[:] = jnp.concatenate([dh_a, dh_b], axis=0)
    dc0_ref[:] = jnp.concatenate([dc_a, dc_b], axis=0)

    # tall post-passes over the full tile (unchanged from enc5)
    dg_all = ag_scr[:].astype(cdt)
    dw_ref[pl.ds(0, D)] += jnp.dot(x_all.astype(cdt).T, dg_all,
        preferred_element_type=jnp.float32)
    dw_ref[pl.ds(D, H)] += jnp.dot(hprev_all.T, dg_all,
        preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(dg_all.astype(jnp.float32), axis=0,
        keepdims=True)

    dx_all = jnp.dot(dg_all, w[:D].T,
        preferred_element_type=jnp.float32)
    dpre = jnp.where(x_scr[:].astype(jnp.float32) > 0,
        dx_all, 0.0).astype(cdt)
    dwe_ref[:] += jnp.dot(feats2.T, dpre,
        preferred_element_type=jnp.float32)
    dbe_ref[:] += jnp.sum(dpre.astype(jnp.float32), axis=0,
        keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def lstm_scan_enc6(feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b,
        cdt=jnp.bfloat16):
    return _enc._impl(feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b, cdt,
        with_cseq=False)[:3]


def _fwd(feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b, cdt):
    outs, hT, cT, cseq = _enc._impl(feats, h0, c0, w_enc, b_enc, w_ih,
        w_hh, b, cdt, with_cseq=True)
    return (outs, hT, cT), (feats, h0, c0, w_enc, b_enc, w_ih, w_hh,
        b, outs, cseq)


def _bwd(cdt, residuals, grads):
    return _enc5._hoisted_bwd(_bwd_kernel, cdt, residuals, grads)


lstm_scan_enc6.defvjp(_fwd, _bwd)
