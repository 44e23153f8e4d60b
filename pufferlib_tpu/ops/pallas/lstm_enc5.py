"""lstm_scan_enc backward variant: batched recompute + hoisted grads.

Combines the two independent hoists that enc3 and enc4 each tried
alone, without either's cost:

- enc3's idea: in the BACKWARD the whole h-sequence is a residual, so
  every timestep's gate recompute and activations can run as ONE tall
  (T*bt, D+H) @ (D+H, 4H) pre-pass matmul + one batched VPU sweep.
  enc3 lost in-trainer because its extra activation slab halved the
  tile budget (bt 128 -> 64, docs/PERF.md).
- enc4's idea: dw/db/dx and the encoder backward are pure functions
  of the per-step dgates — tall post-loop matmuls instead of K=bt
  accumulations in the loop.

The trick that makes both fit at bt=128: the activation slab and the
dgates slab SHARE one (T*bt, 4H) scratch buffer. The reverse loop
reads acts[t] and overwrites the same rows with dgates[t] — safe
because the loop walks t = T-1..0 and never reads a timestep twice.
The reverse loop body is down to one (bt, 4H) @ (4H, H) matmul (the
dh chain) and the elementwise dgates chain; every other FLOP runs at
tall-matmul MXU efficiency.

Forward pass and semantics identical to lstm_scan_enc (lstm_enc.py);
gate order i,f,g,o matches torch.nn.LSTM (reference models.py:64-111).
Selectable via PUFFER_LSTM_KERNEL=enc5. Precision: in bf16 production
mode the stored activations/dgates round to bf16 (same class as the
bf16 gate matmuls everywhere else); exact in the f32 test mode.
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
        x_scr, ag_scr, *, T, cdt):
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

    # pre-pass: encoder, then EVERY timestep's gates + activations in
    # one tall matmul + one batched VPU sweep
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

    def body(k, carry):
        t = T - 1 - k
        dh, dc = carry
        c_prev = jnp.where(t == 0, c0_ref[:], cseq_ref[pl.ds(
            jnp.maximum(t - 1, 0), 1)][0].astype(jnp.float32))
        c_t = cseq_ref[t].astype(jnp.float32)

        acts = ag_scr[pl.ds(t * bt, bt)].astype(jnp.float32)
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
        dgates_c = jnp.concatenate([d_i, d_f, d_g, d_o],
            axis=-1).astype(cdt)
        # overwrite this timestep's acts with its dgates: t never read
        # again (reverse walk), so the slab doubles as the dgates store
        ag_scr[pl.ds(t * bt, bt)] = dgates_c.astype(ag_scr.dtype)

        dh_prev = jnp.dot(dgates_c, whh_t,
            preferred_element_type=jnp.float32)
        dc_prev = dc * f
        return (dh_prev, dc_prev)

    dh, dc = jax.lax.fori_loop(0, T, body, (g_ht_ref[:], g_ct_ref[:]))
    dh0_ref[:] = dh
    dc0_ref[:] = dc

    # everything non-recurrent, as tall K = T*bt contractions
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
def lstm_scan_enc5(feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b,
        cdt=jnp.bfloat16):
    return _enc._impl(feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b, cdt,
        with_cseq=False)[:3]


def _fwd(feats, h0, c0, w_enc, b_enc, w_ih, w_hh, b, cdt):
    outs, hT, cT, cseq = _enc._impl(feats, h0, c0, w_enc, b_enc, w_ih,
        w_hh, b, cdt, with_cseq=True)
    return (outs, hT, cT), (feats, h0, c0, w_enc, b_enc, w_ih, w_hh,
        b, outs, cseq)


def _hoisted_bwd(kernel_body, cdt, residuals, grads):
    """Shared pallas_call driver for the hoisted-grad backward family:
    the kernel takes the same refs and two scratch slabs — (T*bt, D)
    encoded-x plus one (T*bt, 4H) slab (acts-then-dgates here; pure
    dgates in the archived enc4 variant) — so the spec/shape block
    lives once."""
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
        # scratch (x slab + dgates slab) is single-buffered — halve it
        # so _tile_budget's 2x double-buffer estimate stays honest
        scratch = T * bt * (D + 4 * H) * rb // 2
        return seqs + weights + states + scratch

    # The backward wants the LARGEST tile that compiles, not the
    # largest that fits the conservative 12M default budget: its
    # sequential dh-chain loop is latency-bound (probe_bwd: stripped
    # loop bodies time the same), so halving the grid iteration count
    # matters more than per-iteration work: bt=256 cut the in-trainer
    # LSTM epoch ~4.4% (20.58 -> 21.49M SPS, 2026-08-20). Mosaic's
    # scoped-vmem default (16M) rejects the 256-row body (~19.1M
    # stack), so the backward raises its OWN call's limit to 32M; a
    # globally raised limit measurably slowed the forward, hence
    # per-call. bt=512 @ 64M is a measured DEAD END: kernel-lab pair
    # 1.063 vs 1.075 ms (noise), but in-trainer 20.99M vs 21.46M SPS
    # (-2.2%, 300-epoch A/B 2026-08-20) — the doubled vmem limit costs
    # the surrounding program more than the halved grid saves.
    bt12 = _tile_budget(B, 'PUFFER_LSTM_TILE_BWD', bwd_bytes)
    import os
    bt = bt12
    vmem_limit = None
    if not os.environ.get('PUFFER_LSTM_TILE_BWD') and B % 256 == 0:
        if bt12 < 256 and 2 * bwd_bytes(256) <= 24 * 1024 * 1024:
            bt = 256
            # Mosaic's stack allocation for the bt=256 body measured
            # 19.1M scoped; 32M covers it with pipelining headroom
            # (v5e VMEM is 128M)
            vmem_limit = 32 * 1024 * 1024
    if os.environ.get('PUFFER_LSTM_VMEM_LIMIT'):
        vmem_limit = int(os.environ['PUFFER_LSTM_VMEM_LIMIT'])
    grid = (B // bt,)
    vm = pltpu.VMEM
    rdt = jnp.bfloat16 if cdt == jnp.bfloat16 else jnp.float32
    be2 = b_enc.reshape(1, D)
    b2 = b.reshape(1, 4 * H)
    seq_h = pl.BlockSpec((T, bt, H), lambda i: (0, i, 0),
        memory_space=vm)
    state_spec = pl.BlockSpec((bt, H), lambda i: (i, 0), memory_space=vm)
    kernel = functools.partial(kernel_body, T=T, cdt=cdt)
    cp = pltpu.CompilerParams(vmem_limit_bytes=vmem_limit) \
        if vmem_limit else _compiler_params()
    dh0, dc0, dwe, dbe, dw, db = pl.pallas_call(
        kernel, grid=grid, compiler_params=cp,
        scratch_shapes=[pltpu.VMEM((T * bt, D), rdt),
            pltpu.VMEM((T * bt, 4 * H), rdt)],
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


def _bwd(cdt, residuals, grads):
    # enc5's only difference from the archived enc4 is the kernel body
    # — acts/dgates share one scratch slab and the single-buffered
    # budget halving covers the pre-pass xh_all temporary too
    return _hoisted_bwd(_bwd_kernel, cdt, residuals, grads)


lstm_scan_enc5.defvjp(_fwd, _bwd)
