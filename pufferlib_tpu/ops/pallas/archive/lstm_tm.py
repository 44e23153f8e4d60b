"""Time-major-grid LSTM scan variant (experimental alternative to
ops/pallas/lstm.py).

The batch-tiled kernel issues T small matmuls per tile (1024 total at
T=16, B=8192, bt=128) — MXU-latency bound. Here the grid is
(T, batch_tiles) with T OUTER: every timestep processes large batch
tiles (bt ~ 1024 rows), so each grid step is one big MXU matmul, and
the h/c carries persist across timesteps in VMEM scratch indexed by
tile. TPU grids iterate sequentially (last dim fastest), which gives
exactly the all-tiles-at-t-before-t+1 order the recurrence needs.

Same API/semantics as lstm.py (torch gate order, bf16 residuals).

CAVEAT: the h/c carry scratch holds the FULL (B, H) state regardless of
the batch tile (2 x B x H x 4 bytes of VMEM), so this kernel stops
compiling near B*H ~ 2M (e.g. B=8192, H=256); the batch-tiled lstm.py
kernel bounds its whole working set by the tile and scales instead.
Benchmarked slower than lstm.py at the bench shapes (docs/PERF.md) —
kept for reference behind PUFFER_LSTM_KERNEL=tm.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gate_math(gates, c, H):
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, c, i, f, g, o


def _fwd_kernel_tm(xp_ref, h0_ref, c0_ref, whh_ref,
        outs_ref, ht_ref, ct_ref, cseq_ref, h_scr, c_scr, *, T, cdt):
    t = pl.program_id(0)
    b = pl.program_id(1)
    H = h0_ref.shape[-1]
    w_hh = whh_ref[:].astype(cdt)

    h = jnp.where(t == 0, h0_ref[:], h_scr[b])
    c = jnp.where(t == 0, c0_ref[:], c_scr[b])
    gates = xp_ref[0].astype(jnp.float32) + jnp.dot(
        h.astype(cdt), w_hh, preferred_element_type=jnp.float32)
    h, c, *_ = _gate_math(gates, c, H)
    outs_ref[0] = h.astype(outs_ref.dtype)
    cseq_ref[0] = c.astype(cseq_ref.dtype)
    h_scr[b] = h
    c_scr[b] = c

    @pl.when(t == T - 1)
    def _():
        ht_ref[:] = h
        ct_ref[:] = c


def _bwd_kernel_tm(xp_ref, h0_ref, c0_ref, whh_ref, outs_prev_ref,
        cseq_prev_ref, cseq_cur_ref, g_outs_ref, g_ht_ref, g_ct_ref,
        dxp_ref, dh0_ref, dc0_ref, dwhh_ref,
        dh_scr, dc_scr, dw_scr, *, T, cdt):
    # grid (T, nb) with reversed time index map: step k processes
    # t = T-1-k for every batch tile
    k = pl.program_id(0)
    b = pl.program_id(1)
    t = T - 1 - k
    H = h0_ref.shape[-1]
    w_hh = whh_ref[:].astype(cdt)

    @pl.when((k == 0) & (b == 0))
    def _():
        dw_scr[:] = jnp.zeros_like(dw_scr)

    # h_prev/c_prev: residual blocks indexed at t-1 (clamped to 0)
    # by the spec, with t==0 falling back to h0/c0
    h_prev = jnp.where(t == 0, h0_ref[:],
        outs_prev_ref[0].astype(jnp.float32))
    c_prev = jnp.where(t == 0, c0_ref[:],
        cseq_prev_ref[0].astype(jnp.float32))
    c_t = cseq_cur_ref[0].astype(jnp.float32)

    gates = xp_ref[0].astype(jnp.float32) + jnp.dot(
        h_prev.astype(cdt), w_hh, preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])

    dh = jnp.where(k == 0, g_ht_ref[:], dh_scr[b])
    dc = jnp.where(k == 0, g_ct_ref[:], dc_scr[b])
    dh = dh + g_outs_ref[0].astype(jnp.float32)
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

    dxp_ref[0] = dgates.astype(dxp_ref.dtype)
    dh_scr[b] = jnp.dot(dgates.astype(cdt), w_hh.T,
        preferred_element_type=jnp.float32)
    dc_scr[b] = dc * f
    dw_scr[:] += jnp.dot(h_prev.astype(cdt).T, dgates.astype(cdt),
        preferred_element_type=jnp.float32)

    @pl.when(k == T - 1)
    def _():
        dh0_ref[:] = dh_scr[b]
        dc0_ref[:] = dc_scr[b]

    @pl.when((k == T - 1) & (b == pl.num_programs(1) - 1))
    def _():
        dwhh_ref[:] = dw_scr[:]


def _tile_tm(B, prefer=1024):
    for bt in (prefer, 512, 256, 128, 64, 32, 16, 8):
        if bt <= prefer and B % bt == 0:
            return bt
    raise ValueError(f'batch {B} not tileable (must divide by 8)')


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def lstm_scan_tm(x_proj, h0, c0, w_hh, cdt=jnp.bfloat16):
    outs, hT, cT, _ = _fwd_impl_tm(x_proj, h0, c0, w_hh, cdt)
    return outs, hT, cT


def _fwd_impl_tm(x_proj, h0, c0, w_hh, cdt):
    T, B, H4 = x_proj.shape
    H = H4 // 4
    bt = _tile_tm(B)
    nb = B // bt
    rdt = jnp.bfloat16 if cdt == jnp.bfloat16 else jnp.float32
    vm = pltpu.VMEM
    outs, hT, cT, cseq = pl.pallas_call(
        functools.partial(_fwd_kernel_tm, T=T, cdt=cdt),
        grid=(T, nb),
        in_specs=[
            pl.BlockSpec((1, bt, H4), lambda t, b: (t, b, 0),
                memory_space=vm),
            pl.BlockSpec((bt, H), lambda t, b: (b, 0), memory_space=vm),
            pl.BlockSpec((bt, H), lambda t, b: (b, 0), memory_space=vm),
            pl.BlockSpec((H, H4), lambda t, b: (0, 0), memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((1, bt, H), lambda t, b: (t, b, 0),
                memory_space=vm),
            pl.BlockSpec((bt, H), lambda t, b: (b, 0), memory_space=vm),
            pl.BlockSpec((bt, H), lambda t, b: (b, 0), memory_space=vm),
            pl.BlockSpec((1, bt, H), lambda t, b: (t, b, 0),
                memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), rdt),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), rdt),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb, bt, H), jnp.float32),
            pltpu.VMEM((nb, bt, H), jnp.float32),
        ],
    )(x_proj, h0, c0, w_hh)
    return outs, hT, cT, cseq


def _lstm_tm_fwd(x_proj, h0, c0, w_hh, cdt):
    outs, hT, cT, cseq = _fwd_impl_tm(x_proj, h0, c0, w_hh, cdt)
    return (outs, hT, cT), (x_proj, h0, c0, w_hh, outs, cseq)


def _lstm_tm_bwd(cdt, residuals, grads):
    x_proj, h0, c0, w_hh, outs, cseq = residuals
    g_outs, g_hT, g_cT = grads
    T, B, H4 = x_proj.shape
    H = H4 // 4
    # backward carries ~2x the live blocks (incoming grads + dxp) plus
    # the dh/dc scratch; tile at half the forward size to fit VMEM
    bt = _tile_tm(B, prefer=512)
    nb = B // bt
    vm = pltpu.VMEM

    def prev_t(t, b):
        # residual block for t-1 (clamped; t==0 uses h0/c0 instead)
        return (jnp.maximum(T - 1 - t - 1, 0), b, 0)

    def cur_t(t, b):
        return (T - 1 - t, b, 0)

    dxp, dh0, dc0, dwhh = pl.pallas_call(
        functools.partial(_bwd_kernel_tm, T=T, cdt=cdt),
        grid=(T, nb),
        in_specs=[
            pl.BlockSpec((1, bt, H4), cur_t, memory_space=vm),
            pl.BlockSpec((bt, H), lambda t, b: (b, 0), memory_space=vm),
            pl.BlockSpec((bt, H), lambda t, b: (b, 0), memory_space=vm),
            pl.BlockSpec((H, H4), lambda t, b: (0, 0), memory_space=vm),
            pl.BlockSpec((1, bt, H), prev_t, memory_space=vm),
            pl.BlockSpec((1, bt, H), prev_t, memory_space=vm),
            pl.BlockSpec((1, bt, H), cur_t, memory_space=vm),
            pl.BlockSpec((1, bt, H), cur_t, memory_space=vm),
            pl.BlockSpec((bt, H), lambda t, b: (b, 0), memory_space=vm),
            pl.BlockSpec((bt, H), lambda t, b: (b, 0), memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((1, bt, H4), cur_t, memory_space=vm),
            pl.BlockSpec((bt, H), lambda t, b: (b, 0), memory_space=vm),
            pl.BlockSpec((bt, H), lambda t, b: (b, 0), memory_space=vm),
            pl.BlockSpec((H, H4), lambda t, b: (0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H4), x_proj.dtype),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb, bt, H), jnp.float32),
            pltpu.VMEM((nb, bt, H), jnp.float32),
            pltpu.VMEM((H, H4), jnp.float32),
        ],
    )(x_proj, h0, c0, w_hh, outs, cseq, cseq, g_outs, g_hT, g_cT)
    return dxp, dh0, dc0, dwhh.astype(w_hh.dtype)


lstm_scan_tm.defvjp(_lstm_tm_fwd, _lstm_tm_bwd)
