"""Fused LSTM time-scan as a Pallas TPU kernel with custom VJP.

The BPTT hot loop (reference models.py:64-111 semantics) is a
sequential scan of small matmuls + gate math. Under jax autodiff the
scan saves every intermediate and the backward re-materializes them
from HBM; this kernel keeps the whole (batch-tile x time) working set
in VMEM, runs the h @ W_hh matmuls on the MXU in the compute dtype,
and the backward RECOMPUTES the gate activations from the saved h/c
sequences instead of storing them (FLOPs are cheaper than HBM).

forward:  lstm_scan(x_proj, h0, c0, w_hh) -> (outs, hT, cT)
  x_proj: (T, B, 4H) input projection (x @ W_ih + b, done outside —
          it is one large batched MXU matmul already)
  h0, c0: (B, H) initial state;  w_hh: (H, 4H)
  outs:   (T, B, H) hidden states (h_1..h_T)

Gate order matches torch.nn.LSTM: i, f, g, o.

Grid: batch tiles; TPU grid steps run sequentially per core, so the
backward accumulates dW_hh into one output block across tiles.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gates(xp_t, h, w_hh, cdt):
    gates = xp_t + jnp.dot(h.astype(cdt), w_hh,
        preferred_element_type=jnp.float32)
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    return i, f, g, o


def _fwd_kernel(xp_ref, h0_ref, c0_ref, whh_ref, outs_ref, ht_ref,
        ct_ref, cseq_ref, *, T, cdt):
    """Forward with saved cell-state sequence (for the VJP backward)."""
    w_hh = whh_ref[:].astype(cdt)

    def body(t, carry):
        h, c = carry
        i, f, g, o = _gates(xp_ref[t].astype(jnp.float32), h, w_hh, cdt)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        # residual streams persist in the output dtype (bf16 in mixed
        # precision — halves the fwd writes and bwd reads); the carried
        # h/c stay f32 inside the loop
        outs_ref[t] = h.astype(outs_ref.dtype)
        cseq_ref[t] = c.astype(cseq_ref.dtype)
        return (h, c)

    h, c = jax.lax.fori_loop(0, T, body, (h0_ref[:], c0_ref[:]))
    ht_ref[:] = h
    ct_ref[:] = c


def _fwd_kernel_noresid(xp_ref, h0_ref, c0_ref, whh_ref, outs_ref,
        ht_ref, ct_ref, *, T, cdt):
    """Primal-only forward: skips the (T, B, H) cell-sequence write
    (inference paths pay no residual HBM traffic)."""
    w_hh = whh_ref[:].astype(cdt)

    def body(t, carry):
        h, c = carry
        i, f, g, o = _gates(xp_ref[t].astype(jnp.float32), h, w_hh, cdt)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        outs_ref[t] = h.astype(outs_ref.dtype)
        return (h, c)

    h, c = jax.lax.fori_loop(0, T, body, (h0_ref[:], c0_ref[:]))
    ht_ref[:] = h
    ct_ref[:] = c


def _bwd_kernel(xp_ref, h0_ref, c0_ref, whh_ref, outs_ref, cseq_ref,
        g_outs_ref, g_ht_ref, g_ct_ref,
        dxp_ref, dh0_ref, dc0_ref, dwhh_ref, *, T, cdt):
    w_hh = whh_ref[:].astype(cdt)
    b_idx = pl.program_id(0)

    @pl.when(b_idx == 0)
    def _():
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)

    def body(k, carry):
        t = T - 1 - k
        dh, dc, dw = carry
        h_prev = jnp.where(t == 0, h0_ref[:], outs_ref[pl.ds(
            jnp.maximum(t - 1, 0), 1)][0].astype(jnp.float32))
        c_prev = jnp.where(t == 0, c0_ref[:], cseq_ref[pl.ds(
            jnp.maximum(t - 1, 0), 1)][0].astype(jnp.float32))
        c_t = cseq_ref[t].astype(jnp.float32)

        i, f, g, o = _gates(
            xp_ref[t].astype(jnp.float32), h_prev, w_hh, cdt)

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

        dxp_ref[t] = dgates.astype(dxp_ref.dtype)
        dh_prev = jnp.dot(dgates.astype(cdt), w_hh.T,
            preferred_element_type=jnp.float32)
        dw = dw + jnp.dot(h_prev.astype(cdt).T, dgates.astype(cdt),
            preferred_element_type=jnp.float32)
        dc_prev = dc * f
        return (dh_prev, dc_prev, dw)

    dh0 = g_ht_ref[:]
    dc0 = g_ct_ref[:]
    dw0 = jnp.zeros_like(dwhh_ref)
    dh, dc, dw = jax.lax.fori_loop(0, T, body, (dh0, dc0, dw0))
    dh0_ref[:] = dh
    dc0_ref[:] = dc
    dwhh_ref[:] += dw


def _tile(B, prefer=128):
    # the batch tile bounds VMEM residency: (T, bt, 4H) x_proj blocks
    # dominate. 128 fits the forward; the backward carries ~2x the
    # blocks (incoming grads + dx_proj) so it tiles at 64.
    for bt in (prefer, 128, 64, 32, 16, 8):
        if bt <= prefer and B % bt == 0:
            return bt
    return None


def _tile_env(B, var, prefer):
    """Batch tile with an experimental env-var override
    (PUFFER_LSTM_TILE_FWD / _BWD) for perf exploration; larger tiles
    reduce the sequential small-matmul count but must stay inside the
    16 MB scoped VMEM."""
    import os
    override = os.environ.get(var)
    if override:
        prefer = int(override)
    return _tile(B, prefer)


#: usable scoped-VMEM budget per grid step (bytes): 16 MB limit minus
#: headroom for compiler scratch; block estimates are doubled for
#: pipelining before the comparison
_VMEM_BUDGET = 12 * 1024 * 1024


def _tile_budget(B, var, block_bytes_fn):
    """Largest batch tile whose double-buffered block estimate fits the
    VMEM budget (measured on v5e: fused fwd auto-picks 256 at bench
    shapes, +0.4M SPS over 128; 512 fails compile). Env override wins."""
    import os
    override = os.environ.get(var)
    if override:
        bt = _tile(B, int(override))
    else:
        bt = next((t for t in (512, 256, 128, 64, 32, 16, 8)
            if B % t == 0 and 2 * block_bytes_fn(t) <= _VMEM_BUDGET),
            None) or _tile(B, 8)
    # fail HERE with the real cause, not with `B // None` in a caller
    assert bt is not None, (
        f'batch {B} not tileable (must be divisible by 8); '
        'the Pallas LSTM kernels need B % 8 == 0')
    return bt


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def lstm_scan(x_proj, h0, c0, w_hh, cdt=jnp.bfloat16):
    return _lstm_fwd_impl(x_proj, h0, c0, w_hh, cdt, with_cseq=False)[:3]


def _lstm_fwd_impl(x_proj, h0, c0, w_hh, cdt, with_cseq=True):
    T, B, H4 = x_proj.shape
    H = H4 // 4
    bt = _tile_env(B, 'PUFFER_LSTM_TILE_FWD', 128)
    assert bt is not None, f'batch {B} not tileable'
    grid = (B // bt,)
    vm = pltpu.VMEM
    # residual h/c sequences stream in bf16 under mixed precision:
    # halves the fwd HBM writes and the bwd reads (in-kernel carries
    # and the returned hT/cT stay f32)
    rdt = jnp.bfloat16 if cdt == jnp.bfloat16 else jnp.float32
    seq_spec = pl.BlockSpec((T, bt, H), lambda b: (0, b, 0),
        memory_space=vm)
    state_spec = pl.BlockSpec((bt, H), lambda b: (b, 0), memory_space=vm)
    out_specs = [seq_spec, state_spec, state_spec]
    out_shape = [
        jax.ShapeDtypeStruct((T, B, H), rdt),
        jax.ShapeDtypeStruct((B, H), jnp.float32),
        jax.ShapeDtypeStruct((B, H), jnp.float32),
    ]
    if with_cseq:
        kernel = functools.partial(_fwd_kernel, T=T, cdt=cdt)
        out_specs = out_specs + [seq_spec]
        out_shape = out_shape + [
            jax.ShapeDtypeStruct((T, B, H), rdt)]
    else:
        kernel = functools.partial(_fwd_kernel_noresid, T=T, cdt=cdt)
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, bt, H4), lambda b: (0, b, 0),
                memory_space=vm),
            state_spec,
            state_spec,
            pl.BlockSpec((H, H4), lambda b: (0, 0), memory_space=vm),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
    )(x_proj, h0, c0, w_hh)
    if with_cseq:
        return res
    return tuple(res) + (None,)


def _lstm_scan_fwd(x_proj, h0, c0, w_hh, cdt):
    outs, hT, cT, cseq = _lstm_fwd_impl(x_proj, h0, c0, w_hh, cdt,
        with_cseq=True)
    return (outs, hT, cT), (x_proj, h0, c0, w_hh, outs, cseq)


def _lstm_scan_bwd(cdt, residuals, grads):
    x_proj, h0, c0, w_hh, outs, cseq = residuals
    g_outs, g_hT, g_cT = grads
    T, B, H4 = x_proj.shape
    H = H4 // 4
    # dx_proj streams out in the x_proj dtype (bf16 in mixed precision)
    # which halves the block and lets the backward tile at 128 too
    bt = _tile_env(B, 'PUFFER_LSTM_TILE_BWD',
        128 if x_proj.dtype == jnp.bfloat16 else 64)
    grid = (B // bt,)
    kernel = functools.partial(_bwd_kernel, T=T, cdt=cdt)
    vm = pltpu.VMEM
    dxp, dh0, dc0, dwhh = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, bt, H4), lambda b: (0, b, 0), memory_space=vm),
            pl.BlockSpec((bt, H), lambda b: (b, 0), memory_space=vm),
            pl.BlockSpec((bt, H), lambda b: (b, 0), memory_space=vm),
            pl.BlockSpec((H, H4), lambda b: (0, 0), memory_space=vm),
            pl.BlockSpec((T, bt, H), lambda b: (0, b, 0), memory_space=vm),
            pl.BlockSpec((T, bt, H), lambda b: (0, b, 0), memory_space=vm),
            pl.BlockSpec((T, bt, H), lambda b: (0, b, 0), memory_space=vm),
            pl.BlockSpec((bt, H), lambda b: (b, 0), memory_space=vm),
            pl.BlockSpec((bt, H), lambda b: (b, 0), memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((T, bt, H4), lambda b: (0, b, 0), memory_space=vm),
            pl.BlockSpec((bt, H), lambda b: (b, 0), memory_space=vm),
            pl.BlockSpec((bt, H), lambda b: (b, 0), memory_space=vm),
            pl.BlockSpec((H, H4), lambda b: (0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H4), x_proj.dtype),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
        ],
    )(x_proj, h0, c0, w_hh, outs, cseq, g_outs, g_hT, g_cT)
    return dxp, dh0, dc0, dwhh.astype(w_hh.dtype)


lstm_scan.defvjp(_lstm_scan_fwd, _lstm_scan_bwd)


# ---------------------------------------------------------------------
# Fused-projection variant: the input projection x @ W_ih + b runs
# INSIDE the kernel per timestep, so the (T, B, 4H) x_proj tensor never
# exists in HBM. At bench shapes (T=16, B=8192, H=128, bf16) x_proj
# costs ~134 MB per minibatch streamed ~5x per update (fwd write, fwd
# read, bwd read, dx_proj write + read) — the single largest HBM stream
# of the LSTM update phase (docs/PERF.md op profile). The fused kernel
# streams only the 4x-smaller (T, B, D) input.


def _fwd_fused_kernel(x_ref, h0_ref, c0_ref, wih_ref, whh_ref, b_ref,
        outs_ref, ht_ref, ct_ref, cseq_ref, *, T, cdt):
    w_ih = wih_ref[:].astype(cdt)
    w_hh = whh_ref[:].astype(cdt)
    bias = b_ref[:].astype(jnp.float32)  # (1, 4H)

    def body(t, carry):
        h, c = carry
        xp = jnp.dot(x_ref[t].astype(cdt), w_ih,
            preferred_element_type=jnp.float32) + bias
        i, f, g, o = _gates(xp, h, w_hh, cdt)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        outs_ref[t] = h.astype(outs_ref.dtype)
        cseq_ref[t] = c.astype(cseq_ref.dtype)
        return (h, c)

    h, c = jax.lax.fori_loop(0, T, body, (h0_ref[:], c0_ref[:]))
    ht_ref[:] = h
    ct_ref[:] = c


def _fwd_fused_kernel_noresid(x_ref, h0_ref, c0_ref, wih_ref, whh_ref,
        b_ref, outs_ref, ht_ref, ct_ref, *, T, cdt):
    w_ih = wih_ref[:].astype(cdt)
    w_hh = whh_ref[:].astype(cdt)
    bias = b_ref[:].astype(jnp.float32)

    def body(t, carry):
        h, c = carry
        xp = jnp.dot(x_ref[t].astype(cdt), w_ih,
            preferred_element_type=jnp.float32) + bias
        i, f, g, o = _gates(xp, h, w_hh, cdt)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        outs_ref[t] = h.astype(outs_ref.dtype)
        return (h, c)

    h, c = jax.lax.fori_loop(0, T, body, (h0_ref[:], c0_ref[:]))
    ht_ref[:] = h
    ct_ref[:] = c


def _bwd_fused_kernel(x_ref, h0_ref, c0_ref, wih_ref, whh_ref, b_ref,
        outs_ref, cseq_ref, g_outs_ref, g_ht_ref, g_ct_ref,
        dx_ref, dh0_ref, dc0_ref, dwih_ref, dwhh_ref, db_ref, *, T, cdt):
    w_ih = wih_ref[:].astype(cdt)
    w_hh = whh_ref[:].astype(cdt)
    bias = b_ref[:].astype(jnp.float32)
    b_idx = pl.program_id(0)

    @pl.when(b_idx == 0)
    def _():
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    def body(k, carry):
        t = T - 1 - k
        dh, dc, dwih, dwhh, db = carry
        h_prev = jnp.where(t == 0, h0_ref[:], outs_ref[pl.ds(
            jnp.maximum(t - 1, 0), 1)][0].astype(jnp.float32))
        c_prev = jnp.where(t == 0, c0_ref[:], cseq_ref[pl.ds(
            jnp.maximum(t - 1, 0), 1)][0].astype(jnp.float32))
        c_t = cseq_ref[t].astype(jnp.float32)

        x_t = x_ref[t].astype(cdt)
        xp = jnp.dot(x_t, w_ih,
            preferred_element_type=jnp.float32) + bias
        i, f, g, o = _gates(xp, h_prev, w_hh, cdt)

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

        dx_ref[t] = jnp.dot(dgates_c, w_ih.T,
            preferred_element_type=jnp.float32).astype(dx_ref.dtype)
        dwih = dwih + jnp.dot(x_t.T, dgates_c,
            preferred_element_type=jnp.float32)
        db = db + jnp.sum(dgates, axis=0, keepdims=True)
        dh_prev = jnp.dot(dgates_c, w_hh.T,
            preferred_element_type=jnp.float32)
        dwhh = dwhh + jnp.dot(h_prev.astype(cdt).T, dgates_c,
            preferred_element_type=jnp.float32)
        dc_prev = dc * f
        return (dh_prev, dc_prev, dwih, dwhh, db)

    dwih0 = jnp.zeros_like(dwih_ref)
    dwhh0 = jnp.zeros_like(dwhh_ref)
    db0 = jnp.zeros_like(db_ref)
    dh, dc, dwih, dwhh, db = jax.lax.fori_loop(
        0, T, body, (g_ht_ref[:], g_ct_ref[:], dwih0, dwhh0, db0))
    dh0_ref[:] = dh
    dc0_ref[:] = dc
    dwih_ref[:] += dwih
    dwhh_ref[:] += dwhh
    db_ref[:] += db


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def lstm_scan_fused(x, h0, c0, w_ih, w_hh, b, cdt=jnp.bfloat16):
    """x: (T, B, D) time-major inputs; b: (4H,). Returns (outs, hT, cT)
    with outs (T, B, H)."""
    return _lstm_fused_impl(x, h0, c0, w_ih, w_hh, b, cdt,
        with_cseq=False)[:3]


def _lstm_fused_impl(x, h0, c0, w_ih, w_hh, b, cdt, with_cseq=True):
    T, B, D = x.shape
    H = h0.shape[-1]
    xb = x.dtype.itemsize
    rb = 2 if cdt == jnp.bfloat16 else 4

    def fwd_bytes(bt):
        seqs = T * bt * (D * xb + (2 if with_cseq else 1) * H * rb)
        weights = (D + H + 1) * 4 * H * 4
        states = 4 * bt * H * 4
        return seqs + weights + states

    bt = _tile_budget(B, 'PUFFER_LSTM_TILE_FWD', fwd_bytes)
    assert bt is not None, f'batch {B} not tileable'
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
        kernel = functools.partial(_fwd_fused_kernel, T=T, cdt=cdt)
        out_specs = out_specs + [seq_spec]
        out_shape = out_shape + [jax.ShapeDtypeStruct((T, B, H), rdt)]
    else:
        kernel = functools.partial(_fwd_fused_kernel_noresid, T=T,
            cdt=cdt)
    res = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
    )(x, h0, c0, w_ih, w_hh, b2)
    if with_cseq:
        return res
    return tuple(res) + (None,)


def _lstm_fused_fwd(x, h0, c0, w_ih, w_hh, b, cdt):
    outs, hT, cT, cseq = _lstm_fused_impl(x, h0, c0, w_ih, w_hh, b,
        cdt, with_cseq=True)
    return (outs, hT, cT), (x, h0, c0, w_ih, w_hh, b, outs, cseq)


def _lstm_fused_bwd(cdt, residuals, grads):
    x, h0, c0, w_ih, w_hh, b, outs, cseq = residuals
    g_outs, g_hT, g_cT = grads
    T, B, D = x.shape
    H = h0.shape[-1]
    xb = x.dtype.itemsize
    rb = outs.dtype.itemsize

    def bwd_bytes(bt):
        seqs = T * bt * (2 * D * xb + 3 * H * rb)  # x, dx, outs/cseq/g
        weights = 2 * (D + H + 1) * 4 * H * 4  # w + dw blocks
        states = 8 * bt * H * 4
        return seqs + weights + states

    bt = _tile_budget(B, 'PUFFER_LSTM_TILE_BWD', bwd_bytes)
    grid = (B // bt,)
    kernel = functools.partial(_bwd_fused_kernel, T=T, cdt=cdt)
    vm = pltpu.VMEM
    b2 = b.reshape(1, 4 * H)
    seq_h = pl.BlockSpec((T, bt, H), lambda i: (0, i, 0),
        memory_space=vm)
    state_spec = pl.BlockSpec((bt, H), lambda i: (i, 0), memory_space=vm)
    dx, dh0, dc0, dwih, dwhh, db = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((T, bt, D), lambda i: (0, i, 0),
                memory_space=vm),
            state_spec,
            state_spec,
            pl.BlockSpec((D, 4 * H), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((H, 4 * H), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, 4 * H), lambda i: (0, 0), memory_space=vm),
            seq_h, seq_h, seq_h,
            state_spec, state_spec,
        ],
        out_specs=[
            pl.BlockSpec((T, bt, D), lambda i: (0, i, 0),
                memory_space=vm),
            state_spec,
            state_spec,
            pl.BlockSpec((D, 4 * H), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((H, 4 * H), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, 4 * H), lambda i: (0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, D), x.dtype),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((D, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * H), jnp.float32),
        ],
    )(x, h0, c0, w_ih, w_hh, b2, outs, cseq, g_outs, g_hT, g_cT)
    return (dx, dh0, dc0, dwih.astype(w_ih.dtype),
        dwhh.astype(w_hh.dtype), db.reshape(4 * H).astype(b.dtype))


lstm_scan_fused.defvjp(_lstm_fused_fwd, _lstm_fused_bwd)


def lstm_scan_fused_reference(x, h0, c0, w_ih, w_hh, b,
        cdt=jnp.float32):
    """Pure-JAX reference for the fused-projection scan."""
    xp = (jnp.dot(x.astype(cdt), w_ih.astype(cdt),
        preferred_element_type=jnp.float32)
        + b.astype(jnp.float32))
    return lstm_scan_reference(xp, h0, c0, w_hh, cdt)


def lstm_scan_reference(x_proj, h0, c0, w_hh, cdt=jnp.float32):
    """Pure-JAX reference with identical semantics (for tests/fallback)."""
    def cell(carry, xt):
        h, c = carry
        gates = xt.astype(jnp.float32) + jnp.dot(
            h.astype(cdt), w_hh.astype(cdt),
            preferred_element_type=jnp.float32)
        H = h.shape[-1]
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h
    (hT, cT), outs = jax.lax.scan(cell, (h0, c0), x_proj)
    return outs, hT, cT
