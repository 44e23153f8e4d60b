"""Fused Default-MLP forward: encoder + relu + head in ONE kernel.

The rollout scan's policy forward (reference clean_pufferl.py:97-107,
here ppo.make_rollout_fn) runs every step on (B, F) observations. As
separate XLA ops the two small matmuls plus cast/relu/bias fusions cost
~18 us/step at B=8192 — ~2.5x the HBM-bandwidth floor — because each op
pays fixed dispatch overhead and streams its intermediates through HBM.
This kernel computes

    out = relu(x @ w1 + b1) @ w2 + b2        # (B, A+1), float32

in one pallas_call: the (B, H) hidden activation never exists in HBM.
The last output column is the value head, the rest are the fused logit
blocks (models.Default.head layout).

Backward (custom VJP) is NOT a kernel: the update phase's gradient
matmuls are tall K=B contractions that XLA already runs at the HBM
bandwidth limit, so the bwd recomputes the hidden layer and emits plain
dot_generals. The x-cotangent is zero by contract — observations are
constants in RL training and the caller stop_gradients x (same
convention as the fused-encoder LSTM kernels, ops/pallas/lstm_enc*.py).

Precision: matmuls accumulate in f32 with cdt (bf16 in production)
operands; the hidden activation rounds to cdt between the layers,
matching the flax Dense(dtype=cdt) composition it replaces.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile(B):
    for bt in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if B % bt == 0:
            return bt
    # fail here with the real cause, not `B // None` at the grid
    raise AssertionError(
        f'batch {B} not tileable (must be divisible by 8); '
        'the fused MLP kernel needs B % 8 == 0')


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, cdt):
    x = x_ref[:].astype(cdt)
    pre = jnp.dot(x, w1_ref[:].astype(cdt),
        preferred_element_type=jnp.float32) + b1_ref[:].astype(jnp.float32)
    h = jax.nn.relu(pre).astype(cdt)
    out = jnp.dot(h, w2_ref[:].astype(cdt),
        preferred_element_type=jnp.float32) + b2_ref[:].astype(jnp.float32)
    out_ref[:] = out


def _impl(x, w1, b1, w2, b2, cdt, interpret=False):
    B, F = x.shape
    H = w1.shape[-1]
    O = w2.shape[-1]
    bt = _tile(B)
    vm = pltpu.VMEM
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cdt=cdt),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, F), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((F, H), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((H, O), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, O), lambda i: (0, 0), memory_space=vm),
        ],
        out_specs=pl.BlockSpec((bt, O), lambda i: (i, 0),
            memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((B, O), jnp.float32),
        interpret=interpret,
    )(x, w1, b1.reshape(1, H), w2, b2.reshape(1, O))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def mlp_head_fwd(x, w1, b1, w2, b2, cdt=jnp.bfloat16):
    """out = relu(x @ w1 + b1) @ w2 + b2, fused. out: (B, O) float32.

    Differentiable wrt the weights/biases; the x-cotangent is ZERO by
    contract (stop_gradient x at the call site)."""
    return _impl(x, w1, b1, w2, b2, cdt)


def mlp_head_reference(x, w1, b1, w2, b2, cdt=jnp.bfloat16):
    """Pure-JAX reference of the same math (tests; non-TPU paths)."""
    pre = jnp.dot(x.astype(cdt), w1.astype(cdt),
        preferred_element_type=jnp.float32) + b1.astype(jnp.float32)
    h = jax.nn.relu(pre).astype(cdt)
    return jnp.dot(h, w2.astype(cdt),
        preferred_element_type=jnp.float32) + b2.astype(jnp.float32)


def _fwd(x, w1, b1, w2, b2, cdt):
    return _impl(x, w1, b1, w2, b2, cdt), (x, w1, b1, w2, b2)


def _bwd(cdt, residuals, g):
    x, w1, b1, w2, b2 = residuals
    xc = x.astype(cdt)
    pre = jnp.dot(xc, w1.astype(cdt),
        preferred_element_type=jnp.float32) + b1.astype(jnp.float32)
    h = jax.nn.relu(pre).astype(cdt)
    gc = g.astype(cdt)
    dw2 = jnp.dot(h.T, gc, preferred_element_type=jnp.float32)
    db2 = jnp.sum(g, axis=0)
    dh = jnp.dot(gc, w2.astype(cdt).T,
        preferred_element_type=jnp.float32)
    dpre = jnp.where(pre > 0, dh, 0.0).astype(cdt)
    dw1 = jnp.dot(xc.T, dpre, preferred_element_type=jnp.float32)
    db1 = jnp.sum(dpre.astype(jnp.float32), axis=0)
    return (jnp.zeros_like(x), dw1.astype(w1.dtype),
        db1.astype(b1.dtype), dw2.astype(w2.dtype), db2.astype(b2.dtype))


mlp_head_fwd.defvjp(_fwd, _bwd)
