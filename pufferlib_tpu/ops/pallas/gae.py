"""Pallas TPU kernel for per-env GAE.

The reverse scan runs entirely in VMEM: each grid program owns a
(T, LANE_TILE) block of env lanes, loops T sequentially on the VPU with
128-wide lane vectors, and writes advantages in place. One HBM read per
input element, one write per output — the lax.scan version emits T tiny
kernels; this is a single fused one.

Semantics identical to ops.gae.compute_gae (corrected per-env GAE with
bootstrap), validated against it in tests/test_pallas.py.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 256


def _gae_kernel(r_ref, v_ref, d_ref, lv_ref, adv_ref, *, gamma,
        gae_lambda, T):
    def body(i, lastgaelam):
        t = T - 1 - i
        nonterm = 1.0 - d_ref[t, :]
        # at t == T-1 bootstrap from last_value, else v[t+1]
        t_next = jnp.minimum(t + 1, T - 1)
        next_value = jnp.where(t == T - 1, lv_ref[0, :], v_ref[t_next, :])
        delta = r_ref[t, :] + gamma * next_value * nonterm - v_ref[t, :]
        lastgaelam = delta + gamma * gae_lambda * nonterm * lastgaelam
        adv_ref[t, :] = lastgaelam
        return lastgaelam

    zero = jnp.zeros((r_ref.shape[1],), jnp.float32)
    jax.lax.fori_loop(0, T, body, zero)


@functools.partial(jax.jit, static_argnames=('gamma', 'gae_lambda',
    'interpret'))
def compute_gae_pallas(rewards, values, dones, last_value, gamma,
        gae_lambda, interpret=False):
    """rewards/values/dones: (T, E) f32; last_value: (E,). -> (T, E)."""
    T, E = rewards.shape
    pad = (-E) % LANE_TILE
    if pad:
        padf = lambda x: jnp.pad(x, ((0, 0), (0, pad)))
        rewards, values = padf(rewards), padf(values)
        dones = padf(dones)
        last_value = jnp.pad(last_value, (0, pad))
    Ep = E + pad

    grid = (Ep // LANE_TILE,)
    spec = pl.BlockSpec((T, LANE_TILE), lambda i: (0, i),
        memory_space=pltpu.VMEM)
    lv_spec = pl.BlockSpec((1, LANE_TILE), lambda i: (0, i),
        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_gae_kernel, gamma=float(gamma),
            gae_lambda=float(gae_lambda), T=T),
        out_shape=jax.ShapeDtypeStruct((T, Ep), jnp.float32),
        grid=grid,
        in_specs=[spec, spec, spec, lv_spec],
        out_specs=spec,
        interpret=interpret,
    )(rewards.astype(jnp.float32), values.astype(jnp.float32),
        dones.astype(jnp.float32),
        last_value.astype(jnp.float32).reshape(1, Ep))
    return out[:, :E]
