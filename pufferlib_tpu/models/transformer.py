"""Sliding-window causal self-attention policy wrapper (GTrXL-lite).

Beyond-reference model family: the reference has no attention anywhere
(SURVEY §2.4 — temporal context is LSTM-only, reference
models.py:64-111). This wrapper gives the same drop-in recurrent
contract as `LSTMWrapper` — `(B,)/(B,T)/(T,B)` shape discipline,
`(state_a, state_b)` tuple state, `policy.encode_observations` /
`decode_actions` split — with the recurrent state being a sliding
WINDOW of the last `window` encoded observations instead of an (h, c)
pair, attended with learned per-head recency biases.

Design for TPU: the update-phase segment forward is ONE banded causal
attention over `concat(mem0, e)` — a single set of MXU matmuls per
minibatch, no per-timestep scan (the LSTM needs a Pallas kernel to get
this property; attention has it by construction). The rollout step is
the T=1 band: query the current encoding against the window.

Stepwise/segment EXACT equivalence (the property the PPO update
relies on — it recomputes rollout logprobs from stored state
snapshots) is pinned by tests/test_transformer.py.

State layout: `(mem, aux)` where mem is (window, B, H) ordered oldest
-> newest and aux is an unused (1, B, H) zeros slot — the trainer
carries recurrent state as a 2-tuple of arrays (training/ppo.py
lstm_h/lstm_c snapshots); `TransformerPolicy.initial_state` builds
it. Episode boundaries do NOT reset the window, mirroring the
LSTM path's (and the reference's) carry-through-autoreset semantics.
"""
import jax
import jax.numpy as jnp
import flax.linen as nn

from pufferlib_tpu.models.policy import RecurrentPolicy


def _orthogonal(std):
    return nn.initializers.orthogonal(std)


class TransformerWrapper(nn.Module):
    """Windowed causal self-attention between encode_observations and
    decode_actions. Input x: (B, *obs_shape) [rollout, T=1],
    (B, T, *obs_shape), or (T, B, *obs_shape) with time_major=True.
    Output rows follow the input's flattening order, matching
    LSTMWrapper."""
    policy: nn.Module
    obs_shape: tuple
    input_size: int = 128
    hidden_size: int = 128
    window: int = 16
    num_heads: int = 4
    ffn_mult: int = 2
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, state=None, time_major=False):
        assert self.input_size == self.hidden_size, (
            'TransformerWrapper needs input_size == hidden_size '
            '(residual stream)')
        H = self.hidden_size
        W = self.window
        nh = self.num_heads
        dh = H // nh
        assert nh * dh == H, 'hidden_size must divide num_heads'
        cdt = self.dtype

        space_n = len(self.obs_shape)
        x_shape = tuple(x.shape)
        if x_shape[-space_n:] != tuple(self.obs_shape):
            raise ValueError(f'Invalid input tensor shape {x_shape}')
        if len(x_shape) == space_n + 1:
            B, T = x_shape[0], 1
            time_major = False
        elif len(x_shape) == space_n + 2:
            T, B = x_shape[:2] if time_major else x_shape[:2][::-1]
        else:
            raise ValueError(f'Invalid input tensor shape {x_shape}')

        hidden, lookup = self.policy.encode_observations(
            x.reshape((B * T,) + tuple(self.obs_shape)))
        assert hidden.shape == (B * T, self.input_size)
        # canonical internal layout: time-major (T, B, H)
        if time_major or T == 1:
            e = hidden.reshape(T, B, H)
        else:
            e = jnp.swapaxes(hidden.reshape(B, T, H), 0, 1)

        if state is None:
            mem = jnp.zeros((W, B, H), e.dtype)
            aux = jnp.zeros((1, B, H), e.dtype)
        else:
            mem, aux = state
        mem = mem.astype(e.dtype)

        ln_kv = nn.LayerNorm(name='ln_kv')
        wq = self.param('wq', _orthogonal(1.0), (H, H))
        wk = self.param('wk', _orthogonal(1.0), (H, H))
        wv = self.param('wv', _orthogonal(1.0), (H, H))
        wo = self.param('wo', _orthogonal(1.0), (H, H))
        # learned per-head bias over recency distance 0 (current) .. W
        rel = self.param('rel_bias', nn.initializers.zeros, (nh, W + 1))

        kv_src = jnp.concatenate([mem, e], axis=0)       # (W+T, B, H)
        normed = ln_kv(kv_src.astype(jnp.float32))
        q_in = normed[W:]                                 # (T, B, H)

        def heads(v):                                     # -> (B,nh,S,dh)
            s = v.shape[0]
            return jnp.transpose(
                v.reshape(s, B, nh, dh), (1, 2, 0, 3))

        q = heads(q_in.astype(cdt) @ wq.astype(cdt))      # (B,nh,T,dh)
        k = heads(normed.astype(cdt) @ wk.astype(cdt))    # (B,nh,W+T,dh)
        v = heads(normed.astype(cdt) @ wv.astype(cdt))

        scores = jnp.einsum('bhid,bhjd->bhij', q, k).astype(jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(dh))
        # query i (concat position W+i) sees concat j in [i, W+i]:
        # its window slots plus itself; d = recency distance
        i_idx = jnp.arange(T)[:, None]
        j_idx = jnp.arange(W + T)[None, :]
        d = (W + i_idx) - j_idx                           # (T, W+T)
        allowed = (d >= 0) & (d <= W)
        bias = jnp.take(rel, jnp.clip(d, 0, W), axis=1)   # (nh, T, W+T)
        scores = scores + bias[None]
        scores = jnp.where(allowed[None, None], scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum('bhij,bhjd->bhid', attn.astype(cdt), v)
        ctx = jnp.transpose(ctx, (2, 0, 1, 3)).reshape(T, B, H)
        a = e.astype(jnp.float32) \
            + (ctx @ wo.astype(cdt)).astype(jnp.float32)

        ln_ffn = nn.LayerNorm(name='ln_ffn')
        f1 = nn.Dense(self.ffn_mult * H, name='ffn_in',
            kernel_init=_orthogonal(jnp.sqrt(2)), dtype=cdt,
            param_dtype=jnp.float32)
        f2 = nn.Dense(H, name='ffn_out',
            kernel_init=_orthogonal(jnp.sqrt(2)), dtype=cdt,
            param_dtype=jnp.float32)
        out = a + f2(jax.nn.relu(f1(ln_ffn(a)))).astype(jnp.float32)

        # window shift: slots stay ordered oldest -> newest. The slab
        # forward reproduces the stepwise shifts because e enters in
        # time order (concat(mem, e)[-W:] == W stepwise shifts).
        new_mem = kv_src[T:] if T >= 1 else mem
        new_mem = new_mem[-W:]
        new_state = (new_mem, jnp.zeros_like(aux))

        if time_major or T == 1:
            flat = out.reshape(T * B, H)
        else:
            flat = jnp.swapaxes(out, 0, 1).reshape(B * T, H)
        logits, value = self.policy.decode_actions(
            flat.astype(cdt), lookup)
        return logits, value, new_state

    def initial_state(self, batch_size, dtype=jnp.float32):
        return (jnp.zeros((self.window, batch_size, self.hidden_size),
                dtype),
            jnp.zeros((1, batch_size, self.hidden_size), dtype))


class TransformerPolicy(RecurrentPolicy):
    """RecurrentPolicy whose initial_state matches TransformerWrapper's
    (window, B, H) memory layout instead of the LSTM's (layers, B, H)
    h/c pair. Everything else (sampling, get_value, the trainer's
    state-snapshot plumbing) is shared."""

    def initial_state(self, batch_size, dtype=jnp.float32):
        return self.module.initial_state(batch_size, dtype)
