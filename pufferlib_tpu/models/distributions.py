"""Categorical/MultiDiscrete sampling, logprob, entropy.

Parity: reference pufferlib/frameworks/cleanrl.py:12-47 (sample_logits):
a single logits tensor is Discrete; a list of logits tensors is
MultiDiscrete; logprob and entropy sum over components. JAX version is
fully jittable; sampling takes an explicit PRNG key.
"""
import jax
import jax.numpy as jnp


def log_prob(logits, value):
    """logprob of integer actions under normalized logits (B, A).

    One-hot contraction instead of take_along_axis: TPU lowers the
    gather (and its scatter backward) far slower than the elementwise
    select+reduce."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(value.astype(jnp.int32), logits.shape[-1],
        dtype=logp.dtype)
    # where instead of multiply: -inf-masked logits would give 0*-inf=NaN
    return jnp.sum(jnp.where(onehot != 0, logp, 0), axis=-1)


def entropy(logits):
    """Entropy of a categorical given unnormalized logits (B, A)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    # p=0 terms contribute 0 (not 0*-inf=NaN) under -inf action masks
    return -jnp.sum(jnp.where(p > 0, p * logp, 0), axis=-1)


def _sample_categorical(key, logits):
    """Inverse-CDF categorical sample: ONE uniform per row instead of
    gumbel's A uniforms + logs (jax.random.categorical). On the rollout
    hot path the RNG bits dominate for small A.

    Zero-probability safety (masked -inf logits, e.g. open_spiel):
    the cdf is accumulated in f32, u is scaled by cdf[-1] so rounding
    can never push it past the last positive-probability segment, and
    `cdf <= u` tie semantics skip flat (zero-probability) segments —
    index k is selected iff cdf[k-1] <= u < cdf[k], an empty interval
    whenever p_k == 0."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    cdf = jnp.cumsum(probs, axis=-1)
    u = jax.random.uniform(key, logits.shape[:-1], dtype=jnp.float32)
    u = u[..., None] * cdf[..., -1:]
    return jnp.sum((cdf <= u).astype(jnp.int32), axis=-1).clip(
        0, logits.shape[-1] - 1)


def sample_logits(logits, action=None, key=None):
    """Sample (or evaluate) (multi)discrete actions.

    logits: (B, A) array [Discrete] or list of (B, A_i) arrays
    [MultiDiscrete]. When action is None, samples with `key`; otherwise
    evaluates the given actions — (B,) for Discrete, (B, k) for
    MultiDiscrete. Returns (action, logprob, entropy) with logprob and
    entropy summed over components.
    """
    is_discrete = not isinstance(logits, (list, tuple))
    logits_list = [logits] if is_discrete else list(logits)

    if action is None:
        assert key is not None, 'sampling requires a PRNG key'
        keys = jax.random.split(key, len(logits_list))
        actions = [_sample_categorical(k, l)
            for k, l in zip(keys, logits_list)]
    else:
        action = jnp.asarray(action)
        batch = logits_list[0].shape[0]
        action = action.reshape(batch, -1)
        actions = [action[:, i] for i in range(len(logits_list))]

    logprob = sum(log_prob(l, a) for l, a in zip(logits_list, actions))
    ent = sum(entropy(l) for l in logits_list)

    if is_discrete:
        return actions[0], logprob, ent
    return jnp.stack(actions, axis=-1), logprob, ent
