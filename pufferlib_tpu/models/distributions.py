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
    return jnp.sum(logp * onehot, axis=-1)


def entropy(logits):
    """Entropy of a categorical given unnormalized logits (B, A)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    return -jnp.sum(p * logp, axis=-1)


def _sample_categorical(key, logits):
    """Inverse-CDF categorical sample: ONE uniform per row instead of
    gumbel's A uniforms + logs (jax.random.categorical). On the rollout
    hot path the RNG bits dominate for small A."""
    probs = jax.nn.softmax(logits, axis=-1)
    cdf = jnp.cumsum(probs, axis=-1)
    u = jax.random.uniform(key, logits.shape[:-1], dtype=probs.dtype)
    return jnp.sum((u[..., None] > cdf).astype(jnp.int32), axis=-1).clip(
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
