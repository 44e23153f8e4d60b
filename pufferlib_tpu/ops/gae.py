"""Generalized Advantage Estimation as reversed scans.

Two modes:
- compute_gae: the corrected per-env formulation over (T, E) rollouts
  with a bootstrap value — what the fused trainer uses. The reference's
  Cython kernel lacks the bootstrap across segment bounds (noted TODO at
  clean_pufferl.py:167); this is the fixed version.
- compute_gae_flat: bit-exact replica of the reference kernel semantics
  (c_gae.pyx:11-32) over a flat env-major array, for parity mode and the
  host-bridge path that mirrors Experience.sort_training_data.

Both compile to a single fused XLA loop; a Pallas TPU kernel variant
lives in ops/pallas/gae.py for the hot path.
"""
import jax
import jax.numpy as jnp


def compute_gae(rewards, values, dones, last_value, gamma, gae_lambda):
    """Per-env GAE with bootstrap.

    rewards/values/dones: (T, E) where row t holds the results of action
    a_t (reward r_t, done d_t) and v_t = V(s_t). last_value: (E,)
    V(s_{T}) used to bootstrap the final step. Returns advantages (T, E).
    """
    rewards = jnp.asarray(rewards, jnp.float32)
    values = jnp.asarray(values, jnp.float32)
    nonterminal = 1.0 - jnp.asarray(dones, jnp.float32)
    next_values = jnp.concatenate(
        [values[1:], jnp.asarray(last_value, jnp.float32)[None]], axis=0)

    def body(carry, xs):
        reward, value, next_value, nonterm = xs
        delta = reward + gamma * next_value * nonterm - value
        adv = delta + gamma * gae_lambda * nonterm * carry
        return adv, adv

    _, advantages = jax.lax.scan(
        body,
        jnp.zeros_like(last_value, shape=rewards.shape[1:]),
        (rewards, values, next_values, nonterminal),
        reverse=True,
    )
    return advantages


def compute_gae_flat(dones, values, rewards, gamma, gae_lambda):
    """Bit-exact replica of the reference Cython GAE over a flat
    env-major, time-sorted batch (c_gae.pyx:11-32):

        nextnonterminal = 1 - dones[t+1]
        delta = rewards[t+1] + gamma*values[t+1]*nextnonterminal - values[t]
        adv[t] = delta + gamma*lambda*nextnonterminal*adv[t+1]

    with adv[N-1] = 0 (no bootstrap across the batch end or segment
    bounds — the reference's exact behavior, preserved for parity).
    """
    dones = jnp.asarray(dones, jnp.float32)
    values = jnp.asarray(values, jnp.float32)
    rewards = jnp.asarray(rewards, jnp.float32)

    nextnonterminal = 1.0 - dones[1:]
    delta = rewards[1:] + gamma * values[1:] * nextnonterminal - values[:-1]
    decay = gamma * gae_lambda * nextnonterminal

    def body(carry, xs):
        d, k = xs
        adv = d + k * carry
        return adv, adv

    _, advantages = jax.lax.scan(
        body, jnp.float32(0.0), (delta, decay), reverse=True)
    return jnp.concatenate([advantages, jnp.zeros(1, jnp.float32)])
