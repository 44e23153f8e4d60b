"""PPO losses — exact reference math (clean_pufferl.py:201-238).

Returns the scalar loss plus the stats the reference logs (losses/*
metrics, clean_pufferl.py:369-378). Fully jittable; optional mask for
padded/non-learner agents (multi-agent parity: experience.store masks,
clean_pufferl.py:437-439).
"""
import jax.numpy as jnp


def _masked_mean(x, mask=None):
    if mask is None:
        return jnp.mean(x)
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def ppo_losses(newlogprob, logprob, entropy, newvalue, values, advantages,
        returns, clip_coef=0.1, vf_clip_coef=0.1, vf_coef=0.5,
        ent_coef=0.01, norm_adv=True, clip_vloss=True, mask=None):
    """All inputs flat (N,). Returns (loss, stats dict)."""
    logratio = newlogprob - logprob
    ratio = jnp.exp(logratio)

    # approx KL (http://joschu.net/blog/kl-approx.html), as diagnostics
    old_approx_kl = _masked_mean(-logratio, mask)
    approx_kl = _masked_mean((ratio - 1) - logratio, mask)
    clipfrac = _masked_mean(
        (jnp.abs(ratio - 1.0) > clip_coef).astype(jnp.float32), mask)

    adv = advantages
    if norm_adv:
        mean = _masked_mean(adv, mask)
        std = jnp.sqrt(_masked_mean((adv - mean) ** 2, mask))
        adv = (adv - mean) / (std + 1e-8)

    pg_loss1 = -adv * ratio
    pg_loss2 = -adv * jnp.clip(ratio, 1 - clip_coef, 1 + clip_coef)
    pg_loss = _masked_mean(jnp.maximum(pg_loss1, pg_loss2), mask)

    newvalue = newvalue.reshape(-1)
    if clip_vloss:
        v_loss_unclipped = (newvalue - returns) ** 2
        v_clipped = values + jnp.clip(
            newvalue - values, -vf_clip_coef, vf_clip_coef)
        v_loss_clipped = (v_clipped - returns) ** 2
        v_loss = 0.5 * _masked_mean(
            jnp.maximum(v_loss_unclipped, v_loss_clipped), mask)
    else:
        v_loss = 0.5 * _masked_mean((newvalue - returns) ** 2, mask)

    entropy_loss = _masked_mean(entropy, mask)
    loss = pg_loss - ent_coef * entropy_loss + v_loss * vf_coef

    stats = dict(
        policy_loss=pg_loss,
        value_loss=v_loss,
        entropy=entropy_loss,
        old_approx_kl=old_approx_kl,
        approx_kl=approx_kl,
        clipfrac=clipfrac,
    )
    return loss, stats
