"""Cross-validate sampling math against torch.distributions — the
reference's own correctness contract (tests/test_cleanrl_utils.py:36-60
checks sample_logits vs torch.distributions.Categorical).
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from pufferlib_tpu.models.distributions import (
    entropy, log_prob, sample_logits)


def test_logprob_entropy_match_torch_categorical():
    rng = np.random.RandomState(0)
    logits = rng.randn(64, 7).astype(np.float32) * 2
    actions = rng.randint(0, 7, 64).astype(np.int32)

    dist = torch.distributions.Categorical(logits=torch.tensor(logits))
    t_lp = dist.log_prob(torch.tensor(actions)).numpy()
    t_ent = dist.entropy().numpy()

    j_lp = np.asarray(log_prob(jnp.asarray(logits), jnp.asarray(actions)))
    j_ent = np.asarray(entropy(jnp.asarray(logits)))
    assert np.allclose(j_lp, t_lp, atol=1e-5)
    assert np.allclose(j_ent, t_ent, atol=1e-5)


def test_sample_logits_multidiscrete_matches_torch():
    """MultiDiscrete: logprob/entropy sum over components
    (reference cleanrl.py:25-47)."""
    rng = np.random.RandomState(1)
    l0 = rng.randn(32, 3).astype(np.float32)
    l1 = rng.randn(32, 5).astype(np.float32)
    actions = np.stack([rng.randint(0, 3, 32), rng.randint(0, 5, 32)],
        axis=-1).astype(np.int32)

    _, j_lp, j_ent = sample_logits(
        [jnp.asarray(l0), jnp.asarray(l1)], action=jnp.asarray(actions))

    d0 = torch.distributions.Categorical(logits=torch.tensor(l0))
    d1 = torch.distributions.Categorical(logits=torch.tensor(l1))
    t_lp = (d0.log_prob(torch.tensor(actions[:, 0]))
        + d1.log_prob(torch.tensor(actions[:, 1]))).numpy()
    t_ent = (d0.entropy() + d1.entropy()).numpy()
    assert np.allclose(np.asarray(j_lp), t_lp, atol=1e-5)
    assert np.allclose(np.asarray(j_ent), t_ent, atol=1e-5)


def test_inverse_cdf_sampling_distribution():
    """The inverse-CDF sampler draws from the categorical distribution:
    empirical frequencies match softmax probabilities."""
    logits = jnp.asarray([[0.5, -1.0, 2.0, 0.0]])
    logits = jnp.repeat(logits, 200_000, axis=0)
    a, _, _ = sample_logits(logits, key=jax.random.PRNGKey(0))
    counts = np.bincount(np.asarray(a), minlength=4) / a.shape[0]
    probs = np.asarray(jax.nn.softmax(logits[0]))
    assert np.abs(counts - probs).max() < 0.01, (counts, probs)


def test_masked_logits_never_sample_zero_probability():
    """-inf-masked actions (action-masked envs, e.g. open_spiel) must
    never be sampled, including at CDF tie boundaries: masked entries
    produce flat (empty) CDF segments that the `cdf <= u` semantics
    skip (ADVICE r1: inverse-CDF boundary hazard)."""
    neg = -jnp.inf
    # mask the first, an interior, and the last action
    logits = jnp.asarray([[neg, 1.0, neg, 0.5, neg]])
    logits = jnp.repeat(logits, 100_000, axis=0)
    a, lp, _ = sample_logits(logits, key=jax.random.PRNGKey(1))
    a = np.asarray(a)
    assert set(np.unique(a)) <= {1, 3}
    assert np.all(np.isfinite(np.asarray(lp)))
    # bf16 logits follow the same path (cdf is accumulated in f32)
    a16, _, _ = sample_logits(logits.astype(jnp.bfloat16),
        key=jax.random.PRNGKey(2))
    assert set(np.unique(np.asarray(a16))) <= {1, 3}
