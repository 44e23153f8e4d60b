"""GAE kernels vs a numpy replica of the reference Cython kernel
(reference c_gae.pyx:11-32)."""
import numpy as np
import jax.numpy as jnp

from pufferlib_tpu.ops import compute_gae, compute_gae_flat


def reference_gae(dones, values, rewards, gamma, gae_lambda):
    """Direct numpy port of the reference loop semantics for testing."""
    num_steps = len(rewards)
    advantages = np.zeros(num_steps, dtype=np.float32)
    lastgaelam = 0.0
    for t in range(num_steps - 1):
        t_cur = num_steps - 2 - t
        t_next = num_steps - 1 - t
        nextnonterminal = 1.0 - dones[t_next]
        delta = (rewards[t_next]
            + gamma * values[t_next] * nextnonterminal - values[t_cur])
        lastgaelam = delta + gamma * gae_lambda * nextnonterminal * lastgaelam
        advantages[t_cur] = lastgaelam
    return advantages


def test_flat_gae_matches_reference():
    rng = np.random.RandomState(0)
    n = 256
    dones = (rng.rand(n) < 0.1).astype(np.float32)
    values = rng.randn(n).astype(np.float32)
    rewards = rng.randn(n).astype(np.float32)
    expected = reference_gae(dones, values, rewards, 0.99, 0.95)
    got = np.asarray(compute_gae_flat(dones, values, rewards, 0.99, 0.95))
    assert np.allclose(got, expected, atol=1e-5)


def test_flat_gae_last_step_zero():
    got = np.asarray(compute_gae_flat(
        np.zeros(8, np.float32), np.ones(8, np.float32),
        np.ones(8, np.float32), 0.99, 0.95))
    assert got[-1] == 0.0


def test_per_env_gae_matches_loop():
    """compute_gae (T, E) with bootstrap vs an explicit python loop."""
    rng = np.random.RandomState(1)
    T, E = 32, 4
    rewards = rng.randn(T, E).astype(np.float32)
    values = rng.randn(T, E).astype(np.float32)
    dones = (rng.rand(T, E) < 0.15).astype(np.float32)
    last_value = rng.randn(E).astype(np.float32)
    gamma, lam = 0.99, 0.95

    expected = np.zeros((T, E), np.float32)
    for e in range(E):
        lastgaelam = 0.0
        for t in reversed(range(T)):
            nonterm = 1.0 - dones[t, e]
            nv = last_value[e] if t == T - 1 else values[t + 1, e]
            delta = rewards[t, e] + gamma * nv * nonterm - values[t, e]
            lastgaelam = delta + gamma * lam * nonterm * lastgaelam
            expected[t, e] = lastgaelam

    got = np.asarray(compute_gae(rewards, values, dones, last_value,
        gamma, lam))
    assert np.allclose(got, expected, atol=1e-5)


def test_per_env_gae_terminal_cuts_bootstrap():
    """A done at step t must block value flow from t+1."""
    T, E = 4, 1
    rewards = np.ones((T, E), np.float32)
    values = np.zeros((T, E), np.float32)
    dones = np.zeros((T, E), np.float32)
    dones[1, 0] = 1.0
    adv = np.asarray(compute_gae(rewards, values, dones,
        np.array([100.0], np.float32), 0.99, 0.95))
    # advantage at t=1 sees only its own reward
    assert adv[1, 0] == 1.0
