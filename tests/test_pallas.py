"""Pallas kernels vs their pure-JAX references (interpret mode on CPU)."""
import numpy as np
import jax
import pytest

from pufferlib_tpu.ops import compute_gae
from pufferlib_tpu.ops.pallas import compute_gae_pallas


def test_pallas_gae_matches_scan():
    rng = np.random.RandomState(0)
    T, E = 32, 300  # non-multiple of the lane tile exercises padding
    rewards = rng.randn(T, E).astype(np.float32)
    values = rng.randn(T, E).astype(np.float32)
    dones = (rng.rand(T, E) < 0.1).astype(np.float32)
    last_value = rng.randn(E).astype(np.float32)

    expected = np.asarray(compute_gae(
        rewards, values, dones, last_value, 0.99, 0.95))
    got = np.asarray(compute_gae_pallas(
        rewards, values, dones, last_value, 0.99, 0.95, interpret=True))
    assert np.allclose(got, expected, atol=1e-5)


def test_pallas_gae_all_done():
    T, E = 8, 128
    rewards = np.ones((T, E), np.float32)
    values = np.zeros((T, E), np.float32)
    dones = np.ones((T, E), np.float32)
    last_value = np.full(E, 100.0, np.float32)
    got = np.asarray(compute_gae_pallas(
        rewards, values, dones, last_value, 0.99, 0.95, interpret=True))
    assert np.allclose(got, 1.0)
