"""Env-specific policies (nethack / nmmo / nmmo3) construct, init, and
produce correctly-shaped logits/values from emulated flat observations.

Parity model: reference pufferlib/environments/{nethack,nmmo,nmmo3}/
torch.py — each policy consumes the flat emulated obs and nativizes
inside encode_observations.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pufferlib_tpu import emulation, spaces
from pufferlib_tpu.models import LSTMWrapper


def _emulated(space):
    return emulation.make_emulated(space)


def test_nethack_policy_forward():
    from pufferlib_tpu.environments.nethack.policy import Policy
    obs_space = spaces.Dict({
        'blstats': spaces.Box(low=-2**15, high=2**15 - 1, shape=(27,),
            dtype=np.int32),
        'chars': spaces.Box(low=0, high=255, shape=(21, 79),
            dtype=np.uint8),
    })
    emulated = _emulated(obs_space)
    flat_space, _ = emulation.emulate_observation_space(obs_space)
    pol = Policy(obs_shape=flat_space.shape,
        action_space=spaces.Discrete(8), emulated=emulated)
    obs = jnp.zeros((4,) + flat_space.shape, flat_space.dtype)
    params = pol.init(jax.random.PRNGKey(0), obs)
    logits, value = pol.apply(params, obs)
    assert logits.shape == (4, 8)
    assert value.shape == (4, 1)


def test_nethack_policy_with_lstm():
    from pufferlib_tpu.environments.nethack.policy import Policy
    obs_space = spaces.Dict({
        'blstats': spaces.Box(low=-2**15, high=2**15 - 1, shape=(27,),
            dtype=np.int32),
        'chars': spaces.Box(low=0, high=255, shape=(21, 79),
            dtype=np.uint8),
    })
    emulated = _emulated(obs_space)
    flat_space, _ = emulation.emulate_observation_space(obs_space)
    pol = Policy(obs_shape=flat_space.shape,
        action_space=spaces.Discrete(8), emulated=emulated)
    wrapped = LSTMWrapper(policy=pol, obs_shape=flat_space.shape,
        input_size=256, hidden_size=256)
    obs = jnp.zeros((4,) + flat_space.shape, flat_space.dtype)
    state = wrapped.initial_state(4)
    params = wrapped.init(jax.random.PRNGKey(0), obs, state)
    logits, value, new_state = wrapped.apply(params, obs, state)
    assert logits.shape == (4, 8)
    assert new_state[0].shape == (1, 4, 256)


def test_nmmo_policy_forward():
    from pufferlib_tpu.environments.nmmo.policy import Policy
    rows = 32
    obs_space = spaces.Dict({
        'AgentId': spaces.Box(low=0, high=2**15 - 1, shape=(1,),
            dtype=np.int16),
        'Entity': spaces.Box(low=-2**15, high=2**15 - 1, shape=(rows, 31),
            dtype=np.int16),
        'Tile': spaces.Box(low=0, high=255, shape=(225, 3),
            dtype=np.int16),
    })
    emulated = _emulated(obs_space)
    flat_space, _ = emulation.emulate_observation_space(obs_space)
    pol = Policy(obs_shape=flat_space.shape,
        action_space=spaces.MultiDiscrete([5, 4, 3]), emulated=emulated)
    obs = jnp.zeros((2,) + flat_space.shape, flat_space.dtype)
    params = pol.init(jax.random.PRNGKey(0), obs)
    logits, value = pol.apply(params, obs)
    assert [l.shape for l in logits] == [(2, 5), (2, 4), (2, 3)]
    assert value.shape == (2, 1)


def test_nmmo3_decompressor_matches_mixed_radix():
    from pufferlib_tpu.environments.nmmo3.policy import (
        decompress_map, FACTORS, N_CHANNELS)
    rng = np.random.RandomState(0)
    total = int(np.prod(FACTORS))
    codes = rng.randint(0, total, size=(3, 11, 15)).astype(np.int32)
    out = np.asarray(decompress_map(jnp.asarray(codes)))
    assert out.shape == (3, 11, 15, N_CHANNELS)
    # each factor block is exactly one-hot at (code // div) % mod
    div, off = 1, 0
    for mod in FACTORS:
        block = out[..., off:off + mod]
        idx = (codes // div) % mod
        assert (block.argmax(-1) == idx).all()
        assert (block.sum(-1) == 1).all()
        off += mod
        div *= mod


def test_nmmo3_policy_forward():
    from pufferlib_tpu.environments.nmmo3.policy import Policy
    numel = 11 * 15 + 44
    pol = Policy(obs_shape=(numel,), action_space=spaces.Discrete(6))
    obs = jnp.zeros((2, numel), jnp.int32)
    params = pol.init(jax.random.PRNGKey(0), obs)
    logits, value = pol.apply(params, obs)
    assert logits.shape == (2, 6)
    assert value.shape == (2, 1)
