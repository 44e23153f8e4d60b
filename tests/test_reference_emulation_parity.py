"""Emulation-layer lockstep parity against the ACTUAL reference code.

Loads /root/reference/pufferlib's emulation module (its old-gym import
satisfied by aliasing gymnasium.spaces) and asserts, across a nested
space grid, that this repo produces byte-identical results for the
reference's core contracts (ref emulation.py:16-121):

- dtype_from_space: identical numpy structured dtypes (names, offsets,
  itemsize — the memory layout everything downstream depends on)
- emulate_observation_space / emulate_action_space: same flat spaces
- emulate(): byte-identical packed buffers for identical samples
- nativize(): identical reconstruction from the shared bytes
"""
import sys
import types

import numpy as np
import pytest

import gymnasium

from pufferlib_tpu import emulation as our_em
from pufferlib_tpu import spaces as our_spaces


@pytest.fixture(scope='module')
def ref_em():
    if 'gym' not in sys.modules:
        fake_gym = types.ModuleType('gym')
        fake_gym.spaces = gymnasium.spaces
        sys.modules['gym'] = fake_gym
    sys.path.insert(0, '/root/reference')
    try:
        import pufferlib.emulation as mod
    finally:
        sys.path.remove('/root/reference')
    return mod


GRID = {
    'box': gymnasium.spaces.Box(-1, 1, (6,), np.float32),
    'image': gymnasium.spaces.Box(0, 255, (3, 4, 4), np.uint8),
    'dict_uniform': gymnasium.spaces.Dict({
        'a': gymnasium.spaces.Box(0, 1, (3,), np.float32),
        'b': gymnasium.spaces.Box(0, 1, (2, 2), np.float32),
    }),
    'dict_mixed': gymnasium.spaces.Dict({
        'image': gymnasium.spaces.Box(0, 255, (4, 4), np.uint8),
        'flat': gymnasium.spaces.Box(-128, 127, (6,), np.int8),
        'deep': gymnasium.spaces.Dict({
            'x': gymnasium.spaces.Box(0, 1, (2,), np.float32),
        }),
    }),
    'tuple_nested': gymnasium.spaces.Tuple([
        gymnasium.spaces.Box(0, 1, (3,), np.float32),
        gymnasium.spaces.Tuple([
            gymnasium.spaces.Box(0, 1, (2,), np.float32),
            gymnasium.spaces.Box(0, 255, (2,), np.uint8),
        ]),
    ]),
    'nethack_like': gymnasium.spaces.Dict({
        'blstats': gymnasium.spaces.Box(-2**15, 2**15 - 1, (27,),
            np.int32),
        'chars': gymnasium.spaces.Box(0, 255, (21, 79), np.uint8),
        'colors': gymnasium.spaces.Box(0, 15, (21, 79), np.uint8),
    }),
}

ACTION_GRID = {
    'dict_discrete': gymnasium.spaces.Dict({
        'move': gymnasium.spaces.Discrete(4),
        'attack': gymnasium.spaces.Discrete(3),
    }),
    'tuple_discrete': gymnasium.spaces.Tuple([
        gymnasium.spaces.Discrete(2), gymnasium.spaces.Discrete(6),
    ]),
    'nmmo_actions': gymnasium.spaces.Dict({
        'Attack': gymnasium.spaces.Dict({
            'Style': gymnasium.spaces.Discrete(3),
            'Target': gymnasium.spaces.Discrete(100),
        }),
        'Move': gymnasium.spaces.Dict({
            'Direction': gymnasium.spaces.Discrete(5)}),
    }),
}


@pytest.mark.parametrize('name', sorted(GRID))
def test_structured_dtype_layout_matches_reference(ref_em, name):
    space = GRID[name]
    ref_dt = ref_em.dtype_from_space(space)
    our_dt = our_em.dtype_from_space(our_spaces.from_gymnasium(space))
    assert np.dtype(ref_dt) == np.dtype(our_dt), name


@pytest.mark.parametrize('name', sorted(GRID))
def test_emulated_observation_space_matches_reference(ref_em, name):
    space = GRID[name]
    ref_flat, ref_dt = ref_em.emulate_observation_space(space)
    our_flat, our_dt = our_em.emulate_observation_space(
        our_spaces.from_gymnasium(space))
    assert tuple(ref_flat.shape) == tuple(our_flat.shape), name
    assert np.dtype(ref_flat.dtype) == np.dtype(our_flat.dtype), name
    assert np.dtype(ref_dt) == np.dtype(our_dt), name


@pytest.mark.parametrize('name', sorted(ACTION_GRID))
def test_emulated_action_space_matches_reference(ref_em, name):
    space = ACTION_GRID[name]
    ref_flat, _ = ref_em.emulate_action_space(space)
    our_flat, _ = our_em.emulate_action_space(
        our_spaces.from_gymnasium(space))
    assert list(np.asarray(ref_flat.nvec).ravel()) == \
        list(np.asarray(our_flat.nvec).ravel()), name


@pytest.mark.parametrize('name', sorted(GRID))
def test_emulate_bytes_match_reference(ref_em, name):
    """Identical samples must pack to byte-identical buffers through
    both implementations, and nativize back identically."""
    space = GRID[name]
    our_space = our_spaces.from_gymnasium(space)
    ref_dt = ref_em.dtype_from_space(space)
    our_dt = our_em.dtype_from_space(our_space)

    for seed in range(3):
        space.seed(seed)
        sample = space.sample()

        ref_struct = np.zeros(1, dtype=ref_dt)
        ref_em.emulate(ref_struct[0], sample)
        our_struct = np.zeros(1, dtype=our_dt)
        our_em.emulate(our_struct[0], sample)
        assert ref_struct.tobytes() == our_struct.tobytes(), (name, seed)

        if np.dtype(ref_dt).fields is None:
            # plain Box: no structure to reconstruct — the reference
            # never nativizes unemulated spaces (its nativize rejects
            # bare subarray dtypes)
            continue
        # reconstruct from the SHARED bytes through both nativizes
        flat = our_struct.view(np.uint8).ravel()
        ref_nat = ref_em.nativize(flat, space, ref_dt)
        our_nat = our_em.nativize(flat, our_space, our_dt)

        def leaves(x):
            if isinstance(x, dict):
                return [v for k in sorted(x) for v in leaves(x[k])]
            if isinstance(x, (tuple, list)):
                return [v for e in x for v in leaves(e)]
            return [np.asarray(x)]

        for r, o in zip(leaves(ref_nat), leaves(our_nat)):
            assert r.dtype == o.dtype and r.shape == o.shape
            assert np.array_equal(r, o), (name, seed)


def _random_space(rng, depth=0):
    """Random nested space tree (no hypothesis in-image; seeded fuzz)."""
    leaf_dtypes = [np.uint8, np.int8, np.int16, np.int32, np.float32]
    kind = rng.randint(0, 6 if depth < 2 else 2)
    if kind in (0, 1):  # Box leaf
        dtype = leaf_dtypes[rng.randint(len(leaf_dtypes))]
        ndim = rng.randint(1, 4)
        shape = tuple(int(rng.randint(1, 6)) for _ in range(ndim))
        if np.issubdtype(dtype, np.floating):
            return gymnasium.spaces.Box(-1, 1, shape, dtype)
        info = np.iinfo(dtype)
        return gymnasium.spaces.Box(info.min, info.max, shape, dtype)
    if kind < 4:  # Dict
        n = rng.randint(1, 4)
        return gymnasium.spaces.Dict({
            f'k{i}': _random_space(rng, depth + 1) for i in range(n)})
    # Tuple
    n = rng.randint(1, 4)
    return gymnasium.spaces.Tuple([
        _random_space(rng, depth + 1) for _ in range(n)])


def test_emulation_fuzz_vs_reference(ref_em):
    """Seeded fuzz over 40 random nested space trees: structured dtype
    layouts and emulate() byte packing must match the reference for
    every tree (broadens the fixed grid above)."""
    rng = np.random.RandomState(7)
    for trial in range(40):
        space = _random_space(rng)
        ref_dt = ref_em.dtype_from_space(space)
        our_dt = our_em.dtype_from_space(our_spaces.from_gymnasium(space))
        assert np.dtype(ref_dt) == np.dtype(our_dt), (trial, space)

        space.seed(trial)
        sample = space.sample()
        ref_struct = np.zeros(1, dtype=ref_dt)
        ref_em.emulate(ref_struct[0], sample)
        our_struct = np.zeros(1, dtype=our_dt)
        our_em.emulate(our_struct[0], sample)
        assert ref_struct.tobytes() == our_struct.tobytes(), (
            trial, space)
