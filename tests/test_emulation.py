"""Emulation layer contracts, mirroring reference tests/test_pytorch.py
(nativize_dtype offset/shape specs) and tests/test.py round-trips."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pufferlib_tpu import emulation, spaces


def test_dtype_from_space_box():
    space = spaces.Box(low=0, high=1, shape=(3, 4), dtype=np.float32)
    dtype = emulation.dtype_from_space(space)
    assert dtype.subdtype is not None or dtype.shape == (3, 4)
    assert dtype.base == np.float32 or dtype.subdtype[0] == np.float32


def test_dtype_from_space_nested():
    space = spaces.Dict({
        'image': spaces.Box(low=0, high=1, shape=(5, 5), dtype=np.float32),
        'flat': spaces.Box(low=0, high=1, shape=(5,), dtype=np.int8),
    })
    dtype = emulation.dtype_from_space(space)
    assert set(dtype.fields) == {'image', 'flat'}


def test_emulate_observation_space_box_passthrough():
    space = spaces.Box(low=0, high=1, shape=(7,), dtype=np.float32)
    flat, _ = emulation.emulate_observation_space(space)
    assert flat is space


def test_emulate_observation_space_uniform_dtype():
    space = spaces.Dict({
        'a': spaces.Box(low=0, high=1, shape=(3,), dtype=np.float32),
        'b': spaces.Box(low=0, high=1, shape=(2,), dtype=np.float32),
    })
    flat, struct = emulation.emulate_observation_space(space)
    assert flat.dtype == np.float32
    assert flat.shape == (5,)


def test_emulate_observation_space_mixed_dtype_bytes():
    space = spaces.Dict({
        'image': spaces.Box(low=0, high=1, shape=(5, 5), dtype=np.float32),
        'flat': spaces.Box(low=0, high=1, shape=(5,), dtype=np.int8),
    })
    flat, struct = emulation.emulate_observation_space(space)
    assert flat.dtype == np.uint8
    assert flat.shape == (struct.itemsize,)


def test_emulate_action_space():
    space = spaces.Dict({
        'image': spaces.Discrete(2),
        'flat': spaces.Discrete(3),
    })
    flat, _ = emulation.emulate_action_space(space)
    assert isinstance(flat, spaces.MultiDiscrete)
    assert sorted(flat.nvec.tolist()) == [2, 3]


def test_discrete_action_passthrough():
    space = spaces.Discrete(5)
    flat, _ = emulation.emulate_action_space(space)
    assert flat is space


def test_nativize_dtype_offsets_uniform():
    space = spaces.Dict({
        'a': spaces.Box(low=0, high=1, shape=(3,), dtype=np.float32),
        'b': spaces.Box(low=0, high=1, shape=(2,), dtype=np.float32),
    })
    flat, struct = emulation.emulate_observation_space(space)
    emulated = emulation.make_emulated(space)
    spec = emulation.nativize_dtype(emulated)
    # elements (not bytes) since the sample dtype is f32
    assert spec['a'][1] == (3,)
    assert spec['b'][1] == (2,)
    offsets = sorted((v[2], k) for k, v in spec.items())
    assert offsets[0][0] == 0


def test_nativize_dtype_offsets_bytes_aligned():
    space = spaces.Dict({
        'flat': spaces.Box(low=0, high=1, shape=(5,), dtype=np.int8),
        'image': spaces.Box(low=0, high=1, shape=(5, 5), dtype=np.float32),
    })
    emulated = emulation.make_emulated(space)
    spec = emulation.nativize_dtype(emulated)
    # flat (5 int8 bytes) then image must be 4-aligned
    assert spec['flat'][2] == 0 and spec['flat'][3] == 5
    assert spec['image'][2] % 4 == 0
    assert spec['image'][3] == 100


def test_numpy_roundtrip_matches_structured_view():
    space = spaces.Dict({
        'flat': spaces.Box(low=-100, high=100, shape=(5,), dtype=np.int8),
        'image': spaces.Box(low=0, high=1, shape=(5, 5), dtype=np.float32),
    })
    flat_space, struct_dtype = emulation.emulate_observation_space(space)
    rng = np.random.RandomState(0)
    sample = space.sample(rng)

    arr, struct = emulation.make_buffer(flat_space.dtype, struct_dtype)
    emulation.emulate(struct[0], sample)
    back = emulation.nativize(arr, space, struct_dtype)
    assert np.array_equal(back['image'], sample['image'])
    assert np.array_equal(back['flat'], sample['flat'])


def test_jax_nativize_matches_numpy():
    """The jit nativize must agree with the numpy structured view."""
    space = spaces.Dict({
        'flat': spaces.Box(low=-100, high=100, shape=(5,), dtype=np.int8),
        'image': spaces.Box(low=0, high=1, shape=(5, 5), dtype=np.float32),
    })
    flat_space, struct_dtype = emulation.emulate_observation_space(space)
    emulated = emulation.make_emulated(space)
    spec = emulation.nativize_dtype(emulated)

    rng = np.random.RandomState(1)
    batch = []
    samples = []
    for _ in range(4):
        sample = space.sample(rng)
        samples.append(sample)
        arr, struct = emulation.make_buffer(flat_space.dtype, struct_dtype)
        emulation.emulate(struct[0], sample)
        batch.append(arr.copy())
    batch = jnp.asarray(np.stack(batch))

    out = jax.jit(lambda x: emulation.nativize_tensor(x, spec))(batch)
    for i, sample in enumerate(samples):
        assert np.array_equal(np.asarray(out['image'][i]), sample['image'])
        assert np.array_equal(np.asarray(out['flat'][i]), sample['flat'])


def test_jax_nativize_uniform_dtype():
    space = spaces.Tuple([
        spaces.Box(low=0, high=1, shape=(3,), dtype=np.float32),
        spaces.Box(low=0, high=1, shape=(2, 2), dtype=np.float32),
    ])
    flat_space, struct_dtype = emulation.emulate_observation_space(space)
    emulated = emulation.make_emulated(space)
    spec = emulation.nativize_dtype(emulated)

    rng = np.random.RandomState(2)
    sample = space.sample(rng)
    arr, struct = emulation.make_buffer(flat_space.dtype, struct_dtype)
    emulation.emulate(struct[0], sample)

    out = emulation.nativize_tensor(jnp.asarray(arr)[None], spec)
    assert np.allclose(np.asarray(out['f0'][0]), sample[0])
    assert np.allclose(np.asarray(out['f1'][0]), sample[1])


def test_nested_struct_padding_offsets():
    """Fields after a tail-padded inner struct decode from numpy's OWN
    byte offsets (regression: hand-accumulated offsets read garbage)."""
    import jax.numpy as jnp
    space = spaces.Dict({
        'a': spaces.Dict({
            'c': spaces.Box(low=0, high=1, shape=(1,), dtype=np.float32),
            'd': spaces.Box(low=0, high=255, shape=(1,), dtype=np.uint8)}),
        'z': spaces.Box(low=0, high=255, shape=(2,), dtype=np.uint8),
    })
    flat, struct = emulation.emulate_observation_space(space)
    em = emulation.make_emulated(space)
    sample = {'a': {'c': np.array([0.5], np.float32),
        'd': np.array([7], np.uint8)}, 'z': np.array([11, 22], np.uint8)}
    buf, view = emulation.make_buffer(np.dtype(flat.dtype), struct)
    emulation.emulate(view[0], sample)
    spec = emulation.nativize_dtype(em)
    nat = emulation.nativize_tensor(jnp.asarray(buf).reshape(1, -1), spec)
    assert np.asarray(nat['z']).ravel().tolist() == [11, 22]
    assert float(np.asarray(nat['a']['c'])) == 0.5
    assert int(np.asarray(nat['a']['d'])) == 7


def test_emulate_scalar_discrete_leaf():
    """Discrete leaves (scalar struct fields) survive the emulate
    round-trip (regression: scalar field assignment wrote to a copy)."""
    space = spaces.Dict({
        'd': spaces.Discrete(5),
        'b': spaces.Box(low=0, high=1, shape=(2,), dtype=np.int64),
    })
    flat, struct = emulation.emulate_observation_space(space)
    buf, view = emulation.make_buffer(np.dtype(flat.dtype), struct)
    emulation.emulate(view[0], {'d': 4, 'b': np.array([1, 0], np.int64)})
    back = emulation.nativize(buf, space, struct)
    assert back['d'] == 4
    assert list(back['b']) == [1, 0]


def test_box_action_space_clear_error():
    import pytest
    with pytest.raises(ValueError, match='discretize'):
        emulation.emulate_action_space(spaces.Dict({
            'move': spaces.Box(low=-1, high=1, shape=(2,)),
        }))
