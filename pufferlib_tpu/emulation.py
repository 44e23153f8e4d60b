"""Space emulation: nested obs/action spaces <-> flat fixed-dtype arrays.

The reference does this at runtime per step with Cython copies
(pufferlib/emulation.py:16-121, extensions.pyx). Here the same
structured-dtype metadata is computed once on the host, and under jit the
flatten/unflatten becomes free slicing + bitcasts that XLA folds away —
zero runtime cost on TPU.

Contracts mirrored (file:line are reference citations):
- dtype_from_space     emulation.py:68-80   (align=True, tuple fields f0..fN)
- flatten_space        emulation.py:82-94
- emulate_observation_space  emulation.py:96-112 (flat Box of common leaf
  dtype, or uint8 bytes when leaves disagree)
- emulate_action_space emulation.py:114-121 (MultiDiscrete of leaf .n)
- nativize_dtype/_nativize_tensor  pytorch.py:48-145 (offset/shape specs,
  alignment-rounded byte offsets)
- emulate/nativize     emulation.py:16-61   (numpy host versions)
"""
import os

import numpy as np

from pufferlib_tpu import spaces
from pufferlib_tpu.namespace import namespace


def _check_int64_fits(ok):
    if not bool(ok):
        raise ValueError(
            'int64 obs leaf holds values outside 32-bit range; enable '
            'jax_enable_x64 or keep env values within int32')


# --------------------------------------------------------------------------
# Structured dtype metadata (host-side, trace time)

def dtype_from_space(space):
    """Build a numpy structured dtype mirroring the nested space.

    Tuple fields are named f0..fN; align=True so offsets match C structs.
    """
    if isinstance(space, spaces.Tuple):
        dtype = [(f'f{i}', dtype_from_space(elem))
            for i, elem in enumerate(space)]
    elif isinstance(space, spaces.Dict):
        dtype = [(k, dtype_from_space(v)) for k, v in space.items()]
    elif isinstance(space, (spaces.Discrete,)):
        dtype = (space.dtype, ())
    else:
        dtype = (space.dtype, space.shape)
    return np.dtype(dtype, align=True)


def flatten_space(space):
    """Depth-first list of leaf spaces."""
    if isinstance(space, spaces.Tuple):
        leaves = []
        for e in space:
            leaves.extend(flatten_space(e))
        return leaves
    if isinstance(space, spaces.Dict):
        leaves = []
        for e in space.values():
            leaves.extend(flatten_space(e))
        return leaves
    return [space]


def _dtype_bounds(dtype):
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        return info.min, info.max
    info = np.finfo(dtype)
    return info.min, info.max


def emulate_observation_space(space):
    """Nested space -> (flat Box, structured dtype).

    A Box passes through unchanged. Otherwise the flat space uses the
    common leaf dtype, or raw uint8 bytes when leaves disagree.
    """
    emulated_dtype = dtype_from_space(space)
    if isinstance(space, spaces.Box):
        return space, emulated_dtype

    leaves = flatten_space(space)
    dtypes = [np.dtype(leaf.dtype) for leaf in leaves]
    if all(d == dtypes[0] for d in dtypes):
        dtype = dtypes[0]
    else:
        dtype = np.dtype(np.uint8)

    mmin, mmax = _dtype_bounds(dtype)
    numel = emulated_dtype.itemsize // dtype.itemsize
    flat = spaces.Box(low=mmin, high=mmax, shape=(numel,), dtype=dtype)
    return flat, emulated_dtype


def emulate_action_space(space):
    """Nested action space -> (MultiDiscrete of leaf cardinalities, dtype).

    Continuous (Box) action spaces cannot be emulated to MultiDiscrete;
    discretize first (see environments/dm_control for the pattern)."""
    if isinstance(space, (spaces.Discrete, spaces.MultiDiscrete)):
        return space, space.dtype
    emulated_dtype = dtype_from_space(space)
    leaves = flatten_space(space)
    nvec = []
    for leaf in leaves:
        if hasattr(leaf, 'nvec'):  # MultiDiscrete leaf
            nvec.extend(int(n) for n in leaf.nvec)
        elif hasattr(leaf, 'n'):   # Discrete / MultiBinary leaf
            if type(leaf).__name__ == 'MultiBinary':
                nvec.extend([2] * int(leaf.n))
            else:
                nvec.append(int(leaf.n))
        else:
            raise ValueError(
                'Continuous (Box) action spaces cannot be emulated; '
                'discretize them first (see environments/dm_control)')
    flat = spaces.MultiDiscrete(nvec)
    return flat, emulated_dtype


def is_emulated(space):
    """True when the flat space differs from the native space."""
    flat, _ = emulate_observation_space(space)
    return flat is not space


# --------------------------------------------------------------------------
# Numpy host-side pack/unpack (for the external-env bridge)

def emulate(struct, sample):
    """Copy a nested dict/tuple sample into a structured-array view.
    Assignment goes through the parent field (struct[key] = value):
    indexing a scalar field of a void scalar returns a COPY, so writing
    into it would silently not propagate (and raises for 0-d)."""
    if isinstance(sample, dict):
        for k, v in sample.items():
            if isinstance(v, (dict, tuple, list)):
                emulate(struct[k], v)
            else:
                struct[k] = v
    elif isinstance(sample, (tuple, list)):
        for i, v in enumerate(sample):
            if isinstance(v, (dict, tuple, list)):
                emulate(struct[f'f{i}'], v)
            else:
                struct[f'f{i}'] = v
    else:
        struct[()] = sample


def make_buffer(arr_dtype, struct_dtype, n=None):
    """Allocate paired (flat array view, structured view) buffers."""
    struct = np.zeros(1 if n is None else n, dtype=struct_dtype)
    arr = struct.view(arr_dtype)
    if n is None:
        arr = arr.ravel()
    else:
        arr = arr.reshape(n, -1)
    return arr, struct


def _nativize_np(struct, space):
    if isinstance(space, spaces.Discrete):
        return struct.item()
    if isinstance(space, spaces.Tuple):
        return tuple(_nativize_np(struct[f'f{i}'], e)
            for i, e in enumerate(space))
    if isinstance(space, spaces.Dict):
        return {k: _nativize_np(struct[k], v) for k, v in space.items()}
    return struct


def nativize(arr, space, struct_dtype):
    """View a flat numpy array back as the native nested sample."""
    struct = np.asarray(arr).view(struct_dtype)[0]
    return _nativize_np(struct, space)


def nativize_multidiscrete(action, space):
    """Unpack a flat MultiDiscrete action vector into the nested action
    space it emulates (one component per Discrete leaf, depth-first —
    inverse of emulate_action_space). Host-side numpy."""
    flat = np.asarray(action).ravel()
    pos = [0]

    def build(sp):
        if isinstance(sp, spaces.Discrete):
            value = int(flat[pos[0]])
            pos[0] += 1
            return value
        if isinstance(sp, spaces.MultiBinary):
            values = flat[pos[0]:pos[0] + int(sp.n)]
            pos[0] += int(sp.n)
            return np.asarray(values, dtype=sp.dtype)
        if isinstance(sp, spaces.MultiDiscrete):
            k = len(sp.nvec)
            values = flat[pos[0]:pos[0] + k]
            pos[0] += k
            return np.asarray(values, dtype=sp.dtype)
        if isinstance(sp, spaces.Dict):
            return {k: build(v) for k, v in sp.items()}
        if isinstance(sp, spaces.Tuple):
            return tuple(build(s) for s in sp)
        raise ValueError(
            f'Nested action spaces must have Discrete leaves, got {sp}')

    return build(space)


# --------------------------------------------------------------------------
# Trace-time nativize specs (the analog of pytorch.py:48-98)

def _round_to(x, base):
    return int(base * np.ceil(x / base))


def nativize_dtype(emulated):
    """Compute the flat-offset spec tree for reconstructing structured obs.

    emulated: namespace with .observation_dtype (the flat sample dtype) and
    .emulated_observation_dtype (the structured dtype). Returns either a
    leaf spec (np_dtype, shape, offset, delta) or a nested dict of specs.
    Offsets/deltas are in bytes when the sample dtype is single-byte, else
    in elements of the (uniform) sample dtype.
    """
    sample_dtype = np.dtype(emulated.observation_dtype)
    structured_dtype = np.dtype(emulated.emulated_observation_dtype)
    subviews, dtype, shape, offset, delta = _nativize_dtype(
        sample_dtype, structured_dtype)
    if subviews is None:
        return (dtype, shape, offset, delta)
    return subviews


def _nativize_dtype(sample_dtype, structured_dtype, byte_offset=0):
    """Offsets come from numpy's OWN field layout (dtype.fields carries
    each field's byte offset), so nested-struct tail padding under
    align=True is honored exactly — accumulating deltas by hand would
    mis-place every field after a padded inner struct."""
    if structured_dtype.fields is None:
        if structured_dtype.subdtype is not None:
            dtype, shape = structured_dtype.subdtype
        else:
            dtype = structured_dtype
            shape = (1,)

        delta = int(np.prod(shape))
        if sample_dtype.base.itemsize == 1:
            offset = byte_offset
            delta *= dtype.itemsize
        else:
            assert dtype.itemsize == sample_dtype.base.itemsize, (
                'mixed-dtype spaces must emulate to bytes')
            assert byte_offset % sample_dtype.base.itemsize == 0
            offset = byte_offset // sample_dtype.base.itemsize
        return None, np.dtype(dtype), tuple(shape), offset, delta

    subviews = {}
    for name, finfo in structured_dtype.fields.items():
        field_dtype, field_off = finfo[0], finfo[1]
        views, dtype, shape, offset, delta = _nativize_dtype(
            sample_dtype, field_dtype, byte_offset + field_off)
        if views is not None:
            subviews[name] = views
        else:
            subviews[name] = (dtype, shape, offset, delta)
    return subviews, dtype, shape, byte_offset, structured_dtype.itemsize


# --------------------------------------------------------------------------
# JAX nativize/emulate under jit (free under XLA fusion)

def nativize_tensor(observation, native_dtype):
    """Reconstruct structured obs from a flat batch under jit.

    observation: jax array (B, numel) of the flat sample dtype.
    native_dtype: spec from nativize_dtype. Returns a (possibly nested
    dict) pytree of (B, *shape) arrays. Pure slicing + bitcasts.
    """
    import jax.numpy as jnp
    from jax import lax

    if isinstance(native_dtype, tuple):
        dtype, shape, offset, delta = native_dtype
        dtype = np.dtype(dtype)
        import jax
        if dtype.itemsize == 8 and not jax.config.jax_enable_x64:
            # 64-bit leaves without x64 mode: reconstruct from the low
            # 32-bit word (little-endian). Values must fit 32 bits —
            # true for the NetHack/NMMO-class spaces that use i64.
            # PUFFER_CHECK_INT64=1 inserts a runtime guard that the high
            # word is the sign extension of the low word (debug only —
            # the host callback syncs the device).
            if dtype.kind not in 'iu':
                raise ValueError(
                    f'float64 obs leaf requires jax_enable_x64 ({dtype})')
            dtype32 = np.dtype('int32' if dtype.kind == 'i' else 'uint32')
            chunk = lax.slice_in_dim(
                observation, offset, offset + delta, axis=1)
            n = delta // 8
            chunk = chunk.reshape(observation.shape[0], n, 2, 4)
            chunk = lax.bitcast_convert_type(chunk, jnp.dtype(dtype32))
            low = chunk[..., 0]
            if os.environ.get('PUFFER_CHECK_INT64'):
                high = chunk[..., 1]
                expect = (low.astype(jnp.int32) >> 31).astype(high.dtype) \
                    if dtype.kind == 'i' else jnp.zeros_like(high)
                jax.debug.callback(_check_int64_fits, jnp.all(
                    high == expect), ordered=False)
            return low.reshape(observation.shape[0], *shape)
        chunk = lax.slice_in_dim(observation, offset, offset + delta, axis=1)
        if observation.dtype.itemsize == 1 and dtype.itemsize != 1:
            # bytes -> typed: group trailing bytes then bitcast away the
            # itemsize axis (little-endian, matching TPU/host layout)
            n = delta // dtype.itemsize
            chunk = chunk.reshape(observation.shape[0], n, dtype.itemsize)
            chunk = lax.bitcast_convert_type(chunk, jnp.dtype(dtype))
        elif chunk.dtype != jnp.dtype(dtype):
            chunk = lax.bitcast_convert_type(chunk, jnp.dtype(dtype))
        return chunk.reshape(observation.shape[0], *shape)

    return {name: nativize_tensor(observation, sub)
        for name, sub in native_dtype.items()}


def emulate_tensor(sample, emulated):
    """Flatten a structured obs pytree into the flat batch under jit.

    Inverse of nativize_tensor: returns (B, numel) of the flat dtype.
    """
    import jax.numpy as jnp
    from jax import lax

    sample_dtype = np.dtype(emulated.observation_dtype)
    spec = nativize_dtype(emulated)
    flat, _ = emulate_observation_space_from_dtype(
        emulated.emulated_observation_dtype, sample_dtype)
    numel = flat

    def leaf_bytes(leaf, leaf_spec):
        dtype, shape, offset, delta = leaf_spec
        batch = leaf.shape[0]
        leaf = leaf.reshape(batch, -1).astype(jnp.dtype(dtype))
        if sample_dtype.itemsize == 1 and dtype.itemsize != 1:
            leaf = lax.bitcast_convert_type(leaf, jnp.uint8)
            leaf = leaf.reshape(batch, -1)
        return offset, leaf

    pieces = []
    def collect(spec_node):
        if isinstance(spec_node, tuple):
            pieces.append(spec_node)
        else:
            for sub in spec_node.values():
                collect(sub)
    collect(spec)

    leaves = []
    def collect_leaves(node):
        if isinstance(node, dict):
            for key in node:
                collect_leaves(node[key])
        elif isinstance(node, (tuple, list)) and not hasattr(node, 'shape'):
            for item in node:
                collect_leaves(item)
        else:
            leaves.append(node)
    collect_leaves(sample)

    assert len(leaves) == len(pieces), 'sample does not match spec'
    batch = leaves[0].shape[0]
    out = jnp.zeros((batch, numel), dtype=jnp.dtype(sample_dtype))
    for leaf, leaf_spec in zip(leaves, pieces):
        offset, data = leaf_bytes(leaf, leaf_spec)
        out = lax.dynamic_update_slice_in_dim(out, data, offset, axis=1)
    return out


def emulate_observation_space_from_dtype(struct_dtype, sample_dtype):
    """numel of the flat representation for a structured dtype."""
    numel = np.dtype(struct_dtype).itemsize // np.dtype(sample_dtype).itemsize
    return numel, sample_dtype


def make_emulated(observation_space):
    """Convenience: namespace carrying the flat + structured dtypes
    (the analog of GymnasiumPufferEnv.emulated, emulation.py:144-147)."""
    flat, struct_dtype = emulate_observation_space(observation_space)
    return namespace(
        observation_dtype=np.dtype(flat.dtype),
        emulated_observation_dtype=struct_dtype,
    )
