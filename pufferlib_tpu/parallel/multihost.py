"""Multi-host (pod / multi-slice) helpers.

The single-host design extends to pods without code changes in the
trainer: every host runs the same program, env lanes shard over the
global 'env' mesh axis, params replicate, and GSPMD's gradient psum
rides ICI within a slice and DCN across slices (the reference scales
with Ray actors instead — vector.py:449-574).

Two host-side pieces ARE host-local and live here:

- `init_distributed()` — `jax.distributed.initialize` wrapper; call
  before any jax op on every host (coordinator from env vars or args).
- `host_sharded_batch(local, mesh)` — for HOST envs (the Atari-class
  bridge): each host simulates its own worker pool and contributes its
  local rows to a globally-sharded `jax.Array` without any cross-host
  copy (`make_array_from_process_local_data`). The fused trainer then
  consumes the global array exactly like a device-env batch.
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address=None, num_processes=None,
        process_id=None):
    """Initialize jax.distributed (no-op when already initialized or
    running single-process). Values default to the JAX_* env vars /
    TPU metadata, matching `jax.distributed.initialize` semantics."""
    # NOTE: do not touch jax.process_count()/jax.devices() here — any
    # backend query initializes the runtime and initialize() must run
    # before that
    is_init = getattr(jax.distributed, 'is_initialized', None)
    if is_init is not None and is_init():
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except (ValueError, RuntimeError) as e:
        msg = str(e).lower()
        # jax's repeated-init message is "distributed.initialize should
        # only be called once"; treat it (and any 'already initialized'
        # variant) as the documented no-op
        if 'only be called once' in msg or 'already initialized' in msg:
            return
        if coordinator_address is None:
            # single-process run (tests, one host): nothing to do
            return
        raise


def global_mesh(axis='env', devices=None):
    """1-D mesh over ALL processes' devices (jax.devices() is global
    after init_distributed)."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def host_sharded_batch(local_batch, mesh, axis='env'):
    """Per-host numpy rows -> one globally sharded jax.Array.

    local_batch: pytree of np arrays whose leading dim is this host's
    share of the global batch (global = local * process_count). Each
    host transfers only its local rows to its local devices.
    """
    def build(x):
        x = np.asarray(x)
        spec = [axis] + [None] * (x.ndim - 1)
        sharding = NamedSharding(mesh, P(*spec))
        return jax.make_array_from_process_local_data(sharding, x)
    return jax.tree.map(build, local_batch)


def process_local_slice(global_size, axis_size=None):
    """(start, stop) rows of the global batch owned by this process."""
    n = jax.process_count()
    idx = jax.process_index()
    per = global_size // n
    return idx * per, (idx + 1) * per if idx < n - 1 else global_size
