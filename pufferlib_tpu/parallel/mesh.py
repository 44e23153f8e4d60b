"""Device-mesh scaling: env lanes sharded over a data axis.

The reference scales with worker processes + shared memory + Ray
(vector.py:218-574); there is no learner data parallelism at all
(SURVEY.md 2.4). The TPU design shards env lanes (and therefore the
rollout batch) across a `jax.sharding.Mesh` axis and replicates params;
GSPMD inserts the gradient psum and any resharding automatically, riding
ICI within a slice and DCN across slices.

These helpers build the sharding pytrees for the trainer's carry/batch
structures so jit can be given explicit in/out shardings.
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis='env', devices=None):
    """1-D mesh over the env/data axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh):
    return NamedSharding(mesh, P())


def env_sharded(mesh, tree, axis='env', dim=0):
    """Shard every leaf of `tree` along `dim` over the mesh axis."""
    def spec(x):
        x = np.asarray(jax.eval_shape(lambda: x)) if not hasattr(
            x, 'ndim') else x
        parts = [None] * x.ndim
        parts[dim] = axis
        return NamedSharding(mesh, P(*parts))
    return jax.tree.map(spec, tree)


def carry_shardings(mesh, carry, axis='env'):
    """Sharding pytree for the trainer rollout carry dict."""
    out = {}
    out['env'] = env_sharded(mesh, carry['env'], axis, dim=0)
    out['done'] = env_sharded(mesh, carry['done'], axis, dim=0)
    out['obs'] = env_sharded(mesh, carry['obs'], axis, dim=0)
    out['keys'] = env_sharded(mesh, carry['keys'], axis, dim=0)
    if carry.get('lstm') is not None:
        out['lstm'] = env_sharded(mesh, carry['lstm'], axis, dim=1)
    else:
        out['lstm'] = None
    out['key'] = replicated(mesh)
    out['t'] = replicated(mesh)
    return out


def batch_shardings(mesh, recurrent, axis='env'):
    """Sharding pytree factory for the rollout batch dict: leaves are
    (T, N, ...) sharded on the agent axis; last_value (N,); lstm0
    (n_seg, layers, N, H)."""
    def time_major(x):
        parts = [None] * x.ndim
        if x.ndim >= 2:
            parts[1] = axis
        return NamedSharding(mesh, P(*parts))

    def build(batch):
        out = {}
        for k, v in batch.items():
            if k == 'last_value':
                out[k] = env_sharded(mesh, v, axis, dim=0)
            elif k == 'lstm0':
                out[k] = env_sharded(mesh, v, axis, dim=2)
            else:
                out[k] = jax.tree.map(time_major, v)
        return out
    return build
