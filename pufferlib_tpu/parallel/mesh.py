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


def make_mesh_2d(n_env, n_model, axes=('env', 'model'), devices=None):
    """2-D mesh: env/data parallelism on one axis, tensor (model)
    parallelism on the other. The reference has no model parallelism at
    all (SURVEY.md §2.4 — single-device learner); on TPU it is a mesh
    axis + param shardings, with GSPMD inserting the activation
    collectives. Keep the model axis on the minor (fastest, ICI-nearest)
    devices — its collectives are per-matmul."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[:n_env * n_model]).reshape(
        n_env, n_model)
    return Mesh(devices, axes)


def param_shardings(mesh, tree, axis='model'):
    """Tensor-parallel sharding pytree for a param (or optimizer-state)
    tree. Shape-rule based, so the same function specs optax states
    (mu/nu mirror param shapes; scalars replicate):

    - ndim >= 2 leaves: shard the last dim over `axis` when divisible
      (column-parallel); else the first dim (row-parallel — GSPMD
      inserts the psum); else replicate.
    - 1-D/0-D leaves (biases, counts): replicated — cheap, and GSPMD
      reshards the add against the sharded activations.

    If the mesh has no `axis` axis, everything replicates (pure DP).
    """
    if axis not in mesh.axis_names or mesh.shape[axis] == 1:
        repl = NamedSharding(mesh, P())
        return jax.tree.map(lambda _: repl, tree)
    k = mesh.shape[axis]

    def spec(x):
        shape = getattr(x, 'shape', ())
        if len(shape) >= 2:
            parts = [None] * len(shape)
            if shape[-1] % k == 0 and shape[-1] >= k:
                parts[-1] = axis
            elif shape[0] % k == 0 and shape[0] >= k:
                parts[0] = axis
            return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())
    return jax.tree.map(spec, tree)


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
