from pufferlib_tpu.parallel.mesh import (
    make_mesh, make_mesh_2d, param_shardings, replicated, env_sharded,
    carry_shardings, batch_shardings,
)
from pufferlib_tpu.parallel.multihost import (
    global_mesh, host_sharded_batch, init_distributed,
    process_local_slice,
)

__all__ = ['make_mesh', 'make_mesh_2d', 'param_shardings', 'replicated',
    'env_sharded', 'carry_shardings', 'batch_shardings', 'global_mesh',
    'host_sharded_batch', 'init_distributed', 'process_local_slice']
