from pufferlib_tpu.parallel.mesh import (
    make_mesh, replicated, env_sharded, carry_shardings, batch_shardings,
)

__all__ = ['make_mesh', 'replicated', 'env_sharded', 'carry_shardings',
    'batch_shardings']
