from pufferlib_tpu.ops.gae import compute_gae, compute_gae_flat
from pufferlib_tpu.ops.losses import ppo_losses

__all__ = ['compute_gae', 'compute_gae_flat', 'ppo_losses']
