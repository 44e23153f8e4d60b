from pufferlib_tpu.ops.pallas.gae import compute_gae_pallas

__all__ = ['compute_gae_pallas']
