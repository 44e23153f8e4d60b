from pufferlib_tpu.training import ppo
from pufferlib_tpu.training.ppo import create, evaluate, train, close

__all__ = ['ppo', 'create', 'evaluate', 'train', 'close']
