"""Train over an N-device mesh: the full trainer, two extra lines.

Run (CPU demo): XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/train_sharded.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

if jax.default_backend() not in ('tpu',):
    jax.config.update('jax_platforms', 'cpu')

import pufferlib_tpu.vector as vector
from pufferlib_tpu.models import Default, Policy
from pufferlib_tpu.ocean import env_creator
from pufferlib_tpu.parallel import make_mesh          # <- line 1
from pufferlib_tpu.training import ppo

mesh = make_mesh(len(jax.devices()))                  # <- line 2
vecenv = vector.make(env_creator('squared'), backend=vector.Device,
    num_envs=512)
policy = Policy(Default(obs_shape=vecenv.single_observation_space.shape,
    action_space=vecenv.single_action_space, hidden_size=64))
config = ppo.default_config(env='squared', batch_size=32768,
    minibatch_size=8192, bptt_horizon=8, total_timesteps=32768 * 10,
    learning_rate=0.017, data_dir='/tmp/puffer_sharded')
data = ppo.create(config, vecenv, policy, mesh=mesh)  # <- mesh=

while data.global_step < config.total_timesteps:
    ppo.step(data)
print('final stats:', data.stats)
