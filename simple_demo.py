"""Smallest end-to-end training script (reference simple_demo.py).

python simple_demo.py            # trains PPO on squared, prints score
"""
import pufferlib_tpu.vector as vector
from pufferlib_tpu.models import Default, Policy
from pufferlib_tpu.ocean import env_creator
from pufferlib_tpu.training import ppo

vecenv = vector.make(env_creator('squared'), backend=vector.Device,
    num_envs=256)
policy = Policy(Default(obs_shape=vecenv.single_observation_space.shape,
    action_space=vecenv.single_action_space, hidden_size=128))
config = ppo.default_config(env='squared', batch_size=16384,
    minibatch_size=4096, bptt_horizon=8, total_timesteps=16384 * 15,
    learning_rate=0.017)
data = ppo.create(config, vecenv, policy)
while data.global_step < config.total_timesteps:
    ppo.step(data)
ppo.close(data)
