"""Minimal CleanRL-style PPO over the device vector engine — what
training.ppo automates, written out longhand for reading.

Run: python examples/cleanrl_style_ppo.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import optax

import pufferlib_tpu.vector as vector
from pufferlib_tpu.models import Default, Policy
from pufferlib_tpu.ocean import env_creator
from pufferlib_tpu.ops import compute_gae, ppo_losses
from pufferlib_tpu.vector import make_env_ops

NUM_ENVS, T, EPOCHS = 256, 64, 30
GAMMA, LAM, LR = 0.99, 0.95, 0.017

vecenv = vector.make(env_creator('squared'), backend=vector.Device,
    num_envs=NUM_ENVS)
policy = Policy(Default(obs_shape=vecenv.single_observation_space.shape,
    action_space=vecenv.single_action_space, hidden_size=64))
reset_batch, step_batch = make_env_ops(vecenv.env, vecenv.emulated)

key = jax.random.PRNGKey(0)
lane = jnp.arange(NUM_ENVS)
states, obs, dones = jax.jit(reset_batch)(
    jax.vmap(jax.random.fold_in, (None, 0))(key, lane))
params = policy.init(key, obs[:1])
tx = optax.adam(LR, eps=1e-5)
opt = tx.init(params)
keys = jax.vmap(jax.random.fold_in, (None, 0))(key, lane)


@jax.jit
def rollout(params, states, obs, dones, keys, key):
    def step(carry, _):
        states, obs, dones, keys, key = carry
        key, akey = jax.random.split(key)
        action, logprob, _, value = policy(params, obs, key=akey)
        new_keys, env_keys = jax.vmap(
            lambda k: tuple(jax.random.split(k)))(keys)
        states2, dn, obs2, rew, done, trunc, infos = step_batch(
            states, dones, action, env_keys)
        out = (obs, action, logprob, value.reshape(-1), rew,
            done.astype(jnp.float32), infos.get('score', rew * 0))
        return (states2, obs2, dn, new_keys, key), out

    (states, obs, dones, keys, key), traj = jax.lax.scan(
        step, (states, obs, dones, keys, key), None, length=T)
    last_value = policy.get_value(params, obs).reshape(-1)
    return states, obs, dones, keys, key, traj, last_value


@jax.jit
def update(params, opt, traj, last_value, key):
    o, a, lp, v, r, d, _ = traj
    adv = compute_gae(r, v, d, last_value, GAMMA, LAM)
    ret = adv + v
    flat = lambda x: x.reshape((T * NUM_ENVS,) + x.shape[2:])

    def loss_fn(p):
        _, newlp, ent, newv = policy(p, flat(o), action=flat(a))
        return ppo_losses(newlp, flat(lp), ent, newv, flat(v), flat(adv),
            flat(ret), clip_coef=0.2)

    grads, stats = jax.grad(loss_fn, has_aux=True)(params)
    updates, opt = tx.update(grads, opt)
    return optax.apply_updates(params, updates), opt, stats


for epoch in range(EPOCHS):
    states, obs, dones, keys, key, traj, last_value = rollout(
        params, states, obs, dones, keys, key)
    key, ukey = jax.random.split(key)
    params, opt, stats = update(params, opt, traj, last_value, ukey)
    score = traj[6].sum() / jnp.maximum(traj[5].sum(), 1)
    print(f'epoch {epoch:3d}  score {float(score):.3f}  '
        f'pg {float(stats["policy_loss"]):+.4f}')
