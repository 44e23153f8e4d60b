"""Validate an LSTM kernel change ON THE REAL TPU: (1) numerics — one
fused train step's losses are finite; (2) learning — squared+LSTM
reaches score > 0.9; (3) kernel timing fwd+bwd at bench shapes.

Run after every ops/pallas/lstm.py change before trusting bench.py
(axon runtime: end every timed region with a value fetch).

    python tools/validate_lstm_tpu.py            # default (enc5) kernel
    PUFFER_LSTM_KERNEL=cat python tools/validate_lstm_tpu.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import pufferlib_tpu.vector as vector
    from pufferlib_tpu.models import (
        Default, LSTMWrapper, RecurrentPolicy)
    from pufferlib_tpu.ocean import env_creator
    from pufferlib_tpu.training import ppo

    kernel = os.environ.get('PUFFER_LSTM_KERNEL', 'enc5')
    print(f'kernel={kernel} backend={jax.default_backend()}')

    # --- kernel micro-timing at bench shapes -------------------------
    from pufferlib_tpu.ops.pallas.lstm import lstm_scan, lstm_scan_fused
    T, B, D, H = 16, 8192, 128, 128
    k = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(k[0], (T, B, D), jnp.bfloat16)
    xp = jax.random.normal(k[1], (T, B, 4 * H), jnp.bfloat16)
    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)
    wih = jax.random.normal(k[2], (D, 4 * H), jnp.float32) * 0.1
    whh = jax.random.normal(k[3], (H, 4 * H), jnp.float32) * 0.1
    b = jnp.zeros((4 * H,), jnp.float32)

    def loss_fused(x, wih, whh, b):
        o, h, c = lstm_scan_fused(x, h0, c0, wih, whh, b, jnp.bfloat16)
        return jnp.sum(o.astype(jnp.float32) ** 2) + jnp.sum(h * c)

    def loss_xp(xp, whh):
        o, h, c = lstm_scan(xp, h0, c0, whh, jnp.bfloat16)
        return jnp.sum(o.astype(jnp.float32) ** 2) + jnp.sum(h * c)

    for name, fn, args in (
            ('fused fwd+bwd', jax.jit(jax.grad(loss_fused,
                argnums=(0, 1, 2, 3))), (x, wih, whh, b)),
            ('xp    fwd+bwd', jax.jit(jax.grad(loss_xp,
                argnums=(0, 1))), (xp, whh)),
    ):
        out = fn(*args)  # compile
        float(jnp.sum(out[0].astype(jnp.float32)))
        reps = 30
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(jnp.sum(out[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f'{name}: {dt:.3f} ms ({T}x{B}x{H})')

    # --- learning proof ---------------------------------------------
    num_envs, horizon = 1024, 64
    batch = num_envs * horizon
    vecenv = vector.make(env_creator('squared'),
        env_kwargs=dict(distance_to_target=3, num_targets=1),
        backend=vector.Device, num_envs=num_envs)
    obs_shape = vecenv.single_observation_space.shape
    module = Default(obs_shape=obs_shape,
        action_space=vecenv.single_action_space, hidden_size=128,
        dtype=jnp.bfloat16)
    policy = RecurrentPolicy(LSTMWrapper(policy=module,
        obs_shape=obs_shape, input_size=128, hidden_size=128,
        dtype=jnp.bfloat16))
    config = ppo.default_config(env='squared', batch_size=batch,
        minibatch_size=batch // 4, bptt_horizon=16,
        learning_rate=0.015, total_timesteps=batch * 40,
        obs_store_dtype='bfloat16', verbose=False,
        data_dir='/tmp/val_lstm', checkpoint_interval=10 ** 6)
    data = ppo.create(config, vecenv, policy)
    while data.global_step < config.total_timesteps:
        ppo.step(data)
    score = data.stats.get('score', float('nan'))
    loss = data.losses.policy_loss
    print(f'learning: score={score:.4f} policy_loss={loss:.4f} '
        f'({data.global_step} steps)')
    assert np.isfinite(loss)
    assert score > 0.9, f'LSTM learning regressed: score={score}'
    print('VALIDATION OK')


if __name__ == '__main__':
    main()
