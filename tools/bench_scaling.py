"""Mesh scaling-efficiency harness.

Analog of the reference's envpool sweep (tests/pool/test_envpool.py:91-133)
for the TPU design: run the fused PPO step over 1/2/4/8-device meshes
with envs sharded on the 'env' axis and report SPS + scaling efficiency.

On this box there is one real TPU chip, so the default run uses N
virtual CPU devices (xla_force_host_platform_device_count) — the numbers
validate that the sharded program scales structurally (no hidden
serialization), not absolute TPU throughput. On a real pod slice the
same script runs unchanged with JAX_PLATFORMS unset.

Usage: python tools/bench_scaling.py [--devices 1 2 4 8] [--envs-per-dev 512]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--devices', type=int, nargs='+', default=[1, 2, 4, 8])
    ap.add_argument('--envs-per-dev', type=int, default=512)
    ap.add_argument('--horizon', type=int, default=32)
    ap.add_argument('--hidden', type=int, default=128)
    ap.add_argument('--epochs', type=int, default=10)
    ap.add_argument('--cpu', action='store_true', default=None,
        help='force the virtual CPU mesh (default when < max devices)')
    ap.add_argument('--out', default=None,
        help='also write the full per-device results to this JSON file')
    args = ap.parse_args()

    max_dev = max(args.devices)
    flags = os.environ.get('XLA_FLAGS', '')
    if 'host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + f' --xla_force_host_platform_device_count={max_dev}'
        ).strip()
    import jax
    if args.cpu is not False and len(jax.devices()) < max_dev:
        jax.config.update('jax_platforms', 'cpu')

    import jax.numpy as jnp
    import pufferlib_tpu.vector as vector
    from pufferlib_tpu.models import Default, Policy
    from pufferlib_tpu.ocean import env_creator
    from pufferlib_tpu.parallel import make_mesh
    from pufferlib_tpu.training import ppo

    results = []
    base_sps = None
    for n in args.devices:
        mesh = make_mesh(n)
        num_envs = args.envs_per_dev * n
        batch = num_envs * args.horizon
        vecenv = vector.make(env_creator('squared'),
            env_kwargs=dict(distance_to_target=3, num_targets=1),
            backend=vector.Device, num_envs=num_envs)
        policy = Policy(Default(
            obs_shape=vecenv.single_observation_space.shape,
            action_space=vecenv.single_action_space,
            hidden_size=args.hidden))
        config = ppo.default_config(env='squared', batch_size=batch,
            minibatch_size=batch // 4, bptt_horizon=16,
            total_timesteps=batch * 10**6, anneal_lr=False, verbose=False,
            data_dir='/tmp/puffer_scaling', checkpoint_interval=10**6)
        data = ppo.create(config, vecenv, policy, mesh=mesh)

        p, o, c = data.params, data.opt_state, dict(data.carry)
        p, o, c, st, i2, cn = data.step_fn(p, o, c)
        _ = float(st['policy_loss'])
        t0 = time.perf_counter()
        for _ in range(args.epochs):
            p, o, c, st, i2, cn = data.step_fn(p, o, c)
        _ = float(st['policy_loss'])
        dt = (time.perf_counter() - t0) / args.epochs
        sps = batch / dt
        if base_sps is None:
            base_sps = sps
        eff = sps / (base_sps * n)
        results.append(dict(devices=n, num_envs=num_envs,
            sps=round(sps, 1), scaling_efficiency=round(eff, 4)))
        print(json.dumps(results[-1]))

    if args.out:
        with open(args.out, 'w') as f:
            json.dump({'envs_per_dev': args.envs_per_dev,
                'horizon': args.horizon, 'hidden': args.hidden,
                'epochs': args.epochs, 'results': results}, f, indent=1)

    print(json.dumps({
        'metric': 'scaling_efficiency_max_mesh',
        'value': results[-1]['scaling_efficiency'],
        'unit': 'x', 'devices': results[-1]['devices']}))


if __name__ == '__main__':
    main()
