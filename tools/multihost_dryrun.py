"""Two-process multi-host training dryrun.

Validates the REAL multi-host path end-to-end without a pod: spawns two
local processes, each with 4 virtual CPU devices, joins them with
`jax.distributed.initialize` (Gloo collectives), builds the global
8-device mesh, and trains the fused PPO program with env-lane sharding
for several epochs. The launcher then trains the identical config
single-process on 8 local devices and asserts the losses and final
params match — proving the GSPMD program is process-count invariant
(SURVEY §4: "plan single-process mesh tests"; this goes one step
beyond to 2 real processes).

Usage:
  python tools/multihost_dryrun.py              # launcher + comparison
  python tools/multihost_dryrun.py --process-id I --num-processes N \
      --port P                                  # worker (internal)
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEVICES_PER_PROC = 4
EPOCHS = 3


def train_result(mesh, epochs=EPOCHS):
    """Build the mesh-sharded trainer (identical config regardless of
    process count) and run `epochs` fused epochs."""
    import numpy as np
    import jax
    import pufferlib_tpu.vector as vector
    from pufferlib_tpu.models import Default, Policy
    from pufferlib_tpu.ocean import env_creator
    from pufferlib_tpu.training import ppo

    vecenv = vector.make(env_creator('squared'), backend=vector.Device,
        num_envs=16)
    policy = Policy(Default(
        obs_shape=vecenv.single_observation_space.shape,
        action_space=vecenv.single_action_space, hidden_size=32))
    config = ppo.default_config(env='squared', batch_size=512,
        minibatch_size=256, bptt_horizon=8, total_timesteps=10 ** 9,
        seed=7, verbose=False, data_dir='/tmp/multihost_dryrun',
        checkpoint_interval=10 ** 6)
    data = ppo.create(config, vecenv, policy, mesh=mesh)
    losses = []
    for _ in range(epochs):
        ppo.evaluate(data)
        ppo.train(data)
        losses.append(float(data.losses.policy_loss))
    checksum = float(sum(float(jax.numpy.sum(jax.numpy.abs(
        leaf.astype(jax.numpy.float32))))
        for leaf in jax.tree.leaves(data.params)))
    return {'losses': losses, 'param_checksum': checksum}


def run_worker(process_id, num_processes, port):
    os.environ['XLA_FLAGS'] = (
        f'--xla_force_host_platform_device_count={DEVICES_PER_PROC}')
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from pufferlib_tpu.parallel import global_mesh, init_distributed
    init_distributed(coordinator_address=f'localhost:{port}',
        num_processes=num_processes, process_id=process_id)
    assert jax.process_count() == num_processes, 'distributed init failed'
    assert len(jax.devices()) == num_processes * DEVICES_PER_PROC
    mesh = global_mesh('env')
    result = train_result(mesh)
    result['process_id'] = process_id
    result['process_count'] = jax.process_count()
    print('RESULT ' + json.dumps(result), flush=True)


def run_single():
    os.environ['XLA_FLAGS'] = (
        f'--xla_force_host_platform_device_count={2 * DEVICES_PER_PROC}')
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from pufferlib_tpu.parallel import global_mesh
    result = train_result(global_mesh('env'))
    print('RESULT ' + json.dumps(result), flush=True)


def _extract(output):
    for line in output.splitlines():
        if line.startswith('RESULT '):
            return json.loads(line[len('RESULT '):])
    raise RuntimeError(f'no RESULT line in output:\n{output}')


def launch(port=29791):
    env = {k: v for k, v in os.environ.items() if k != 'XLA_FLAGS'}
    workers = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), '--process-id',
         str(i), '--num-processes', '2', '--port', str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for i in range(2)]
    outs = [w.communicate(timeout=600)[0] for w in workers]
    for w, out in zip(workers, outs):
        if w.returncode != 0:
            raise RuntimeError(f'worker failed:\n{out}')
    multi = [_extract(o) for o in outs]

    single_proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), '--single'],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    if single_proc.returncode != 0:
        raise RuntimeError(f'single failed:\n{single_proc.stdout}'
            f'\n{single_proc.stderr}')
    single = _extract(single_proc.stdout)

    assert multi[0]['process_count'] == 2
    # both workers see the same replicated result
    assert multi[0]['losses'] == multi[1]['losses'], (multi[0], multi[1])
    # 2-process result matches single-process (same global mesh program)
    for a, b in zip(multi[0]['losses'], single['losses']):
        assert abs(a - b) < 1e-4, (multi[0]['losses'], single['losses'])
    rel = abs(multi[0]['param_checksum'] - single['param_checksum']) \
        / max(abs(single['param_checksum']), 1e-9)
    assert rel < 1e-4, (multi[0]['param_checksum'],
        single['param_checksum'])
    print(json.dumps({
        'multihost_dryrun': 'OK',
        'processes': 2,
        'devices': 2 * DEVICES_PER_PROC,
        'losses_2proc': multi[0]['losses'],
        'losses_1proc': single['losses'],
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--process-id', type=int, default=None)
    ap.add_argument('--num-processes', type=int, default=2)
    ap.add_argument('--port', type=int, default=29791)
    ap.add_argument('--single', action='store_true')
    args = ap.parse_args()
    if args.single:
        run_single()
    elif args.process_id is not None:
        run_worker(args.process_id, args.num_processes, args.port)
    else:
        launch(args.port)


if __name__ == '__main__':
    main()
