"""Reference-with-envpool trainer h2h (VERDICT r4 missing #1).

The committed trainer h2h (docs/PARITY.md) pinned the reference to its
Serial backend; the reference's flagship configuration is the trainer
on its Multiprocessing envpool (reference vector.py:218-447, tuned
configs config.yaml:121-141 / ocean num_workers=2). This tool gives
the reference that best foot and records what it is worth on this box,
in two parts:

1. LOCKSTEP: with env_batch_size == num_envs (the tuned sync configs
   used in the h2h), the reference's Multiprocessing pool delivers the
   SAME transition stream as Serial — vector.make seeds env i as
   seed+i regardless of backend (reference vector.py:639-641), so the
   learning-curve tails in docs/PARITY.md are backend-invariant by
   construction. This part PROVES it for cartpole: both backends step
   the same seeded envs with the same action sequence for 200 steps
   and the obs/reward/done streams must match bit-for-bit. That
   settles the "does the envpool change the learning h2h?" question
   without re-running the full matrix through a transport that only
   changes timing.

   Scope caveat: the reference's OCEAN envs draw from the
   process-global np.random (reference ocean.py:39-42, :92), so their
   stream depends on how envs are partitioned across worker processes
   — a property of the reference's env design, not of either vector
   backend. For those envs Serial-vs-Multiprocessing is identically
   distributed but not bitwise equal (measured: squared diverges at
   the first in-episode np.random draw); gymnasium envs carry per-env
   RNG and lockstep exactly.

2. SPS: end-to-end trainer throughput (clean_pufferl.evaluate+train)
   with the reference on Serial vs Multiprocessing (tuned workers),
   and the repo's trainer on the same env, same short budget. This is
   where the backends actually differ.

Box caveat (must travel with the numbers): this host has ONE CPU core.
The reference pool's spin-wait driver+workers oversubscribe it, so
Multiprocessing SPS here is far BELOW its 24-core-rig potential — but
also far below its own Serial backend, which is why the committed h2h
ran the reference on Serial (its best foot ON THIS BOX) in the first
place. docs/h2h_envpool.json carries the same-box envpool-vs-envpool
comparison where the repo's pool wins all 64 grid points.

Usage: python tools/bench_ref_backend.py [--steps 65536]
Writes docs/h2h_ref_backend.json.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import head_to_head  # noqa: E402
import ref_trainer  # noqa: E402


def lockstep(env_name, steps=200, seed=7):
    """Reference Serial vs Multiprocessing: same seeds, same actions ->
    byte-identical transition streams in sync mode."""
    ref_trainer.load_clean_pufferl()  # installs the reference shims
    import pufferlib.vector

    if env_name == 'cartpole':
        from pufferlib.environments import classic_control as env_module
        num_envs, num_workers = 8, 4
    else:
        from pufferlib.environments import ocean as env_module
        num_envs, num_workers = 8, 2
    make_env = env_module.env_creator(env_name)

    streams = {}
    for backend, kw in (
            (pufferlib.vector.Serial, {}),
            (pufferlib.vector.Multiprocessing,
                dict(num_workers=num_workers))):
        vec = pufferlib.vector.make(make_env, num_envs=num_envs,
            batch_size=num_envs, backend=backend, **kw)
        rng = np.random.RandomState(123)
        n_actions = int(vec.single_action_space.n)
        obs, _ = vec.reset(seed=seed)
        trace = [obs.copy()]
        for _ in range(steps):
            acts = rng.randint(0, n_actions, size=vec.num_agents)
            obs, rew, term, trunc, info = vec.step(acts)
            trace.append(np.concatenate([
                obs.reshape(-1).astype(np.float64),
                np.asarray(rew, np.float64).reshape(-1),
                np.asarray(term, np.float64).reshape(-1)]))
        vec.close()
        streams[backend.__name__] = trace

    a, b = streams['Serial'], streams['Multiprocessing']
    assert len(a) == len(b)
    for t, (x, y) in enumerate(zip(a, b)):
        np.testing.assert_array_equal(x, y,
            err_msg=f'{env_name} diverged at step {t}')
    return {'env': env_name, 'steps': steps, 'identical': True}


def trainer_sps(env, seed, side, steps, backend='serial'):
    hp = dict(head_to_head.HP[env])
    hp['total_timesteps'] = steps
    if side == 'reference':
        out = ref_trainer.train_reference(env, seed=seed,
            backend=backend,
            total_timesteps=steps,
            learning_rate=hp['learning_rate'], num_envs=hp['num_envs'],
            env_batch_size=hp['num_envs'], batch_size=hp['batch_size'],
            minibatch_size=hp['minibatch_size'],
            bptt_horizon=hp['bptt_horizon'])
    else:
        saved = head_to_head.HP[env]
        head_to_head.HP[env] = hp
        try:
            out = head_to_head.run_repo(env, seed)
        finally:
            head_to_head.HP[env] = saved
    return out['sps']


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=65536)
    p.add_argument('--envs', nargs='+', default=['cartpole', 'squared'])
    p.add_argument('--out', default='docs/h2h_ref_backend.json')
    args = p.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')

    results = {'cpu_count': os.cpu_count(), 'lockstep': [], 'sps': {}}
    for env in args.envs:
        if env != 'cartpole':
            # reference ocean envs use the process-global np.random
            # (see module docstring) — backend lockstep is impossible
            # by the reference's own env design, not a transport issue
            continue
        r = lockstep(env)
        results['lockstep'].append(r)
        print(f'lockstep {env}: serial == multiprocessing over '
            f'{r["steps"]} steps', flush=True)

    for env in args.envs:
        row = {}
        for name, side, backend in (
                ('ref_serial', 'reference', 'serial'),
                ('ref_envpool', 'reference', 'multiprocessing'),
                ('repo', 'repo', None)):
            t0 = time.perf_counter()
            sps = trainer_sps(env, 1, side, args.steps, backend=backend)
            row[name] = sps
            print(f'{env:>10} {name:>12} {sps:9.0f} SPS '
                f'({time.perf_counter() - t0:.0f}s)', flush=True)
        results['sps'][env] = row

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(results, f, indent=1, default=float)
    print(f'wrote {args.out}')

    print('\n| env | ref Serial SPS | ref Multiprocessing SPS | repo SPS |')
    print('|---|---|---|---|')
    for env, row in results['sps'].items():
        print(f'| {env} | {row["ref_serial"]:.0f} | '
            f'{row["ref_envpool"]:.0f} | {row["repo"]:.0f} |')


if __name__ == '__main__':
    main()
