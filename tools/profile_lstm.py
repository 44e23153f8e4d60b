"""Op-level profile of the fused LSTM PPO step at bench shapes.

Captures a jax.profiler device trace of `ppo.step_fn` (the program
bench.py times for ocean_squared_ppo_lstm_sps), parses the Chrome
trace events from the TPU device track, and aggregates op wall time
into categories (pallas custom-calls, matmul fusions, elementwise,
data formatting, reduces). This is the measurement loop behind
docs/PERF.md's "Op-level profile" section.

Usage: python tools/profile_lstm.py [num_envs] [horizon] [--mlp]
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import pufferlib_tpu.vector as vector
from pufferlib_tpu.models import Default, LSTMWrapper, Policy, \
    RecurrentPolicy
from pufferlib_tpu.ocean import env_creator
from pufferlib_tpu.training import ppo


def build(num_envs, horizon, use_rnn=True):
    batch_size = num_envs * horizon
    vecenv = vector.make(env_creator('squared'),
        env_kwargs=dict(distance_to_target=3, num_targets=1),
        backend=vector.Device, num_envs=num_envs)
    obs_shape = vecenv.single_observation_space.shape
    module = Default(obs_shape=obs_shape,
        action_space=vecenv.single_action_space, hidden_size=128,
        dtype=jnp.bfloat16)
    if use_rnn:
        policy = RecurrentPolicy(LSTMWrapper(policy=module,
            obs_shape=obs_shape, input_size=128, hidden_size=128,
            dtype=jnp.bfloat16))
    else:
        policy = Policy(module)
    config = ppo.default_config(
        env='squared', batch_size=batch_size,
        minibatch_size=batch_size // 4, bptt_horizon=16,
        total_timesteps=batch_size * 1_000_000, anneal_lr=False,
        obs_store_dtype='bfloat16', verbose=False,
        data_dir='/tmp/puffer_tpu_prof', checkpoint_interval=1_000_000)
    return ppo.create(config, vecenv, policy)


CATEGORIES = (
    ('pallas', ('custom-call',)),
    ('matmul', ('dot', 'convolution')),
    ('data-format', ('copy', 'transpose', 'reshape', 'bitcast',
        'concatenate', 'slice', 'dynamic-update', 'dynamic-slice',
        'pad', 'gather', 'scatter')),
    ('reduce', ('reduce', 'all-reduce')),
    ('elementwise', ('fusion', 'add', 'multiply', 'select', 'convert',
        'broadcast', 'compare', 'tanh', 'exponential', 'logistic',
        'loop_')),
)


def classify(name):
    n = name.lower()
    for cat, keys in CATEGORIES:
        if any(k in n for k in keys):
            return cat
    return 'other'


def parse_trace(logdir):
    paths = glob.glob(os.path.join(
        logdir, 'plugins/profile/*/*.trace.json.gz'))
    if not paths:
        return None
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, 'rt') as f:
        trace = json.load(f)
    events = trace.get('traceEvents', [])
    # the leaf-op rows live on the device process's "XLA Ops" thread;
    # other tracks (Steps, XLA Modules, overlays) nest and double-count
    op_tracks = set()
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'thread_name' \
                and e.get('args', {}).get('name') == 'XLA Ops':
            op_tracks.add((e['pid'], e.get('tid')))
    by_name = defaultdict(float)
    for e in events:
        if e.get('ph') != 'X' or \
                (e.get('pid'), e.get('tid')) not in op_tracks:
            continue
        by_name[e.get('name', '?')] += e.get('dur', 0.0)
    return by_name, path


def main():
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    num_envs = int(args[0]) if args else 8192
    horizon = int(args[1]) if len(args) > 1 else 64
    use_rnn = '--mlp' not in sys.argv
    data = build(num_envs, horizon, use_rnn)

    ps = {'p': data.params, 'o': data.opt_state, 'c': data.carry}

    def step():
        p, o, c, stats, _, _ = data.step_fn(ps['p'], ps['o'], ps['c'])
        ps.update(p=p, o=o, c=c)
        return stats

    stats = step()  # compile
    float(stats['policy_loss'])

    logdir = '/tmp/puffer_lstm_trace'
    os.system(f'rm -rf {logdir}')
    reps = 8
    with jax.profiler.trace(logdir):
        for _ in range(reps):
            stats = step()
        float(stats['policy_loss'])

    out = parse_trace(logdir)
    if out is None:
        print('no trace captured (device tracks unavailable?)')
        return
    by_name, path = out
    print(f'# trace: {path}')
    by_cat = defaultdict(float)
    for name, dur in by_name.items():
        by_cat[classify(name)] += dur
    total = sum(by_cat.values())
    print(f'{"category":14s} {"ms/step":>9s} {"%":>6s}')
    for cat, dur in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f'{cat:14s} {dur/1e3/reps:9.2f} {100*dur/total:6.1f}')
    print(f'{"TOTAL":14s} {total/1e3/reps:9.2f}')
    print('\n# top 25 ops')
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f'{dur/1e3/reps:9.3f} ms  {classify(name):12s} {name[:110]}')


if __name__ == '__main__':
    main()
