"""Op-level profile of the fused LSTM PPO step at bench shapes.

Captures a jax.profiler device trace of `ppo.step_fn` (the program
bench.py times for ocean_squared_ppo_lstm_sps) and renders the xprof
op_profile tree: per-op FRACTIONS of the program plus absolute ms/step
scaled from an honest wall-clock measurement of the same step.

Why not the Chrome trace events: on this runtime the "XLA Ops" track
rolls whole while-loops into single rows, hides pallas custom-calls
inside them, and inflates absolute durations ~2.7x under capture — a
parse of those rows misattributed the kernels entirely (it showed
pallas 0%% when xprof's own op_profile put the backward kernel at 56%%
of the step). The xplane.pb -> xprof `op_profile` conversion is the
ground truth; absolute times come from timing the step WITHOUT the
profiler attached. The legacy trace parse remains as --raw-trace.

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
    # mirror bench.py's minibatch policy: recurrent keeps the
    # time-slab partition (batch//4); non-recurrent caps rows at the
    # VMEM-resident size (profiling batch//4 at >8192 lanes would
    # profile the fixed knee, docs/PERF.md)
    minibatch_size = batch_size // 4 if use_rnn else \
        ppo.suggest_minibatch_size(batch_size)
    config = ppo.default_config(
        env='squared', batch_size=batch_size,
        minibatch_size=minibatch_size, bptt_horizon=16,
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


def op_profile_rows(logdir):
    """xprof op_profile tree: [(rawTime, name, depth)] sorted by time,
    row 0 = the whole program. Returns None if no xplane.pb exists or
    xprof is unavailable."""
    paths = glob.glob(os.path.join(
        logdir, 'plugins/profile/*/*.xplane.pb'))
    if not paths:
        return None
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        return None
    data, _ = rtd.xspace_to_tool_data(
        [max(paths, key=os.path.getmtime)], 'op_profile', {})
    prof = json.loads(data)
    root = prof.get('byProgram') or prof.get('byCategory') or {}
    rows = []

    def walk(node, depth):
        t = node.get('metrics', {}).get('rawTime', 0)
        rows.append((t, node.get('name', '?'), depth))
        for ch in node.get('children', []):
            walk(ch, depth + 1)

    walk(root, 0)
    # drop the synthetic by_program wrapper, keep the program root
    if rows and rows[0][1] == 'by_program' and len(rows) > 1:
        rows = rows[1:]
        rows = [(t, n, d - 1) for t, n, d in rows]
    rows.sort(key=lambda r: -r[0])
    return rows


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

    # honest absolute time: the profiler inflates device rows; time the
    # same step without it (large K, one fetch — tunnel RTT amortizes)
    K = 40
    t0 = time.time()
    for _ in range(K):
        stats = step()
    float(stats['policy_loss'])
    step_ms = (time.time() - t0) / K * 1e3
    print(f'# step wall time (unprofiled): {step_ms:.2f} ms')

    if '--raw-trace' in sys.argv:
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
        return

    rows = op_profile_rows(logdir)
    if rows is None:
        print('no xplane captured; rerun with --raw-trace for the '
            'legacy parse')
        return
    total = rows[0][0] or 1.0
    print(f'# xprof op_profile (fractions of program; ms scaled to '
        f'step wall time)')
    print(f'{"ms/step":>8s} {"%":>6s}  op')
    for t, name, depth in rows[:30]:
        frac = t / total
        print(f'{frac * step_ms:8.3f} {100 * frac:6.1f}  '
            f'{"  " * depth}{name[:90]}')


if __name__ == '__main__':
    main()
