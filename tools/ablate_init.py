"""Init-scheme ablation for the cartpole h2h gap (VERDICT r4 weak #1).

The 5-seed full-budget matrix (docs/h2h_cartpole5.json) showed the
reference at 84.9 +- 14.1 vs the repo at 71.1 +- 4.5 — the only h2h row
the repo lost. The ONE verified implementation divergence between the
two stacks on this env is policy initialization (the loss math,
hyperparameters, Adam config, grad clipping, GAE, and minibatch
composition were all byte-audited equal):

  reference Default (reference models.py:24-39):
    encoder     torch-default kaiming-uniform weight + uniform bias
    decoder     orthogonal std 0.01, zero bias (layer_init)
    value head  torch-default kaiming-uniform weight + uniform bias
  repo Default (models/__init__.py):
    encoder     orthogonal sqrt(2), zero bias (CleanRL layer_init)
    decoder     orthogonal std 0.01, zero bias
    value head  orthogonal std 1.0, zero bias

For CartPole's 4-dim obs these differ a lot: semi-orthogonal (4, 128)
rows are unit-norm, so the repo encoder's entries have RMS
sqrt(2)/sqrt(128) ~= 0.125 vs the reference's U(+-0.5) RMS 0.289, and
the repo's zero bias removes the reference's random hidden offsets —
the reference's initial hidden activations are ~2.7x larger.

This tool runs the 2x2 (side x init) matrix, N seeds each, full budget:
  ref/torch   = the committed reference arm (its own init)
  ref/orth    = reference trainer re-initialized with the repo scheme
  repo/orth   = the committed repo arm (its own init)
  repo/torch  = repo trainer with the reference's init scheme

If the gap follows the INIT (repo/torch ~= ref/torch and
ref/orth ~= repo/orth), the -16% is an init-scheme effect, not a
trainer bug.

Usage: python tools/ablate_init.py --seeds 1 2 3 4 5
Writes experiments/ablate_init_cartpole.json.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import head_to_head  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--seeds', nargs='+', type=int,
        default=[1, 2, 3, 4, 5])
    p.add_argument('--env', default='cartpole')
    p.add_argument('--out', default='experiments/ablate_init_cartpole.json')
    args = p.parse_args()

    # same-box fairness: both sides on the host CPU
    import jax
    jax.config.update('jax_platforms', 'cpu')

    arms = [
        ('ref/torch', lambda s: head_to_head.run_reference(args.env, s)),
        ('ref/orth', lambda s: head_to_head.run_reference(
            args.env, s, init_style='orthogonal')),
        ('repo/orth', lambda s: head_to_head.run_repo(
            args.env, s, init_style='orthogonal')),
        ('repo/torch', lambda s: head_to_head.run_repo(
            args.env, s, init_style='torch')),
    ]
    results = {}
    for name, runner in arms:
        tails = []
        runs = []
        for seed in args.seeds:
            r = runner(seed)
            tails.append(r['tail'])
            runs.append({'seed': seed, 'tail': r['tail'],
                'sps': r['sps'],
                'history': [(s, d.get('episode_return'))
                    for s, d in r['history']]})
            print(f'{name:>11} seed={seed} tail={r["tail"]:.1f}',
                flush=True)
        results[name] = {
            'mean': float(np.mean(tails)), 'std': float(np.std(tails)),
            'tails': tails, 'runs': runs,
        }
        print(f'{name:>11} mean={results[name]["mean"]:.1f} '
            f'+- {results[name]["std"]:.1f}', flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(results, f, indent=1, default=float)
    print(f'wrote {args.out}')

    print('\n| arm | tail mean +- std (seeds) |')
    print('|---|---|')
    for name in results:
        r = results[name]
        print(f'| {name} | {r["mean"]:.1f} +- {r["std"]:.1f} '
            f'{[round(t, 1) for t in r["tails"]]} |')


if __name__ == '__main__':
    main()
