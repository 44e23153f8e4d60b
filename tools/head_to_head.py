"""Head-to-head: the ACTUAL reference trainer (clean_pufferl via
tools/ref_trainer.py) vs pufferlib_tpu's trainer on the same envs,
same hyperparameters, same step budgets, multiple seeds — the
BASELINE.md "learning curves within seed variance" proof plus the
honest same-box SPS table.

Writes JSON results to experiments/head_to_head.json and prints a
markdown table for docs/PARITY.md.

Usage:
    python tools/head_to_head.py                  # full matrix, 3 seeds
    python tools/head_to_head.py --envs squared --seeds 1 2
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ref_trainer  # noqa: E402

# shared per-env hyperparameters (reference config.yaml ocean /
# classic_control sections) — BOTH sides train with exactly these
HP = {
    'squared': dict(total_timesteps=30_720, learning_rate=0.017,
        num_envs=8, batch_size=1024, minibatch_size=128, bptt_horizon=4,
        use_rnn=True),
    'password': dict(total_timesteps=30_720, learning_rate=0.017,
        num_envs=8, batch_size=1024, minibatch_size=128, bptt_horizon=4,
        use_rnn=True),
    'stochastic': dict(total_timesteps=30_720, learning_rate=0.017,
        num_envs=8, batch_size=1024, minibatch_size=128, bptt_horizon=4,
        use_rnn=True),
    # memory is the genuinely LSTM-dependent task (digits must cross
    # mem_delay steps inside the recurrent state); ocean hyperparameters
    # with a 4x budget — the curve is still rising at 30k on both sides
    'memory': dict(total_timesteps=122_880, learning_rate=0.017,
        num_envs=8, batch_size=1024, minibatch_size=128, bptt_horizon=4,
        use_rnn=True),
    # multiagent: PettingZoo on the reference side (2 padded agents,
    # per-agent '1/score'/'2/score' infos) vs the device engine's
    # batched 2-agent lanes here — the multi-agent training path h2h
    'multiagent': dict(total_timesteps=30_720, learning_rate=0.017,
        num_envs=8, batch_size=1024, minibatch_size=128, bptt_horizon=4,
        use_rnn=True),
    # spaces: Dict observation + Dict action through emulation on BOTH
    # sides (reference: structured bytes; here: trace-time nativize)
    'spaces': dict(total_timesteps=30_720, learning_rate=0.017,
        num_envs=8, batch_size=1024, minibatch_size=128, bptt_horizon=4,
        use_rnn=True),
    # repo_init='torch': match the reference Default's init scheme
    # exactly (torch-default kaiming-uniform encoder/value head) so the
    # h2h measures the TRAINERS, not the init. CleanRL orthogonal init
    # underscales the encoder at CartPole's 4-dim obs — the 4-arm
    # ablation (tools/ablate_init.py, docs/ablate_init_cartpole.json)
    # showed the init swings the tail 61 <-> 128 on BOTH stacks.
    'cartpole': dict(total_timesteps=204_800, learning_rate=2.5e-4,
        num_envs=64, batch_size=1024, minibatch_size=512,
        bptt_horizon=16, use_rnn=False, repo_init='torch'),
    # conv path: each side's own NatureCNN on the pixel micro-env
    # (tools/visual_env_ref.py twins pufferlib_tpu.ocean.VisualTarget)
    'visual': dict(total_timesteps=262_144, learning_rate=1e-3,
        num_envs=64, batch_size=4096, minibatch_size=1024,
        bptt_horizon=16, use_rnn=False),
}
#: metric judged per env (ocean emits 'score' in [0,1]; cartpole only
#: episode stats)
METRIC = {'squared': 'score', 'password': 'score', 'stochastic': 'score',
    'memory': 'score', 'multiagent': 'score', 'spaces': 'score',
    'cartpole': 'episode_return', 'visual': 'score'}


def extract_metric(env, side, stats):
    """Per-epoch metric value, normalized across the two stacks.

    multiagent: the reference logs per-agent '{i}/score' (PettingZoo
    agent-keyed infos, ref clean_pufferl.py:126-154); the repo sums the
    (2,)-shaped score info over agents — both map to the mean per-agent
    score."""
    if env == 'multiagent':
        if side == 'reference':
            vals = [v for k, v in stats.items() if k.endswith('/score')]
            return float(np.mean(vals)) if vals else None
        return stats['score'] / 2.0 if 'score' in stats else None
    return stats.get(METRIC[env])


def tail_mean(history, env, side, frac=0.2):
    """Mean of the metric over the last `frac` of the run — the curve's
    converged level, robust to single-epoch noise."""
    series = [v for _, d in history
        if (v := extract_metric(env, side, d)) is not None]
    if not series:
        return float('nan')
    k = max(1, int(len(series) * frac))
    return float(np.mean(series[-k:]))


def run_reference(env, seed, init_style=None):
    hp = HP[env]
    out = ref_trainer.train_reference(env, seed=seed,
        total_timesteps=hp['total_timesteps'],
        learning_rate=hp['learning_rate'], num_envs=hp['num_envs'],
        env_batch_size=hp['num_envs'], batch_size=hp['batch_size'],
        minibatch_size=hp['minibatch_size'],
        bptt_horizon=hp['bptt_horizon'], init_style=init_style)
    out['tail'] = tail_mean(out['history'], env, 'reference')
    return out


def run_repo(env, seed, init_style=None):
    """Train pufferlib_tpu with the same hyperparameters. Ocean envs run
    on the device engine (vector.Device); cartpole runs the REAL
    gymnasium CartPole through the host bridge + host trainer, exactly
    like a reference user would."""
    import jax
    hp = HP[env]
    if init_style is None:
        init_style = hp.get('repo_init', 'orthogonal')
    history = []
    t0 = time.perf_counter()

    if env == 'cartpole':
        import pufferlib_tpu.vector_host as vector_host
        from pufferlib_tpu.environments import classic_control as mod
        from pufferlib_tpu.training import ppo_host as trainer
        from pufferlib_tpu.models import Default, Policy

        vecenv = vector_host.make(mod.env_creator('cartpole'),
            backend=vector_host.HostSerial, num_envs=hp['num_envs'])
        policy = Policy(Default(
            obs_shape=vecenv.single_observation_space.shape,
            action_space=vecenv.single_action_space, hidden_size=128,
            init_style=init_style))
        config = trainer.default_config(env=env, seed=seed,
            exp_id=f'h2h-{env}-{seed}',
            total_timesteps=hp['total_timesteps'],
            learning_rate=hp['learning_rate'],
            batch_size=hp['batch_size'],
            minibatch_size=hp['minibatch_size'],
            bptt_horizon=hp['bptt_horizon'], verbose=False,
            data_dir='/tmp/h2h')
        data = trainer.create(config, vecenv, policy)
        while data.global_step < config.total_timesteps:
            stats, _ = trainer.evaluate(data)
            trainer.train(data)
            if stats:
                history.append((data.global_step, dict(stats)))
        steps = data.global_step
        vecenv.close()
    else:
        import pufferlib_tpu.vector as vector
        from pufferlib_tpu.ocean import env_creator
        from pufferlib_tpu.models import (
            Convolutional, Default, LSTMWrapper, Policy, RecurrentPolicy)
        from pufferlib_tpu.training import ppo

        vecenv = vector.make(env_creator(env), backend=vector.Device,
            num_envs=hp['num_envs'])
        obs_shape = vecenv.single_observation_space.shape
        if env == 'visual':
            # conv path: NatureCNN sized like the reference side
            # (tools/visual_env_ref.py Policy)
            module = Convolutional(
                action_space=vecenv.single_action_space,
                framestack=2, flat_size=64, hidden_size=128)
        else:
            # emulated: trace-time nativize for Dict-obs envs (spaces);
            # no-op for plain Box obs
            module = Default(obs_shape=obs_shape,
                action_space=vecenv.single_action_space, hidden_size=128,
                emulated=vecenv.emulated)
        if hp['use_rnn']:
            policy = RecurrentPolicy(LSTMWrapper(policy=module,
                obs_shape=obs_shape, input_size=128, hidden_size=128))
        else:
            policy = Policy(module)
        config = ppo.default_config(env=env, seed=seed,
            exp_id=f'h2h-{env}-{seed}',
            total_timesteps=hp['total_timesteps'],
            learning_rate=hp['learning_rate'],
            batch_size=hp['batch_size'],
            minibatch_size=hp['minibatch_size'],
            bptt_horizon=hp['bptt_horizon'], verbose=False,
            data_dir='/tmp/h2h')
        data = ppo.create(config, vecenv, policy)
        while data.global_step < config.total_timesteps:
            ppo.evaluate(data)
            ppo.train(data)
            if data.stats:
                history.append((data.global_step, dict(data.stats)))
        steps = data.global_step
        vecenv.close()

    elapsed = time.perf_counter() - t0
    return {
        'env': env, 'seed': seed, 'history': history,
        'final': history[-1][1] if history else {},
        'sps': steps / elapsed, 'global_step': int(steps),
        'tail': tail_mean(history, env, 'repo'),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--envs', nargs='+', default=list(HP))
    p.add_argument('--seeds', nargs='+', type=int, default=[1, 2, 3])
    p.add_argument('--out', default='experiments/head_to_head.json')
    p.add_argument('--tpu', action='store_true',
        help='let the repo side use the real TPU (default: CPU, '
        'apples-to-apples with the torch-CPU reference)')
    args = p.parse_args()

    if not args.tpu:
        # same-box fairness: both sides on the host CPU. The axon
        # plugin ignores JAX_PLATFORMS; override after import.
        import jax
        jax.config.update('jax_platforms', 'cpu')

    results = {'reference': {}, 'repo': {}}
    for env in args.envs:
        for side, runner in (('reference', run_reference),
                ('repo', run_repo)):
            runs = []
            for seed in args.seeds:
                r = runner(env, seed)
                runs.append(r)
                print(f'{side:>9} {env:>10} seed={seed} '
                    f'tail={r["tail"]:.4f} sps={r["sps"]:.0f}',
                    flush=True)
            results[side][env] = runs

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(results, f, indent=1, default=float)
    print(f'\nwrote {args.out}\n')

    # markdown table for docs/PARITY.md
    print('| env | metric | reference (mean ± std over seeds) | '
        'repo (mean ± std) | ref SPS | repo SPS |')
    print('|---|---|---|---|---|---|')
    for env in args.envs:
        m = METRIC[env]
        ref = [r['tail'] for r in results['reference'][env]]
        rep = [r['tail'] for r in results['repo'][env]]
        ref_sps = np.mean([r['sps'] for r in results['reference'][env]])
        rep_sps = np.mean([r['sps'] for r in results['repo'][env]])
        print(f'| {env} | {m} | {np.mean(ref):.3f} ± {np.std(ref):.3f} '
            f'| {np.mean(rep):.3f} ± {np.std(rep):.3f} '
            f'| {ref_sps:.0f} | {rep_sps:.0f} |')


if __name__ == '__main__':
    main()
