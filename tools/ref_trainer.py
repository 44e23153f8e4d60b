"""Run the ACTUAL reference trainer (/root/reference/clean_pufferl.py)
in this image, for head-to-head learning-curve and SPS comparisons
against pufferlib_tpu (BASELINE.md: "learning curves within seed
variance of reference").

The reference imports three things this image lacks; each is shimmed
WITHOUT touching the reference tree:

- `gym` (0.23) — only used for isinstance tuples in reference
  spaces.py:1-10; aliased to gymnasium.
- `pyximport` — compiles c_gae.pyx at import (clean_pufferl.py:25-27);
  stubbed to a no-op.
- `c_gae.compute_gae` — replaced by the reference-exact numpy
  recurrence (c_gae.pyx:11-32), already proven equal to the repo's GAE
  in tests/test_gae.py.

Everything else that executes — emulation, Serial vectorization,
Experience buffer, torch policy, PPO update loop, dashboard — is the
reference's own code.

Usage:
    python tools/ref_trainer.py --env squared --seed 1
    python tools/ref_trainer.py --env cartpole --timesteps 65536
"""
import argparse
import importlib.util
import io
import json
import os
import sys
import time
import types
from contextlib import redirect_stdout

import numpy as np

REF = '/root/reference'


def numpy_compute_gae(dones, values, rewards, gamma, gae_lambda):
    """Reference-exact GAE recurrence (c_gae.pyx:11-32): float32
    accumulator, no bootstrap past the final step."""
    num_steps = len(rewards)
    advantages = np.zeros(num_steps, dtype=np.float32)
    lastgaelam = np.float32(0.0)
    gamma = np.float32(gamma)
    lam = np.float32(gae_lambda)
    for t in range(num_steps - 2, -1, -1):
        nextnonterminal = np.float32(1.0) - dones[t + 1]
        delta = (rewards[t + 1] + gamma * values[t + 1] * nextnonterminal
            - values[t])
        lastgaelam = delta + gamma * lam * nextnonterminal * lastgaelam
        advantages[t] = lastgaelam
    return advantages


def install_shims():
    """Make `import pufferlib` + clean_pufferl importable from the
    read-only reference tree."""
    if REF not in sys.path:
        sys.path.insert(0, REF)

    if 'gym' not in sys.modules:
        import gymnasium
        gym = types.ModuleType('gym')
        gym.spaces = gymnasium.spaces
        gym.Env = gymnasium.Env
        gym.Wrapper = gymnasium.Wrapper
        gym.error = gymnasium.error
        sys.modules['gym'] = gym

    pyx = types.ModuleType('pyximport')
    pyx.install = lambda *a, **k: None
    sys.modules['pyximport'] = pyx

    c_gae = types.ModuleType('c_gae')
    c_gae.compute_gae = numpy_compute_gae
    sys.modules['c_gae'] = c_gae


def load_clean_pufferl():
    install_shims()
    if 'clean_pufferl' in sys.modules:
        return sys.modules['clean_pufferl']
    spec = importlib.util.spec_from_file_location(
        'clean_pufferl', os.path.join(REF, 'clean_pufferl.py'))
    mod = importlib.util.module_from_spec(spec)
    sys.modules['clean_pufferl'] = mod
    spec.loader.exec_module(mod)
    return mod


# reference config.yaml `default.train` + the package sections used in
# the head-to-head (ocean / classic_control); values match the
# reference yaml (config.yaml:5-43, ocean + classic_control sections)
DEFAULT_TRAIN = dict(
    seed=1, torch_deterministic=True, cpu_offload=False, device='cpu',
    total_timesteps=10_000_000, learning_rate=2.5e-4, anneal_lr=True,
    gamma=0.99, gae_lambda=0.95, update_epochs=4, norm_adv=True,
    clip_coef=0.1, clip_vloss=True, vf_coef=0.5, vf_clip_coef=0.1,
    max_grad_norm=0.5, ent_coef=0.01, target_kl=None,
    num_envs=8, num_workers=2, env_batch_size=None, zero_copy=True,
    data_dir='/tmp/ref_trainer', checkpoint_interval=200,
    batch_size=1024, minibatch_size=512, bptt_horizon=16,
    compile=False, compile_mode='reduce-overhead',
)

PACKAGES = {
    'ocean': dict(
        use_rnn=True,
        train=dict(total_timesteps=30_000, learning_rate=0.017,
            num_envs=8, num_workers=2, env_batch_size=8,
            minibatch_size=128, bptt_horizon=4, device='cpu'),
    ),
    'classic_control': dict(
        use_rnn=False,
        train=dict(total_timesteps=500_000, num_envs=64,
            env_batch_size=64),
    ),
    # conv-path h2h fixture (tools/visual_env_ref.py): the reference
    # torch Convolutional on the pixel micro-env
    'visual': dict(
        use_rnn=False,
        train=dict(total_timesteps=262_144, learning_rate=1e-3,
            num_envs=64, env_batch_size=64, batch_size=4096,
            minibatch_size=1024, bptt_horizon=16, device='cpu'),
    ),
}

ENV_PACKAGE = {
    'squared': 'ocean', 'password': 'ocean', 'stochastic': 'ocean',
    'bandit': 'ocean', 'memory': 'ocean', 'multiagent': 'ocean',
    'spaces': 'ocean',
    'cartpole': 'classic_control',
    'visual': 'visual',
}


def make_config(env_name, seed=1, **overrides):
    import pufferlib
    pkg = ENV_PACKAGE[env_name]
    cfg = dict(DEFAULT_TRAIN)
    cfg.update(PACKAGES[pkg]['train'])
    cfg.update(overrides)
    cfg['seed'] = seed
    cfg['env'] = env_name
    cfg['exp_id'] = f'ref-{env_name}-{seed}'
    return pufferlib.namespace(**cfg), PACKAGES[pkg]['use_rnn'], pkg


def train_reference(env_name, seed=1, quiet=True, init_style=None,
        backend='serial', num_workers=None, **overrides):
    """Train the reference trainer end-to-end; returns a dict with the
    per-epoch stats series, final stats, and measured SPS.

    init_style='orthogonal' re-initializes the reference Default with
    the repo's CleanRL-style scheme (orthogonal sqrt(2) encoder,
    orthogonal 1.0 value head, zero biases) for the init ablation
    (tools/ablate_init.py); None keeps the reference's own init
    (torch-default encoder/value head, reference models.py:24-39).

    backend='multiprocessing' runs the reference on its flagship
    Multiprocessing envpool (reference vector.py:218-447) with
    num_workers workers (default: reference config.yaml's tuned value
    for the package, e.g. ocean num_workers=2, default train
    num_workers=8) — the reference's best-foot configuration
    (tools/bench_ref_backend.py measures what that foot is worth on
    this box)."""
    clean_pufferl = load_clean_pufferl()
    import pufferlib.vector
    from pufferlib.frameworks import cleanrl

    config, use_rnn, pkg = make_config(env_name, seed=seed, **overrides)

    if pkg == 'ocean':
        from pufferlib.environments import ocean as env_module
    elif pkg == 'visual':
        import visual_env_ref as env_module
    else:
        from pufferlib.environments import classic_control as env_module

    make_env = env_module.env_creator(env_name)
    if backend == 'multiprocessing':
        if num_workers is None:
            num_workers = int(getattr(config, 'num_workers', 8))
        num_workers = min(num_workers, int(config.num_envs))
        vecenv = pufferlib.vector.make(
            make_env, num_envs=config.num_envs,
            batch_size=config.env_batch_size,
            num_workers=num_workers,
            backend=pufferlib.vector.Multiprocessing)
    else:
        vecenv = pufferlib.vector.make(
            make_env, num_envs=config.num_envs,
            batch_size=config.env_batch_size,
            backend=pufferlib.vector.Serial)

    # Reference bug: ocean Password declares Box(0, 1) but emits -1
    # "unset" sentinel obs (reference ocean.py:259, :271), so the
    # reference's own one-time space check (emulation.py:183-185)
    # rejects its own env. Disable the one-time check, exactly as a
    # reference user would have to in order to train password.
    for e in getattr(vecenv, 'envs', []):
        e.is_observation_checked = True

    policy = env_module.Policy(vecenv.driver_env)
    if init_style == 'orthogonal':
        import torch
        torch.manual_seed(seed)
        m = policy
        while not hasattr(m, 'encoder') and hasattr(m, 'policy'):
            m = m.policy
        torch.nn.init.orthogonal_(m.encoder.weight, gain=2 ** 0.5)
        torch.nn.init.zeros_(m.encoder.bias)
        torch.nn.init.orthogonal_(m.value_head.weight, gain=1.0)
        torch.nn.init.zeros_(m.value_head.bias)
    if use_rnn:
        policy = env_module.Recurrent(vecenv.driver_env, policy)
        policy = cleanrl.RecurrentPolicy(policy)
    else:
        policy = cleanrl.Policy(policy)
    policy = policy.to(config.device)

    sink = io.StringIO()
    history = []
    t0 = time.perf_counter()
    with redirect_stdout(sink) if quiet else _noop():
        data = clean_pufferl.create(config, vecenv, policy)
        while data.global_step < config.total_timesteps:
            stats, _ = clean_pufferl.evaluate(data)
            clean_pufferl.train(data)
            if stats:
                history.append((data.global_step,
                    {k: float(v) for k, v in stats.items()
                     if isinstance(v, (int, float, np.number))}))
        elapsed = time.perf_counter() - t0
        final_stats = dict(data.stats or {})
        steps = data.global_step
        clean_pufferl.close(data)
    return {
        'env': env_name, 'seed': seed,
        'history': history,
        'final': {k: float(v) for k, v in final_stats.items()
            if isinstance(v, (int, float, np.number))},
        'sps': steps / elapsed,
        'global_step': int(steps),
    }


class _noop:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def series(result, metric='score'):
    """The metric's time series from a train_reference result."""
    return [(s, d[metric]) for s, d in result['history'] if metric in d]


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--env', default='squared')
    p.add_argument('--seed', type=int, default=1)
    p.add_argument('--timesteps', type=int, default=None)
    p.add_argument('--verbose', action='store_true')
    args = p.parse_args()
    overrides = {}
    if args.timesteps:
        overrides['total_timesteps'] = args.timesteps
    out = train_reference(args.env, seed=args.seed,
        quiet=not args.verbose, **overrides)
    print(json.dumps({k: out[k] for k in
        ('env', 'seed', 'final', 'sps', 'global_step')}, indent=2))
    tail = series(out)[-5:]
    print('score tail:', tail)


if __name__ == '__main__':
    main()
