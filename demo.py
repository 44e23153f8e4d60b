"""CLI entry point: train / eval / sweep / autotune / profile / bench.

Parity: reference demo.py:220-294. Examples:

    python demo.py --env squared --mode train
    python demo.py --env memory --mode train --train.learning_rate 0.01
    python demo.py --env squared --mode eval --model-path experiments/...
    python demo.py --env squared --mode autotune
"""
import importlib
import json
import os
import sys
import time

import numpy as np


def init_wandb(args, resume=True):
    import wandb
    wandb.init(
        id=args.exp_id or wandb.util.generate_id(),
        project=args.wandb_project,
        group=args.wandb_group,
        allow_val_change=True,
        save_code=True,
        resume=resume,
        config={
            'train': dict(args.train),
            'env': dict(args.env_kwargs),
            'policy': dict(args.policy),
        },
    )
    return wandb


def _is_host_creator(creator, env_kwargs):
    """True when the creator yields an external (host CPU) env rather
    than a jax-native PufferEnv: host envs train through vector_host +
    ppo_host, device envs through the fused on-device trainer."""
    from pufferlib_tpu.host_env import (
        GymnasiumPufferEnv, PettingZooPufferEnv)
    probe = creator(**env_kwargs)
    is_host = isinstance(probe, (GymnasiumPufferEnv, PettingZooPufferEnv))
    if hasattr(probe, 'close'):
        probe.close()
    return is_host


def make_vecenv(args, creator, backend_name=None, num_envs=None):
    env_kwargs = dict(args.env_kwargs)
    num_envs = num_envs or args.train.num_envs
    name = backend_name or args.vec
    if _is_host_creator(creator, env_kwargs):
        import pufferlib_tpu.vector_host as vector_host
        backend = {
            'device': vector_host.HostMultiprocessing,
            'serial': vector_host.HostSerial,
            'multiprocessing': vector_host.HostMultiprocessing,
        }[name]
        kwargs = {}
        if backend is vector_host.HostMultiprocessing:
            kwargs = dict(
                num_workers=args.train.get('num_workers') or num_envs,
                batch_size=args.train.get('env_batch_size'),
                # elastic recovery budget (--train.restart-workers)
                restart_workers=args.train.get('restart_workers', 0))
        return vector_host.make(creator, env_kwargs=env_kwargs,
            backend=backend, num_envs=num_envs, **kwargs)
    import pufferlib_tpu.vector as vector
    backend = {
        'device': vector.Device,
        'serial': vector.Serial,
        'multiprocessing': vector.Device,  # device engine subsumes MP
    }[name]
    return vector.make(creator, env_kwargs=env_kwargs,
        backend=backend, num_envs=num_envs)


def train(args, env_module, creator):
    import pufferlib_tpu.vector_host as vector_host
    from pufferlib_tpu.config.cli import make_policy
    from pufferlib_tpu.training import ppo as ppo_device
    from pufferlib_tpu.training import ppo_host
    from pufferlib_tpu.training.dashboard import (
        Utilization, make_dashboard_hook)

    wandb = init_wandb(args) if args.track else None
    vecenv = make_vecenv(args, creator)
    policy = make_policy(vecenv, env_module, args)

    host = isinstance(vecenv, (vector_host.HostSerial,
        vector_host.HostMultiprocessing, vector_host.HostRay))
    ppo = ppo_host if host else ppo_device

    train_cfg = dict(args.train)
    for k in ('num_envs', 'num_workers', 'env_batch_size',
            'restart_workers'):
        train_cfg.pop(k, None)
    config = ppo.default_config(env=args.env, exp_id=args.exp_id,
        **train_cfg)
    data = ppo.create(config, vecenv, policy, wandb=wandb)
    data.utilization = Utilization()
    if config.verbose and sys.stdout.isatty():
        data.dashboard = make_dashboard_hook()

    from pufferlib_tpu.training import checkpoint as ckpt
    if args.exp_id:
        ckpt.try_load_checkpoint(data)

    try:
        while data.global_step < config.total_timesteps:
            if host:
                # host envs: async envpool rollout then update
                ppo.evaluate(data)
                ppo.train(data)
            else:
                # device envs: ONE dispatch per epoch; metrics are
                # materialized lazily at the dashboard interval, so the
                # host never stalls the accelerator
                ppo.step(data)
    except KeyboardInterrupt:
        print('\nInterrupted; saving checkpoint')
        ckpt.save_checkpoint(data)
    finally:
        data.utilization.stop()
        ppo.close(data)
    return data


def _render_frame(vecenv):
    """Fetch one frame from either engine: device Serial exposes
    `env.render(state)` over jax states; host backends expose the
    gymnasium-style `driver_env.render()` (ansi str or rgb ndarray)."""
    env = getattr(vecenv, 'env', None)
    if env is not None and hasattr(env, 'render') \
            and getattr(vecenv, '_states', None):
        try:
            return env.render(vecenv._states[0])
        except NotImplementedError:
            return None
    driver = getattr(vecenv, 'driver_env', None)
    if driver is not None and hasattr(driver, 'render'):
        try:
            return driver.render()
        except Exception:
            return None
    return None


def _show_frame(frame, step, save_dir=None):
    """Display a frame: ansi strings to the terminal, rgb arrays via cv2
    when present else saved as PNGs (reference clean_pufferl.py:571-594
    renders ansi AND rgb via cv2)."""
    if frame is None:
        return
    if isinstance(frame, str):
        print('\033[0;0H' + frame + '\n')
        return
    frame = np.asarray(frame)
    try:
        # cv2.imshow raises cv2.error (not ImportError) on headless
        # hosts; any failure falls back to saving frames
        import cv2
        cv2.imshow('frame', frame[..., ::-1] if frame.ndim == 3 else frame)
        cv2.waitKey(1)
    except Exception:
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            try:
                from PIL import Image
                Image.fromarray(frame).save(
                    os.path.join(save_dir, f'frame_{step:06d}.png'))
            except ImportError:
                np.save(os.path.join(save_dir, f'frame_{step:06d}.npy'),
                    frame)


def evaluate(args, env_module, creator):
    """Render rollout with a trained policy (reference
    clean_pufferl.py:551-594). Works for both device (jax) and host
    (external CPU) envs; rgb frames go through cv2 when available,
    else into PUFFER_FRAME_DIR."""
    import jax
    from pufferlib_tpu.config.cli import make_policy
    from pufferlib_tpu.models import RecurrentPolicy
    from pufferlib_tpu.training import checkpoint as ckpt

    vecenv = make_vecenv(args, creator, backend_name='serial', num_envs=1)
    policy = make_policy(vecenv, env_module, args)
    key = jax.random.PRNGKey(0)
    obs, _ = vecenv.reset()
    if isinstance(policy, RecurrentPolicy):
        params = policy.init(key, np.asarray(obs),
            policy.initial_state(1))
        state = policy.initial_state(vecenv.num_agents)
    else:
        params = policy.init(key, np.asarray(obs))
        state = None

    if args.model_path:
        if args.model_path.endswith('.pt'):
            # reference torch checkpoint: convert on the fly
            # (frameworks/torch_import.py, tested output-equivalent)
            from pufferlib_tpu.frameworks import torch_import
            params = torch_import.load_pt(args.model_path)
        else:
            params = ckpt.load_pytree(args.model_path)

    recurrent = isinstance(policy, RecurrentPolicy)
    frames = int(os.environ.get('PUFFER_EVAL_STEPS', 10 ** 9))
    delay = float(os.environ.get('PUFFER_EVAL_DELAY', 0.3))
    save_dir = os.environ.get('PUFFER_FRAME_DIR')
    for step in range(frames):
        _show_frame(_render_frame(vecenv), step, save_dir)
        key, sub = jax.random.split(key)
        if recurrent:
            action, _, _, _, state = policy(params, obs, state, key=sub)
        else:
            action, _, _, _ = policy(params, obs, key=sub)
        obs, reward = vecenv.step(np.asarray(action))[:2]
        print(f'Reward: {float(np.mean(reward)):.4f}')
        time.sleep(delay)
    vecenv.close()


def autotune(args, env_module, creator, epochs=8):
    """Find the num_envs that maximizes end-to-end fused-trainer SPS —
    the analog of reference vector.autotune (vector.py:669-854), which
    tuned workers/batch for the process pool. On TPU the knob is lane
    count; timing uses the honest slope method (a value fetch per
    measurement, amortized over epochs — see docs/PERF.md)."""
    import pufferlib_tpu.vector as vector
    from pufferlib_tpu.config.cli import make_policy
    from pufferlib_tpu.training import ppo

    if _is_host_creator(creator, dict(args.env_kwargs)):
        # host envs: sweep workers/batch for the shared-memory envpool
        # (reference vector.autotune, vector.py:669-854)
        import pufferlib_tpu.vector_host as vector_host
        return vector_host.autotune(creator,
            env_kwargs=dict(args.env_kwargs),
            max_envs=args.train.get('num_envs') or 64)

    results = {}
    # lane ladder overridable for tests/small hosts
    lanes = os.environ.get('PUFFER_AUTOTUNE_LANES')
    if lanes:
        ladder = [int(x) for x in lanes.split(',')]
    else:
        ladder = [512 * 4 ** i for i in range(5)]  # 512..131072
    horizon = int(os.environ.get('PUFFER_AUTOTUNE_HORIZON', 64))
    print(f'{"num_envs":>10} {"SPS":>14} {"ms/epoch":>10}')
    for n in ladder:
        try:
            vecenv = make_vecenv(args, creator, backend_name='device',
                num_envs=n)
            policy = make_policy(vecenv, env_module, args)
            batch = n * horizon
            train_cfg = dict(args.train)
            for k in ('num_envs', 'num_workers', 'env_batch_size',
                    'batch_size', 'minibatch_size', 'total_timesteps',
                    'bptt_horizon', 'verbose', 'data_dir',
                    'checkpoint_interval', 'anneal_lr'):
                train_cfg.pop(k, None)
            config = ppo.default_config(env=args.env, batch_size=batch,
                minibatch_size=batch // 4, bptt_horizon=16,
                total_timesteps=batch * 10 ** 6, anneal_lr=False,
                verbose=False, data_dir='/tmp/puffer_autotune',
                checkpoint_interval=10 ** 6, **train_cfg)
            data = ppo.create(config, vecenv, policy)
            ppo.step(data)
            float(data.carry['t'])  # compile + sync
            start = time.perf_counter()
            for _ in range(epochs):
                ppo.step(data)
            float(data.carry['t'])
            dt = (time.perf_counter() - start) / epochs
            sps = batch / dt
            results[n] = sps
            print(f'{n:>10} {sps:>14.0f} {dt * 1e3:>10.1f}')
        except Exception as e:
            print(f'{n:>10} failed: {e}')
            break
    best = max(results, key=results.get)
    print(f'Best: --train.num_envs {best} ({results[best]:.0f} SPS)')
    return results


def profile(args, env_module, creator):
    """cProfile over a short train (reference demo.py:278-284), plus an
    XLA device trace when PUFFER_TRACE_DIR is set (the TPU-side analog:
    view with tensorboard or xprof)."""
    import cProfile
    import pstats
    args.train['total_timesteps'] = args.train['batch_size'] * 4
    trace_dir = os.environ.get('PUFFER_TRACE_DIR')
    if trace_dir:
        import jax
        with jax.profiler.trace(trace_dir):
            with cProfile.Profile() as pr:
                train(args, env_module, creator)
        print(f'device trace written to {trace_dir}')
    else:
        with cProfile.Profile() as pr:
            train(args, env_module, creator)
    stats = pstats.Stats(pr)
    stats.sort_stats('cumulative').print_stats(10)


def sample_sweep_params(space, rng):
    """Draw one config from a sweep parameter space (config.yaml sweep
    sections; wandb-style distributions)."""
    out = {}
    for name, spec in space.items():
        dist = spec.get('distribution', 'uniform')
        if dist == 'log_uniform':
            lo, hi = np.log10(spec['min']), np.log10(spec['max'])
            out[name] = float(10 ** rng.uniform(lo, hi))
        elif dist == 'uniform':
            out[name] = float(rng.uniform(spec['min'], spec['max']))
        elif dist == 'int_uniform':
            out[name] = int(rng.randint(spec['min'], spec['max'] + 1))
        elif dist == 'categorical' or 'values' in spec:
            out[name] = spec['values'][rng.randint(len(spec['values']))]
        else:
            raise ValueError(f'Unknown distribution {dist} for {name}')
    return out


def sweep_objective(data, metric, mode='mean'):
    """Sweep objective for one finished run: a statistic of the metric's
    time series over the WHOLE run (data.stats_history), not just the
    noisy final epoch — mirroring how the reference's wandb sweeps
    optimize the logged series (reference demo.py:132-151).

    mode: 'mean' (default), 'max', or 'final'. Falls back to the final
    stats dict (then episode_return) when the series never saw the
    metric."""
    series = [s[metric] for _, s in getattr(data, 'stats_history', [])
        if metric in s]
    if series and mode != 'final':
        return float(np.max(series) if mode == 'max' else np.mean(series))
    final = data.stats.get(metric, data.stats.get('episode_return', 0.0))
    return float(series[-1] if series else final)


def sweep(args, env_module, creator):
    """Hyperparameter sweep over the config.yaml sweep section. Uses
    wandb sweeps when --track is set, else local random search
    (reference demo.py:132-151)."""
    sweep_cfg = dict(args.sweep) if args.sweep else {}
    space = sweep_cfg.get('parameters', {
        'learning_rate': {'distribution': 'log_uniform',
            'min': 1e-4, 'max': 3e-2},
        'ent_coef': {'distribution': 'log_uniform',
            'min': 1e-3, 'max': 1e-1},
    })
    metric = sweep_cfg.get('metric', 'score')
    num_runs = int(sweep_cfg.get('num_runs', 10))

    if args.track:
        # wandb-managed sweep (reference demo.py:132-151)
        import wandb

        def to_wandb_spec(spec):
            dist = spec.get('distribution', 'uniform')
            if 'values' in spec:
                return {'values': spec['values']}
            return {'distribution': dist.replace('log_uniform',
                'log_uniform_values'), 'min': spec['min'],
                'max': spec['max']}

        sweep_id = wandb.sweep(sweep={
            'method': sweep_cfg.get('method', 'random'),
            'name': f'sweep-{args.env}',
            'metric': {'goal': 'maximize',
                'name': f'environment/{metric}'},
            'parameters': {k: to_wandb_spec(v) for k, v in space.items()},
        }, project=args.wandb_project)

        def run_once():
            try:
                wandb.init()
                for k, v in dict(wandb.config).items():
                    args.train[k] = v
                args.exp_id = None
                train(args, env_module, creator)
            except Exception:
                import traceback
                traceback.print_exc()

        wandb.agent(sweep_id, run_once, count=num_runs)
        return []

    rng = np.random.RandomState(0)
    results = []
    for i in range(num_runs):
        params = sample_sweep_params(space, rng)
        for k, v in params.items():
            args.train[k] = v
        args.train['verbose'] = False
        # fused step() only materializes metrics when a sink wants
        # them; the sweep objective needs the run's stats series
        args.train['track_history'] = True
        args.exp_id = None
        try:
            data = train(args, env_module, creator)
            score = sweep_objective(data, metric,
                mode=sweep_cfg.get('objective', 'mean'))
            results.append({**params, metric: float(score)})
            print(json.dumps(results[-1]))
        except Exception as e:
            print(f'run {i} failed: {e}')
    results.sort(key=lambda r: -r[metric])
    print('Best:', json.dumps(results[0]) if results else 'none')
    return results


def baseline(args, env_module, creator):
    """Download the latest wandb model artifact for this experiment and
    evaluate it (reference demo.py:245-258)."""
    wandb = init_wandb(args, resume=False)
    artifact_name = f'{args.exp_id}_model:latest'
    artifact = wandb.run.use_artifact(artifact_name)
    data_dir = artifact.download()
    # only model checkpoints — trainer_state.ckpt sorts after model_*
    # and is optimizer state, not params
    ckpts = sorted(f for f in os.listdir(data_dir)
        if f.startswith('model_'))
    if not ckpts:
        raise FileNotFoundError(f'no checkpoints in artifact {artifact_name}')
    args.model_path = os.path.join(data_dir, ckpts[-1])
    evaluate(args, env_module, creator)


def train_sb3(args, env_module, creator):
    """Alternate SB3 backend (reference demo.py:203-218): host envs are
    adapted to real gymnasium.Env instances and handed to
    stable_baselines3 (frameworks/sb3.py). Gated on sb3 being installed
    (it is not in this image; the gymnasium contract it relies on is
    covered by tests/test_gymnasium_conformance.py)."""
    from pufferlib_tpu.frameworks.sb3 import train_sb3 as sb3_train
    # SB3 DummyVecEnv is a python loop: keep the env count modest
    # rather than inheriting the native trainer's lane counts
    n_envs = min(int(args.train.get('num_envs', 4) or 4), 8)
    return sb3_train(creator, env_kwargs=dict(args.env_kwargs),
        n_envs=n_envs, seed=args.train.get('seed', 0),
        total_timesteps=args.train.get('total_timesteps', 10000),
        update_epochs=args.train.get('update_epochs', 4),
        gamma=args.train.get('gamma', 0.99))


def main(argv=None):
    from pufferlib_tpu.config.cli import load_config
    args, env_module, creator = load_config(argv=argv)

    if args.mode == 'train' and getattr(args, 'backend', 'native') == 'sb3':
        train_sb3(args, env_module, creator)
    elif args.mode == 'train':
        train(args, env_module, creator)
    elif args.mode == 'eval':
        evaluate(args, env_module, creator)
    elif args.mode == 'autotune':
        autotune(args, env_module, creator)
    elif args.mode == 'profile':
        profile(args, env_module, creator)
    elif args.mode == 'sweep':
        sweep(args, env_module, creator)
    elif args.mode == 'baseline':
        baseline(args, env_module, creator)
    elif args.mode == 'bench':
        os.system(f'{sys.executable} bench.py')


if __name__ == '__main__':
    main()
