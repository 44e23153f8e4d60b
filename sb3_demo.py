"""Minimal Stable-Baselines3 demo over the puffer env wrappers
(reference sb3_demo.py): the emulated envs are plain gymnasium envs,
so SB3 consumes them directly. Requires stable_baselines3 (not in this
image); the gymnasium-conformance contract SB3 relies on is tested
in-image by tests/test_gymnasium_conformance.py.

Usage: python sb3_demo.py [--env cartpole]
"""
import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--env', type=str, default='cartpole')
    parser.add_argument('--timesteps', type=int, default=2000)
    args = parser.parse_args()

    try:
        from stable_baselines3 import PPO
        from stable_baselines3.common.env_util import make_vec_env
        from stable_baselines3.common.vec_env import DummyVecEnv
    except ImportError as e:
        raise ImportError(
            'stable_baselines3 is not installed in this image') from e

    from pufferlib_tpu.config.cli import load_config
    cfg, env_module, creator = load_config(args.env, argv=[
        '--env', args.env])
    envs = make_vec_env(lambda: creator(**dict(cfg.env_kwargs)),
        n_envs=4, seed=0, vec_env_cls=DummyVecEnv)

    model = PPO('MlpPolicy', envs, verbose=1)
    model.learn(total_timesteps=args.timesteps)
    model.save(f'ppo_{args.env}')


if __name__ == '__main__':
    main()
