"""wandb tracking paths driven by a fake wandb module.

wandb is not installed in this image; these tests inject a fake with
the surface demo.py / the trainers use (init, log, sweep, agent,
Artifact, finish) so --track training, metric logging, the close-time
artifact upload, and wandb-managed sweeps all EXECUTE instead of being
dead code (reference demo.py:111-151, clean_pufferl.py:278-304)."""
import sys
import types

import numpy as np
import pytest


class FakeArtifact:
    def __init__(self, name, type=None):
        self.name = name
        self.type = type
        self.files = []

    def add_file(self, path):
        self.files.append(path)


class FakeRun:
    def __init__(self):
        self.artifacts = []

    def log_artifact(self, artifact):
        self.artifacts.append(artifact)


class FakeWandb(types.ModuleType):
    def __init__(self):
        super().__init__('wandb')
        self.inits = []
        self.logged = []
        self.finished = 0
        self.run = FakeRun()
        self.Artifact = FakeArtifact
        self.Image = lambda x: ('image', np.asarray(x).shape)
        self.config = {}
        self.util = types.SimpleNamespace(generate_id=lambda: 'fakeid')
        self.sweeps = []
        self.agent_calls = []

    def init(self, **kwargs):
        self.inits.append(kwargs)
        return self

    def log(self, metrics):
        self.logged.append(metrics)

    def finish(self):
        self.finished += 1

    def sweep(self, sweep=None, project=None):
        self.sweeps.append(sweep)
        return 'sweep-id-1'

    def agent(self, sweep_id, fn, count=1):
        # run the training fn ONCE regardless of count (keeps the test
        # fast; the real wandb would loop)
        self.agent_calls.append((sweep_id, count))
        fn()


@pytest.fixture
def fake_wandb(monkeypatch):
    fake = FakeWandb()
    monkeypatch.setitem(sys.modules, 'wandb', fake)
    return fake


def test_track_train_logs_and_uploads_artifact(fake_wandb, monkeypatch):
    """demo --track: wandb.init is called with the config tree, metrics
    flow through 0verview/losses/environment namespaces, and close()
    uploads the final checkpoint as an artifact."""
    import uuid
    import demo
    monkeypatch.setattr(demo.time, 'time', _FastClock())
    # unique exp id: a fixed one would resume from a previous test
    # run's checkpoint and skip training entirely
    exp_id = f'wandb-fake-{uuid.uuid4().hex[:8]}'
    data = demo.main(['--env', 'squared', '--mode', 'train', '--track',
        '--exp-id', exp_id,
        '--train.total_timesteps', '2048',
        '--train.num_envs', '64',
        '--train.batch_size', '1024',
        '--train.minibatch_size', '512',
        '--train.bptt_horizon', '8',
        '--no-train.verbose'])

    assert len(fake_wandb.inits) == 1
    cfg = fake_wandb.inits[0]['config']
    assert 'train' in cfg and 'env' in cfg and 'policy' in cfg
    assert fake_wandb.inits[0]['id'] == exp_id
    assert fake_wandb.logged, 'no metrics were logged'
    keys = set().union(*(m.keys() for m in fake_wandb.logged))
    assert '0verview/SPS' in keys
    assert any(k.startswith('losses/') for k in keys)
    # artifact upload on close (reference clean_pufferl.py:294-304)
    assert fake_wandb.run.artifacts
    art = fake_wandb.run.artifacts[0]
    assert art.name == f'{exp_id}_model'
    assert art.files and art.files[0].endswith('.ckpt')
    assert fake_wandb.finished == 1


class _FastClock:
    """time.time stand-in that advances 10s per call so the trainers'
    3-second wandb throttle never suppresses the log."""

    def __init__(self):
        self.t = 0.0

    def __call__(self):
        self.t += 10.0
        return self.t


def test_wandb_sweep_runs_agent(fake_wandb):
    """demo --mode sweep --track: builds the wandb sweep spec from the
    config.yaml sweep section and trains through wandb.agent."""
    import demo
    data = demo.main(['--env', 'squared', '--mode', 'sweep', '--track',
        '--train.total_timesteps', '1024',
        '--train.num_envs', '64',
        '--train.batch_size', '1024',
        '--train.minibatch_size', '512',
        '--train.bptt_horizon', '8',
        '--no-train.verbose'])
    assert fake_wandb.sweeps, 'wandb.sweep never called'
    spec = fake_wandb.sweeps[0]
    assert spec['method'] in ('random', 'bayes', 'grid')
    assert spec['parameters']
    assert fake_wandb.agent_calls
