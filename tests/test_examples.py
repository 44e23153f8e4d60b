"""The examples/ scripts (the reference's talk-script analog, SURVEY
appendix C) must keep running: each executes as a subprocess on the CPU
mesh. Marked slow — each script trains briefly."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, timeout=420):
    env = dict(os.environ)
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '')
        + ' --xla_force_host_platform_device_count=8').strip()
    # force the CPU backend inside the child (the axon plugin
    # ignores JAX_PLATFORMS; only the config update works)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        f"src = open({script!r}).read();"
        f"exec(compile(src, {script!r}, 'exec'),"
        f" {{'__file__': {script!r}, '__name__': '__main__'}})"
    )
    return subprocess.run([sys.executable, '-c', code], cwd=REPO,
        env=env, capture_output=True, text=True, timeout=timeout)


def test_wrap_one_env_example():
    r = _run(os.path.join(REPO, 'examples', 'wrap_one_env.py'))
    assert r.returncode == 0, r.stdout + r.stderr
    assert 'flat observation space' in r.stdout


@pytest.mark.slow
def test_cleanrl_style_ppo_example():
    r = _run(os.path.join(REPO, 'examples', 'cleanrl_style_ppo.py'))
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.mark.slow
def test_selfplay_example():
    r = _run(os.path.join(REPO, 'examples', 'selfplay.py'))
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.mark.slow
def test_train_sharded_example():
    r = _run(os.path.join(REPO, 'examples', 'train_sharded.py'))
    assert r.returncode == 0, r.stdout + r.stderr
