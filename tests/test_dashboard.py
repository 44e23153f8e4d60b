"""Dashboard rendering (reference clean_pufferl.py:644-738 rich TUI):
formatting helpers, Utilization sampling thread, and a full
print_dashboard render with synthetic trainer state — incl. media
(non-float) stats, which the User Stats pane must skip."""
import time

import pytest

from pufferlib_tpu.namespace import namespace
from pufferlib_tpu.training import dashboard


def test_abbreviate():
    # values carry rich color markup; check the content
    assert dashboard.abbreviate(950).endswith('950')
    assert dashboard.abbreviate(12_345).endswith('k')
    assert dashboard.abbreviate(42_000_000).endswith('m')
    assert dashboard.abbreviate(3_200_000_000).endswith('b')
    assert '12.3' in dashboard.abbreviate(12_345)


def test_duration():
    assert dashboard.duration(5) .strip() != ''
    assert 'm' in dashboard.duration(120)
    assert 'h' in dashboard.duration(7200)


def test_utilization_thread_samples():
    u = dashboard.Utilization(delay=0.05)
    time.sleep(0.3)
    u.stop()
    assert len(u.cpu_util) >= 1
    assert len(u.cpu_mem) >= 1


def _profile():
    return namespace(SPS=1.2e7, uptime=125.0, remaining=600.0,
        eval_time=10.0, eval_forward_time=6.0, env_time=2.0,
        eval_misc_time=2.0, train_time=20.0, train_forward_time=8.0,
        learn_time=10.0, train_misc_time=2.0)


def test_print_dashboard_renders(capsys, monkeypatch):
    monkeypatch.setenv('COLUMNS', '200')  # avoid cell truncation
    u = dashboard.Utilization(delay=0.05)
    time.sleep(0.15)
    u.stop()
    losses = {'policy_loss': 0.12, 'value_loss': 0.5, 'entropy': 1.1}
    stats = {'score': 0.93, 'episode_return': 4.2,
        'Media/map': object()}  # non-float stats must not crash
    dashboard.print_dashboard('squared', u, 1_234_567, 42, _profile(),
        losses, stats, msg='hello world', clear=False)
    out = capsys.readouterr().out
    assert 'PufferLib-TPU' in out
    assert 'squared' in out
    assert 'policy_loss' in out
    assert 'score' in out
    assert 'hello world' in out
    assert 'Media/map' not in out  # skipped, not rendered raw


def test_dashboard_hook_pulls_from_data(capsys, monkeypatch):
    monkeypatch.setenv('COLUMNS', '200')
    u = dashboard.Utilization(delay=0.05)
    time.sleep(0.1)
    u.stop()
    hook = dashboard.make_dashboard_hook(clear_first=False)
    data = namespace(
        config=namespace(env='memory'),
        utilization=u,
        global_step=999,
        epoch=3,
        profile=_profile(),
        losses={'policy_loss': 0.0},
        stats={'score': 1.0},
        msg='',
    )
    hook(data)
    out = capsys.readouterr().out
    assert 'memory' in out
