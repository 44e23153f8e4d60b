"""bench.py output contract: the driver records the LAST JSON line of
a bench run (BENCH_r*.json), so every mode must emit well-formed
metric records even on a CPU-only box. BENCH_SMOKE=1 runs tiny shapes
on 8 virtual CPU devices (bench.py:159-166)."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.parametrize('only', ['mlp', 'lstm', 'conv', 'transformer'])
def test_bench_smoke_emits_metric_json(only):
    env = dict(os.environ, BENCH_SMOKE='1', BENCH_ONLY=only)
    proc = subprocess.run([sys.executable, 'bench.py'],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert lines, proc.stdout
    rec = json.loads(lines[-1])
    assert set(rec) == {'metric', 'value', 'unit', 'vs_baseline'}, rec
    assert rec['value'] > 0, rec
    assert rec['unit'] == 'steps/s', rec
    expect = {'mlp': 'ocean_squared_ppo_sps',
        'lstm': 'ocean_squared_ppo_lstm_sps',
        'conv': 'ocean_visual_ppo_conv_lstm_sps',
        'transformer': 'ocean_squared_ppo_transformer_sps'}[only]
    assert rec['metric'] == expect, rec
