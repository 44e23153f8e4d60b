"""Host autotune parity (reference vector.py:669-854): single-env
profiling diagnostics, RAM/core env caps, and the 5-candidate-strategy
benchmark."""
import numpy as np

from pufferlib_tpu import vector_host
from pufferlib_tpu.environments.test.environment import (
    GymnasiumPerformanceEnv)
from pufferlib_tpu.host_env import GymnasiumPufferEnv


def _delay_env():
    return GymnasiumPufferEnv(env=GymnasiumPerformanceEnv(
        delay_mean=0.0002, delay_std=0))


def test_profile_env_diagnostics():
    prof = vector_host.profile_env(_delay_env, time_per_test=0.4)
    # ~0.2 ms/step busy-spin -> SPS in the hundreds-to-thousands range
    assert 100 < prof.sps < 50_000
    assert prof.step_std_pct >= 0
    assert 0 <= prof.reset_pct < 100
    assert prof.ram_gb_per_env > 0
    assert prof.obs_size_gb == 4 / 1e9  # (1,) float32
    assert np.isclose(prof.bandwidth_gbs, prof.obs_size_gb * prof.sps)
    assert prof.num_cores >= 1


def test_candidate_strategies_cover_reference_set():
    cfgs = vector_host._candidate_configs(
        batch_size=4, max_envs=16, cores=4, throughput=1.0)
    names = [c['backend'].__name__ for c in cfgs]
    assert 'HostSerial' in names          # strategy 5
    assert 'HostMultiprocessing' in names
    # one-batch-per-core first: 4 envs/4 workers... batch 4
    assert cfgs[0]['num_envs'] == 16 and cfgs[0]['num_workers'] == 4
    # full-sync appears (num_envs == batch_size, workers in 2..cores)
    assert any(c.get('num_workers') in (2, 4) and c['num_envs'] == 4
        for c in cfgs[1:])
    # every config respects max_envs
    assert all(c['num_envs'] <= 16 for c in cfgs)


def test_autotune_end_to_end():
    out = vector_host.autotune(_delay_env, batch_size=2, max_envs=4,
        time_per_config=0.4, max_configs=3)
    assert out is not None
    assert out.best_sps > 0
    assert out.best['num_envs'] >= 2
    assert len(out.results) >= 1
