"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware.

The axon TPU plugin (sitecustomize) force-selects jax_platforms='axon,cpu'
at interpreter start, so the env var alone is not enough — override the
config after importing jax, before any backend initializes.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if 'host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# persistent compilation cache: the suite compiles dozens of fused
# trainer programs; repeat runs (CI, driver re-runs on this box) hit
# the cache instead of recompiling. First cold run is unaffected.
jax.config.update('jax_compilation_cache_dir', '/tmp/puffer_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Default-skip slow learning proofs so a naive `pytest tests/` finishes
    within a ~8 minute budget on this box. Opt in with PUFFER_SLOW=1 or an
    explicit `-m slow` / `-m "slow or not slow"` marker expression."""
    if os.environ.get('PUFFER_SLOW'):
        return
    if 'slow' in (config.getoption('-m') or ''):
        return
    skip = pytest.mark.skip(
        reason='slow learning proof; set PUFFER_SLOW=1 or -m slow to run')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip)
