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
