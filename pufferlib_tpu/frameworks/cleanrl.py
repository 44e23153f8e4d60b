"""CleanRL bridge: API-parity aliases.

Parity: reference pufferlib/frameworks/cleanrl.py — sample_logits (:25),
Policy (:50), RecurrentPolicy (:69). The implementations live in
pufferlib_tpu.models; this module preserves the reference import path
so `from pufferlib_tpu.frameworks import cleanrl` works the same way.
"""
from pufferlib_tpu.models.distributions import (  # noqa: F401
    entropy, log_prob, sample_logits,
)
from pufferlib_tpu.models.policy import (  # noqa: F401
    Policy, RecurrentPolicy,
)
