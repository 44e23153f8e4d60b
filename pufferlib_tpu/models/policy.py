"""CleanRL-style policy wrappers over flax modules.

Parity: reference pufferlib/frameworks/cleanrl.py:50-93 (Policy /
RecurrentPolicy exposing get_action_and_value). In JAX the policy object
is (module, params); these wrappers hold the module and expose pure
functions suitable for jit — params always passed explicitly.
"""
import jax
import jax.numpy as jnp

from pufferlib_tpu.models.distributions import sample_logits


def count_params(params):
    return sum(x.size for x in jax.tree.leaves(params))


class Policy:
    """Wrap a non-recurrent module: forward -> (action, logprob, entropy,
    value)."""
    lstm = None

    def __init__(self, module):
        self.module = module

    def init(self, key, example_obs):
        return self.module.init(key, example_obs)

    def get_value(self, params, x):
        _, value = self.module.apply(params, x)
        return value

    def get_action_and_value(self, params, x, action=None, key=None):
        logits, value = self.module.apply(params, x)
        action, logprob, entropy = sample_logits(logits, action, key)
        return action, logprob, entropy, value

    def __call__(self, params, x, action=None, key=None):
        return self.get_action_and_value(params, x, action, key)


class RecurrentPolicy:
    """Wrap an LSTMWrapper module: forward(x, state) ->
    (action, logprob, entropy, value, state)."""

    def __init__(self, module):
        self.module = module

    @property
    def lstm(self):
        return self.module

    def init(self, key, example_obs, state=None):
        return self.module.init(key, example_obs, state)

    def initial_state(self, batch_size, dtype=jnp.float32):
        shape = (self.module.num_layers, batch_size,
            self.module.hidden_size)
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)

    def get_value(self, params, x, state=None):
        _, value, _ = self.module.apply(params, x, state)
        return value

    def get_action_and_value(self, params, x, state=None, action=None,
            key=None, time_major=False):
        logits, value, state = self.module.apply(params, x, state,
            time_major=time_major)
        action, logprob, entropy = sample_logits(logits, action, key)
        return action, logprob, entropy, value, state

    def __call__(self, params, x, state=None, action=None, key=None,
            time_major=False):
        return self.get_action_and_value(params, x, state, action, key,
            time_major=time_major)
