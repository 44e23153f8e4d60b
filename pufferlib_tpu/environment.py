"""Functional environment protocol.

The reference PufferEnv (environment.py:1-22) is a stateful reset/step
class. TPU-native envs are instead *pure functions over pytree state*:

    state, obs          = env.reset(key)
    Step(...)           = env.step(state, action, key)

so an arbitrary number of envs becomes one `jax.vmap`, a rollout becomes
one `lax.scan`, and the whole actor-learner loop compiles to a single XLA
program. Auto-reset (reference vector.py:147-151, multi_env.py:104-107:
a done env's next step performs reset, yielding reward=0, done=False) is a
combinator here, implemented with predicated selects so it is vmap-safe.
"""
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class Step(NamedTuple):
    """Result of one env step. A pytree: scan/vmap-safe."""
    state: Any
    obs: Any
    reward: jax.Array
    done: jax.Array
    truncated: jax.Array
    info: dict


class PufferEnv:
    """Base functional env. Subclasses set observation_space/action_space
    (pufferlib_tpu.spaces) and implement pure reset/step.

    Multi-agent envs set num_agents > 1 and give obs a leading agent dim;
    reward/done/truncated have shape (num_agents,).
    """
    observation_space = None
    action_space = None
    num_agents = 1

    #: names+shapes of info fields this env emits, for static structure
    info_spec: dict = {}

    def reset(self, key):
        raise NotImplementedError

    def step(self, state, action, key):
        raise NotImplementedError

    def render(self, state):
        """Optional ANSI render of a single env state (host-side)."""
        raise NotImplementedError

    # ---- conveniences -----------------------------------------------
    def zero_info(self):
        """Info dict filled with zeros, matching this env's static
        structure. Envs should build their real info with the same keys."""
        return {k: jnp.zeros(s.get('shape', ()), s.get('dtype', jnp.float32))
            for k, s in self.info_spec.items()}


def select_tree(pred, on_true, on_false):
    """Pytree select with a scalar predicate: pred ? on_true : on_false.
    The predicate broadcasts over every leaf (select, not branch — safe
    under vmap and SPMD)."""
    pred = jnp.asarray(pred)

    def sel(a, b):
        a = jnp.asarray(a)
        b = jnp.asarray(b)
        p = pred.reshape((1,) * a.ndim) if a.ndim else pred
        return jnp.where(p, a, b)

    return jax.tree.map(sel, on_true, on_false)


def autoreset_step(env, state, done_prev, action, key):
    """Step with reference auto-reset semantics: lanes whose previous step
    terminated are reset instead, returning the reset obs with reward=0,
    done=False, truncated=False, zeroed info.

    Returns (Step, done_next) where done_next feeds the next call.
    Both branches are computed (selects, not branches) — this is the
    vmap/SPMD-correct formulation; XLA dedups the cheap side.
    """
    # fold_in, not split: one threefry block per lane instead of two —
    # the per-step per-lane key derivation is the vector engine's hot path
    reset_key = jax.random.fold_in(key, 0)
    step_key = jax.random.fold_in(key, 1)
    reset_state, reset_obs = env.reset(reset_key)
    stepped = env.step(state, action, step_key)

    done_prev = jnp.asarray(done_prev)
    # multi-agent: the whole env resets once every agent is done
    lane_done = jnp.all(done_prev) if done_prev.ndim else done_prev

    new_state = select_tree(lane_done, reset_state, stepped.state)
    obs = select_tree(lane_done, reset_obs, stepped.obs)
    reward = jnp.where(done_prev, jnp.zeros_like(stepped.reward), stepped.reward)
    done = jnp.where(done_prev, jnp.zeros_like(stepped.done), stepped.done)
    truncated = jnp.where(
        done_prev, jnp.zeros_like(stepped.truncated), stepped.truncated)
    info = select_tree(
        lane_done, jax.tree.map(jnp.zeros_like, stepped.info), stepped.info)

    step = Step(new_state, obs, reward, done, truncated, info)
    return step, jnp.logical_or(done, truncated)


class EpisodeStats(PufferEnv):
    """Wrapper accumulating episode return/length, emitted only at episode
    end — the analog of reference postprocess.py:8-54 (EpisodeStats).

    Adds info fields: episode_return, episode_length, done-masked. A
    companion `_valid` flag marks which lanes carry a finished episode so
    downstream aggregation can mean only over real episode ends.
    """

    def __init__(self, env):
        self.env = env
        self.observation_space = env.observation_space
        self.action_space = env.action_space
        self.num_agents = env.num_agents
        self.info_spec = dict(env.info_spec)
        self.info_spec.update(
            episode_return={'dtype': jnp.float32},
            episode_length={'dtype': jnp.int32},
            _valid={'dtype': jnp.bool_},
        )
        if hasattr(env, 'agent_mask'):
            # forward the variable-agent mask, unwrapping our state dict
            self.agent_mask = lambda state: env.agent_mask(state['env'])

    def reset(self, key):
        state, obs = self.env.reset(key)
        wrapped = dict(
            env=state,
            episode_return=jnp.float32(0),
            episode_length=jnp.int32(0),
        )
        return wrapped, obs

    def step(self, state, action, key):
        s = self.env.step(state['env'], action, key)
        ep_ret = state['episode_return'] + jnp.sum(s.reward)
        ep_len = state['episode_length'] + 1
        ended = jnp.logical_or(jnp.all(s.done), jnp.all(s.truncated))
        info = dict(s.info)
        info['episode_return'] = jnp.where(ended, ep_ret, 0.)
        info['episode_length'] = jnp.where(ended, ep_len, 0)
        info['_valid'] = ended
        new_state = dict(env=s.state, episode_return=ep_ret,
            episode_length=ep_len)
        return Step(new_state, s.obs, s.reward, s.done, s.truncated, info)

    def render(self, state):
        return self.env.render(state['env'])
