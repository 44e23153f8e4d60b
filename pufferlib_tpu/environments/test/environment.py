"""Mock environment suite: deterministic seeded envs over a cartesian
product of observation x action spaces.

Parity: reference pufferlib/environments/test/environment.py:21-230
(MOCK_OBSERVATION_SPACES x MOCK_ACTION_SPACES incl. NetHack/NMMO-scale
Dict spaces, deterministic seeded episodes). This is the central fixture
for emulation round-trip and vectorization tests.
"""
import numpy as np
import jax
import jax.numpy as jnp

from pufferlib_tpu import spaces
from pufferlib_tpu.environment import PufferEnv, Step


MOCK_OBSERVATION_SPACES = {
    'box_float': spaces.Box(low=-1, high=1, shape=(4,), dtype=np.float32),
    'image_u8': spaces.Box(low=0, high=255, shape=(3, 8, 8),
        dtype=np.uint8),
    'dict_uniform': spaces.Dict({
        'a': spaces.Box(low=0, high=1, shape=(3,), dtype=np.float32),
        'b': spaces.Box(low=0, high=1, shape=(2, 2), dtype=np.float32),
    }),
    'dict_mixed': spaces.Dict({
        'image': spaces.Box(low=0, high=255, shape=(4, 4), dtype=np.uint8),
        'flat': spaces.Box(low=-128, high=127, shape=(6,), dtype=np.int8),
        'deep': spaces.Dict({
            'x': spaces.Box(low=0, high=1, shape=(2,), dtype=np.float32),
        }),
    }),
    'tuple_nested': spaces.Tuple([
        spaces.Box(low=0, high=1, shape=(3,), dtype=np.float32),
        spaces.Tuple([
            spaces.Box(low=0, high=1, shape=(2,), dtype=np.float32),
            spaces.Box(low=0, high=255, shape=(2,), dtype=np.uint8),
        ]),
    ]),
    # nethack-like: chars/colors grids + stats vector
    'nethack_like': spaces.Dict({
        'blstats': spaces.Box(low=-2**15, high=2**15 - 1, shape=(27,),
            dtype=np.int32),
        'chars': spaces.Box(low=0, high=255, shape=(21, 79),
            dtype=np.uint8),
        'colors': spaces.Box(low=0, high=15, shape=(21, 79),
            dtype=np.uint8),
    }),
    # nmmo-like: tile map + entity rows
    'nmmo_like': spaces.Dict({
        'tile': spaces.Box(low=0, high=255, shape=(15, 15, 3),
            dtype=np.int16),
        'entity': spaces.Box(low=-2**15, high=2**15 - 1, shape=(10, 23),
            dtype=np.int16),
    }),
    # atari: framestacked screen (reference test/environment.py:23)
    'atari': spaces.Box(low=0, high=255, shape=(4, 84, 84),
        dtype=np.uint8),
    # bare Discrete observation (reference :88)
    'discrete_obs': spaces.Discrete(5),
    # full NetHack observation (reference :26-41)
    'nethack_full': spaces.Dict({
        'blstats': spaces.Box(low=-2**31, high=2**31 - 1, shape=(27,),
            dtype=np.int64),
        'chars': spaces.Box(low=0, high=255, shape=(21, 79),
            dtype=np.uint8),
        'colors': spaces.Box(low=0, high=15, shape=(21, 79),
            dtype=np.uint8),
        'glyphs': spaces.Box(low=0, high=5976, shape=(21, 79),
            dtype=np.int16),
        'inv_glyphs': spaces.Box(low=0, high=5976, shape=(55,),
            dtype=np.int16),
        'inv_letters': spaces.Box(low=0, high=127, shape=(55,),
            dtype=np.uint8),
        'inv_oclasses': spaces.Box(low=0, high=18, shape=(55,),
            dtype=np.uint8),
        'message': spaces.Box(low=0, high=255, shape=(256,),
            dtype=np.uint8),
        'tty_chars': spaces.Box(low=0, high=255, shape=(24, 80),
            dtype=np.uint8),
        'tty_colors': spaces.Box(low=0, high=31, shape=(24, 80),
            dtype=np.int8),
        'tty_cursor': spaces.Box(low=0, high=255, shape=(2,),
            dtype=np.uint8),
    }),
    # NMMO-scale: nested ActionTargets + Discrete + float16 leaves
    # (reference :44-86)
    'nmmo_full': spaces.Dict({
        'ActionTargets': spaces.Dict({
            'Attack': spaces.Dict({
                'Style': spaces.Box(low=0, high=1, shape=(3,),
                    dtype=np.int8),
                'Target': spaces.Box(low=0, high=1, shape=(100,),
                    dtype=np.int8),
            }),
            'Move': spaces.Dict({
                'Direction': spaces.Box(low=0, high=1, shape=(5,),
                    dtype=np.int8),
            }),
            'Sell': spaces.Dict({
                'InventoryItem': spaces.Box(low=0, high=1, shape=(12,),
                    dtype=np.int8),
                'Price': spaces.Box(low=0, high=1, shape=(99,),
                    dtype=np.int8),
            }),
        }),
        'AgentId': spaces.Discrete(129),
        'CurrentTick': spaces.Discrete(1025),
        'Entity': spaces.Box(low=-2**15, high=2**15 - 1, shape=(100, 23),
            dtype=np.int16),
        'Task': spaces.Box(low=-32770.0, high=32770.0, shape=(1024,),
            dtype=np.float16),
        'Tile': spaces.Box(low=-2**15, high=2**15 - 1, shape=(225, 3),
            dtype=np.int16),
    }),
    # Dict of Tuple / Dict mix (reference :107-116)
    'dict_of_tuple': spaces.Dict({
        'foo': spaces.Tuple([
            spaces.Box(low=-1, high=1, shape=(2,), dtype=np.float32),
            spaces.Discrete(3),
        ]),
        'bar': spaces.Dict({
            'baz': spaces.Discrete(2),
            'qux': spaces.Discrete(4),
        }),
    }),
}

MOCK_ACTION_SPACES = {
    'discrete': spaces.Discrete(5),
    'multidiscrete': spaces.MultiDiscrete([3, 4]),
    'dict_discrete': spaces.Dict({
        'move': spaces.Discrete(4),
        'attack': spaces.Discrete(3),
    }),
    'tuple_discrete': spaces.Tuple([
        spaces.Discrete(2), spaces.Discrete(6),
    ]),
    # NMMO-scale nested action dict (reference :121-152)
    'nmmo_actions': spaces.Dict({
        'Attack': spaces.Dict({
            'Style': spaces.Discrete(3),
            'Target': spaces.Discrete(100),
        }),
        'Buy': spaces.Dict({'MarketItem': spaces.Discrete(1024)}),
        'Move': spaces.Dict({'Direction': spaces.Discrete(5)}),
        'Sell': spaces.Dict({
            'InventoryItem': spaces.Discrete(12),
            'Price': spaces.Discrete(99),
        }),
    }),
    # deep Tuple(Dict) nesting (reference :159-166)
    'tuple_dict': spaces.Tuple([
        spaces.Discrete(4),
        spaces.Dict({
            'baz': spaces.Discrete(2),
            'qux': spaces.Discrete(2),
        }),
    ]),
}


def sample_space(space, key):
    """Deterministic pytree sample of `space` from a PRNG key, jittable."""
    if isinstance(space, spaces.Dict):
        keys = jax.random.split(key, len(space.spaces))
        return {k: sample_space(v, keys[i])
            for i, (k, v) in enumerate(space.items())}
    if isinstance(space, spaces.Tuple):
        keys = jax.random.split(key, len(space))
        return tuple(sample_space(s, keys[i])
            for i, s in enumerate(space))
    if isinstance(space, spaces.Discrete):
        return jax.random.randint(key, (), 0, space.n).astype(space.dtype)
    if isinstance(space, spaces.MultiDiscrete):
        return jax.random.randint(key, space.shape, 0,
            jnp.asarray(space.nvec)).astype(space.dtype)
    # Box
    dtype = np.dtype(space.dtype)
    if np.issubdtype(dtype, np.floating):
        return jax.random.uniform(key, space.shape,
            minval=jnp.maximum(jnp.asarray(space.low), -1e6),
            maxval=jnp.minimum(jnp.asarray(space.high), 1e6),
            ).astype(dtype)
    lo = np.maximum(space.low, np.iinfo(dtype).min).astype(np.int32)
    hi = np.minimum(space.high.astype(np.int64),
        np.iinfo(dtype).max).astype(np.int32)
    return jax.random.randint(key, space.shape, lo, hi + 1).astype(dtype)


class MockEnv(PufferEnv):
    """Deterministic seeded episodes: obs = f(episode_key, tick);
    reward = tick/episode_length; done at episode_length. The action is
    checked for structure only (any valid action accepted)."""

    info_spec = {'score': {'dtype': jnp.float32}}

    def __init__(self, observation_space, action_space, episode_length=8):
        self.observation_space = observation_space
        self.action_space = action_space
        self.episode_length = episode_length
        self.render_mode = 'ansi'

    def observation(self, episode_key, tick):
        return sample_space(self.observation_space,
            jax.random.fold_in(episode_key, tick))

    def reset(self, key):
        state = dict(episode_key=key, tick=jnp.int32(0))
        return state, self.observation(key, 0)

    def step(self, state, action, key):
        tick = state['tick'] + 1
        done = tick >= self.episode_length
        reward = tick.astype(jnp.float32) / self.episode_length
        obs = self.observation(state['episode_key'], tick)
        info = {'score': jnp.where(done, reward, 0.0)}
        return Step(dict(episode_key=state['episode_key'], tick=tick),
            obs, reward, done, jnp.bool_(False), info)


def env_creator(name='box_float-discrete'):
    """name: '<obs_space>-<action_space>' from the MOCK_* keys."""
    obs_name, atn_name = name.split('-')

    def creator(episode_length=8, **kwargs):
        return MockEnv(MOCK_OBSERVATION_SPACES[obs_name],
            MOCK_ACTION_SPACES[atn_name], episode_length)

    return creator


# --------------------------------------------------------------------------
# Host-side performance fixtures (reference test/environment.py:252-310):
# synthetic-delay envs for benchmarking the host vectorization backends.

# Host-side fixtures live in host_fixtures (jax-free module) so spawned
# envpool workers can unpickle their creators without importing jax;
# re-exported here for the historical import path.
from pufferlib_tpu.environments.test.host_fixtures import (  # noqa: F401,E402
    GymnasiumPerformanceEnv, GymnasiumSleepEnv, PettingZooPerformanceEnv,
    _do_work)
