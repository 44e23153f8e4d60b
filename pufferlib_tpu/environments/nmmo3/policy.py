"""NMMO3 policy: bit-packed map decompressor + conv/embedding towers.

Parity: reference pufferlib/environments/nmmo3/torch.py — Decompressor
unpacks each map code into 10 mixed-radix factor channels
(factors 4,4,16,5,3,5,5,6,7,4 -> 59 one-hot channels), then a 2-conv
map tower + player-embedding tower -> proj -> actor/critic.

TPU notes: the reference decompressor scatters one-hots
(torch.py:29-52); here each factor block is jax.nn.one_hot on
(codes // div) % mod and the blocks concatenate — pure elementwise
compare + concat, no scatter, fully fusable under XLA.
"""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from pufferlib_tpu.models import layer_init_dense, orthogonal_init, \
    _action_info

FACTORS = (4, 4, 16, 5, 3, 5, 5, 6, 7, 4)
N_CHANNELS = sum(FACTORS)  # 59
MAP_H, MAP_W = 11, 15
PLAYER_FEATS = 44


def decompress_map(codes):
    """(B, 11, 15) int codes -> (B, 11, 15, 59) one-hot factor planes."""
    planes = []
    div = 1
    codes = codes.astype(jnp.int32)
    for mod in FACTORS:
        planes.append(jax.nn.one_hot(
            (codes // div) % mod, mod, dtype=jnp.float32))
        div *= mod
    return jnp.concatenate(planes, axis=-1)


class Policy(nn.Module):
    obs_shape: tuple
    action_space: object
    emulated: object = None
    hidden_size: int = 256
    dtype: object = jnp.float32

    def setup(self):
        conv = lambda f, k, s, name: nn.Conv(f, (k, k), strides=(s, s),
            padding='VALID', kernel_init=orthogonal_init(),
            bias_init=nn.initializers.zeros, name=name,
            dtype=self.dtype, param_dtype=jnp.float32)
        self.map_conv_1 = conv(64, 5, 3, 'map_conv_1')
        self.map_conv_2 = conv(64, 3, 1, 'map_conv_2')
        self.map_fc = layer_init_dense(self.hidden_size // 2,
            name='map_fc', dtype=self.dtype)
        self.player_embed = nn.Embed(128, 32, name='player_embed')
        self.player_fc = layer_init_dense(self.hidden_size // 2,
            name='player_fc', dtype=self.dtype)
        self.proj = nn.Dense(self.hidden_size, name='proj',
            dtype=self.dtype, param_dtype=jnp.float32)
        is_md, nvec = _action_info(self.action_space)
        self.is_multidiscrete = is_md
        self.actors = [layer_init_dense(n, std=0.01, name=f'actor_{i}',
            dtype=self.dtype) for i, n in enumerate(nvec)]
        self.critic = layer_init_dense(1, std=1.0, name='critic',
            dtype=self.dtype)

    def __call__(self, observations):
        hidden, lookup = self.encode_observations(observations)
        return self.decode_actions(hidden, lookup)

    def encode_observations(self, observations):
        batch = observations.shape[0]
        flat = observations.reshape(batch, -1)
        codes = flat[:, :MAP_H * MAP_W].reshape(batch, MAP_H, MAP_W)
        player = flat[:, MAP_H * MAP_W:].astype(jnp.int32)

        ob_map = decompress_map(codes).astype(self.dtype)
        ob_map = jax.nn.relu(self.map_conv_1(ob_map))
        ob_map = jax.nn.relu(self.map_conv_2(ob_map))
        ob_map = jax.nn.relu(self.map_fc(ob_map.reshape(batch, -1)))

        ob_player = self.player_embed(jnp.clip(player, 0, 127))
        ob_player = jax.nn.relu(self.player_fc(
            ob_player.reshape(batch, -1).astype(self.dtype)))

        ob = jnp.concatenate([ob_map, ob_player], axis=1)
        return self.proj(ob).astype(jnp.float32), None

    def decode_actions(self, hidden, lookup=None):
        h = hidden.astype(self.dtype)
        value = self.critic(h).astype(jnp.float32)
        logits = [actor(h).astype(jnp.float32) for actor in self.actors]
        if self.is_multidiscrete:
            return logits, value
        return logits[0], value
