"""Neural MMO policy: tile-map embedding conv + own-entity row net.

Parity: reference pufferlib/environments/nmmo/torch.py:20-110 —
shared attribute Embedding(34*256, 32), player-centered tile coords,
2-conv tile tower, AgentId-keyed entity row extraction, concat ->
proj, multidiscrete decoders + value.

TPU notes: the entity-row extraction uses a one-hot contraction
(mask @ rows) instead of torch's advanced indexing — gathers with
data-dependent indices serialize on TPU, the contraction rides the VPU.
"""
import jax
import jax.numpy as jnp
import flax.linen as nn

from pufferlib_tpu import emulation
from pufferlib_tpu.models import layer_init_dense, orthogonal_init, \
    _action_info

NUM_ATTRS = 34
TILE_FEATS = 3
ENTITY_FEATS = 31


class Policy(nn.Module):
    obs_shape: tuple
    action_space: object
    emulated: object = None
    input_size: int = 256
    hidden_size: int = 256
    entity_id_col: int = 0  # nmmo EntityState.attr_name_to_col['id']
    dtype: object = jnp.float32

    def setup(self):
        conv = lambda f, k, name: nn.Conv(f, (k, k), padding='VALID',
            kernel_init=orthogonal_init(),
            bias_init=nn.initializers.zeros, name=name,
            dtype=self.dtype, param_dtype=jnp.float32)
        self.embedding = nn.Embed(NUM_ATTRS * 256, 32, name='embedding')
        self.tile_conv_1 = conv(32, 3, 'tile_conv_1')
        self.tile_conv_2 = conv(8, 3, 'tile_conv_2')
        self.tile_fc = nn.Dense(self.input_size, name='tile_fc',
            dtype=self.dtype, param_dtype=jnp.float32)
        self.entity_fc = nn.Dense(self.input_size, name='entity_fc',
            dtype=self.dtype, param_dtype=jnp.float32)
        self.proj_fc = nn.Dense(self.input_size, name='proj_fc',
            dtype=self.dtype, param_dtype=jnp.float32)
        is_md, nvec = _action_info(self.action_space)
        self.is_multidiscrete = is_md
        self.decoders = [layer_init_dense(n, std=0.01, name=f'decoder_{i}',
            dtype=self.dtype) for i, n in enumerate(nvec)]
        self.value_head = layer_init_dense(1, std=1.0, name='value_head',
            dtype=self.dtype)

    def __call__(self, observations):
        hidden, lookup = self.encode_observations(observations)
        return self.decode_actions(hidden, lookup)

    def encode_observations(self, observations):
        batch = observations.shape[0]
        flat = observations.reshape(batch, -1)
        spec = emulation.nativize_dtype(self.emulated)
        x = emulation.nativize_tensor(flat, spec)

        tile = x['Tile'].astype(jnp.int32)           # (B, 225, 3)
        entity = x['Entity'].astype(jnp.int32)       # (B, rows, 31)
        my_id = x['AgentId'].reshape(batch, -1)[:, 0]

        # center tile coords on the player (reference :57-59)
        center = tile[:, 112:113, :2]
        tile = tile.at[:, :, :2].add(7 - center)

        offsets = jnp.arange(TILE_FEATS, dtype=jnp.int32) * 256
        tile = self.embedding(jnp.clip(tile, 0, 255) + offsets)
        # (B, 225, 3, 32) -> (B, 15, 15, 96) NHWC
        tile = tile.reshape(batch, 15, 15, TILE_FEATS * 32)
        tile = jax.nn.relu(self.tile_conv_1(tile.astype(self.dtype)))
        tile = jax.nn.relu(self.tile_conv_2(tile))
        tile = jax.nn.relu(self.tile_fc(tile.reshape(batch, -1)))

        # own-row extraction as a one-hot contraction (no gather)
        entity_ids = entity[:, :, self.entity_id_col]
        mask = (entity_ids == my_id[:, None]) & (entity_ids != 0)
        first = jnp.cumsum(mask.astype(jnp.int32), axis=1) == 1
        onehot = (mask & first).astype(self.dtype)
        ent = jnp.einsum('br,brf->bf', onehot, entity.astype(self.dtype))

        ent_offsets = (jnp.arange(ENTITY_FEATS, dtype=jnp.int32)
            + TILE_FEATS) * 256
        ent = self.embedding(
            jnp.clip(ent.astype(jnp.int32), 0, 255) + ent_offsets)
        ent = jax.nn.relu(self.entity_fc(
            ent.reshape(batch, -1).astype(self.dtype)))

        obs = jnp.concatenate([tile, ent], axis=-1)
        return self.proj_fc(obs).astype(jnp.float32), None

    def decode_actions(self, hidden, lookup=None):
        h = hidden.astype(self.dtype)
        value = self.value_head(h).astype(jnp.float32)
        logits = [dec(h).astype(jnp.float32) for dec in self.decoders]
        if self.is_multidiscrete:
            return logits, value
        return logits[0], value
