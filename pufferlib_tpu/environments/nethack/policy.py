"""NetHack policy: char-embedding CNN + blstats embedding.

Parity: reference pufferlib/environments/nethack/torch.py:16-64 —
Embedding(256,32) over clipped blstats, char Embed(256,32) + 3-layer
conv stack with asymmetric strides, concat -> proj 256, actor/critic.

TPU notes: NHWC convs; embeddings are one (vocab, 32) table lookup
(XLA lowers static-table gathers efficiently on the batch axis); all
shape logic is static so the module jits into the fused trainer.
"""
import jax
import jax.numpy as jnp
import flax.linen as nn

from pufferlib_tpu import emulation
from pufferlib_tpu.models import layer_init_dense, orthogonal_init, \
    _action_info


class Policy(nn.Module):
    obs_shape: tuple
    action_space: object
    emulated: object = None
    hidden_size: int = 256
    dtype: object = jnp.float32

    def setup(self):
        conv = lambda f, k, s, name: nn.Conv(f, (k, k), strides=s,
            padding='VALID', kernel_init=orthogonal_init(),
            bias_init=nn.initializers.zeros, name=name,
            dtype=self.dtype, param_dtype=jnp.float32)
        self.blstats_embed = nn.Embed(256, 32, name='blstats_embed')
        self.char_embed = nn.Embed(256, 32, name='char_embed')
        self.conv1 = conv(32, 5, (2, 3), 'conv1')
        self.conv2 = conv(64, 5, (1, 3), 'conv2')
        self.conv3 = conv(64, 3, (1, 1), 'conv3')
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
        if self.emulated is not None:
            spec = emulation.nativize_dtype(self.emulated)
            x = emulation.nativize_tensor(flat, spec)
            blstats, chars = x['blstats'], x['chars']
        else:
            # mock layout: blstats (27,) then chars (21,79)
            blstats = flat[:, :27].astype(jnp.int32)
            chars = flat[:, 27:27 + 21 * 79].reshape(batch, 21, 79)

        blstats = jnp.clip(blstats.astype(jnp.int32) + 1, 0, 255)
        bl_flat = self.blstats_embed(blstats).reshape(batch, -1)

        ch = self.char_embed(chars.astype(jnp.int32))  # (B,21,79,32) NHWC
        ch = jax.nn.relu(self.conv1(ch.astype(self.dtype)))
        ch = jax.nn.relu(self.conv2(ch))
        ch = jax.nn.relu(self.conv3(ch))
        ch_flat = ch.reshape(batch, -1)

        concat = jnp.concatenate(
            [bl_flat.astype(self.dtype), ch_flat], axis=1)
        return self.proj(concat).astype(jnp.float32), None

    def decode_actions(self, hidden, lookup=None):
        value = self.critic(hidden.astype(self.dtype)).astype(jnp.float32)
        logits = [actor(hidden.astype(self.dtype)).astype(jnp.float32)
            for actor in self.actors]
        if self.is_multidiscrete:
            return logits, value
        return logits[0], value
