"""Model zoo (flax.linen), TPU-first.

Parity with reference pufferlib/models.py: Default (:12), LSTMWrapper
(:64), Convolutional NatureCNN (:113), ProcgenResnet (:159). Same
encode_observations/decode_actions split so any policy can be wrapped
with the LSTM. Orthogonal CleanRL init (pytorch.py:193).

TPU notes: the LSTM projects inputs for ALL timesteps in one large MXU
matmul, then scans only the recurrent half; convs/linears run in f32
params with optional bf16 activations for MXU throughput.
"""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from pufferlib_tpu import spaces
from pufferlib_tpu.models.distributions import sample_logits
from pufferlib_tpu.models.policy import Policy, RecurrentPolicy, count_params
from pufferlib_tpu.models.transformer import (
    TransformerPolicy, TransformerWrapper)

__all__ = ['Default', 'LSTMWrapper', 'Convolutional', 'ProcgenResnet',
    'TransformerWrapper', 'TransformerPolicy',
    'sample_logits', 'Policy', 'RecurrentPolicy', 'count_params',
    'layer_init_dense']


def orthogonal_init(std=np.sqrt(2)):
    return nn.initializers.orthogonal(scale=std)


def layer_init_dense(features, std=np.sqrt(2), name=None,
        dtype=jnp.float32):
    """CleanRL's layer_init: orthogonal weights, zero bias.

    `dtype` is the compute dtype (bfloat16 doubles MXU throughput and
    halves activation HBM traffic); params always stay float32.
    """
    return nn.Dense(features, kernel_init=orthogonal_init(std),
        bias_init=nn.initializers.zeros, name=name,
        dtype=dtype, param_dtype=jnp.float32)


def _block_orthogonal_init(nvec):
    """Kernel init for the fused [logit blocks | value] head: each block
    orthogonal with CleanRL's stds (0.01 for action decoders, 1.0 for
    the value column), concatenated along the output axis."""
    def init(key, shape, dtype=jnp.float32):
        in_dim, out = shape
        assert out == sum(nvec) + 1
        keys = jax.random.split(key, len(nvec) + 1)
        blocks = [nn.initializers.orthogonal(scale=0.01)(
            k, (in_dim, n), dtype) for k, n in zip(keys, nvec)]
        blocks.append(nn.initializers.orthogonal(scale=1.0)(
            keys[-1], (in_dim, 1), dtype))
        return jnp.concatenate(blocks, axis=1)
    return init


def _torch_linear_init():
    """torch nn.Linear's default weight init (kaiming-uniform with
    a=sqrt(5), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in))) — what the
    reference Default leaves on its encoder (reference models.py:26)."""
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(shape[0])
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def _torch_uniform_init(fan_in):
    """torch nn.Linear's default bias init: U(+-1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(fan_in)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def _torch_head_kernel_init(nvec):
    """Fused-head kernel matching the reference Default exactly: logit
    blocks orthogonal std 0.01 (reference models.py:33-37 layer_init),
    value column torch-default Linear (reference models.py:39 leaves
    value_head at nn.Linear default init)."""
    def init(key, shape, dtype=jnp.float32):
        in_dim, out = shape
        assert out == sum(nvec) + 1
        keys = jax.random.split(key, len(nvec) + 1)
        blocks = [nn.initializers.orthogonal(scale=0.01)(
            k, (in_dim, n), dtype) for k, n in zip(keys, nvec)]
        bound = 1.0 / np.sqrt(in_dim)
        blocks.append(jax.random.uniform(
            keys[-1], (in_dim, 1), dtype, -bound, bound))
        return jnp.concatenate(blocks, axis=1)
    return init


def _torch_head_bias_init(nvec, fan_in):
    """Fused-head bias matching the reference: zeros for the logit
    blocks (layer_init zeroes bias), torch-default U(+-1/sqrt(fan_in))
    for the value element."""
    bound = 1.0 / np.sqrt(fan_in)
    def init(key, shape, dtype=jnp.float32):
        b = jnp.zeros(shape, dtype)
        v = jax.random.uniform(key, (1,), dtype, -bound, bound)
        return b.at[-1:].set(v)
    return init


def _action_info(action_space):
    """(is_multidiscrete, nvec list) for a flat (emulated) action space."""
    if isinstance(action_space, spaces.MultiDiscrete):
        return True, [int(n) for n in action_space.nvec]
    if isinstance(action_space, spaces.Discrete):
        return False, [int(action_space.n)]
    raise ValueError(f'Policies take flat action spaces, got {action_space}')


class Default(nn.Module):
    """Flatten-obs MLP with (multi)discrete decoders and a value head
    (reference models.py:12-62)."""
    obs_shape: tuple
    action_space: object
    hidden_size: int = 128
    dtype: object = jnp.float32
    # emulated-space metadata (vecenv.emulated). When set, byte-packed
    # structured observations are nativized at trace time (free
    # bitcast/slice under XLA) so the MLP sees true typed values
    # instead of raw uint8 bytes — reference Default feeds bytes
    # (models.py:12-62), which conditions terribly for mixed dtypes.
    emulated: object = None
    # True = fused encoder+head Pallas kernel (ops/pallas/mlp.py).
    # MEASURED NEGATIVE on TPU v5e (docs/PERF.md): the pallas operand
    # boundary forces obs re-layout materializations that cost far more
    # than the two matmul dispatches it fuses — default stays on the
    # XLA path (None/False are equivalent). Kept selectable for perf
    # archaeology; incompatible with model-axis meshes (GSPMD cannot
    # partition a pallas_call).
    use_pallas: object = None
    # 'orthogonal' (CleanRL layer_init everywhere, the repo default) or
    # 'torch' (byte-match the reference Default's scheme: torch-default
    # kaiming-uniform encoder + value head with random biases,
    # orthogonal 0.01 decoders — reference models.py:24-39). The init
    # ablation (tools/ablate_init.py, docs/ablate_init_cartpole.json)
    # measured which scheme learns better per env.
    init_style: str = 'orthogonal'

    def setup(self):
        if self.init_style == 'torch':
            self.encoder = nn.Dense(self.hidden_size,
                kernel_init=_torch_linear_init(),
                bias_init=_torch_uniform_init(
                    int(np.prod(self.obs_shape))),
                name='encoder', dtype=self.dtype,
                param_dtype=jnp.float32)
        else:
            self.encoder = layer_init_dense(self.hidden_size,
                name='encoder', dtype=self.dtype)
        is_md, nvec = _action_info(self.action_space)
        self.is_multidiscrete = is_md
        self.nvec = nvec
        # one fused head matmul: [decoder_0 | ... | decoder_k | value].
        # Same per-block orthogonal init as separate heads (std 0.01 for
        # logits, 1.0 for value), one MXU dispatch on the rollout hot path.
        if self.init_style == 'torch':
            head_kernel = _torch_head_kernel_init(nvec)
            head_bias = _torch_head_bias_init(nvec, self.hidden_size)
        else:
            head_kernel = _block_orthogonal_init(nvec)
            head_bias = nn.initializers.zeros
        self.head = nn.Dense(sum(nvec) + 1,
            kernel_init=head_kernel,
            bias_init=head_bias, name='head',
            dtype=self.dtype, param_dtype=jnp.float32)

    def encoder_features(self, observations):
        """Pre-encoder features: flatten + nativize + dtype cast, NO
        Dense. Fused-kernel contract: encode_observations(x) ==
        (relu(encoder_features(x) @ k + b), None) with (k, b) from
        encoder_params() — LSTMWrapper's PUFFER_LSTM_KERNEL=enc5 path
        runs the Dense+relu inside the Pallas LSTM kernel."""
        batch = observations.shape[0]
        x = observations.reshape(batch, -1)
        if self.emulated is not None and np.dtype(
                self.emulated.emulated_observation_dtype).names is not None:
            from pufferlib_tpu import emulation
            spec = emulation.nativize_dtype(self.emulated)
            leaves = jax.tree.leaves(emulation.nativize_tensor(x, spec))
            x = jnp.concatenate(
                [leaf.reshape(batch, -1).astype(self.dtype)
                    for leaf in leaves], axis=1)
        else:
            x = x.astype(self.dtype)
        return x

    def encoder_params(self):
        """(kernel, bias) of the single Dense encoder (see
        encoder_features)."""
        v = self.encoder.variables['params']
        return v['kernel'], v['bias']

    def encode_observations(self, observations):
        x = self.encoder_features(observations)
        return jax.nn.relu(self.encoder(x)), None

    def _split_head_out(self, out):
        """(B, sum(nvec)+1) fused head output -> (logits, value)."""
        value = out[..., -1:]
        if self.is_multidiscrete:
            logits, off = [], 0
            for n in self.nvec:
                logits.append(out[..., off:off + n])
                off += n
            return logits, value
        return out[..., :-1], value

    def decode_actions(self, hidden, lookup=None):
        return self._split_head_out(self.head(hidden).astype(jnp.float32))

    def __call__(self, observations):
        # use_pallas=True only by explicit request (see field comment:
        # measured slower than the XLA path in the fused trainer)
        if self.use_pallas is True and not self.is_initializing():
            from pufferlib_tpu.ops.pallas.mlp import mlp_head_fwd
            # obs are constants in RL training: stop_gradient makes the
            # kernel's zero x-cotangent contract explicit
            x = jax.lax.stop_gradient(self.encoder_features(observations))
            w1, b1 = self.encoder_params()
            hv = self.head.variables['params']
            out = mlp_head_fwd(x, w1, b1, hv['kernel'], hv['bias'],
                self.dtype)
            return self._split_head_out(out)
        hidden, lookup = self.encode_observations(observations)
        return self.decode_actions(hidden, lookup)


class LSTMWrapper(nn.Module):
    """LSTM between encode_observations and decode_actions with shape-safe
    (B,)/(B,T) handling (reference models.py:64-111).

    Input x: (B, *obs_shape) [rollout, T=1] or (B, T, *obs_shape) [BPTT].
    State: (h, c), each (num_layers, B, hidden_size). Matches torch LSTM
    math: gates i,f,g,o; orthogonal weights; zero biases.

    TPU-first: the input projection x@W_ih for all T timesteps is one
    batched MXU matmul outside the scan; only h@W_hh recurs.
    """
    policy: nn.Module
    obs_shape: tuple
    input_size: int = 128
    hidden_size: int = 128
    num_layers: int = 1
    dtype: object = jnp.float32
    # None = auto (Pallas fused time-scan kernel on TPU for T > 1).
    # Set False when sharding the model over a mesh — GSPMD cannot
    # auto-partition a pallas_call.
    use_pallas: object = None

    @nn.compact
    def __call__(self, x, state=None, time_major=False):
        """x: (B, *obs) [T=1], (B, T, *obs), or — with time_major=True —
        (T, B, *obs). Time-major input feeds the scan kernels with ZERO
        transposes (the per-minibatch (B,T)<->(T,B) copies were a
        measured chunk of the LSTM update epoch); logits/values then
        come back flattened in time-major row order, matching
        time-major-flattened action/advantage tensors."""
        space_n = len(self.obs_shape)
        x_shape = tuple(x.shape)
        if x_shape[-space_n:] != tuple(self.obs_shape):
            raise ValueError(f'Invalid input tensor shape {x_shape}')
        if len(x_shape) == space_n + 1:
            B, T = x_shape[0], 1
            time_major = False
        elif len(x_shape) == space_n + 2:
            T, B = x_shape[:2] if time_major else x_shape[:2][::-1]
        else:
            raise ValueError(f'Invalid input tensor shape {x_shape}')

        import os
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = (jax.default_backend() == 'tpu' and T > 1
                and B % 8 == 0)
        # Production kernels are exactly two:
        #   'enc5' (default) — encoder-fused combined-operand cell with
        #     the hoisted backward (gate recompute + activations as one
        #     tall pre-pass matmul, dw/db/dx as tall post-loop matmuls
        #     over a dgates slab shared with the activation scratch;
        #     only the dh chain stays in the reverse loop). Needs the
        #     encoder_features/encoder_params contract.
        #   'cat' — combined gate matmul, encoder outside the kernel;
        #     the automatic fallback for policies without the contract
        #     and the fastest such kernel measured (docs/PERF.md).
        # 'off' forces the pure-XLA scan. The superseded campaign
        # variants (xp/fused/enc and the archived enc2-enc4/tm) stay
        # parity-tested as the infrastructure layers enc5 builds on
        # (ops/pallas/, ops/pallas/archive/; record in docs/PERF.md)
        # but are no longer selectable here.
        kernel_kind = os.environ.get('PUFFER_LSTM_KERNEL', 'enc5') \
            if use_pallas else 'off'
        if kernel_kind not in ('enc5', 'cat', 'off'):
            raise ValueError(
                f'PUFFER_LSTM_KERNEL={kernel_kind!r}: production '
                "kernels are 'enc5' (default), 'cat', or 'off'; the "
                'superseded variants live in pufferlib_tpu/ops/pallas/ '
                'as importable modules (see docs/PERF.md)')
        if kernel_kind == 'off':
            use_pallas = False
        fuse_enc = (kernel_kind == 'enc5' and T > 1
            and self.num_layers == 1 and not self.is_initializing()
            and hasattr(self.policy, 'encoder_features')
            and hasattr(self.policy, 'encoder_params'))

        x = x.reshape((B * T,) + tuple(self.obs_shape))
        if fuse_enc:
            # obs are constants in RL training: stop_gradient makes
            # the kernel's zero feats-cotangent contract explicit
            feats = jax.lax.stop_gradient(
                self.policy.encoder_features(x))
            lookup = None
            F = feats.shape[-1]
            hidden = feats.reshape(
                (T, B, F) if time_major else (B, T, F))
        else:
            hidden, lookup = self.policy.encode_observations(x)
            assert hidden.shape == (B * T, self.input_size)
            if time_major:
                hidden = hidden.reshape(T, B, self.input_size)
            else:
                hidden = hidden.reshape(B, T, self.input_size)

        if state is None:
            h0 = jnp.zeros((self.num_layers, B, self.hidden_size),
                hidden.dtype)
            c0 = jnp.zeros_like(h0)
        else:
            h0, c0 = state

        H = self.hidden_size
        hs, cs = [], []
        layer_in = hidden
        for layer in range(self.num_layers):
            in_size = self.input_size if layer == 0 else H
            w_ih = self.param(f'w_ih_l{layer}', orthogonal_init(1.0),
                (in_size, 4 * H))
            w_hh = self.param(f'w_hh_l{layer}', orthogonal_init(1.0),
                (H, 4 * H))
            b = self.param(f'b_l{layer}', nn.initializers.zeros, (4 * H,))

            # One big MXU matmul for every timestep's input projection.
            # Gate math runs in the compute dtype; the cell state c
            # accumulates in f32 for stability across long horizons.
            cdt = self.dtype

            if T == 1:
                # rollout fast path: one cell step, no scan machinery.
                # Combined-operand form (one [x|h] @ [W_ih;W_hh] MXU
                # dispatch instead of two; the weight concat is
                # loop-invariant, XLA hoists it out of the rollout
                # scan) — same rationale as the cat/enc kernels.
                # layer_in is (1, B, in) time-major, (B, 1, in) otherwise
                x_step = layer_in[0] if time_major else layer_in[:, 0]
                xh = jnp.concatenate(
                    [x_step.astype(cdt),
                        h0[layer].astype(cdt)], axis=-1)
                w_cat = jnp.concatenate(
                    [w_ih, w_hh], axis=0).astype(cdt)
                gates = jnp.dot(xh, w_cat,
                    preferred_element_type=jnp.float32) \
                    + b.astype(jnp.float32)
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                i, f, o = (jax.nn.sigmoid(i), jax.nn.sigmoid(f),
                    jax.nn.sigmoid(o))
                g = jnp.tanh(g)
                c_fin = f * c0[layer] + i * g
                h_fin = o * jnp.tanh(c_fin)
                layer_in = h_fin[None] if time_major else h_fin[:, None, :]
                hs.append(h_fin)
                cs.append(c_fin)
                continue
            # the scan kernels consume (T, B, ...): with time_major
            # input no transpose is needed at all
            def to_tm(v):
                return v if time_major else jnp.swapaxes(v, 0, 1)

            if use_pallas:
                # kernel_kind/fuse_enc chosen above (docstring there)
                if fuse_enc and layer == 0:
                    from pufferlib_tpu.ops.pallas.lstm_enc5 import (
                        lstm_scan_enc5 as lstm_scan_enc)
                    w_enc, b_enc = self.policy.encoder_params()
                    # same contract the non-fused branch asserts on
                    # encode_observations' output: the encoder must
                    # produce input_size features for w_ih
                    assert w_enc.shape[-1] == self.input_size, (
                        f'policy encoder emits {w_enc.shape[-1]} '
                        f'features but LSTMWrapper.input_size='
                        f'{self.input_size}')
                    outs, h_fin, c_fin = lstm_scan_enc(
                        to_tm(layer_in).astype(cdt), h0[layer],
                        c0[layer], w_enc, b_enc, w_ih, w_hh, b, cdt)
                    layer_in = to_tm(outs)
                    hs.append(h_fin)
                    cs.append(c_fin)
                    continue
                # combined-operand kernel: encoder (if any) runs
                # outside; one [x|h] @ [W_ih;W_hh] gate matmul per step
                from pufferlib_tpu.ops.pallas.lstm_cat import (
                    lstm_scan_cat)
                outs, h_fin, c_fin = lstm_scan_cat(
                    to_tm(layer_in).astype(cdt), h0[layer],
                    c0[layer], w_ih, w_hh, b, cdt)
                layer_in = to_tm(outs)
                hs.append(h_fin)
                cs.append(c_fin)
                continue
            else:
                xp_t = (to_tm(layer_in).astype(cdt)
                    @ w_ih.astype(cdt)) + b.astype(cdt)  # (T, B, 4H)
                def cell(carry, xt):
                    h, c = carry
                    gates = (xt.astype(jnp.float32)
                        + (h.astype(cdt) @ w_hh.astype(cdt)
                        ).astype(jnp.float32))
                    i, f, g, o = jnp.split(gates, 4, axis=-1)
                    i, f, o = (jax.nn.sigmoid(i), jax.nn.sigmoid(f),
                        jax.nn.sigmoid(o))
                    g = jnp.tanh(g)
                    c = f * c + i * g
                    h = o * jnp.tanh(c)
                    return (h, c), h

                (h_fin, c_fin), outs = jax.lax.scan(
                    cell, (h0[layer], c0[layer]), xp_t)  # scan over T
            layer_in = to_tm(outs)  # back to the input's layout
            hs.append(h_fin)
            cs.append(c_fin)

        new_state = (jnp.stack(hs), jnp.stack(cs))
        flat = layer_in.reshape(B * T, H)
        logits, value = self.policy.decode_actions(flat, lookup)
        return logits, value, new_state

    def initial_state(self, batch_size, dtype=jnp.float32):
        shape = (self.num_layers, batch_size, self.hidden_size)
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


class Convolutional(nn.Module):
    """NatureCNN for Atari (reference models.py:113-157). NCHW input
    unless channels_last; divides by 255."""
    action_space: object
    framestack: int
    flat_size: int
    obs_shape: tuple = None  # accepted for factory-contract uniformity
    hidden_size: int = 512
    channels_last: bool = False
    downsample: int = 1
    dtype: object = jnp.float32

    def setup(self):
        conv = lambda f, k, s, name: nn.Conv(f, (k, k), strides=(s, s),
            padding='VALID', kernel_init=orthogonal_init(),
            bias_init=nn.initializers.zeros, name=name,
            dtype=self.dtype, param_dtype=jnp.float32)
        self.conv1 = conv(32, 8, 4, 'conv1')
        self.conv2 = conv(64, 4, 2, 'conv2')
        self.conv3 = conv(64, 3, 1, 'conv3')
        self.fc = layer_init_dense(self.hidden_size, name='fc',
            dtype=self.dtype)
        is_md, nvec = _action_info(self.action_space)
        self.is_multidiscrete = is_md
        self.decoders = [layer_init_dense(n, std=0.01, name=f'actor_{i}',
            dtype=self.dtype) for i, n in enumerate(nvec)]
        self.value_fn = layer_init_dense(1, std=1.0, name='value_fn',
            dtype=self.dtype)

    def encode_observations(self, observations):
        x = observations.astype(self.dtype) / jnp.asarray(255.0, self.dtype)
        if not self.channels_last:
            # stored NCHW (torch layout); convert to NHWC for TPU convs
            x = jnp.transpose(x, (0, 2, 3, 1))
        if self.downsample > 1:
            x = x[:, ::self.downsample, ::self.downsample, :]
        x = jax.nn.relu(self.conv1(x))
        x = jax.nn.relu(self.conv2(x))
        x = jax.nn.relu(self.conv3(x))
        x = x.reshape(x.shape[0], -1)
        return jax.nn.relu(self.fc(x)), None

    def decode_actions(self, hidden, lookup=None):
        value = self.value_fn(hidden).astype(jnp.float32)
        if self.is_multidiscrete:
            return [dec(hidden).astype(jnp.float32)
                for dec in self.decoders], value
        return self.decoders[0](hidden).astype(jnp.float32), value

    def __call__(self, observations):
        hidden, lookup = self.encode_observations(observations)
        return self.decode_actions(hidden, lookup)


class _ResidualBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        y = jax.nn.relu(x)
        y = nn.Conv(self.channels, (3, 3), padding='SAME')(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding='SAME')(y)
        return x + y


class _ConvSequence(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, (3, 3), padding='SAME')(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding='SAME')
        x = _ResidualBlock(self.out_channels)(x)
        x = _ResidualBlock(self.out_channels)(x)
        return x


class ProcgenResnet(nn.Module):
    """IMPALA-style resnet (reference models.py:159-196). NHWC input.
    setup()-based so encode/decode can be called separately (required
    for LSTMWrapper composition)."""
    action_space: object
    cnn_width: int = 16
    mlp_width: int = 256
    obs_shape: tuple = None  # accepted for factory-contract uniformity

    def setup(self):
        widths = [self.cnn_width, 2 * self.cnn_width, 2 * self.cnn_width]
        self.sequences = [_ConvSequence(ch, name=f'seq_{i}')
            for i, ch in enumerate(widths)]
        self.fc = nn.Dense(self.mlp_width, name='fc')
        is_md, nvec = _action_info(self.action_space)
        self.is_multidiscrete = is_md
        self.actors = [layer_init_dense(n, std=0.01, name=f'actor_{i}')
            for i, n in enumerate(nvec)]
        self.value_head = layer_init_dense(1, std=1.0, name='value')

    def __call__(self, observations):
        hidden, lookup = self.encode_observations(observations)
        return self.decode_actions(hidden, lookup)

    def encode_observations(self, x):
        x = x.astype(jnp.float32) / 255.0
        for seq in self.sequences:
            x = seq(x)
        x = x.reshape(x.shape[0], -1)
        x = jax.nn.relu(x)
        return jax.nn.relu(self.fc(x)), None

    def decode_actions(self, hidden, lookup=None):
        value = self.value_head(hidden)
        logits = [actor(hidden) for actor in self.actors]
        if self.is_multidiscrete:
            return logits, value
        return logits[0], value
