"""Pallas kernels vs their pure-JAX references (interpret mode on CPU)."""
import numpy as np
import jax
import pytest

from pufferlib_tpu.ops import compute_gae
from pufferlib_tpu.ops.pallas import compute_gae_pallas


def test_pallas_gae_matches_scan():
    rng = np.random.RandomState(0)
    T, E = 32, 300  # non-multiple of the lane tile exercises padding
    rewards = rng.randn(T, E).astype(np.float32)
    values = rng.randn(T, E).astype(np.float32)
    dones = (rng.rand(T, E) < 0.1).astype(np.float32)
    last_value = rng.randn(E).astype(np.float32)

    expected = np.asarray(compute_gae(
        rewards, values, dones, last_value, 0.99, 0.95))
    got = np.asarray(compute_gae_pallas(
        rewards, values, dones, last_value, 0.99, 0.95, interpret=True))
    assert np.allclose(got, expected, atol=1e-5)


def test_pallas_gae_all_done():
    T, E = 8, 128
    rewards = np.ones((T, E), np.float32)
    values = np.zeros((T, E), np.float32)
    dones = np.ones((T, E), np.float32)
    last_value = np.full(E, 100.0, np.float32)
    got = np.asarray(compute_gae_pallas(
        rewards, values, dones, last_value, 0.99, 0.95, interpret=True))
    assert np.allclose(got, 1.0)


def test_pallas_lstm_scan_matches_reference():
    """Fused LSTM time-scan kernel (ops/pallas/lstm.py): forward and
    custom-VJP backward match the pure-JAX scan (interpret mode on CPU)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from pufferlib_tpu.ops.pallas.lstm import lstm_scan, lstm_scan_reference

    T, B, H = 3, 16, 128
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    xp = jax.random.normal(k[0], (T, B, 4 * H), jnp.float32) * 0.5
    h0 = jax.random.normal(k[1], (B, H), jnp.float32) * 0.1
    c0 = jax.random.normal(k[2], (B, H), jnp.float32) * 0.1
    whh = jax.random.normal(k[3], (H, 4 * H), jnp.float32) * 0.1

    with pltpu.force_tpu_interpret_mode():
        outs_p, hT_p, cT_p = lstm_scan(xp, h0, c0, whh, jnp.float32)
    outs_r, hT_r, cT_r = lstm_scan_reference(xp, h0, c0, whh, jnp.float32)
    assert jnp.allclose(outs_p, outs_r, atol=1e-5)
    assert jnp.allclose(hT_p, hT_r, atol=1e-5)
    assert jnp.allclose(cT_p, cT_r, atol=1e-5)

    def loss_p(xp, h0, c0, whh):
        o, h, c = lstm_scan(xp, h0, c0, whh, jnp.float32)
        return jnp.sum(o ** 2) + jnp.sum(h * c)

    def loss_r(xp, h0, c0, whh):
        o, h, c = lstm_scan_reference(xp, h0, c0, whh, jnp.float32)
        return jnp.sum(o ** 2) + jnp.sum(h * c)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(xp, h0, c0, whh)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(xp, h0, c0, whh)
    for a, b in zip(gp, gr):
        assert jnp.allclose(a, b, atol=5e-4), float(jnp.abs(a - b).max())


def test_pallas_lstm_fused_projection_matches_reference():
    """Fused-projection kernel (lstm_scan_fused): the x @ W_ih + b
    projection runs inside the kernel; forward and custom-VJP backward
    (incl. dW_ih, db) must match the pure-JAX reference."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from pufferlib_tpu.ops.pallas.lstm import (
        lstm_scan_fused, lstm_scan_fused_reference)

    T, B, D, H = 3, 16, 96, 128
    k = jax.random.split(jax.random.PRNGKey(1), 6)
    x = jax.random.normal(k[0], (T, B, D), jnp.float32) * 0.5
    h0 = jax.random.normal(k[1], (B, H), jnp.float32) * 0.1
    c0 = jax.random.normal(k[2], (B, H), jnp.float32) * 0.1
    wih = jax.random.normal(k[3], (D, 4 * H), jnp.float32) * 0.1
    whh = jax.random.normal(k[4], (H, 4 * H), jnp.float32) * 0.1
    b = jax.random.normal(k[5], (4 * H,), jnp.float32) * 0.1

    with pltpu.force_tpu_interpret_mode():
        outs_p, hT_p, cT_p = lstm_scan_fused(
            x, h0, c0, wih, whh, b, jnp.float32)
    outs_r, hT_r, cT_r = lstm_scan_fused_reference(
        x, h0, c0, wih, whh, b, jnp.float32)
    assert jnp.allclose(outs_p, outs_r, atol=1e-5)
    assert jnp.allclose(hT_p, hT_r, atol=1e-5)
    assert jnp.allclose(cT_p, cT_r, atol=1e-5)

    def loss(fn):
        def f(x, h0, c0, wih, whh, b):
            o, h, c = fn(x, h0, c0, wih, whh, b, jnp.float32)
            return jnp.sum(o ** 2) + jnp.sum(h * c) + jnp.sum(o * 0.3)
        return f

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss(lstm_scan_fused), argnums=(0, 1, 2, 3, 4, 5))(
            x, h0, c0, wih, whh, b)
    gr = jax.grad(loss(lstm_scan_fused_reference),
        argnums=(0, 1, 2, 3, 4, 5))(x, h0, c0, wih, whh, b)
    for a, bb in zip(gp, gr):
        assert a.shape == bb.shape
        assert jnp.allclose(a, bb, atol=5e-4), float(jnp.abs(a - bb).max())


def test_pallas_lstm_cat_matches_reference():
    """Combined-operand kernel (lstm_scan_cat): gates computed as one
    [x|h] @ [W_ih;W_hh] matmul; forward and custom-VJP backward (incl.
    dW_ih, dW_hh, db) must match the pure-JAX reference."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from pufferlib_tpu.ops.pallas.lstm import lstm_scan_fused_reference
    from pufferlib_tpu.ops.pallas.lstm_cat import lstm_scan_cat

    T, B, D, H = 3, 16, 96, 128
    k = jax.random.split(jax.random.PRNGKey(2), 6)
    x = jax.random.normal(k[0], (T, B, D), jnp.float32) * 0.5
    h0 = jax.random.normal(k[1], (B, H), jnp.float32) * 0.1
    c0 = jax.random.normal(k[2], (B, H), jnp.float32) * 0.1
    wih = jax.random.normal(k[3], (D, 4 * H), jnp.float32) * 0.1
    whh = jax.random.normal(k[4], (H, 4 * H), jnp.float32) * 0.1
    b = jax.random.normal(k[5], (4 * H,), jnp.float32) * 0.1

    with pltpu.force_tpu_interpret_mode():
        outs_p, hT_p, cT_p = lstm_scan_cat(
            x, h0, c0, wih, whh, b, jnp.float32)
    outs_r, hT_r, cT_r = lstm_scan_fused_reference(
        x, h0, c0, wih, whh, b, jnp.float32)
    assert jnp.allclose(outs_p, outs_r, atol=1e-5)
    assert jnp.allclose(hT_p, hT_r, atol=1e-5)
    assert jnp.allclose(cT_p, cT_r, atol=1e-5)

    def loss(fn):
        def f(x, h0, c0, wih, whh, b):
            o, h, c = fn(x, h0, c0, wih, whh, b, jnp.float32)
            return jnp.sum(o ** 2) + jnp.sum(h * c) + jnp.sum(o * 0.3)
        return f

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss(lstm_scan_cat), argnums=(0, 1, 2, 3, 4, 5))(
            x, h0, c0, wih, whh, b)
    gr = jax.grad(loss(lstm_scan_fused_reference),
        argnums=(0, 1, 2, 3, 4, 5))(x, h0, c0, wih, whh, b)
    for a, bb in zip(gp, gr):
        assert a.shape == bb.shape
        assert jnp.allclose(a, bb, atol=5e-4), float(jnp.abs(a - bb).max())


def test_pallas_lstm_enc_matches_reference():
    """Encoder-fused kernel (lstm_scan_enc): relu(feats @ W_enc +
    b_enc) runs inside the kernel as a per-tile pre-pass; forward and
    custom-VJP backward (incl. dW_enc, db_enc) must match the pure-JAX
    reference. The feats cotangent is zero by contract."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from pufferlib_tpu.ops.pallas.lstm_enc import (
        lstm_scan_enc, lstm_scan_enc_reference)

    T, B, F, D, H = 3, 16, 49, 96, 128
    k = jax.random.split(jax.random.PRNGKey(5), 8)
    feats = jax.random.normal(k[0], (T, B, F), jnp.float32) * 0.5
    h0 = jax.random.normal(k[1], (B, H), jnp.float32) * 0.1
    c0 = jax.random.normal(k[2], (B, H), jnp.float32) * 0.1
    we = jax.random.normal(k[3], (F, D), jnp.float32) * 0.1
    be = jax.random.normal(k[4], (D,), jnp.float32) * 0.1
    wih = jax.random.normal(k[5], (D, 4 * H), jnp.float32) * 0.1
    whh = jax.random.normal(k[6], (H, 4 * H), jnp.float32) * 0.1
    b = jax.random.normal(k[7], (4 * H,), jnp.float32) * 0.1
    args = (feats, h0, c0, we, be, wih, whh, b)

    with pltpu.force_tpu_interpret_mode():
        outs_p, hT_p, cT_p = lstm_scan_enc(*args, jnp.float32)
    outs_r, hT_r, cT_r = lstm_scan_enc_reference(*args, jnp.float32)
    assert jnp.allclose(outs_p, outs_r, atol=1e-5)
    assert jnp.allclose(hT_p, hT_r, atol=1e-5)
    assert jnp.allclose(cT_p, cT_r, atol=1e-5)

    def loss(fn):
        def f(*a):
            o, h, c = fn(*a, jnp.float32)
            return jnp.sum(o ** 2) + jnp.sum(h * c) + jnp.sum(o * 0.3)
        return f

    # grads wrt everything except feats (zero by contract)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss(lstm_scan_enc),
            argnums=(1, 2, 3, 4, 5, 6, 7))(*args)
    gr = jax.grad(loss(lstm_scan_enc_reference),
        argnums=(1, 2, 3, 4, 5, 6, 7))(*args)
    for a, bb in zip(gp, gr):
        assert a.shape == bb.shape
        assert jnp.allclose(a, bb, atol=5e-4), float(jnp.abs(a - bb).max())


def test_pallas_lstm_enc5_matches_reference():
    """Batched-recompute + hoisted-grads variant (lstm_scan_enc5): the
    acts and dgates share one scratch slab; pre/post tall matmuls do
    all non-recurrent work. Numerics must match the pure-JAX
    reference."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from pufferlib_tpu.ops.pallas.lstm_enc import lstm_scan_enc_reference
    from pufferlib_tpu.ops.pallas.lstm_enc5 import lstm_scan_enc5

    T, B, F, D, H = 3, 16, 49, 96, 128
    k = jax.random.split(jax.random.PRNGKey(13), 8)
    feats = jax.random.normal(k[0], (T, B, F), jnp.float32) * 0.5
    h0 = jax.random.normal(k[1], (B, H), jnp.float32) * 0.1
    c0 = jax.random.normal(k[2], (B, H), jnp.float32) * 0.1
    we = jax.random.normal(k[3], (F, D), jnp.float32) * 0.1
    be = jax.random.normal(k[4], (D,), jnp.float32) * 0.1
    wih = jax.random.normal(k[5], (D, 4 * H), jnp.float32) * 0.1
    whh = jax.random.normal(k[6], (H, 4 * H), jnp.float32) * 0.1
    b = jax.random.normal(k[7], (4 * H,), jnp.float32) * 0.1
    args = (feats, h0, c0, we, be, wih, whh, b)

    with pltpu.force_tpu_interpret_mode():
        outs_p, hT_p, cT_p = lstm_scan_enc5(*args, jnp.float32)
    outs_r, hT_r, cT_r = lstm_scan_enc_reference(*args, jnp.float32)
    assert jnp.allclose(outs_p, outs_r, atol=1e-5)
    assert jnp.allclose(hT_p, hT_r, atol=1e-5)
    assert jnp.allclose(cT_p, cT_r, atol=1e-5)

    def loss(fn):
        def f(*a):
            o, h, c = fn(*a, jnp.float32)
            return jnp.sum(o ** 2) + jnp.sum(h * c) + jnp.sum(o * 0.3)
        return f

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss(lstm_scan_enc5),
            argnums=(1, 2, 3, 4, 5, 6, 7))(*args)
    gr = jax.grad(loss(lstm_scan_enc_reference),
        argnums=(1, 2, 3, 4, 5, 6, 7))(*args)
    for a, bb in zip(gp, gr):
        assert a.shape == bb.shape
        assert jnp.allclose(a, bb, atol=5e-4), float(jnp.abs(a - bb).max())


def test_lstm_wrapper_enc_kernel_matches_plain(monkeypatch):
    """LSTMWrapper with PUFFER_LSTM_KERNEL=enc5 (the default: encoder
    fused into the kernel via the encoder_features/encoder_params
    contract) matches the pure-scan path on the same params, in both
    (B, T) and time-major layouts."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from pufferlib_tpu.models import Default, LSTMWrapper

    obs_shape = (7,)
    B, T = 8, 4
    from pufferlib_tpu import spaces
    mod = lambda use_pallas: LSTMWrapper(
        policy=Default(obs_shape=obs_shape,
            action_space=spaces.Discrete(5), hidden_size=32),
        obs_shape=obs_shape, input_size=32, hidden_size=32,
        use_pallas=use_pallas)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T) + obs_shape)
    m_plain = mod(False)
    params = m_plain.init(jax.random.PRNGKey(1), x)
    lo_p, v_p, (h_p, c_p) = m_plain.apply(params, x)

    monkeypatch.setenv('PUFFER_LSTM_KERNEL', 'enc5')
    m_enc = mod(True)
    with pltpu.force_tpu_interpret_mode():
        lo_f, v_f, (h_f, c_f) = m_enc.apply(params, x)
    assert jnp.allclose(lo_f, lo_p, atol=1e-5)
    assert jnp.allclose(v_f, v_p, atol=1e-5)
    assert jnp.allclose(h_f, h_p, atol=1e-5)
    assert jnp.allclose(c_f, c_p, atol=1e-5)

    # time-major layout (the trainer's update path)
    xt = jnp.swapaxes(x, 0, 1)
    lo_pt, v_pt, (h_pt, c_pt) = m_plain.apply(
        params, xt, time_major=True)
    with pltpu.force_tpu_interpret_mode():
        lo_ft, v_ft, (h_ft, c_ft) = m_enc.apply(
            params, xt, time_major=True)
    assert jnp.allclose(lo_ft, lo_pt, atol=1e-5)
    assert jnp.allclose(v_ft, v_pt, atol=1e-5)
    assert jnp.allclose(h_ft, h_pt, atol=1e-5)
    assert jnp.allclose(c_ft, c_pt, atol=1e-5)

    # gradient parity wrt params (incl. the encoder, whose backward
    # runs inside the kernel on the enc path)
    def loss(m):
        def f(p):
            lo, v, _ = m.apply(p, x)
            return (jnp.sum(jax.nn.log_softmax(lo) ** 2)
                + jnp.sum(v * 0.7))
        return f
    g_p = jax.grad(loss(m_plain))(params)
    with pltpu.force_tpu_interpret_mode():
        g_f = jax.grad(loss(m_enc))(params)
    flat_p = jax.tree.leaves_with_path(g_p)
    flat_f = dict(jax.tree.leaves_with_path(g_f))
    for path, leaf in flat_p:
        other = flat_f[path]
        assert jnp.allclose(leaf, other, atol=5e-4), (
            path, float(jnp.abs(leaf - other).max()))


def test_lstm_wrapper_cat_kernel_matches_plain(monkeypatch):
    """LSTMWrapper with PUFFER_LSTM_KERNEL=cat (the no-encoder-contract
    fallback) matches the pure-scan path on the same params."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from pufferlib_tpu.models import Default, LSTMWrapper

    obs_shape = (7,)
    B, T = 8, 4
    from pufferlib_tpu import spaces
    mod = lambda use_pallas: LSTMWrapper(
        policy=Default(obs_shape=obs_shape,
            action_space=spaces.Discrete(5), hidden_size=32),
        obs_shape=obs_shape, input_size=32, hidden_size=32,
        use_pallas=use_pallas)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T) + obs_shape)
    m_plain = mod(False)
    params = m_plain.init(jax.random.PRNGKey(1), x)
    lo_p, v_p, (h_p, c_p) = m_plain.apply(params, x)

    monkeypatch.setenv('PUFFER_LSTM_KERNEL', 'cat')
    m_cat = mod(True)
    with pltpu.force_tpu_interpret_mode():
        lo_f, v_f, (h_f, c_f) = m_cat.apply(params, x)
    assert jnp.allclose(lo_f, lo_p, atol=1e-5)
    assert jnp.allclose(v_f, v_p, atol=1e-5)
    assert jnp.allclose(h_f, h_p, atol=1e-5)
    assert jnp.allclose(c_f, c_p, atol=1e-5)


def test_lstm_wrapper_rejects_superseded_kernel_selector(monkeypatch):
    """Superseded campaign variants (fused/xp/enc/enc2-4/tm) are no
    longer dispatchable from LSTMWrapper: an unknown
    PUFFER_LSTM_KERNEL raises, naming the production set. Raw-kernel
    parity for the superseded entry points lives above and in
    tests/test_pallas_archive.py."""
    import jax
    import pytest
    from pufferlib_tpu.models import Default, LSTMWrapper

    obs_shape = (7,)
    from pufferlib_tpu import spaces
    m = LSTMWrapper(
        policy=Default(obs_shape=obs_shape,
            action_space=spaces.Discrete(5), hidden_size=32),
        obs_shape=obs_shape, input_size=32, hidden_size=32,
        use_pallas=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4) + obs_shape)
    params = LSTMWrapper(
        policy=Default(obs_shape=obs_shape,
            action_space=spaces.Discrete(5), hidden_size=32),
        obs_shape=obs_shape, input_size=32, hidden_size=32,
        use_pallas=False).init(jax.random.PRNGKey(1), x)

    monkeypatch.setenv('PUFFER_LSTM_KERNEL', 'fused')
    with pytest.raises(ValueError, match='enc5'):
        m.apply(params, x)



def test_mlp_head_fwd_matches_reference():
    """Fused MLP forward kernel (ops/pallas/mlp.py): output and
    custom-VJP weight grads match the pure-JAX composition (interpret
    mode on CPU). x-cotangent is zero by contract."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from pufferlib_tpu.ops.pallas.mlp import (
        mlp_head_fwd, mlp_head_reference)

    B, F, H, O = 24, 49, 32, 9
    k = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(k[0], (B, F), jnp.float32)
    w1 = jax.random.normal(k[1], (F, H), jnp.float32) * 0.3
    b1 = jax.random.normal(k[2], (H,), jnp.float32) * 0.1
    w2 = jax.random.normal(k[3], (H, O), jnp.float32) * 0.3
    b2 = jax.random.normal(k[4], (O,), jnp.float32) * 0.1

    with pltpu.force_tpu_interpret_mode():
        out = mlp_head_fwd(x, w1, b1, w2, b2, jnp.float32)
    ref = mlp_head_reference(x, w1, b1, w2, b2, jnp.float32)
    assert out.dtype == jnp.float32
    assert jnp.allclose(out, ref, atol=1e-5)

    def loss_k(w1, b1, w2, b2):
        o = mlp_head_fwd(x, w1, b1, w2, b2, jnp.float32)
        return jnp.sum(o ** 2)

    def loss_r(w1, b1, w2, b2):
        o = mlp_head_reference(x, w1, b1, w2, b2, jnp.float32)
        return jnp.sum(o ** 2)

    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(w1, b1, w2, b2)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(w1, b1, w2, b2)
    for a, b in zip(gk, gr):
        assert jnp.allclose(a, b, atol=1e-4), (a - b)


def test_default_fused_path_matches_plain():
    """Default(use_pallas=True) — the rollout hot-path fused kernel —
    produces the same logits/value as the plain XLA path on the same
    params, including the emulated-Dict nativize front end."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from pufferlib_tpu import spaces
    from pufferlib_tpu.models import Default

    obs_shape = (7, 7)
    B = 16
    mk = lambda up: Default(obs_shape=obs_shape,
        action_space=spaces.MultiDiscrete([3, 4]), hidden_size=32,
        use_pallas=up)
    x = jax.random.normal(jax.random.PRNGKey(0), (B,) + obs_shape)
    m_plain = mk(False)
    params = m_plain.init(jax.random.PRNGKey(1), x)
    lo_p, v_p = m_plain.apply(params, x)

    with pltpu.force_tpu_interpret_mode():
        lo_f, v_f = mk(True).apply(params, x)
    for a, b in zip(lo_f, lo_p):
        assert jnp.allclose(a, b, atol=1e-5)
    assert jnp.allclose(v_f, v_p, atol=1e-5)
