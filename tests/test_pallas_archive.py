"""Archived LSTM kernel variants (ops/pallas/archive/): superseded
steps of the kernel campaign (docs/PERF.md), kept runnable but off the
production import path. One parity check each against the pure-JAX
reference keeps the archive from silently rotting as the live shared
infrastructure (lstm.py/_tile_budget, lstm_cat._act, lstm_enc._impl,
lstm_enc5._hoisted_bwd) evolves."""
import numpy as np
import pytest


def _enc_args(seed):
    import jax
    import jax.numpy as jnp
    T, B, F, D, H = 3, 16, 49, 96, 128
    k = jax.random.split(jax.random.PRNGKey(seed), 8)
    return (
        jax.random.normal(k[0], (T, B, F), jnp.float32) * 0.5,
        jax.random.normal(k[1], (B, H), jnp.float32) * 0.1,
        jax.random.normal(k[2], (B, H), jnp.float32) * 0.1,
        jax.random.normal(k[3], (F, D), jnp.float32) * 0.1,
        jax.random.normal(k[4], (D,), jnp.float32) * 0.1,
        jax.random.normal(k[5], (D, 4 * H), jnp.float32) * 0.1,
        jax.random.normal(k[6], (H, 4 * H), jnp.float32) * 0.1,
        jax.random.normal(k[7], (4 * H,), jnp.float32) * 0.1,
    )


@pytest.mark.parametrize('variant', ['enc2', 'enc3', 'enc4', 'enc6'])
def test_archived_enc_variant_matches_reference(variant):
    import importlib
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from pufferlib_tpu.ops.pallas.lstm_enc import lstm_scan_enc_reference

    mod = importlib.import_module(
        f'pufferlib_tpu.ops.pallas.archive.lstm_{variant}')
    scan = getattr(mod, f'lstm_scan_{variant}')
    args = _enc_args(7)

    with pltpu.force_tpu_interpret_mode():
        outs_p, hT_p, cT_p = scan(*args, jnp.float32)
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
        gp = jax.grad(loss(scan), argnums=(1, 2, 3, 4, 5, 6, 7))(*args)
    gr = jax.grad(loss(lstm_scan_enc_reference),
        argnums=(1, 2, 3, 4, 5, 6, 7))(*args)
    for a, bb in zip(gp, gr):
        assert a.shape == bb.shape
        assert jnp.allclose(a, bb, atol=5e-4), float(jnp.abs(a - bb).max())


def test_archived_time_major_matches_reference():
    """Experimental time-major-grid kernel (archive/lstm_tm.py):
    forward and custom-VJP backward match the pure-JAX scan."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from pufferlib_tpu.ops.pallas.lstm import lstm_scan_reference
    from pufferlib_tpu.ops.pallas.archive.lstm_tm import lstm_scan_tm

    T, B, H = 5, 16, 8
    rng = np.random.RandomState(3)
    xp = jnp.asarray(rng.randn(T, B, 4 * H).astype(np.float32) * 0.3)
    h0 = jnp.asarray(rng.randn(B, H).astype(np.float32) * 0.2)
    c0 = jnp.asarray(rng.randn(B, H).astype(np.float32) * 0.2)
    whh = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32) * 0.2)

    with pltpu.force_tpu_interpret_mode():
        outs, hT, cT = lstm_scan_tm(xp, h0, c0, whh, jnp.float32)
        ro, rh, rc = lstm_scan_reference(xp, h0, c0, whh)
        assert np.allclose(np.asarray(outs), np.asarray(ro), atol=1e-6)
        assert np.allclose(np.asarray(hT), np.asarray(rh), atol=1e-6)
        assert np.allclose(np.asarray(cT), np.asarray(rc), atol=1e-6)

        def loss(fn):
            def f(xp, h0, c0, w):
                o, h, c = fn(xp, h0, c0, w) if fn is lstm_scan_reference \
                    else fn(xp, h0, c0, w, jnp.float32)
                return (jnp.sum(o * 0.7) + jnp.sum(h * 1.3)
                    + jnp.sum(c * 0.5))
            return f

        g_tm = jax.grad(loss(lstm_scan_tm), argnums=(0, 1, 2, 3))(
            xp, h0, c0, whh)
        g_rf = jax.grad(loss(lstm_scan_reference), argnums=(0, 1, 2, 3))(
            xp, h0, c0, whh)
        for a, b in zip(g_tm, g_rf):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
