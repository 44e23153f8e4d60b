"""Default policy init schemes (models/__init__.py init_style).

init_style='torch' must reproduce the reference Default's scheme
(reference models.py:24-39): torch-default kaiming-uniform encoder and
value head (U(+-1/sqrt(fan_in)) weight AND bias — nn.Linear's default)
with orthogonal std-0.01 zero-bias logit decoders. The 4-arm ablation
(docs/ablate_init_cartpole.json) showed this is learning-relevant:
on 4-dim-obs CartPole the init swings the 204.8k-step tail 61 <-> 128
on BOTH stacks, so the scheme is part of the parity surface.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pufferlib_tpu import spaces
from pufferlib_tpu.models import Default, Policy


def _params(init_style, obs_dim=4, n_actions=2, hidden=128):
    m = Default(obs_shape=(obs_dim,), action_space=spaces.Discrete(
        n_actions), hidden_size=hidden, init_style=init_style)
    p = Policy(m)
    params = p.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)))
    return params['params'], obs_dim, n_actions, hidden


def test_torch_init_matches_reference_scheme():
    params, obs_dim, n_actions, hidden = _params('torch')
    enc_k = np.asarray(params['encoder']['kernel'])
    enc_b = np.asarray(params['encoder']['bias'])
    head_k = np.asarray(params['head']['kernel'])
    head_b = np.asarray(params['head']['bias'])

    # encoder: U(+-1/sqrt(fan_in)) for weight AND bias, like torch
    # nn.Linear's default (kaiming-uniform a=sqrt(5))
    bound = 1.0 / np.sqrt(obs_dim)
    assert np.abs(enc_k).max() <= bound and np.abs(enc_k).max() > 0.8 * bound
    assert np.abs(enc_b).max() <= bound and np.abs(enc_b).max() > 0.0
    # uniform, not normal/orthogonal: std ~= bound/sqrt(3)
    assert abs(enc_k.std() - bound / np.sqrt(3)) < 0.1 * bound

    # cross-check the scale against an ACTUAL torch Linear default init
    torch = pytest.importorskip('torch')
    with torch.no_grad():
        lin = torch.nn.Linear(obs_dim, hidden)
        t_k = lin.weight.numpy()
    assert abs(np.abs(t_k).max() - np.abs(enc_k).max()) < 0.15 * bound

    # head: logit block orthogonal std 0.01 with zero bias; value
    # column torch-default with uniform bias
    logit_k, value_k = head_k[:, :n_actions], head_k[:, -1]
    vb = 1.0 / np.sqrt(hidden)
    assert np.allclose(
        np.linalg.norm(logit_k, axis=0), 0.01, atol=2e-3)
    assert np.abs(value_k).max() <= vb
    assert np.all(head_b[:n_actions] == 0.0)
    assert head_b[-1] != 0.0 and abs(head_b[-1]) <= vb


def test_orthogonal_init_is_default():
    params, obs_dim, n_actions, hidden = _params('orthogonal')
    enc_k = np.asarray(params['encoder']['kernel'])
    enc_b = np.asarray(params['encoder']['bias'])
    head_b = np.asarray(params['head']['bias'])

    # CleanRL layer_init: semi-orthogonal rows scaled sqrt(2), zero bias
    rows = enc_k @ enc_k.T
    assert np.allclose(rows, 2.0 * np.eye(obs_dim), atol=1e-4)
    assert np.all(enc_b == 0.0)
    assert np.all(head_b == 0.0)

    # the two styles produce the same param tree structure
    torch_params = _params('torch')[0]
    assert jax.tree.structure(params) == jax.tree.structure(torch_params)


def test_both_styles_run_forward():
    for style in ('orthogonal', 'torch'):
        m = Default(obs_shape=(4,), action_space=spaces.Discrete(2),
            hidden_size=32, init_style=style)
        p = Policy(m)
        params = p.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
        a, logprob, ent, value = p(
            params, jnp.zeros((3, 4)), key=jax.random.PRNGKey(1))
        assert a.shape == (3,) and value.shape == (3, 1)
