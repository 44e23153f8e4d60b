"""Torch-checkpoint import: converted reference policies must produce
the SAME outputs as the torch originals (reference models.py:12-111).

Builds the actual reference Default / LSTMWrapper modules (via the
tools/ref_trainer.py shims) on reference envs, converts their
state_dicts with frameworks.torch_import, and compares logits/values/
LSTM states on random observation batches.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')

REF = '/root/reference'
if not os.path.exists(os.path.join(REF, 'clean_pufferl.py')):
    pytest.skip('reference tree not present', allow_module_level=True)

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tools'))

import jax.numpy as jnp  # noqa: E402

import ref_trainer  # noqa: E402
from pufferlib_tpu import spaces  # noqa: E402
from pufferlib_tpu.frameworks import torch_import  # noqa: E402
from pufferlib_tpu.models import Default, LSTMWrapper  # noqa: E402


@pytest.fixture(scope='module')
def ref_env_module():
    ref_trainer.install_shims()
    import pufferlib.vector
    from pufferlib.environments import ocean as env_module
    return env_module, pufferlib.vector


def _driver(ref_env_module, name):
    env_module, vector = ref_env_module
    vec = vector.make(env_module.env_creator(name), num_envs=1,
        backend=vector.Serial)
    return env_module, vec.driver_env


def test_default_discrete_outputs_match(ref_env_module):
    env_module, driver = _driver(ref_env_module, 'squared')
    t_policy = env_module.Policy(driver)
    obs_shape = driver.single_observation_space.shape
    n = driver.single_action_space.n

    params = torch_import.convert(t_policy)
    module = Default(obs_shape=obs_shape, action_space=spaces.Discrete(n),
        hidden_size=128)

    rng = np.random.RandomState(0)
    obs = rng.randn(16, *obs_shape).astype(np.float32)
    with torch.no_grad():
        logits_t, value_t = t_policy(torch.as_tensor(obs))
    logits_j, value_j = module.apply(params, jnp.asarray(obs))
    assert np.allclose(np.asarray(logits_j), logits_t.numpy(), atol=1e-5)
    assert np.allclose(np.asarray(value_j), value_t.numpy(), atol=1e-5)


def test_default_multidiscrete_outputs_match(ref_env_module):
    """Reference 'spaces' env: Dict action emulates to MultiDiscrete, so
    the torch policy has a ModuleList decoder; the converter must fold
    the blocks + value head into the fused head in the right order."""
    env_module, driver = _driver(ref_env_module, 'spaces')
    t_policy = env_module.Policy(driver)
    obs_shape = driver.single_observation_space.shape
    nvec = [int(x) for x in driver.single_action_space.nvec]

    params = torch_import.convert(t_policy)
    module = Default(obs_shape=obs_shape,
        action_space=spaces.MultiDiscrete(nvec), hidden_size=128)

    rng = np.random.RandomState(1)
    # emulated byte observations, like the trainer feeds
    obs = rng.randint(0, 255, size=(8,) + tuple(obs_shape)).astype(
        driver.single_observation_space.dtype)
    with torch.no_grad():
        logits_t, value_t = t_policy(torch.as_tensor(obs))
    logits_j, value_j = module.apply(params, jnp.asarray(obs))
    assert len(logits_j) == len(logits_t) == len(nvec)
    for a, b in zip(logits_j, logits_t):
        assert np.allclose(np.asarray(a), b.numpy(), atol=1e-4)
    assert np.allclose(np.asarray(value_j), value_t.numpy(), atol=1e-4)


def test_lstm_wrapper_outputs_match(ref_env_module):
    env_module, driver = _driver(ref_env_module, 'squared')
    t_policy = env_module.Recurrent(driver, env_module.Policy(driver))
    obs_shape = driver.single_observation_space.shape
    n = driver.single_action_space.n

    params = torch_import.convert(t_policy)
    module = LSTMWrapper(
        policy=Default(obs_shape=obs_shape,
            action_space=spaces.Discrete(n), hidden_size=128),
        obs_shape=obs_shape, input_size=128, hidden_size=128,
        use_pallas=False)

    B, T = 4, 3
    rng = np.random.RandomState(2)
    obs = rng.randn(B, T, *obs_shape).astype(np.float32)
    with torch.no_grad():
        logits_t, value_t, state_t = t_policy(torch.as_tensor(obs), None)
    logits_j, value_j, (h_j, c_j) = module.apply(params, jnp.asarray(obs))
    assert np.allclose(np.asarray(logits_j), logits_t.numpy(), atol=1e-5)
    assert np.allclose(np.asarray(value_j), value_t.numpy(), atol=1e-5)
    assert np.allclose(np.asarray(h_j), state_t[0].numpy(), atol=1e-5)
    assert np.allclose(np.asarray(c_j), state_t[1].numpy(), atol=1e-5)


def test_demo_eval_accepts_pt_checkpoint(ref_env_module, tmp_path,
        monkeypatch, capsys):
    """demo.py --mode eval --model-path model.pt plays a reference
    torch checkpoint directly (converted on the fly)."""
    env_module, driver = _driver(ref_env_module, 'squared')
    from pufferlib.frameworks import cleanrl
    # squared evals with the MLP policy (config.yaml squared section has
    # no use_rnn); the LSTM conversion is covered by the module test
    t_policy = cleanrl.Policy(env_module.Policy(driver))
    pt = tmp_path / 'model_000002.pt'
    torch.save(t_policy, pt)

    # the ref shims put /root/reference ahead on sys.path, which
    # shadows the repo's demo.py — load it by explicit path
    import importlib.util
    repo_demo = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'demo.py')
    spec = importlib.util.spec_from_file_location('_repo_demo', repo_demo)
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)
    monkeypatch.setenv('PUFFER_EVAL_STEPS', '2')
    monkeypatch.setenv('PUFFER_EVAL_DELAY', '0')
    demo.main(['--env', 'squared', '--mode', 'eval',
        '--model-path', str(pt)])
    assert capsys.readouterr().out.count('Reward:') == 2


def test_export_roundtrip_into_reference_module(ref_env_module):
    """export(): params trained here load into the reference torch
    modules via load_state_dict and produce the same outputs — the
    reverse migration direction (LSTM + MultiDiscrete covered)."""
    env_module, driver = _driver(ref_env_module, 'spaces')
    t_policy = env_module.Recurrent(driver, env_module.Policy(driver))
    nvec = [int(x) for x in driver.single_action_space.nvec]

    # start from OUR params (converted once so shapes line up), export,
    # and load into a FRESH torch module
    params = torch_import.convert(t_policy)
    t_fresh = env_module.Recurrent(driver, env_module.Policy(driver))
    missing, unexpected = t_fresh.load_state_dict(
        torch_import.export(params, nvec=nvec))
    assert not missing and not unexpected

    obs_shape = driver.single_observation_space.shape
    rng = np.random.RandomState(3)
    obs = rng.randint(0, 255, size=(4, 2) + tuple(obs_shape)).astype(
        driver.single_observation_space.dtype)
    with torch.no_grad():
        lo_a, v_a, st_a = t_policy(torch.as_tensor(obs), None)
        lo_b, v_b, st_b = t_fresh(torch.as_tensor(obs), None)
    for a, b in zip(lo_a, lo_b):
        assert np.allclose(a.numpy(), b.numpy(), atol=1e-6)
    assert np.allclose(v_a.numpy(), v_b.numpy(), atol=1e-6)
    assert np.allclose(st_a[0].numpy(), st_b[0].numpy(), atol=1e-6)


def test_policy_store_serves_pt_files(ref_env_module, tmp_path):
    """A reference user's opponent pool (directory of model_*.pt,
    reference policy_store.py:6-26) works in our PolicyStore unchanged."""
    env_module, driver = _driver(ref_env_module, 'squared')
    from pufferlib_tpu.policy_store import PolicyStore
    torch.save(env_module.Policy(driver).state_dict(),
        tmp_path / 'model_000007.pt')
    store = PolicyStore(str(tmp_path))
    assert store.policy_names() == ['model_000007']
    params = store.get_policy('model_000007')
    assert 'encoder' in params['params']


def test_cleanrl_wrapper_and_pt_roundtrip(ref_env_module, tmp_path):
    """convert() unwraps the reference cleanrl.Policy wrapper, and
    load_pt converts a torch.save'd checkpoint file — the reference's
    model_*.pt migration path (ref clean_pufferl.py:509-530)."""
    env_module, driver = _driver(ref_env_module, 'squared')
    from pufferlib.frameworks import cleanrl
    wrapped = cleanrl.Policy(env_module.Policy(driver))
    params = torch_import.convert(wrapped)
    assert 'encoder' in params['params']

    pt = tmp_path / 'model_000001.pt'
    torch.save(wrapped, pt)
    params2 = torch_import.load_pt(str(pt))
    for a, b in zip(np.asarray(params['params']['head']['kernel']),
            np.asarray(params2['params']['head']['kernel'])):
        assert np.array_equal(a, b)
