"""Self-play stack: PolicyStore, Elo Ranker, PolicyPool routing
(reference tests/test_policy_pool.py:20-37 MockPolicy routing contract)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pufferlib_tpu import spaces
from pufferlib_tpu.models import Default, Policy
from pufferlib_tpu.policy_pool import PolicyPool, cycle_selector
from pufferlib_tpu.policy_ranker import Ranker, update_elo, win_prob
from pufferlib_tpu.policy_store import PolicyStore


def test_policy_store(tmp_path):
    from pufferlib_tpu.training.checkpoint import save_pytree
    params = {'w': np.ones((2, 2))}
    save_pytree(params, str(tmp_path / 'model_000001.ckpt'))
    save_pytree(params, str(tmp_path / 'model_000002.ckpt'))
    store = PolicyStore(str(tmp_path))
    assert store.policy_names() == ['model_000001', 'model_000002']
    loaded = store.get_policy('model_000001')
    assert np.array_equal(loaded['w'], params['w'])


def test_elo_update_zero_sum():
    ra, rb = update_elo(1000.0, 1000.0, 1.0)
    assert ra > 1000 and rb < 1000
    assert abs((ra - 1000) + (rb - 1000)) < 1e-9
    assert win_prob(1000, 1000) == 0.5
    assert win_prob(1100, 1000) > 0.5


def test_ranker_persists(tmp_path):
    db = str(tmp_path / 'ratings.sqlite')
    r = Ranker(db)
    r.update({'a': 1.0, 'b': 0.0})
    ratings = r.ratings()
    assert ratings['a'] > ratings['b']
    r.close()
    r2 = Ranker(db)
    assert r2.ratings() == ratings
    r2.close()


def test_policy_pool_routes_by_policy_map():
    """Agents assigned to different policies must get that policy's
    outputs: craft two param sets with opposite strong logit biases."""
    obs_shape = (4,)
    action_space = spaces.Discrete(2)
    module = Default(obs_shape=obs_shape, action_space=action_space,
        hidden_size=8)
    policy = Policy(module)
    key = jax.random.PRNGKey(0)
    obs = jnp.zeros((6, 4))
    p0 = policy.init(key, obs[:1])

    def bias_params(params, logit0):
        import flax
        flat = flax.traverse_util.flatten_dict(params)
        out = {}
        for k, v in flat.items():
            # fused head layout: [logit_0, logit_1, value]
            if 'head' in k and k[-1] == 'bias':
                v = jnp.asarray([logit0, -logit0, 0.0], jnp.float32)
            elif 'head' in k and k[-1] == 'kernel':
                v = jnp.zeros_like(v)
            out[k] = v
        return flax.traverse_util.unflatten_dict(out)

    p_act0 = bias_params(p0, 50.0)   # always action 0
    p_act1 = bias_params(p0, -50.0)  # always action 1

    pool = PolicyPool(policy, [p_act0, p_act1], learner_mask=[True, False],
        num_agents=6)
    actions, logprobs, entropy, values, _ = pool.forward(
        obs, key=jax.random.PRNGKey(1))
    actions = np.asarray(actions)
    # cycle selector: agents 0,2,4 -> policy 0 (action 0); 1,3,5 -> 1
    assert actions[0] == actions[2] == actions[4] == 0
    assert actions[1] == actions[3] == actions[5] == 1
    assert np.asarray(pool.learner_agent_mask).tolist() == [
        True, False, True, False, True, False]


@pytest.mark.slow
def test_mock_env_suite_roundtrip():
    """Every mock obs space flows through the Device engine and
    nativizes back to the original structure."""
    import pufferlib_tpu.vector as vector
    from pufferlib_tpu.environments.test import (
        MOCK_OBSERVATION_SPACES, env_creator)
    from pufferlib_tpu import emulation, spaces as sp

    for obs_name in MOCK_OBSERVATION_SPACES:
        creator = env_creator(f'{obs_name}-discrete')
        dev = vector.make(creator, backend=vector.Device, num_envs=2)
        obs, _ = dev.reset(seed=1)
        space = dev.env.observation_space
        if isinstance(space, sp.Box):
            assert obs.shape == (2,) + space.shape, obs_name
            continue
        native = dev.nativize(obs)
        # compare against the env's own obs for lane 0
        env = dev.env
        key = jax.vmap(jax.random.fold_in, (None, 0))(
            jax.random.split(jax.random.PRNGKey(1))[1], jnp.arange(2))
        _, direct = env.reset(key[0])
        flat_direct = jax.tree.leaves(direct)
        flat_native = jax.tree.leaves(
            jax.tree.map(lambda x: x[0], native))
        assert len(flat_direct) == len(flat_native), obs_name
        for a, b in zip(flat_direct, flat_native):
            assert np.asarray(a).shape == np.asarray(b).reshape(
                np.asarray(a).shape).shape


def test_mock_env_action_spaces():
    import pufferlib_tpu.vector as vector
    from pufferlib_tpu.environments.test import env_creator
    rng = np.random.RandomState(0)
    for atn_name, n_cols in [('discrete', 1), ('multidiscrete', 2),
            ('dict_discrete', 2), ('tuple_discrete', 2)]:
        creator = env_creator(f'box_float-{atn_name}')
        dev = vector.make(creator, backend=vector.Device, num_envs=2)
        dev.reset(seed=0)
        actions = np.zeros((2, n_cols), np.int32)
        obs, rew, done, trunc, infos = dev.step(actions)
        assert rew.shape == (2,), atn_name
