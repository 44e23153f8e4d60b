"""Self-play loop: PolicyPool routing + checkpointed opponents + Elo.

Agent 0 of each Multiagent env is driven by the learner, agent 1 by a
frozen opponent snapshot; episode scores feed the sqlite Elo ranker
(reference PolicyPool pytorch.py:208-258 + policy_ranker.py flow).

Run: python examples/selfplay.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

import pufferlib_tpu.vector as vector
from pufferlib_tpu.models import Default, Policy
from pufferlib_tpu.ocean import env_creator
from pufferlib_tpu.policy_pool import PolicyPool
from pufferlib_tpu.policy_ranker import Ranker
from pufferlib_tpu.policy_store import PolicyStore
from pufferlib_tpu.training.checkpoint import save_pytree

STORE = '/tmp/puffer_selfplay'
os.makedirs(STORE, exist_ok=True)

vecenv = vector.make(env_creator('multiagent', ),
    env_kwargs=dict(episode_stats=False), backend=vector.Device,
    num_envs=8)
policy = Policy(Default(obs_shape=vecenv.single_observation_space.shape,
    action_space=vecenv.single_action_space, hidden_size=32))

key = jax.random.PRNGKey(0)
obs, _ = vecenv.reset(seed=0)
learner = policy.init(key, np.asarray(obs)[:1])
opponent = policy.init(jax.random.PRNGKey(1), np.asarray(obs)[:1])
save_pytree(opponent, os.path.join(STORE, 'model_000000.ckpt'))

store = PolicyStore(STORE)
print('opponents in store:', store.policy_names())
opponent = store.get_policy(store.policy_names()[-1])

pool = PolicyPool(policy, [learner, opponent],
    learner_mask=[True, False], num_agents=vecenv.num_agents)
ranker = Ranker(os.path.join(STORE, 'ratings.sqlite'))

scores = {'learner': [], 'opponent': []}
for step in range(16):
    key, sub = jax.random.split(key)
    actions, logprobs, entropy, values, _ = pool.forward(
        np.asarray(obs), key=sub)
    obs, rew, done, trunc, infos = vecenv.step(np.asarray(actions))
    rew = np.asarray(rew)
    learner_rows = np.asarray(pool.learner_agent_mask)
    scores['learner'].append(rew[learner_rows].mean())
    scores['opponent'].append(rew[~learner_rows].mean())

ratings = ranker.update({
    'learner': float(np.mean(scores['learner'])),
    'model_000000': float(np.mean(scores['opponent'])),
})
print('mean scores:', {k: round(float(np.mean(v)), 3)
    for k, v in scores.items()})
print('elo:', {k: round(v, 1) for k, v in ratings.items()})
ranker.close()
