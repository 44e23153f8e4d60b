"""Multi-policy batched inference for self-play.

Parity: reference pufferlib/pytorch.py:208-258 (PolicyPool): a policy_map
assigns each agent to a policy; forward runs every policy and routes
outputs per agent; only learner policies contribute training data
(learner_mask). The torch version loops policies over dynamic agent
subsets; the TPU version evaluates each policy on the full batch (static
shapes) and gathers per-agent outputs — P is small, and XLA batches the
P forwards efficiently.
"""
import jax
import jax.numpy as jnp


def cycle_selector(sample_idx, num_policies):
    return sample_idx % num_policies


class PolicyPool:
    def __init__(self, policy, params_list, learner_mask, num_agents,
            policy_selector=cycle_selector):
        """policy: a models.Policy/RecurrentPolicy wrapper (the module is
        shared); params_list: one param pytree per policy."""
        assert len(learner_mask) == len(params_list)
        self.policy = policy
        self.params_list = list(params_list)
        self.learner_mask = jnp.asarray(learner_mask, jnp.bool_)
        self.num_policies = len(params_list)
        self.policy_map = jnp.asarray([
            policy_selector(i, self.num_policies)
            for i in range(num_agents)], jnp.int32)
        self.recurrent = hasattr(policy, 'initial_state')
        #: True for agents whose data should train (reference learner rows)
        self.learner_agent_mask = self.learner_mask[self.policy_map]

    def update_params(self, policy_idx, params):
        self.params_list[policy_idx] = params

    def forward(self, obs, state=None, key=None, agent_ids=None):
        """Returns (actions, logprobs, entropy, values, new_state) with
        each agent's row produced by its assigned policy.

        agent_ids: optional (B,) global agent indices for partial or
        reordered batches (async env-pool recv) — the reference subsets
        policy_map by the batch mask (pytorch.py:208-258); omitted, the
        batch must be all agents in fixed order."""
        if agent_ids is not None:
            pmap = self.policy_map[jnp.asarray(agent_ids, jnp.int32)]
        else:
            if obs.shape[0] != self.policy_map.shape[0]:
                raise ValueError(
                    f'obs batch {obs.shape[0]} != num_agents '
                    f'{self.policy_map.shape[0]}; pass agent_ids for '
                    'partial batches')
            pmap = self.policy_map
        keys = (jax.random.split(key, self.num_policies)
            if key is not None else [None] * self.num_policies)

        outs = []
        new_states = []
        for p in range(self.num_policies):
            if self.recurrent:
                a, lp, ent, val, st = self.policy(
                    self.params_list[p], obs, state, key=keys[p])
                new_states.append(st)
            else:
                a, lp, ent, val = self.policy(
                    self.params_list[p], obs, key=keys[p])
            outs.append((a, lp, ent, val.reshape(-1)))

        def gather(stacked):
            # stacked: (P, B, ...) -> per-agent row by policy_map
            idx = pmap.reshape(
                (1, -1) + (1,) * (stacked.ndim - 2))
            return jnp.take_along_axis(stacked, idx, axis=0)[0]

        actions = gather(jnp.stack([o[0] for o in outs]))
        logprobs = gather(jnp.stack([o[1] for o in outs]))
        entropy = gather(jnp.stack([o[2] for o in outs]))
        values = gather(jnp.stack([o[3] for o in outs]))

        if self.recurrent:
            h = gather(jnp.stack([jnp.moveaxis(s[0], 1, 0)
                for s in new_states]))
            c = gather(jnp.stack([jnp.moveaxis(s[1], 1, 0)
                for s in new_states]))
            new_state = (jnp.moveaxis(h, 0, 1), jnp.moveaxis(c, 0, 1))
            return actions, logprobs, entropy, values, new_state
        return actions, logprobs, entropy, values, None
