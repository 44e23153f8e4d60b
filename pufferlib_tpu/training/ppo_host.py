"""PPO trainer for host (CPU) environments feeding the TPU.

This is the bridge-trainer for external envs (Atari, NetHack...) that
cannot run on-device: workers simulate on the host (vector_host), the
policy forward and the PPO update run as jitted programs on the TPU.
Mirrors the reference clean_pufferl.py flow: recv -> forward -> store ->
send until the Experience buffer fills, then sort by (env_id, step),
flat GAE (reference-exact kernel), minibatched update.

The on-device trainer (training.ppo) is the fast path for jax-native
envs; use this one when the env only exists as host code.

Reference citations: Experience (clean_pufferl.py:380-482), evaluate
(:76-154), train (:157-292).
"""
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp
import optax

from pufferlib_tpu.exceptions import APIUsageError
from pufferlib_tpu.models import RecurrentPolicy, count_params
from pufferlib_tpu.namespace import namespace
from pufferlib_tpu.ops import compute_gae_flat
from pufferlib_tpu.training import checkpoint as ckpt
from pufferlib_tpu.training import media
from pufferlib_tpu.training.ppo import (
    default_config, make_epoch_runner, make_minibatch_update,
    record_stats)
from pufferlib_tpu.training.profile import Profile, make_losses
from pufferlib_tpu.utils import profile as profile_deco, unroll_nested_dict


class Experience:
    """Flat numpy storage with (env_id, step) sort keys
    (reference clean_pufferl.py:380-482)."""

    def __init__(self, batch_size, bptt_horizon, minibatch_size, obs_shape,
            obs_dtype, atn_shape, atn_dtype, lstm_total_agents=0,
            lstm_layers=1, lstm_hidden=0):
        if minibatch_size is None:
            minibatch_size = batch_size
        self.obs = np.zeros((batch_size, *obs_shape), dtype=obs_dtype)
        self.actions = np.zeros((batch_size, *atn_shape), dtype=atn_dtype)
        self.logprobs = np.zeros(batch_size, np.float32)
        self.rewards = np.zeros(batch_size, np.float32)
        self.dones = np.zeros(batch_size, np.float32)
        self.truncateds = np.zeros(batch_size, np.float32)
        self.values = np.zeros(batch_size, np.float32)

        self.lstm_h = self.lstm_c = None
        if lstm_hidden:
            assert lstm_total_agents > 0
            shape = (lstm_layers, lstm_total_agents, lstm_hidden)
            self.lstm_h = jnp.zeros(shape, jnp.float32)
            self.lstm_c = jnp.zeros(shape, jnp.float32)

        if batch_size % minibatch_size:
            raise APIUsageError('batch_size must be divisible by '
                'minibatch_size')
        if minibatch_size % bptt_horizon:
            raise APIUsageError('minibatch_size must be divisible by '
                'bptt_horizon')
        self.num_minibatches = batch_size // minibatch_size
        self.minibatch_rows = minibatch_size // bptt_horizon

        self.batch_size = batch_size
        self.bptt_horizon = bptt_horizon
        self.minibatch_size = minibatch_size
        # parallel sort-key arrays filled alongside the data rows;
        # sort_training_data lexsorts them into (agent, time) order
        self.key_agent = np.zeros(batch_size, np.int64)
        self.key_step = np.zeros(batch_size, np.int64)
        self.ptr = 0
        self.step = 0
        # per-agent stored-row counts + LSTM state snapshots at BPTT
        # segment starts, keyed (agent_id, segment_index) — the update
        # must start each segment from the state the rollout actually
        # had there, not zeros (device path: ppo.py segment_lstm)
        self.agent_step = {}
        self.lstm_snap = {}

    @property
    def full(self):
        return self.ptr >= self.batch_size

    def store(self, obs, value, action, logprob, reward, done, env_id,
            mask, lstm_h_prev=None, lstm_c_prev=None):
        ptr = self.ptr
        indices = np.where(mask)[0][:self.batch_size - ptr]
        end = ptr + len(indices)
        self.obs[ptr:end] = obs[indices]
        self.values[ptr:end] = value[indices]
        self.actions[ptr:end] = action[indices]
        self.logprobs[ptr:end] = logprob[indices]
        self.rewards[ptr:end] = reward[indices]
        self.dones[ptr:end] = done[indices]
        self.key_agent[ptr:end] = env_id[indices]
        self.key_step[ptr:end] = self.step
        if self.lstm_h is not None:
            h = self.bptt_horizon
            for i in indices:
                a = int(env_id[i])
                t_a = self.agent_step.get(a, 0)
                if t_a % h == 0 and lstm_h_prev is not None:
                    self.lstm_snap[(a, t_a // h)] = (
                        np.asarray(lstm_h_prev[:, a]),
                        np.asarray(lstm_c_prev[:, a]))
                self.agent_step[a] = t_a + 1
        self.ptr = end
        self.step += 1

    def sort_training_data(self):
        """Row permutation into (agent, time) order — agent-contiguous
        blocks whose h-length runs are the BPTT segments (same ordering
        contract as reference clean_pufferl.py:452-464; np.lexsort is
        stable, so ties keep arrival order exactly like the reference's
        stable tuple sort)."""
        n = self.ptr
        idxs = np.lexsort((self.key_step[:n], self.key_agent[:n]))
        self.sorted_agents = self.key_agent[idxs]
        self.ptr = 0
        self.step = 0
        self.agent_step = {}
        return idxs


def create(config, vecenv, policy, wandb=None):
    """Initialize the host-env trainer (reference clean_pufferl.create)."""
    vecenv.async_reset(config.seed)
    obs_space = vecenv.single_observation_space
    atn_space = vecenv.single_action_space
    total_agents = vecenv.num_agents
    recurrent = isinstance(policy, RecurrentPolicy)

    key = jax.random.PRNGKey(config.seed)
    key, init_key = jax.random.split(key)

    example = jnp.zeros((1, *obs_space.shape),
        jnp.dtype(np.dtype(obs_space.dtype)))
    if recurrent:
        params = policy.init(init_key, example, policy.initial_state(1))
        lstm_hidden = policy.module.hidden_size
        lstm_layers = policy.module.num_layers
    else:
        params = policy.init(init_key, example)
        lstm_hidden = lstm_layers = 0

    experience = Experience(config.batch_size, config.bptt_horizon,
        config.minibatch_size, obs_space.shape, obs_space.dtype,
        atn_space.shape, np.int32, lstm_total_agents=total_agents,
        lstm_layers=lstm_layers, lstm_hidden=lstm_hidden)

    tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-5)
    opt_state = tx.init(params)

    seg_rows = config.minibatch_size // config.bptt_horizon
    S = experience.num_minibatches * seg_rows
    run_epochs = jax.jit(make_epoch_runner(policy, tx, config, seg_rows,
        experience.num_minibatches, S), donate_argnums=(0, 1))
    # cpu_offload: jit the single-minibatch update; train() streams
    # minibatches from host RAM instead of shipping the whole batch
    run_minibatch = jax.jit(make_minibatch_update(
        policy, tx, config, seg_rows), donate_argnums=(0, 1)) \
        if config.get('cpu_offload') else None

    if recurrent:
        def forward(params, obs, h, c, env_id, key):
            hs = jnp.take(h, env_id, axis=1)
            cs = jnp.take(c, env_id, axis=1)
            action, logprob, _, value, (hs, cs) = policy(
                params, obs, (hs, cs), key=key)
            h = h.at[:, env_id].set(hs)
            c = c.at[:, env_id].set(cs)
            return action, logprob, value.reshape(-1), h, c
    else:
        def forward(params, obs, h, c, env_id, key):
            action, logprob, _, value = policy(params, obs, key=key)
            return action, logprob, value.reshape(-1), h, c

    return namespace(
        config=config,
        vecenv=vecenv,
        policy=policy,
        params=params,
        opt_state=opt_state,
        experience=experience,
        forward_fn=jax.jit(forward),
        run_epochs=run_epochs,
        run_minibatch=run_minibatch,
        key=key,
        profile=Profile(),
        losses=make_losses(),
        wandb=wandb,
        global_step=0,
        epoch=0,
        stats={},
        infos={},
        stats_history=[],
        msg=f'Model Size: {count_params(params)} parameters',
        last_log_time=0.0,
        utilization=None,
        dashboard=None,
    )


def _recv_and_dispatch(data, rec):
    """Forward pass for one recv'd batch: dispatch only, no fetch (jax
    dispatch is async; only device_get blocks)."""
    config, experience = data.config, data.experience
    o, r, d, t, info, env_id, mask = rec[:7]
    token = rec[7] if len(rec) > 7 else None
    # LSTM segment-start snapshots are only consumed when some
    # incoming agent sits at a BPTT boundary — known on the host
    # BEFORE the forward, so the (layers, agents, hidden) state
    # fetch can be skipped on all other steps
    bptt = config.bptt_horizon
    need_snap = experience.lstm_h is not None and any(
        experience.agent_step.get(int(a), 0) % bptt == 0
        for a in env_id)
    lstm_h_prev, lstm_c_prev = experience.lstm_h, experience.lstm_c
    data.key, sub = jax.random.split(data.key)
    actions, logprob, value, experience.lstm_h, experience.lstm_c = \
        data.forward_fn(data.params, jnp.asarray(o), experience.lstm_h,
            experience.lstm_c, jnp.asarray(env_id), sub)
    fetch = (actions, logprob, value)
    if need_snap:
        fetch = fetch + (lstm_h_prev, lstm_c_prev)
    return namespace(o=o, r=r, d=d, info=info, env_id=env_id, mask=mask,
        token=token, need_snap=need_snap, fetch=fetch)


def _finish_batch(data, p, infos, profile):
    """Fetch a dispatched batch's outputs (ONE device_get), store the
    transition, and return actions to the pool."""
    experience = data.experience
    with profile.eval_forward:
        # ONE host<->device round trip for everything the host needs
        # this step (on tunneled TPUs each fetch costs the full link
        # RTT; separate np.asarray calls here were the dominant
        # rollout cost)
        fetched = jax.device_get(p.fetch)
    actions, logprob, value = fetched[:3]
    h_prev_np = fetched[3] if p.need_snap else None
    c_prev_np = fetched[4] if p.need_snap else None
    with profile.eval_misc:
        # the pipelined drain can arrive after the buffer filled; those
        # rows are dropped by store(), so don't count them as progress
        if experience.ptr < experience.batch_size:
            data.global_step += int(np.sum(p.mask))
        experience.store(np.asarray(p.o), value, actions,
            logprob, np.asarray(p.r),
            np.asarray(p.d, np.float32), np.asarray(p.env_id),
            np.asarray(p.mask),
            lstm_h_prev=h_prev_np, lstm_c_prev=c_prev_np)
        for i in p.info:
            for k, v in unroll_nested_dict(i):
                infos[k].append(v)
    with profile.env:
        if p.token is not None:
            data.vecenv.send_to(actions, p.token)
        else:
            data.vecenv.send(actions)


@profile_deco
def evaluate(data):
    """Async rollout loop: recv -> device forward -> store -> send
    (reference clean_pufferl.py:76-154).

    When the envpool exposes >= 2 disjoint worker groups
    (vecenv.supports_pipeline) the loop runs DOUBLE-BUFFERED: batch
    B's forward is dispatched before batch A's outputs are fetched, so
    consecutive device round trips overlap instead of serializing
    (each fetch costs a full link RTT on tunneled TPUs). Disable with
    --train.pipeline_rollout False."""
    config, profile, experience = data.config, data.profile, data.experience
    infos = defaultdict(list)

    pipelined = (config.get('pipeline_rollout', True)
        and getattr(data.vecenv, 'supports_pipeline', False))

    if pipelined:
        pending = None
        while not experience.full:
            with profile.env:
                rec = data.vecenv.recv_async()
            with profile.eval_misc:
                nxt = _recv_and_dispatch(data, rec)
            if pending is not None:
                _finish_batch(data, pending, infos, profile)
            pending = nxt
        if pending is not None:
            # experience.store truncates at capacity (reference
            # semantics), so draining the last in-flight batch is safe
            _finish_batch(data, pending, infos, profile)
    else:
        while not experience.full:
            with profile.env:
                rec = data.vecenv.recv()
            with profile.eval_misc:
                p = _recv_and_dispatch(data, rec)
            _finish_batch(data, p, infos, profile)

    with profile.eval_misc:
        data.stats = {}
        # *_map infos become wandb Images (reference
        # clean_pufferl.py:125-146); media keys skip numeric averaging
        media_keys = media.collect_media_stats(
            infos, data.stats, data.wandb, data)
        for k, v in infos.items():
            if k in media_keys:
                continue
            try:
                data.stats[k] = float(np.mean(v))
            except (TypeError, ValueError):
                continue
        record_stats(data)
    return data.stats, infos


def _train_offloaded(data, seg_batch, lr, update_key):
    """cpu_offload update loop (reference clean_pufferl.py:388-391):
    the (batch, *obs) array stays in host RAM; each minibatch's rows
    upload on their own dispatch. The async dispatch pipeline overlaps
    minibatch g+1's upload with minibatch g's compute, so for big-obs
    envs (Atari-scale) HBM holds only one minibatch of obs at a time."""
    config, experience = data.config, data.experience
    rows = experience.minibatch_rows
    M = experience.num_minibatches
    lr_dev = jnp.float32(lr)
    # host-side shuffle RNG seeded from the update key so the offload
    # path honors shuffle_minibatches like the fused runner does
    try:  # typed PRNG keys need key_data; legacy uint32 keys don't
        key_bits = np.asarray(jax.random.key_data(update_key))
    except (TypeError, AttributeError):
        key_bits = np.asarray(update_key)
    rng = np.random.RandomState(
        int(key_bits.ravel()[-1]) & 0x7fffffff)
    stats_sum = None
    n = 0
    for _ in range(config.update_epochs):
        if config.shuffle_minibatches:
            perm = rng.permutation(M * rows)
        epoch_stats = None
        for m in range(M):
            if config.shuffle_minibatches:
                idx = perm[m * rows:(m + 1) * rows]
                mb = jax.tree.map(
                    lambda x: jnp.asarray(x[idx]), seg_batch)
            else:
                mb = jax.tree.map(
                    lambda x: jnp.asarray(x[m * rows:(m + 1) * rows]),
                    seg_batch)
            data.params, data.opt_state, stats = data.run_minibatch(
                data.params, data.opt_state, mb, lr_dev)
            stats_sum = stats if stats_sum is None else jax.tree.map(
                jnp.add, stats_sum, stats)
            n += 1
            # per-minibatch early stop, matching the fused run_epochs
            # path (and reference clean_pufferl.py:256-258). The scalar
            # fetch syncs the dispatch pipeline, so only pay it when
            # the option is on.
            if config.target_kl is not None and \
                    float(stats['approx_kl']) > config.target_kl:
                break
        else:
            continue
        break
    stats = jax.tree.map(lambda x: np.asarray(x) / n, stats_sum)
    jax.block_until_ready(stats['policy_loss'])
    return stats


@profile_deco
def train(data):
    """Sort, flat GAE (reference-exact), minibatched PPO on device
    (reference clean_pufferl.py:157-292)."""
    config, profile, experience = data.config, data.profile, data.experience

    with profile.train_misc:
        idxs = experience.sort_training_data()
        dones_np = experience.dones[idxs]
        values_np = experience.values[idxs]
        rewards_np = experience.rewards[idxs]
        advantages = np.asarray(compute_gae_flat(
            dones_np, values_np, rewards_np, config.gamma,
            config.gae_lambda))
        returns = advantages + values_np

        h = config.bptt_horizon
        M = experience.num_minibatches
        S = M * experience.minibatch_rows
        # minibatch-major segment order so the epoch runner's contiguous
        # reshape reproduces exactly these minibatches
        sorted_pos = np.arange(experience.batch_size).reshape(
            experience.minibatch_rows, M, h).transpose(1, 0, 2
            ).reshape(S, h)
        row_idx = idxs[sorted_pos]  # (S, h) direct rows, ONE gather each

        seg_batch = dict(
            obs=experience.obs[row_idx],
            action=experience.actions[row_idx],
            logprob=experience.logprobs[row_idx],
            value=values_np[sorted_pos],
            advantages=advantages[sorted_pos],
            returns=returns[sorted_pos],
        )
        if experience.lstm_h is not None:
            layers = experience.lstm_h.shape[0]
            hidden = experience.lstm_h.shape[2]
            lstm_h_seg = np.zeros((S, layers, hidden), np.float32)
            lstm_c_seg = np.zeros((S, layers, hidden), np.float32)
            # each segment starts from the state the rollout actually
            # had there. After the (agent, time) sort an agent's rows
            # are contiguous; rank within the agent's block // h is the
            # segment index keyed in lstm_snap.
            agents_sorted = experience.sorted_agents
            change = np.r_[True, agents_sorted[1:] != agents_sorted[:-1]]
            group_start = np.maximum.accumulate(
                np.where(change, np.arange(len(agents_sorted)), 0))
            rank = np.arange(len(agents_sorted)) - group_start
            for s_i in range(S):
                p0 = sorted_pos[s_i, 0]
                agent = int(agents_sorted[p0])
                snap = experience.lstm_snap.get((agent, int(rank[p0]) // h))
                if snap is not None:
                    lstm_h_seg[s_i], lstm_c_seg[s_i] = snap
            seg_batch['lstm_h'] = lstm_h_seg
            seg_batch['lstm_c'] = lstm_c_seg
            experience.lstm_snap = {}

        lr = config.learning_rate
        if config.anneal_lr:
            lr *= 1.0 - data.global_step / config.total_timesteps

    with profile.learn:
        data.key, update_key = jax.random.split(data.key)
        if data.run_minibatch is not None:
            stats = _train_offloaded(data, seg_batch, lr, update_key)
        else:
            seg_batch = jax.tree.map(jnp.asarray, seg_batch)
            data.params, data.opt_state, stats = data.run_epochs(
                data.params, data.opt_state, seg_batch, update_key,
                jnp.float32(lr))
            jax.block_until_ready(stats['policy_loss'])

    with profile.train_misc:
        losses = make_losses()
        for k in losses:
            if k in stats:
                losses[k] = float(stats[k])
        var_y = np.var(returns)
        losses.explained_variance = float('nan') if var_y == 0 else \
            1 - float(np.var(returns - values_np)) / var_y
        losses.adv_var = float(np.var(advantages))
        data.losses = losses
        data.epoch += 1
        data.last_lr = lr

        done_training = data.global_step >= config.total_timesteps
        if profile.update(data) or done_training:
            if data.dashboard is not None:
                data.dashboard(data)
            elif config.verbose:
                print(f'epoch {data.epoch} step {data.global_step} '
                    f'SPS {profile.SPS:.3g} ' + ' '.join(
                    f'{k}={v:.3f}' for k, v in data.stats.items()
                    if isinstance(v, float)))
            from pufferlib_tpu.training.ppo import _log_wandb
            _log_wandb(data)
        if data.epoch % config.checkpoint_interval == 0 or done_training:
            ckpt.save_checkpoint(data)


def close(data):
    data.vecenv.close()
    if data.wandb is not None:
        model_path = ckpt.save_checkpoint(data)
        artifact = data.wandb.Artifact(
            f'{data.config.exp_id}_model', type='model')
        artifact.add_file(model_path)
        data.wandb.run.log_artifact(artifact)
        data.wandb.finish()
