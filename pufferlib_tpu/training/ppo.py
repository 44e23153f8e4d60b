"""PuffeRL on TPU: PPO(+LSTM) as two jitted XLA programs.

The reference trainer (clean_pufferl.py:30-304) ping-pongs tensors between
host envs and the device every rollout step. Here everything lives on
device: `evaluate` runs one jitted rollout program (policy forward + env
vmap + experience collection fused into a lax.scan) and `train` runs one
jitted update program (GAE scan + minibatched PPO epochs). Only scalar
metrics ever reach the host.

API parity with the reference: create/evaluate/train/close, the same
config fields (gamma, gae_lambda, clip_coef, vf_*, ent_coef, target_kl,
update_epochs, batch_size, minibatch_size, bptt_horizon, anneal_lr,
checkpoint_interval...), the same losses/* metric names, and the same
batch/minibatch/bptt divisibility contracts (clean_pufferl.py:414-422).

Fidelity notes:
- GAE uses the corrected per-env bootstrap (ops/gae.py); the reference's
  flat no-bootstrap kernel is available as ops.compute_gae_flat.
- LSTM minibatches start from the *stored rollout state* at each BPTT
  segment boundary (R2D2-style) instead of the reference's zero state at
  epoch start (clean_pufferl.py:176) — strictly more faithful to the
  data-collection distribution.
- target_kl early stop is a carried flag that masks subsequent updates
  (lax-friendly analog of the reference's `break`, clean_pufferl.py:256).
"""
import functools
import os
import time
import uuid

import numpy as np
import jax
import jax.numpy as jnp
import optax

from pufferlib_tpu import spaces
from pufferlib_tpu.environment import select_tree
from pufferlib_tpu.exceptions import APIUsageError
from pufferlib_tpu.models import Policy, RecurrentPolicy, count_params
from pufferlib_tpu.namespace import Namespace, namespace
from pufferlib_tpu.ops import compute_gae, ppo_losses
from pufferlib_tpu.training import checkpoint as ckpt
from pufferlib_tpu.training import media
from pufferlib_tpu.training.profile import Profile, make_losses
from pufferlib_tpu.utils import profile as profile_deco
from pufferlib_tpu.vector import make_env_ops


def suggest_minibatch_size(batch_size, hidden_size=128,
        num_minibatches=4, vmem_budget=1 << 24):
    """Largest minibatch (in rows) that keeps the PPO update's per-
    minibatch activation working set VMEM-resident, capped below
    batch_size/num_minibatches.

    Why this matters (the >8192-lane knee, docs/PERF.md): the update's
    matmuls stream (rows, hidden) activations between the forward and
    backward; when rows*hidden elements fit the compiler's scoped-VMEM
    budget those tensors never round-trip HBM (their HLO layouts carry
    S(1)) and each minibatch update runs ~2x faster. Scaling
    minibatch_size proportionally with env count (batch//4) silently
    pushes the working set out of VMEM — measured on v5e at hidden 128:
    update 41.8 ms at 524288-row minibatches vs 20.2 ms at 131072-row
    (same total data, 4x the minibatches). The default budget 2^24
    elements (= 32 MB bf16) is the measured v5e knee: 131072 rows at
    hidden 128, where the sweep is flat below and 2x above.
    """
    cap = max(vmem_budget // max(hidden_size, 1), 1)
    return min(batch_size // num_minibatches, cap)


def default_config(**overrides):
    """Train-section defaults mirroring reference config.yaml:24-43."""
    cfg = namespace(
        env='squared',
        exp_id=None,
        data_dir='experiments',
        seed=1,
        total_timesteps=10_000_000,
        learning_rate=2.5e-4,
        anneal_lr=True,
        gamma=0.99,
        gae_lambda=0.95,
        update_epochs=4,
        norm_adv=True,
        clip_coef=0.1,
        clip_vloss=True,
        vf_coef=0.5,
        vf_clip_coef=0.1,
        max_grad_norm=0.5,
        ent_coef=0.01,
        target_kl=None,
        batch_size=32768,
        minibatch_size=8192,
        bptt_horizon=16,
        shuffle_minibatches=False,
        # single-device non-recurrent: partition minibatches by free
        # contiguous reshape instead of the BPTT agent-major permutation.
        # NOTE: changes minibatch COMPOSITION (time-slabs instead of
        # agent groups), which can shift per-minibatch advantage
        # normalization statistics slightly; set False to reproduce the
        # mesh path / reference composition exactly (learning verified
        # equivalent on the ocean suite either way)
        mlp_contiguous_minibatches=True,
        # recurrent: when num_minibatches == T//bptt_horizon, partition
        # the time-major batch into time-slab minibatches by free
        # reshape and run the whole update transpose-free (LSTMWrapper
        # time_major). Same composition caveat as above; set False to
        # reproduce the reference's agent-major minibatch grouping.
        lstm_time_slab_minibatches=True,
        # host trainer only: keep the obs batch in host RAM and ship
        # one minibatch per update (reference clean_pufferl.py:388-391)
        cpu_offload=False,
        # host trainer only: double-buffer the rollout when the envpool
        # has >= 2 worker groups (overlap device round trips)
        pipeline_rollout=True,
        checkpoint_interval=200,
        device='tpu',
        compile=True,
        verbose=True,
        # materialize device metrics at the profile interval even with
        # no dashboard/verbose/wandb sink (sweeps read stats_history)
        track_history=False,
    )
    for k, v in overrides.items():
        cfg[k] = v
    if cfg.exp_id is None:
        cfg.exp_id = f'{cfg.env}-{uuid.uuid4().hex[:8]}'
    return cfg


class TrainerData(Namespace):
    """Trainer state record. The fused step()/step_many() paths leave
    the newest metrics on device (`pending`); reading .stats/.losses/
    .infos materializes them first, so user code never observes stale
    values after step(). Internal hot paths read the shadow fields
    (_stats/_losses/_infos) directly to avoid the device sync."""

    @property
    def stats(self):
        _materialize_metrics(self)
        return self.__dict__['_stats']

    @stats.setter
    def stats(self, value):
        self.__dict__['_stats'] = value

    @property
    def losses(self):
        _materialize_metrics(self)
        return self.__dict__['_losses']

    @losses.setter
    def losses(self, value):
        self.__dict__['_losses'] = value

    @property
    def infos(self):
        _materialize_metrics(self)
        return self.__dict__['_infos']

    @infos.setter
    def infos(self, value):
        self.__dict__['_infos'] = value


def create(config, vecenv, policy, wandb=None, mesh=None):
    """Initialize train state. vecenv must be a vector.Device (or expose
    .env, .num_envs_total, .emulated, .single_* spaces).

    mesh: optional jax.sharding.Mesh with an 'env' axis. Env lanes, the
    rollout batch, and all intermediate training tensors are sharded over
    it; params/optimizer replicate and GSPMD inserts the gradient psum.
    """
    env = vecenv.env
    num_envs = vecenv.num_envs_total
    total_agents = vecenv.num_agents

    batch_size = config.batch_size
    minibatch_size = config.minibatch_size or batch_size
    horizon = config.bptt_horizon

    if batch_size % total_agents != 0:
        raise APIUsageError('batch_size must be divisible by total agents')
    T = batch_size // total_agents
    if T % horizon != 0:
        raise APIUsageError(
            f'rollout length {T} must be divisible by bptt_horizon')
    if batch_size % minibatch_size != 0:
        raise APIUsageError('batch_size must be divisible by minibatch_size')
    if minibatch_size % horizon != 0:
        raise APIUsageError(
            'minibatch_size must be divisible by bptt_horizon')

    num_minibatches = batch_size // minibatch_size
    seg_rows = minibatch_size // horizon
    num_segments = total_agents * (T // horizon)
    if num_minibatches * seg_rows != num_segments:
        raise APIUsageError('minibatch geometry does not tile the batch')

    recurrent = isinstance(policy, RecurrentPolicy)

    key = jax.random.PRNGKey(config.seed)
    key, init_key, reset_key = jax.random.split(key, 3)

    # init env lanes
    reset_batch, step_batch = make_env_ops(env, vecenv.emulated)
    lane_idx = jnp.arange(num_envs)
    lane_keys = jax.vmap(jax.random.fold_in, (None, 0))(key, lane_idx)
    reset_keys = jax.vmap(jax.random.fold_in, (None, 0))(
        reset_key, lane_idx)
    env_states, obs, dones = jax.jit(reset_batch)(reset_keys)

    # init policy params
    obs_example = obs[:1]
    if recurrent:
        params = policy.init(init_key, obs_example,
            policy.initial_state(1))
        lstm_state = policy.initial_state(total_agents)
    else:
        params = policy.init(init_key, obs_example)
        lstm_state = None

    tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-5)
    opt_state = tx.init(params)

    from pufferlib_tpu.vector import make_mask_fn
    rollout_raw = make_rollout_fn(policy, step_batch, config, T,
        mask_fn=make_mask_fn(env))
    update_raw = make_update_fn(policy, tx, config, T, total_agents,
        num_minibatches, seg_rows, mesh=mesh,
        obs_shape=vecenv.single_observation_space.shape)

    carry = dict(
        env=env_states,
        done=dones,
        obs=obs,
        keys=lane_keys,
        t=jnp.uint32(0),
        lstm=lstm_state,
        key=key,
    )

    def compute_lr(t):
        """lr schedule computed ON DEVICE from the carried step counter —
        a host-provided lr scalar would cost a full host->device transfer
        round trip per dispatch (dominant on tunneled TPUs)."""
        if not config.anneal_lr:
            return jnp.float32(config.learning_rate)
        frac = 1.0 - (t.astype(jnp.float32) * total_agents
            ) / config.total_timesteps
        return jnp.float32(config.learning_rate) * jnp.maximum(frac, 0.0)

    def step_raw(params, opt_state, carry):
        """Fused epoch: rollout + GAE + PPO update in ONE XLA program —
        a single device dispatch per epoch, zero host round-trips (the
        PRNG chain and lr schedule both advance inside the program).
        The anneal fraction uses the post-rollout step count, matching
        the reference's evaluate-then-train order."""
        lr = compute_lr(carry['t'] + jnp.uint32(T))
        key, update_key = jax.random.split(carry['key'])
        carry = {**carry, 'key': key}
        carry, batch, info_sums, episode_count = rollout_raw(params, carry)
        params, opt_state, stats = update_raw(
            params, opt_state, batch, update_key, lr)
        return params, opt_state, carry, stats, info_sums, episode_count

    def multi_step_raw(params, opt_state, carry, n_epochs):
        """n_epochs fused epochs in ONE dispatch (lax.scan over step_raw)
        — for high dispatch-latency links (remote TPU) this amortizes
        the round trip to nothing. n_epochs is static."""
        def body(c, _):
            params, opt_state, carry = c
            (params, opt_state, carry, stats, info_sums,
                episode_count) = step_raw(params, opt_state, carry)
            return (params, opt_state, carry), (
                stats, info_sums, episode_count)

        (params, opt_state, carry), (stats, info_sums, counts) = \
            jax.lax.scan(body, (params, opt_state, carry), None,
                length=n_epochs)
        stats = jax.tree.map(lambda x: x[-1], stats)
        info_sums = jax.tree.map(lambda x: jnp.sum(x, axis=0), info_sums)
        return params, opt_state, carry, stats, info_sums, jnp.sum(counts)

    if mesh is None:
        rollout_fn = jax.jit(rollout_raw, donate_argnums=(1,))
        update_fn = jax.jit(update_raw, donate_argnums=(0, 1))
        step_fn = jax.jit(step_raw, donate_argnums=(0, 1, 2))
        multi_step_fn = jax.jit(multi_step_raw, donate_argnums=(0, 1, 2),
            static_argnums=(3,))
    else:
        from pufferlib_tpu.parallel import (
            carry_shardings, batch_shardings, param_shardings, replicated)
        repl = replicated(mesh)
        c_shard = carry_shardings(mesh, carry)
        # tensor parallelism: on a mesh with a 'model' axis the param
        # (and optimizer-state) hidden dims shard over it; GSPMD inserts
        # the activation collectives. Pure-DP (1-D) meshes get the
        # replicated tree back. Model sharding requires the XLA
        # (non-Pallas) LSTM path: GSPMD cannot partition a pallas_call
        # whose operands are sharded — enforce it here, where the user
        # can fix the constructor, not deep inside update compilation.
        _up = getattr(policy.module, 'use_pallas', False)
        # None means auto-Pallas-on-TPU for LSTMWrapper but plain-XLA
        # for Default (whose kernel is explicit-opt-in only)
        if dict(mesh.shape).get('model', 1) > 1 and (
                _up is True or (_up is None and recurrent)):
            raise APIUsageError(
                "a mesh with a 'model' axis (tensor parallelism) requires "
                'use_pallas=False on the policy module (LSTMWrapper / '
                'Default); the auto/True Pallas kernels cannot be '
                'partitioned by GSPMD')
        p_shard = param_shardings(mesh, params)
        o_shard = param_shardings(mesh, opt_state)
        # discover the batch structure without running anything
        _, batch_shape, _, _ = jax.eval_shape(rollout_raw, params, carry)
        b_shard = batch_shardings(mesh, recurrent)(batch_shape)
        rollout_fn = jax.jit(rollout_raw,
            in_shardings=(p_shard, c_shard),
            out_shardings=(c_shard, b_shard, repl, repl),
            donate_argnums=(1,))
        update_fn = jax.jit(update_raw,
            in_shardings=(p_shard, o_shard, b_shard, repl, repl),
            out_shardings=(p_shard, o_shard, repl),
            donate_argnums=(0, 1))
        step_fn = jax.jit(step_raw,
            in_shardings=(p_shard, o_shard, c_shard),
            out_shardings=(p_shard, o_shard, c_shard, repl, repl, repl),
            donate_argnums=(0, 1, 2))
        multi_step_fn = jax.jit(multi_step_raw,
            in_shardings=(p_shard, o_shard, c_shard),
            out_shardings=(p_shard, o_shard, c_shard, repl, repl, repl),
            donate_argnums=(0, 1, 2), static_argnums=(3,))
        # place state per the shardings
        params = jax.device_put(params, p_shard)
        opt_state = jax.device_put(opt_state, o_shard)
        carry = jax.device_put(carry, c_shard)

    msg = f'Model Size: {count_params(params)} parameters'
    data = TrainerData(
        config=config,
        vecenv=vecenv,
        policy=policy,
        params=params,
        opt_state=opt_state,
        carry=carry,
        rollout_fn=rollout_fn,
        update_fn=update_fn,
        step_fn=step_fn,
        multi_step_fn=multi_step_fn,
        pending=None,
        batch=None,
        profile=Profile(),
        # shadow fields behind the materializing properties
        _losses=make_losses(),
        _stats={},
        _infos={},
        # (global_step, stats) time series; sweeps optimize over the
        # run rather than the noisy final epoch (reference wandb sweeps
        # optimize the logged series, demo.py:132-151)
        stats_history=[],
        wandb=wandb,
        global_step=0,
        epoch=0,
        msg=msg,
        last_log_time=0.0,
        utilization=None,
        dashboard=None,
    )
    return data


def make_rollout_fn(policy, step_batch, config, T, mask_fn=None):
    """One jitted program: T fused policy+env steps collecting the batch.

    mask_fn: optional batched agent-validity mask (vector.make_mask_fn);
    when set the batch carries a per-row mask honored by the loss."""
    recurrent = isinstance(policy, RecurrentPolicy)
    horizon = config.bptt_horizon

    # storing the collected obs in a narrower dtype (e.g. bfloat16)
    # halves the batch's HBM traffic across every update epoch; the
    # policy casts to its compute dtype on entry either way
    store_dtype = config.get('obs_store_dtype', None)

    def rollout(params, carry):
        def one_step(c, _):
            key, act_key = jax.random.split(c['key'])
            obs = c['obs']
            if recurrent:
                action, logprob, _, value, lstm = policy(
                    params, obs, c['lstm'], key=act_key)
            else:
                action, logprob, _, value = policy(
                    params, obs, key=act_key)
                lstm = c['lstm']

            # counter-mode lane keys: fold_in(lane_key, t) is one
            # threefry block per lane; split-chains cost 2x+ and
            # dominate the rollout at 32k+ lanes
            env_keys = jax.vmap(jax.random.fold_in, (0, None))(
                c['keys'], c['t'])
            (env_states, done_next, next_obs, reward, done, trunc,
                infos) = step_batch(c['env'], c['done'], action, env_keys)

            # stored obs flatten to (N, numel): TPU pads the minor two
            # dims of every array to tile boundaries, so small spatial
            # shapes like (7,7) would inflate the batch ~40x in HBM and
            # make every downstream slice/reshape a real copy; the
            # minibatch loss restores the native shape at the policy
            # boundary (free for policies that flatten anyway)
            obs_store = obs.reshape(obs.shape[0], -1)
            out = dict(
                obs=obs_store if store_dtype is None
                    else obs_store.astype(store_dtype),
                action=action, logprob=logprob,
                value=value.reshape(-1), reward=reward,
                done=done.astype(jnp.float32), info=infos,
                info_count=jnp.sum(
                    jnp.logical_or(done, trunc).astype(jnp.float32)),
            )
            if mask_fn is not None:
                # validity of this row: agents alive in the state the
                # action was computed from
                out['mask'] = mask_fn(c['env'])
            new_c = dict(env=env_states, done=done_next, obs=next_obs,
                keys=c['keys'], t=c['t'] + 1, lstm=lstm, key=key)
            return new_c, out

        def one_segment(c, _):
            lstm0 = c['lstm']
            c, outs = jax.lax.scan(one_step, c, None, length=horizon,
                unroll=config.get('rollout_unroll', 4))
            return c, (outs, lstm0)

        c = dict(carry)
        c, (outs, lstm0) = jax.lax.scan(
            one_segment, c, None, length=T // horizon)
        # outs leaves: (T//h, h, N, ...) -> (T, N, ...)
        outs = jax.tree.map(
            lambda x: x.reshape((T,) + x.shape[2:]), outs)

        # bootstrap value for GAE at the rollout end
        if recurrent:
            last_value = policy.get_value(params, c['obs'], c['lstm'])
        else:
            last_value = policy.get_value(params, c['obs'])
        outs['last_value'] = last_value.reshape(-1)
        if recurrent:
            outs['lstm0'] = lstm0  # (T//h, layers, N, H) x2

        # on-device info aggregation: sums + episode count
        info_sums = jax.tree.map(
            lambda x: jnp.sum(x, axis=(0, 1)) if x.ndim > 1
            else jnp.sum(x), outs.pop('info'))
        episode_count = jnp.sum(outs.pop('info_count'))
        return c, outs, info_sums, episode_count

    return rollout


def make_minibatch_update(policy, tx, config, seg_rows, obs_shape=None,
        time_major=False):
    """One PPO minibatch update: (params, opt_state, mb, lr) ->
    (params, opt_state, stats). mb is a dict of (rows, h, ...) arrays —
    or, with time_major=True (the recurrent time-slab layout), of
    (h, rows, ...) arrays with lstm state (layers, rows, H); obs rows
    may be stored flat (device batch) or native-shaped (host
    Experience) — both reshape to the policy's obs_shape here. Shared
    by the fused epoch runner and the cpu_offload host path (which jits
    this alone and streams minibatches from host RAM)."""
    recurrent = isinstance(policy, RecurrentPolicy)
    h = config.bptt_horizon
    if obs_shape is None:
        obs_shape = getattr(policy.module, 'obs_shape', None)

    def update(params, opt_state, mb, lr):
        def loss_fn(p):
            shape = tuple(obs_shape) if obs_shape is not None \
                else tuple(mb['obs'].shape[2:])
            lead = (h, seg_rows) if time_major else (seg_rows, h)
            obs = mb['obs'].reshape(lead + shape)
            action = mb['action'].reshape(
                (seg_rows * h,) + mb['action'].shape[2:])
            if recurrent and time_major:
                # state already (layers, rows, H); every tensor in the
                # loss flattens in time-major row order consistently
                state = (mb['lstm_h'], mb['lstm_c'])
                _, newlogprob, entropy, newvalue, _ = policy(
                    p, obs, state, action=action, time_major=True)
            elif recurrent:
                state = (jnp.moveaxis(mb['lstm_h'], 0, 1),
                    jnp.moveaxis(mb['lstm_c'], 0, 1))
                _, newlogprob, entropy, newvalue, _ = policy(
                    p, obs, state, action=action)
            else:
                flat_obs = obs.reshape((seg_rows * h,) + obs.shape[2:])
                _, newlogprob, entropy, newvalue = policy(
                    p, flat_obs, action=action)
            loss, stats = ppo_losses(
                newlogprob=newlogprob,
                logprob=mb['logprob'].reshape(-1),
                entropy=entropy,
                newvalue=newvalue,
                values=mb['value'].reshape(-1),
                advantages=mb['advantages'].reshape(-1),
                returns=mb['returns'].reshape(-1),
                clip_coef=config.clip_coef,
                vf_clip_coef=config.vf_clip_coef,
                vf_coef=config.vf_coef,
                ent_coef=config.ent_coef,
                norm_adv=config.norm_adv,
                clip_vloss=config.clip_vloss,
                mask=mb['mask'].reshape(-1) if 'mask' in mb else None,
            )
            return loss, stats

        grads, stats = jax.grad(loss_fn, has_aux=True)(params)
        gnorm = optax.global_norm(grads)
        # pre-clip global grad norm: a healthy-training signal the
        # multichip dryrun asserts nonzero (a sharding bug that zeroes
        # a batch would otherwise still print finite losses)
        stats = dict(stats, grad_norm=gnorm)
        scale = jnp.minimum(1.0, config.max_grad_norm / (gnorm + 1e-12))
        grads = jax.tree.map(lambda g: g * scale, grads)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(
            params, jax.tree.map(lambda u: -lr * u, updates))
        return new_params, new_opt, stats

    return update


def make_epoch_runner(policy, tx, config, seg_rows, num_minibatches, S,
        obs_shape=None, time_major=False, prestacked=False):
    """The PPO epoch x minibatch scan over pre-segmented data.

    seg_batch: dict of (S, h, ...) arrays (obs/action/logprob/value/
    advantages/returns [+ lstm_h/lstm_c (S, layers, H)]) — or, with
    prestacked=True, already (num_minibatches, ...) per-minibatch
    leading (the recurrent time-slab layout). Shared by the fused
    on-device trainer and the host-env trainer (ppo_host)."""
    has_target_kl = config.target_kl is not None
    target_kl = config.target_kl or 0.0
    mb_update = make_minibatch_update(policy, tx, config, seg_rows,
        obs_shape=obs_shape, time_major=time_major)
    if prestacked and config.shuffle_minibatches:
        raise APIUsageError(
            'shuffle_minibatches requires the segment-major layout '
            '(set lstm_time_slab_minibatches=False)')

    def run_epochs(params, opt_state, seg_batch, key, lr):
        def minibatch_step(carry, mb):
            params, opt_state, stop = carry
            new_params, new_opt, stats = mb_update(
                params, opt_state, mb, lr)
            if has_target_kl:
                # only pay the whole-tree select when early stop is on
                new_params = select_tree(stop, params, new_params)
                new_opt = select_tree(stop, opt_state, new_opt)
            return (new_params, new_opt, stop), stats

        # pre-stack the deterministic minibatch partition once: scan
        # consumes slices directly (no gathers on the hot path)
        if prestacked:
            stacked = seg_batch
        else:
            stacked = jax.tree.map(
                lambda x: x.reshape(
                    (num_minibatches, seg_rows) + x.shape[1:]), seg_batch)

        def epoch_step(carry, ep_key):
            params, opt_state, stop = carry
            if config.shuffle_minibatches:
                idxs = jax.random.permutation(ep_key, S)
                mb_idxs = idxs.reshape(num_minibatches, seg_rows)
                mbs = jax.tree.map(
                    lambda x: jnp.take(x, mb_idxs, axis=0), seg_batch)
            else:
                mbs = stacked
            (params, opt_state, stop), stats = jax.lax.scan(
                minibatch_step, (params, opt_state, stop), mbs)
            last_kl = stats['approx_kl'][-1]
            if has_target_kl:
                stop = jnp.logical_or(stop, last_kl > target_kl)
            return (params, opt_state, stop), stats

        ep_keys = jax.random.split(key, config.update_epochs)
        (params, opt_state, _), stats = jax.lax.scan(
            epoch_step, (params, opt_state, jnp.bool_(False)), ep_keys)
        mean_stats = {k: jnp.mean(v) for k, v in stats.items()}
        return params, opt_state, mean_stats

    return run_epochs


def make_update_fn(policy, tx, config, T, total_agents, num_minibatches,
        seg_rows, mesh=None, obs_shape=None):
    """One jitted program: GAE + update_epochs x minibatch PPO."""
    recurrent = isinstance(policy, RecurrentPolicy)
    h = config.bptt_horizon
    n_seg = T // h
    S = total_agents * n_seg

    # Recurrent time-slab minibatches: when each minibatch is exactly
    # one BPTT time-slab over all agents (num_minibatches == T//h),
    # the time-major rollout batch partitions into minibatches by FREE
    # reshape — no segment permutation, and (with LSTMWrapper
    # time_major) no (B,T)<->(T,B) transposes anywhere in the update.
    # Composition differs from the reference's agent-major grouping
    # (same class of change as mlp_contiguous_minibatches; flag off to
    # reproduce the reference composition).
    time_slab = (recurrent and num_minibatches == n_seg
        and not config.shuffle_minibatches
        and config.get('lstm_time_slab_minibatches', True))

    run_epochs = make_epoch_runner(
        policy, tx, config, seg_rows, num_minibatches, S,
        obs_shape=obs_shape, time_major=time_slab,
        prestacked=time_slab)

    contiguous_ok = (not recurrent and mesh is None
        and config.get('mlp_contiguous_minibatches', True))
    if contiguous_ok:
        # Non-recurrent: rows are iid samples — the BPTT agent-major
        # permutation is pure layout traffic (the op profile showed it
        # as 40% of the MLP epoch). A contiguous reshape partitions the
        # batch into minibatches for free; composition differs from the
        # segment-major grouping but PPO only needs SOME partition.
        # Kept agent-major under a mesh (the permutation preserves
        # lane-aligned shardings; a contiguous reshape would force an
        # all-to-all) and under mlp_contiguous_minibatches=False (for
        # bitwise mesh-vs-single-device comparisons).
        def segment(x):
            return x.reshape((S, h) + x.shape[2:])
    else:
        def segment(x):
            # (T, N, ...) -> (S, h, ...) with segment s = n*n_seg + c
            x = x.reshape((n_seg, h, total_agents) + x.shape[2:])
            x = jnp.moveaxis(x, 2, 0)
            return x.reshape((S, h) + x.shape[3:])

    def segment_lstm(x):
        # (n_seg, layers, N, H) -> (S, layers, H)
        x = jnp.moveaxis(x, 2, 0)  # (N, n_seg, layers, H)
        return x.reshape((S,) + x.shape[2:])

    use_pallas_gae = config.get('pallas_gae', None)
    if use_pallas_gae is None:
        use_pallas_gae = jax.devices()[0].platform == 'tpu'

    def gae_fn(reward, value, done, last_value):
        if not use_pallas_gae:
            return compute_gae(reward, value, done, last_value,
                config.gamma, config.gae_lambda)
        from pufferlib_tpu.ops.pallas import compute_gae_pallas
        kernel = functools.partial(compute_gae_pallas,
            gamma=config.gamma, gae_lambda=config.gae_lambda)
        if mesh is None:
            return kernel(reward, value, done, last_value)
        # GSPMD cannot auto-partition a pallas_call; GAE is independent
        # per env lane, so shard_map it over the env axis — each shard
        # runs the kernel on its local lanes, no collectives
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        tn = P(None, 'env')
        return shard_map(kernel, mesh=mesh,
            in_specs=(tn, tn, tn, P('env')), out_specs=tn,
            check_rep=False)(reward, value, done, last_value)

    def slab(x):
        # (T, N, ...) -> (n_seg, h, N, ...): a free reshape; minibatch
        # c is the c-th time-slab, already time-major for the kernel
        return x.reshape((n_seg, h) + x.shape[1:])

    def update(params, opt_state, batch, key, lr):
        advantages = gae_fn(batch['reward'], batch['value'],
            batch['done'], batch['last_value'])
        returns = advantages + batch['value']

        seg = slab if time_slab else segment
        seg_batch = dict(
            obs=seg(batch['obs']),
            action=seg(batch['action']),
            logprob=seg(batch['logprob']),
            value=seg(batch['value']),
            advantages=seg(advantages),
            returns=seg(returns),
        )
        if 'mask' in batch:
            seg_batch['mask'] = seg(batch['mask'])
        if recurrent and time_slab:
            # already (n_seg, layers, N, H): minibatch-leading as-is
            seg_batch['lstm_h'] = batch['lstm0'][0]
            seg_batch['lstm_c'] = batch['lstm0'][1]
        elif recurrent:
            seg_batch['lstm_h'] = segment_lstm(batch['lstm0'][0])
            seg_batch['lstm_c'] = segment_lstm(batch['lstm0'][1])

        params, opt_state, mean_stats = run_epochs(
            params, opt_state, seg_batch, key, lr)

        y_true = returns.reshape(-1)
        y_pred = batch['value'].reshape(-1)
        var_y = jnp.var(y_true)
        mean_stats['explained_variance'] = jnp.where(
            var_y == 0, jnp.nan, 1 - jnp.var(y_true - y_pred) / var_y)
        mean_stats['adv_var'] = jnp.var(advantages)
        return params, opt_state, mean_stats

    return update


@profile_deco
def evaluate(data):
    """Rollout phase: run the fused rollout program once, collect the
    training batch on device, aggregate episode stats."""
    config, profile = data.config, data.profile

    with profile.eval_forward:
        # same PRNG discipline as the fused step: one split per epoch,
        # rollout gets the chain, update gets the branch
        key, update_key = jax.random.split(data.carry['key'])
        data.carry['key'] = key
        data._update_key = update_key
        data.carry, batch, info_sums, episode_count = data.rollout_fn(
            data.params, data.carry)
        jax.block_until_ready(batch['reward'])

    with profile.eval_misc:
        data.batch = batch
        data.global_step += config.batch_size

        episode_count = float(episode_count)
        stats = {}
        info_sums = jax.tree.map(np.asarray, info_sums)
        valid = info_sums.pop('_valid', None)
        denom = float(np.sum(valid)) if valid is not None else episode_count
        media_keys = media.collect_media_stats(
            info_sums, stats, data.wandb, data)
        for k, v in info_sums.items():
            if k in media_keys:
                continue
            if denom > 0:
                stats[k] = float(np.sum(v)) / denom
        data.stats = stats
        data.infos = info_sums
        record_stats(data)

    return data.stats, data.infos


@profile_deco
def train(data):
    """Update phase: one fused GAE+PPO program, then host-side logging,
    lr anneal bookkeeping, and checkpointing."""
    config, profile = data.config, data.profile
    if data.batch is None:
        raise APIUsageError('call evaluate() before train()')

    with profile.learn:
        lr = config.learning_rate
        if config.anneal_lr:
            frac = 1.0 - data.global_step / config.total_timesteps
            lr = frac * config.learning_rate
        update_key = data.get('_update_key')
        if update_key is None:
            data.carry['key'], update_key = jax.random.split(
                data.carry['key'])
        data._update_key = None
        data.params, data.opt_state, stats = data.update_fn(
            data.params, data.opt_state, data.batch, update_key,
            jnp.float32(lr))
        jax.block_until_ready(stats['policy_loss'])

    with profile.train_misc:
        data.batch = None
        losses = make_losses()
        for k in losses:
            if k in stats:
                losses[k] = float(stats[k])
        data.losses = losses
        data.epoch += 1
        data.last_lr = lr

        done_training = data.global_step >= config.total_timesteps
        if profile.update(data) or done_training:
            if data.dashboard is not None:
                data.dashboard(data)
            elif config.verbose:
                print(f'epoch {data.epoch} step {data.global_step} '
                    f'SPS {profile.SPS:.3g} '
                    f'loss {losses.policy_loss:.4f} '
                    + ' '.join(f'{k}={v:.3f}' for k, v in
                        data.stats.items() if isinstance(v, float)))
            if data.wandb is not None and data.global_step > 0 and \
                    time.time() - data.last_log_time > 3.0:
                data.last_log_time = time.time()
                data.wandb.log({
                    '0verview/SPS': profile.SPS,
                    '0verview/agent_steps': data.global_step,
                    '0verview/epoch': data.epoch,
                    '0verview/learning_rate': lr,
                    **{f'environment/{k}': v for k, v in data.stats.items()},
                    **{f'losses/{k}': v for k, v in data.losses.items()},
                    **{f'performance/{k}': v for k, v in data.profile},
                })

        if data.epoch % config.checkpoint_interval == 0 or done_training:
            ckpt.save_checkpoint(data)
            data.msg = f'Checkpoint saved at update {data.epoch}'


def step(data):
    """Fused epoch: ONE device dispatch for rollout + GAE + PPO update.

    This is the max-throughput path: metrics stay on device and are only
    materialized when the dashboard interval fires, so the host never
    blocks on the accelerator. evaluate()/train() remain for reference
    API parity and phase-level profiling.
    """
    config = data.config
    lr = config.learning_rate
    if config.anneal_lr:
        lr = (1.0 - (data.global_step + config.batch_size)
            / config.total_timesteps) * lr

    (data.params, data.opt_state, data.carry, stats, info_sums,
        episode_count) = data.step_fn(data.params, data.opt_state,
        data.carry)

    # keep metrics as device arrays; materialize lazily
    data.pending = (stats, info_sums, episode_count)
    data.global_step += config.batch_size
    data.epoch += 1
    data.last_lr = lr

    done_training = data.global_step >= config.total_timesteps
    # track_history: sweeps optimize the run's metric series, so
    # materialize at the profile interval even with no other sink
    wants_metrics = (data.dashboard is not None or config.verbose
        or data.wandb is not None or config.get('track_history', False))
    if (data.profile.update(data) or done_training) and wants_metrics:
        _materialize_metrics(data)
        if data.dashboard is not None:
            data.dashboard(data)
        elif config.verbose:
            print(f'epoch {data.epoch} step {data.global_step} '
                f'SPS {data.profile.SPS:.3g} '
                + ' '.join(f'{k}={v:.3f}' for k, v in data.stats.items()
                    if isinstance(v, float)))
        _log_wandb(data)
    if data.epoch % config.checkpoint_interval == 0 or done_training:
        ckpt.save_checkpoint(data)
        data.msg = f'Checkpoint saved at update {data.epoch}'
    # return the last-materialized stats WITHOUT forcing a device sync
    # (reading data.stats materializes pending metrics; see TrainerData)
    return data.__dict__['_stats']


def step_many(data, epochs):
    """Run `epochs` fused epochs in a single device dispatch. Same
    semantics as calling step() `epochs` times, minus the per-epoch
    dispatch latency; dashboard/wandb fire once at the end."""
    config = data.config
    lr = config.learning_rate
    if config.anneal_lr:
        frac = 1.0 - (data.global_step
            + epochs * config.batch_size) / config.total_timesteps
        lr = frac * config.learning_rate

    (data.params, data.opt_state, data.carry, stats, info_sums,
        episode_count) = data.multi_step_fn(data.params, data.opt_state,
        data.carry, epochs)
    data.pending = (stats, info_sums, episode_count)
    data.global_step += epochs * config.batch_size
    data.epoch += epochs
    data.last_lr = lr

    done_training = data.global_step >= config.total_timesteps
    # track_history: sweeps optimize the run's metric series, so
    # materialize at the profile interval even with no other sink
    wants_metrics = (data.dashboard is not None or config.verbose
        or data.wandb is not None or config.get('track_history', False))
    if (data.profile.update(data) or done_training) and wants_metrics:
        _materialize_metrics(data)
        if data.dashboard is not None:
            data.dashboard(data)
        elif config.verbose:
            print(f'epoch {data.epoch} step {data.global_step} '
                f'SPS {data.profile.SPS:.3g} '
                + ' '.join(f'{k}={v:.3f}' for k, v in data.stats.items()
                    if isinstance(v, float)))
        _log_wandb(data)
    if done_training or data.epoch % config.checkpoint_interval < epochs:
        ckpt.save_checkpoint(data)
    # no forced device sync here — see step()
    return data.__dict__['_stats']


def _log_wandb(data):
    """wandb sink for the fused paths (same metric names as train())."""
    if data.wandb is None or data.global_step == 0:
        return
    if time.time() - data.last_log_time <= 3.0:
        return
    data.last_log_time = time.time()
    data.wandb.log({
        '0verview/SPS': data.profile.SPS,
        '0verview/agent_steps': data.global_step,
        '0verview/epoch': data.epoch,
        '0verview/learning_rate': data.last_lr,
        **{f'environment/{k}': v for k, v in data.stats.items()},
        **{f'losses/{k}': v for k, v in data.losses.items()},
        **{f'performance/{k}': v for k, v in data.profile},
    })


def _materialize_metrics(data):
    """Pull the most recent device metrics to the host."""
    if data.pending is None:
        return
    stats, info_sums, episode_count = data.pending
    data.pending = None
    losses = make_losses()
    for k in losses:
        if k in stats:
            losses[k] = float(stats[k])
    data.losses = losses
    info_sums = jax.tree.map(np.asarray, dict(info_sums))
    valid = info_sums.pop('_valid', None)
    denom = float(np.sum(valid)) if valid is not None \
        else float(episode_count)
    stats_out = {}
    media_keys = media.collect_media_stats(
        info_sums, stats_out, data.wandb, data)
    stats_out.update({k: float(np.sum(v)) / denom
        for k, v in info_sums.items()
        if denom > 0 and k not in media_keys})
    data.stats = stats_out
    data.infos = info_sums
    record_stats(data)


def record_stats(data):
    """Append the current stats snapshot to data.stats_history (the
    sweep objective's time series), bounded by decimation."""
    history = data.get('stats_history')
    if history is None:
        return
    # TrainerData shadows stats behind '_stats'; the host trainer's
    # plain namespace stores it as 'stats'
    stats = data.get('_stats') or data.get('stats') or {}
    numeric = {k: v for k, v in stats.items()
        if isinstance(v, (int, float))}
    if numeric:
        history.append((data.global_step, numeric))
        if len(history) > 8192:  # keep memory bounded on long runs
            del history[::2]


def close(data):
    data.vecenv.close()
    if data.wandb is not None:
        model_path = ckpt.save_checkpoint(data)
        artifact = data.wandb.Artifact(
            f'{data.config.exp_id}_model', type='model')
        artifact.add_file(model_path)
        data.wandb.run.log_artifact(artifact)
        data.wandb.finish()


def train_loop(data, fused=True):
    """Convenience: run until total_timesteps. fused=True uses the
    single-dispatch step(); fused=False mirrors the reference
    evaluate()/train() split (useful for phase profiling)."""
    while data.global_step < data.config.total_timesteps:
        if fused:
            step(data)
        else:
            evaluate(data)
            train(data)
    _materialize_metrics(data)
    return data
