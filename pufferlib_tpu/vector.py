"""Vectorization: many envs as one XLA program.

The reference ships three backends (Serial / Multiprocessing shared-memory
envpool / Ray — vector.py:70,218,449) behind a sync (reset/step) + async
(async_reset/send/recv) protocol with a flag FSM (vector.py:17-42). Here
the worker-pool machinery collapses into `jax.vmap` inside jit:

- Device: N env lanes stepped as one fused program on the accelerator.
  Optional batch_size < num_envs cycles contiguous lane groups, the analog
  of the reference envpool's zero-copy worker-block mode (vector.py:362-381).
- Serial: python-loop over the same single-env step logic, for bit-exact
  equivalence tests against Device (the reference's key behavioral
  contract, tests/test.py:104-160).

Auto-reset follows reference semantics (vector.py:147-151): a lane whose
previous step finished resets on the next send, yielding reward=0,
done=False. Observations leave the engine flattened per the emulation
layer; actions arrive flat (MultiDiscrete) and are nativized on device.
"""
import numpy as np
import jax
import jax.numpy as jnp

from pufferlib_tpu import emulation, spaces
from pufferlib_tpu.environment import autoreset_step
from pufferlib_tpu.exceptions import APIUsageError
from pufferlib_tpu.namespace import namespace

RESET, STEP, SEND, RECV, CLOSE, MAIN, INFO = range(7)


def recv_precheck(vecenv):
    if vecenv.flag != RECV:
        raise APIUsageError('Call reset before stepping')
    vecenv.flag = SEND


def send_precheck(vecenv, actions):
    if vecenv.flag != SEND:
        raise APIUsageError('Call (async) reset + recv before sending')
    if not vecenv.initialized:
        vecenv.initialized = True
        check_actions(np.asarray(actions), vecenv.single_action_space,
            vecenv.batch_agents)
    vecenv.flag = RECV
    return actions


def check_actions(actions, single_space, batch):
    """One-time action validation (analog of joint-space contains,
    reference vector.py:31-42)."""
    if isinstance(single_space, spaces.Discrete):
        ok = (actions.size == batch and np.all(actions >= 0)
            and np.all(actions < single_space.n))
    elif isinstance(single_space, spaces.MultiDiscrete):
        nvec = np.asarray(single_space.nvec)
        ok = (actions.shape == (batch, len(nvec))
            and np.all(actions >= 0) and np.all(actions < nvec))
    else:
        ok = actions.shape[:1] == (batch,)
    if not ok:
        raise APIUsageError('Actions do not match action space')


def make_seeds(seed, num_envs):
    if isinstance(seed, int):
        return [seed + i for i in range(num_envs)]
    if len(seed) != num_envs:
        raise APIUsageError('Seed list length must equal num_envs')
    return list(seed)


def nativize_actions(flat_actions, space):
    """Flat (B,) / (B, k) int actions -> native action pytree.

    Inverse of emulation.emulate_action_space: nested spaces with Discrete
    leaves consume one column per leaf (reference emulation.py:204-210).
    """
    if isinstance(space, spaces.Discrete):
        return flat_actions.reshape(flat_actions.shape[0])
    if isinstance(space, spaces.MultiDiscrete):
        return flat_actions.reshape(
            flat_actions.shape[0], len(space.nvec))

    flat_actions = flat_actions.reshape(flat_actions.shape[0], -1)
    col = [0]

    def build(sp):
        if isinstance(sp, spaces.Discrete):
            out = flat_actions[:, col[0]]
            col[0] += 1
            return out
        if isinstance(sp, spaces.Dict):
            return {k: build(v) for k, v in sp.items()}
        if isinstance(sp, spaces.Tuple):
            return tuple(build(s) for s in sp)
        raise APIUsageError(
            f'Nested action spaces must have Discrete leaves, got {sp}')

    return build(space)


def flatten_obs_batch(obs, space, emulated):
    """Structured obs pytree (B, ...) -> flat (B, numel) per the emulation
    dtype spec. Pure bitcast/reshape/concat — free under XLA. Box obs pass
    through with their native shape (reference contract: emulation.py:99)."""
    if isinstance(space, spaces.Box):
        return obs

    sample_dtype = np.dtype(emulated.observation_dtype)
    spec = emulation.nativize_dtype(emulated)
    numel = (np.dtype(emulated.emulated_observation_dtype).itemsize
        // sample_dtype.itemsize)

    def leaf_arrays(sp, ob, sp_spec):
        if isinstance(sp, spaces.Dict):
            out = []
            for k, v in sp.items():
                out.extend(leaf_arrays(v, ob[k], sp_spec[k]))
            return out
        if isinstance(sp, spaces.Tuple):
            out = []
            for i, v in enumerate(sp):
                out.extend(leaf_arrays(v, ob[i], sp_spec[f'f{i}']))
            return out
        return [(sp_spec, ob)]

    if isinstance(spec, tuple):
        pieces = [(spec, obs)]
    else:
        pieces = leaf_arrays(space, obs, spec)

    batch = jax.tree.leaves(obs)[0].shape[0]
    out = jnp.zeros((batch, numel), dtype=jnp.dtype(sample_dtype))
    for (dtype, shape, offset, delta), leaf in pieces:
        leaf = jnp.asarray(leaf).reshape(batch, -1).astype(jnp.dtype(dtype))
        if sample_dtype.itemsize == 1 and dtype.itemsize != 1:
            leaf = jax.lax.bitcast_convert_type(leaf, jnp.uint8)
            leaf = leaf.reshape(batch, -1)
        if leaf.dtype != out.dtype:
            leaf = jax.lax.bitcast_convert_type(leaf, out.dtype)
        out = jax.lax.dynamic_update_slice_in_dim(out, leaf, offset, axis=1)
    return out


def make_env_ops(env, emulated):
    """Build the vmapped (reset_batch, step_batch) closures for an env.

    reset_batch(keys)                 -> (states, flat_obs, dones)
    step_batch(states, done_prev, flat_actions, keys)
        -> (states, done_next, flat_obs, reward, done, trunc, infos)

    flat obs/reward/done are agent-major (num_lanes*num_agents, ...).
    Used by both the Device vector backend and the fused trainer, so the
    step logic inside the training program is identical to the step-API.
    """
    obs_space = env.observation_space
    atn_space = env.action_space

    def flatten(obs):
        if env.num_agents > 1:
            obs = jax.tree.map(
                lambda o: o.reshape((-1,) + o.shape[2:]), obs)
        return flatten_obs_batch(obs, obs_space, emulated)

    def reset_lane(key):
        state, obs = env.reset(key)
        done = jnp.zeros(
            () if env.num_agents == 1 else (env.num_agents,), jnp.bool_)
        return state, obs, done

    def step_lane(state, done_prev, action, key):
        return autoreset_step(env, state, done_prev, action, key)

    def reset_batch(keys):
        states, obs, dones = jax.vmap(reset_lane)(keys)
        return states, flatten(obs), dones

    def step_batch(states, done_prev, flat_actions, keys):
        n_lanes = done_prev.shape[0]
        per_lane = flat_actions.reshape((n_lanes * env.num_agents, -1))
        native = nativize_actions(per_lane, atn_space)
        if env.num_agents > 1:
            native = jax.tree.map(
                lambda a: a.reshape(
                    (n_lanes, env.num_agents) + a.shape[1:]), native)
        step, done_next = jax.vmap(step_lane)(states, done_prev, native, keys)
        flat = lambda x: x.reshape((-1,) + x.shape[2:]) \
            if env.num_agents > 1 else x
        return (step.state, done_next, flatten(step.obs),
            flat(step.reward), flat(step.done), flat(step.truncated),
            jax.tree.map(flat, step.info))

    return reset_batch, step_batch


def make_mask_fn(env):
    """Batched agent-validity mask: envs with variable agent counts
    (PettingZoo dead/padded agents, emulation.py:391-418 semantics)
    define `agent_mask(state) -> (num_agents,) bool`; rows of dead
    agents are excluded from the PPO loss exactly like the reference's
    experience.store mask (clean_pufferl.py:437-439). Returns None for
    fixed-agent envs (no masking cost on the hot path)."""
    if not hasattr(env, 'agent_mask'):
        return None

    def mask_batch(states):
        m = jax.vmap(env.agent_mask)(states)  # (lanes, num_agents)
        return m.reshape(-1).astype(jnp.float32)
    return mask_batch


def check_envs(envs, driver):
    for env in envs:
        if env.observation_space != driver.observation_space and not (
                repr(env.observation_space) == repr(driver.observation_space)):
            raise APIUsageError('Observation spaces do not match')


class Device:
    """All envs vmapped into one jitted program on the accelerator.

    num_envs lanes; optional batch_size < num_envs cycles contiguous lane
    groups round-robin (async envpool semantics without workers). Results
    stay on device as jax arrays; call np.asarray to materialize.
    """

    def __init__(self, env_creators, env_args=None, env_kwargs=None,
            num_envs=1, batch_size=None, seed=42, **kwargs):
        creator = env_creators[0] if isinstance(env_creators, (list, tuple)) \
            else env_creators
        args = (env_args[0] if env_args and isinstance(env_args[0],
            (list, tuple)) else env_args) or []
        kw = (env_kwargs[0] if isinstance(env_kwargs, (list, tuple))
            else env_kwargs) or {}
        self.env = creator(*args, **kw) if callable(creator) else creator
        self.driver_env = self

        if batch_size is None:
            batch_size = num_envs
        if num_envs % batch_size != 0:
            raise APIUsageError('num_envs must be divisible by batch_size')
        self.num_envs_total = num_envs
        self.batch_envs = batch_size
        self.num_groups = num_envs // batch_size

        env = self.env
        self.agents_per_env = env.num_agents
        self.num_agents = num_envs * env.num_agents
        self.batch_agents = batch_size * env.num_agents

        obs_space = env.observation_space
        atn_space = env.action_space
        self.single_observation_space, self.obs_dtype = \
            emulation.emulate_observation_space(obs_space)
        self.single_action_space, self.atn_dtype = \
            emulation.emulate_action_space(atn_space)
        self.emulated = namespace(
            observation_dtype=np.dtype(self.single_observation_space.dtype),
            emulated_observation_dtype=self.obs_dtype,
        )
        self.agent_ids = np.arange(self.num_agents)
        self.initialized = False
        self.flag = RESET
        self._build()

        self._state = None
        self._pending = None
        self._group = 0

    # ---- program construction ---------------------------------------
    def _build(self):
        reset_batch, step_batch = make_env_ops(self.env, self.emulated)
        self._reset_batch = jax.jit(reset_batch)
        self._step_batch = jax.jit(step_batch, donate_argnums=(0,))
        self._fold_steps = jax.jit(
            jax.vmap(jax.random.fold_in, (0, None)))

    # ---- async protocol ----------------------------------------------
    def async_reset(self, seed=42):
        self.flag = RECV
        seeds = jnp.asarray(make_seeds(seed, self.num_envs_total))
        base = jax.random.PRNGKey(0)
        # fold each lane's own seed in, so per-env seed lists are honored
        lane_keys = jax.vmap(jax.random.fold_in, (None, 0))(base, seeds)
        reset_base = jax.random.split(base)[1]
        reset_keys = jax.vmap(jax.random.fold_in, (None, 0))(
            reset_base, seeds)

        states, obs, dones = self._reset_batch(reset_keys)
        self._state = namespace(env=states, done=dones, keys=lane_keys)
        self._steps = [0] * self.num_groups

        agents = self.batch_agents
        zero_r = jnp.zeros(agents, jnp.float32)
        zero_b = jnp.zeros(agents, jnp.bool_)
        self._pending = [
            (obs[g * agents:(g + 1) * agents], zero_r, zero_b, zero_b, {})
            for g in range(self.num_groups)]
        self._group = 0

    def send(self, actions):
        actions = send_precheck(self, actions)
        actions = jnp.asarray(actions)
        g = self._group
        B = self.batch_envs
        lo = g * B

        def lane_slice(x):
            return jax.lax.slice_in_dim(x, lo, lo + B, axis=0)

        states = jax.tree.map(lane_slice, self._state.env)
        done = lane_slice(self._state.done)
        keys = lane_slice(self._state.keys)
        # counter-mode derivation: lane keys are static, the step index
        # folds in — one threefry block/lane/step (split-chains cost 2x+)
        t = self._steps[g]
        self._steps[g] = t + 1
        sub = self._fold_steps(keys, jnp.uint32(t))

        (new_states, done_next, obs, rew, dn, tr, infos) = \
            self._step_batch(states, done, actions, sub)

        def scatter(full, part):
            return jax.lax.dynamic_update_slice_in_dim(
                full, part, lo, axis=0)

        self._state.env = jax.tree.map(scatter, self._state.env, new_states)
        self._state.done = scatter(self._state.done, done_next)
        self._pending[g] = (obs, rew, dn, tr, infos)
        self._group = (g + 1) % self.num_groups

    def recv(self):
        recv_precheck(self)
        g = self._group
        obs, rew, dn, tr, infos = self._pending[g]
        agents = self.batch_agents
        ids = self.agent_ids[g * agents:(g + 1) * agents]
        if hasattr(self.env, 'agent_mask'):
            B = self.batch_envs
            lo = g * B
            states = jax.tree.map(lambda x: jax.lax.slice_in_dim(
                x, lo, lo + B, axis=0), self._state.env)
            mask = np.asarray(jax.vmap(self.env.agent_mask)(states)
                ).reshape(-1)
        else:
            mask = np.ones(agents, dtype=bool)
        return obs, rew, dn, tr, infos, ids, mask

    # ---- sync API ------------------------------------------------------
    def reset(self, seed=42):
        self.async_reset(seed)
        obs, _, _, _, infos, _, _ = self.recv()
        return obs, infos

    def step(self, actions):
        self.send(actions)
        obs, rew, dn, tr, infos, _, _ = self.recv()
        return obs, rew, dn, tr, infos

    def close(self):
        self._state = None

    @property
    def num_envs(self):
        return self.batch_agents

    def nativize(self, flat_obs_batch):
        """Flat obs batch -> structured pytree (for policies)."""
        spec = emulation.nativize_dtype(self.emulated)
        return emulation.nativize_tensor(flat_obs_batch, spec)


class Serial:
    """Reference-semantics python loop over single-env step logic. Exists
    for bit-exact equivalence testing of Device (reference
    tests/test.py:104-160 contract) and tiny-scale debugging."""

    def __init__(self, env_creators, env_args=None, env_kwargs=None,
            num_envs=1, seed=42, **kwargs):
        creator = env_creators[0] if isinstance(env_creators, (list, tuple)) \
            else env_creators
        kw = (env_kwargs[0] if isinstance(env_kwargs, (list, tuple))
            else env_kwargs) or {}
        args = (env_args[0] if env_args and isinstance(env_args[0],
            (list, tuple)) else env_args) or []
        self.env = creator(*args, **kw) if callable(creator) else creator
        self.driver_env = self
        self.num_envs_total = num_envs
        self.batch_envs = num_envs
        env = self.env
        self.agents_per_env = env.num_agents
        self.num_agents = num_envs * env.num_agents
        self.batch_agents = self.num_agents
        self.single_observation_space, self.obs_dtype = \
            emulation.emulate_observation_space(env.observation_space)
        self.single_action_space, self.atn_dtype = \
            emulation.emulate_action_space(env.action_space)
        self.emulated = namespace(
            observation_dtype=np.dtype(self.single_observation_space.dtype),
            emulated_observation_dtype=self.obs_dtype,
        )
        self.agent_ids = np.arange(self.num_agents)
        self.initialized = False
        self.flag = RESET

    def async_reset(self, seed=42):
        self.flag = RECV
        seeds = make_seeds(seed, self.num_envs_total)
        base = jax.random.PRNGKey(0)
        reset_base = jax.random.split(base)[1]
        self._keys = [jax.random.fold_in(base, s)
            for s in seeds]
        reset_keys = [jax.random.fold_in(reset_base, s)
            for s in seeds]

        env = self.env
        self._step_count = 0
        self._states, obs_list, self._done = [], [], []
        for i in range(self.num_envs_total):
            state, obs = env.reset(reset_keys[i])
            self._states.append(state)
            obs_list.append(obs)
            self._done.append(jnp.zeros(
                () if env.num_agents == 1 else (env.num_agents,), jnp.bool_))
        obs = jax.tree.map(lambda *x: jnp.stack(x), *obs_list)
        self._pending = (self._flatten(obs),
            jnp.zeros(self.num_agents, jnp.float32),
            jnp.zeros(self.num_agents, jnp.bool_),
            jnp.zeros(self.num_agents, jnp.bool_), {})

    def _flatten(self, obs):
        env = self.env
        if env.num_agents > 1:
            obs = jax.tree.map(
                lambda o: o.reshape((-1,) + o.shape[2:]), obs)
        return flatten_obs_batch(obs, env.observation_space, self.emulated)

    def send(self, actions):
        actions = send_precheck(self, actions)
        actions = jnp.asarray(actions)
        env = self.env
        A = env.num_agents
        per_lane = actions.reshape((self.num_agents, -1))
        native = nativize_actions(per_lane, env.action_space)

        obs_l, rew_l, done_l, trunc_l, info_l = [], [], [], [], []
        t = self._step_count
        self._step_count = t + 1
        for i in range(self.num_envs_total):
            lane_atn = jax.tree.map(
                lambda a: a[i * A:(i + 1) * A] if A > 1 else a[i], native)
            sub = jax.random.fold_in(self._keys[i], jnp.uint32(t))
            step, done_next = autoreset_step(
                env, self._states[i], self._done[i], lane_atn, sub)
            self._states[i] = step.state
            self._done[i] = done_next
            obs_l.append(step.obs)
            rew_l.append(jnp.atleast_1d(step.reward))
            done_l.append(jnp.atleast_1d(step.done))
            trunc_l.append(jnp.atleast_1d(step.truncated))
            info_l.append(step.info)

        obs = jax.tree.map(lambda *x: jnp.stack(x), *obs_l)
        infos = jax.tree.map(lambda *x: jnp.stack(x), *info_l) \
            if info_l and info_l[0] else {}
        if A > 1:
            infos = jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:]), infos)
        self._pending = (
            self._flatten(obs),
            jnp.concatenate(rew_l), jnp.concatenate(done_l),
            jnp.concatenate(trunc_l), infos)

    def recv(self):
        recv_precheck(self)
        obs, rew, dn, tr, infos = self._pending
        return (obs, rew, dn, tr, infos, self.agent_ids,
            np.ones(self.num_agents, dtype=bool))

    def reset(self, seed=42):
        self.async_reset(seed)
        obs, _, _, _, infos, _, _ = self.recv()
        return obs, infos

    def step(self, actions):
        self.send(actions)
        obs, rew, dn, tr, infos, _, _ = self.recv()
        return obs, rew, dn, tr, infos

    def close(self):
        pass

    @property
    def num_envs(self):
        return self.num_agents


def make(env_creator, env_args=None, env_kwargs=None, backend=Device,
        num_envs=1, num_workers=None, batch_size=None, seed=42, **kwargs):
    """Vector engine factory (analog of reference vector.py:577-637).

    num_workers is accepted for API compatibility; the Device backend has
    no worker processes — lanes are vmapped on the accelerator.
    """
    if num_envs < 1 or int(num_envs) != num_envs:
        raise APIUsageError('num_envs must be a positive integer')
    if batch_size is not None and num_envs % batch_size != 0:
        raise APIUsageError('num_envs must be divisible by batch_size')
    if backend is Serial:
        if batch_size is not None and batch_size != num_envs:
            raise APIUsageError(
                'Serial steps all envs together; batch_size < num_envs '
                '(async env-pool mode) requires the Device backend')
        return Serial(env_creator, env_args, env_kwargs,
            num_envs=num_envs, seed=seed, **kwargs)
    return backend(env_creator, env_args, env_kwargs, num_envs=num_envs,
        batch_size=batch_size, seed=seed, **kwargs)
