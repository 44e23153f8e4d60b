"""CNN-path proofs on the VisualTarget pixel micro-env.

Fast: the JAX env (pufferlib_tpu/ocean/ocean.py VisualTarget) and the
reference-side numpy twin (tools/visual_env_ref.py VisualTargetRef) are
byte-identical in dynamics — same obs rendering, shaping reward,
termination — so the conv head-to-head (docs/h2h_visual.json) trains the
two stacks on provably identical environments.

Slow: the flax Convolutional (models/__init__.py, reference
models.py:113-157 analog) LEARNS from pixels through the fused device
trainer — the BASELINE "Atari curves" proof as far as this image allows
(Atari itself is uninstallable here). Runs in a subprocess on the real
TPU (the conftest pins this process to CPU, where a conv train step is
~70 SPS on this 1-core box); skipped when no TPU is reachable.
"""
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'tools'))


def test_visual_twin_lockstep():
    """Same (agent, target, action) -> identical obs bytes, reward,
    done on both implementations, across random states and actions."""
    from visual_env_ref import VisualTargetRef
    from pufferlib_tpu.ocean import VisualTarget

    jax_env = VisualTarget()
    ref_env = VisualTargetRef()
    step = jax.jit(jax_env.step)
    rng = np.random.RandomState(7)

    for trial in range(20):
        agent = rng.randint(0, 10, 2)
        target = rng.randint(0, 10, 2)
        if np.all(agent == target):
            target[1] = (target[1] + 1) % 10
        # force both envs into the same state
        ref_env.agent = agent.copy()
        ref_env.target = target.copy()
        ref_env.tick = 0
        state = dict(agent=jnp.asarray(agent, jnp.int32),
            target=jnp.asarray(target, jnp.int32), tick=jnp.int32(0))
        np.testing.assert_array_equal(
            np.asarray(jax_env._obs(state['agent'], state['target'])),
            ref_env._obs())

        done = False
        for t in range(32):
            action = rng.randint(0, 5)
            s = step(state, jnp.int32(action), jax.random.PRNGKey(t))
            ob_r, rew_r, done_r, trunc_r, info_r = ref_env.step(action)
            np.testing.assert_array_equal(np.asarray(s.obs), ob_r)
            assert np.isclose(float(s.reward), rew_r, atol=1e-6), \
                (trial, t, float(s.reward), rew_r)
            assert bool(s.done) == done_r
            if done_r:
                assert float(s.info['score']) == info_r['score']
                done = True
                break
            state = s.state
        # horizon semantics: tick increments before the done check, so
        # both twins MUST terminate by the 32nd step (reached or horizon)
        assert done, (trial, t)


def test_visual_obs_spec():
    """Obs is (2, 40, 40) uint8 with exactly one 4x4 block per channel."""
    from pufferlib_tpu.ocean import VisualTarget
    env = VisualTarget()
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    obs = np.asarray(obs)
    assert obs.shape == (2, 40, 40) and obs.dtype == np.uint8
    for ch in range(2):
        assert (obs[ch] == 255).sum() == 16
        assert set(np.unique(obs[ch])) <= {0, 255}
    # agent and target never overlap at reset
    assert not np.any((obs[0] == 255) & (obs[1] == 255))


def test_visual_shaping_reward():
    """Moving toward the target pays +0.1, away -0.1; arrival pays +1
    and terminates."""
    from pufferlib_tpu.ocean import VisualTarget
    env = VisualTarget()
    step = jax.jit(env.step)
    state = dict(agent=jnp.array([5, 4], jnp.int32),
        target=jnp.array([5, 6], jnp.int32), tick=jnp.int32(0))
    s = step(state, jnp.int32(4), jax.random.PRNGKey(0))  # right: closer
    assert np.isclose(float(s.reward), 0.1)
    assert not bool(s.done)
    s2 = step(s.state, jnp.int32(3), jax.random.PRNGKey(1))  # left: away
    assert np.isclose(float(s2.reward), -0.1)
    s3 = step(s.state, jnp.int32(4), jax.random.PRNGKey(2))  # arrive
    assert np.isclose(float(s3.reward), 0.1 + 1.0)
    assert bool(s3.done) and float(s3.info['score']) == 1.0


_TRAIN_SNIPPET = r'''
import jax, sys
if jax.devices()[0].platform != 'tpu':
    print('NO_TPU'); sys.exit(0)
sys.path.insert(0, %(tools)r)
import head_to_head
head_to_head.HP['visual']['total_timesteps'] = 131072
out = head_to_head.run_repo('visual', seed=1)
print('TAIL', out['tail'])
'''


@pytest.mark.slow
def test_conv_learns_from_pixels_tpu():
    """Convolutional trained by the fused device trainer reaches >=0.6
    reach-rate from pixels within 131k steps (reference-side torch conv
    converges to ~0.845 at 262k on the identical env,
    docs/h2h_visual.json). Subprocess: this process is CPU-pinned."""
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    proc = subprocess.run(
        [sys.executable, '-c',
         _TRAIN_SNIPPET % {'tools': os.path.join(REPO, 'tools')}],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO)
    out = proc.stdout
    if 'NO_TPU' in out:
        pytest.skip('no TPU reachable from subprocess')
    assert proc.returncode == 0, proc.stderr[-2000:]
    tail = float([ln for ln in out.splitlines()
        if ln.startswith('TAIL')][-1].split()[1])
    assert tail >= 0.6, f'conv policy failed to learn from pixels: {tail}'
