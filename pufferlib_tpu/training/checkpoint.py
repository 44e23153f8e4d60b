"""Checkpoint/resume: param/opt pytrees + trainer counters.

Parity: reference clean_pufferl.py:509-546 (save_checkpoint /
try_load_checkpoint) — model_{epoch:06d} + trainer_state with atomic
tmp+rename under {data_dir}/{exp_id}. Format is framework-native
(pickled numpy pytrees), not torch; parity is behavioral.
"""
import os
import pickle

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_pytree(tree, path):
    with open(path + '.tmp', 'wb') as f:
        pickle.dump(_to_numpy(tree), f)
    os.replace(path + '.tmp', path)


def load_pytree(path):
    with open(path, 'rb') as f:
        return pickle.load(f)


def save_checkpoint(data):
    """Write model_{epoch}.ckpt + trainer_state.ckpt atomically."""
    config = data.config
    path = os.path.join(config.data_dir, config.exp_id)
    os.makedirs(path, exist_ok=True)

    model_name = f'model_{data.epoch:06d}.ckpt'
    model_path = os.path.join(path, model_name)
    save_pytree(data.params, model_path)

    state = dict(
        opt_state=_to_numpy(data.opt_state),
        global_step=data.global_step,
        agent_step=data.global_step,
        update=data.epoch,
        model_name=model_name,
        exp_id=config.exp_id,
    )
    state_path = os.path.join(path, 'trainer_state.ckpt')
    with open(state_path + '.tmp', 'wb') as f:
        pickle.dump(state, f)
    os.replace(state_path + '.tmp', state_path)
    return model_path


def try_load_checkpoint(data):
    """Restore params/opt_state/counters if a checkpoint exists."""
    config = data.config
    path = os.path.join(config.data_dir, config.exp_id)
    trainer_path = os.path.join(path, 'trainer_state.ckpt')
    if not os.path.exists(trainer_path):
        print('No checkpoints found. Assuming new experiment')
        return False

    with open(trainer_path, 'rb') as f:
        state = pickle.load(f)
    data.global_step = state['global_step']
    data.epoch = state['update']
    params = load_pytree(os.path.join(path, state['model_name']))
    data.params = jax.tree.map(lambda a, b: b.astype(a.dtype) if hasattr(
        b, 'astype') else b, data.params, params)
    data.opt_state = jax.tree.map(
        lambda a, b: b, data.opt_state, state['opt_state'])
    print(f'Loaded checkpoint {state["model_name"]}')
    return True
