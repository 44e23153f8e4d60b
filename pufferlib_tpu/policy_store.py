"""Directory of checkpointed policies for self-play opponents.

Parity: reference pufferlib/policy_store.py:6-26 (.pt files -> named
policies); here policies are pickled param pytrees (.ckpt) written by
training.checkpoint.
"""
import os

from pufferlib_tpu.training.checkpoint import load_pytree


class PolicyStore:
    def __init__(self, path):
        self.path = path

    def policy_names(self):
        names = []
        for file in os.listdir(self.path):
            if file.endswith('.ckpt') and file.startswith('model_'):
                names.append(file[:-len('.ckpt')])
        return sorted(names)

    def get_policy(self, name):
        return load_pytree(os.path.join(self.path, name + '.ckpt'))
