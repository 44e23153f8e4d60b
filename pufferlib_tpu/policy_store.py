"""Directory of checkpointed policies for self-play opponents.

Parity: reference pufferlib/policy_store.py:6-26 (.pt files -> named
policies); here policies are pickled param pytrees (.ckpt) written by
training.checkpoint. Reference torch checkpoints (.pt) sitting in the
same directory are served too, converted on read via
frameworks/torch_import — a reference user's opponent pool migrates
as-is.
"""
import os

from pufferlib_tpu.training.checkpoint import load_pytree


class PolicyStore:
    def __init__(self, path):
        self.path = path

    def policy_names(self):
        names = set()
        for file in os.listdir(self.path):
            for ext in ('.ckpt', '.pt'):
                if file.endswith(ext) and file.startswith('model_'):
                    names.add(file[:-len(ext)])
        return sorted(names)

    def get_policy(self, name):
        ckpt = os.path.join(self.path, name + '.ckpt')
        if os.path.exists(ckpt):
            return load_pytree(ckpt)
        from pufferlib_tpu.frameworks import torch_import
        return torch_import.load_pt(os.path.join(self.path, name + '.pt'))
