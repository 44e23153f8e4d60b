"""Import reference-PufferLib torch policy checkpoints.

The reference saves whole torch policy modules / state_dicts
(`model_{epoch:06d}.pt`, reference clean_pufferl.py:509-530). Users
migrating to pufferlib_tpu can convert trained `Default` /
`LSTMWrapper(Default)` policies (reference models.py:12-111) into the
flax param pytrees this repo's `models.Default` / `models.LSTMWrapper`
consume — output-equivalence is tested against the actually-executing
reference modules in tests/test_torch_import.py.

Layout mapping (torch -> flax):
- Linear `weight` (out, in) transposes to Dense `kernel` (in, out).
- The reference's separate decoder head(s) + value_head concatenate
  into this repo's fused `head` kernel `[logit blocks | value]`
  (models/__init__.py Default.setup).
- torch nn.LSTM keeps two bias vectors (b_ih + b_hh) and (4H, in)
  weights; this repo's LSTMWrapper uses one bias and (in, 4H) weights
  with the same i,f,g,o gate order, so `b = b_ih + b_hh` and the
  weights transpose.

Only CPU tensors are touched; torch is imported lazily so the module
stays importable without it.
"""
import numpy as np


def _t(state_dict, key):
    """state_dict tensor -> float32 numpy array."""
    v = state_dict[key]
    if hasattr(v, 'detach'):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def _strip_compile_prefix(sd):
    """torch.compile wraps modules as _orig_mod.* (the reference saves
    the UNcompiled module, but user code may not)."""
    return {k[len('_orig_mod.'):] if k.startswith('_orig_mod.') else k: v
        for k, v in sd.items()}


def convert_default(state_dict, prefix=''):
    """Reference `Default` state_dict -> flax param dict for
    models.Default (same hidden_size / action space assumed)."""
    sd = _strip_compile_prefix(dict(state_dict))
    enc_w = _t(sd, f'{prefix}encoder.weight')  # (H, obs_numel)
    enc_b = _t(sd, f'{prefix}encoder.bias')
    # decoder: single Linear (Discrete) or ModuleList (MultiDiscrete)
    if f'{prefix}decoder.weight' in sd:
        dec_ws = [_t(sd, f'{prefix}decoder.weight')]
        dec_bs = [_t(sd, f'{prefix}decoder.bias')]
    else:
        dec_ws, dec_bs = [], []
        i = 0
        while f'{prefix}decoder.{i}.weight' in sd:
            dec_ws.append(_t(sd, f'{prefix}decoder.{i}.weight'))
            dec_bs.append(_t(sd, f'{prefix}decoder.{i}.bias'))
            i += 1
        if not dec_ws:
            raise ValueError(
                f'no decoder weights under prefix {prefix!r}; keys: '
                f'{sorted(sd)[:10]}...')
    val_w = _t(sd, f'{prefix}value_head.weight')  # (1, H)
    val_b = _t(sd, f'{prefix}value_head.bias')
    head_kernel = np.concatenate(
        [w.T for w in dec_ws] + [val_w.T], axis=1)  # (H, sum(nvec)+1)
    head_bias = np.concatenate(dec_bs + [val_b])
    return {
        'encoder': {'kernel': enc_w.T, 'bias': enc_b},
        'head': {'kernel': head_kernel, 'bias': head_bias},
    }


def convert_lstm(state_dict):
    """Reference `LSTMWrapper(Default)` state_dict -> flax params for
    models.LSTMWrapper(policy=Default(...))."""
    sd = _strip_compile_prefix(dict(state_dict))
    params = {'policy': convert_default(sd, prefix='policy.')}
    layer = 0
    while f'recurrent.weight_ih_l{layer}' in sd:
        w_ih = _t(sd, f'recurrent.weight_ih_l{layer}')  # (4H, in)
        w_hh = _t(sd, f'recurrent.weight_hh_l{layer}')  # (4H, H)
        b = (_t(sd, f'recurrent.bias_ih_l{layer}')
            + _t(sd, f'recurrent.bias_hh_l{layer}'))
        params[f'w_ih_l{layer}'] = w_ih.T
        params[f'w_hh_l{layer}'] = w_hh.T
        params[f'b_l{layer}'] = b
        layer += 1
    if layer == 0:
        raise ValueError('no recurrent.* weights found: not an '
            'LSTMWrapper checkpoint (use convert_default)')
    return params


def convert(state_dict_or_module):
    """Auto-detect and convert a reference policy (module, cleanrl
    wrapper, or raw state_dict) -> {'params': ...} ready for
    models.Default / models.LSTMWrapper `.apply`."""
    sd = state_dict_or_module
    if hasattr(sd, 'state_dict'):
        sd = sd.state_dict()
    sd = _strip_compile_prefix(dict(sd))
    # the reference cleanrl.(Recurrent)Policy wraps the module as
    # `policy.` — unwrap one level if no top-level encoder/recurrent
    if not any(k.startswith(('encoder.', 'recurrent.')) for k in sd):
        inner = {k[len('policy.'):]: v for k, v in sd.items()
            if k.startswith('policy.')}
        if inner:
            sd = inner
    if any(k.startswith('recurrent.') for k in sd):
        return {'params': convert_lstm(sd)}
    return {'params': convert_default(sd)}


def load_pt(path):
    """Convert a reference `model_*.pt` file (saved module or
    state_dict). Loading a pickled module requires the reference
    `pufferlib` package importable (tools/ref_trainer.py shims)."""
    import torch
    obj = torch.load(path, map_location='cpu', weights_only=False)
    return convert(obj)


def export(params, nvec=None):
    """Reverse direction: flax params (models.Default or
    models.LSTMWrapper(Default)) -> reference-layout torch state_dict,
    so policies trained here load into the reference torch modules
    (`module.load_state_dict(export(params, nvec))`).

    nvec: per-head action counts for splitting the fused head back into
    the reference's decoder ModuleList; None/len==1 emits the single
    `decoder.weight` layout."""
    import torch
    p = params.get('params', params)
    recurrent = any(k.startswith('w_ih_l') for k in p)
    inner = p['policy'] if recurrent else p
    sd = {}
    pre = 'policy.' if recurrent else ''
    sd[f'{pre}encoder.weight'] = np.asarray(inner['encoder']['kernel']).T
    sd[f'{pre}encoder.bias'] = np.asarray(inner['encoder']['bias'])
    head_w = np.asarray(inner['head']['kernel'])  # (H, sum(nvec)+1)
    head_b = np.asarray(inner['head']['bias'])
    if nvec is None:
        nvec = [head_w.shape[1] - 1]
    if sum(nvec) + 1 != head_w.shape[1]:
        raise ValueError(f'nvec {nvec} does not tile the fused head '
            f'({head_w.shape[1]} = sum(nvec) + 1 expected)')
    off = 0
    for i, n in enumerate(nvec):
        key = f'{pre}decoder.' + (f'{i}.' if len(nvec) > 1 else '')
        sd[key + 'weight'] = head_w[:, off:off + n].T
        sd[key + 'bias'] = head_b[off:off + n]
        off += n
    sd[f'{pre}value_head.weight'] = head_w[:, -1:].T
    sd[f'{pre}value_head.bias'] = head_b[-1:]
    layer = 0
    while recurrent and f'w_ih_l{layer}' in p:
        sd[f'recurrent.weight_ih_l{layer}'] = np.asarray(
            p[f'w_ih_l{layer}']).T
        sd[f'recurrent.weight_hh_l{layer}'] = np.asarray(
            p[f'w_hh_l{layer}']).T
        # torch keeps two bias vectors; their sum is what the cell adds
        sd[f'recurrent.bias_ih_l{layer}'] = np.asarray(p[f'b_l{layer}'])
        sd[f'recurrent.bias_hh_l{layer}'] = np.zeros_like(
            np.asarray(p[f'b_l{layer}']))
        layer += 1
    return {k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in sd.items()}
