"""Layered YAML config + signature-introspected CLI.

Parity: reference demo.py:22-99 — config.yaml sections merge
default -> package -> env, then env/policy/rnn __init__ signatures
(get_init_args) auto-generate argparse flags like --train.learning_rate,
--env.num_targets, with bool negation. The result is a namespace tree.
"""
import argparse
import ast
import importlib
import os

from pufferlib_tpu.exceptions import APIUsageError
from pufferlib_tpu.namespace import Namespace, namespace
from pufferlib_tpu.utils import get_init_args

CONFIG_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'config.yaml')


def _deep_update(base, extra):
    for k, v in extra.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_update(base[k], v)
        else:
            base[k] = v
    return base


def load_yaml_config(env_name, path=None):
    import yaml
    with open(path or CONFIG_PATH) as f:
        raw = yaml.safe_load(f)

    if env_name not in raw:
        # fall back to default + package guess
        merged = dict(raw['default'])
        merged.setdefault('env', {})['name'] = env_name
        return merged

    section = raw[env_name]
    package = section.get('package', raw['default'].get('package'))
    merged = {}
    _deep_update(merged, raw['default'])
    if package in raw and package != env_name:
        _deep_update(merged, raw[package])
    _deep_update(merged, section)
    merged['package'] = package
    return merged


def resolve_env_module(package):
    """Import the env package: ocean is first-party; everything else
    lives under pufferlib_tpu.environments.<package> (host bridge)."""
    if package == 'ocean':
        return importlib.import_module('pufferlib_tpu.ocean')
    return importlib.import_module(f'pufferlib_tpu.environments.{package}')


def _parse_value(text):
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        return text


def _add_section_flags(parser, section, values):
    for key, default in values.items():
        flag = f'--{section}.{key}'
        if isinstance(default, bool):
            parser.add_argument(flag, type=_parse_value, default=default)
            parser.add_argument(f'--no-{section}.{key}',
                dest=f'{section}.{key}', action='store_false')
        else:
            parser.add_argument(flag, type=_parse_value, default=default)


def load_config(env_name=None, argv=None, config_path=None):
    """Build the merged config namespace from yaml + CLI flags."""
    base = argparse.ArgumentParser(add_help=False)
    base.add_argument('--env', '--environment', default=env_name
        or 'squared')
    base.add_argument('--mode', default='train', choices=(
        'train', 'eval', 'sweep', 'autotune', 'profile', 'baseline',
        'bench'))
    base.add_argument('--vec', default='device',
        choices=('device', 'serial', 'multiprocessing'))
    base.add_argument('--backend', default='native',
        choices=('native', 'sb3'))
    base.add_argument('--exp-id', '--exp-name', default=None)
    base.add_argument('--model-path', default=None)
    base.add_argument('--track', action='store_true')
    base.add_argument('--config', default=config_path)
    base.add_argument('--wandb-project', default='pufferlib-tpu')
    base.add_argument('--wandb-group', default='debug')
    args, remaining = base.parse_known_args(argv)

    cfg = load_yaml_config(args.env, args.config)
    package = cfg['package']
    env_module = resolve_env_module(package)

    # introspect creator defaults and merge under env section
    env_cfg = dict(cfg.get('env', {}))
    creator_name = env_cfg.pop('name', args.env)
    creator = env_module.env_creator(creator_name)
    init_args = get_init_args(creator)
    for k, v in init_args.items():
        env_cfg.setdefault(k, v)

    parser = argparse.ArgumentParser(parents=[base])
    _add_section_flags(parser, 'train', cfg.get('train', {}))
    _add_section_flags(parser, 'env', env_cfg)
    _add_section_flags(parser, 'policy', cfg.get('policy', {}))
    _add_section_flags(parser, 'rnn', cfg.get('rnn', {}))
    parser.add_argument('--use-rnn', type=_parse_value,
        default=cfg.get('use_rnn', False))
    parsed = vars(parser.parse_args(argv))

    out = namespace(
        env=args.env,
        env_name=creator_name,
        backend=parsed['backend'],
        sweep=cfg.get('sweep', {}),
        mode=parsed['mode'],
        vec=parsed['vec'],
        exp_id=parsed['exp_id'],
        model_path=parsed['model_path'],
        track=parsed['track'],
        use_rnn=parsed['use_rnn'],
        wandb_project=parsed['wandb_project'],
        wandb_group=parsed['wandb_group'],
        package=package,
        train=namespace(),
        env_kwargs=namespace(),
        policy=namespace(),
        rnn=namespace(),
    )
    for key, value in parsed.items():
        if '.' not in key:
            continue
        section, name = key.split('.', 1)
        target = {'train': out.train, 'env': out.env_kwargs,
            'policy': out.policy, 'rnn': out.rnn}[section]
        target[name] = value
    return out, env_module, creator


def make_policy(vecenv, env_module, args):
    """Build the policy for a vecenv (reference demo.py:101-110): use the
    env package's Policy/Recurrent if defined, else Default (+LSTM)."""
    from pufferlib_tpu.models import (
        Default, LSTMWrapper, Policy, RecurrentPolicy)

    obs_shape = vecenv.single_observation_space.shape
    atn_space = vecenv.single_action_space

    policy_kwargs = dict(args.policy)
    if isinstance(policy_kwargs.get('dtype'), str):
        import jax.numpy as jnp
        policy_kwargs['dtype'] = jnp.dtype(policy_kwargs['dtype']).type

    policy_cls = getattr(env_module, 'Policy', None)
    if policy_cls is not None:
        fields = getattr(policy_cls, '__dataclass_fields__', {})
        if 'emulated' in fields and 'emulated' not in policy_kwargs:
            policy_kwargs['emulated'] = getattr(vecenv, 'emulated', None)
        module = policy_cls(obs_shape=obs_shape, action_space=atn_space,
            **policy_kwargs)
    else:
        policy_kwargs.setdefault('emulated', getattr(
            vecenv, 'emulated', None))
        module = Default(obs_shape=obs_shape, action_space=atn_space,
            **policy_kwargs)

    if args.use_rnn:
        # seed LSTM kwargs from the env package's Recurrent dict
        # (reference demo.py:103-108 reads env_module.Recurrent), then
        # config.yaml rnn section / --rnn.x flags override
        rnn_kwargs = dict(getattr(env_module, 'Recurrent', None) or {})
        rnn_kwargs.update(dict(args.rnn))
        hidden = rnn_kwargs.pop('hidden_size',
            dict(args.policy).get('hidden_size', 128))
        rnn_kwargs.setdefault('input_size', hidden)
        module = LSTMWrapper(policy=module, obs_shape=obs_shape,
            hidden_size=hidden, **rnn_kwargs)
        return RecurrentPolicy(module)
    return Policy(module)
