"""Config surface parity: every top-level section name in the
REFERENCE config.yaml (97 sections: env names, spelling aliases, tuned
variants) must resolve in this repo's config.yaml, and every repo
section must name a zoo package that actually exists (reference
config.yaml + demo.py:56-61 layering)."""
import os

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_CONFIG = '/root/reference/config.yaml'


@pytest.fixture(scope='module')
def repo_cfg():
    with open(os.path.join(REPO, 'config.yaml')) as f:
        return yaml.safe_load(f)


def test_every_reference_section_resolves(repo_cfg):
    if not os.path.exists(REFERENCE_CONFIG):
        pytest.skip('reference tree not present')
    with open(REFERENCE_CONFIG) as f:
        ref_cfg = yaml.safe_load(f)
    missing = sorted(set(ref_cfg) - set(repo_cfg))
    assert not missing, f'reference config sections unresolved: {missing}'


def test_every_section_names_a_real_package(repo_cfg):
    packages = set(os.listdir(
        os.path.join(REPO, 'pufferlib_tpu', 'environments')))
    packages.discard('__init__.py')
    packages |= {'ocean'}  # first-party, lives at pufferlib_tpu/ocean
    for name, section in repo_cfg.items():
        if name == 'default' or section is None:
            continue
        pkg = section.get('package')
        if pkg is None:
            continue
        assert pkg in packages, (
            f'section {name!r} points at unknown package {pkg!r}')


@pytest.mark.parametrize('alias,package', [
    ('beam-rider', 'atari'),
    ('breakout-max-sync', 'atari'),
    ('dmc', 'dm_control'),
    ('connect4', 'open_spiel'),
    ('zelda', 'links_awaken'),
    ('pokegym', 'pokemon_red'),
    ('starcraft', 'smac'),
    ('nmmo3laptop', 'nmmo3'),
    ('starpilot-exp', 'procgen'),
    ('box2d', 'classic_control'),
])
def test_alias_sections_load_through_cli(alias, package):
    """load_config must merge the alias section over the package
    defaults and resolve the env module (pure config path; gated
    packages bind lazily so no third-party deps are needed)."""
    from pufferlib_tpu.config.cli import load_config
    args, env_module, creator = load_config(argv=['--env', alias])
    assert env_module.__name__.endswith(f'environments.{package}')
    assert creator is not None
