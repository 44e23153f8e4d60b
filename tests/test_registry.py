"""Zoo registry contract (analog of reference tests/test_registry.py):
every environments/ package imports, exposes env_creator() returning a
callable, and either constructs a working env (when its third-party lib
is available) or raises a clean ImportError naming the dependency.
"""
import importlib
import pkgutil

import pytest

import pufferlib_tpu.environments as zoo

PACKAGES = sorted(m.name for m in pkgutil.iter_modules(zoo.__path__))


def test_all_reference_packages_present():
    expected = {'atari', 'bsuite', 'butterfly', 'classic_control',
        'crafter', 'dm_control', 'dm_lab', 'griddly', 'links_awaken',
        'magent', 'microrts', 'minerl', 'minigrid', 'minihack',
        'nethack', 'nmmo', 'nmmo3', 'nocturne', 'open_spiel',
        'pokemon_red', 'procgen', 'slimevolley', 'smac', 'stable_retro',
        'test', 'vizdoom'}
    missing = expected - set(PACKAGES)
    assert not missing, f'zoo packages missing: {missing}'


@pytest.mark.parametrize('name', PACKAGES)
def test_package_contract(name):
    mod = importlib.import_module(f'pufferlib_tpu.environments.{name}')
    creator_fn = getattr(mod, 'env_creator', None)
    assert callable(creator_fn), f'{name} has no env_creator'
    creator = creator_fn()
    assert callable(creator), f'{name} env_creator() is not callable'
    try:
        env = creator()
    except ImportError as e:
        # gated on a third-party lib: the error must name something
        assert str(e), f'{name} raised an empty ImportError'
        return
    except NotImplementedError:
        return
    # lib available: env must expose the Puffer protocol
    assert hasattr(env, 'reset') and hasattr(env, 'step')
    if hasattr(env, 'close'):
        env.close()
