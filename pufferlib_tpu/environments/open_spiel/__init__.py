"""OpenSpiel binding (reference pufferlib/environments/open_spiel:
single-player mode plays vs a pool of graded MCTS bots)."""
import functools


def env_creator(name='connect_four'):
    return functools.partial(make, name)


def make(name='connect_four', multiplayer=False, render_mode=None):
    try:
        import pyspiel  # noqa: F401
    except ImportError as e:
        raise ImportError('open_spiel is not installed in this image') from e
    raise NotImplementedError(
        'open_spiel adapters (MCTS bot pool / pettingzoo) pending; see '
        'reference open_spiel/gymnasium_environment.py')
