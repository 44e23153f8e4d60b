"""OpenSpiel binding (reference pufferlib/environments/open_spiel:
single-player mode plays vs a pool of graded MCTS bots)."""
import functools


def env_creator(name='connect_four'):
    return functools.partial(make, name)


def make(name='connect_four', multiplayer=False, n_rollouts=5,
        min_simulations=10, max_simulations=50, render_mode=None):
    try:
        import pyspiel  # noqa: F401
    except ImportError as e:
        raise ImportError('open_spiel is not installed in this image') from e
    from pufferlib_tpu.environments.open_spiel.adapters import (
        OpenSpielPettingZooEnv, OpenSpielSingleAgentEnv)
    from pufferlib_tpu.host_env import (
        GymnasiumPufferEnv, PettingZooPufferEnv)
    from pufferlib_tpu.postprocess import EpisodeStats

    if multiplayer:
        return PettingZooPufferEnv(env=OpenSpielPettingZooEnv(name))
    env = OpenSpielSingleAgentEnv(name, n_rollouts=n_rollouts,
        min_simulations=min_simulations, max_simulations=max_simulations)
    return GymnasiumPufferEnv(env=EpisodeStats(env))
