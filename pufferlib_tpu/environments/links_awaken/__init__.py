"""Link's Awakening binding (reference pufferlib/environments/links_awaken;
the reference binding targets a pre-1.0 API and is stale)."""
import functools


def env_creator(name='pokemon_red'):
    return functools.partial(make, name)


def make(name='links_awaken', headless=True, render_mode=None):
    try:
        import pufferlib_links_awaken  # noqa: F401
    except ImportError as e:
        raise ImportError('links_awaken env package not installed') from e
    raise NotImplementedError('links_awaken adapter pending')
