"""Media logging: *_map infos -> wandb.Image (reference
clean_pufferl.py:125-146, pokemon_red_eval.py:9-38). wandb is not in
this image, so a fake with the same .Image surface drives the sink."""
import numpy as np

from pufferlib_tpu.namespace import namespace
from pufferlib_tpu.training import media


class FakeImage:
    def __init__(self, data):
        self.data = np.asarray(data)


class FakeWandb:
    Image = FakeImage


def test_generic_map_key_becomes_image():
    infos = {'heat_map': [np.ones((4, 4)), np.zeros((4, 4))],
        'score': [1.0, 0.5]}
    stats = {}
    data = namespace()
    consumed = media.collect_media_stats(infos, stats, FakeWandb(), data)
    assert consumed == {'heat_map'}
    img = stats['Media/heat_map']
    assert isinstance(img, FakeImage)
    # first env's value, matching reference clean_pufferl.py:145
    assert np.array_equal(img.data, np.ones((4, 4)))


def test_no_wandb_is_a_noop():
    stats = {}
    consumed = media.collect_media_stats(
        {'heat_map': [np.ones((2, 2))]}, stats, None, namespace())
    assert consumed == set() and stats == {}


def test_pokemon_exploration_map_max_accumulates():
    data = namespace()
    wandb = FakeWandb()
    m1 = np.zeros((4, 5));  m1[0, 0] = 3
    m2 = np.zeros((4, 5));  m2[1, 1] = 7
    stats = {}
    media.collect_media_stats(
        {'pokemon_exploration_map': [m1]}, stats, wandb, data)
    assert np.array_equal(data.pokemon_map, m1)
    stats = {}
    media.collect_media_stats(
        {'pokemon_exploration_map': [m2]}, stats, wandb, data)
    # running max across envs and evaluate calls
    assert data.pokemon_map[0, 0] == 3 and data.pokemon_map[1, 1] == 7
    img = stats['Media/exploration_map']
    assert isinstance(img, FakeImage)
    # overlay upscales 16x to RGB
    assert img.data.shape == (4 * 16, 5 * 16, 3)


def test_overlay_renderer_semantics():
    """Visited cells blend onto the background; unvisited stay put
    (reference pokemon_red_eval.py:14-38)."""
    counts = np.zeros((2, 2))
    counts[0, 0] = 1000  # hot -> hue 0 (red)
    counts[1, 1] = 1     # cold -> hue 2/3 (blue)
    bg = np.full((32, 32, 3), 100, np.uint8)
    out = media.make_pokemon_red_overlay(bg, counts)
    assert out.shape == (32, 32, 3)
    # unvisited cell untouched
    assert np.all(out[0:16, 16:32] == 100)
    # hot cell: red-dominant blend (0.2*100 + 0.8*255, 0.2*100, 0.2*100)
    assert out[0, 0, 0] > 200 and out[0, 0, 1] < 30 < out[0, 0, 0]
    # cold cell: blue-dominant blend
    assert out[16, 16, 2] > 200 and out[16, 16, 0] < 30


def test_heat_ramp_matches_matplotlib_hue_wheel():
    """_heat_rgb's direct triangular formula must equal the generic
    HSV conversion at s=v=1 with hue = 2*(1-heat)/3 (what the
    reference computes via matplotlib, pokemon_red_eval.py:19-26)."""
    import matplotlib.colors as mcolors
    heat = np.linspace(0.0, 1.0, 101)
    hsv = np.stack([2 * (1 - heat) / 3, np.ones_like(heat),
        np.ones_like(heat)], axis=-1)
    assert np.allclose(media._heat_rgb(heat), mcolors.hsv_to_rgb(hsv),
        atol=1e-12)


def test_host_trainer_sink_routes_media(monkeypatch):
    """ppo_host.evaluate's stat sink: media keys become Images, numeric
    keys still average, and verbose printing skips Image values."""
    from pufferlib_tpu.training import ppo_host
    stats = {}
    data = namespace(wandb=FakeWandb())
    infos = {'explore_map': [np.ones((3, 3))], 'score': [1.0, 0.0]}
    media_keys = media.collect_media_stats(
        infos, stats, data.wandb, data)
    for k, v in infos.items():
        if k not in media_keys:
            stats[k] = float(np.mean(v))
    assert isinstance(stats['Media/explore_map'], FakeImage)
    assert stats['score'] == 0.5
    # format guard used by the trainers' verbose paths
    line = ' '.join(f'{k}={v:.3f}' for k, v in stats.items()
        if isinstance(v, float))
    assert 'score=0.500' in line and 'Media' not in line
