"""Media (image) logging: `*_map` infos -> wandb.Image.

Parity: reference clean_pufferl.py:125-146 — during evaluate, the
pokemon exploration map is max-accumulated across envs and rendered as
a Kanto overlay (pokemon_red_eval.py:9-38); any other info key
containing '_map' is logged as a wandb Image of the first env's value.
The sink works with any object exposing `.Image` (the real wandb
module or a test fake).
"""
import numpy as np


def hsv_to_rgb(hsv):
    """Vectorized HSV->RGB on (..., 3) float arrays in [0, 1] (so the
    renderer does not require matplotlib)."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = np.floor(h * 6.0).astype(np.int32) % 6
    f = h * 6.0 - np.floor(h * 6.0)
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    choices = np.stack([
        np.stack([v, t, p], -1), np.stack([q, v, p], -1),
        np.stack([p, v, t], -1), np.stack([p, q, v], -1),
        np.stack([t, p, v], -1), np.stack([v, p, q], -1)], 0)
    return np.take_along_axis(
        choices, i[None, ..., None].repeat(3, -1), axis=0)[0]


def make_pokemon_red_overlay(bg, counts):
    """Heat overlay of visit counts on the Kanto map background
    (reference pokemon_red_eval.py:14-38): count -> hue, upscale 16x,
    blend 80/20 onto the background where visited."""
    counts = np.asarray(counts)
    nonzero = np.where(counts > 0, 1, 0)
    scaled = np.clip(counts, 0, 1000) / 1000.0

    hsv = np.zeros((*counts.shape, 3))
    hsv[..., 0] = 2 * (1 - scaled) / 3
    hsv[..., 1] = nonzero
    hsv[..., 2] = nonzero
    overlay = (255 * hsv_to_rgb(hsv))

    kernel = np.ones((16, 16, 1), dtype=np.uint8)
    overlay = np.kron(overlay, kernel).astype(np.uint8)
    mask = np.kron(nonzero, kernel[..., 0]).astype(bool)
    mask = np.stack([mask, mask, mask], axis=-1)

    render = np.asarray(bg).copy().astype(np.int32)
    render[mask] = 0.2 * render[mask] + 0.8 * overlay[mask]
    return np.clip(render, 0, 255).astype(np.uint8)


def map_updater(bg_path='kanto_map_dsv.png'):
    """Returns counts -> rendered overlay. Loads the background with
    cv2/PIL when available; falls back to a black background of the
    right (upscaled) size so the pipeline runs anywhere."""
    bg = None
    try:
        import cv2
        bg = cv2.imread(bg_path)
    except ImportError:
        try:
            from PIL import Image
            bg = np.asarray(Image.open(bg_path))
        except (ImportError, FileNotFoundError, OSError):
            bg = None

    def update(counts):
        counts = np.asarray(counts)
        background = bg
        if background is None:
            background = np.zeros(
                (counts.shape[0] * 16, counts.shape[1] * 16, 3), np.uint8)
        return make_pokemon_red_overlay(background, counts)

    return update


def collect_media_stats(infos, stats, wandb, data):
    """Route media infos into `stats` (reference clean_pufferl.py:125-146).

    infos: dict of key -> list of per-env values (host trainer) or
    key -> array (device trainer). Mutates `stats`; returns the set of
    keys consumed (so numeric aggregation skips them). `data` carries
    the persistent accumulator (`pokemon_map`, `map_updater`).
    """
    consumed = set()
    if wandb is None:
        return consumed

    pmaps = infos.get('pokemon_exploration_map')
    if pmaps is not None:
        if not isinstance(pmaps, (list, tuple)):
            pmaps = [pmaps]
        for pmap in pmaps:
            if getattr(data, 'pokemon_map', None) is None:
                data.map_updater = map_updater()
                data.pokemon_map = np.asarray(pmap)
            data.pokemon_map = np.maximum(data.pokemon_map, pmap)
        if len(pmaps) > 0:
            rendered = data.map_updater(data.pokemon_map)
            stats['Media/exploration_map'] = wandb.Image(rendered)
        consumed.add('pokemon_exploration_map')

    for k, v in infos.items():
        if '_map' in k and k not in consumed:
            first = v[0] if isinstance(v, (list, tuple)) else v
            stats[f'Media/{k}'] = wandb.Image(np.asarray(first))
            consumed.add(k)
    return consumed
