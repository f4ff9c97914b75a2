"""Random-mode renderer (reference: rendering.rs:418-440 `render_random`).

Each source pixel becomes a uniformly-random tile; no analysis, no stats.
Randomness uses an explicit seed (the reference's thread_rng is
irreproducible — SURVEY.md 'randomness parity').
"""

from __future__ import annotations

import numpy as np

from emosaic_tpu.ops.composite import compose_mosaic
from emosaic_tpu.tiles.tileset import TileSet


def render_random(
    source_img: np.ndarray,
    tile_set: TileSet,
    tile_size: int,
    *,
    seed: int = 0,
    stack: np.ndarray | None = None,
) -> np.ndarray:
    if len(tile_set) == 0:
        raise ValueError("empty tile set")
    h, w = source_img.shape[0], source_img.shape[1]
    rng = np.random.default_rng(seed)
    items = rng.integers(1, len(tile_set) + 1, size=(h, w), dtype=np.int32)
    if stack is None:
        stack = tile_set.image_stack(tile_size)
    return np.asarray(compose_mosaic(items, stack))
