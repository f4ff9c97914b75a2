"""Tile data layer: Tile/TileSet containers, analysis cache, library builder."""

from emosaic_tpu.tiles.tile import Tile  # noqa: F401
from emosaic_tpu.tiles.tileset import TileSet  # noqa: F401
from emosaic_tpu.tiles.cache import (  # noqa: F401
    analysis_cache_path,
    load_tileset_cache,
    save_tileset_cache,
)
from emosaic_tpu.tiles.builder import generate_tile_set, load_or_generate_tile_set  # noqa: F401
