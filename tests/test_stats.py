"""Stats subsystem tests (reference: stats.rs:212-356)."""

from pathlib import Path

import numpy as np
import pytest

from emosaic_tpu.stats import MosaicConfig, RenderStats
from emosaic_tpu.tiles.tile import Tile
from emosaic_tpu.tiles.tileset import TileSet


def make_tileset(n=3):
    return TileSet(
        palettes=np.zeros((n, 1, 3), dtype=np.uint8),
        paths=[Path(f"t{i}.jpg") for i in range(n)],
    )


def test_push_and_count():
    s = RenderStats()
    t = Tile(idx=1, colors=np.zeros((1, 3), np.uint8))
    s.push_tile(10, 20, t, 100)
    s.push_tile(30, 40, t, 200)
    assert s.tile_count() == 2
    s.push_tile(10, 20, t, 5)  # same position overwrites
    assert s.tile_count() == 2


def test_summarise_empty_and_filled(capsys):
    s = RenderStats()
    ts = make_tileset()
    lines = []
    s.summarise(ts, log=lines.append)
    assert lines == ["No tiles recorded in statistics"]
    s.push_tile(0, 0, ts.get_tile(1), 10)
    s.push_tile(16, 0, ts.get_tile(2), 20)
    s.push_tile(32, 0, ts.get_tile(1), 15)
    lines = []
    s.summarise(ts, log=lines.append)
    text = "\n".join(lines)
    assert "Total tiles placed: 3" in text
    assert "Unique images used: 2" in text
    assert "15.000" in text  # average
    assert "t0.jpg (2 times)" in text


def test_render_heatmap():
    s = RenderStats()
    ts = make_tileset()
    s.push_tile(0, 0, ts.get_tile(1), 50)
    s.push_tile(16, 16, ts.get_tile(2), 150)
    img = s.render(16)
    assert img.shape == (2, 2, 3)
    assert img[0, 0, 0] < img[1, 1, 0]  # darker = better match (stats.rs:305-311)


def test_render_empty_raises():
    with pytest.raises(ValueError, match="no tiles recorded"):
        RenderStats().render(16)


def test_render_zero_tile_size_raises():
    s = RenderStats()
    s.push_tile(0, 0, Tile(idx=1), 100)
    with pytest.raises(ValueError, match="greater than 0"):
        s.render(0)


def test_stats_json_cli(tmp_path, rng, monkeypatch):
    """--stats-json writes the machine-readable summary matching the
    stderr aggregates."""
    import json

    import numpy as np
    from PIL import Image

    from emosaic_tpu.cli import main

    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    monkeypatch.chdir(tmp_path)
    tiles = tmp_path / "tiles"
    tiles.mkdir()
    for i in range(6):
        arr = rng.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tiles / f"t{i}.jpg", quality=95)
    src = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    Image.fromarray(src).save(tmp_path / "s.png")
    sj = tmp_path / "stats.json"
    rc = main(
        ["-s", "8", "-o", str(tmp_path / "o.png"), str(tmp_path / "s.png"),
         "mosaic", str(tiles), "-m", "1", "--stats-json", str(sj)]
    )
    assert rc == 0
    data = json.loads(sj.read_text())
    assert data["total_tiles"] == 6 * 8
    assert 1 <= data["unique_images"] <= 6
    assert data["average_distance"] >= 0
    assert len(data["top_used"]) <= 10 and data["top_used"][0]["count"] >= 1
    assert len(data["worst_matches"]) <= 10
    assert data["worst_matches"][0]["distance"] == data["max_distance"]
    assert data["config"]["tile_size"] == 8


def test_push_after_from_grid_materializes_arrays():
    """push_tile on a bulk-built (from_grid) stats object must first
    materialize the lazy arrays into lists, preserving every placement
    and its date."""
    ts = TileSet(
        palettes=np.zeros((3, 1, 3), dtype=np.uint8),
        paths=[Path(f"t{i}.jpg") for i in range(3)],
        dates=["2020:01:01", None, "2021:05:05"],
    )
    items = np.array([[1, -3], [2, 0]])  # one flipped, one unassigned
    dists = np.array([[10, 20], [30, 0]])
    s = RenderStats.from_grid(items, dists, 16, 16, ts)
    assert s.tile_count() == 3  # item 0 skipped
    s.push_tile(64, 64, ts.get_tile(2), 99)
    assert s.tile_count() == 4
    entries = s.tiles
    assert entries[(0, 0)].idx == 1 and entries[(0, 0)].distance == 10
    assert entries[(16, 0)].idx == 3 and entries[(16, 0)].flipped  # -3
    assert entries[(16, 0)].date_taken == "2021:05:05"
    assert entries[(64, 64)].distance == 99
    # pushing at an existing key still overwrites after materialization
    s.push_tile(0, 0, ts.get_tile(3), 7)
    assert s.tile_count() == 4 and s.tiles[(0, 0)].distance == 7


def test_render_heatmap_all_zero_distances():
    """max distance 0 (perfect matches everywhere) renders an all-black
    heatmap instead of dividing by zero."""
    ts = make_tileset()
    s = RenderStats()
    s.push_tile(0, 0, ts.get_tile(1), 0)
    s.push_tile(16, 16, ts.get_tile(2), 0)
    img = s.render(16)
    assert img.shape == (2, 2, 3) and (img == 0).all()
