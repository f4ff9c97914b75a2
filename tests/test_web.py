"""Web output tests: widget + main page + stats HTML
(reference: stats.rs:313-355 widget smoke test, widget.rs feature surface)."""

from pathlib import Path

import numpy as np
import pytest

from emosaic_tpu.stats import MosaicConfig, RenderStats
from emosaic_tpu.tiles.tileset import TileSet
from emosaic_tpu.web import (
    generate_html_with_options,
    generate_mosaic_widget_with_options,
)
from emosaic_tpu.web.widget import extract_year_range


def make_fixture(tmp_path):
    ts = TileSet(
        palettes=np.zeros((3, 1, 3), dtype=np.uint8),
        paths=[tmp_path / f"tiles/t{i}.jpg" for i in range(3)],
        dates=["2015:03:01", None, "2020:12:25"],
    )
    stats = RenderStats()
    stats.push_tile(0, 0, ts.get_tile(1), 10)
    stats.push_tile(16, 0, ts.get_tile(-2), 50)
    stats.push_tile(0, 16, ts.get_tile(3), 90)
    config = MosaicConfig(
        tile_size=16,
        mode="1x1 (N=1)",
        no_repeat=False,
        greedy=False,
        crop=True,
        tint_opacity=0.0,
        downsample=1,
        randomize=None,
        tiles_dir=str(tmp_path / "tiles"),
        title="Test Mosaic",
    )
    return ts, stats, config


def test_widget_generation(tmp_path):
    ts, stats, config = make_fixture(tmp_path)
    out = tmp_path / "m_widget.html"
    generate_mosaic_widget_with_options(
        stats, tmp_path / "m.png", out, ts, config, web_compatible=False
    )
    html = out.read_text()
    assert html.count('class="tile-region"') == 3
    assert html.count("distance-overlay-tile") >= 3
    assert 'data-year="2015"' in html and 'data-year="2020"' in html
    assert 'data-year="unknown"' in html
    assert "Distance:" in html  # local mode shows distances
    assert "file://" in html
    assert "year-slider" in html and "mobile-modal" in html
    assert (tmp_path / "mosaic-widget.js").exists()
    assert (tmp_path / "mosaic-widget.css").exists()
    # flag hash: sha256-prefix(16), appears in button ids
    assert "flag-btn-" in html


def test_widget_web_mode_urls(tmp_path):
    ts, stats, config = make_fixture(tmp_path)
    out = tmp_path / "m_widget.html"
    generate_mosaic_widget_with_options(
        stats, tmp_path / "m.png", out, ts, config, web_compatible=True
    )
    html = out.read_text()
    assert "tiles/t0.jpg" in html  # relative URLs under tiles/
    assert "file://" not in html
    assert "Distance:" not in html  # hidden in web mode (widget.rs:335-341)


def test_main_page_generation(tmp_path):
    ts, stats, config = make_fixture(tmp_path)
    out = tmp_path / "m.html"
    generate_html_with_options(stats, tmp_path / "m.png", out, ts, config)
    html = out.read_text()
    assert (tmp_path / "m_widget.html").exists()
    assert 'src="m_widget.html"' in html
    assert "toggleDistanceOverlay" in html
    assert "Total tiles placed:" in html and "Worst Matches" in html
    assert "Test Mosaic" not in html  # main page titles by image name
    assert "distance-legend" in html


def test_empty_stats_raises(tmp_path):
    ts, _, config = make_fixture(tmp_path)
    with pytest.raises(ValueError):
        generate_html_with_options(
            RenderStats(), tmp_path / "m.png", tmp_path / "m.html", ts, config
        )


def test_year_range():
    stats = RenderStats()
    assert extract_year_range(stats) == (2000, 2030)  # defaults (widget.rs:59-60)


def test_widget_escapes_hostile_paths(tmp_path):
    """Paths with quotes/angle brackets must not inject raw HTML."""
    ts = TileSet(
        palettes=np.zeros((1, 1, 3), dtype=np.uint8),
        paths=[tmp_path / 'evil"<script>alert(1)</script>.jpg'],
        dates=[None],
    )
    stats = RenderStats()
    stats.push_tile(0, 0, ts.get_tile(1), 5)
    config = MosaicConfig(
        tile_size=16, mode="1x1 (N=1)", no_repeat=False, greedy=False,
        crop=False, tint_opacity=0.0, downsample=1, randomize=None,
        tiles_dir=str(tmp_path), title='T<script>"',
    )
    out = tmp_path / "w.html"
    generate_mosaic_widget_with_options(
        stats, tmp_path / "m.png", out, ts, config, web_compatible=False
    )
    html = out.read_text()
    assert "<script>alert(1)</script>" not in html
    assert "&lt;script&gt;" in html or "alert(1)" not in html


def test_widget_empty_stats_raises(tmp_path):
    ts, _, config = make_fixture(tmp_path)
    with pytest.raises(ValueError, match="No tiles recorded"):
        generate_mosaic_widget_with_options(
            RenderStats(), tmp_path / "m.png", tmp_path / "w.html", ts,
            config, web_compatible=False,
        )


def test_widget_garbage_year_and_foreign_tile_path(tmp_path):
    """A non-numeric EXIF year is skipped by the year-range scan
    (widget.rs:46-60 parse failures), and a tile path outside the tiles
    dir falls back to its bare file name in the URL."""
    ts = TileSet(
        palettes=np.zeros((2, 1, 3), dtype=np.uint8),
        paths=[tmp_path / "tiles/t0.jpg", Path("/elsewhere/odd.jpg")],
        dates=["notayear:01:01", "2018:06:06"],
    )
    stats = RenderStats()
    stats.push_tile(0, 0, ts.get_tile(1), 10)
    stats.push_tile(16, 0, ts.get_tile(2), 20)
    assert extract_year_range(stats) == (2018, 2018)
    _, _, config = make_fixture(tmp_path)
    out = tmp_path / "w.html"
    generate_mosaic_widget_with_options(
        stats, tmp_path / "m.png", out, ts, config, web_compatible=True
    )
    html = out.read_text()
    # the image URL falls back to the bare name; the original path
    # survives only as the data-tile-path metadata attribute
    assert 'data-src="tiles/odd.jpg"' in html
    assert 'data-tile-path="/elsewhere/odd.jpg"' in html
    assert 'src="tiles//elsewhere' not in html
    assert 'data-year="unknown"' in html  # unparseable year -> unknown
