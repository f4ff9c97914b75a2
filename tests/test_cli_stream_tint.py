"""Streamed tint path: pixel parity with the in-memory tint path."""

import numpy as np
import pytest
from PIL import Image

from emosaic_tpu.cli import main


@pytest.fixture(autouse=True)
def _isolated(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    monkeypatch.chdir(tmp_path)


def test_streamed_tint_matches_unstreamed(tmp_path, rng):
    tiles = tmp_path / "tiles"
    tiles.mkdir()
    for i in range(5):
        arr = rng.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tiles / f"t{i}.jpg", quality=95)
    src = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    Image.fromarray(src).save(tmp_path / "s.png")

    common = [
        "-s", "8", str(tmp_path / "s.png"), "mosaic", str(tiles),
        "-m", "1", "-t", "0.5",
    ]
    main(["-o", str(tmp_path / "a.png")] + common)
    main(["-o", str(tmp_path / "b.png")] + common + ["--stream-threshold", "0"])
    a = np.asarray(Image.open(tmp_path / "a.png").convert("RGB"))
    b = np.asarray(Image.open(tmp_path / "b.png").convert("RGB"))
    assert a.shape == b.shape == (48, 48, 3)
    assert (a == b).all()
    # tint path skips stats/html in both
    assert not (tmp_path / "a.stats.png").exists()
    assert not (tmp_path / "b.stats.png").exists()


def test_streamed_random_mode(tmp_path, rng):
    tiles = tmp_path / "tiles"
    tiles.mkdir()
    for i in range(4):
        arr = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tiles / f"t{i}.jpg", quality=95)
    src = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    Image.fromarray(src).save(tmp_path / "s.png")
    rc = main(
        ["-s", "4", "-o", str(tmp_path / "r.png"), str(tmp_path / "s.png"),
         "mosaic", str(tiles), "-m", "random", "--seed", "2",
         "--stream-threshold", "0"]
    )
    assert rc == 0
    assert Image.open(tmp_path / "r.png").size == (16, 20)
