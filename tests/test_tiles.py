"""Tile prep / tileset / cache tests (reference: utils.rs:279-331,
tileset tests in mod.rs:26-46, cache semantics main.rs:597-661)."""

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from emosaic_tpu.errors import ImageError
from emosaic_tpu.io.discovery import find_images
from emosaic_tpu.io.prep import (
    most_common_value,
    prepare_tile,
    trim_bounds,
)
from emosaic_tpu.tiles.builder import generate_tile_set, load_or_generate_tile_set
from emosaic_tpu.tiles.cache import (
    analysis_cache_path,
    load_tileset_cache,
    save_tileset_cache,
)
from emosaic_tpu.tiles.tileset import TileSet


@pytest.fixture(autouse=True)
def _isolated_cache(tmp_path, monkeypatch):
    # keep the content-hash cache out of the real ~/.cache (the reference's
    # test suite pollutes it — utils.rs:291-299; we don't)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))


def save_img(path: Path, arr: np.ndarray, fmt="PNG", exif=None):
    im = Image.fromarray(arr)
    kwargs = {"format": fmt}
    if exif is not None:
        kwargs["exif"] = exif
    path.parent.mkdir(parents=True, exist_ok=True)
    im.save(path, **kwargs)


def test_most_common_value():
    # utils.rs:284-288
    assert most_common_value([1, 2, 2, 3, 3, 3, 4]) == 3
    assert most_common_value([]) == 0


def test_trim_bounds_white_border(rng):
    img = np.full((20, 24, 3), 255, dtype=np.uint8)
    img[4:16, 6:18] = rng.integers(0, 200, size=(12, 12, 3), dtype=np.uint8)
    left, top, w, h = trim_bounds(img)
    assert (left, top) == (6, 4)
    # last non-white col/row is excluded from the span (quirk preserved,
    # utils.rs:166-175: w = last - first with last = index of last non-white)
    assert (w, h) == (17 - 6, 15 - 4)


def test_trim_bounds_all_white_raises():
    img = np.full((8, 8, 3), 255, dtype=np.uint8)
    with pytest.raises(ValueError):
        trim_bounds(img)


def test_prepare_tile_dims_and_cache(tmp_path, rng):
    # utils.rs:291-299 test_prepare_tile
    arr = rng.integers(0, 200, size=(64, 48, 3), dtype=np.uint8)
    p = tmp_path / "img.png"
    save_img(p, arr)
    out = prepare_tile(p, 32, crop=True)
    assert out.shape == (32, 32, 3)
    # second call hits the md5 cache (content written as jpg)
    out2 = prepare_tile(p, 32, crop=True)
    assert (out2 == out).all() or out2.shape == out.shape  # jpg roundtrip


def test_prepare_tile_rejects_undersized(tmp_path, rng):
    arr = rng.integers(0, 200, size=(8, 8, 3), dtype=np.uint8)
    p = tmp_path / "small.png"
    save_img(p, arr)
    with pytest.raises(ImageError):
        prepare_tile(p, 16, crop=False)


def _smooth(h, w):
    """Smooth non-white gradient content (JPEG-friendly, trim-stable)."""
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 200) // max(w, 1), (y * 200) // max(h, 1), ((x + y) * 100) // (h + w)],
        axis=-1,
    ).astype(np.uint8)


def test_fast_prep_jpeg_close_to_exact(tmp_path, monkeypatch, rng):
    """--fast-prep decodes JPEG at a reduced DCT scale: output stays within
    a few LSB of the exact path and the two modes cache separately."""
    from emosaic_tpu.io.prep import cache_dir

    p = tmp_path / "big.jpg"
    save_img(p, _smooth(768, 1024), fmt="JPEG")
    exact = prepare_tile(p, 32, crop=True)
    monkeypatch.setenv("EMOSAIC_FAST_PREP", "1")
    fast = prepare_tile(p, 32, crop=True)
    assert fast.shape == exact.shape == (32, 32, 3)
    diff = np.abs(fast.astype(np.int16) - exact.astype(np.int16))
    assert diff.mean() < 3 and diff.max() < 32  # DCT-scaled, not divergent
    fast_files = list(cache_dir().glob("*_fast.32.jpg"))
    exact_files = [f for f in cache_dir().glob("*.32.jpg") if "_fast" not in f.name]
    assert len(fast_files) == 1 and len(exact_files) == 1


def test_fast_prep_non_jpeg_identical(tmp_path, monkeypatch, rng):
    """draft is a JPEG-decoder feature: PNG inputs take the identical
    pipeline under --fast-prep."""
    p = tmp_path / "img.png"
    save_img(p, _smooth(300, 400))
    exact = prepare_tile(p, 32, crop=True)
    monkeypatch.setenv("EMOSAIC_FAST_PREP", "1")
    fast = prepare_tile(p, 32, crop=True)
    assert (fast == exact).all()


def test_fast_prep_small_jpeg_identical(tmp_path, monkeypatch):
    """Images under the draft target decode at full scale — bit-identical
    to the exact path."""
    p = tmp_path / "small.jpg"
    save_img(p, _smooth(80, 100), fmt="JPEG")
    exact = prepare_tile(p, 16, crop=True)
    monkeypatch.setenv("EMOSAIC_FAST_PREP", "1")
    fast = prepare_tile(p, 16, crop=True)
    assert (fast == exact).all()


def test_fast_prep_supersampling_floor_redoes_exact(tmp_path, monkeypatch):
    """A heavily white-trimmed image whose scaled crop falls under the
    2*tile_size floor is redone at full resolution — bit-identical to the
    exact path (quality never degrades below it)."""
    arr = np.full((1024, 1024, 3), 255, dtype=np.uint8)
    arr[472:552, 472:552] = _smooth(80, 80)  # 80x80 content in white field
    p = tmp_path / "bordered.jpg"
    save_img(p, arr, fmt="JPEG")
    exact = prepare_tile(p, 32, crop=True)
    monkeypatch.setenv("EMOSAIC_FAST_PREP", "1")
    fast = prepare_tile(p, 32, crop=True)
    assert (fast == exact).all()


def test_fast_prep_cache_paths_tagged(tmp_path, monkeypatch):
    from emosaic_tpu.tiles.cache import stack_cache_path

    assert analysis_cache_path(tmp_path, 4, True).name == ".emosaic_4to1_cropped"
    assert stack_cache_path(tmp_path, 16).name == ".emosaic_stack_16"
    monkeypatch.setenv("EMOSAIC_FAST_PREP", "1")
    assert (
        analysis_cache_path(tmp_path, 4, True).name == ".emosaic_4to1_cropped_fast"
    )
    assert stack_cache_path(tmp_path, 16).name == ".emosaic_stack_16_fast"


def test_find_images_case_sensitive(tmp_path):
    (tmp_path / "sub").mkdir()
    for name in ["a.jpg", "b.JPG", "sub/c.jpeg", "d.png", "e.txt"]:
        f = tmp_path / name
        f.parent.mkdir(exist_ok=True)
        f.write_bytes(b"x")
    found = find_images(tmp_path, {"jpg", "jpeg"})
    names = sorted(p.name for p in found)
    assert names == ["a.jpg", "c.jpeg"]  # b.JPG excluded: case-sensitive


def test_generate_tile_set_and_cache(tmp_path, rng):
    tiles_dir = tmp_path / "tiles"
    for i in range(5):
        arr = rng.integers(0, 200, size=(40, 40, 3), dtype=np.uint8)
        save_img(tiles_dir / f"t{i}.jpg", arr, fmt="JPEG")
    save_img(tiles_dir / "ignored.png", np.zeros((40, 40, 3), np.uint8))

    ts, errors = generate_tile_set(
        tiles_dir, 16, {"jpg"}, crop=False, dim=2, log=lambda *a: None
    )
    assert len(ts) == 5
    assert not errors
    assert ts.palettes.shape == (5, 4, 3)

    cpath = analysis_cache_path(tiles_dir, 4, False)
    save_tileset_cache(cpath, ts)
    assert cpath.name == ".emosaic_4to1"

    loaded = load_tileset_cache(cpath, {"jpg"})
    assert loaded is not None and len(loaded) == 5
    assert (loaded.palettes == ts.palettes).all()

    # invalidation: delete a file -> entry dropped, indices renumbered
    (tiles_dir / "t2.jpg").unlink()
    loaded2 = load_tileset_cache(cpath, {"jpg"})
    assert len(loaded2) == 4
    assert loaded2.get_tile(4).idx == 4  # sequential renumbering

    # extension filter change drops everything
    loaded3 = load_tileset_cache(cpath, {"jpeg"})
    assert len(loaded3) == 0


def test_load_or_generate_force(tmp_path, rng):
    tiles_dir = tmp_path / "tiles"
    arr = rng.integers(0, 200, size=(40, 40, 3), dtype=np.uint8)
    save_img(tiles_dir / "a.jpg", arr, fmt="JPEG")
    ts1 = load_or_generate_tile_set(
        tiles_dir, 16, {"jpg"}, False, 1, log=lambda *a: None
    )
    assert analysis_cache_path(tiles_dir, 1, False).exists()
    ts2 = load_or_generate_tile_set(
        tiles_dir, 16, {"jpg"}, False, 1, force=True, log=lambda *a: None
    )
    assert len(ts1) == len(ts2) == 1


def test_tileset_get_tile_and_images(rng):
    pal = rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    ts = TileSet(palettes=pal, paths=[Path(f"{i}.jpg") for i in range(3)])
    t = ts.get_tile(-2)
    assert t.idx == 2 and t.flipped and t.item == -2
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    ts.set_image(2, img)
    assert (ts.get_image(ts.get_tile(2), 8) == img).all()
    assert (ts.get_image(t, 8) == img[:, ::-1, :]).all()
    with pytest.raises(IndexError):
        ts.get_tile(9)


def test_tile_coords_flip():
    # tile.rs:122-141: flattened coords, flip-aware
    from emosaic_tpu.tiles.tile import Tile

    colors = np.arange(12, dtype=np.uint8).reshape(4, 3)
    t = Tile(idx=1, colors=colors)
    assert (t.coords() == np.arange(12)).all()
    tf = Tile(idx=1, colors=colors, flipped=True)
    # utils.rs:302-307: [1..3,4..6,7..9,10..12] -> [4..6,1..3,10..12,7..9]
    assert (
        tf.coords() == [3, 4, 5, 0, 1, 2, 9, 10, 11, 6, 7, 8]
    ).all()


def test_builder_chunked_analysis(tmp_path, rng, monkeypatch):
    """Chunked prep+analyse (memory-bounded builder) matches one-shot."""
    from emosaic_tpu.tiles import builder as b

    tiles_dir = tmp_path / "tiles"
    for i in range(7):
        arr = rng.integers(0, 200, size=(24, 24, 3), dtype=np.uint8)
        save_img(tiles_dir / f"t{i}.jpg", arr, fmt="JPEG")
    ts1, _ = generate_tile_set(tiles_dir, 8, {"jpg"}, False, 2, log=lambda *a: None)
    monkeypatch.setattr(b, "_ANALYSE_BATCH_BYTES", 1)  # flush every tile
    ts2, _ = b.generate_tile_set(tiles_dir, 8, {"jpg"}, False, 2, log=lambda *a: None)
    assert (ts1.palettes == ts2.palettes).all()
    assert ts1.paths == ts2.paths


def test_fast_prep_keeps_faint_sparse_content(tmp_path, monkeypatch):
    """Faint thin strokes on white: the DCT-scaled draft averages them
    above the white-trim threshold ("trims to nothing"), but the exact
    path keeps the image — fast-prep must redo at full resolution instead
    of dropping the tile (and then match the exact output bit-for-bit)."""
    arr = np.full((1024, 1024, 3), 255, np.uint8)
    arr[100:800:8, 100:800] = 200  # 1px-high strokes, 7px white gaps
    p = tmp_path / "faint.jpg"
    save_img(p, arr, fmt="JPEG")
    exact = prepare_tile(p, 32, crop=True)
    monkeypatch.setenv("EMOSAIC_FAST_PREP", "1")
    fast = prepare_tile(p, 32, crop=True)
    assert (fast == exact).all()


def test_prep_workers_env_parsing(monkeypatch):
    """EMOSAIC_PREP_WORKERS: 0/1 disable the pool as documented (review
    r4: `or` treated 0 as unset), explicit counts are honored, garbage
    never aborts the build."""
    from emosaic_tpu.tiles.builder import _prep_workers

    monkeypatch.setenv("EMOSAIC_PREP_WORKERS", "0")
    assert _prep_workers() == 1
    monkeypatch.setenv("EMOSAIC_PREP_WORKERS", "1")
    assert _prep_workers() == 1
    monkeypatch.setenv("EMOSAIC_PREP_WORKERS", "4")
    assert _prep_workers() == 4
    monkeypatch.setenv("EMOSAIC_PREP_WORKERS", "garbage")
    assert _prep_workers() >= 1  # default, not ValueError
    monkeypatch.delenv("EMOSAIC_PREP_WORKERS")
    assert _prep_workers() >= 1


def test_prep_cache_wrong_shape_regenerates(tmp_path, monkeypatch, rng):
    """A wrong-dimension content-hash cache entry (corrupt/foreign
    writer) must fall through to regeneration, not poison the stack
    build (review r4)."""
    import hashlib

    from PIL import Image as PILImage

    from emosaic_tpu.io import prep

    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    src = tmp_path / "t.jpg"
    arr = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    PILImage.fromarray(arr).save(src, quality=92)
    digest = hashlib.md5(src.read_bytes()).hexdigest()
    cdir = prep.cache_dir()
    cdir.mkdir(parents=True, exist_ok=True)
    # poison: an 8x8 entry where a 16x16 tile is expected
    PILImage.fromarray(arr[:8, :8]).save(cdir / f"{digest}.16.jpg")
    tile, _ = prep.prepare_tile_with_date(src, 16, crop=False)
    assert tile.shape == (16, 16, 3)


def test_find_images_symlink_cycle(tmp_path):
    """A directory-symlink cycle must not duplicate images or loop
    (review r4; the reference's read_dir walk shares the hazard)."""
    from PIL import Image as PILImage

    from emosaic_tpu.io.discovery import find_images

    tiles = tmp_path / "tiles"
    sub = tiles / "sub"
    sub.mkdir(parents=True)
    PILImage.fromarray(np.zeros((4, 4, 3), np.uint8)).save(tiles / "a.jpg")
    PILImage.fromarray(np.zeros((4, 4, 3), np.uint8)).save(sub / "b.jpg")
    try:
        (sub / "loop").symlink_to(tiles, target_is_directory=True)
    except OSError:
        import pytest

        pytest.skip("symlinks unavailable")
    found = find_images(tiles, {"jpg"})
    names = [p.name for p in found]
    assert sorted(names) == ["a.jpg", "b.jpg"], names


def test_generate_tile_set_with_process_pool(tmp_path, monkeypatch, rng):
    """Drive the spawn-context prep pool for real (EMOSAIC_PREP_WORKERS=2;
    this CI box has 1 CPU so the pool branch is otherwise never taken) and
    check parity with the inline path, including error collection."""
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    tiles = tmp_path / "tiles"
    tiles.mkdir()
    for i in range(6):
        arr = rng.integers(0, 200, size=(20, 20, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tiles / f"t{i}.jpg", quality=92)
    (tiles / "bad.jpg").write_bytes(b"not a jpeg")

    monkeypatch.setenv("EMOSAIC_PREP_WORKERS", "2")
    ts_pool, errs_pool = generate_tile_set(tiles, 8, {"jpg"}, False, 1)
    monkeypatch.setenv("EMOSAIC_PREP_WORKERS", "1")
    # fresh cache dir so the inline path regenerates rather than reusing
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg2"))
    ts_inline, errs_inline = generate_tile_set(tiles, 8, {"jpg"}, False, 1)

    assert len(ts_pool) == len(ts_inline) == 6
    np.testing.assert_array_equal(ts_pool.palettes, ts_inline.palettes)
    assert [p.name for p in ts_pool.paths] == [p.name for p in ts_inline.paths]
    assert len(errs_pool) == len(errs_inline) == 1


def test_tileset_accessors_and_builders(rng, tmp_path):
    """TileSet parity surface: from_parts builder, seeded random_tile
    (tileset.rs:93-97 with explicit RNG — randomness-parity deviation),
    on-demand get_image with flip, and the two validation errors."""
    import random

    pal = rng.integers(0, 256, size=(4, 1, 3), dtype=np.uint8)
    # on-demand image prep: one real tile file on disk
    img = rng.integers(0, 256, size=(12, 12, 3), dtype=np.uint8)
    p0 = tmp_path / "t0.png"
    Image.fromarray(img).save(p0)
    ts = TileSet.from_tiles(pal, [p0, p0, p0, p0], dates=["2020", None, None, None])
    assert len(ts) == 4 and ts.get_tile(1).date_taken == "2020"

    # seeded random_tile is deterministic
    a = ts.random_tile(random.Random(7)).idx
    b = ts.random_tile(random.Random(7)).idx
    assert a == b and 1 <= a <= 4

    # get_image prepares from disk when not cached, flip-aware
    t_pos, t_neg = ts.get_tile(2), ts.get_tile(-2)
    im_pos = ts.get_image(t_pos, 8)
    im_neg = ts.get_image(t_neg, 8)
    assert im_pos.shape == (8, 8, 3)
    np.testing.assert_array_equal(im_neg, im_pos[:, ::-1, :])

    # validation: palettes/paths mismatch and random-mode n_cells
    with pytest.raises(ValueError, match="length mismatch"):
        TileSet(palettes=pal, paths=[p0])
    with pytest.raises(ValueError, match="no analysis"):
        TileSet(palettes=None, paths=[p0]).n_cells


def test_tile_identity_semantics():
    """Tile eq/hash are on (idx, flipped) ONLY — colors and date are
    ignored, like tile.rs:18-29 (the no-repeat set relies on this)."""
    from emosaic_tpu.tiles.tile import Tile

    a = Tile(3, colors=np.zeros((4, 3), np.uint8), date_taken="2020:01:01")
    b = Tile(3, colors=np.ones((4, 3), np.uint8))  # different payload
    assert a == b and hash(a) == hash(b)
    assert a != Tile(3, flipped=True)
    assert a != Tile(4)
    assert a != "tile-3"  # non-Tile comparisons are False, not TypeError
    assert len({a, b, Tile(3, flipped=True)}) == 2
    assert Tile(3, flipped=True).item == -3 and b.item == 3


def test_tile_coords_requires_colors():
    from emosaic_tpu.tiles.tile import Tile

    with pytest.raises(ValueError, match="no analysis colors"):
        Tile(1).coords()


def test_find_images_oserror_resilience(tmp_path, monkeypatch):
    """Unreadable directories are skipped (walk continues) and resolve()
    failures degrade gracefully — the reference's walk shares the
    keep-going contract for unreadable entries (image.rs:7-23)."""
    import pathlib

    (tmp_path / "a.jpg").write_bytes(b"x")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "b.jpg").write_bytes(b"x")
    locked = tmp_path / "locked"
    locked.mkdir()
    (locked / "c.jpg").write_bytes(b"x")

    real_iterdir = pathlib.Path.iterdir

    def iterdir(self):
        if self.name == "locked":
            raise OSError(13, "permission denied")
        return real_iterdir(self)

    monkeypatch.setattr(pathlib.Path, "iterdir", iterdir)
    got = [p.name for p in find_images(tmp_path, ["jpg"])]
    assert got == ["a.jpg", "b.jpg"]  # locked dir skipped, rest collected

    # resolve() failing (stale handle / detached mount): cycle-dedup
    # degrades — unresolvable subdirs are skipped, top-level files remain
    monkeypatch.setattr(
        pathlib.Path,
        "resolve",
        lambda self, strict=False: (_ for _ in ()).throw(OSError(5, "io")),
    )
    got = [p.name for p in find_images(tmp_path, ["jpg"])]
    assert got == ["a.jpg"]


def test_prepare_tile_error_paths(tmp_path, monkeypatch, rng):
    """prepare_tile wraps every failure class in ImageError so the
    builder can collect it (utils.rs:63-196 error chain): unreadable
    path, all-white trim-to-nothing, and cache-write failure."""
    import emosaic_tpu.io.prep as prep

    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))

    # unreadable path (a directory behind an image name)
    d = tmp_path / "imadir.jpg"
    d.mkdir()
    with pytest.raises(ImageError):
        prepare_tile(d, 8, crop=False)

    # all-white image + crop: the white-trim leaves nothing
    white = tmp_path / "white.png"
    Image.fromarray(np.full((32, 32, 3), 255, np.uint8)).save(white)
    with pytest.raises(ImageError):
        prepare_tile(white, 8, crop=True)

    # cache write failure (read-only cache dir) is an ImageError, not a
    # crash half-way through the pipeline
    ok = tmp_path / "ok.png"
    Image.fromarray(
        rng.integers(0, 200, size=(32, 32, 3), dtype=np.uint8)
    ).save(ok)
    with pytest.MonkeyPatch.context() as mp:
        def boom(*a):
            raise OSError(30, "Read-only file system")

        mp.setattr(prep.os, "replace", boom)
        with pytest.raises(ImageError, match="failed to write cache"):
            prepare_tile(ok, 8, crop=False)


def test_prepare_tile_corrupt_cache_regenerates(tmp_path, monkeypatch, rng):
    """A corrupt/truncated md5-cache entry falls through to regeneration
    (the reference's or_else chain, utils.rs:86-101) instead of
    poisoning the stack build."""
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    ok = tmp_path / "ok.png"
    Image.fromarray(
        rng.integers(0, 200, size=(32, 32, 3), dtype=np.uint8)
    ).save(ok)
    first = prepare_tile(ok, 8, crop=False)
    cached = list((tmp_path / "xdg").rglob("*.8.jpg"))
    assert len(cached) == 1
    cached[0].write_bytes(b"truncated junk, not a jpeg")
    again = prepare_tile(ok, 8, crop=False)
    np.testing.assert_array_equal(first, again)  # regenerated, identical


def test_prep_worker_never_raises(tmp_path, monkeypatch):
    """The process-pool worker converts ImageError AND unexpected crashes
    into (path, None, None, message) — a worker bug must not kill the
    whole generation run."""
    import emosaic_tpu.io.prep as prep
    from emosaic_tpu.io.prep import prep_worker

    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    p, img, date, err = prep_worker((str(tmp_path / "none.png"), 8, False))
    assert img is None and date is None and err

    with pytest.MonkeyPatch.context() as mp:
        def crash(*a, **k):
            raise RuntimeError("worker bug")

        mp.setattr(prep, "prepare_tile_with_date", crash)
        p, img, date, err = prep_worker(("x.png", 8, False))
        assert img is None and err == "worker bug"


def test_tileset_cache_rejects_foreign_and_inconsistent(tmp_path):
    """The analysis cache treats a wrong magic or internally inconsistent
    npz as a miss (main.rs:622-623 corrupt-cache semantics), never as
    data."""
    import io as _io

    p = tmp_path / ".emosaic_1to1"

    def write_npz(**kw):
        buf = _io.BytesIO()
        np.savez_compressed(buf, **kw)
        p.write_bytes(buf.getvalue())

    good = tmp_path / "t0.jpg"
    good.write_bytes(b"x")
    write_npz(
        magic=np.array("some-other-tool-v9"),
        palettes=np.zeros((1, 1, 3), np.uint8),
        paths=np.array([str(good)]),
        dates=np.array([""]),
    )
    assert load_tileset_cache(p, {"jpg"}) is None  # foreign magic

    write_npz(
        magic=np.array("emosaic_tpu-analysis-v1"),
        palettes=np.zeros((2, 1, 3), np.uint8),  # 2 palettes, 1 path
        paths=np.array([str(good)]),
        dates=np.array([""]),
    )
    assert load_tileset_cache(p, {"jpg"}) is None  # length mismatch


def test_stack_cache_rejects_foreign_magic_and_path_change(tmp_path):
    import io as _io

    from emosaic_tpu.tiles.cache import load_stack_cache, save_stack_cache

    p = tmp_path / ".emosaic_stack_8"
    paths = [tmp_path / "a.jpg", tmp_path / "b.jpg"]
    stack = np.zeros((2, 8, 8, 3), np.uint8)
    save_stack_cache(p, paths, stack)
    # path-set drift (renamed/added tiles) invalidates
    assert load_stack_cache(p, [paths[0]]) is None
    got = load_stack_cache(p, paths)
    assert got is not None and got.shape == stack.shape

    buf = _io.BytesIO()
    np.savez(buf, magic=np.array("not-ours"), paths=np.array([]),
             stack=stack)
    p.write_bytes(buf.getvalue())
    assert load_stack_cache(p, paths) is None  # foreign magic


def test_generate_tile_set_all_images_unusable(tmp_path):
    """Every image failing prep returns an EMPTY tile set plus the
    collected errors (the CLI then exits with its friendly message) —
    not an exception from np.concatenate on zero parts."""
    tiles = tmp_path / "tiles"
    tiles.mkdir()
    (tiles / "a.jpg").write_bytes(b"junk")
    (tiles / "b.jpg").write_bytes(b"more junk")
    ts, errors = generate_tile_set(
        tiles, 8, {"jpg"}, crop=False, dim=1, log=lambda *a: None
    )
    assert len(ts) == 0
    assert len(errors) == 2
    assert ts.palettes.shape == (0, 1, 3)
