"""Streaming PNG encoder tests: byte-level round trip via PIL."""

import numpy as np
import pytest
from PIL import Image

from emosaic_tpu.io.codecs import StreamingPNGWriter


def test_round_trip(tmp_path, rng):
    img = rng.integers(0, 256, size=(50, 37, 3), dtype=np.uint8)
    path = tmp_path / "out.png"
    with StreamingPNGWriter(path, 37, 50) as w:
        w.write_band(img[:20])
        w.write_band(img[20:21])
        w.write_band(img[21:])
    back = np.asarray(Image.open(path).convert("RGB"))
    assert (back == img).all()


@pytest.mark.parametrize("ftype", ["none", "sub", "up"])
@pytest.mark.parametrize("workers", [1, 4])
def test_filters_round_trip(tmp_path, rng, ftype, workers):
    """Every scanline filter decodes back to the exact pixels, serial and
    parallel, across band splits that straddle segment boundaries."""
    img = rng.integers(0, 256, size=(300, 41, 3), dtype=np.uint8)
    path = tmp_path / f"f_{ftype}_{workers}.png"
    with StreamingPNGWriter(
        path, 41, 300, filter_type=ftype, workers=workers
    ) as w:
        w.write_band(img[:1])
        w.write_band(img[1:190])
        w.write_band(img[190:])
    back = np.asarray(Image.open(path).convert("RGB"))
    assert (back == img).all()


def test_output_bytes_deterministic_across_workers_and_bands(tmp_path, rng):
    """Segmentation is fixed by the image width, so bytes must not depend
    on band chunking or worker count."""
    img = rng.integers(0, 256, size=(128, 997, 3), dtype=np.uint8)
    outs = []
    for name, workers, splits in [
        ("a", 1, [128]),
        ("b", 4, [128]),
        ("c", 4, [1, 63, 64]),
        ("d", 2, [127, 1]),
    ]:
        path = tmp_path / f"{name}.png"
        with StreamingPNGWriter(path, 997, 128, workers=workers) as w:
            y = 0
            for h in splits:
                w.write_band(img[y : y + h])
                y += h
        outs.append(path.read_bytes())
    assert all(o == outs[0] for o in outs[1:])


@pytest.mark.parametrize("workers", [1, 4])
def test_caller_may_reuse_band_buffer(tmp_path, rng, workers):
    """The writer must not keep views of the caller's band: a caller that
    refills one preallocated buffer per band must still get the exact
    pixels it wrote at each call."""
    h, w, bh = 64, 333, 8
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    path = tmp_path / f"reuse_{workers}.png"
    buf = np.empty((bh, w, 3), np.uint8)
    with StreamingPNGWriter(path, w, h, workers=workers) as wtr:
        for y in range(0, h, bh):
            buf[:] = img[y : y + bh]
            wtr.write_band(buf)
            buf[:] = 0xEE  # clobber immediately after the call returns
    back = np.asarray(Image.open(path).convert("RGB"))
    assert (back == img).all()


def test_adler32_combine_matches_zlib(rng):
    import zlib

    from emosaic_tpu.io.codecs import adler32_combine

    a = rng.integers(0, 256, size=70000, dtype=np.uint8).tobytes()
    b = rng.integers(0, 256, size=130001, dtype=np.uint8).tobytes()
    combined = adler32_combine(zlib.adler32(a), zlib.adler32(b), len(b))
    assert combined == zlib.adler32(a + b)
    # chain of three, including an empty middle segment
    c = b""
    d = rng.integers(0, 256, size=7, dtype=np.uint8).tobytes()
    acc = zlib.adler32(a)
    for seg in (b, c, d):
        acc = adler32_combine(acc, zlib.adler32(seg), len(seg))
    assert acc == zlib.adler32(a + b + c + d)


def test_single_row_bands_sub_filter(tmp_path, rng):
    img = rng.integers(0, 256, size=(9, 5, 3), dtype=np.uint8)
    path = tmp_path / "rows.png"
    with StreamingPNGWriter(path, 5, 9, filter_type="up") as w:
        for r in range(9):
            w.write_band(img[r : r + 1])
    assert (np.asarray(Image.open(path).convert("RGB")) == img).all()


def test_stored_level_zero(tmp_path, rng):
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    path = tmp_path / "out0.png"
    with StreamingPNGWriter(path, 8, 8, compress_level=0) as w:
        w.write_band(img)
    assert (np.asarray(Image.open(path).convert("RGB")) == img).all()


def test_row_count_enforced(tmp_path):
    path = tmp_path / "bad.png"
    w = StreamingPNGWriter(path, 4, 10)
    w.write_band(np.zeros((3, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="expected 10"):
        w.close()
    w2 = StreamingPNGWriter(tmp_path / "bad2.png", 4, 2)
    with pytest.raises(ValueError, match="too many rows"):
        w2.write_band(np.zeros((3, 4, 3), np.uint8))


def test_wrong_width_rejected(tmp_path):
    w = StreamingPNGWriter(tmp_path / "x.png", 4, 4)
    with pytest.raises(ValueError, match="band shape"):
        w.write_band(np.zeros((2, 5, 3), np.uint8))


def test_streamed_cli_matches_unstreamed(tmp_path, rng, monkeypatch):
    """The streaming path must produce pixel-identical output to the
    in-memory path (forced via --stream-threshold 0)."""
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    monkeypatch.chdir(tmp_path)
    from emosaic_tpu.cli import main

    tiles = tmp_path / "tiles"
    tiles.mkdir()
    for i in range(6):
        arr = rng.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tiles / f"t{i}.jpg", quality=95)
    src = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    Image.fromarray(src).save(tmp_path / "s.png")

    common = ["-s", "8", str(tmp_path / "s.png"), "mosaic", str(tiles), "-m", "1"]
    main(["-o", str(tmp_path / "a.png")] + common)
    main(["-o", str(tmp_path / "b.png")] + common + ["--stream-threshold", "0"])
    a = np.asarray(Image.open(tmp_path / "a.png").convert("RGB"))
    b = np.asarray(Image.open(tmp_path / "b.png").convert("RGB"))
    assert (a == b).all()


def test_host_compose_fallback_matches(tmp_path, rng, monkeypatch):
    """--max-stack-bytes 0 forces the disk-streaming host composite; output
    must be pixel-identical to the in-memory device path."""
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    monkeypatch.chdir(tmp_path)
    from emosaic_tpu.cli import main

    tiles = tmp_path / "tiles"
    tiles.mkdir()
    for i in range(6):
        arr = rng.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tiles / f"t{i}.jpg", quality=95)
    src = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    Image.fromarray(src).save(tmp_path / "s.png")

    common = ["-s", "8", str(tmp_path / "s.png"), "mosaic", str(tiles), "-m", "1"]
    main(["-o", str(tmp_path / "a.png")] + common)
    main(["-o", str(tmp_path / "b.png")] + common + ["--max-stack-bytes", "0"])
    a = np.asarray(Image.open(tmp_path / "a.png").convert("RGB"))
    b = np.asarray(Image.open(tmp_path / "b.png").convert("RGB"))
    assert (a == b).all()


def test_iter_bands_host_flips_and_black(tmp_path, rng, monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    from emosaic_tpu.io.prep import prepare_tile
    from emosaic_tpu.ops.composite import iter_bands_host
    from emosaic_tpu.tiles.tileset import TileSet
    from pathlib import Path as P

    tiles = tmp_path / "tiles"
    tiles.mkdir()
    for i in range(3):
        arr = rng.integers(0, 200, size=(16, 16, 3), dtype=np.uint8)
        arr[:, :8] = 10 * (i + 1)  # asymmetric so flips are observable
        Image.fromarray(arr).save(tiles / f"t{i}.jpg", quality=95)
    ts = TileSet(palettes=None, paths=sorted(tiles.glob("*.jpg")))
    items = np.array([[1, -2], [0, 3]], dtype=np.int32)
    bands = list(iter_bands_host(items, ts, 8, band_rows=1))
    out = np.concatenate(bands, axis=0)
    assert out.shape == (16, 16, 3)
    t1 = prepare_tile(ts.paths[0], 8, crop=True)
    t2 = prepare_tile(ts.paths[1], 8, crop=True)
    t3 = prepare_tile(ts.paths[2], 8, crop=True)
    assert (out[:8, :8] == t1).all()
    assert (out[:8, 8:] == t2[:, ::-1, :]).all()  # flipped
    assert (out[8:, :8] == 0).all()  # item 0 -> black
    assert (out[8:, 8:] == t3).all()


def test_multisegment_up_filter_and_backpressure(tmp_path, rng, monkeypatch):
    """Many small compression segments: the Up filter must chain across
    segment boundaries via prev_row, and the pending-futures backpressure
    drains oldest-first; round trip stays exact."""
    import emosaic_tpu.io.codecs as codecs

    monkeypatch.setattr(codecs, "_SEG_TARGET", 256)  # force tiny segments
    img = rng.integers(0, 256, size=(64, 8, 3), dtype=np.uint8)
    path = tmp_path / "ms.png"
    with StreamingPNGWriter(path, 8, 64, filter_type="up", workers=2) as w:
        w.write_band(img[:30])
        w.write_band(img[30:])
    back = np.asarray(Image.open(path).convert("RGB"))
    assert (back == img).all()


def test_close_idempotent_and_nonowned_flush_failure():
    """File-like sinks are flushed but never closed; a flush failure on
    release (broken pipe after the bytes were written) is swallowed, and
    a second close() is a no-op."""

    class Sink:
        def __init__(self):
            self.data = bytearray()

        def write(self, b):
            self.data += bytes(b)
            return len(b)

        def flush(self):
            raise OSError(32, "Broken pipe")

    sink = Sink()
    w = StreamingPNGWriter(sink, 2, 2, workers=1)
    w.write_band(np.zeros((2, 2, 3), np.uint8))
    w.close()  # flush raises -> swallowed
    w.close()  # idempotent
    assert bytes(sink.data[:8]) == b"\x89PNG\r\n\x1a\n"
    assert b"IEND" in bytes(sink.data)


def test_zero_pixel_image_header_only_stream(tmp_path):
    """A 0-row image closes with a valid header-only zlib stream (the
    0x78 0x01 header is emitted in the tail since no segment ever ran)."""
    path = tmp_path / "z.png"
    w = StreamingPNGWriter(path, 0, 0, workers=1)
    w.close()
    data = path.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    idat = data.find(b"IDAT")
    assert idat != -1 and data[idat + 4 : idat + 6] == b"\x78\x01"
    assert b"IEND" in data


def test_exit_on_exception_releases_pool(tmp_path):
    """A caller exception inside the with-block shuts the pool down and
    releases the file without trying to finalize a half-written PNG."""
    path = tmp_path / "e.png"
    with pytest.raises(RuntimeError, match="caller failed"):
        with StreamingPNGWriter(path, 4, 4, workers=2) as w:
            w.write_band(np.zeros((2, 4, 3), np.uint8))
            raise RuntimeError("caller failed")
    data = path.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IEND" not in data  # incomplete by design
