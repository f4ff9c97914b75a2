"""EXIF orientation + date extraction tests (reference utils.rs:198-264,
:311-330)."""

import numpy as np
import pytest
from PIL import Image

from emosaic_tpu.io.exif import get_exif_date, get_orientation
from emosaic_tpu.io.prep import apply_orientation, prepare_tile

_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_EXIF_IFD = 0x8769
_TAG_DATETIME_ORIGINAL = 0x9003


def save_with_exif(path, arr, orientation=None, datetime_str=None, original=None):
    im = Image.fromarray(arr)
    exif = Image.Exif()
    if orientation is not None:
        exif[_TAG_ORIENTATION] = orientation
    if datetime_str is not None:
        exif[_TAG_DATETIME] = datetime_str
    if original is not None:
        ifd = exif.get_ifd(_EXIF_IFD)
        ifd[_TAG_DATETIME_ORIGINAL] = original
    im.save(path, format="JPEG", exif=exif, quality=95)


def test_orientation_read(tmp_path, rng):
    arr = rng.integers(0, 200, size=(24, 24, 3), dtype=np.uint8)
    p = tmp_path / "o6.jpg"
    save_with_exif(p, arr, orientation=6)
    assert get_orientation(p) == 6
    p2 = tmp_path / "none.jpg"
    save_with_exif(p2, arr)
    assert get_orientation(p2) == 1  # default (utils.rs:203-209)
    p3 = tmp_path / "bad.jpg"
    save_with_exif(p3, arr, orientation=99)
    assert get_orientation(p3) == 1  # out of 1..8 -> 1


def test_date_extraction_and_truncation(tmp_path, rng):
    arr = rng.integers(0, 200, size=(24, 24, 3), dtype=np.uint8)
    p = tmp_path / "d.jpg"
    save_with_exif(p, arr, datetime_str="2003:03:19 11:44:30")
    assert get_exif_date(p) == "2003:03:19"  # time part stripped
    # DateTimeOriginal preferred over DateTime (utils.rs:222)
    p2 = tmp_path / "d2.jpg"
    save_with_exif(
        p2, arr, datetime_str="2010:01:01 00:00:00", original="1999:12:31 23:59:59"
    )
    assert get_exif_date(p2) == "1999:12:31"
    p3 = tmp_path / "nodate.jpg"
    save_with_exif(p3, arr)
    assert get_exif_date(p3) is None


def test_apply_orientation_mappings():
    # asymmetric 2x2 pattern; orientation 6 = image-crate rotate90 CW
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    arr[0, 0] = 255  # top-left marked
    im = Image.fromarray(arr)
    out6 = np.asarray(apply_orientation(im, 6))
    assert (out6[0, 1] == 255).all()  # CW: top-left -> top-right
    out3 = np.asarray(apply_orientation(im, 3))
    assert (out3[1, 1] == 255).all()  # 180: -> bottom-right
    out2 = np.asarray(apply_orientation(im, 2))
    assert (out2[0, 1] == 255).all()  # mirror: -> top-right
    out1 = np.asarray(apply_orientation(im, 1))
    assert (out1[0, 0] == 255).all()  # identity


def test_exif_error_resilience(tmp_path):
    """Unreadable paths and non-image bytes degrade to the defaults
    (utils.rs:203-209 / :218-221 return defaults on any read failure)."""
    missing = tmp_path / "nope.jpg"
    assert get_orientation(missing) == 1
    assert get_exif_date(missing) is None
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not an image at all")
    assert get_orientation(bad) == 1
    assert get_exif_date(bad) is None


def test_exif_of_variants_survive_corrupt_exif_block():
    """A decoder that raises while parsing the EXIF block (truncated APP1
    segment) must not abort tile prep — defaults instead."""
    from emosaic_tpu.io.exif import date_of, orientation_of

    class _Boom:
        def getexif(self):
            raise RuntimeError("corrupt EXIF block")

    assert orientation_of(_Boom()) == 1
    assert date_of(_Boom()) is None


def test_exif_date_bytes_and_nul_handling():
    """Raw-bytes tag values decode; undecodable bytes skip to the next tag
    in preference order; NUL padding is stripped (utils.rs:230-244)."""
    from emosaic_tpu.io.exif import date_of

    class _Exif(dict):
        def get_ifd(self, tag):  # no sub-IFD: falls back to IFD0 tags
            raise KeyError(tag)

    class _Im:
        def __init__(self, mapping):
            self._e = _Exif(mapping)

        def getexif(self):
            return self._e

    # some writers emit undecoded ASCII bytes
    assert date_of(_Im({0x9003: b"2005:06:07 08:09:10"})) == "2005:06:07"
    # undecodable bytes -> that tag is skipped, preference moves on
    assert (
        date_of(_Im({0x9003: b"\xff\xfe\xfd", 0x0132: "2010:11:12 01:02:03"}))
        == "2010:11:12"
    )
    # NUL-padded value without a time part: stripped, returned whole
    assert date_of(_Im({0x0132: "2001:02:03\x00\x00"})) == "2001:02:03"
    # only undecodable values -> no date
    assert date_of(_Im({0x9003: b"\xff"})) is None


def test_prepare_applies_rotation(tmp_path, monkeypatch, rng):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    # bright left half; after orientation-6 (90 CW) rotate the bright half
    # is on top
    arr = np.zeros((40, 40, 3), dtype=np.uint8)
    arr[:, :20] = 200
    p = tmp_path / "rot.jpg"
    save_with_exif(p, arr, orientation=6)
    out = prepare_tile(p, 16, crop=False)
    assert out[:8].mean() > 150 and out[8:].mean() < 50
