"""Native C++ engine parity vs the pure-Python fallbacks."""

import numpy as np
import pytest

from emosaic_tpu import native
from emosaic_tpu.io.prep import trim_bounds
from emosaic_tpu.render.greedy import (
    greedy_global_assign,
    greedy_sequence_assign,
    make_numpy_refill,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _candidates(rng, b, t, d, k):
    """Random blocks/lib + exact ascending top-k candidate lists."""
    blocks = rng.integers(0, 256, size=(b, d), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(t, d), dtype=np.uint8)
    lib = np.concatenate([pal, pal[:, ::-1]])  # fake flip rows
    dist = np.abs(
        blocks.astype(np.int32)[:, None, :] - lib.astype(np.int32)[None, :, :]
    ).sum(2, dtype=np.int32)
    order = np.argsort(dist + np.arange(2 * t)[None, :] * 0, axis=1, kind="stable")
    rows = order[:, :k].astype(np.int32)
    dists = np.take_along_axis(dist, rows, axis=1).astype(np.int32)
    return blocks, lib, dists, rows


def test_greedy_global_matches_python(rng):
    b, t, d, k = 60, 40, 3, 5  # small k forces refills
    blocks, lib, cd, cr = _candidates(rng, b, t, d, k)
    refill = make_numpy_refill(blocks, lib)
    r_py, d_py = greedy_global_assign(cd, cr, 2 * t, t, refill)
    r_c, d_c = native.greedy_global(cd, cr, blocks, lib, t)
    assert (r_c == r_py).all()
    assert (d_c == d_py).all()


def test_greedy_sequence_matches_python(rng):
    b, t, d, k = 50, 30, 12, 4
    blocks, lib, cd, cr = _candidates(rng, b, t, d, k)
    order = rng.permutation(b).astype(np.int32)
    refill = make_numpy_refill(blocks, lib)
    r_py, d_py = greedy_sequence_assign(order, cd, cr, 2 * t, refill)
    r_c, d_c = native.greedy_sequence(order, cd, cr, blocks, lib)
    assert (r_c == r_py).all()
    assert (d_c == d_py).all()


def test_greedy_global_library_exhaustion(rng):
    # more blocks than tiles (mirror exclusion): some blocks stay -1 in both
    b, t, d, k = 20, 8, 3, 16
    blocks, lib, cd, cr = _candidates(rng, b, t, d, k)
    refill = make_numpy_refill(blocks, lib)
    r_py, d_py = greedy_global_assign(cd, cr, 2 * t, t, refill)
    r_c, d_c = native.greedy_global(cd, cr, blocks, lib, t)
    assert (r_c == r_py).all()
    assert (r_c < 0).sum() == b - t  # t placements consume both orientations


def test_trim_bounds_matches_python(rng):
    img = np.full((30, 44, 3), 255, dtype=np.uint8)
    img[5:25, 8:40] = rng.integers(0, 200, size=(20, 32, 3), dtype=np.uint8)
    img[7, :] = 255  # a white stripe inside
    assert native.trim_bounds(img) == trim_bounds(img)
    allwhite = np.full((8, 8, 3), 255, dtype=np.uint8)
    with pytest.raises(ValueError):
        native.trim_bounds(allwhite)
