"""Renderer tests, including the exhaustive B/W-universe round-trip oracle
(reference: src/mosaic/mod.rs:83-161) — the bit-exactness contract for tile
selection."""

import math
from pathlib import Path

import numpy as np
import pytest

from emosaic_tpu.ops.analysis import analyse_batch
from emosaic_tpu.render import render_nto1, render_nto1_no_repeat, render_random
from emosaic_tpu.tiles.tileset import TileSet


def bw_universe(n: int) -> np.ndarray:
    """All 2^N - 1 black/white dim x dim tiles (mod.rs:90-104; the all-white
    tile is excluded by the reference's `pow` bound)."""
    dim = math.isqrt(n)
    count = 2**n - 1
    tiles = np.zeros((count, dim, dim, 3), dtype=np.uint8)
    for index in range(count):
        bits = [(index & (1 << i)) != 0 for i in range(n)][::-1]
        for y in range(dim):
            for x in range(dim):
                if bits[y * dim + x]:
                    tiles[index, y, x] = 255
    return tiles


def make_tileset(universe: np.ndarray, dim: int) -> TileSet:
    palettes = np.asarray(analyse_batch(universe, dim))
    return TileSet(
        palettes=palettes,
        paths=[Path(f"tile_{i}.jpg") for i in range(len(universe))],
    )


quiet = dict(log=lambda *a: None)


@pytest.mark.parametrize("n", [1, 4, 9])
def test_render_consistency_bw_universe(n):
    # mod.rs:115-127: every universe tile reproduces itself exactly through
    # both matched renderers.
    dim = math.isqrt(n)
    universe = bw_universe(n)
    ts = make_tileset(universe, dim)
    # exhaustive for N=1,4; deterministic subsample for N=9 (the tileset is
    # still the full universe — only the query loop is thinned for runtime)
    step = 8 if n >= 9 else 1
    for img in universe[::step]:
        out = render_nto1(img, ts, dim, stack=universe, **quiet)
        assert (out.image == img).all()
        out2 = render_nto1_no_repeat(img, ts, dim, stack=universe, **quiet)
        assert (out2.image == img).all()


@pytest.mark.parametrize("n", [1, 4, 9])
def test_render_consistency_bw_pairs(n):
    # mod.rs:129-145: stacked pairs of distinct tiles reproduce exactly.
    dim = math.isqrt(n)
    universe = bw_universe(n)
    ts = make_tileset(universe, dim)
    step = 16 if n >= 9 else 2
    for i in range(0, len(universe), step):
        pair = universe[i : i + 2]
        img = np.zeros((2 * dim, dim, 3), dtype=np.uint8)
        for j, tile in enumerate(pair):
            img[j * dim : (j + 1) * dim] = tile
        out = render_nto1(img, ts, dim, stack=universe, **quiet)
        assert (out.image == img).all()
        out2 = render_nto1_no_repeat(img, ts, dim, stack=universe, **quiet)
        assert (out2.image == img).all()


def test_render_nto1_output_dims(rng):
    # mod.rs:59-68
    src = rng.integers(0, 256, size=(2, 5, 3), dtype=np.uint8)
    stack = rng.integers(0, 256, size=(1, 8, 8, 3), dtype=np.uint8)
    ts = TileSet(
        palettes=np.zeros((1, 1, 3), dtype=np.uint8), paths=[Path("a.jpg")]
    )
    out = render_nto1(src, ts, 8, stack=stack, **quiet)
    assert out.image.shape == (2 * 8, 5 * 8, 3)
    assert out.stats.tile_count() == 10


def test_render_random_output_dims(rng):
    # mod.rs:48-57
    src = np.zeros((10, 10, 3), dtype=np.uint8)
    stack = rng.integers(0, 256, size=(3, 32, 32, 3), dtype=np.uint8)
    ts = TileSet(palettes=None, paths=[Path(f"{i}.jpg") for i in range(3)])
    out = render_random(src, ts, 32, stack=stack, seed=7)
    assert out.shape == (320, 320, 3)
    # reproducible with the same seed
    out2 = render_random(src, ts, 32, stack=stack, seed=7)
    assert (out == out2).all()


def test_no_repeat_insufficient_tiles_raises(rng):
    src = np.zeros((4, 4, 3), dtype=np.uint8)  # 16 blocks at dim 1
    ts = TileSet(
        palettes=np.zeros((2, 1, 3), dtype=np.uint8),
        paths=[Path("a.jpg"), Path("b.jpg")],
    )
    with pytest.raises(ValueError, match="Insufficient tiles"):
        render_nto1(src, ts, 4, no_repeat=True, **quiet)
    with pytest.raises(ValueError, match="Insufficient tiles"):
        render_nto1_no_repeat(src, ts, 4, **quiet)


def test_no_repeat_uses_distinct_tiles(rng):
    # 4 blocks, 8 tiles: all selections unique (item-level for global greedy)
    dim = 1
    src = rng.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(8, 1, 3), dtype=np.uint8)
    stack = rng.integers(0, 256, size=(8, 4, 4, 3), dtype=np.uint8)
    ts = TileSet(palettes=pal, paths=[Path(f"{i}.jpg") for i in range(8)])
    out = render_nto1_no_repeat(src, ts, 4, stack=stack, **quiet)
    items = out.items.reshape(-1)
    assert len(set(items.tolist())) == 4
    # mirror-pair exclusion: no |item| repeats at all (rendering.rs:353-354)
    assert len(set(np.abs(items).tolist())) == 4

    out2 = render_nto1(src, ts, 4, no_repeat=True, stack=stack, **quiet)
    items2 = out2.items.reshape(-1)
    # in-render variant excludes only the chosen orientation
    assert len(set(items2.tolist())) == 4


def test_randomize_within_threshold(rng):
    dim = 1
    src = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(50, 1, 3), dtype=np.uint8)
    stack = np.zeros((50, 2, 2, 3), dtype=np.uint8)
    ts = TileSet(palettes=pal, paths=[Path(f"{i}.jpg") for i in range(50)])
    out = render_nto1(src, ts, 2, randomize=50.0, stack=stack, seed=3, **quiet)
    assert out.stats.tile_count() == 16
    # every selected distance within 50% of the block's best distance
    best = render_nto1(src, ts, 2, stack=stack, **quiet)
    for pos, e in out.stats.tiles.items():
        b = best.stats.tiles[pos].distance
        assert e.distance == b or (e.distance - b) < 0.5 * b


def test_randomize_zero_keeps_best(rng):
    src = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(50, 1, 3), dtype=np.uint8)
    stack = np.zeros((50, 2, 2, 3), dtype=np.uint8)
    ts = TileSet(palettes=pal, paths=[Path(f"{i}.jpg") for i in range(50)])
    out_r = render_nto1(src, ts, 2, randomize=0.0, stack=stack, seed=3, **quiet)
    out_b = render_nto1(src, ts, 2, stack=stack, **quiet)
    # randomize=0 admits only the best candidate -> identical distances
    d_r = sorted(e.distance for e in out_r.stats.tiles.values())
    d_b = sorted(e.distance for e in out_b.stats.tiles.values())
    assert d_r == d_b


def test_mode128_exact_self_match(rng):
    # D = 49152 (mode 128) through the high-N fallback path
    dim, ts = 128, 128
    universe = rng.integers(0, 256, size=(3, ts, ts, 3), dtype=np.uint8)
    from emosaic_tpu.ops.analysis import analyse_batch

    pal = np.asarray(analyse_batch(universe, dim))
    tset = TileSet(palettes=pal, paths=[Path(f"{i}.jpg") for i in range(3)])
    out = render_nto1(universe[1], tset, ts, stack=universe, **quiet)
    assert out.items[0, 0] == 2
    assert out.stats.tiles[(0, 0)].distance == 0


def test_empty_library_raises(rng):
    src = np.zeros((4, 4, 3), dtype=np.uint8)
    ts = TileSet(palettes=np.zeros((0, 1, 3), dtype=np.uint8), paths=[])
    with pytest.raises(ValueError, match="No tiles"):
        render_nto1(src, ts, 4, **quiet)


def test_no_repeat_hybrid_scorer_small_scale(rng, monkeypatch):
    # force the truncated regime so scorer="hybrid" engages; on this
    # small library the hybrid prefilter is exact (CPU approx_min_k is
    # exact), so results must match the exact scorer bit-for-bit
    from emosaic_tpu.render import norepeat as nr

    dim = 1
    src = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(40, 1, 3), dtype=np.uint8)
    stack = rng.integers(0, 256, size=(40, 4, 4, 3), dtype=np.uint8)
    ts = TileSet(palettes=pal, paths=[Path(f"{i}.jpg") for i in range(40)])
    exact = render_nto1_no_repeat(src, ts, 4, stack=stack, **quiet)
    monkeypatch.setattr(nr, "_EXACT_BUDGET", 0)
    trunc = render_nto1_no_repeat(src, ts, 4, stack=stack, **quiet)
    hybrid = render_nto1_no_repeat(
        src, ts, 4, stack=stack, scorer="hybrid", **quiet
    )
    assert (exact.items == trunc.items).all()
    assert (exact.items == hybrid.items).all()


def test_no_repeat_streamed_scorer_end_to_end(rng, monkeypatch):
    """A beyond-budget library through the FULL no-repeat pipeline: the
    adaptive route's gate streams host banks (tiny forced budget ->
    several ragged banks) and the final mosaic must be bit-identical to
    the unstreamed exact render — scoring, greedy assignment (host-scan
    refills only), and composition included."""
    from emosaic_tpu.ops import distance
    from emosaic_tpu.render import norepeat as nr

    src = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(300, 1, 3), dtype=np.uint8)
    stack = rng.integers(0, 256, size=(300, 4, 4, 3), dtype=np.uint8)
    ts = TileSet(palettes=pal, paths=[Path(f"{i}.jpg") for i in range(300)])
    exact = render_nto1_no_repeat(src, ts, 4, stack=stack, **quiet)
    monkeypatch.setattr(nr, "_EXACT_BUDGET", 0)  # leave the dense path
    monkeypatch.setattr(distance, "_DEVICE_LIB_BYTES_MAX", 128 * 3)
    calls = []
    real = distance.l1_topk_streamed

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(distance, "l1_topk_streamed", spy)
    streamed = render_nto1_no_repeat(src, ts, 4, stack=stack, **quiet)
    assert calls  # the production gate engaged
    assert (exact.items == streamed.items).all()
    assert (np.asarray(exact.image) == np.asarray(streamed.image)).all()


def test_no_repeat_starved_blocks_render_black(rng):
    """PARITY deviation 16: B in (T, 2T] passes insufficient_tiles_check
    but only T placements are possible (each consumes a mirror PAIR).
    The reference panics once 2+ blocks starve (compare_matches unwraps
    an empty refill, rendering.rs:386-390 / algorithms.rs:11); this port
    completes the render with BLACK tiles for every starved block."""
    dim = 1
    src = rng.integers(0, 256, size=(1, 5, 3), dtype=np.uint8)  # B=5
    pal = rng.integers(0, 256, size=(3, 1, 3), dtype=np.uint8)  # T=3
    stack = rng.integers(1, 256, size=(3, 4, 4, 3), dtype=np.uint8)  # no 0s
    ts = TileSet(palettes=pal, paths=[Path(f"{i}.jpg") for i in range(3)])
    out = render_nto1_no_repeat(src, ts, 4, stack=stack, **quiet)
    items = out.items.reshape(-1)
    assert (items == 0).sum() == 2  # B - T starved blocks
    img = out.image.reshape(1, 4, 5, 4, 3)
    for bx in range(5):
        tile = img[0, :, bx]
        if items[bx] == 0:
            assert (tile == 0).all()  # black hole, not a crash
        else:
            assert (tile != 0).any()


def test_match_blocks_dedup_path_parity(rng):
    """The query-dedup fast path (match_blocks: b > 8192 with < 50%
    unique blocks routes through np.unique + inverse scatter) must be
    bit-identical to the direct dense kernel — sources repeat colors
    heavily, so this branch carries real renders."""
    from emosaic_tpu.ops.distance import l1_argmin
    from emosaic_tpu.render.matched import match_blocks

    d = 12  # mode 2: no LUT route, dense kernel
    lib = rng.integers(0, 256, size=(300, d), dtype=np.uint8)
    uniq = rng.integers(0, 256, size=(100, d), dtype=np.uint8)
    blocks = uniq[rng.integers(0, 100, size=9000)]  # ~1% unique
    dd, rr = match_blocks(blocks, lib)
    do, ro = l1_argmin(blocks, lib)
    np.testing.assert_array_equal(dd, np.asarray(do))
    np.testing.assert_array_equal(rr, np.asarray(ro))


def test_match_blocks_lut_always_requires_mode1(rng):
    """use_lut='always' on a non-mode-1 library is a loud error, not a
    silent fallback."""
    import pytest

    from emosaic_tpu.render.matched import match_blocks

    blocks = rng.integers(0, 256, size=(16, 12), dtype=np.uint8)
    lib = rng.integers(0, 256, size=(8, 12), dtype=np.uint8)
    with pytest.raises(ValueError, match="LUT path requires mode 1"):
        match_blocks(blocks, lib, use_lut="always")


def test_no_repeat_numpy_fallback_dispatch_bit_identical(rng, monkeypatch):
    """With the native engine unavailable, render_nto1_no_repeat must
    route through the pure-python greedy (make_numpy_refill +
    greedy_global_assign) and produce a bit-identical render — the
    fallback carries machines where the C++ helper cannot build."""
    from emosaic_tpu import native

    dim = 1
    src = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(30, dim, 3), dtype=np.uint8)
    stack = rng.integers(1, 256, size=(30, 8, 8, 3), dtype=np.uint8)
    ts = TileSet(palettes=pal, paths=[Path(f"{i}.jpg") for i in range(30)])
    ref = render_nto1_no_repeat(src, ts, 8, stack=stack, **quiet)
    monkeypatch.setattr(native, "available", lambda: False)
    out = render_nto1_no_repeat(src, ts, 8, stack=stack, **quiet)
    assert (np.asarray(out.image) == np.asarray(ref.image)).all()
    assert (out.items == ref.items).all()


def test_greedy_numpy_fallback_bit_identical(rng, monkeypatch):
    """render_nto1's GREEDY no-repeat route (distinct from the global
    route pinned above) must also produce a bit-identical render through
    the pure-python fallback when the C++ engine is unavailable."""
    from emosaic_tpu import native

    src = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(30, 1, 3), dtype=np.uint8)
    stack = rng.integers(1, 256, size=(30, 8, 8, 3), dtype=np.uint8)
    ts = TileSet(palettes=pal, paths=[Path(f"{i}.jpg") for i in range(30)])
    ref = render_nto1(src, ts, 8, no_repeat=True, stack=stack, **quiet)
    monkeypatch.setattr(native, "available", lambda: False)
    out = render_nto1(src, ts, 8, no_repeat=True, stack=stack, **quiet)
    assert (np.asarray(out.image) == np.asarray(ref.image)).all()
    assert (np.asarray(out.items) == np.asarray(ref.items)).all()


def test_matched_ignored_flags_warning(rng):
    """The randomize / greedy no-repeat routes always score with the
    exact L1 top-k; pinned matcher/metric knobs warn instead of being
    dropped silently (the reference drops them — main.rs:663-666)."""
    src = rng.integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(20, 1, 3), dtype=np.uint8)
    stack = rng.integers(1, 256, size=(20, 8, 8, 3), dtype=np.uint8)
    ts = TileSet(palettes=pal, paths=[Path(f"{i}.jpg") for i in range(20)])
    msgs = []
    out = render_nto1(
        src, ts, 8, randomize=10.0, use_lut="xla", metric="l2", hybrid=True,
        stack=stack, log=msgs.append,
    )
    assert out.image is not None
    warn = "\n".join(msgs)
    assert "ignored" in warn and "--matcher xla" in warn
    assert "--metric l2" in warn and "--matcher hybrid" in warn


def test_compose_loads_stack_on_demand(rng, tmp_path, monkeypatch):
    """stack=None with compose=True prepares the tile stack from disk
    (the CLI passes None when the dense stack exceeds its memory cap)."""
    from PIL import Image

    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    paths = []
    for i in range(5):
        a = rng.integers(0, 200, size=(16, 16, 3), dtype=np.uint8)
        p = tmp_path / f"t{i}.png"
        Image.fromarray(a).save(p)
        paths.append(p)
    pal = rng.integers(0, 256, size=(5, 1, 3), dtype=np.uint8)
    ts = TileSet(palettes=pal, paths=paths)
    src = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    out = render_nto1(src, ts, 8, **quiet)
    assert np.asarray(out.image).shape == (16, 24, 3)


def test_norepeat_scorer_typo_fails_loud(rng):
    """A scorer typo must not silently run the exact path."""
    src = rng.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(10, 1, 3), dtype=np.uint8)
    ts = TileSet(palettes=pal, paths=[Path(f"{i}.jpg") for i in range(10)])
    with pytest.raises(ValueError, match="scorer must be"):
        render_nto1_no_repeat(src, ts, 8, scorer="fastest", **quiet)


def test_greedy_engines_exhaustion_skip(rng):
    """With every row (and its mirror pair, global route) consumed, the
    remaining blocks are skipped with row -1 (rendering.rs:349-351) —
    the engines terminate instead of spinning on an exhausted refill."""
    from emosaic_tpu.ops.distance import build_library, l1_topk
    from emosaic_tpu.render.greedy import (
        greedy_global_assign,
        greedy_sequence_assign,
        make_numpy_refill,
    )

    blocks = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(1, 1, 3), dtype=np.uint8)  # ONE tile
    lib = np.asarray(build_library(pal))  # 2 rows: tile + its flip
    cd, cr = map(np.asarray, l1_topk(blocks, lib, 2))

    # global route: choosing a row retires its mirror too -> 1 placement
    rows_g, _ = greedy_global_assign(
        cd, cr, lib.shape[0], 1, make_numpy_refill(blocks, lib)
    )
    assert (rows_g != -1).sum() == 1

    # sequence route: rows retire individually -> 2 placements, 2 skipped
    rows_s, _ = greedy_sequence_assign(
        np.arange(4), cd, cr, lib.shape[0], make_numpy_refill(blocks, lib)
    )
    assert (rows_s != -1).sum() == 2


def test_render_random_empty_and_on_demand_stack(rng, tmp_path, monkeypatch):
    from PIL import Image

    with pytest.raises(ValueError, match="empty tile set"):
        render_random(
            np.zeros((2, 2, 3), np.uint8),
            TileSet(palettes=None, paths=[]),
            8,
        )
    # stack=None prepares from disk (rendering.rs:418-440 loads lazily)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    p = tmp_path / "t.png"
    Image.fromarray(
        rng.integers(0, 200, size=(16, 16, 3), dtype=np.uint8)
    ).save(p)
    out = render_random(
        np.zeros((2, 3, 3), np.uint8), TileSet(palettes=None, paths=[p]), 8
    )
    assert out.shape == (16, 24, 3)


def test_device_refill_knobs(rng, monkeypatch):
    """EMOSAIC_DEVICE_REFILL=1 drives the batched device refiller (its
    call count logged), is overridden when the library exceeds the
    device-resident budget, and the defer knob parses from the env."""
    from emosaic_tpu import native
    from emosaic_tpu.ops import distance as dd
    from emosaic_tpu.render import norepeat as nr

    if not native.available():
        pytest.skip("native engine unavailable")

    monkeypatch.setenv("EMOSAIC_DEVICE_REFILL", "1")
    monkeypatch.setenv("EMOSAIC_DEVICE_REFILL_DEFER", "0")  # no batching
    monkeypatch.setattr(nr, "_TRUNCATED_K", 2)  # force candidate refills
    monkeypatch.setattr(nr, "_EXACT_BUDGET", 0)  # truncated adaptive route
    src = rng.integers(0, 256, size=(3, 3, 3), dtype=np.uint8)  # 9 blocks
    # identical palettes: every block's truncated candidate list points
    # at the same lowest rows, guaranteeing exhaustion -> refill events
    pal = np.full((9, 1, 3), 7, dtype=np.uint8)
    stack = rng.integers(1, 256, size=(9, 8, 8, 3), dtype=np.uint8)
    ts = TileSet(palettes=pal, paths=[Path(f"{i}.jpg") for i in range(9)])
    msgs = []
    out = render_nto1_no_repeat(src, ts, 8, stack=stack, log=msgs.append)
    assert out.image is not None
    assert any("device refill events" in m for m in msgs)
    # truncation never changes the assignment (the refill re-derives the
    # exact continuation): bit-identical to the untruncated run
    monkeypatch.setenv("EMOSAIC_DEVICE_REFILL", "0")
    monkeypatch.setattr(nr, "_TRUNCATED_K", 512)
    monkeypatch.setattr(nr, "_EXACT_BUDGET", 10**12)  # exact-full route
    ref = render_nto1_no_repeat(src, ts, 8, stack=stack, **quiet)
    assert (np.asarray(out.image) == np.asarray(ref.image)).all()

    # oversized library: the explicit =1 request is overridden, loudly
    monkeypatch.setenv("EMOSAIC_DEVICE_REFILL", "1")
    monkeypatch.setattr(dd, "_DEVICE_LIB_BYTES_MAX", 0)
    msgs2 = []
    out2 = render_nto1_no_repeat(src, ts, 8, stack=stack, log=msgs2.append)
    assert any("overridden" in m for m in msgs2)
    assert (np.asarray(out2.image) == np.asarray(ref.image)).all()

    # defer knob parses from the env at construction time
    monkeypatch.setenv("EMOSAIC_DEVICE_REFILL_DEFER", "3")
    r = dd.DeviceRefiller(
        np.zeros((2, 3), np.uint8), np.zeros((4, 3), np.uint8)
    )
    assert r.defer_events == 3
