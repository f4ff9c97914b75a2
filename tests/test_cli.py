"""End-to-end CLI tests on the CPU backend (small configs).

Covers the full driver surface: prepare, mosaic modes, cache reuse,
tint early-return, validation errors (main.rs:272-345 semantics).
"""

import os
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from emosaic_tpu.cli import main, preprocess_source


@pytest.fixture(autouse=True)
def _isolated_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    monkeypatch.chdir(tmp_path)


@pytest.fixture
def scene(tmp_path, rng):
    tiles = tmp_path / "tiles"
    tiles.mkdir()
    for i in range(12):
        base = rng.integers(0, 256, size=3)
        arr = np.clip(
            base + rng.normal(0, 25, (24, 24, 3)), 0, 255
        ).astype(np.uint8)
        Image.fromarray(arr).save(tiles / f"t{i}.jpg", quality=92)
    src = rng.integers(0, 256, size=(10, 13, 3), dtype=np.uint8)
    Image.fromarray(src).save(tmp_path / "src.png")
    return tmp_path


def test_prepare(scene):
    rc = main(
        ["-s", "8", "-o", str(scene / "p.png"), str(scene / "tiles/t0.jpg"), "prepare"]
    )
    assert rc == 0
    im = Image.open(scene / "p.png")
    assert im.size == (8, 8)


def test_mosaic_mode1_full(scene):
    out = scene / "out.jpg"
    rc = main(
        ["-s", "8", "-o", str(out), str(scene / "src.png"),
         "mosaic", str(scene / "tiles"), "-m", "1", "--html"]
    )
    assert rc == 0
    im = Image.open(out)
    assert im.format == "PNG"  # always PNG (main.rs:482-483)
    assert im.size == (13 * 8, 10 * 8)
    assert (scene / "out.stats.png").exists()
    assert (scene / "out.html").exists()
    assert (scene / "out_widget.html").exists()
    assert (scene / "tiles/.emosaic_1to1").exists()

    # rerun reuses analysis cache (cache file mtime unchanged)
    mt = (scene / "tiles/.emosaic_1to1").stat().st_mtime_ns
    rc = main(
        ["-s", "8", "-o", str(out), str(scene / "src.png"),
         "mosaic", str(scene / "tiles"), "-m", "1"]
    )
    assert rc == 0
    assert (scene / "tiles/.emosaic_1to1").stat().st_mtime_ns == mt


def test_mosaic_mode2_crop_cache_name(scene):
    out = scene / "m2.png"
    rc = main(
        ["-s", "8", "-o", str(out), str(scene / "src.png"), "--crop",
         "mosaic", str(scene / "tiles"), "-m", "2", "--downsample", "1"]
    )
    assert rc == 0
    assert (scene / "tiles/.emosaic_4to1_cropped").exists()
    im = Image.open(out)
    # 10x13 -> rounded to 10x14 (mod 13%2=1 <= 1 -> down to 12? see below)
    # width 13 % 2 = 1, dim//2 = 1, 1 > 1 false -> down to 12; height 10 ok
    assert im.size == (12 // 2 * 8, 10 // 2 * 8)


def test_tint_early_return_skips_stats(scene):
    out = scene / "tint.png"
    rc = main(
        ["-s", "8", "-o", str(out), str(scene / "src.png"),
         "mosaic", str(scene / "tiles"), "-m", "1", "-t", "0.4", "--html"]
    )
    assert rc == 0
    assert out.exists()
    # quirk preserved: tint path skips stats + html (main.rs:477)
    assert not (scene / "tint.stats.png").exists()
    assert not (scene / "tint.html").exists()


def test_mosaic_random(scene):
    out = scene / "r.png"
    rc = main(
        ["-s", "4", "-o", str(out), str(scene / "src.png"),
         "mosaic", str(scene / "tiles"), "-m", "random", "--seed", "5"]
    )
    assert rc == 0
    assert Image.open(out).size == (13 * 4, 10 * 4)


def test_no_repeat_global(scene):
    out = scene / "nr.png"
    rc = main(
        ["-s", "8", "-o", str(out), str(scene / "src.png"),
         "mosaic", str(scene / "tiles"), "-m", "4", "--no-repeat"]
    )
    # dim=4: 10x13 -> rounds to 12x12 -> 3x3=9 blocks <= 24 rows ok
    assert rc == 0


def test_validation_errors(scene, capsys):
    with pytest.raises(SystemExit):
        main(["-s", "0", str(scene / "src.png"), "prepare"])
    with pytest.raises(SystemExit):
        main(["-s", "2000", str(scene / "src.png"), "prepare"])
    with pytest.raises(SystemExit):
        main([str(scene / "missing.png"), "prepare"])
    with pytest.raises(SystemExit):
        main([str(scene / "src.png"), "mosaic", str(scene / "nodir")])


def test_preprocess_rounding():
    # main.rs:574-585: round to nearest multiple of dim, up if mod > dim//2
    img = Image.new("RGB", (97, 64))
    out = preprocess_source(img, 1, 3)
    # 97 % 3 = 1, 3//2 = 1, 1 > 1 false -> 96; 64 % 3 = 1 -> 63
    assert out.shape == (63, 96, 3)
    out = preprocess_source(img, 1, 4)
    # 97 % 4 = 1 <= 2 -> 96; 64 % 4 = 0 -> 64
    assert out.shape == (64, 96, 3)
    img2 = Image.new("RGB", (99, 64))
    out = preprocess_source(img2, 1, 4)
    # 99 % 4 = 3 > 2 -> 100
    assert out.shape == (64, 100, 3)


def test_matcher_hybrid_and_l2_produce_valid_output(scene):
    """--matcher hybrid and --metric l2 are performance additions; at
    small scale the hybrid candidate set covers the library, so output
    must equal the exact default."""
    a, b, c = scene / "a.png", scene / "b.png", scene / "c.png"
    common = ["-s", "8", str(scene / "src.png"), "mosaic", str(scene / "tiles"), "-m", "2"]
    assert main(["-o", str(a)] + common) == 0
    assert main(["-o", str(b)] + common + ["--matcher", "hybrid"]) == 0
    assert main(["-o", str(c)] + common + ["--metric", "l2"]) == 0
    ia = np.asarray(Image.open(a).convert("RGB"))
    ib = np.asarray(Image.open(b).convert("RGB"))
    ic = np.asarray(Image.open(c).convert("RGB"))
    assert (ia == ib).all()  # small library -> hybrid routes to exact
    assert ic.shape == ia.shape  # l2 picks may differ; shape contract only


def test_matcher_hybrid_no_repeat(scene):
    # downsample so blocks (<= 12) fit the 2*12-tile no-repeat bound
    out = scene / "hnr.png"
    rc = main(
        ["-s", "8", "-o", str(out), str(scene / "src.png"),
         "mosaic", str(scene / "tiles"), "-m", "2", "--no-repeat",
         "--matcher", "hybrid", "--downsample", "2"]
    )
    assert rc == 0
    im = Image.open(out)
    assert im.format == "PNG" and im.size[0] > 0


def test_extensions_append_semantics():
    """clap Vec<String> parity (main.rs:100-104): occurrences accumulate."""
    from emosaic_tpu.cli import build_parser

    p = build_parser()
    base = ["x.png", "mosaic", "tiles"]
    assert p.parse_args(base).extensions == ["jpg", "jpeg"]
    assert p.parse_args(
        base + ["--extensions", "png"]
    ).extensions == ["png"]
    assert p.parse_args(
        base + ["--extensions", "png", "gif"]
    ).extensions == ["png", "gif"]
    assert p.parse_args(
        base + ["--extensions", "png", "--extensions", "gif"]
    ).extensions == ["png", "gif"]
    # a bare --extensions is rejected like clap's Vec<String> (one value
    # per occurrence required) instead of silently emptying the set
    # (ADVICE r3)
    with pytest.raises(SystemExit):
        p.parse_args(base + ["--extensions"])


def test_codecs_invalid_filter_message(tmp_path):
    from emosaic_tpu.io.codecs import StreamingPNGWriter

    with pytest.raises(ValueError, match="filter_type must be one of"):
        StreamingPNGWriter(tmp_path / "x.png", 4, 4, filter_type="bogus")


def test_cli_error_paths(scene, capsys):
    """Error-path probes from the verify recipe: argparse range checks,
    the no-repeat+randomize deadlock deviation, corrupt tile handling."""
    # --randomize out of range -> argparse error (exit 2)
    with pytest.raises(SystemExit):
        main(["-s", "8", "-o", str(scene / "x.png"), str(scene / "src.png"),
              "mosaic", str(scene / "tiles"), "--randomize", "150"])
    # no-repeat + randomize: ValueError instead of the reference's
    # deadlock (PARITY deviation 4)
    with pytest.raises(ValueError, match="deadlocks"):
        main(["-s", "8", "-o", str(scene / "x.png"), str(scene / "src.png"),
              "mosaic", str(scene / "tiles"), "--greedy", "--no-repeat",
              "--randomize", "10", "--downsample", "2"])

    # a corrupt tile file is collected, not fatal
    (scene / "tiles" / "broken.jpg").write_bytes(b"not a jpeg")
    rc = main(["-s", "8", "-o", str(scene / "y.png"), str(scene / "src.png"),
               "mosaic", str(scene / "tiles"), "-f"])
    assert rc == 0
    assert (scene / "y.png").exists()


def test_fast_prep_env_restored_after_main(scene, monkeypatch):
    """--fast-prep must not leak EMOSAIC_FAST_PREP into later in-process
    main() calls without the flag."""
    import os

    monkeypatch.delenv("EMOSAIC_FAST_PREP", raising=False)
    assert (
        main(["-s", "8", "-o", str(scene / "fp.png"), "--fast-prep",
              str(scene / "src.png"),
              "mosaic", str(scene / "tiles"), "-m", "1"]) == 0
    )
    assert "EMOSAIC_FAST_PREP" not in os.environ
    # and a pre-existing value is restored, not clobbered
    monkeypatch.setenv("EMOSAIC_FAST_PREP", "0")
    assert (
        main(["-s", "8", "-o", str(scene / "fp2.png"), "--fast-prep",
              str(scene / "src.png"),
              "mosaic", str(scene / "tiles"), "-m", "1"]) == 0
    )
    assert os.environ["EMOSAIC_FAST_PREP"] == "0"


def test_validation_negative_and_zero_args(scene):
    """review r4: the reference's unsigned types make these
    unrepresentable; Python must reject them at the CLI surface, not
    traceback deep in PIL/numpy."""
    out = str(scene / "x.png")
    src = str(scene / "src.png")
    with pytest.raises(SystemExit, match="greater than 0"):
        main(["-s", "-16", "-o", out, src, "mosaic", str(scene / "tiles")])
    rc = None
    try:
        main(["-s", "8", "-o", out, src, "mosaic", str(scene / "tiles"),
              "--downsample", "0"])
    except SystemExit as e:  # argparse error exit
        rc = e.code
    assert rc == 2
    try:
        main(["-s", "8", "-o", out, src, "mosaic", str(scene / "tiles"),
              "--downsample", "-1"])
    except SystemExit as e:
        rc = e.code
    assert rc == 2


def test_corrupt_source_image_friendly_error(scene):
    """A garbage file behind a valid extension must produce the
    reference-style friendly error (main.rs:396), not a PIL traceback."""
    bad = scene / "bad.jpg"
    bad.write_bytes(b"this is not a jpeg")
    with pytest.raises(SystemExit, match="Failed to open source image"):
        main(["-s", "8", "-o", str(scene / "x.png"), str(bad),
              "mosaic", str(scene / "tiles")])


def test_path_validation_errors_are_friendly(scene):
    """The input/tiles/output path validations exit with the reference's
    friendly messages (main.rs:272-345 semantics), not tracebacks."""
    src = str(scene / "src.png")
    tiles = str(scene / "tiles")

    def rc_of(argv):
        with pytest.raises(SystemExit) as e:
            main(argv)
        return e.value.code

    # input path is a directory, not a file
    code = rc_of(["-s", "8", "-o", "o.png", tiles, "mosaic", tiles])
    assert code not in (0, None)
    # input file with no extension
    noext = scene / "noext"
    noext.write_bytes(b"x")
    assert rc_of(["-s", "8", "-o", "o.png", str(noext), "mosaic", tiles])
    # unsupported image format
    bad = scene / "src.tiff"
    bad.write_bytes(b"x")
    assert rc_of(["-s", "8", "-o", "o.png", str(bad), "mosaic", tiles])
    # tiles path is not a directory
    assert rc_of(["-s", "8", "-o", "o.png", src, "mosaic", src])
    # output parent directory does not exist
    assert rc_of(
        ["-s", "8", "-o", str(scene / "nodir" / "o.png"), src, "mosaic", tiles]
    )
    # invalid --mesh spec
    assert rc_of(
        ["-s", "8", "-o", "o.png", src, "mosaic", tiles, "--mesh", "banana"]
    )


def test_tint_opacity_range_validation(scene):
    """--tint-opacity outside [0,1] is an argparse error (main.rs:141-147)."""
    with pytest.raises(SystemExit) as e:
        main(["-s", "8", "-o", "o.png", str(scene / "src.png"),
              "mosaic", str(scene / "tiles"), "-t", "1.5"])
    assert e.value.code == 2


def test_unsupported_format_message(scene):
    """An extension outside the accepted list gets the friendly
    unsupported-format message (main.rs:300-310), not an open attempt."""
    bad = scene / "src.xyz"
    bad.write_bytes(b"x")
    with pytest.raises(SystemExit, match="Unsupported image format"):
        main(["-s", "8", "-o", "o.png", str(bad),
              "mosaic", str(scene / "tiles")])


def test_output_parent_is_a_file(scene):
    """-o whose parent exists but is a FILE is rejected up front."""
    with pytest.raises(SystemExit, match="not a directory"):
        main(["-s", "8", "-o", str(scene / "src.png" / "o.png"),
              str(scene / "src.png"), "mosaic", str(scene / "tiles")])


def test_mesh_auto_and_three_part_spec(scene):
    """--mesh auto resolves to all visible devices data-parallel (8 on the
    CI backend); a 3-part spec is rejected with the usage message."""
    out = scene / "ma.png"
    rc = main(["-s", "8", "-o", str(out), str(scene / "src.png"),
               "mosaic", str(scene / "tiles"), "-m", "1", "--mesh", "auto"])
    assert rc == 0 and out.exists()
    with pytest.raises(SystemExit, match="Invalid --mesh"):
        main(["-s", "8", "-o", "o.png", str(scene / "src.png"),
              "mosaic", str(scene / "tiles"), "--mesh", "2x2x2"])


def test_stack_cache_save_failure_nonfatal(scene, monkeypatch, capsys):
    """A full/readonly disk while persisting the tile-stack cache must not
    fail the run — same contract as the stats-image save (main.rs:498-507)."""
    import emosaic_tpu.cli as cli

    def boom(*a, **k):
        raise OSError(28, "No space left on device")

    monkeypatch.setattr(cli, "save_stack_cache", boom)
    out = scene / "sc.png"
    rc = main(["-s", "8", "-o", str(out), str(scene / "src.png"),
               "mosaic", str(scene / "tiles"), "-m", "1"])
    assert rc == 0 and out.exists()


def test_random_mode_corrupt_tiles_skipped(scene, capsys):
    """Random mode preps tiles itself; a corrupt file is skipped with a
    warning (reference panics here — PARITY deviation), run succeeds."""
    (scene / "tiles" / "bad1.jpg").write_bytes(b"junk not image")
    out = scene / "rcorrupt.png"
    rc = main(["-s", "8", "-o", str(out), str(scene / "src.png"),
               "mosaic", str(scene / "tiles"), "-m", "random"])
    assert rc == 0 and out.exists()
    assert "skipping" in capsys.readouterr().err


def test_random_mode_no_usable_tiles(scene):
    bad = scene / "badtiles"
    bad.mkdir()
    (bad / "a.jpg").write_bytes(b"junk")
    with pytest.raises(SystemExit, match="No usable tiles"):
        main(["-s", "8", "-o", "o.png", str(scene / "src.png"),
              "mosaic", str(bad), "-m", "random"])


def test_tile_size_not_divisible_by_dim(scene, capsys):
    """main.rs:603-611: tile size must be divisible by the mode's grid
    edge; 10 % 4 != 0 exits 1 with the reference's message."""
    with pytest.raises(SystemExit) as e:
        main(["-s", "10", "-o", "o.png", str(scene / "src.png"),
              "mosaic", str(scene / "tiles"), "-m", "16"])
    assert e.value.code == 1
    assert "Tile size must be divisible" in capsys.readouterr().err


def test_source_dims_guard_defensive(scene, monkeypatch, capsys):
    """preprocess_source always rounds to divisible dims; the post-check
    is quirk-parity armor (main.rs:603-611) — force it to fire."""
    import emosaic_tpu.cli as cli

    monkeypatch.setattr(
        cli, "preprocess_source",
        lambda *a, **k: np.zeros((9, 8, 3), np.uint8),
    )
    with pytest.raises(SystemExit) as e:
        main(["-s", "8", "-o", "o.png", str(scene / "src.png"),
              "mosaic", str(scene / "tiles"), "-m", "2"])
    assert e.value.code == 1
    assert "must be divisible" in capsys.readouterr().err


def test_global_norepeat_dropped_flags_warning(scene, capsys):
    """The reference silently ignores randomize/matcher on the global
    no-repeat route (main.rs:663-666); we warn instead (PARITY)."""
    out = scene / "nrw.png"
    rc = main(["-s", "8", "-o", str(out), str(scene / "src.png"),
               "mosaic", str(scene / "tiles"), "-m", "4", "--no-repeat",
               "--randomize", "10", "--matcher", "xla"])
    assert rc == 0 and out.exists()
    err = capsys.readouterr().err
    assert "--randomize" in err and "--matcher xla" in err and "ignored" in err


def test_distributed_nonzero_rank_skips_host_outputs(scene, monkeypatch):
    """Under EMOSAIC_DISTRIBUTED every rank computes but only rank 0
    writes files (pod convention) — a non-0 rank produces no outputs."""
    import emosaic_tpu.parallel.distributed as dist

    monkeypatch.setenv("EMOSAIC_DISTRIBUTED", "1")
    monkeypatch.setattr(dist, "init_distributed", lambda *a, **k: None)
    monkeypatch.setattr(dist, "is_rank0", lambda: False)
    out = scene / "rank.png"
    rc = main(["-s", "8", "-o", str(out), str(scene / "src.png"),
               "mosaic", str(scene / "tiles"), "-m", "1", "--html"])
    assert rc == 0
    assert not out.exists()
    assert not (scene / "rank.stats.png").exists()
    assert not (scene / "rank.html").exists()


def test_stats_artifact_save_failures_nonfatal(scene, capsys):
    """Stats image/JSON save failures warn and continue (main.rs:498-507
    treats the stats save as non-fatal); the mosaic itself still lands."""
    out = scene / "sf.png"
    (scene / "sf.stats.png").mkdir()  # image save -> IsADirectoryError
    rc = main(["-s", "8", "-o", str(out), str(scene / "src.png"),
               "mosaic", str(scene / "tiles"), "-m", "1",
               "--stats-json", str(scene / "nodir" / "s.json")])
    assert rc == 0 and out.exists()
    err = capsys.readouterr().err
    assert "Failed to save statistics image" in err
    assert "Failed to save statistics JSON" in err
