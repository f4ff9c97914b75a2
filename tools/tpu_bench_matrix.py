"""On-chip wall-time matrix for the non-gigapixel BASELINE configs.

BASELINE.md rebuild targets (the gigapixel config is bench.py's headline):
  1. mode 1:  64x64 source,   256 tiles, ts 16  (parity config)
  2. random + tint 0.5: 256x256 source, 1000 tiles, ts 16
  3. mode 2:  128x128 source, 4k tiles,  ts 16  (12-dim distance)
  4. mode 1:  1024x1024 source, 100k tiles, ts 32 (batched kernel scale)

Measures the production pipeline end-to-end per config (match via
render-path dispatch + composite via compose_mosaic), host packing and
transfers included — these are the honest per-config numbers a user sees,
not kernel microbenchmarks. Run: python tools/tpu_bench_matrix.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np

T0 = time.time()


def log(msg):
    print(f"[matrix {time.time() - T0:6.1f}s] {msg}", flush=True)


def _timed(fn, warm=1, reps=3):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def config_matched(name, src_hw, num_tiles, ts, dim, use_lut):
    from emosaic_tpu.ops.analysis import source_blocks
    from emosaic_tpu.ops.composite import compose_mosaic
    from emosaic_tpu.ops.distance import build_library, rows_to_items
    from emosaic_tpu.render.matched import match_blocks

    rng = np.random.default_rng(7)
    h, w = src_hw
    source = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    pal = rng.integers(
        0, 256, size=(num_tiles, dim * dim, 3), dtype=np.uint8
    )
    stack = rng.integers(0, 256, size=(num_tiles, ts, ts, 3), dtype=np.uint8)
    blocks = np.asarray(source_blocks(source, dim))
    lib = np.asarray(build_library(pal))
    nby, nbx = h // dim, w // dim

    def run():
        dist, rows = match_blocks(blocks, lib, use_lut=use_lut)
        items = np.asarray(rows_to_items(rows, num_tiles)).reshape(nby, nbx)
        return compose_mosaic(items, stack)

    t = _timed(run)
    out_mp = (nby * ts) * (nbx * ts) / 1e6
    log(
        f"{name}: {t*1e3:.1f} ms end-to-end "
        f"({blocks.shape[0]} blocks x {lib.shape[0]} lib, D={3*dim*dim}; "
        f"{out_mp:.1f} MP out -> {out_mp/t:.0f} MP/s)"
    )
    return t


def config_random_tint():
    from emosaic_tpu.ops.composite import compose_mosaic, tint_blend

    rng = np.random.default_rng(8)
    h = w = 256
    ts = 16
    num_tiles = 1000
    source = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    stack = rng.integers(0, 256, size=(num_tiles, ts, ts, 3), dtype=np.uint8)

    def run():
        items = rng.integers(1, num_tiles + 1, size=(h, w)).astype(np.int32)
        mosaic = compose_mosaic(items, stack)
        return tint_blend(mosaic, source, 0.5)

    t = _timed(run)
    out_mp = (h * ts) * (w * ts) / 1e6
    log(
        f"random+tint0.5: {t*1e3:.1f} ms end-to-end "
        f"({h}x{w} px -> {out_mp:.1f} MP composited+blended -> "
        f"{out_mp/t:.0f} MP/s)"
    )
    return t


def kernel_crossover():
    """Pallas brute argmin vs fused XLA stripes across feature dims —
    justifies ops/distance._PALLAS_MAX_D (B=4096, L=65534)."""
    from emosaic_tpu.ops.distance import _l1_argmin_pallas, l1_topk_stripes

    rng = np.random.default_rng(11)
    for d in (12, 48, 192, 768, 3072):
        blocks = rng.integers(0, 256, size=(4096, d), dtype=np.uint8)
        lib = rng.integers(0, 256, size=(65534, d), dtype=np.uint8)

        def run_pallas():
            dd, rr = _l1_argmin_pallas(blocks, lib)
            return np.asarray(dd)

        def run_stripes():
            dd, rr = l1_topk_stripes(blocks, lib, 1)
            return dd

        tp = _timed(run_pallas, warm=1, reps=2)
        ts_ = _timed(run_stripes, warm=1, reps=2)
        eq = bool(np.array_equal(run_pallas(), run_stripes()[:, 0]))
        log(
            f"crossover D={d}: pallas {tp*1e3:.0f} ms vs stripes "
            f"{ts_*1e3:.0f} ms (equal: {eq})"
        )


def main():
    log(f"devices: {jax.devices()}")
    import jax.numpy as jnp

    jax.device_get((jnp.ones((8, 128)) @ jnp.ones((128, 8)))[0, 0])
    log("device probe ok")
    config_matched("cfg1 mode1 64^2 x 256t ts16", (64, 64), 256, 16, 1, "never")
    config_random_tint()
    config_matched("cfg3 mode2 128^2 x 4kt ts16", (128, 128), 4000, 16, 2, "never")
    config_matched(
        "cfg4 mode1 1024^2 x 100kt ts32", (1024, 1024), 100_000, 32, 1, "auto"
    )
    kernel_crossover()
    log("MATRIX DONE")


if __name__ == "__main__":
    main()
