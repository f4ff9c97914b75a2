#!/usr/bin/env python3
"""Serve warm-path measurement (VERDICT r2 #4 'Done' criterion): with
`--warmup WxH` the first-request compile cost moves to startup — measure
both sides on the real chip: warmup duration (== the cold first-request
cost it absorbs) and the wall time of the first real request afterwards.
"""

import io
import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, "/root/repo")

_T0 = time.time()


def log(msg):
    print(f"[warm {time.time() - _T0:6.1f}s] {msg}", flush=True)


def main():
    # self-bounded: a SIGTERM mid-device-work wedges the tunnel for the
    # next claimant (CLAUDE.md rule 2), so this exits itself instead of
    # relying on an external timeout
    import os
    import threading

    def watchdog():
        time.sleep(3600)
        log("watchdog fired (60 min); exiting")
        os._exit(2)

    threading.Thread(target=watchdog, daemon=True).start()

    import jax

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    jax.device_get(jax.numpy.ones((8, 128)) * 2)
    log("probe ok")

    import tempfile
    from pathlib import Path

    tmp = Path(tempfile.mkdtemp())
    rng = np.random.default_rng(3)
    tiles = tmp / "tiles"
    tiles.mkdir()
    for i in range(200):
        base = rng.integers(0, 256, size=3)
        arr = np.clip(base + rng.normal(0, 25, (24, 24, 3)), 0, 255).astype(
            np.uint8
        )
        Image.fromarray(arr).save(tiles / f"t{i:03d}.jpg", quality=90)
    log("scene ready")

    from emosaic_tpu.serve import MosaicService

    svc = MosaicService(tiles, "1", 16, log=lambda *a: log(" ".join(map(str, a))))
    t0 = time.perf_counter()
    svc.warmup(640, 480)
    warmup_s = time.perf_counter() - t0
    log(f"warmup(640x480) took {warmup_s:.1f}s (the cold first-request "
        "cost it absorbs; dominated by per-process remote compiles in "
        "this env)")

    # a real request at the warmed shape
    y, x = np.mgrid[0:480, 0:640]
    src = np.stack(
        [x * 255 // 639, y * 255 // 479, (x + y) * 255 // 1118], -1
    ).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(src).save(buf, "PNG")
    body = buf.getvalue()
    t0 = time.perf_counter()
    png = svc.render_bytes(body)
    first_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    svc.render_bytes(body, seed=1)
    second_s = time.perf_counter() - t0
    is_png = png[:4] == b"\x89PNG"
    log(f"first request after warmup: {first_s:.2f}s; second: {second_s:.2f}s; "
        f"output {len(png)} bytes PNG={is_png}")

    # round 4: warm requests skip the per-request LUT rebuild
    # (ops/lut._LUT_CACHE). Measure the same request with the cache
    # disabled — the delta is the distance-transform cost every request
    # used to pay before the cache existed.
    os.environ["EMOSAIC_LUT_CACHE"] = "0"
    try:
        t0 = time.perf_counter()
        svc.render_bytes(body, seed=2)
        nocache_s = time.perf_counter() - t0
    finally:
        os.environ.pop("EMOSAIC_LUT_CACHE", None)
    t0 = time.perf_counter()
    svc.render_bytes(body, seed=3)
    cached_s = time.perf_counter() - t0
    log(
        f"warm request, LUT cache OFF: {nocache_s:.3f}s; ON: {cached_s:.3f}s "
        f"(delta = per-request LUT rebuild the cache removes)"
    )
    log("done")


if __name__ == "__main__":
    main()
