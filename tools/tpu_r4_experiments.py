#!/usr/bin/env python3
"""r4 on-chip experiments: adaptive-scorer stage timing after the strided
+ DMA-rescore redesign, plus composite-band variance re-check.

Findings from run 1 (pre-redesign): coarse 0.341 s, rescore 3.247 s (XLA
row gather ~87 ns/row), match 94.5 ms, band 3.71 ms. The rescore redesign
replaces the gather with the Pallas DMA issue loop (~20 ns/row).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from emosaic_tpu.ops.distance import (  # noqa: E402
    _ad_coarse_jit,
    _ad_rescore_jit,
    _l1_rows_dma,
    _rows_dma_mc,
    _AD_CAP,
    _AD_M,
)

_T0 = time.time()


def log(msg):
    print(f"[r4 {time.time() - _T0:6.1f}s] {msg}", flush=True)


def sync(x):
    jax.device_get(x.ravel()[0])


def diff_time(fn, k1=1, k2=3, reps=2):
    def run(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn()
        sync(out)
        return time.perf_counter() - t0

    t1 = min(run(k1) for _ in range(reps))
    t2 = min(run(k2) for _ in range(reps))
    return max((t2 - t1) / (k2 - k1), 1e-9)


def main():
    b, t, d, k = 16384, 32767, 3072, 512
    l, lp = 2 * t, 65536
    g = 16
    key = jax.random.PRNGKey(11)
    kc, km, kb, kn = jax.random.split(key, 4)
    nc = d // 3
    colors = jax.random.randint(kc, (l, 3), 0, 256, dtype=jnp.int32)
    tex = jax.random.randint(km, (l, d), -10, 11, dtype=jnp.int32)
    lib = jnp.clip(jnp.tile(colors, (1, nc)) + tex, 0, 255).astype(jnp.uint8)
    pick = jax.random.randint(kb, (b,), 0, l, dtype=jnp.int32)
    bn = jax.random.randint(kn, (b, d), -6, 7, dtype=jnp.int32)
    blocks = jnp.clip(lib[pick].astype(jnp.int32) + bn, 0, 255).astype(jnp.uint8)
    libp = jnp.pad(lib, ((0, lp - l), (0, 0)))
    sync(blocks)
    sync(libp)
    bf, lf = blocks.reshape(-1), libp.reshape(-1)
    log("inputs ready")

    # A: coarse pass (strided segments)
    def coarse():
        v, c, s = _ad_coarse_jit(
            bf, lf, d=d, g=g, chan=True, bc=128, cap=_AD_CAP, real_l=l
        )
        return v

    sync(coarse())
    t_coarse = diff_time(coarse)
    log(f"A. _ad_coarse_jit (strided): {t_coarse:.3f} s")

    vals, cols, s_min = _ad_coarse_jit(
        bf, lf, d=d, g=g, chan=True, bc=128, cap=_AD_CAP, real_l=l
    )
    sync(vals)

    # B0: the raw DMA row-distance kernel at flagship shape
    m = _AD_M
    cand = jax.random.randint(
        jax.random.PRNGKey(5), (b, m), 0, l, dtype=jnp.int32
    )
    sync(cand)
    mc = _rows_dma_mc(m, d)
    log(f"mc = {mc}")

    def rows_dma():
        return _l1_rows_dma(blocks, cand, libp, mc=mc)

    sync(rows_dma())
    t_rows = diff_time(rows_dma)
    log(
        f"B0. _l1_rows_dma [{b}x{m}] rows of {d}B: {t_rows:.3f} s "
        f"({t_rows / (b * m) * 1e9:.1f} ns/row)"
    )

    # B: full rescore, DMA vs gather
    for use_dma in (True, False):
        def rescore():
            dd, rr, ok = _ad_rescore_jit(
                bf, vals, cols, s_min, lf,
                d=d, bc=64, m=m, k=k, real_l=l, use_dma=use_dma,
            )
            return dd

        sync(rescore())
        t_rescore = diff_time(rescore)
        log(f"B. _ad_rescore_jit use_dma={use_dma}: {t_rescore:.3f} s")
        if use_dma:
            t_dma_rescore = t_rescore

    # certification check on this data
    dd, rr, ok = _ad_rescore_jit(
        bf, vals, cols, s_min, lf, d=d, bc=64, m=m, k=k, real_l=l,
        use_dma=True,
    )
    cert = int(np.asarray(jax.device_get(ok)).sum())
    log(f"certified: {cert}/{b}")
    log(f"adaptive total (A + B_dma): {t_coarse + t_dma_rescore:.3f} s")

    # E: composite band variance probe — 3 independent timings
    del vals, cols, s_min, lib, libp, blocks, tex, bn, cand, dd, rr, ok
    import importlib

    bench = importlib.import_module("bench")
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tiles3 = jax.random.randint(
        k1, (bench.NUM_TILES, 32, 96), 0, 256, dtype=jnp.uint8
    )
    src_packed = jax.random.randint(k2, (4096, 4096), 0, 1 << 24, dtype=jnp.int32)
    sync(tiles3)
    aug3 = bench._augment(tiles3)
    sync(aug3)
    items = bench.match_phase(tiles3, src_packed)
    sync(items)

    def bands():
        out = None
        for i in range(4):
            y0 = (i % 128) * 32
            out = bench._compose_band(items[y0 : y0 + 32], aug3)
        return out

    sync(bands())
    for rep in range(3):
        t_band = diff_time(bands) / 4
        log(f"E. composite band (probe {rep}): {t_band*1e3:.2f} ms")
    log("done")


if __name__ == "__main__":
    main()
