#!/usr/bin/env python3
"""r4 on-chip experiments: why is adaptive scoring 3.66s when its parts
should sum to <1s, and is the 4.3 vs 2.6 ms/band composite regression real?

Stages timed separately (device-resident inputs, difference method):
  A. _ad_coarse_jit at flagship shape (B=16384, L=65534, D=3072, g=16)
  B. _ad_rescore_jit (m=2048, k=512)
  C. projection matmul alone (lib -> [L, 192])
  D. plain fused stripe distance+top_k at D=192 (isolates the segment
     top_k overhead from the raw stripe cost)
  E. composite DMA band + mode-1 LUT match re-check (bench phases)
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
    _ad_project,
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
    kc, km, kb, kn, kp = jax.random.split(key, 5)
    nc = d // 3
    colors = jax.random.randint(kc, (l, 3), 0, 256, dtype=jnp.int32)
    tex = jax.random.randint(km, (l, d), -10, 11, dtype=jnp.int32)
    lib = jnp.clip(jnp.tile(colors, (1, nc)) + tex, 0, 255).astype(jnp.uint8)
    pick = jax.random.randint(kb, (b,), 0, l, dtype=jnp.int32)
    bn = jax.random.randint(kn, (b, d), -6, 7, dtype=jnp.int32)
    blocks = jnp.clip(lib[pick].astype(jnp.int32) + bn, 0, 255).astype(jnp.uint8)
    perm = jax.random.permutation(kp, l).astype(jnp.int32)
    libp = jnp.pad(lib[perm], ((0, lp - l), (0, 0)))
    perm_pad = jnp.pad(perm, (0, lp - l))
    sync(blocks)
    sync(libp)
    bf, lf = blocks.reshape(-1), libp.reshape(-1)
    log("inputs ready")

    # C: projection matmul alone
    proj = jax.jit(lambda x: _ad_project(x.reshape(-1, d), d, g, True))
    sync(proj(lf))
    t_proj = diff_time(lambda: proj(lf))
    log(f"C. lib projection matmul [65536,3072]->[.,192]: {t_proj*1e3:.1f} ms")

    # A: coarse pass
    def coarse():
        v, c, s = _ad_coarse_jit(
            bf, lf, d=d, g=g, chan=True, bc=128, cap=_AD_CAP, real_l=l
        )
        return v

    sync(coarse())
    t_coarse = diff_time(coarse)
    log(f"A. _ad_coarse_jit: {t_coarse:.3f} s")

    # D: stripe-only at D=192 (no segment top_k): plain min over L
    cl = proj(lf)
    cb = proj(bf)
    sync(cl); sync(cb)

    @jax.jit
    def stripe192(cb_, cl_):
        def per_chunk(xc):
            dist = jnp.abs(xc[:, None, :] - cl_[None]).sum(-1, dtype=jnp.int32)
            return dist.min(axis=1)

        return jax.lax.map(per_chunk, cb_.reshape(-1, 128, cb_.shape[-1]))

    sync(stripe192(cb, cl))
    t_stripe = diff_time(lambda: stripe192(cb, cl))
    log(f"D. D=192 stripe min (no topk): {t_stripe:.3f} s")

    # D2: with the per-segment top_k(cap) as in coarse
    @jax.jit
    def stripe192_topk(cb_, cl_):
        nseg = lp // 128

        def per_chunk(xc):
            dist = jnp.abs(xc[:, None, :] - cl_[None]).sum(-1, dtype=jnp.int32)
            seg = dist.reshape(128, nseg, 128)
            nd, ni = jax.lax.top_k(-seg, _AD_CAP)
            return nd.reshape(128, nseg * _AD_CAP)

        return jax.lax.map(per_chunk, cb_.reshape(-1, 128, cb_.shape[-1]))

    sync(stripe192_topk(cb, cl))
    t_stripek = diff_time(lambda: stripe192_topk(cb, cl))
    log(f"D2. D=192 stripe + seg top_k({_AD_CAP}): {t_stripek:.3f} s")

    # B: rescore
    vals, cols, s_min = _ad_coarse_jit(
        bf, lf, d=d, g=g, chan=True, bc=128, cap=_AD_CAP, real_l=l
    )
    sync(vals)

    def rescore():
        dd, rr, ok = _ad_rescore_jit(
            bf, vals, cols, s_min, lf, perm_pad,
            d=d, bc=64, m=_AD_M, k=k, real_l=l,
        )
        return dd

    sync(rescore())
    t_rescore = diff_time(rescore)
    log(f"B. _ad_rescore_jit (m={_AD_M}): {t_rescore:.3f} s")
    log(
        f"sum A+B = {t_coarse + t_rescore:.3f} s "
        f"(bench measured 3.66 s end-to-end incl host gaps)"
    )

    # E: composite + match re-check (bench phases, small repetition)
    del vals, cols, s_min, cl, cb, lib, libp, blocks, tex, bn
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
    t_match = diff_time(lambda: bench.match_phase(tiles3, src_packed))
    log(f"E. match phase: {t_match*1e3:.1f} ms")
    sync(bench._compose_band(items[:32], aug3))

    def bands():
        out = None
        for i in range(4):
            y0 = (i % 128) * 32
            out = bench._compose_band(items[y0 : y0 + 32], aug3)
        return out

    sync(bands())
    t_band = diff_time(bands) / 4
    log(f"E. composite band: {t_band*1e3:.2f} ms ({128*t_band+t_match:.3f} s total)")
    log("done")


if __name__ == "__main__":
    main()
