#!/usr/bin/env python3
"""Debug SCALE_r03 phase F: `_l1_rows_dma` parity failure at d=768
(zero-padded to 1024, sl=8) on the real chip — while phase C (same d,
candidates from the adaptive coarse pass) passed.

Hypotheses probed:
  1. sl=8 slab DMA itself (d=1024 exactly, no padding) vs sl=16/24.
  2. sorted vs unsorted candidate lists (C's are sorted).
  3. error pattern: which rows/cols, off-by-how-much, correlation with
     candidate value or duplicates.
Also re-runs the fixed tint exhaustive check (phase E rerun).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from emosaic_tpu.ops.distance import _l1_rows_dma, _rows_dma_mc  # noqa: E402

_T0 = time.time()


def log(msg):
    print(f"[dbg {time.time() - _T0:6.1f}s] {msg}", flush=True)


def sync(x):
    jax.device_get(x.ravel()[0])


def check(d, b=64, lp=2048, m=128, sort_cand=False, seed=41, tag=""):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    blocks = jax.random.randint(k1, (b, d), 0, 256, dtype=jnp.uint8)
    libp = jax.random.randint(k2, (lp, d), 0, 256, dtype=jnp.uint8)
    cand = jax.random.randint(k3, (b, m), 0, lp, dtype=jnp.int32)
    if sort_cand:
        cand = jnp.sort(cand, axis=1)
    mc = _rows_dma_mc(m, d)
    got = np.asarray(
        jax.device_get(_l1_rows_dma(blocks, cand, libp, mc=mc))
    )
    bn, ln, cn = (np.asarray(jax.device_get(x)) for x in (blocks, libp, cand))
    ref = (
        np.abs(bn.astype(np.int64)[:, None, :] - ln.astype(np.int64)[cn])
        .sum(-1)
        .astype(np.int32)
    )
    bad = got != ref
    n = int(bad.sum())
    msg = f"d={d} sl={-(-d // 1024) * 1024 // 128 if d % 128 == 0 else 1} mc={mc} sorted={sort_cand} {tag}: {n}/{bad.size} wrong"
    if n:
        bi, bj = np.nonzero(bad)
        diffs = got[bad] - ref[bad]
        msg += (
            f"; rows {sorted(set(bi.tolist()))[:8]}..., cols {sorted(set(bj.tolist()))[:12]}...,"
            f" diff range [{diffs.min()}, {diffs.max()}],"
            f" sample (i,j,got,ref,cand)="
            f"{[(int(i), int(j), int(got[i, j]), int(ref[i, j]), int(cn[i, j])) for i, j in list(zip(bi, bj))[:6]]}"
        )
    log(msg)
    return n


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    sync(jnp.ones((8, 128)) * 2)
    log("probe ok")
    # 1. d sweep: does pure sl=8 (d=1024, no pad) fail?
    for d in (3072, 2048, 1024, 768):
        check(d)
    # 2. sorted candidates at 768 (phase C's regime)
    check(768, sort_cand=True)
    check(1024, sort_cand=True)
    # 3. exact reproduction of phase F's shape
    check(768, b=256, lp=1024, m=128, tag="(F shape)")
    # 4. smaller mc (grid j > 1)
    from emosaic_tpu.ops import distance as D

    got_mc = _rows_dma_mc(768, 768)
    log(f"mc for m=768,d=768: {got_mc}")

    # 5. fixed tint exhaustive (phase E rerun with the division-free path)
    import functools
    from emosaic_tpu.ops.composite import (
        _tint_blend_2d,
        _tint_sample_indices,
        ref_tint_blend_u8,
        tint_scalars,
    )

    m8 = np.broadcast_to(np.arange(256, dtype=np.uint8)[:, None, None], (256, 256, 3))
    s8 = np.broadcast_to(np.arange(256, dtype=np.uint8)[None, :, None], (256, 256, 3))
    band = jnp.asarray(np.ascontiguousarray(m8).reshape(256, 768))
    src = jnp.asarray(np.ascontiguousarray(s8).reshape(256, 768))
    ref = np.stack(
        [ref_tint_blend_u8(m8, s8, a).reshape(256, 768) for a in range(256)]
    )
    ref_dev = jnp.asarray(ref)
    sync(ref_dev)

    @functools.partial(jax.jit, static_argnames=("bump",))
    def mismatches(scal, ref_a, bump):
        yi, xi3 = _tint_sample_indices(256, 256, 256, 256, 256, 0)
        out = _tint_blend_2d(band, src, scal, jnp.asarray(yi), jnp.asarray(xi3), bump=bump)
        return (out != ref_a).sum()

    total = None
    for a in range(256):
        scal = tint_scalars(a)
        mm = mismatches(
            jnp.asarray(scal), ref_dev[a],
            bump=bool(scal[3] != np.float32(1.0)),
        )
        total = mm if total is None else total + mm
    log(f"tint on-chip mismatches (fixed): {int(jax.device_get(total))}")
    log("done")


if __name__ == "__main__":
    main()
