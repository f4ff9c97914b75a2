#!/usr/bin/env python3
"""Hybrid no-repeat scoring (MXU L2 prefilter + exact-L1 rescore) at
flagship shape, device-resident inputs + difference timing (the host
entry is tunnel-transfer-dominated in this dev env — CLAUDE.md rule 6).

Measures prefilter and rescore separately, gather vs DMA rescore.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from emosaic_tpu.ops.distance import (  # noqa: E402
    _mxu_prefilter_jit,
    _l1_rescore_jit,
)

_T0 = time.time()


def log(msg):
    print(f"[hyb {time.time() - _T0:6.1f}s] {msg}", flush=True)


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
    l = 2 * t
    kp = 2 * k
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    blocks = jax.random.randint(k1, (b, d), 0, 256, dtype=jnp.uint8)
    lib = jax.random.randint(k2, (l, d), 0, 256, dtype=jnp.uint8)
    sync(blocks)
    sync(lib)
    bf, lf = blocks.reshape(-1), lib.reshape(-1)
    bc = max(8, min(1024, (2**26) // max(1, l * 4)))
    log(f"inputs ready (bc={bc})")

    def prefilter():
        return _mxu_prefilter_jit(bf, lf, d=d, bc=bc, k_pre=kp)

    cand = prefilter()
    sync(cand)
    t_pre = diff_time(prefilter)
    log(f"prefilter (MXU L2, k_pre={kp}): {t_pre:.3f} s")

    for use_dma in (True, False):
        def rescore():
            dd, rr = _l1_rescore_jit(
                bf, cand, lf, d=d, bc=256, k=k, real_l=l, use_dma=use_dma
            )
            return dd

        sync(rescore())
        t_re = diff_time(rescore)
        log(f"rescore use_dma={use_dma}: {t_re:.3f} s")
        if use_dma:
            total = t_pre + t_re
    log(f"hybrid scoring total (prefilter + DMA rescore): {total:.3f} s")
    log("done")


if __name__ == "__main__":
    main()
