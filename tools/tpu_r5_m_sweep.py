#!/usr/bin/env python3
"""Sweep the adaptive scorer's rescore width m (and cap) at flagship
shape on clustered data: certification rate vs rescore time. Decides the
production _AD_M / _AD_CAP.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from emosaic_tpu.ops.distance import _ad_coarse_jit, _ad_rescore_jit  # noqa: E402

_T0 = time.time()


def log(msg):
    print(f"[m-sweep {time.time() - _T0:6.1f}s] {msg}", flush=True)


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

    for g, cap in ((16, 16), (32, 16), (64, 16), (32, 24)):
        vals, cols, s_min = _ad_coarse_jit(
            bf, lf, d=d, g=g, chan=True, bc=128, cap=cap, real_l=l
        )
        sync(vals)

        def coarse():
            v, c, s = _ad_coarse_jit(
                bf, lf, d=d, g=g, chan=True, bc=128, cap=cap, real_l=l
            )
            return v

        t_coarse = diff_time(coarse)
        for m in (1024,):
            if m + 1 > (lp // 128) * cap:
                continue

            def rescore():
                dd, rr, ok = _ad_rescore_jit(
                    bf, vals, cols, s_min, lf,
                    d=d, bc=64, m=m, k=k, real_l=l, use_dma=True,
                )
                return dd

            sync(rescore())
            t_re = diff_time(rescore)
            dd, rr, ok = _ad_rescore_jit(
                bf, vals, cols, s_min, lf,
                d=d, bc=64, m=m, k=k, real_l=l, use_dma=True,
            )
            cert = int(np.asarray(jax.device_get(ok)).sum())
            log(
                f"g={g:2d} cap={cap:2d} m={m:4d}: coarse {t_coarse:.3f}s rescore "
                f"{t_re:.3f}s total {t_coarse + t_re:.3f}s certified "
                f"{cert}/{b} ({cert / b:.1%})"
            )
    log("done")


if __name__ == "__main__":
    main()
