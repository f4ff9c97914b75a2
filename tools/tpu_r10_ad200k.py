#!/usr/bin/env python3
"""Decompose the adaptive scorer's 1.86 s at the 200k-row library and
probe two reductions:

  - coarse g=64 (less stripe work; weaker bounds -> certification rate?)
  - candidate selection via lax.top_k(m+1) by VALUE instead of the
    two-key (val, col) sort of nseg*cap=25008 survivors per row.
    Exactness argument: the certificate only needs the (m+1)-th smallest
    coarse value as the non-candidate bound; which coarse-tied rows
    enter the candidate set cannot change any certified row's final
    top-k (coarse is a lower bound: an excluded tied row's exact
    distance >= c_next > kth, strictly out). Verified empirically here
    against the production path before any production change.
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
    I32_MAX,
)

_T0 = time.time()


def log(msg):
    print(f"[ad {time.time() - _T0:6.1f}s] {msg}", flush=True)


def sync(x):
    jax.device_get(x.ravel()[0])


B, T, D, K, M = 16384, 100_000, 3072, 512, 1024
L = 2 * T
LP = -(-L // 128) * 128


def timed(fn, reps=2, k1=1, k2=3):
    def run(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn()
        sync(jax.tree.leaves(out)[0])
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(k1) for _ in range(reps))
    t2 = min(run(k2) for _ in range(reps))
    return (t2 - t1) / (k2 - k1)


import functools


@functools.partial(jax.jit, static_argnames=("d", "bc", "m", "k", "real_l"))
def _rescore_topk_select(blocks_flat, vals, cols, s_min, lib_pad_flat, *,
                         d, bc, m, k, real_l):
    """_ad_rescore_jit with the select stage on lax.top_k by value."""
    blocks = blocks_flat.reshape(-1, d)
    libp = lib_pad_flat.reshape(-1, d)
    b = blocks.shape[0]
    nb = b // bc
    s = vals.shape[-1]

    def select(args):
        vc, cc, sm = args
        nv, ni = jax.lax.top_k(-vc, m + 1)  # smallest m+1 coarse values
        cand_c = jnp.take_along_axis(cc, ni[:, :m], axis=1)
        return cand_c, jnp.minimum(sm, -nv[:, m])

    cand, c_next = jax.lax.map(
        select,
        (vals.reshape(nb, bc, s), cols.reshape(nb, bc, s), s_min.reshape(nb, bc)),
    )
    cand = cand.reshape(b, m)
    c_next = c_next.reshape(b)
    mc = _rows_dma_mc(m, d)
    dist = _l1_rows_dma(blocks, cand, libp, mc=mc)
    dist = jnp.where(cand < real_l, dist, I32_MAX)

    def finish(args):
        dc, cc, cn = args
        sd, so = jax.lax.sort((dc, cc), dimension=1, num_keys=2)
        return sd[:, :k], so[:, :k], cn > sd[:, k - 1]

    dists, rows, ok = jax.lax.map(
        finish,
        (dist.reshape(nb, bc, m), cand.reshape(nb, bc, m), c_next.reshape(nb, bc)),
    )
    return dists.reshape(b, k), rows.reshape(b, k), ok.reshape(b)


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    sync(jnp.ones((8, 128)) * 2)
    log("probe ok")
    nc = D // 3
    key = jax.random.PRNGKey(11)
    kc, km, kb, kn = jax.random.split(key, 4)
    colors = jax.random.randint(kc, (L, 3), 0, 256, dtype=jnp.int32)
    tex = jax.random.randint(km, (L, D), -10, 11, dtype=jnp.int32)
    lib = jnp.clip(jnp.tile(colors, (1, nc)) + tex, 0, 255).astype(jnp.uint8)
    pick = jax.random.randint(kb, (B,), 0, L, dtype=jnp.int32)
    bn = jax.random.randint(kn, (B, D), -6, 7, dtype=jnp.int32)
    blocks = jnp.clip(lib[pick].astype(jnp.int32) + bn, 0, 255).astype(jnp.uint8)
    libp = jnp.pad(lib, ((0, LP - L), (0, 0)))
    sync(blocks)
    sync(libp)
    bf, lf = blocks.reshape(-1), libp.reshape(-1)
    log("inputs ready")

    results = {}
    for g, cap in ((32, 16), (32, 8), (64, 8)):
        co = lambda g=g, cap=cap: _ad_coarse_jit(
            bf, lf, d=D, g=g, chan=True, bc=128, cap=cap, real_l=L
        )
        t_co = timed(co)
        vals, cols, s_min = co()
        sync(vals)
        re_prod = lambda: _ad_rescore_jit(
            bf, vals, cols, s_min, lf, d=D, bc=64, m=M, k=K, real_l=L,
            use_dma=True,
        )
        t_re = timed(re_prod)
        cd, cr, ok = re_prod()
        cert = int(np.asarray(jax.device_get(ok)).sum())
        log(f"g={g} cap={cap}: coarse {t_co:.2f}s + rescore(sort-select) "
            f"{t_re:.2f}s = {t_co + t_re:.2f}s, certified {cert}/{B}")
        results[(g, cap)] = (cd, cr, ok, vals, cols, s_min, t_co)

    # top_k-select variant on the production (g=32, cap=16) coarse outputs
    cd0, cr0, ok0, vals, cols, s_min, t_co = results[(32, 16)]
    re_tk = lambda: _rescore_topk_select(
        bf, vals, cols, s_min, lf, d=D, bc=64, m=M, k=K, real_l=L
    )
    t_tk = timed(re_tk)
    cd1, cr1, ok1 = re_tk()
    cert1 = int(np.asarray(jax.device_get(ok1)).sum())
    # exactness: certified-by-both rows must agree bit-exactly
    both = np.asarray(jax.device_get(ok0)) & np.asarray(jax.device_get(ok1))
    sel = np.flatnonzero(both)
    eq = bool(
        (np.asarray(jax.device_get(cd1))[sel] == np.asarray(jax.device_get(cd0))[sel]).all()
        and (np.asarray(jax.device_get(cr1))[sel] == np.asarray(jax.device_get(cr0))[sel]).all()
    )
    log(f"g=32 + topk-select rescore: {t_tk:.2f}s (total {t_co + t_tk:.2f}s), "
        f"certified {cert1}/{B}, parity-on-certified({sel.size} rows)={eq}")
    log("done")


if __name__ == "__main__":
    main()
