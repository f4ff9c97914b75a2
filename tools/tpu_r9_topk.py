#!/usr/bin/env python3
"""Profile the two-level scorer's stages at flagship shape and try
cheaper per-segment selection variants.

bench r3: worst-case scoring 2.70 s; stripe-only extrapolates ~2.1 s.
Where do the remaining ~0.6 s go — per-segment top_k(8), the global
top_k(512) over nseg*cap survivors, or the certification reduction?

Variants for the per-segment stage ([bc, nseg, 128] -> (vals, idx) cap=8):
  T0  lax.top_k(-seg, 8)                      (production)
  T1  8 iterative argmin-extractions (min + one-hot mask per round)
  T2  lax.sort the whole segment, slice 8     (sort may beat top_k)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from emosaic_tpu.ops.distance import (  # noqa: E402
    _l1_topk_twolevel_jit,
    _min_sum_stripe,
    _stripe_f32_ok,
    _TL_BIG,
)

_T0 = time.time()


def log(msg):
    print(f"[tk {time.time() - _T0:6.1f}s] {msg}", flush=True)


def sync(x):
    jax.device_get(x.ravel()[0])


BC, L, D, K, CAP = 128, 65534, 3072, 512, 8
LP = -(-L // 128) * 128
NSEG = LP // 128
NCH = 8


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    sync(jnp.ones((8, 128)) * 2)
    log("probe ok")
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    lib = jax.random.randint(k1, (LP, D), 0, 256, dtype=jnp.uint8)
    blocks = jax.random.randint(k2, (NCH, BC, D), 0, 256, dtype=jnp.uint8)
    ct = lib.astype(jnp.int32).sum(axis=1)
    col = jnp.arange(LP, dtype=jnp.int32)
    invalid = col >= L
    f32 = _stripe_f32_ok(lib.size)
    libw = lib.astype(jnp.float32) if f32 else lib
    sync(libw)
    sync(blocks)
    log(f"inputs ready (f32={f32})")

    def stripe_score(xc, libw):
        s = _min_sum_stripe(xc, libw, f32)
        score = ct[None, :] - 2 * s
        return jnp.where(invalid[None, :], _TL_BIG, score)

    # stage snippets, each jitted end-to-end from blocks so XLA fuses
    # comparably; we difference successive stages
    @jax.jit
    def s_stripe(xc, libw):  # stripe + trivial reduce (forces materialization)
        return stripe_score(xc, libw).min(axis=1)

    @jax.jit
    def s_seg_topk(xc, libw):  # + per-segment top_k
        seg = stripe_score(xc, libw).reshape(BC, NSEG, 128)
        nd1, ni1 = jax.lax.top_k(-seg, CAP)
        return nd1.sum(), ni1.sum()

    @jax.jit
    def s_full(xc, libw):  # production two-level body
        seg = stripe_score(xc, libw).reshape(BC, NSEG, 128)
        nd1, ni1 = jax.lax.top_k(-seg, CAP)
        vals = -nd1
        nd2, ni2 = jax.lax.top_k(-vals.reshape(BC, NSEG * CAP), K)
        kth = -nd2[:, K - 1]
        ok = jnp.all(vals[:, :, CAP - 1] > kth[:, None], axis=1)
        return nd2.sum(), ni2.sum(), ok.sum()

    @jax.jit
    def s_seg_iter(xc, libw):  # T1: iterative extraction instead of top_k
        seg = stripe_score(xc, libw).reshape(BC, NSEG, 128)
        lane = jnp.arange(128, dtype=jnp.int32)
        vals = []
        idxs = []
        cur = seg
        for _ in range(CAP):
            m = cur.min(axis=-1)
            am = jnp.argmin(cur, axis=-1).astype(jnp.int32)
            vals.append(m)
            idxs.append(am)
            cur = jnp.where(lane[None, None, :] == am[..., None], _TL_BIG, cur)
        return sum(v.sum() for v in vals), sum(i.sum() for i in idxs)

    @jax.jit
    def s_seg_sort(xc, libw):  # T2: full sort, slice cap
        seg = stripe_score(xc, libw).reshape(BC, NSEG, 128)
        sv = jax.lax.sort(seg, dimension=2)
        return sv[:, :, :CAP].sum()

    stages = [
        ("stripe+min", s_stripe),
        ("stripe+segtopk", s_seg_topk),
        ("full twolevel body", s_full),
        ("stripe+seg ITER-extract", s_seg_iter),
        ("stripe+seg SORT-slice", s_seg_sort),
    ]
    for name, f in stages:
        sync(jax.tree.leaves(f(blocks[0], libw))[0])

        def run(k, f=f):
            t0 = time.perf_counter()
            out = None
            for i in range(k):
                out = f(blocks[i % NCH], libw)
            sync(jax.tree.leaves(out)[0])
            return time.perf_counter() - t0

        t1 = min(run(1) for _ in range(2))
        t2 = min(run(5) for _ in range(2))
        per = (t2 - t1) / 4
        log(f"{name}: {per * 1e3:.1f} ms/chunk (flagship ~ {128 * per:.2f} s)")
    log("done")


if __name__ == "__main__":
    main()
