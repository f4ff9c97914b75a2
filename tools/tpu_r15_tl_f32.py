#!/usr/bin/env python3
"""f32-keyed selection for the TWO-LEVEL worst-case scorer (follow-up to
tools/tpu_r14_seg8.py, which measured f32 sort keys beating i32 in the
adaptive coarse).

The two-level scorer's stages today: f32 stripe -> astype(i32) -> i32
min-identity score -> per-segment top_k(8, i32) -> global top_k(512, i32)
-> certificate compares. Every value is an integer < 2^24, so the whole
chain is exact in f32 — this variant keeps scores in f32 end-to-end and
casts only the final outputs (and the certificate stays a f32 compare).

Phases (EMOSAIC_TLF32_PHASES, default BT):
  B  baseline _l1_topk_twolevel_jit, flagship worst-case shape
  T  f32-keyed variant: bit-equality + timing
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from emosaic_tpu.ops.distance import (  # noqa: E402
    _l1_topk_twolevel_jit,
    _TL_BIG,
    _TL_SEG,
    I32_MAX,
)

_T0 = time.time()


def log(msg):
    print(f"[tf {time.time() - _T0:6.1f}s] {msg}", flush=True)


def sync(x):
    jax.device_get(x.ravel()[0])


@functools.partial(jax.jit, static_argnames=("d", "bc", "k", "real_l", "cap"))
def _twolevel_f32_jit(blocks_flat, lib_flat, *, d, bc, k, real_l, cap):
    blocks = blocks_flat.reshape(-1, d)
    lib = lib_flat.reshape(-1, d)
    lp = lib.shape[0]
    nseg = lp // _TL_SEG
    col = jnp.arange(lp, dtype=jnp.int32)
    invalid = col >= real_l
    seg_base = (jnp.arange(nseg, dtype=jnp.int32) * _TL_SEG)[None, :, None]
    ctf = lib.astype(jnp.float32).sum(axis=1)  # exact: row sums < 2^24
    libf = lib.astype(jnp.float32)
    bigf = jnp.float32(_TL_BIG)

    def per_chunk(xc):
        sf = jnp.minimum(xc.astype(jnp.float32)[:, None, :], libf[None]).sum(
            -1, dtype=jnp.float32
        )
        score = ctf[None, :] - 2.0 * sf
        score = jnp.where(invalid[None, :], bigf, score)
        seg = score.reshape(bc, nseg, _TL_SEG)
        nd1, ni1 = jax.lax.top_k(-seg, cap)  # f32 keys
        vals = -nd1
        cols = ni1.astype(jnp.int32) + seg_base
        nd2, ni2 = jax.lax.top_k(-vals.reshape(bc, nseg * cap), k)
        cx = xc.astype(jnp.float32).sum(-1)
        out_d = jnp.where(
            -nd2 >= bigf, I32_MAX, (-nd2 + cx[:, None]).astype(jnp.int32)
        )
        out_r = jnp.take_along_axis(cols.reshape(bc, nseg * cap), ni2, axis=1)
        kth = -nd2[:, k - 1]
        ok = jnp.all(vals[:, :, cap - 1] > kth[:, None], axis=1)
        return out_d, out_r, ok

    nb = blocks.shape[0] // bc
    dists, rows, ok = jax.lax.map(per_chunk, blocks.reshape(nb, bc, d))
    return dists.reshape(-1, k), rows.reshape(-1, k), ok.reshape(-1)


def main():
    phases = os.environ.get("EMOSAIC_TLF32_PHASES", "BT")
    B, D, K, CAP, BC = 16384, 3072, 512, 8, 128
    L = 65534
    LP = -(-L // _TL_SEG) * _TL_SEG
    rng = np.random.default_rng(5)
    # uniform-random: the worst-case regime the two-level path serves
    lib = rng.integers(0, 256, size=(L, D), dtype=np.uint8)
    blocks = rng.integers(0, 256, size=(B, D), dtype=np.uint8)
    lib_p = np.pad(lib, ((0, LP - L), (0, 0)))
    bf = jnp.asarray(blocks.reshape(-1))
    lf = jnp.asarray(lib_p.reshape(-1))
    log("probe ok — inputs resident")

    kw = dict(d=D, bc=BC, k=K, real_l=L, cap=CAP)
    results = {}

    def run(name, fn):
        out = fn()
        for o in out:
            sync(o)
        t0 = time.perf_counter()
        out = fn()
        for o in out:
            sync(o)
        dt = time.perf_counter() - t0
        log(f"{name}: {dt:.3f} s")
        results[name] = out

    if "B" in phases:
        run("baseline", lambda: _l1_topk_twolevel_jit(bf, lf, **kw))
    if "T" in phases:
        run("f32-keyed", lambda: _twolevel_f32_jit(bf, lf, **kw))
    if "baseline" in results and "f32-keyed" in results:
        bv = [np.asarray(x) for x in results["baseline"]]
        vv = [np.asarray(x) for x in results["f32-keyed"]]
        eq = all(np.array_equal(a, b) for a, b in zip(bv, vv))
        ncert = int(bv[2].sum())
        log(f"bit-equal: {eq} (certified {ncert}/{B})")
    log("DONE")


if __name__ == "__main__":
    main()
