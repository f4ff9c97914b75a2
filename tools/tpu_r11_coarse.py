#!/usr/bin/env python3
"""Hunt the adaptive coarse stage's machinery cost (0.85-0.94 s at the
200k library; the projected stripe itself is ~0.2 s).

Hypothesis: the [bc, w, nseg] -> [bc, nseg, w] swapaxes before the
per-segment top_k is a full relayout with a poorly-aligned minor dim
(nseg=1563). Variant: permute the PROJECTED LIBRARY COLUMNS once per
call (position s*w + k holds original row k*nseg + s) so the stripe
comes out segment-major directly — no transpose; cols recover as
ni1 * nseg + s, identical to production.

Outputs must be bit-equal to the production coarse.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from emosaic_tpu.ops.distance import (  # noqa: E402
    _ad_coarse_jit,
    _ad_project,
    _TL_BIG,
    _TL_SEG,
)

_T0 = time.time()


def log(msg):
    print(f"[co {time.time() - _T0:6.1f}s] {msg}", flush=True)


def sync(x):
    jax.device_get(x.ravel()[0])


B, D = 16384, 3072
L = 200_000
LP = -(-L // 128) * 128
G, CAP, BC = 32, 8, 128


@functools.partial(
    jax.jit, static_argnames=("d", "g", "chan", "bc", "cap", "real_l")
)
def coarse_permuted(blocks_flat, lib_pad_flat, *, d, g, chan, bc, cap, real_l):
    blocks = blocks_flat.reshape(-1, d)
    libp = lib_pad_flat.reshape(-1, d)
    lp = libp.shape[0]
    nseg = lp // _TL_SEG
    w = lp // nseg
    cl = _ad_project(libp, d, g, chan)
    # segment-major column permutation: position s*w + k <- row k*nseg + s
    pos = jnp.arange(lp, dtype=jnp.int32)
    src_row = (pos % w) * nseg + pos // w
    clp = cl[src_row].astype(jnp.float32)
    invalid = src_row >= real_l
    seg_base = jnp.arange(nseg, dtype=jnp.int32)[None, :, None]

    def per_chunk(xc):
        cb = _ad_project(xc, d, g, chan).astype(jnp.float32)
        dist = (
            jnp.abs(cb[:, None, :] - clp[None])
            .sum(-1, dtype=jnp.float32)
            .astype(jnp.int32)
        )
        dist = jnp.where(invalid[None, :], _TL_BIG, dist)
        seg = dist.reshape(bc, nseg, w)  # already segment-major
        nd1, ni1 = jax.lax.top_k(-seg, cap)
        vals = -nd1
        cols = ni1.astype(jnp.int32) * nseg + seg_base
        s_min = vals[:, :, cap - 1].min(axis=1)
        return vals.reshape(bc, nseg * cap), cols.reshape(bc, nseg * cap), s_min

    nb = blocks.shape[0] // bc
    vals, cols, s_min = jax.lax.map(per_chunk, blocks.reshape(nb, bc, d))
    s = vals.shape[-1]
    return vals.reshape(-1, s), cols.reshape(-1, s), s_min.reshape(-1)


def timed(fn, reps=2):
    def run(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn()
        sync(out[0])
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1) for _ in range(reps))
    t2 = min(run(3) for _ in range(reps))
    return (t2 - t1) / 2


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

    prod = lambda: _ad_coarse_jit(
        bf, lf, d=D, g=G, chan=True, bc=BC, cap=CAP, real_l=L
    )
    perm = lambda: coarse_permuted(
        bf, lf, d=D, g=G, chan=True, bc=BC, cap=CAP, real_l=L
    )
    v0, c0, s0 = prod()
    sync(v0)
    v1, c1, s1 = perm()
    sync(v1)
    eq = bool(
        (np.asarray(jax.device_get(v0)) == np.asarray(jax.device_get(v1))).all()
        and (np.asarray(jax.device_get(c0)) == np.asarray(jax.device_get(c1))).all()
        and (np.asarray(jax.device_get(s0)) == np.asarray(jax.device_get(s1))).all()
    )
    log(f"bit-equal outputs: {eq}")
    t0 = timed(prod)
    t1 = timed(perm)
    log(f"production (swapaxes) coarse: {t0:.2f}s; permuted-library: {t1:.2f}s")
    extra_stages(bf, lf)
    log("done")


@functools.partial(
    jax.jit, static_argnames=("d", "g", "chan", "bc", "real_l")
)
def coarse_stripe_only(blocks_flat, lib_pad_flat, *, d, g, chan, bc, real_l):
    """Isolation: projection + permuted f32 stripe + cheap reduce (no
    per-segment top_k, no survivor outputs) — the compute floor of the
    coarse stage."""
    blocks = blocks_flat.reshape(-1, d)
    libp = lib_pad_flat.reshape(-1, d)
    lp = libp.shape[0]
    nseg = lp // _TL_SEG
    w = lp // nseg
    cl = _ad_project(libp, d, g, chan)
    pos = jnp.arange(lp, dtype=jnp.int32)
    src_row = (pos % w) * nseg + pos // w
    clp = cl[src_row].astype(jnp.float32)
    invalid = src_row >= real_l

    def per_chunk(xc):
        cb = _ad_project(xc, d, g, chan).astype(jnp.float32)
        dist = (
            jnp.abs(cb[:, None, :] - clp[None])
            .sum(-1, dtype=jnp.float32)
            .astype(jnp.int32)
        )
        dist = jnp.where(invalid[None, :], _TL_BIG, dist)
        return dist.reshape(bc, nseg, w).min(axis=-1)  # cheap reduce

    nb = blocks.shape[0] // bc
    return jax.lax.map(per_chunk, blocks.reshape(nb, bc, d))


def extra_stages(bf, lf):
    only = lambda: coarse_stripe_only(
        bf, lf, d=D, g=G, chan=True, bc=BC, real_l=L
    )
    t = timed(lambda: (only(),))
    log(f"stripe-only coarse (no top_k/survivors): {t:.2f}s")


if __name__ == "__main__":
    main()
