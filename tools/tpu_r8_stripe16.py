#!/usr/bin/env python3
"""VERDICT r2 #7: attack the worst-case stripe's remaining 2x.

The uniform-random no-repeat scoring floor is the distance stripe at
~0.9 T elem/s (STATUS limitation 2), attributed to u8->i32 conversion
overhead (3+ VPU ops/elem). Variants measured here keep the reduction
in narrow integer types:

  A  baseline: min-identity, i32 convert+sum (production per_chunk)
  B  min-identity, two-level i16 chunk sums (128 mins <= 32640 fit i16)
  C  abs-diff entirely in u8 (|x-t| = max - min, all u8), u8->i16
     chunk sums -> i32  (no 32-bit op until the 1/128-rate spill)
  C2 like C but summing the u8 diffs pairwise IN u8 for 2 levels
     (2 diffs <= 510 needs i16; so only 1 level legal -> same as C)
  D  like C but f32 final accumulation via dot against ones on the MXU
     (Precision.HIGHEST), leaving the VPU only u8 work

Timing: per-chunk stripes over bc=128 x L=65534 x D=3072, difference
method, device-resident inputs. Each variant is also checked exact
against A on one chunk.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

_T0 = time.time()


def log(msg):
    print(f"[s16 {time.time() - _T0:6.1f}s] {msg}", flush=True)


def sync(x):
    jax.device_get(x.ravel()[0])


BC, L, D = 128, 65534, 3072
LP = -(-L // 128) * 128
NCH = 16  # chunks timed per call


def make_variants(lib, ct):
    lib_u8 = lib  # [LP, D] u8

    def va(xc):  # production baseline
        s = (
            jnp.minimum(xc[:, None, :], lib_u8[None])
            .astype(jnp.int32)
            .sum(-1, dtype=jnp.int32)
        )
        return ct[None, :] - 2 * s

    def vb(xc):
        m = jnp.minimum(xc[:, None, :], lib_u8[None])
        m16 = m.reshape(BC, LP, D // 128, 128).astype(jnp.int16).sum(
            -1, dtype=jnp.int16
        )
        s = m16.astype(jnp.int32).sum(-1, dtype=jnp.int32)
        return ct[None, :] - 2 * s

    def vc(xc):
        hi = jnp.maximum(xc[:, None, :], lib_u8[None])
        lo = jnp.minimum(xc[:, None, :], lib_u8[None])
        ad = hi - lo  # u8, exact
        a16 = ad.reshape(BC, LP, D // 128, 128).astype(jnp.int16).sum(
            -1, dtype=jnp.int16
        )
        return a16.astype(jnp.int32).sum(-1, dtype=jnp.int32)

    def vd(xc):
        hi = jnp.maximum(xc[:, None, :], lib_u8[None])
        lo = jnp.minimum(xc[:, None, :], lib_u8[None])
        ad = (hi - lo).reshape(BC * LP, D)  # u8
        ones = jnp.ones((D, 1), jnp.float32)
        s = jax.lax.dot_general(
            ad.astype(jnp.float32),
            ones,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        return s.reshape(BC, LP).astype(jnp.int32)

    def ve(xc):  # f32 accumulation, fused convert (ALU: f32 1.5x i32)
        s = (
            jnp.minimum(xc[:, None, :], lib_u8[None])
            .astype(jnp.float32)
            .sum(-1, dtype=jnp.float32)
            .astype(jnp.int32)
        )
        return ct[None, :] - 2 * s

    def vf(xc, libf):  # f32 min+sum over a pre-converted f32 library
        # libf travels as an operand: a closed-over 805 MB f32 array gets
        # embedded into the remote-compile body (HTTP 413, env rule 5)
        s = (
            jnp.minimum(xc.astype(jnp.float32)[:, None, :], libf[None])
            .sum(-1, dtype=jnp.float32)
            .astype(jnp.int32)
        )
        return ct[None, :] - 2 * s

    return {
        "A_i32": va,
        "B_min_i16": vb,
        "C_absdiff_u8_i16": vc,
        "D_mxu": vd,
        "E_f32_fused": ve,
        "F_f32_lib": vf,
    }


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
    sync(lib)
    sync(blocks)
    log("inputs ready")
    import os

    variants = make_variants(lib, ct)
    sel = os.environ.get("EMOSAIC_S16_VARIANTS")
    if sel:
        want = sel.split(",")
        variants = {k: v for k, v in variants.items() if k in want}

    libf = lib.astype(jnp.float32)
    sync(libf)
    # exactness: A's score vs each variant's |x-t| sum (A returns
    # ct - 2*summin = sum|x-t| - cx; add cx to compare)
    xc0 = blocks[0]
    cx0 = xc0.astype(jnp.int32).sum(-1)
    ref = None
    jitted = {}
    for name, fn in variants.items():
        base = jax.jit(fn)
        jf = (lambda b: (lambda xc: b(xc, libf)))(base) if name == "F_f32_lib" else base
        jitted[name] = jf
        out = np.asarray(jax.device_get(jf(xc0)))
        if name.startswith(("A", "B", "E", "F")):  # min-identity scores
            out = out + np.asarray(jax.device_get(cx0))[:, None]
        if ref is None:
            ref = out
            log(f"{name}: reference")
        else:
            eq = (out == ref).all()
            log(f"{name}: exact={bool(eq)}"
                + ("" if eq else f" maxdiff={np.abs(out - ref).max()}"))

    # timing: difference method over k chunks
    for name, jf in jitted.items():
        def run(k):
            t0 = time.perf_counter()
            out = None
            for i in range(k):
                out = jf(blocks[i % NCH])
            sync(out)
            return time.perf_counter() - t0

        run(2)  # warm
        t1 = min(run(2) for _ in range(2))
        t2 = min(run(10) for _ in range(2))
        per = (t2 - t1) / 8
        rate = BC * LP * D / per / 1e12
        log(f"{name}: {per * 1e3:.1f} ms/chunk = {rate:.2f} T elem/s "
            f"(flagship scoring ~ {16384 / BC * per:.2f} s)")
    log("done")


if __name__ == "__main__":
    main()
