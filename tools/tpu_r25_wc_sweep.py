#!/usr/bin/env python3
"""Worst-case two-level scorer: sweep the two unswept stages.

STATUS decomposition (tools/tpu_r9_topk.py + r15): stripe floor 2.09 s,
per-segment top_k(8) fused/free, global top_k(512) over nseg*cap=4096
survivors +0.23 s, map/fallback machinery ~0.3 s -> measured 2.70 s.
r9 swept the PER-SEGMENT selection (iterative + sort-slice both lose);
this sweeps the two stages it did not:

  A. chunk size bc in {512, 1024, 2048}: production uses bc=1024
     (_STRIPE_BC); the ~0.3 s of lax.map machinery amortizes with
     larger chunks IF the fused stripe does not hit a VMEM/HBM cliff.
  B. the GLOBAL selection: production does lax.top_k(-vals, 512) over
     [bc, 4096] then gathers columns; variant G1 replaces both with one
     two-key lax.sort((vals, cols)) + slice — positions restricted to
     equal vals are ascending columns either way, so results must be
     bit-identical (checked on-chip per variant).
  C. the ADAPTIVE coarse per-segment selection (0.47 s of the 0.83 s
     coarse at the 200k library; r14 killed the Pallas 8-accumulator
     and landed f32 keys, but sort-slice was only measured for the
     TWO-level where the full-D stripe fuses the top_k for free):
     production `_ad_coarse_jit` vs the same body with the per-segment
     lax.top_k(cap) replaced by one two-key lax.sort + slice.

Everything runs on device-generated uniform-random inputs (the
worst-case/concentrated regime; no host uploads — CLAUDE.md tunnel
rules) in ONE device claim with warm double-timing. Variants are
compared bit-for-bit against the production jit ON DEVICE (scalar pull).

CPU self-check (run anywhere): python tools/tpu_r25_wc_sweep.py --cpu-check
"""

from __future__ import annotations

import functools
import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

_T0 = time.time()


def log(msg):
    print(f"[wc {time.time() - _T0:6.1f}s] {msg}", flush=True)


# both spellings: a mistyped flag would otherwise silently run DEVICE
# mode (hazards uses --cpu-selfcheck; this tool documented --cpu-check —
# the inconsistency cost one wasted claim attempt in round 4)
CPU_CHECK = "--cpu-check" in sys.argv or "--cpu-selfcheck" in sys.argv
if CPU_CHECK:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from emosaic_tpu.ops.distance import (  # noqa: E402
    _ad_coarse_jit,
    _ad_params,
    _ad_project,
    _l1_topk_twolevel_jit,
    _min_sum_stripe,
    _stripe_f32_ok,
    _TL_BIG,
    _TL_CAP,
    _TL_SEG,
    I32_MAX,
)


@functools.partial(
    jax.jit, static_argnames=("d", "g", "chan", "bc", "cap", "real_l")
)
def _ad_coarse_sortslice_jit(
    blocks_flat, lib_pad_flat, *, d, g, chan, bc, cap, real_l
):
    """`_ad_coarse_jit` body with the per-segment selection replaced by
    one two-key (dist, col) lax.sort + slice per segment. Tie semantics
    match production: top_k(-seg, cap) prefers earlier positions on
    ties, which in the segment-major layout are lower original rows —
    exactly the ascending (dist, col) order. Single-bank libraries only
    (the 200k probe shape)."""
    blocks = blocks_flat.reshape(-1, d)
    bf = lib_pad_flat[0] if isinstance(lib_pad_flat, (tuple, list)) else lib_pad_flat
    lp = bf.size // d
    nseg = lp // _TL_SEG
    w = lp // nseg

    def proj_bank(flat, rows):
        n8 = rows // 8
        return jax.lax.map(
            lambda i: _ad_project(
                jax.lax.dynamic_slice(flat, (i * (n8 * d),), (n8 * d,)).reshape(
                    n8, d
                ),
                d,
                g,
                chan,
            ),
            jnp.arange(8, dtype=jnp.int32),
        ).reshape(rows, -1)

    cl = proj_bank(bf, lp)
    pos = jnp.arange(lp, dtype=jnp.int32)
    src_row = (pos % w) * nseg + pos // w
    clf = cl[src_row].astype(jnp.float32)
    invalid_p = src_row >= real_l
    seg_base = jnp.arange(nseg, dtype=jnp.int32)[None, :, None]

    def per_chunk(xc):
        cb = _ad_project(xc, d, g, chan).astype(jnp.float32)
        dist = jnp.abs(cb[:, None, :] - clf[None]).sum(-1, dtype=jnp.float32)
        dist = jnp.where(invalid_p[None, :], jnp.float32(_TL_BIG), dist)
        seg = dist.reshape(bc, nseg, w)
        colw = jnp.broadcast_to(
            jnp.arange(w, dtype=jnp.int32)[None, None, :], seg.shape
        )
        sv, si = jax.lax.sort((seg, colw), dimension=2, num_keys=2)
        vals = sv[:, :, :cap].astype(jnp.int32)
        cols = si[:, :, :cap] * nseg + seg_base
        s_min = vals[:, :, cap - 1].min(axis=1)
        return vals.reshape(bc, nseg * cap), cols.reshape(bc, nseg * cap), s_min

    nb = blocks.shape[0] // bc
    vals, cols, s_min = jax.lax.map(per_chunk, blocks.reshape(nb, bc, d))
    s = vals.shape[-1]
    return vals.reshape(-1, s), cols.reshape(-1, s), s_min.reshape(-1)


@functools.partial(
    jax.jit, static_argnames=("d", "bc", "k", "real_l", "cap")
)
def _twolevel_sortslice_jit(
    blocks_flat, lib_flat, *, d: int, bc: int, k: int, real_l: int, cap: int
):
    """Production two-level body with the global stage replaced by one
    two-key (val, col) lax.sort + slice: the sort yields the selected
    columns directly (no take_along_axis gather) and its tie order IS
    the production order (equal vals -> ascending col). Certification
    identical (kth value from the sorted slice)."""
    blocks = blocks_flat.reshape(-1, d)
    lib = lib_flat.reshape(-1, d)
    lp = lib.shape[0]
    nseg = lp // _TL_SEG
    col = jnp.arange(lp, dtype=jnp.int32)
    invalid = col >= real_l
    seg_base = (jnp.arange(nseg, dtype=jnp.int32) * _TL_SEG)[None, :, None]
    ct = lib.astype(jnp.int32).sum(axis=1)
    f32 = _stripe_f32_ok(lib.size)
    lib_w = lib.astype(jnp.float32) if f32 else lib

    def per_chunk(xc):
        s = _min_sum_stripe(xc, lib_w, f32)
        score = ct[None, :] - 2 * s
        score = jnp.where(invalid[None, :], _TL_BIG, score)
        seg = score.reshape(bc, nseg, _TL_SEG)
        nd1, ni1 = jax.lax.top_k(-seg, cap)
        vals = -nd1
        cols = ni1.astype(jnp.int32) + seg_base
        sv, sc = jax.lax.sort(
            (vals.reshape(bc, nseg * cap), cols.reshape(bc, nseg * cap)),
            dimension=1,
            num_keys=2,
        )
        sv, sc = sv[:, :k], sc[:, :k]
        cx = xc.astype(jnp.int32).sum(-1)
        out_d = jnp.where(sv >= _TL_BIG, I32_MAX, sv + cx[:, None])
        kth = sv[:, k - 1]
        ok = jnp.all(vals[:, :, cap - 1] > kth[:, None], axis=1)
        return out_d, sc, ok

    nb = blocks.shape[0] // bc
    dists, rows, ok = jax.lax.map(per_chunk, blocks.reshape(nb, bc, d))
    return dists.reshape(-1, k), rows.reshape(-1, k), ok.reshape(-1)


def sync(x):
    jax.device_get(x.ravel()[0])


def run_timed(fn, *args, **kw):
    out = fn(*args, **kw)
    sync(out[0])
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    sync(out[0])
    return out, time.perf_counter() - t0


def equal_on_device(a, b):
    return bool(
        jax.device_get(
            jnp.logical_and(
                jnp.logical_and(
                    jnp.array_equal(a[0], b[0]), jnp.array_equal(a[1], b[1])
                ),
                jnp.array_equal(a[2], b[2]),
            )
        )
    )


def main() -> int:
    def watchdog():
        # ~6 fresh big-kernel remote compiles (1-2 min each) + seconds of
        # device work; no host uploads. 50 min hard stop.
        time.sleep(3000)
        log("watchdog: 50 min elapsed; exiting")
        os._exit(1)

    if not CPU_CHECK:
        threading.Thread(target=watchdog, daemon=True).start()
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    sync(jnp.ones((8, 128)) * 2)
    log("probe ok")

    if CPU_CHECK:
        b, l, d, k = 256, 1100, 48, 16
    else:
        b, l, d, k = 16384, 65534, 3072, 512
    lp = -(-l // _TL_SEG) * _TL_SEG
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    lib = jax.random.randint(k1, (lp, d), 0, 256, dtype=jnp.uint8)
    lib = jnp.where(jnp.arange(lp)[:, None] < l, lib, 0)  # caller pads 0
    blocks = jax.random.randint(k2, (b, d), 0, 256, dtype=jnp.uint8)
    bf, lf = blocks.reshape(-1), lib.reshape(-1)
    common = dict(d=d, k=k, real_l=l, cap=_TL_CAP)

    base, t_base = run_timed(
        _l1_topk_twolevel_jit, bf, lf, bc=min(1024, b), **common
    )
    ok_rate = float(jax.device_get(base[2].mean()))
    log(f"baseline bc={min(1024, b)}: {t_base:.3f}s certified={ok_rate:.3f}")

    results = {"baseline_bc1024_s": round(t_base, 3), "certified": ok_rate}
    bcs = [64, 128] if CPU_CHECK else [512, 2048, 4096]
    for bc in bcs:
        if b % bc:
            continue
        out, t = run_timed(_l1_topk_twolevel_jit, bf, lf, bc=bc, **common)
        same = equal_on_device(out, base)
        log(f"A bc={bc}: {t:.3f}s bit-equal={same}")
        results[f"A_bc{bc}_s"] = round(t, 3)
        results[f"A_bc{bc}_eq"] = same
    for bc in ([64] if CPU_CHECK else [1024, 2048]):
        if b % bc:
            continue
        out, t = run_timed(_twolevel_sortslice_jit, bf, lf, bc=bc, **common)
        same = equal_on_device(out, base)
        log(f"G1 sort-slice bc={bc}: {t:.3f}s bit-equal={same}")
        results[f"G1_bc{bc}_s"] = round(t, 3)
        results[f"G1_bc{bc}_eq"] = same
    # phase C: adaptive coarse per-segment selection at the 200k shape
    if CPU_CHECK:
        cl_, cd, cg, ccap = 1100, 48, 4, 4
        cb = 256
        cbc = 64
    else:
        cl_, cd, cg, ccap = 200_004, 3072, 32, None
        cb = 16384
        cbc = 1024
    clp = -(-cl_ // _TL_SEG) * _TL_SEG
    if ccap is None:
        _, ccap = _ad_params(clp // _TL_SEG)
    k3, k4 = jax.random.split(jax.random.PRNGKey(11))
    clib = jax.random.randint(k3, (clp, cd), 0, 256, dtype=jnp.uint8)
    clib = jnp.where(jnp.arange(clp)[:, None] < cl_, clib, 0)
    cblocks = jax.random.randint(k4, (cb, cd), 0, 256, dtype=jnp.uint8)
    cargs = (cblocks.reshape(-1), clib.reshape(-1))
    ckw = dict(d=cd, g=cg, chan=True, bc=cbc, cap=int(ccap), real_l=cl_)
    cbase, t_c0 = run_timed(_ad_coarse_jit, *cargs, **ckw)
    log(f"C coarse production (cap={ccap}): {t_c0:.3f}s")
    cvar, t_c1 = run_timed(_ad_coarse_sortslice_jit, *cargs, **ckw)
    same_c = equal_on_device(cvar, cbase)
    log(f"C coarse sort-slice: {t_c1:.3f}s bit-equal={same_c}")
    results["C_coarse_prod_s"] = round(t_c0, 3)
    results["C_coarse_sort_s"] = round(t_c1, 3)
    results["C_coarse_eq"] = same_c

    log(f"RESULTS {results}")
    all_eq = all(v for kk_, v in results.items() if kk_.endswith("_eq"))
    log(f"DONE all_bit_equal={all_eq}")
    return 0 if all_eq else 1


if __name__ == "__main__":
    sys.exit(main())
