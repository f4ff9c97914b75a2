#!/usr/bin/env python3
"""Adaptive-coarse selection experiment: Pallas 8-accumulator segment
top-k vs lax.top_k (STATUS round-4 candidate #2).

The 200k-library adaptive coarse decomposes to 0.36 s projected-stripe
floor + 0.47 s per-segment top_k(8) + survivor writes. XLA iterative
extraction was measured 10x slower (materializes [bc, L] per round), but
a Pallas kernel keeps the 8 running (value, index) accumulators in
registers: 8 x (cross-lane min + masked-lane-min index + mask) over each
128-wide segment, one pass over the stripe output.

Exactness contract: identical to jax.lax.top_k(-seg, cap) — ascending
values, lowest-lane-first among ties, each extraction masking only the
chosen lane (value multiplicity preserved).

Phases (EMOSAIC_SEG8_PHASES, default all):
  I  interpret-mode exactness (CPU-safe; also run by CI via this module)
  B  on-chip baseline: production _ad_coarse_jit at the 200k shape
  P  on-chip Pallas-selection coarse: bit-equality + timing
  F  on-chip f32-keyed top_k variant (skip the i32 cast before top_k)
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")

from emosaic_tpu.ops.distance import (  # noqa: E402
    _ad_coarse_jit,
    _ad_project,
    _TL_BIG,
    _TL_SEG,
    I32_MAX,
)

_T0 = time.time()


def log(msg):
    print(f"[s8 {time.time() - _T0:6.1f}s] {msg}", flush=True)


def sync(x):
    jax.device_get(x.ravel()[0])


# --------------------------------------------------------------------------
# Pallas segment top-cap kernel
# --------------------------------------------------------------------------

_TB = 32  # block rows per grid step
_TS = 128  # segments per grid step (also the output minor dim)


def _seg8_kernel(seg_ref, *out_refs, cap: int):
    """seg_ref [TB, TS, 128] i32 scores; out_refs = cap value refs then
    cap index refs, each [TB, TS]. Iterative extraction: accumulators
    never leave registers."""
    x = seg_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    for r in range(cap):
        mn = jnp.min(x, axis=2)
        # first minimum wins: masked min over lane ids (argmin-free, the
        # _l1_kernel idiom) -> top_k's lowest-index tie rule
        idx = jnp.min(jnp.where(x == mn[:, :, None], lane, _TL_SEG), axis=2)
        out_refs[r][...] = mn
        out_refs[cap + r][...] = idx
        x = jnp.where(lane == idx[:, :, None], I32_MAX, x)


def seg_topk_pallas(seg, cap: int, interpret: bool = False):
    """Per-segment ascending top-cap of seg [bc, nseg, 128] (i32) ->
    (vals [bc, nseg, cap], idx [bc, nseg, cap]); bit-equal to
    (-a for a in lax.top_k(-seg, cap)). nseg is padded to _TS here."""
    bc, nseg, w = seg.shape
    assert w == _TL_SEG and bc % _TB == 0
    nseg2 = -(-nseg // _TS) * _TS
    if nseg2 != nseg:
        seg = jnp.pad(
            seg, ((0, 0), (0, nseg2 - nseg), (0, 0)), constant_values=_TL_BIG
        )
    outs = pl.pallas_call(
        functools.partial(_seg8_kernel, cap=cap),
        grid=(bc // _TB, nseg2 // _TS),
        in_specs=[
            pl.BlockSpec((_TB, _TS, _TL_SEG), lambda i, j: (i, j, 0))
        ],
        out_specs=[
            pl.BlockSpec((_TB, _TS), lambda i, j: (i, j))
            for _ in range(2 * cap)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bc, nseg2), jnp.int32)
            for _ in range(2 * cap)
        ],
        interpret=interpret,
    )(seg)
    vals = jnp.stack(outs[:cap], axis=-1)[:, :nseg]
    idx = jnp.stack(outs[cap:], axis=-1)[:, :nseg]
    return vals, idx


def check_interpret():
    rng = np.random.default_rng(0)
    bc, nseg = _TB, 130  # forces the pad path
    seg = rng.integers(0, 50, size=(bc, nseg, _TL_SEG)).astype(np.int32)
    seg[0, 0, :] = 7  # full-tie segment
    seg[1, 3, 10:] = _TL_BIG  # padded-column lookalike
    vals, idx = jax.jit(
        functools.partial(seg_topk_pallas, cap=8, interpret=True)
    )(jnp.asarray(seg))
    nd, ni = jax.lax.top_k(-jnp.asarray(seg), 8)
    ok_v = np.array_equal(np.asarray(vals), -np.asarray(nd))
    ok_i = np.array_equal(np.asarray(idx), np.asarray(ni))
    log(f"interpret exactness: vals={ok_v} idx={ok_i}")
    assert ok_v and ok_i
    return True


# --------------------------------------------------------------------------
# Coarse variants (coarse body copied from _ad_coarse_jit with only the
# selection stage swapped; bit-equality vs production is asserted)
# --------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("d", "g", "chan", "bc", "cap", "real_l", "sel")
)
def _coarse_variant_jit(
    blocks_flat, lib_pad_flat, *, d, g, chan, bc, cap, real_l, sel
):
    blocks = blocks_flat.reshape(-1, d)
    libp = lib_pad_flat.reshape(-1, d)
    lp = libp.shape[0]
    nseg = lp // _TL_SEG
    w = lp // nseg
    cl = _ad_project(libp, d, g, chan)
    pos = jnp.arange(lp, dtype=jnp.int32)
    src_row = (pos % w) * nseg + pos // w
    clf = cl[src_row].astype(jnp.float32)
    invalid_p = src_row >= real_l
    seg_base = jnp.arange(nseg, dtype=jnp.int32)[None, :, None]

    def per_chunk(xc):
        cb = _ad_project(xc, d, g, chan).astype(jnp.float32)
        distf = jnp.abs(cb[:, None, :] - clf[None]).sum(-1, dtype=jnp.float32)
        if sel == "f32":
            distf = jnp.where(invalid_p[None, :], jnp.float32(_TL_BIG), distf)
            segf = distf.reshape(bc, nseg, w)
            nd1, ni1 = jax.lax.top_k(-segf, cap)  # exact: values < 2^24
            vals = (-nd1).astype(jnp.int32)
            ni1 = ni1.astype(jnp.int32)
        else:
            dist = distf.astype(jnp.int32)
            dist = jnp.where(invalid_p[None, :], _TL_BIG, dist)
            seg = dist.reshape(bc, nseg, w)
            if sel == "pallas":
                vals, ni1 = seg_topk_pallas(seg, cap)
            else:
                nd1, ni1 = jax.lax.top_k(-seg, cap)
                vals = -nd1
                ni1 = ni1.astype(jnp.int32)
        cols = ni1 * nseg + seg_base
        s_min = vals[:, :, cap - 1].min(axis=1)
        return vals.reshape(bc, nseg * cap), cols.reshape(bc, nseg * cap), s_min

    nb = blocks.shape[0] // bc
    vals, cols, s_min = jax.lax.map(per_chunk, blocks.reshape(nb, bc, d))
    s = vals.shape[-1]
    return vals.reshape(-1, s), cols.reshape(-1, s), s_min.reshape(-1)


def main():
    phases = os.environ.get("EMOSAIC_SEG8_PHASES", "IBPF")
    if "I" in phases and jax.default_backend() == "cpu":
        # interpret mode does not execute through the remote TPU path
        check_interpret()
    if not set(phases) & set("BPF"):
        return
    B, D, G, CAP, BC = 16384, 3072, 32, 8, 128
    L = 200_000
    LP = -(-L // _TL_SEG) * _TL_SEG
    rng = np.random.default_rng(11)
    # clusterable data (the adaptive path's regime), same recipe class as
    # tools/tpu_r6_scale.py phase B
    centers = rng.integers(0, 256, size=(512, D))
    lib = np.clip(
        centers[rng.integers(0, 512, L)] + rng.normal(0, 12, (L, D)), 0, 255
    ).astype(np.uint8)
    blocks = np.clip(
        centers[rng.integers(0, 512, B)] + rng.normal(0, 12, (B, D)), 0, 255
    ).astype(np.uint8)
    lib_p = np.pad(lib, ((0, LP - L), (0, 0)))
    bf = jnp.asarray(blocks.reshape(-1))
    lf = jnp.asarray(lib_p.reshape(-1))
    log("probe ok — inputs resident")

    kw = dict(d=D, g=G, chan=True, bc=BC, cap=CAP, real_l=L)
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
        results[name] = (dt, out)
        return out

    if "B" in phases:
        run("baseline", lambda: _ad_coarse_jit(bf, lf, **kw))
    if "F" in phases:
        run("f32-keyed", lambda: _coarse_variant_jit(bf, lf, sel="f32", **kw))
    if "P" in phases:
        run("pallas-seg8", lambda: _coarse_variant_jit(bf, lf, sel="pallas", **kw))

    if "baseline" in results:
        bv = [np.asarray(x) for x in results["baseline"][1]]
        for name in ("f32-keyed", "pallas-seg8"):
            if name in results:
                vv = [np.asarray(x) for x in results[name][1]]
                eq = all(np.array_equal(a, b) for a, b in zip(bv, vv))
                log(f"{name} bit-equal to baseline: {eq}")
    log("DONE")


if __name__ == "__main__":
    main()
