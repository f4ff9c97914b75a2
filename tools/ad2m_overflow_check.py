#!/usr/bin/env python3
"""Host-side root-cause test for the 2M-row adaptive false-certification.

Hypothesis: `_ad_coarse_jit.proj_bank` (ops/distance.py) computes the
per-chunk dynamic_slice start as `i * (n8 * d)` in **int32**.  At the 2M
geometry (bank0: n8*d = 131072*3072 = 402,653,184) the product exceeds
2^31-1 for i >= 6, wraps negative, and XLA's dynamic_slice clamps the
start into [0, size - slice] — so chunks 6 and 7 of every bank silently
re-project chunk 0's rows.  That is exactly the "whole-segment coarse
displacement" the on-chip diag isolated (tools/tpu_r26_ad2Mdiag.py) and
the corruption map measured (tools/out/ad2m_host_analysis.json: all
15625 segments wrong for all 256 queries — every segment has >= 1 row
in the displaced quarter of the library).

This script emulates the displaced projection on the host (caches from
tools/ad2m_host_analysis.py) and diffs the resulting per-segment
top-cap (vals AND cols) against the TPU-dumped stage state bit for bit.
Two clamp interpretations are tried:
  A) signed-wrap then clamp-to-0 (the XLA-semantics prediction)
  B) bit-pattern-as-unsigned then clamp-to-(size-slice)
A bit-exact match proves the root cause with no device time.

No device needed; runs in ~2 min off the /tmp caches.
"""

import sys
import time

import numpy as np

LP, D, CAP, NQ = 2_000_000, 3072, 8, 256
NSEG = LP // 128
W = 128
DUMP = "/tmp/ad2m_state_tpu.npz"
PROJ_CACHE = "/tmp/ad2m_proj.npy"
Q_CACHE = "/tmp/ad2m_queries.npy"
_T0 = time.time()


def log(m):
    print(f"[ovf {time.time() - _T0:6.1f}s] {m}", flush=True)


def project(x_u8):
    r = x_u8.shape[0]
    return (
        x_u8.reshape(r, 32, 32, 3).astype(np.int32).sum(axis=2).reshape(r, 96)
    )


def displaced_source_rows(mode):
    """Global source-row map under the i32-overflow hypothesis.

    Banks replicate ops/distance._lib_banks at lp=2M, d=3072:
    bank0 = 2^20 rows, bank1 = 951424 rows.  Each bank projects in 8
    chunks of n8 rows via dynamic_slice(start = i32(i * n8 * d)).
    """
    src = np.arange(LP, dtype=np.int64)
    off = 0
    for rows in (1 << 20, LP - (1 << 20)):
        n8 = rows // 8
        size = rows * D
        for i in range(8):
            start = (i * n8 * D) & 0xFFFFFFFF  # i32 wrap (two's complement)
            if start >= 1 << 31:
                start -= 1 << 32
            if mode == "A":  # signed clamp into [0, size - slice]
                start = min(max(start, 0), size - n8 * D)
            else:  # bit pattern read as unsigned, then clamp
                start = min(start % (1 << 32), size - n8 * D)
            src_row = start // D  # slice starts are row-aligned here
            dst = off + i * n8
            src[dst : dst + n8] = off + src_row + np.arange(n8)
        off += rows
    return src


def main():
    z = np.load(DUMP)
    vals_t = z["vals"].reshape(NQ, NSEG, CAP)
    cols_t = z["cols"].reshape(NQ, NSEG, CAP)
    plib = np.load(PROJ_CACHE)
    pq = project(np.load(Q_CACHE)[:NQ])
    log("caches loaded")

    for mode in ("A", "B"):
        src = displaced_source_rows(mode)
        n_disp = int((src != np.arange(LP)).sum())
        log(f"mode {mode}: {n_disp} displaced rows "
            f"({100.0 * n_disp / LP:.1f}%)")
        pd = plib[src]
        nq_match = 0
        for r in range(0, NQ, 1):
            c = np.abs(pd - pq[r][None]).sum(axis=1, dtype=np.int32)
            V = c.reshape(W, NSEG)
            order = np.argsort(V, axis=0, kind="stable")[:CAP]
            wv = np.take_along_axis(V, order, axis=0)  # [CAP, NSEG]
            wc = order.astype(np.int64) * NSEG + np.arange(NSEG)[None]
            gv = vals_t[r].T
            gc = cols_t[r].T.astype(np.int64)
            ok = bool((wv == gv).all() and (wc == gc).all())
            nq_match += ok
            if r < 4 or (not ok and r < 32):
                nb = int(((wv != gv) | (wc != gc)).any(axis=0).sum())
                log(f"  mode {mode} q{r}: exact={ok} wrong_segs={nb}")
            if r == 7 and nq_match == 0:
                log(f"  mode {mode}: 0/8 — abandoning this mode")
                break
        log(f"mode {mode}: {nq_match} queries bit-exact vs TPU dump")
        if nq_match == NQ:
            print(f"ROOT CAUSE CONFIRMED (mode {mode}): i32 overflow in "
                  f"proj_bank dynamic_slice start reproduces the TPU dump "
                  f"bit-for-bit on all {NQ} queries")
            return 0
        if nq_match > 0:
            print(f"PARTIAL match mode {mode}: {nq_match}/{NQ}")
    print("hypothesis NOT confirmed by either clamp mode")
    return 1


if __name__ == "__main__":
    sys.exit(main())
