#!/usr/bin/env python3
"""Final host-side root-cause proof for the 2M-row adaptive
false-certification (SCALE_r03 L2_ad2M).

Model: on TPU (libtpu 0.0.34), the old `_ad_coarse_jit` projection —
`lax.map(lambda i: _ad_project(dynamic_slice(bank, i * chunk)))` over 8
chunk indices, one scan per bank, two banks concatenated — returned the
LAST iteration's projection in every output slot.  Equivalently the
projected library the stripe saw was

    cl[row] = proj(lib[bank_base(row) + 7 * n8(row) + (row_in_bank % n8)])

i.e. every chunk of every bank aliased to that bank's chunk 7 at the
same in-chunk offset.  This script replays that model entirely on the
host (caches built by tools/ad2m_host_analysis.py) and compares the
resulting per-segment top-cap (vals AND cols, ties included) against
the TPU-dumped stage state for all 256 drilled queries.

Result on the 2026-08-19 dump: 256/256 queries bit-exact -> the scan
output aliasing is THE root cause; gather, two-key sort (S2), rescore
(H4), and certificate arithmetic are all exonerated.  Fix: static
slices + an optimization_barrier chain in `_ad_proj_bank_jit`
(ops/distance.py); on-chip re-proof in tools/tpu_r27_coarsefix.py;
hazard H5 in tools/tpu_hazards.py keeps the reproducer.

Discovery chain: tools/tpu_r26_ad2Mdiag.py (on-chip stage isolation) ->
tools/ad2m_host_analysis.py (full corruption map) ->
tools/ad2m_overflow_check.py (i32-start hypothesis REFUTED) ->
tools/ad2m_perm_check.py (dropped-permutation hypothesis REFUTED) ->
tools/ad2m_colmap.py (chunk histogram + delta fingerprints: chunks 0-6
bad, chunk 7 good, deltas = (7 - chunk) * n8) -> this model.
"""

import sys
import time

import numpy as np

LP, CAP, NQ = 2_000_000, 8, 256
NSEG = LP // 128
W = 128
BANK0 = 1 << 20
DUMP = "/tmp/ad2m_state_tpu.npz"
PROJ_CACHE = "/tmp/ad2m_proj.npy"
Q_CACHE = "/tmp/ad2m_queries.npy"
_T0 = time.time()


def log(m):
    print(f"[alias {time.time() - _T0:6.1f}s] {m}", flush=True)


def main():
    z = np.load(DUMP)
    vals_t = z["vals"].reshape(NQ, NSEG, CAP)
    cols_t = z["cols"].reshape(NQ, NSEG, CAP)
    plib = np.load(PROJ_CACHE)
    q = np.load(Q_CACHE)[:NQ]
    pq = (
        q.reshape(NQ, 32, 32, 3).astype(np.int32).sum(axis=2).reshape(NQ, 96)
    )
    log("caches loaded")

    row = np.arange(LP, dtype=np.int64)
    inb = np.where(row < BANK0, row, row - BANK0)
    n8 = np.where(row < BANK0, 131072, 118928)
    base = np.where(row < BANK0, 0, BANK0)
    src = base + 7 * n8 + inb % n8
    log(f"model displaces {int((src != row).sum())}/{LP} rows (7/8)")
    pd = plib[src]

    n_ok = 0
    for r in range(NQ):
        c = np.abs(pd - pq[r][None]).sum(axis=1, dtype=np.int32)
        V = c.reshape(W, NSEG)
        order = np.argsort(V, axis=0, kind="stable")[:CAP]
        wv = np.take_along_axis(V, order, axis=0)
        wc = order.astype(np.int64) * NSEG + np.arange(NSEG)[None]
        ok = bool(
            (wv == vals_t[r].T).all()
            and (wc == cols_t[r].T.astype(np.int64)).all()
        )
        n_ok += ok
        if not ok:
            log(f"q{r}: MISMATCH under the aliasing model")
    log(f"{n_ok}/{NQ} queries bit-exact under the last-iteration-aliasing "
        "model")
    if n_ok == NQ:
        print("ROOT CAUSE CONFIRMED: scan output aliasing (all chunks = "
              "chunk 7) reproduces the TPU coarse dump bit-for-bit on all "
              f"{NQ} queries")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
