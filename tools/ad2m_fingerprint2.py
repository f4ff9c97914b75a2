#!/usr/bin/env python3
"""Second-stage host fingerprinting of the 2M-row coarse corruption.

The overflow hypothesis (tools/ad2m_overflow_check.py) is refuted: the
chunked projection's i32 slice starts would either clamp (predicting a
25%-displacement signature that does NOT match the dump) or read as
unsigned (predicting NO corruption).  The corruption map says every
segment's kept values match no true segment's value-vector.  Remaining
hypotheses, each with a distinct host-checkable signature against the
TPU dump (/tmp/ad2m_state_tpu.npz):

  H-rowdisp   library rows displaced arbitrarily (bad gather at 2M):
              dumped vals still ⊂ the global multiset of true coarse
              values for that query (values true, rows wrong).
  H-qdisp     query displacement (bad block slicing): q_r's dumped vals
              equal the true vals of some other query q_s, bit for bit.
  H-arith     device arithmetic differs (projection rounding / corrupted
              query data): dumped vals ∉ any true value pool; check
              magnitude correlation with the true vals to see if it's
              small rounding or wholesale garbage.

Pure CPU off the /tmp caches; ~2 min.
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
    print(f"[fp2 {time.time() - _T0:6.1f}s] {m}", flush=True)


def project(x_u8):
    r = x_u8.shape[0]
    return (
        x_u8.reshape(r, 32, 32, 3).astype(np.int32).sum(axis=2).reshape(r, 96)
    )


def main():
    z = np.load(DUMP)
    vals_t = z["vals"].reshape(NQ, NSEG, CAP)
    plib = np.load(PROJ_CACHE)
    q = np.load(Q_CACHE)[:NQ]
    pq = project(q)
    log("caches loaded")

    # true coarse value vector per probe query
    def true_c(r):
        return np.abs(plib - pq[r][None]).sum(axis=1, dtype=np.int32)

    # --- H-rowdisp: dumped kept vals vs the global true value pool ---
    for r in (0, 1, 17):
        c = true_c(r)
        pool = np.sort(c)
        dv = np.sort(vals_t[r].reshape(-1))
        idx = np.searchsorted(pool, dv)
        idx = np.clip(idx, 0, LP - 1)
        inpool = (pool[idx] == dv) | (
            pool[np.clip(idx - 1, 0, LP - 1)] == dv
        )
        log(
            f"q{r}: {int(inpool.sum())}/{dv.size} dumped kept vals exist in "
            f"the true global value pool; dumped min={int(dv.min())} "
            f"true min={int(c.min())} true med={int(np.median(c))}"
        )
        # magnitude: per-segment min comparison
        tv = c.reshape(W, NSEG).min(axis=0)
        gv = vals_t[r].min(axis=1)
        diff = gv.astype(np.int64) - tv.astype(np.int64)
        log(
            f"q{r}: per-seg min diff (dumped-true): med={int(np.median(diff))}"
            f" p5={int(np.percentile(diff, 5))} p95="
            f"{int(np.percentile(diff, 95))} corr="
            f"{np.corrcoef(gv, tv)[0, 1]:.4f}"
        )

    # --- H-qdisp: does q0's dumped val-vector equal another query's truth?
    g0 = np.sort(vals_t[0].reshape(-1))[:64]  # smallest 64 kept vals
    log("scanning all 256 true queries for q0's dumped fingerprint ...")
    best = []
    for s in range(NQ):
        c = true_c(s)
        V = c.reshape(W, NSEG)
        seg_sorted = np.sort(V, axis=0)[:CAP]  # true kept vals per seg
        t0 = np.sort(seg_sorted.reshape(-1))[:64]
        nm = int((t0 == g0).sum())
        best.append((nm, s))
        if nm > 48:
            log(f"  candidate: true q{s} matches q0's dumped fingerprint "
                f"{nm}/64")
    best.sort(reverse=True)
    log(f"top fingerprint matches (n/64, query): {best[:5]}")

    # --- projected-query sanity: is pq itself what the device used? The
    # rescore was exact, so raw q is right on device; if coarse used a
    # WRONG query projection, the dumped s_min would track some other
    # query's scale. Print s_min vs true per-query min for context.
    smin_t = z["s_min"]
    log(f"s_min dumped [:8] = {smin_t[:8].tolist()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
