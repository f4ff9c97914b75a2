#!/usr/bin/env python3
"""Fourth-stage host test: per-(val, col) consistency map of the 2M
coarse dump.

The perm check showed each segment's kept list is a MIX of true
segment values and foreign values — per-row-range corruption of the
projected library `cl`, not whole-segment displacement.  This tool
classifies every kept (val, col) pair of a query as
  consistent:  val == c_true[col]
  displaced:   val == c_true[r'] for some other row r' (value
               fingerprint; reports the col -> r' map structure)
  foreign:     val matches no true coarse value at all
and histograms inconsistent cols by row ranges:
  - bank (col < 2^20 vs >=)
  - projection chunk within bank (8 chunks of n8 rows)
  - position within segment (k = col // nseg)
A sharp boundary in any of those axes names the corrupted op.

Pure CPU off the /tmp caches, ~2 min for 3 queries.
"""

import sys
import time

import numpy as np

LP, D, CAP, NQ = 2_000_000, 3072, 8, 256
NSEG = LP // 128
W = 128
BANK0 = 1 << 20
DUMP = "/tmp/ad2m_state_tpu.npz"
PROJ_CACHE = "/tmp/ad2m_proj.npy"
Q_CACHE = "/tmp/ad2m_queries.npy"
_T0 = time.time()


def log(m):
    print(f"[cmap {time.time() - _T0:6.1f}s] {m}", flush=True)


def project(x_u8):
    r = x_u8.shape[0]
    return (
        x_u8.reshape(r, 32, 32, 3).astype(np.int32).sum(axis=2).reshape(r, 96)
    )


def main():
    z = np.load(DUMP)
    vals_t = z["vals"].reshape(NQ, NSEG * CAP)
    cols_t = z["cols"].reshape(NQ, NSEG * CAP)
    plib = np.load(PROJ_CACHE)
    pq = project(np.load(Q_CACHE)[:NQ])
    log("caches loaded")

    for r in (0, 1, 2):
        c = np.abs(plib - pq[r][None]).sum(axis=1, dtype=np.int32)
        cols = cols_t[r].astype(np.int64)
        vals = vals_t[r]
        consistent = vals == c[cols]
        nbad = int((~consistent).sum())
        log(f"q{r}: {int(consistent.sum())}/{vals.size} kept pairs "
            f"consistent (val == c_true[col]); {nbad} inconsistent")

        bad_cols = cols[~consistent]
        bad_vals = vals[~consistent]
        # axis histograms of the inconsistent cols
        b0 = int((bad_cols < BANK0).sum())
        log(f"  bank split: bank0={b0} bank1={bad_cols.size - b0} "
            f"(kept-total bank0={int((cols < BANK0).sum())})")
        kpos = bad_cols // NSEG
        hist_k, _ = np.histogram(kpos, bins=16, range=(0, W))
        log(f"  k=col//nseg 16-bin hist: {hist_k.tolist()}")
        # chunk within bank: bank0 n8=131072, bank1 n8=118928
        inb = np.where(bad_cols < BANK0, bad_cols, bad_cols - BANK0)
        n8 = np.where(bad_cols < BANK0, 131072, 118928)
        chunk = inb // n8
        hist_c = np.bincount(chunk, minlength=8)
        # all-kept baseline
        inb_a = np.where(cols < BANK0, cols, cols - BANK0)
        n8_a = np.where(cols < BANK0, 131072, 118928)
        hist_a = np.bincount(inb_a // n8_a, minlength=8)
        log(f"  chunk hist (bad):  {hist_c.tolist()}")
        log(f"  chunk hist (all):  {hist_a.tolist()}")

        # value fingerprint for a sample of inconsistent pairs: which
        # true row holds this value?
        order = np.argsort(c, kind="stable")
        cs = c[order]
        sample = np.linspace(0, bad_cols.size - 1, 24).astype(np.int64)
        deltas = []
        for i in sample:
            v, col = int(bad_vals[i]), int(bad_cols[i])
            lo = np.searchsorted(cs, v, "left")
            hi = np.searchsorted(cs, v, "right")
            rows = order[lo:hi]
            if rows.size == 0:
                log(f"  pair(col={col}, val={v}): FOREIGN (no true row)")
                continue
            # prefer a unique source; else report count
            if rows.size <= 4:
                ds = [int(rr) - col for rr in rows]
                deltas.extend(ds)
                log(f"  pair(col={col}, val={v}): true rows {rows.tolist()}"
                    f" deltas {ds}")
            else:
                log(f"  pair(col={col}, val={v}): {rows.size} candidate "
                    f"rows (ambiguous)")
        if deltas:
            u, cnt = np.unique(deltas, return_counts=True)
            top = sorted(zip(cnt.tolist(), u.tolist()), reverse=True)[:8]
            log(f"  delta histogram (count, delta): {top}")
        if r == 0:
            np.save("/tmp/ad2m_c_q0.npy", c)
    return 0


if __name__ == "__main__":
    sys.exit(main())
