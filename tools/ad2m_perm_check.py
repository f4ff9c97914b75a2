#!/usr/bin/env python3
"""Third-stage host test: was the segment-major permutation gather
misapplied at the 2M geometry?

`_ad_coarse_jit` scores segment s over STRIDED rows {k*nseg + s} via a
pre-gather `clf = cl[src_row]` (ops/distance.py:1400-1402).  The 2-bank
2M library is the first geometry where `cl` is a concatenate of two
projected banks; if XLA mis-fuses gather(concat(...)) there, a clean
candidate signature is that the stripe actually scored CONTIGUOUS rows
[s*128, (s+1)*128) per segment (i.e. the permutation was dropped) while
the col decode still claims k*nseg + s.

Prediction under "permutation dropped": for every query r and segment s,
the dumped (vals ascending) equal the 8 smallest of
c_r[s*128 : (s+1)*128], and the dumped col slots decode to k =
(col - s) / nseg = the offsets of those minima (ties by lowest offset).

Checks q0 fully (all 15625 segments) plus 3 more queries; also tests the
weaker membership claim (dumped vals ⊂ c_r values of the contiguous
segment) separately, to catch a partially-right variant.  Pure CPU off
the /tmp caches, ~1 min.
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
    print(f"[perm {time.time() - _T0:6.1f}s] {m}", flush=True)


def project(x_u8):
    r = x_u8.shape[0]
    return (
        x_u8.reshape(r, 32, 32, 3).astype(np.int32).sum(axis=2).reshape(r, 96)
    )


def main():
    z = np.load(DUMP)
    vals_t = z["vals"].reshape(NQ, NSEG, CAP)
    cols_t = z["cols"].reshape(NQ, NSEG, CAP)
    plib = np.load(PROJ_CACHE)
    pq = project(np.load(Q_CACHE)[:NQ])
    log("caches loaded")

    for r in (0, 1, 2, 100):
        c = np.abs(plib - pq[r][None]).sum(axis=1, dtype=np.int32)
        # contiguous-segment hypothesis: top-8 of c[s*128:(s+1)*128]
        Vc = c.reshape(NSEG, W)  # Vc[s, k] = c[s*128 + k]
        order = np.argsort(Vc, axis=1, kind="stable")[:, :CAP]  # [NSEG, CAP]
        pv = np.take_along_axis(Vc, order, axis=1)  # predicted vals
        pc = order.astype(np.int64) * NSEG + np.arange(NSEG)[:, None]
        gv = vals_t[r]
        gc = cols_t[r].astype(np.int64)
        v_eq = (pv == gv).all(axis=1)
        c_eq = (pc == gc).all(axis=1)
        both = v_eq & c_eq
        log(
            f"q{r}: contiguous-hypothesis vals exact {int(v_eq.sum())}/"
            f"{NSEG} segs, cols exact {int(c_eq.sum())}, both "
            f"{int(both.sum())}"
        )
        if not both.all():
            s = int(np.flatnonzero(~both)[0]) if (~both).any() else -1
            log(
                f"  q{r} first miss seg {s}: pred_vals={pv[s].tolist()} "
                f"dump_vals={gv[s].tolist()}"
            )
            # weaker: membership of dumped vals in the contiguous seg
            memb = np.isin(gv[s], Vc[s])
            log(f"  membership of dump vals in contiguous seg: "
                f"{memb.tolist()}")
            # and in the strided (true) segment
            true_seg = c[np.arange(W) * NSEG + s]
            log(f"  membership in strided seg: "
                f"{np.isin(gv[s], true_seg).tolist()}")
        if both.all():
            log(f"q{r}: CONTIGUOUS-SEGMENT HYPOTHESIS EXACT on all "
                f"{NSEG} segments")
    return 0


if __name__ == "__main__":
    sys.exit(main())
