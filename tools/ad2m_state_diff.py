#!/usr/bin/env python3
"""Diff the per-stage adaptive-scorer state dumped by
tools/tpu_r26_ad2Mdiag.py on two backends (same threefry data, so any
divergence is a backend lie, localized to the FIRST diverging stage):

  vals/cols/s_min  coarse survivor lists   (stage 1: projection+stripe+top_k)
  dists/rows/ok    rescore + certificate   (stages 2-4)

usage: ad2m_state_diff.py [/tmp/ad2m_state_tpu.npz /tmp/ad2m_state_cpu.npz]

Host-only — touches no device. Prints one verdict line per array and,
for diverging arrays, the first few (query, position) sites.
"""

import sys

import numpy as np


def main(argv):
    if len(argv) == 2:
        print(f"usage: {argv[0]} [A.npz B.npz]  (both paths or neither)")
        return 2
    a_path = argv[1] if len(argv) > 1 else "/tmp/ad2m_state_tpu.npz"
    b_path = argv[2] if len(argv) > 2 else "/tmp/ad2m_state_cpu.npz"
    a, b = np.load(a_path), np.load(b_path)
    names_a, names_b = set(a.files), set(b.files)
    if names_a != names_b:
        print(f"key mismatch: {sorted(names_a ^ names_b)}")
        return 2
    rc = 0
    for k in ("vals", "cols", "s_min", "dists", "rows", "ok"):
        x, y = a[k], b[k]
        if x.shape != y.shape:
            print(f"{k}: SHAPE {x.shape} vs {y.shape}")
            rc = 1
            continue
        neq = x != y
        n = int(neq.sum())
        if n == 0:
            print(f"{k}: identical ({x.shape})")
            continue
        rc = 1
        sites = np.argwhere(neq)[:5]
        detail = ", ".join(
            f"[{','.join(map(str, s))}]: {x[tuple(s)]} vs {y[tuple(s)]}"
            for s in sites
        )
        nq_bad = (
            int(neq.any(axis=tuple(range(1, x.ndim))).sum())
            if x.ndim > 1
            else n
        )
        print(f"{k}: {n} mismatches across {nq_bad} queries — first: {detail}")
    if rc == 0:
        print("backends agree at every dumped stage")
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv))
