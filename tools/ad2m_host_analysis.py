#!/usr/bin/env python3
"""Host-side (CPU, no device) corruption map for the 2M-row adaptive
false-certification (SCALE_r03 L2_ad2M / the round-4 on-chip diag).

The on-chip diag (tools/tpu_r26_ad2Mdiag.py) proved, before it
RESOURCE_EXHAUSTED, that for q0 the COARSE stage's kept survivors for
the brute row's segment are wholesale wrong — the stripe's kept list
shares zero rows with a direct on-device recompute of the same 128-row
segment, and the misses span all banks/chunks, i.e. whole-segment
displacement rather than per-row corruption.  S2 (the 125k-wide
two-key sort) is exonerated (bad=0 over 256 queries), and H4 proves
the banked DMA rescore fetch row-exact the same day.

jax.random is threefry — backend-deterministic — so this tool rebuilds
the IDENTICAL library + queries on the CPU backend, computes the exact
coarse projection + per-segment top-cap entirely in numpy (the device
matmul projection is exact: u8 operands exact in bf16, group sums
accumulate in f32 <= 8160), and diffs against the TPU-dumped stage
state (/tmp/ad2m_state_tpu.npz: vals/cols/s_min/dists/rows/ok).

Outputs, per query:
  - which of the 15625 segments the TPU coarse stage got wrong
    (vals or cols differ from the host ground truth)
  - for each wrong segment, which OTHER segment's true top-cap the
    stripe's values actually are (displacement fingerprinting)
  - certificate audit: host-true c_next = min(s_min_true,
    v_{m+1}_true) vs the dumped k-th rescored distance — flags every
    query whose certificate is unsound under correct coarse values
  - rescore spot audit: exact host L1 of the dumped top-1 row

Writes JSON to tools/out/ad2m_host_analysis.json and a progress log to
/tmp/ad2m_host.log. Pure CPU: safe to run during device outages and
beside device work. ~40 min dominated by the threefry library rebuild.

Reference context: the reference scores by RAM brute force and caps
libraries at 32 767 tiles (tileset.rs:178-183); this scorer's
certificate is what lets us beat that cap by 60x, so a lying coarse
stage is a correctness bug, not a tuning issue.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_T0 = time.time()
LP, N_CHUNKS, B, NQ = 2_000_000, 16, 4096, 256
D, G, CAP, K = 3072, 32, 8, 512
NSEG = LP // 128
W = LP // NSEG  # 128
M = 8192  # _ad_params(15625) -> (1024 * ceil(15625/2048), 8)
SEED = 400
DUMP = "/tmp/ad2m_state_tpu.npz"
OUT = "/root/repo/tools/out/ad2m_host_analysis.json"
LIB_CACHE = "/tmp/ad2m_lib.npy"
PROJ_CACHE = "/tmp/ad2m_proj.npy"
Q_CACHE = "/tmp/ad2m_queries.npy"


def log(msg):
    print(f"[host {time.time() - _T0:7.1f}s] {msg}", flush=True)


def build_library_np():
    """Bit-identical to tools/tpu_r18_envelope.build_library(2M, 16,
    seed=400): threefry randint via jax-CPU, assembly in numpy."""
    if os.path.exists(LIB_CACHE):
        log("library from cache")
        return np.load(LIB_CACHE, mmap_mode=None)
    lib = np.empty((LP, D), np.uint8)
    n = LP // N_CHUNKS
    nc = D // 3
    for c in range(N_CHUNKS):
        kc, km = jax.random.split(jax.random.PRNGKey(SEED + c))
        colors = np.asarray(
            jax.random.randint(kc, (n, 3), 0, 256, dtype=jnp.int32)
        )
        tex = np.asarray(
            jax.random.randint(km, (n, D), -10, 11, dtype=jnp.int32)
        )
        lib[c * n : (c + 1) * n] = np.clip(
            np.tile(colors, (1, nc)) + tex, 0, 255
        ).astype(np.uint8)
        log(f"chunk {c + 1}/{N_CHUNKS}")
    np.save(LIB_CACHE, lib)
    return lib


def project(x_u8):
    """Host replica of _ad_project(d=3072, g=32, chan=True): 96-elem
    blocks, channel-separated group sums (distance.py:1297-1324)."""
    r = x_u8.shape[0]
    return (
        x_u8.reshape(r, 32, 32, 3).astype(np.int32).sum(axis=2).reshape(r, 96)
    )


def main():
    z = np.load(DUMP)
    vals_t = z["vals"].reshape(NQ, NSEG, CAP)
    cols_t = z["cols"].reshape(NQ, NSEG, CAP)
    smin_t = z["s_min"]
    dists_t = z["dists"]
    rows_t = z["rows"]
    ok_t = z["ok"]
    log(f"dump loaded: certified {int(ok_t.sum())}/{NQ}")

    lib = build_library_np()
    log(f"library ready {lib.shape}")

    if os.path.exists(Q_CACHE):
        blocks = np.load(Q_CACHE)
    else:
        pick = np.asarray(
            jax.random.randint(
                jax.random.PRNGKey(51), (B,), 0, LP, dtype=jnp.int32
            )
        )
        bn = np.asarray(
            jax.random.randint(
                jax.random.PRNGKey(52), (B, D), -6, 7, dtype=jnp.int32
            )
        )
        blocks = np.clip(
            lib[pick].astype(np.int32) + bn, 0, 255
        ).astype(np.uint8)
        np.save(Q_CACHE, blocks)
    q = blocks[:NQ]
    log("queries ready")

    if os.path.exists(PROJ_CACHE):
        plib = np.load(PROJ_CACHE)
    else:
        plib = np.empty((LP, 96), np.int32)
        step = 250_000
        for lo in range(0, LP, step):
            plib[lo : lo + step] = project(lib[lo : lo + step])
        np.save(PROJ_CACHE, plib)
    pq = project(q)
    log("projections ready")

    # Host ground-truth per-segment top-cap for every query, diffed
    # against the TPU dump. V[k, s] = coarse(row k*NSEG + s); stable
    # argsort along k == (value, col) lexicographic (col = k*NSEG + s
    # is increasing in k for fixed s).
    report = {"queries": {}, "nq": NQ}
    wrong_seg_counts = []
    unsound = []
    # value-fingerprint index built lazily per query for displacement id
    for r in range(NQ):
        c = np.abs(plib - pq[r][None]).sum(axis=1, dtype=np.int32)  # [LP]
        V = c.reshape(W, NSEG)  # V[k, s]
        order = np.argsort(V, axis=0, kind="stable")[:CAP]  # [CAP, NSEG]
        want_vals = np.take_along_axis(V, order, axis=0)  # [CAP, NSEG]
        want_cols = order.astype(np.int64) * NSEG + np.arange(NSEG)[None]
        gv = vals_t[r].T  # [CAP, NSEG]
        gc = cols_t[r].T.astype(np.int64)
        bad = ((want_vals != gv) | (want_cols != gc)).any(axis=0)
        nbad = int(bad.sum())
        wrong_seg_counts.append(nbad)

        entry = {"wrong_segments": nbad}
        if nbad:
            segs = np.flatnonzero(bad)
            # displacement fingerprint: match each wrong segment's
            # STRIPE value-vector against the host truth of all segments
            fp = {}
            for s in segs[:64]:
                sv = tuple(gv[:, s].tolist())
                hits = np.flatnonzero(
                    (want_vals == np.array(sv)[:, None]).all(axis=0)
                )
                fp[int(s)] = hits.tolist()[:4]
            entry["sample_segments"] = segs[:64].tolist()
            entry["stripe_vals_match_true_segment"] = fp
            seg_lo, seg_hi = int(segs.min()), int(segs.max())
            entry["wrong_seg_range"] = [seg_lo, seg_hi]

        # certificate audit under host-true coarse values
        true_smin = int(want_vals[CAP - 1].min())
        flat = np.sort(want_vals.reshape(-1), kind="stable")
        true_cnext = int(min(true_smin, int(flat[M])))
        kth = int(dists_t[r, K - 1])
        cert_sound = (not bool(ok_t[r])) or true_cnext > kth
        if not cert_sound:
            unsound.append(r)
        entry.update(
            {
                "certified": bool(ok_t[r]),
                "true_c_next": true_cnext,
                "dumped_kth": kth,
                "cert_sound_under_true_coarse": cert_sound,
            }
        )

        # rescore spot audit: exact L1 of the dumped top-1 row
        top_row = int(rows_t[r, 0])
        exact = int(
            np.abs(
                lib[top_row].astype(np.int16) - q[r].astype(np.int16)
            ).sum(dtype=np.int64)
        )
        entry["top1_rescore_exact"] = exact == int(dists_t[r, 0])
        report["queries"][str(r)] = entry
        if nbad or not cert_sound or r < 4 or r % 32 == 0:
            log(
                f"q{r}: wrong_segs={nbad} "
                f"range={entry.get('wrong_seg_range')} "
                f"cert_sound={cert_sound} "
                f"rescore_ok={entry['top1_rescore_exact']}"
            )

    report["total_wrong_segments"] = int(np.sum(wrong_seg_counts))
    report["queries_with_wrong_segments"] = int(
        np.sum(np.array(wrong_seg_counts) > 0)
    )
    report["unsound_certificates"] = unsound
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    log(
        f"DONE: {report['queries_with_wrong_segments']}/{NQ} queries with "
        f"wrong segments ({report['total_wrong_segments']} total), "
        f"{len(unsound)} unsound certificates -> {OUT}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
