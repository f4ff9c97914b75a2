#!/usr/bin/env python3
"""Stage-isolating diagnostic for the 2M-row adaptive false-certification
(SCALE_r03 L2_ad2M: certified rows whose top-1 distance != brute top-1).

Round 3 blamed the Pallas DMA 4 GiB offset wrap and banked the library —
but the round-4 post-outage re-run STILL fails through the banked path,
while the hazards H4 check proves the banked `_l1_rows_dma` fetch is
row-exact at 1.57M rows / 2 banks (mc=128) on the same day. So the bug
is elsewhere in the adaptive pipeline, somewhere that only manifests at
the 2M geometry (nseg=15625, m=8192, cap=8, survivors 125k wide).

This tool rebuilds the exact fixproof workload (same seeds) and, for the
first few query rows, isolates which stage lies:

  S1 coarse    direct |proj(q)-proj(row)| of the brute argmin row vs the
               survivor lists + the lower-bound property itself
  S2 select    the 125k-wide two-key lax.sort on device vs numpy lexsort
               (a wrong device sort skews BOTH cand and c_next)
  S3 rescore   production-mc `_l1_rows_dma` distances for the full
               candidate list vs the exact XLA banked gather
  S4 certify   c_next vs the brute top-1 and k-th distances

Each stage prints a verdict line; JSON ledger appended to SCALE_r03.json
as `L3_ad2M_diag`. ONE device process, 45-min watchdog, device-generated
data only (no tunnel uploads). --cpu-check runs a tiny-geometry smoke of
the same code paths (gather route) for CI.

Reference context: the reference brute-forces scoring in RAM and caps
libraries at 32,767 tiles (tileset.rs:178-183); this scorer exists to
beat that cap by 60x, so its certificate must be trustworthy at 2M rows.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

CPU_CHECK = "--cpu-check" in sys.argv or "--cpu-selfcheck" in sys.argv
#: full 2M geometry forced onto the CPU backend (host-RAM scale, hours on
#: one core): discriminates algorithm-vs-TPU-primitive — if the false
#: certification reproduces here it is algorithmic; if CPU is exact at
#: the identical geometry the lie is in a TPU lowering of one stage.
CPU_FULL = "--cpu-full" in sys.argv
if CPU_CHECK or CPU_FULL:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from emosaic_tpu.ops import distance  # noqa: E402
from emosaic_tpu.ops.distance import (  # noqa: E402
    _ad_coarse_jit,
    _ad_params,
    _ad_project,
    _ad_rescore_jit,
    _l1_rows_dma,
    _rows_dma_mc,
)

import tpu_r18_envelope as r18  # noqa: E402

_T0 = time.time()
OUT = "/root/repo/SCALE_r03.json"


def log(msg):
    print(f"[diag {time.time() - _T0:6.1f}s] {msg}", flush=True)


def sync(x):
    jax.device_get(x.ravel()[0])


def main():
    def watchdog():
        time.sleep(2700 if not CPU_FULL else 6 * 3600)
        log("watchdog fired; exiting with partial results")
        os._exit(2)

    threading.Thread(target=watchdog, daemon=True).start()
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    sync(jnp.ones((8, 128)) * 2)
    log("probe ok")

    if CPU_CHECK:
        lp, n_chunks, b, n_drill = 4096, 4, 256, 2
        d, g, bc, k = 96, 4, 128, 16
    else:
        lp, n_chunks, b, n_drill = 2_000_000, 16, 4096, 4
        d, g, bc, k = r18.D, r18.G, r18.BC, r18.K
    use_dma = dev.platform == "tpu" and d % 128 == 0
    nseg = lp // 128
    m, cap = _ad_params(nseg)
    if CPU_CHECK:
        m = min(m, nseg * cap // 2)

    r18.D = d  # CPU check shrinks the shared builder's width
    banks = r18.build_library(lp, n_chunks, seed=400)
    rb = banks[0].shape[0]
    lf = tuple(bk.reshape(-1) for bk in banks)

    pick = jax.random.randint(
        jax.random.PRNGKey(51), (b,), 0, lp, dtype=jnp.int32
    )
    bn = jax.random.randint(
        jax.random.PRNGKey(52), (b, d), -6, 7, dtype=jnp.int32
    )
    blocks = jnp.clip(
        r18.gather_rows(banks, pick).astype(jnp.int32) + bn, 0, 255
    ).astype(jnp.uint8)
    sync(blocks)
    nq = max(bc, 2 * bc) if not CPU_CHECK else b  # queries drilled: 256
    q = blocks[:nq]
    log(f"inputs ready (lp={lp} nseg={nseg} m={m} cap={cap} nq={nq})")

    # --- production run on the drill slice -------------------------------
    vals, cols, s_min = _ad_coarse_jit(
        q.reshape(-1), lf, d=d, g=g, chan=True, bc=bc, cap=cap, real_l=lp
    )
    dists, rows, ok = _ad_rescore_jit(
        q.reshape(-1), vals, cols, s_min, lf,
        d=d, bc=r18.BC2 if not CPU_CHECK else 64, m=m, k=k, real_l=lp,
        use_dma=use_dma,
    )
    vals_h = np.asarray(jax.device_get(vals))
    cols_h = np.asarray(jax.device_get(cols))
    smin_h = np.asarray(jax.device_get(s_min))
    d_h = np.asarray(jax.device_get(dists))
    r_h = np.asarray(jax.device_get(rows))
    ok_h = np.asarray(jax.device_get(ok))
    log(f"adaptive done: certified {int(ok_h.sum())}/{nq}")
    if not CPU_CHECK:
        # jax.random (threefry) is backend-deterministic, so the CPU-full
        # and TPU runs score IDENTICAL data: dumping the per-stage state
        # lets a host diff pinpoint the first backend divergence exactly.
        dump = f"/tmp/ad2m_state_{dev.platform}.npz"
        np.savez_compressed(
            dump, vals=vals_h, cols=cols_h, s_min=smin_h,
            dists=d_h, rows=r_h, ok=ok_h,
        )
        log(f"stage state dumped to {dump}")

    # --- brute top-1 (distance AND row) per drilled query ---------------
    step = min(50_000, rb)
    drill = list(range(n_drill))
    brute = {}
    for r in drill:
        x = blocks[int(r)][None]
        best_d, best_r = None, None
        for lo in range(0, lp, step):
            hi = min(lo + step, lp)
            t = lo // rb
            sl_ = banks[t][lo - t * rb : hi - t * rb]
            if sl_.shape[0] < hi - lo:
                t2 = (t + 1) * rb
                sl_ = jnp.concatenate([sl_, banks[t + 1][: hi - t2]])
            dsub = jnp.abs(
                sl_.astype(jnp.int16) - x.astype(jnp.int16)
            ).sum(1, dtype=jnp.int32)
            cd = int(jax.device_get(dsub.min()))
            ci = lo + int(jax.device_get(jnp.argmin(dsub)))
            if best_d is None or (cd, ci) < (best_d, best_r):
                best_d, best_r = cd, ci
        brute[r] = (best_d, best_r)
        log(
            f"q{r}: brute=(d={best_d}, row={best_r}) "
            f"adaptive=(d={int(d_h[r, 0])}, row={int(r_h[r, 0])}) "
            f"certified={bool(ok_h[r])}"
        )

    # --- S2: device two-key sort vs numpy lexsort on the survivor row ---
    sort1 = jax.jit(
        lambda v, c: jax.lax.sort((v, c), dimension=0, num_keys=2)
    )
    s2_bad = 0
    for r in drill:
        sv_d, sc_d = (
            np.asarray(jax.device_get(a))
            for a in sort1(jnp.asarray(vals_h[r]), jnp.asarray(cols_h[r]))
        )
        order = np.lexsort((cols_h[r], vals_h[r]))
        sv_n, sc_n = vals_h[r][order], cols_h[r][order]
        if not ((sv_d == sv_n).all() and (sc_d == sc_n).all()):
            s2_bad += 1
            first = int(np.flatnonzero((sv_d != sv_n) | (sc_d != sc_n))[0])
            log(
                f"q{r}: S2 DEVICE SORT MISMATCH at pos {first}: "
                f"dev=({sv_d[first]},{sc_d[first]}) "
                f"np=({sv_n[first]},{sc_n[first]})"
            )
    log(f"S2 device 2-key sort over {vals_h.shape[-1]} wide: bad={s2_bad}")

    # --- host-replicated select: cand + c_next --------------------------
    verdicts = {}
    mc = _rows_dma_mc(m, d)
    for r in drill:
        order = np.lexsort((cols_h[r], vals_h[r]))
        cand_h = cols_h[r][order[:m]].astype(np.int64)
        c_next = int(min(smin_h[r], vals_h[r][order[m]]))
        b_d, b_r = brute[r]
        a_d, a_r = int(d_h[r, 0]), int(r_h[r, 0])
        x = blocks[int(r)][None]

        # S1: coarse lower bound of the brute argmin row
        row_t = r18.gather_rows(banks, jnp.asarray([b_r], jnp.int32))
        pq = _ad_project(x, d, g, True)
        pr = _ad_project(row_t, d, g, True)
        coarse_b = int(
            jax.device_get(
                jnp.abs(pq.astype(jnp.int32) - pr.astype(jnp.int32)).sum()
            )
        )
        lower_ok = coarse_b <= b_d
        in_surv = bool(np.isin(b_r, cols_h[r]))
        in_cand = bool(np.isin(b_r, cand_h))

        # S1b: recompute the brute row's WHOLE segment directly (the 128
        # rows {seg + t*nseg}) and compare the cap smallest against the
        # survivor lists — splits a survivor-stage lie into "stripe saw
        # wrong values" (gather/projection) vs "top_k kept wrong rows".
        seg = b_r % nseg
        w = lp // nseg
        seg_rows = seg + nseg * np.arange(w, dtype=np.int64)
        seg_t = r18.gather_rows(banks, jnp.asarray(seg_rows, jnp.int32))
        ps = _ad_project(seg_t, d, g, True)
        seg_coarse = np.asarray(
            jax.device_get(
                jnp.abs(
                    pq.astype(jnp.int32) - ps.astype(jnp.int32)
                ).sum(-1)
            )
        ).reshape(-1)
        order_seg = np.lexsort((seg_rows, seg_coarse))[: cap]
        want_vals = seg_coarse[order_seg]
        want_cols = seg_rows[order_seg]
        got_vals = vals_h[r].reshape(nseg, cap)[seg]
        got_cols = cols_h[r].reshape(nseg, cap)[seg]
        seg_match = bool(
            (want_vals == got_vals).all() and (want_cols == got_cols).all()
        )
        if not seg_match:
            log(
                f"q{r}: S1b SEGMENT {seg} survivor mismatch: "
                f"direct=({want_vals.tolist()},{want_cols.tolist()}) "
                f"stripe=({got_vals.tolist()},{got_cols.tolist()})"
            )

        # S3: direct exact distance of the adaptive's claimed top-1 row
        arow_t = r18.gather_rows(banks, jnp.asarray([a_r], jnp.int32))
        direct_a = int(
            jax.device_get(
                jnp.abs(
                    x.astype(jnp.int16) - arow_t.astype(jnp.int16)
                ).sum(dtype=jnp.int32)
            )
        )

        # S3 full: production-mc DMA distances vs exact XLA gather for the
        # whole candidate list of this query
        if use_dma:
            cand_dev = jnp.asarray(cand_h.astype(np.int32))[None]
            dma_d = np.asarray(
                jax.device_get(
                    _l1_rows_dma(
                        x, cand_dev, tuple(bk.reshape(-1, d) for bk in banks),
                        mc=mc,
                    )
                )
            )[0]
            # exact gather distances in chunks of 512 rows
            ex_d = np.empty(m, np.int32)
            for c0 in range(0, m, 512):
                cc = jnp.asarray(cand_h[c0 : c0 + 512].astype(np.int32))
                tr = r18.gather_rows(banks, cc)
                ex_d[c0 : c0 + 512] = np.asarray(
                    jax.device_get(
                        jnp.abs(
                            x.astype(jnp.int16) - tr.astype(jnp.int16)
                        ).sum(1, dtype=jnp.int32)
                    )
                )
            dma_bad = int((dma_d != ex_d).sum())
            if dma_bad:
                i0 = int(np.flatnonzero(dma_d != ex_d)[0])
                log(
                    f"q{r}: S3 DMA MISMATCH {dma_bad}/{m} rows (mc={mc}); "
                    f"first at cand[{i0}]=row {cand_h[i0]} "
                    f"(bank {cand_h[i0] // rb}): dma={dma_d[i0]} "
                    f"exact={ex_d[i0]}"
                )
        else:
            dma_bad = 0

        verdicts[str(r)] = {
            "brute": [b_d, b_r],
            "adaptive": [a_d, a_r],
            "certified": bool(ok_h[r]),
            "agree": a_d == b_d,
            "claimed_row_direct_dist": direct_a,
            "rescore_dist_exact_for_claimed": direct_a == a_d,
            "coarse_of_brute_row": coarse_b,
            "coarse_is_lower_bound": lower_ok,
            "c_next": c_next,
            "brute_row_in_survivors": in_surv,
            "brute_row_in_candidates": in_cand,
            "segment_survivors_match_direct": seg_match,
            "cert_consistent": (not bool(ok_h[r])) or c_next > int(d_h[r, k - 1]),
            "dma_vs_gather_mismatches": dma_bad,
        }
        log(
            f"q{r}: S1 coarse(brute_row)={coarse_b} lower_ok={lower_ok} "
            f"in_surv={in_surv} in_cand={in_cand} | S3 direct(a_row)="
            f"{direct_a} rescore_ok={direct_a == a_d} dma_bad={dma_bad} | "
            f"S4 c_next={c_next} kth={int(d_h[r, k - 1])}"
        )

    entry = {
        "nq": int(nq),
        "certified": int(ok_h.sum()),
        "s2_sort_bad": s2_bad,
        "mc": int(mc),
        "queries": verdicts,
        "platform": dev.platform,
    }
    try:
        with open(OUT) as f:
            results = json.load(f)
    except (OSError, ValueError):
        results = {}
    key = "L3_ad2M_diag_cpufull" if CPU_FULL else "L3_ad2M_diag"
    results[key] = entry
    if not CPU_CHECK:
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    log(f"ledger {'skipped (cpu-check)' if CPU_CHECK else 'written'}")
    bad = [
        r
        for r, v in verdicts.items()
        if v["certified"] and not v["agree"]
    ]
    log(f"false-certified drilled queries: {bad or 'none'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
