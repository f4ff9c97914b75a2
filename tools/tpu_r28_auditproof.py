#!/usr/bin/env python3
"""Audited beyond-HBM envelope re-certification (VERDICT r4 #6).

The round-4 streamproof (tools/tpu_r23_streamproof.py, SCALE_r03
N_stream6p8G) predates the production certificate self-audit
(ops/distance._ad_audit, committed round 5): its exactness evidence was
host-brute spot rows only. This tool re-runs the beyond-HBM streamed
scorer WITH the audit active and *recorded*, at two points:

  P1_6p8G   lp = 2,228,224 rows x 3072 B = 6.84 GB (> the 6.2 GB device
            budget), serial streaming (EMOSAIC_STREAM_PREFETCH=0 — the
            r23-proven 2^20-row bank compile shapes).
  P2_8p5G   lp = 2,752,512 rows x 3072 B = 8.46 GB — a NEW >8 GB
            host-bank point — through the PRODUCTION DEFAULT path
            (prefetch on: two banks resident, auto-halved bank rows).

Every per-bank l1_topk_adaptive call above _AUDIT_MIN_ROWS (2^19 rows)
fires the production audit: 32 sampled blocks re-scored end-to-end
through the independent banked stripe oracle (no projection, no DMA
shortlist) and compared bit-for-bit. Tail banks below the threshold
skip the audit BY DESIGN (distance._audit_would_run) and are ledgered
as `audit_skipped_bank_rows`, never counted as passes — their merge
contribution is still verified by the host-brute FULL top-k spot rows.
A spy wrapper around distance._ad_audit records every invocation,
whether it ran, and whether the sample matched (pass = ran AND the
audit returned the inputs unchanged; a detected lie returns a fresh
oracle re-score). The ledger entries therefore carry
`audit_runs`/`audit_calls`/`audit_ok` — independent exactness evidence
end-to-end, on top of the host-brute FULL top-k spot rows.

Reference bar: the brute scorer that is never wrong
(/root/reference/src/mosaic/rendering.rs:307-321) at <= 32,767 tiles
(tileset.rs:178-183); these runs hold the same bar at 84x that cap.

ONE device process (CLAUDE.md rule 4); self-bounded watchdog (rule 2).
--cpu-check runs a tiny-geometry smoke (banks forced small, audit
threshold lowered) for CI. Ledger keys: N_stream6p8G_audit,
N_stream8p5G_audit in SCALE_r03.json.
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CPU_CHECK = "--cpu-check" in sys.argv or "--cpu-selfcheck" in sys.argv
if CPU_CHECK:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from emosaic_tpu.ops import distance  # noqa: E402

_T0 = time.time()
OUT = (
    "/tmp/r28_cpu_check.json" if CPU_CHECK else "/root/repo/SCALE_r03.json"
)
D, K, B = 3072, 512, 2048
LP1 = 2_228_224  # x 3072 B = 6.845 GB  (the r23 geometry)
LP2 = 2_752_512  # x 3072 B = 8.456 GB  (> 8 GB host-bank point)
SPOT_ROWS = 3

if CPU_CHECK:
    D, K, B = 96, 16, 256
    LP1, LP2 = 65536, 98304
    # stream banks forced to 32768 rows serial / 16384 prefetch-halved —
    # the smallest banks the adaptive gate accepts (m+1 <= nseg*cap with
    # the production _AD_M=1024 needs nseg >= 65); audit fires per bank
    distance._DEVICE_LIB_BYTES_MAX = 32768 * D
    os.environ.setdefault("EMOSAIC_AUDIT_ROWS", "16384")


def log(msg):
    print(f"[r28 {time.time() - _T0:6.1f}s] {msg}", flush=True)


AUDIT_CALLS: list = []
_orig_audit = distance._ad_audit


def _audit_spy(out_d, out_r, blocks, banks, l, d, kk, *, label):
    ran = distance._audit_would_run(l, int(blocks.shape[0]), kk)
    rd, rr = _orig_audit(out_d, out_r, blocks, banks, l, d, kk, label=label)
    # pass = RAN and returned unchanged (a detected lie re-scores into
    # fresh arrays). A below-_AUDIT_MIN_ROWS skip also returns the
    # inputs unchanged, so it must be recorded as ran=False — never
    # counted as a passed audit (a skip ledgered as a pass overstates
    # coverage).
    AUDIT_CALLS.append(
        {
            "l": int(l),
            "b": int(blocks.shape[0]),
            "ran": bool(ran),
            "passed": bool(ran) and rd is out_d,
        }
    )
    return rd, rr


distance._ad_audit = _audit_spy
# l1_topk_adaptive resolves _ad_audit at call time from module globals,
# so the spy sees every production audit; assert that stays true
assert distance.l1_topk_adaptive.__globals__ is distance.__dict__


def build_host_library(lp: int, seed: int) -> np.ndarray:
    """Clusterable u8 library on the HOST (per-tile base color + ±10
    texture — the scale-phase model), chunked int32 transients."""
    rng = np.random.default_rng(seed)
    lib = np.empty((lp, D), np.uint8)
    nc = D // 3
    step = 65536
    for lo in range(0, lp, step):
        n = min(step, lp - lo)
        colors = rng.integers(0, 256, size=(n, 3), dtype=np.int32)
        tex = rng.integers(-10, 11, size=(n, D), dtype=np.int32)
        np.clip(np.tile(colors, (1, nc)) + tex, 0, 255, out=tex)
        lib[lo : lo + n] = tex.astype(np.uint8)
    return lib


def host_topk(x: np.ndarray, lib: np.ndarray, k: int):
    """Exact host-brute top-k under the production (distance,
    lowest-row) key — the only oracle that sees the library whole."""
    l = lib.shape[0]
    d = np.empty(l, np.int64)
    step = 100_000
    xi = x.astype(np.int16)
    for lo in range(0, l, step):
        d[lo : lo + step] = np.abs(
            lib[lo : lo + step].astype(np.int16) - xi
        ).sum(1, dtype=np.int32)
    key = d * (l + 1) + np.arange(l, dtype=np.int64)
    idx = np.argpartition(key, k - 1)[:k]
    idx = idx[np.argsort(key[idx])]
    return d[idx].astype(np.int32), idx.astype(np.int32)


def run_point(tag: str, lp: int, seed: int, prefetch: bool) -> dict:
    os.environ["EMOSAIC_STREAM_PREFETCH"] = "1" if prefetch else "0"
    AUDIT_CALLS.clear()
    lib = build_host_library(lp, seed)
    log(f"{tag}: host library [{lp}, {D}] = {lib.nbytes / 1e9:.2f} GB ready")
    rng = np.random.default_rng(seed + 1)
    pick = rng.integers(0, lp, size=B)
    blocks = np.clip(
        lib[pick].astype(np.int16) + rng.integers(-6, 7, size=(B, D)),
        0,
        255,
    ).astype(np.uint8)
    assert lib.nbytes > distance._DEVICE_LIB_BYTES_MAX  # must stream
    t0 = time.perf_counter()
    out_d, out_r = distance.l1_topk_adaptive(blocks, lib, K)
    wall_s = time.perf_counter() - t0
    audits = list(AUDIT_CALLS)
    ran = [a for a in audits if a["ran"]]
    skipped = [a["l"] for a in audits if not a["ran"]]
    audit_ok = bool(ran) and all(a["passed"] for a in ran)
    log(
        f"{tag}: streamed scoring wall {wall_s:.1f}s; audits "
        f"{len(ran)}/{len(audits)} calls ran (ok={audit_ok}) over banks "
        f"{[a['l'] for a in ran]}; skipped sub-threshold banks {skipped}"
    )
    spot = rng.integers(0, B, size=SPOT_ROWS)
    spot_ok = True
    for r in spot:
        hd, hr = host_topk(blocks[int(r)], lib, K)
        row_ok = bool((hd == out_d[r]).all() and (hr == out_r[r]).all())
        spot_ok &= row_ok
        log(f"{tag}: host-brute FULL top-{K} row {int(r)}: {row_ok}")
    uniq = all(
        np.unique(out_r[i]).size == K for i in range(0, B, max(1, B // 7))
    )
    return {
        "B": B, "L": lp, "D": D, "k": K,
        "lib_gb": round(lp * D / 1e9, 2),
        "prefetch": prefetch,
        "wall_s": round(wall_s, 2),
        "audit_runs": len(ran),
        "audit_calls": len(audits),
        "audit_rows_each": ran[0]["b"] if ran else 0,
        "audit_bank_rows": [a["l"] for a in ran],
        "audit_skipped_bank_rows": skipped,
        "audit_ok": audit_ok,
        "brute_full_topk_rows_ok": bool(spot_ok),
        "topk_rows_unique_sampled": bool(uniq),
        "note": "beyond-HBM streamed scoring with the production "
        "certificate self-audit ACTIVE and recorded: per-bank adaptive "
        "calls re-score 32 sampled blocks through the independent "
        "banked stripe oracle (VERDICT r4 #6); banks below "
        "_AUDIT_MIN_ROWS skip the audit by design and are listed in "
        "audit_skipped_bank_rows (their merge contribution is covered "
        "by the host-brute FULL top-k spot rows). Wall is "
        "tunnel-upload-dominated in this env (~30 MB/s per bank pass).",
    }


def main():
    def watchdog():
        time.sleep(1200 if CPU_CHECK else 5400)
        log("watchdog fired; exiting")
        os._exit(2)

    threading.Thread(target=watchdog, daemon=True).start()
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    jax.device_get((jnp.ones((8, 128)) * 2).ravel()[0])
    log("probe ok")

    entries = {}
    entries["N_stream6p8G_audit"] = run_point("P1_6p8G", LP1, 700, False)
    entries["N_stream8p5G_audit"] = run_point("P2_8p5G", LP2, 710, True)

    try:
        with open(OUT) as f:
            results = json.load(f)
    except (OSError, ValueError):
        results = {}
    results.update(entries)
    with open(OUT + ".tmp", "w") as f:
        json.dump(results, f, indent=1)
    os.replace(OUT + ".tmp", OUT)
    ok = all(
        e["audit_ok"]
        and e["brute_full_topk_rows_ok"]
        and e["topk_rows_unique_sampled"]
        for e in entries.values()
    )
    print(
        json.dumps(
            {
                k: {
                    "audit_runs": e["audit_runs"],
                    "audit_ok": e["audit_ok"],
                    "spot_ok": e["brute_full_topk_rows_ok"],
                    "wall_s": e["wall_s"],
                }
                for k, e in entries.items()
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
