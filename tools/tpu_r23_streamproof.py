#!/usr/bin/env python3
"""On-chip proof of the host-streamed banked scorer (round-3 addition,
ops/distance.l1_topk_streamed): score a library LARGER than the proven
device-resident budget (`_DEVICE_LIB_BYTES_MAX` = 6.2 GB, the SCALE_r03
L2_ad2M ceiling) by streaming host banks through the certified adaptive
scorer and exact-merging across banks.

Shape: lp = 2,228,224 rows x D = 3072 = 6.84 GB (> the budget, so the
production `l1_topk_adaptive` gate itself reroutes here) -> 3 default
banks (`_stream_bank_rows(3072)` = 2^20 = 1,048,576 rows twice + a
131,072-row tail; each bank is ONE DMA addressing bank, so `_lib_banks`
takes the proven single-buffer path), B = 2048 flagship-k (512) queries.

Verification is direct (no device oracle can hold this library):
host-brute FULL top-k (distance + lowest-row lex key) on sample rows
must equal the streamed output bit-for-bit, plus per-row unique-rows
sanity. Wall time in this env is upload-dominated (the 6.84 GB of banks
ride the ~30 MB/s tunnel once each) — the ledger records wall and the
post-warm per-bank estimate separately.

Passes 1-2 pin EMOSAIC_STREAM_PREFETCH=0: the serial narrative above is
what the bank arithmetic and the host-brute oracle were sized for, and
its compile shapes (2^20-row banks) are the known ones. Pass 3 then
validates the production-default PREFETCH path (worker-thread bank
uploads) at the same explicit bank_rows — reusing the compiled shapes,
bit-compared against pass 1 — inside a try/except so a tunnel-specific
prefetch failure is RECORDED (prefetch_ok=None + error) without burning
the core proof's device claim; wrong prefetch RESULTS still fail the
run (shipped-default correctness).

ONE device process (CLAUDE.md rule 4); self-bounded watchdog (rule 2).
Ledger: SCALE_r03.json key N_stream6p8G.
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

_T0 = time.time()
OUT = "/root/repo/SCALE_r03.json"
D, K, B = 3072, 512, 2048
LP = 2_228_224  # x 3072 B = 6.845 GB > _DEVICE_LIB_BYTES_MAX
SPOT_ROWS = 3


def log(msg):
    print(f"[stream {time.time() - _T0:6.1f}s] {msg}", flush=True)


def build_host_library(lp: int, seed: int = 500) -> np.ndarray:
    """Clusterable u8 library on the HOST (per-tile base color + ±10
    texture — the scale-phase model), built in chunks to bound the int32
    transients."""
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
    """Exact host-brute top-k of one query under the production
    (distance, lowest-row) key — the only oracle that can see a
    beyond-device-budget library whole."""
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


def main():
    def watchdog():
        # budget: ~2 min host library build + 3 x 6.84 GB bank uploads
        # over the ~30 MB/s tunnel (~8 min each pass: serial cold, serial
        # warm, prefetch) + 2 bank-shape remote compiles (30-240 s each,
        # several kernels; the prefetch pass reuses them) + ~4 min of
        # host-brute spot checks — ~35 min nominal, 90 min hard stop
        time.sleep(5400)
        log("watchdog: 90 min elapsed; exiting")
        os._exit(1)

    threading.Thread(target=watchdog, daemon=True).start()
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    jax.device_get((jnp.ones((8, 128)) * 2).ravel()[0])
    log("probe ok")

    from emosaic_tpu.ops import distance

    rb = distance._stream_bank_rows(D)
    assert LP * D > distance._DEVICE_LIB_BYTES_MAX and LP > rb
    lib = build_host_library(LP)
    log(f"host library [{LP}, {D}] = {lib.nbytes / 1e9:.2f} GB ready")
    rng = np.random.default_rng(501)
    pick = rng.integers(0, LP, size=B)
    blocks = np.clip(
        lib[pick].astype(np.int16) + rng.integers(-6, 7, size=(B, D)),
        0,
        255,
    ).astype(np.uint8)
    banks = [min(rb, LP - off) for off in range(0, LP, rb)]
    log(f"blocks [{B}, {D}] ready; banks: {banks} rows")

    # passes 1-2 serial (module docstring): the planned bank narrative
    # and the known 2^20-row compile shapes
    os.environ["EMOSAIC_STREAM_PREFETCH"] = "0"
    # through the PRODUCTION gate: l1_topk_adaptive reroutes to streamed
    t0 = time.perf_counter()
    out_d, out_r = distance.l1_topk_adaptive(blocks, lib, K)
    wall_s = time.perf_counter() - t0
    log(f"streamed scoring wall {wall_s:.2f}s (incl. bank uploads/compiles)")
    # warm second run: same compiled shapes, banks re-uploaded (the
    # steady-state serving cost of a beyond-HBM library in this env)
    t0 = time.perf_counter()
    out_d2, out_r2 = distance.l1_topk_streamed(blocks, lib, K)
    warm_s = time.perf_counter() - t0
    det = bool((out_d2 == out_d).all() and (out_r2 == out_r).all())
    log(f"warm re-run {warm_s:.2f}s; deterministic={det}")

    # pass 3: the production-default PREFETCH path (worker-thread bank
    # uploads, same explicit bank_rows -> same compiled shapes; two
    # banks resident = 6.4 GB, inside the 16 GiB envelope at B=2048).
    # Exceptions are recorded, wrong results fail the run.
    os.environ["EMOSAIC_STREAM_PREFETCH"] = "1"
    prefetch_ok = None
    prefetch_s = prefetch_err = None
    # round-4 production guard: two explicit 2^20-row banks (6.44 GB)
    # exceed _DEVICE_LIB_BYTES_MAX (6.2 GB) and would now stream
    # SERIALLY — widen the budget to this pass's measured two-bank
    # envelope (6.44 GB of 16 GiB HBM at B=2048) so prefetch genuinely
    # runs; restored immediately after. Without this the pass would
    # vacuously compare serial to serial.
    saved_budget = distance._DEVICE_LIB_BYTES_MAX
    distance._DEVICE_LIB_BYTES_MAX = 2 * rb * D + 1
    try:
        t0 = time.perf_counter()
        out_d3, out_r3 = distance.l1_topk_streamed(
            blocks, lib, K, bank_rows=rb
        )
        prefetch_s = round(time.perf_counter() - t0, 2)
        prefetch_ok = bool(
            (out_d3 == out_d).all() and (out_r3 == out_r).all()
        )
        log(f"prefetch pass {prefetch_s}s; bit-equal serial={prefetch_ok}")
    except Exception as e:  # noqa: BLE001 — record, don't burn the claim
        prefetch_err = f"{type(e).__name__}: {e}"
        log(f"prefetch pass raised: {prefetch_err}")
    finally:
        distance._DEVICE_LIB_BYTES_MAX = saved_budget

    spot = rng.integers(0, B, size=SPOT_ROWS)
    spot_ok = True
    for r in spot:
        hd, hr = host_topk(blocks[int(r)], lib, K)
        row_ok = bool((hd == out_d[r]).all() and (hr == out_r[r]).all())
        spot_ok &= row_ok
        log(f"host-brute FULL top-{K} check row {int(r)}: {row_ok}")
    uniq = all(
        np.unique(out_r[i]).size == K for i in range(0, B, max(1, B // 7))
    )

    try:
        with open(OUT) as f:
            results = json.load(f)
    except (OSError, ValueError):
        results = {}
    results["N_stream6p8G"] = {
        "B": B, "L": LP, "D": D, "k": K,
        "lib_gb": round(LP * D / 1e9, 2),
        "banks": banks,
        "wall_cold_s": round(wall_s, 2),
        "wall_warm_s": round(warm_s, 2),
        "wall_prefetch_s": prefetch_s,
        "deterministic_rerun": det,
        "prefetch_bit_equal_serial": prefetch_ok,
        "prefetch_error": prefetch_err,
        "brute_full_topk_rows_ok": bool(spot_ok),
        "topk_rows_unique_sampled": bool(uniq),
        "note": "host-streamed banked scorer at 6.84 GB (> the 6.2 GB "
        "device budget, SCALE_r03 L2_ad2M ceiling): production "
        "l1_topk_adaptive gate reroutes to l1_topk_streamed; exact "
        "cross-bank (distance, lowest-row) merge verified against a "
        "host-brute FULL top-512 on sample rows. Wall times in this env "
        "are tunnel-upload-dominated (6.84 GB of banks at ~30 MB/s per "
        "pass); on a TPU VM the per-bank upload is PCIe (~0.5 s/bank).",
    }
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    log(f"ledger written: {json.dumps(results['N_stream6p8G'])}")
    # prefetch_ok False = the shipped default returns WRONG results ->
    # fail; None (raised) is recorded for follow-up but keeps the core
    # proof's rc
    return 0 if (spot_ok and uniq and det and prefetch_ok is not False) else 1


if __name__ == "__main__":
    sys.exit(main())
