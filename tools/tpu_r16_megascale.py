#!/usr/bin/env python3
"""Megascale probe (round 3, phase I): the beyond-cap claim at a
500k-tile library — 1,000,000 flip rows, 5x past the 200k-row proof and
30x past the reference's 32 767-tile hard cap (tileset.rs:178-183).

ONE device process (CLAUDE.md rule 4):
  I_lut_1M        mode-1 LUT built over 1,000,002 rows (first execution
                  past 200k toward the ops/lut.py MAX_ROWS=2M claim):
                  build time, parity vs the exact dense kernel on 8192
                  sampled lattice colors, 16.7M packed-match rate.
  I_megascale_1M  no-repeat flagship shape (B=16384, D=3072, k=512) at
                  L=1M clusterable rows through the PRODUCTION adaptive
                  machinery (raw jits + manual 4096-block slices: the
                  library is device-generated in chunks — pulling 3 GB
                  through the 30 MB/s tunnel just to re-upload it would
                  dominate the probe), per-row stripe fallback included
                  in the timing, then C++ global-greedy assignment with
                  uniqueness verification and a brute-numpy top-1 spot
                  check.

Memory plan (16 GB HBM): library u8 [1M, 3072] = 3.07 GB built in 8
device chunks (i32 intermediates stay <= 1.6 GB each); coarse projected
copies ~0.8 GB; survivor lists sliced to [4096, nseg*cap] i32 (~1 GB x2).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from emosaic_tpu.ops.distance import (  # noqa: E402
    _ad_coarse_jit,
    _ad_params,
    _ad_rescore_jit,
    _l1_topk_stripes_jit,
    l1_argmin_xla,
)

_T0 = time.time()
RESULTS: dict = {}
OUT = "/root/repo/SCALE_r03.json"


def log(msg):
    print(f"[mega {time.time() - _T0:6.1f}s] {msg}", flush=True)


def save(phase, data):
    RESULTS[phase] = data
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    log(f"phase {phase}: {json.dumps(data)}")


def sync(x):
    jax.device_get(x.ravel()[0])


B, T, D, K = 16384, 500_000, 3072, 512
L = 2 * T
LP = -(-L // 128) * 128  # 1,000,064
# (m, cap) from the production scaling rule — at nseg=7813 this is
# m=4096, cap=8 (the tools/tpu_r17_ad1M.py winner: 4096/4096 certified)
M, CAP = _ad_params(LP // 128)
G, BC, BC2 = 32, 128, 64  # l1_topk_adaptive's choices here
B_SLICE = 4096  # survivor lists [B_SLICE, (LP/128)*CAP] i32 stay ~1 GB


def build_library():
    """Clusterable u8 [LP, D] library, built in 8 device chunks (per-tile
    base color + ±10 texture, the SCALE phase-B model at 5x the rows).
    Rows >= L are arbitrary (masked by real_l)."""
    nc = D // 3
    chunks = []
    n = LP // 8  # 125,008
    for c in range(8):
        kc, km = jax.random.split(jax.random.PRNGKey(100 + c))
        colors = jax.random.randint(kc, (n, 3), 0, 256, dtype=jnp.int32)
        tex = jax.random.randint(km, (n, D), -10, 11, dtype=jnp.int32)
        chunk = jnp.clip(jnp.tile(colors, (1, nc)) + tex, 0, 255).astype(
            jnp.uint8
        )
        sync(chunk)
        chunks.append(chunk)
        log(f"library chunk {c + 1}/8 ready")
    libp = jnp.concatenate(chunks)
    sync(libp)
    del chunks
    return libp


def phase_lut():
    from emosaic_tpu.ops.lut import _build_l1_lut_jit, _lut_match_packed_jit

    rows_n = 1_000_002  # odd on purpose, past 1M
    key = jax.random.PRNGKey(41)
    lib = jax.random.randint(key, (rows_n, 3), 0, 256, dtype=jnp.uint8)
    sync(lib)
    t0 = time.perf_counter()
    lut = _build_l1_lut_jit(lib.astype(jnp.int32))
    sync(lut)
    build_s = time.perf_counter() - t0
    log(f"LUT built over {rows_n} rows in {build_s:.2f}s (cold incl. compile)")
    q = jax.random.randint(jax.random.PRNGKey(42), (8192, 3), 0, 256, dtype=jnp.uint8)
    packed = (
        q[:, 0].astype(jnp.int32)
        | (q[:, 1].astype(jnp.int32) << 8)
        | (q[:, 2].astype(jnp.int32) << 16)
    )
    ld, lr = _lut_match_packed_jit(packed, lut)
    ed, er = l1_argmin_xla(q, lib)
    match = bool(
        (np.asarray(jax.device_get(lr)) == np.asarray(jax.device_get(er))).all()
        and (np.asarray(jax.device_get(ld)) == np.asarray(jax.device_get(ed))).all()
    )
    big = jax.random.randint(
        jax.random.PRNGKey(43), (4096 * 4096,), 0, 1 << 24, dtype=jnp.int32
    )
    sync(big)
    _sync_out = _lut_match_packed_jit(big, lut)  # warm
    sync(_sync_out[0])
    t0 = time.perf_counter()
    d2, _ = _lut_match_packed_jit(big, lut)
    sync(d2)
    match_s = time.perf_counter() - t0
    save(
        "I_lut_1M",
        {
            "rows": rows_n,
            "build_s": round(build_s, 2),
            "parity_8192_colors": match,
            "packed_match_16p7M_s": round(match_s, 3),
        },
    )
    del lib, lut, big


def phase_megascale():
    from emosaic_tpu import native

    libp = build_library()
    lf = libp.reshape(-1)
    pick = jax.random.randint(jax.random.PRNGKey(51), (B,), 0, L, dtype=jnp.int32)
    bn = jax.random.randint(jax.random.PRNGKey(52), (B, D), -6, 7, dtype=jnp.int32)
    blocks = jnp.clip(libp[pick].astype(jnp.int32) + bn, 0, 255).astype(jnp.uint8)
    sync(blocks)
    log("inputs ready")

    def run(slice_blocks):
        bf = slice_blocks.reshape(-1)
        vals, cols, s_min = _ad_coarse_jit(
            bf, lf, d=D, g=G, chan=True, bc=BC, cap=CAP, real_l=L
        )
        return _ad_rescore_jit(
            bf, vals, cols, s_min, lf,
            d=D, bc=BC2, m=M, k=K, real_l=L, use_dma=True,
        )

    cd0, _, _ = run(blocks[:B_SLICE])  # compile + warm
    sync(cd0)
    log("adaptive warm")
    # fallback shape warm (fixed 1024-row pad, like bench.py)
    fb_rows = 1024

    def run_fallback(idx):
        idxp = np.zeros(fb_rows, np.int32)
        idxp[: idx.size] = idx
        bb = blocks[jnp.asarray(idxp)]
        return _l1_topk_stripes_jit(
            bb.reshape(-1), lf, d=D, bc=128, k=K, real_l=L
        )
    fb_warm = run_fallback(np.arange(4))
    sync(fb_warm[0])
    log("fallback warm")

    out_d = np.empty((B, K), np.int32)
    out_r = np.empty((B, K), np.int32)
    ok_all = np.empty(B, bool)
    t0 = time.perf_counter()
    for s0 in range(0, B, B_SLICE):
        cd, cr, ok = run(blocks[s0 : s0 + B_SLICE])
        out_d[s0 : s0 + B_SLICE] = np.asarray(jax.device_get(cd))
        out_r[s0 : s0 + B_SLICE] = np.asarray(jax.device_get(cr))
        ok_all[s0 : s0 + B_SLICE] = np.asarray(jax.device_get(ok))
    certified = int(ok_all.sum())
    bad = np.flatnonzero(~ok_all)
    if bad.size:
        if bad.size > fb_rows:
            bad = bad[:fb_rows]
        fb_d, fb_r = run_fallback(bad)
        out_d[bad] = np.asarray(jax.device_get(fb_d))[: bad.size]
        out_r[bad] = np.asarray(jax.device_get(fb_r))[: bad.size]
    score_s = time.perf_counter() - t0
    log(f"adaptive scoring {score_s:.2f}s ({certified}/{B} certified, "
        f"{bad.size} stripe-fallback rows in-timing)")

    # host pull for the C++ engine (transfer-dominated in this env)
    t0 = time.perf_counter()
    blocks_np = np.asarray(jax.device_get(blocks))
    lib_np = np.asarray(jax.device_get(libp))[:L]
    pull_s = time.perf_counter() - t0
    log(f"host pull {pull_s:.1f}s (3.1 GB over the tunnel)")
    t0 = time.perf_counter()
    rows, dists = native.greedy_global(out_d, out_r, blocks_np, lib_np, T)
    assign_s = time.perf_counter() - t0
    assigned = rows[rows >= 0]
    tiles_used = np.where(assigned >= T, assigned - T, assigned)
    all_unique = bool(
        assigned.size == B and np.unique(tiles_used).size == B
    )
    log(f"assignment {assign_s:.2f}s ({assigned.size}/{B} assigned, "
        f"unique tiles: {np.unique(tiles_used).size})")

    # brute-numpy top-1 spot check on 2 certified rows (chunked i32)
    spot = np.flatnonzero(ok_all)[:2]
    spot_ok = True
    for r in spot:
        best = None
        x = blocks_np[r].astype(np.int32)
        for lo in range(0, L, 100_000):
            dsub = np.abs(
                lib_np[lo : lo + 100_000].astype(np.int32) - x[None]
            ).sum(1)
            cand = int(dsub.min())
            best = cand if best is None else min(best, cand)
        spot_ok &= best == int(out_d[r, 0])
    log(f"brute top-1 spot check on rows {spot.tolist()}: {spot_ok}")

    save(
        "I_megascale_1M",
        {
            "B": B, "T": T, "L": L, "D": D, "k": K, "m": M, "cap": CAP,
            "score_s": round(score_s, 2),
            "certified": certified,
            "fallback_rows": int(bad.size),
            "assign_s": round(assign_s, 2),
            "assigned": int(assigned.size),
            "all_unique": all_unique,
            "brute_top1_spot_ok": bool(spot_ok),
            "host_pull_s": round(pull_s, 1),
            "note": "500k-tile (1M flip-row) clusterable library, flagship "
            "shape, production adaptive scorer (manual 4096-block slices, "
            "device-generated library) + C++ global greedy; 30x the "
            "reference cap. Exact: certified rows carry the certificate, "
            "uncertified rows re-scored by the stripe oracle in-timing.",
        },
    )


def main():
    import threading, os

    def watchdog():
        time.sleep(3000)
        log("watchdog: 50 min elapsed; exiting with partial results")
        os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    sync(jnp.ones((8, 128)) * 2)  # tiny claim probe (CLAUDE.md rule 3)
    log("probe ok")
    try:
        with open(OUT) as f:
            RESULTS.update(json.load(f))
    except (OSError, ValueError):
        pass
    sel = __import__("os").environ.get("EMOSAIC_SCALE_PHASES", "LM")
    for name, fn in [("L", phase_lut), ("M", phase_megascale)]:
        if name not in sel:
            continue
        try:
            fn()
        except Exception as e:
            import traceback

            traceback.print_exc()
            save(f"I_{name}_error", {"error": repr(e)[:500]})
    log("all phases done")


if __name__ == "__main__":
    sys.exit(main() or 0)
