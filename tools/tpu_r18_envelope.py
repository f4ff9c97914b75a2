#!/usr/bin/env python3
"""Scale-envelope probe (round 3, phases J/K/L2): close the gap between
the 1M-row megascale proof (tpu_r16_megascale.py) and the framework's
documented ceilings.

ONE device process (CLAUDE.md rule 4), phases ordered safest-first so an
OOM in the last phase cannot cost earlier results:

  J_ad500k   adaptive scoring at L=500k rows (nseg=3907): validates the
             INTERPOLATED point of the _ad_params m-scaling rule
             (factor 2 -> m=2048) between the two swept anchors
             (200k: m=1024, 1M: m=4096).
  K_lut_max  mode-1 LUT at MAX_ROWS = 2^21-1 = 2,097,151 rows — the
             documented ops/lut.py ceiling, executed (dist<<21 | row
             packing peaks at 765<<21 = 1.6e9 < i32 max).
  L2_ad2M    adaptive scoring at L=2M rows (1M tiles, 60x the reference
             cap; nseg=15625 -> m=8192 via the rule). Memory plan
             (16 GB HBM): library u8 [2M, 3072] = 6.1 GB in 16 build
             chunks; projected f32 copy 0.77 GB; survivors sliced to
             [2048, nseg*8] i32 x2 = 2 GB; coarse per-chunk stripe
             transient [128, 2M] f32 = 1 GB.

Reference cap being exceeded: tileset.rs:178-183, main.rs:791.
"""

import functools
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
    _dma_bank_rows,
    l1_argmin_xla,
)

_T0 = time.time()
RESULTS: dict = {}
OUT = "/root/repo/SCALE_r03.json"
D, K = 3072, 512
G, BC, BC2 = 32, 128, 64


def log(msg):
    print(f"[env {time.time() - _T0:6.1f}s] {msg}", flush=True)


def save(phase, data):
    RESULTS[phase] = data
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    log(f"phase {phase}: {json.dumps(data)}")


def sync(x):
    jax.device_get(x.ravel()[0])


def memlog(tag):
    """Best-effort HBM residency snapshot (backend may not expose it)."""
    try:
        ms = jax.devices()[0].memory_stats() or {}
        log(f"{tag}: hbm_in_use {ms.get('bytes_in_use', -1) / 1e9:.2f} GB")
    except Exception:
        pass


#: donated flatten: XLA aliases the (layout-compatible) buffer, so the
#: [r, D] -> [r*D] conversion does NOT hold two copies of a 3.2 GB bank.
#: An eager `bk.reshape(-1)` DOES (it is a fresh allocation) — holding
#: the 2D build banks plus one/two flat copies is exactly the 12-18 GB
#: triple-residency that OOM'd the round-5 r27-R3 reruns
#: (/tmp/r5_r27c_1.log: deterministic RESOURCE_EXHAUSTED with the 6.1 GB
#: library "resident" three times).
_flatten_donate = jax.jit(lambda a: a.reshape(-1), donate_argnums=0)


def build_library(lp, n_chunks, seed=100):
    """Clusterable u8 library in device chunks (per-tile base color +
    ±10 texture; the SCALE phase-B model), returned as the BANK TUPLE
    the adaptive-scorer jits take (one bank while lp fits the DMA
    addressing limit — tools/tpu_r21_dmalimit.py; content is chunk-
    placement identical to the pre-bank builds, chunks straddling a bank
    boundary are split). Chunks are placed into preallocated buffers
    with DONATED dynamic_update_slice — a concatenate would hold chunks
    + result simultaneously (12.3 GB at the 2M-row library, the OOM that
    killed the first L2 attempt); donation keeps the peak at lib + one
    chunk."""
    nc = D // 3
    n = lp // n_chunks
    rb = _dma_bank_rows(D)
    bank_rows = [min(rb, lp - o) for o in range(0, lp, rb)]

    place = jax.jit(
        lambda a, c, r0: jax.lax.dynamic_update_slice(a, c, (r0, 0)),
        donate_argnums=0,
    )
    banks = []
    for r in bank_rows:
        bk = jnp.zeros((r, D), jnp.uint8)
        sync(bk)
        banks.append(bk)
    for c in range(n_chunks):
        kc, km = jax.random.split(jax.random.PRNGKey(seed + c))
        colors = jax.random.randint(kc, (n, 3), 0, 256, dtype=jnp.int32)
        tex = jax.random.randint(km, (n, D), -10, 11, dtype=jnp.int32)
        chunk = jnp.clip(jnp.tile(colors, (1, nc)) + tex, 0, 255).astype(
            jnp.uint8
        )
        lo = c * n
        while lo < (c + 1) * n:
            t = lo // rb
            take = min((c + 1) * n - lo, (t + 1) * rb - lo)
            banks[t] = place(
                banks[t], chunk[lo - c * n : lo - c * n + take],
                jnp.int32(lo - t * rb),
            )
            lo += take
        del chunk
    # hand back FLAT banks (the form every consumer jit takes), converting
    # one bank at a time with the donated flatten so the 2D build buffer
    # and its flat form never coexist beyond a single bank
    flat = []
    for i in range(len(banks)):
        fb = _flatten_donate(banks[i])
        sync(fb)
        banks[i] = None
        flat.append(fb)
    log(
        f"library [{lp}, {D}] ready ({n_chunks} donated chunks, "
        f"{len(flat)} flat bank(s))"
    )
    memlog("post-build")
    return tuple(flat)


@functools.partial(jax.jit, static_argnames=("rows",))
def _gather_one_bank(bf, idx, out, base, *, rows):
    """Mask-select gather of idx rows falling in one flat bank. The
    reshape happens INSIDE the jit (bitcast — aligned shapes), so no
    persistent 2D copy; element-offset arithmetic never reaches i32."""
    bk = bf.reshape(rows, -1)
    local = jnp.clip(idx - base, 0, rows - 1)
    hit = (idx >= base) & (idx < base + rows)
    return jnp.where(hit[:, None], bk[local], out)


def gather_rows(banks, idx):
    """libp[idx] across FLAT banks: per-bank clipped gather + select."""
    rb = banks[0].size // D
    out = jnp.zeros((idx.shape[0], D), jnp.uint8)
    for t, bf in enumerate(banks):
        out = _gather_one_bank(
            bf, idx, out, jnp.int32(t * rb), rows=bf.size // D
        )
    return out


@functools.partial(jax.jit, static_argnames=("rows", "n"))
def _bank_chunk_mindist(bf, lo, x, *, rows, n):
    """min L1 distance of block x against n rows of a flat bank starting
    at row lo (traced: one compile per (rows, n)). Row-space addressing —
    flat element offsets overflow i32 past 2^31 elements."""
    bk = bf.reshape(rows, -1)
    sl = jax.lax.dynamic_slice(bk, (lo, 0), (n, bk.shape[1]))
    return (
        jnp.abs(sl.astype(jnp.int16) - x.astype(jnp.int16))
        .sum(1, dtype=jnp.int32)
        .min()
    )


@functools.partial(jax.jit, static_argnames=("rows", "n"))
def _bank_rows_pull(bf, lo, *, rows, n):
    """n rows of a flat bank starting at row lo (for exact host pulls)."""
    return jax.lax.dynamic_slice(
        bf.reshape(rows, -1), (lo, 0), (n, bf.size // rows)
    )


def run_adaptive(banks, real_l, b, b_slice, tag, brute_rows=2, k=K,
                 audit_rows=0):
    """Flagship-k adaptive scoring through the production jits with
    (m, cap) from the production _ad_params rule; returns the ledger
    entry dict. `banks` is the build_library tuple (FLAT banks — the
    exact arrays the jits take; no 2D duplicates are ever created).

    `audit_rows` > 0 additionally re-scores that many certified blocks
    end-to-end through the production certificate self-audit's
    independent stripe oracle (`distance._stripes_banked` — no
    projection, no DMA shortlist) and records full-top-k bit-equality
    as `audit_ok` (VERDICT r4 #2/#6: the certificate must never be the
    only witness at large geometry)."""
    lp = sum(bf.size // D for bf in banks)
    m, cap = _ad_params(lp // 128)
    # only binds at CPU-smoke scale (production gate: m + 1 <= nseg*cap)
    m = min(m, (lp // 128) * cap // 2)
    use_dma = jax.devices()[0].platform == "tpu"  # CPU smoke: XLA gather
    lf = banks  # already flat — the library is resident exactly ONCE
    # Input build retries: on a contended grant the FIRST fresh
    # executable load after the multi-GB library build can hit
    # RESOURCE_EXHAUSTED even though HBM has room (round-5 chain link 2,
    # /tmp/r5_r27b.log: the (b,)-shaped randint died 2 s after the build
    # in a process whose claim probe took 331 s). Sleep out the grant
    # (CLAUDE.md rule 3) and retry in-process — the library stays
    # resident, so a retry costs nothing but the wait.
    for attempt in range(3):
        try:
            pick = jax.random.randint(
                jax.random.PRNGKey(51), (b,), 0, real_l, dtype=jnp.int32
            )
            bn = jax.random.randint(
                jax.random.PRNGKey(52), (b, D), -6, 7, dtype=jnp.int32
            )
            blocks = jnp.clip(
                gather_rows(banks, pick).astype(jnp.int32) + bn, 0, 255
            ).astype(jnp.uint8)
            sync(blocks)
            break
        except jax.errors.JaxRuntimeError as e:
            if "RESOURCE_EXHAUSTED" not in str(e) or attempt == 2:
                raise
            log(
                f"{tag}: input build RESOURCE_EXHAUSTED "
                f"(attempt {attempt + 1}/3); sleeping 300s for the grant"
            )
            time.sleep(300)
    log(f"{tag}: inputs ready (m={m}, cap={cap})")
    memlog(tag)

    def run(slice_blocks):
        bf = slice_blocks.reshape(-1)
        vals, cols, s_min = _ad_coarse_jit(
            bf, lf, d=D, g=G, chan=True, bc=BC, cap=cap, real_l=real_l
        )
        return _ad_rescore_jit(
            bf, vals, cols, s_min, lf,
            d=D, bc=BC2, m=m, k=k, real_l=real_l, use_dma=use_dma,
        )

    cd0, _, _ = run(blocks[:b_slice])  # compile + warm
    sync(cd0)
    log(f"{tag}: adaptive warm")
    out_d = np.empty((b, k), np.int32)
    out_r = np.empty((b, k), np.int32)
    ok_all = np.empty(b, bool)
    t0 = time.perf_counter()
    for s0 in range(0, b, b_slice):
        cd, cr, ok = run(blocks[s0 : s0 + b_slice])
        out_d[s0 : s0 + b_slice] = np.asarray(jax.device_get(cd))
        out_r[s0 : s0 + b_slice] = np.asarray(jax.device_get(cr))
        ok_all[s0 : s0 + b_slice] = np.asarray(jax.device_get(ok))
    score_s = time.perf_counter() - t0
    certified = int(ok_all.sum())
    log(f"{tag}: scoring {score_s:.2f}s ({certified}/{b} certified)")

    # device-side brute top-1 spot check on certified rows (no 6 GB host
    # pull at these scales): chunked i16 stripe per flat bank. Fixed
    # chunk length n with a clamped start (tail chunks overlap — rows
    # scored twice cannot change a min), so each bank costs ONE compile.
    spot = np.flatnonzero(ok_all)[:brute_rows]
    spot_ok = True
    for r in spot:
        x = blocks[int(r)][None]
        best = None
        g0 = 0
        for bf in banks:
            rows = bf.size // D
            valid = min(rows, real_l - g0)
            if valid <= 0:
                break
            n = min(50_000, valid)
            los = list(range(0, valid - n, n)) + [valid - n]
            for lo in los:
                cand = int(jax.device_get(_bank_chunk_mindist(
                    bf, jnp.int32(lo), x, rows=rows, n=n
                )))
                best = cand if best is None else min(best, cand)
            g0 += rows
        spot_ok &= best == int(out_d[r, 0])
    log(f"{tag}: brute top-1 spot check on rows {spot.tolist()}: {spot_ok}")
    # top-k rows must be unique per block (certificate sanity)
    uniq = all(
        np.unique(out_r[i]).size == k for i in range(0, b, max(1, b // 7))
    )
    entry = {
        "B": b, "L": real_l, "D": D, "k": k, "m": m, "cap": cap,
        "score_s": round(score_s, 2),
        "certified": certified,
        "brute_top1_spot_ok": bool(spot_ok),
        "topk_rows_unique_sampled": bool(uniq),
    }
    if audit_rows:
        from emosaic_tpu.ops.distance import _stripes_banked

        cert_rows = np.flatnonzero(ok_all)
        rng = np.random.default_rng(0xAD17)
        aidx = np.sort(
            rng.choice(
                cert_rows, size=min(audit_rows, cert_rows.size),
                replace=False,
            )
        )
        t0 = time.perf_counter()
        blk_h = np.asarray(jax.device_get(blocks[jnp.asarray(aidx)]))
        ad, ar = _stripes_banked(blk_h, lf, real_l, D, k)
        audit_ok = bool(
            (ad == out_d[aidx]).all() and (ar == out_r[aidx]).all()
        )
        entry["audit_rows"] = int(aidx.size)
        entry["audit_ok"] = audit_ok
        entry["audit_s"] = round(time.perf_counter() - t0, 2)
        log(
            f"{tag}: independent stripe-oracle audit on {aidx.size} "
            f"certified rows: ok={audit_ok} ({entry['audit_s']:.1f}s)"
        )
    return entry


def phase_ad500k():
    lp = -(-500_000 // 128) * 128  # 500,096 -> nseg 3907, m 2048
    libp = build_library(lp, 8, seed=300)
    entry = run_adaptive(libp, 500_000, 8192, 4096, "ad500k")
    entry["note"] = (
        "validates the INTERPOLATED _ad_params point (nseg=3907 -> m=2048) "
        "between the swept 200k (m=1024) and 1M (m=4096) anchors; "
        "production jits, device-generated clusterable library."
    )
    save("J_ad500k", entry)
    del libp


def phase_lut_max():
    from emosaic_tpu.ops.lut import MAX_ROWS, _build_l1_lut_jit, _lut_match_packed_jit

    rows_n = MAX_ROWS  # 2,097,151
    key = jax.random.PRNGKey(61)
    lib = jax.random.randint(key, (rows_n, 3), 0, 256, dtype=jnp.uint8)
    sync(lib)
    t0 = time.perf_counter()
    lut = _build_l1_lut_jit(lib.astype(jnp.int32))
    sync(lut)
    build_s = time.perf_counter() - t0
    log(f"LUT built over {rows_n} rows (the MAX_ROWS ceiling) in {build_s:.2f}s")
    q = jax.random.randint(jax.random.PRNGKey(62), (8192, 3), 0, 256, dtype=jnp.uint8)
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
    save(
        "K_lut_max",
        {
            "rows": rows_n,
            "build_s": round(build_s, 2),
            "parity_8192_colors": match,
            "note": "ops/lut.py MAX_ROWS=2^21-1 ceiling executed; key "
            "packing peaks at 765<<21 = 1.6e9 < i32 max.",
        },
    )
    del lib, lut


def phase_ad2M():
    lp = 2_000_000  # multiple of 128 -> nseg 15625, m 8192
    libp = build_library(lp, 16, seed=400)
    # slice 1024 (not the 2048 the bare survivor budget allows): with the
    # 6.1 GB library resident, a 2048-slice rescore OOM'd — the coarse's
    # [slice, nseg*cap] i32 x2 outputs coexist with the rescore workspace
    entry = run_adaptive(libp, lp, 4096, 1024, "ad2M")
    entry["note"] = (
        "1M-tile (2M flip-row) library = 60x the reference's 32767-tile "
        "cap; _ad_params extrapolated point (nseg=15625 -> m=8192, cap=8); "
        "survivor lists sliced to 1024 blocks to fit the 6.1 GB library "
        "alongside them in 16 GB HBM (a 2048-block slice OOM'd); library "
        "split into 2 banks under the DMA addressing limit."
    )
    save("L2_ad2M", entry)
    del libp


def main():
    import os
    import threading

    def watchdog():
        time.sleep(3300)
        log("watchdog: 55 min elapsed; exiting with partial results")
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
    sel = os.environ.get("EMOSAIC_SCALE_PHASES", "JKL")
    for name, fn in [("J", phase_ad500k), ("K", phase_lut_max), ("L", phase_ad2M)]:
        if name not in sel:
            continue
        try:
            fn()
            if RESULTS.pop(f"{name}_error", None) is not None:
                with open(OUT, "w") as f:
                    json.dump(RESULTS, f, indent=1)
        except Exception as e:
            import traceback

            traceback.print_exc()
            save(f"{name}_error", {"error": repr(e)[:500]})
    log("all phases done")


if __name__ == "__main__":
    sys.exit(main() or 0)
