#!/usr/bin/env python3
"""Adaptive-scorer parameter sweep at the 1M-row library (round 3).

tpu_r16_megascale.py found the 200k-tuned parameters (cap=8, m=1024)
certify only 90/16384 rows at L=1M: both certificate terms degrade with
segment count — s_min is a min over nseg per-segment worst-kept coarse
values (extreme-value statistics: more segments -> smaller min) and
v_{m+1} is the (m+1)-th smallest of nseg*cap survivors (fixed m digs
deeper into a 5x denser coarse distribution). This sweep measures
certification rate + stage timings across (cap, m, g) on one 4096-block
slice, diagnoses which term binds, then runs the winner at full B.
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
    _ad_rescore_jit,
)

_T0 = time.time()
OUT = "/tmp/ad1M_sweep.json"
RESULTS: dict = {}


def log(msg):
    print(f"[ad1M {time.time() - _T0:6.1f}s] {msg}", flush=True)


def save(key, data):
    RESULTS[key] = data
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    log(f"{key}: {json.dumps(data)}")


def sync(x):
    jax.device_get(x.ravel()[0])


B, T, D, K = 16384, 500_000, 3072, 512
L = 2 * T
LP = -(-L // 128) * 128
B_SLICE = 4096


def build_library():
    nc = D // 3
    chunks = []
    n = LP // 8
    for c in range(8):
        kc, km = jax.random.split(jax.random.PRNGKey(100 + c))
        colors = jax.random.randint(kc, (n, 3), 0, 256, dtype=jnp.int32)
        tex = jax.random.randint(km, (n, D), -10, 11, dtype=jnp.int32)
        chunk = jnp.clip(jnp.tile(colors, (1, nc)) + tex, 0, 255).astype(
            jnp.uint8
        )
        sync(chunk)
        chunks.append(chunk)
    libp = jnp.concatenate(chunks)
    sync(libp)
    del chunks
    log("library ready")
    return libp


def main():
    import threading, os

    def watchdog():
        time.sleep(3300)
        log("watchdog: 55 min; exiting with partial results")
        os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    sync(jnp.ones((8, 128)) * 2)
    log("probe ok")

    libp = build_library()
    lf = libp.reshape(-1)
    pick = jax.random.randint(jax.random.PRNGKey(51), (B,), 0, L, dtype=jnp.int32)
    bn = jax.random.randint(jax.random.PRNGKey(52), (B, D), -6, 7, dtype=jnp.int32)
    blocks = jnp.clip(libp[pick].astype(jnp.int32) + bn, 0, 255).astype(jnp.uint8)
    sync(blocks)
    log("inputs ready")
    sl0 = blocks[:B_SLICE]
    bf0 = sl0.reshape(-1)

    def run_cfg(cap, m, g, tag, diagnose=False):
        vals, cols, s_min = _ad_coarse_jit(
            bf0, lf, d=D, g=g, chan=True, bc=128, cap=cap, real_l=L
        )
        sync(vals)  # warm coarse
        t0 = time.perf_counter()
        vals, cols, s_min = _ad_coarse_jit(
            bf0, lf, d=D, g=g, chan=True, bc=128, cap=cap, real_l=L
        )
        sync(vals)
        coarse_s = time.perf_counter() - t0
        out = _ad_rescore_jit(
            bf0, vals, cols, s_min, lf,
            d=D, bc=64, m=m, k=K, real_l=L, use_dma=True,
        )
        sync(out[0])  # warm rescore
        t0 = time.perf_counter()
        cd, cr, ok = _ad_rescore_jit(
            bf0, vals, cols, s_min, lf,
            d=D, bc=64, m=m, k=K, real_l=L, use_dma=True,
        )
        sync(cd)
        rescore_s = time.perf_counter() - t0
        ok_np = np.asarray(jax.device_get(ok))
        cert = int(ok_np.sum())
        entry = {
            "cap": cap, "m": m, "g": g,
            "coarse_s": round(coarse_s, 2),
            "rescore_s": round(rescore_s, 2),
            "cert": cert, "of": B_SLICE,
        }
        if diagnose:
            vals_np = np.asarray(jax.device_get(vals[:256]))
            s = vals_np.shape[1]
            nseg = s // cap
            smin_rows = vals_np.reshape(256, nseg, cap)[:, :, -1].min(1)
            vm1 = np.partition(vals_np, m, axis=1)[:, m]
            sdk = np.asarray(jax.device_get(cd[:256, K - 1]))
            entry["diag_median"] = {
                "s_min": int(np.median(smin_rows)),
                "v_m_plus_1": int(np.median(vm1)),
                "true_kth": int(np.median(sdk)),
            }
        save(tag, entry)
        return cert, coarse_s + rescore_s

    sweep = [
        (8, 1024, 32, True),   # baseline (the collapse), with diagnosis
        (8, 4096, 32, False),
        (16, 2048, 32, False),
        (16, 4096, 32, True),
        (16, 8192, 32, False),
        (16, 4096, 16, False),
    ]
    best = None
    for cap, m, g, diag in sweep:
        try:
            cert, tt = run_cfg(cap, m, g, f"cfg_c{cap}_m{m}_g{g}", diag)
            # prefer certification, then speed
            cand = (cert, -tt, (cap, m, g))
            if best is None or cand > best:
                best = cand
        except Exception as e:
            import traceback

            traceback.print_exc()
            save(f"cfg_c{cap}_m{m}_g{g}_error", {"error": repr(e)[:300]})
    if best is None:
        log("no config ran")
        return 1
    cert, _, (cap, m, g) = best[0], best[1], best[2]
    log(f"winner: cap={cap} m={m} g={g} cert={cert}/{B_SLICE}")

    # full-B run with the winner (timed end-to-end like the megascale probe)
    out_d = np.empty((B, K), np.int32)
    ok_all = np.empty(B, bool)
    t0 = time.perf_counter()
    for s0 in range(0, B, B_SLICE):
        bf = blocks[s0 : s0 + B_SLICE].reshape(-1)
        vals, cols, s_min = _ad_coarse_jit(
            bf, lf, d=D, g=g, chan=True, bc=128, cap=cap, real_l=L
        )
        cd, cr, ok = _ad_rescore_jit(
            bf, vals, cols, s_min, lf,
            d=D, bc=64, m=m, k=K, real_l=L, use_dma=True,
        )
        out_d[s0 : s0 + B_SLICE] = np.asarray(jax.device_get(cd))
        ok_all[s0 : s0 + B_SLICE] = np.asarray(jax.device_get(ok))
    full_s = time.perf_counter() - t0
    save(
        "winner_full_B",
        {
            "cap": cap, "m": m, "g": g,
            "score_s": round(full_s, 2),
            "cert": int(ok_all.sum()), "of": B,
        },
    )
    log("done")
    return 0


if __name__ == "__main__":
    sys.exit(main() or 0)
