#!/usr/bin/env python3
"""Diagnose the failed brute top-1 spot check of L2_ad2M
(tools/tpu_r18_envelope.py): for spot rows, compare
  d_scorer   top-1 distance from the production adaptive scorer
  d_direct   exact L1(block, libp[top-1 row]) (f32 dot method, exact)
  d_plant    exact L1(block, libp[pick[row]]) (the planted source row)
  d_brute16  the probe's i16-diff chunked brute min
  d_brutef32 f32-diff chunked brute min (known-exact on v5e: values
             < 2^24; docs/KERNELS.md)
Everything is deterministic (PRNGKeys 400+c / 51 / 52), so this
reproduces the exact failing run.
"""

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
)

_T0 = time.time()
D, K = 3072, 512
G, BC, BC2 = 32, 128, 64
LP = 2_000_000


def log(msg):
    print(f"[diag {time.time() - _T0:6.1f}s] {msg}", flush=True)


def sync(x):
    jax.device_get(x.ravel()[0])


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    sync(jnp.ones((8, 128)) * 2)
    log("probe ok")

    # library identical to the failing run (seed 400, 16 donated chunks)
    nc = D // 3
    n = LP // 16
    place = jax.jit(
        lambda a, c, r0: jax.lax.dynamic_update_slice(a, c, (r0, 0)),
        donate_argnums=0,
    )
    libp = jnp.zeros((LP, D), jnp.uint8)
    sync(libp)
    for c in range(16):
        kc, km = jax.random.split(jax.random.PRNGKey(400 + c))
        colors = jax.random.randint(kc, (n, 3), 0, 256, dtype=jnp.int32)
        tex = jax.random.randint(km, (n, D), -10, 11, dtype=jnp.int32)
        chunk = jnp.clip(jnp.tile(colors, (1, nc)) + tex, 0, 255).astype(
            jnp.uint8
        )
        libp = place(libp, chunk, jnp.int32(c * n))
        del chunk
    sync(libp)
    log("library ready")

    b = 4096
    m, cap = _ad_params(LP // 128)
    pick = jax.random.randint(
        jax.random.PRNGKey(51), (b,), 0, LP, dtype=jnp.int32
    )
    bn = jax.random.randint(jax.random.PRNGKey(52), (b, D), -6, 7, dtype=jnp.int32)
    blocks = jnp.clip(libp[pick].astype(jnp.int32) + bn, 0, 255).astype(
        jnp.uint8
    )
    sync(blocks)
    pick_np = np.asarray(jax.device_get(pick[:8]))
    log(f"inputs ready (m={m}, cap={cap}); pick[:8]={pick_np.tolist()}")

    # scorer on the first 1024-row slice only
    lf = libp.reshape(-1)
    bf = blocks[:1024].reshape(-1)
    vals, cols, s_min = _ad_coarse_jit(
        bf, lf, d=D, g=G, chan=True, bc=BC, cap=cap, real_l=LP
    )
    cd, cr, ok = _ad_rescore_jit(
        bf, vals, cols, s_min, lf,
        d=D, bc=BC2, m=m, k=K, real_l=LP, use_dma=True,
    )
    out_d = np.asarray(jax.device_get(cd))
    out_r = np.asarray(jax.device_get(cr))
    ok_np = np.asarray(jax.device_get(ok))
    log(f"scorer done; certified {int(ok_np.sum())}/1024")

    # exact single-pair L1 via f32 (values < 2^24: exact)
    @jax.jit
    def pair_l1(x, t):
        return jnp.abs(
            x.astype(jnp.float32) - t.astype(jnp.float32)
        ).sum(dtype=jnp.float32)

    for r in (0, 1, 2, 3):
        top_row = int(out_r[r, 0])
        d_scorer = int(out_d[r, 0])
        d_direct = int(jax.device_get(pair_l1(blocks[r], libp[top_row])))
        d_plant = int(jax.device_get(pair_l1(blocks[r], libp[int(pick_np[r])])))

        best16 = None
        bestf = None
        arg16 = argf = -1
        step = 50_000
        for lo in range(0, LP, step):
            sl_ = libp[lo : lo + step]
            d16 = jnp.abs(
                sl_.astype(jnp.int16) - blocks[r][None].astype(jnp.int16)
            ).sum(1, dtype=jnp.int32)
            df = jnp.abs(
                sl_.astype(jnp.float32) - blocks[r][None].astype(jnp.float32)
            ).sum(1, dtype=jnp.float32)
            i16 = int(jax.device_get(jnp.argmin(d16)))
            if_ = int(jax.device_get(jnp.argmin(df)))
            v16 = int(jax.device_get(d16[i16]))
            vf = int(jax.device_get(df[if_]))
            if best16 is None or v16 < best16:
                best16, arg16 = v16, lo + i16
            if bestf is None or vf < bestf:
                bestf, argf = vf, lo + if_
        log(
            f"row {r}: certified={bool(ok_np[r])} scorer=(d {d_scorer}, row "
            f"{top_row}) direct={d_direct} plant(row {int(pick_np[r])})="
            f"{d_plant} brute_i16=(d {best16}, row {arg16}) "
            f"brute_f32=(d {bestf}, row {argf})"
        )
    log("done")


if __name__ == "__main__":
    sys.exit(main() or 0)
