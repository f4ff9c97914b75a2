#!/usr/bin/env python3
"""Pinpoint the Pallas DMA dynamic-row addressing limit that broke the
L2_ad2M envelope phase (SCALE_r03.json: certified rows whose brute top-1
disagrees at a 2M-row x 3072-byte library = 6.1 GB, while the 1M-row
library = 3.07 GB passed — boundary suspected at 2^32 bytes).

Method: library row i holds the byte triple (i & 255, i>>8 & 255,
i>>16 & 255) tiled across D=3072, so every row's content encodes its own
index. `_l1_rows_dma(block=content(i), cand=[i]*128)` must return
exactly 0. For rows whose byte offset i*3072 crosses 2^31 / 2^32 we also
compute the distance PREDICTED by a mod-2^32 (and mod-2^31) offset wrap
— fetched bytes = lib_flat[(i*3072) % 2^w : +3072], reconstructed
analytically on the host — so a non-zero measurement identifies the
exact wrap width instead of just failing.

One device process (CLAUDE.md rule 4); ~15 s of device work after the
library build.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from emosaic_tpu.ops import distance  # noqa: E402
from emosaic_tpu.ops.distance import _l1_rows_dma, _rows_dma_mc  # noqa: E402

# this probe MEASURES the wrap on a deliberately oversized single buffer;
# disarm the production guard that would refuse the call
distance._DMA_LIB_BYTES_MAX = 1 << 60

_T0 = time.time()
D = 3072
LP = 2_000_000
OUT = "/root/repo/SCALE_r03.json"


def log(msg):
    print(f"[lim {time.time() - _T0:6.1f}s] {msg}", flush=True)


def sync(x):
    jax.device_get(x.ravel()[0])


def content_np(rows):
    """Host copy of the planted row contents, [len(rows), D] u8."""
    r = np.asarray(rows, np.int64)[:, None]
    trip = np.concatenate([r & 255, (r >> 8) & 255, (r >> 16) & 255], 1)
    return np.tile(trip, (1, D // 3)).astype(np.uint8)


def flat_bytes(lo, n):
    """lib.reshape(-1)[lo:lo+n] reconstructed on the host."""
    f = np.arange(lo, lo + n, dtype=np.int64)
    row, pos = f // D, f % D
    sel = pos % 3
    trip = np.stack([row & 255, (row >> 8) & 255, (row >> 16) & 255], 1)
    return trip[np.arange(n), sel].astype(np.uint8)


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    sync(jnp.ones((8, 128)) * 2)
    log("probe ok")

    nc = D // 3
    n = LP // 16
    place = jax.jit(
        lambda a, c, r0: jax.lax.dynamic_update_slice(a, c, (r0, 0)),
        donate_argnums=0,
    )

    @jax.jit
    def make_chunk(r0):
        ids = r0 + jnp.arange(n, dtype=jnp.int32)[:, None]
        trip = jnp.concatenate(
            [ids & 255, (ids >> 8) & 255, (ids >> 16) & 255], 1
        )
        return jnp.tile(trip, (1, nc)).astype(jnp.uint8)

    libp = jnp.zeros((LP, D), jnp.uint8)
    sync(libp)
    for c in range(16):
        libp = place(libp, make_chunk(jnp.int32(c * n)), jnp.int32(c * n))
    sync(libp)
    log(f"library [{LP}, {D}] planted (6.1 GB)")

    # boundaries: 2^31 / D = 699050.67, 2^32 / D = 1398101.33
    rows = [
        0,
        1_000,
        500_000,
        699_000,
        699_100,
        1_000_000,
        1_200_000,
        1_398_000,
        1_398_200,
        1_500_000,
        1_999_999,
    ]
    blocks = jnp.asarray(content_np(rows))
    m = 128
    cand = jnp.asarray(np.asarray(rows, np.int32)[:, None].repeat(m, 1))
    mc = _rows_dma_mc(m, D)
    dist = np.asarray(
        jax.device_get(_l1_rows_dma(blocks, cand, libp, mc=mc))
    )
    log(f"kernel done (mc={mc})")

    entry = {"LP": LP, "D": D, "rows": {}}
    ok_below_u32 = True
    wrap32_all = True
    for i, r in enumerate(rows):
        d0 = int(dist[i, 0])
        rec = {"dist": d0}
        blk = content_np([r])[0].astype(np.int32)
        for w, tag in ((31, "pred_wrap31"), (32, "pred_wrap32")):
            off = (r * D) % (1 << w)
            pred = int(
                np.abs(flat_bytes(off, D).astype(np.int32) - blk).sum()
            )
            rec[tag] = pred
        hit = (
            "exact"
            if d0 == 0
            else "wrap32"
            if d0 == rec["pred_wrap32"]
            else "wrap31"
            if d0 == rec["pred_wrap31"]
            else "OTHER"
        )
        rec["verdict"] = hit
        entry["rows"][str(r)] = rec
        if r * D < (1 << 32) and d0 != 0:
            ok_below_u32 = False
        if r * D >= (1 << 32) and hit not in ("wrap32", "exact"):
            wrap32_all = False
        log(f"row {r:>9} (off {r * D / 2**30:5.2f} GiB): dist {d0} -> {hit}")

    entry["ok_below_u32"] = ok_below_u32
    entry["wrap32_signature"] = wrap32_all
    try:
        with open(OUT) as f:
            results = json.load(f)
    except (OSError, ValueError):
        results = {}
    results["M_dma_limit"] = entry
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    log(f"M_dma_limit: {json.dumps(entry)[:400]}")
    log("all phases done")


if __name__ == "__main__":
    sys.exit(main() or 0)
