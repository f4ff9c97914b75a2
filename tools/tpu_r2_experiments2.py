"""Round-2 follow-up: LUT row-gather match restructuring (VERDICT r1 #4).

Finding from tpu_r2_experiments.py: the gather engine is per-INDEX bound
(~8.6 ns for 4B elements) but 32B-row fetches cost only ~5.1 ns/index
(A3: 196 Mrows/s). So the mode-1 LUT match can fetch [key>>3] from a
[2^21, 8] table and select lane key&7 with vector math — cutting the
dominant 144 ms gather toward ~90 ms.

This script measures: (C1) row-width sweep at the full 16.7M-query count,
(C2) fused row-gather + lane-select producing the final i32 result, (C3)
the full restructured match phase (analysis -> LUT build -> row-gather
match) against the production match_phase for both time and bit-equality.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

T0 = time.time()
N = 4096 * 4096
NUM_TILES = 100_000
TILE_SIZE = 32
SRC = 4096


def log(msg):
    print(f"[r2exp2 {time.time() - T0:6.1f}s] {msg}", flush=True)


def sync(x):
    while isinstance(x, (tuple, list)):
        x = x[0]
    jax.device_get(x.reshape(-1)[0])


def timeit(fn, k1=1, k2=3, reps=2):
    def run(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn()
        sync(out)
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(k1) for _ in range(reps))
    t2 = min(run(k2) for _ in range(reps))
    return max((t2 - t1) / (k2 - k1), 1e-9)


@functools.partial(jax.jit, static_argnames=("w",))
def _row_gather(tab, idx, *, w):
    return tab[idx >> (w.bit_length() - 1)]


@functools.partial(jax.jit, static_argnames=("w",))
def _row_gather_select(tab, idx, *, w):
    """Fetch w-wide rows and select the target lane with vector math
    (avoids a second per-element gather)."""
    rows = tab[idx >> (w.bit_length() - 1)]  # [N, w] i32
    lane = (idx & (w - 1))[:, None]
    j = jnp.arange(w, dtype=jnp.int32)[None, :]
    return jnp.where(j == lane, rows, 0).sum(axis=1, dtype=jnp.int32)


@jax.jit
def _elem_gather(tab_flat, idx):
    return tab_flat[idx]


def main():
    log(f"devices: {jax.devices()}")
    jax.device_get((jnp.ones((8, 128)) @ jnp.ones((128, 8)))[0, 0])
    log("device probe ok")

    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, 1 << 24, dtype=jnp.int32)
    table = jax.random.randint(key, (1 << 24,), 0, 1 << 30, dtype=jnp.int32)
    sync(idx)
    sync(table)

    t0 = timeit(lambda: _elem_gather(table, idx))
    log(f"C0 element gather baseline: {t0*1e3:.1f} ms")

    for w in (2, 4, 8, 16):
        tab = table.reshape(-1, w)
        t = timeit(lambda: _row_gather(tab, idx, w=w))
        log(f"C1 row{w} gather ({w*4}B rows, {N} idx): {t*1e3:.1f} ms "
            f"= {N/t/1e6:.0f} Midx/s")

    for w in (4, 8, 16):
        tab = table.reshape(-1, w)
        t = timeit(lambda: _row_gather_select(tab, idx, w=w))
        ok = bool(
            np.array_equal(
                np.asarray(jax.device_get(_row_gather_select(tab, idx[:4096], w=w))),
                np.asarray(jax.device_get(_elem_gather(table, idx[:4096]))),
            )
        )
        log(f"C2 row{w} gather+select: {t*1e3:.1f} ms (bit-equal: {ok})")

    # C3: full restructured match phase vs the production one (bench.py
    # semantics: analysis -> library -> LUT -> match 16.7M packed queries)
    from emosaic_tpu.ops.lut import ROW_BITS, _build_l1_lut_jit

    k1, k2 = jax.random.split(key)
    tiles3 = jax.random.randint(
        k1, (NUM_TILES, TILE_SIZE, TILE_SIZE * 3), 0, 256, dtype=jnp.uint8
    )
    src_packed = jax.random.randint(k2, (SRC, SRC), 0, 1 << 24, dtype=jnp.int32)
    sync(tiles3)
    sync(src_packed)

    @functools.partial(jax.jit, static_argnames=("w",))
    def match_phase_rows(tiles3, src_packed, *, w):
        t = tiles3.shape[0]
        px = tiles3.reshape(t, TILE_SIZE, TILE_SIZE, 3).astype(jnp.int32)
        pal = (px.sum(axis=(1, 2)) // (TILE_SIZE * TILE_SIZE)).astype(jnp.uint8)
        lib = jnp.concatenate([pal, pal], axis=0)
        lut = _build_l1_lut_jit(lib.astype(jnp.int32))
        tab = lut.reshape(-1, w)
        idx = src_packed.reshape(-1)
        rows_w = tab[idx >> (w.bit_length() - 1)]
        lane = (idx & (w - 1))[:, None]
        j = jnp.arange(w, dtype=jnp.int32)[None, :]
        tkey = jnp.where(j == lane, rows_w, 0).sum(axis=1, dtype=jnp.int32)
        rows = tkey & ((1 << ROW_BITS) - 1)
        items = jnp.where(rows < t, rows + 1, -(rows - t + 1))
        return items.astype(jnp.int32).reshape(SRC, SRC)

    @jax.jit
    def match_phase_elem(tiles3, src_packed):
        t = tiles3.shape[0]
        px = tiles3.reshape(t, TILE_SIZE, TILE_SIZE, 3).astype(jnp.int32)
        pal = (px.sum(axis=(1, 2)) // (TILE_SIZE * TILE_SIZE)).astype(jnp.uint8)
        lib = jnp.concatenate([pal, pal], axis=0)
        lut = _build_l1_lut_jit(lib.astype(jnp.int32))
        tkey = lut.reshape(-1)[src_packed.reshape(-1)]
        rows = tkey & ((1 << ROW_BITS) - 1)
        items = jnp.where(rows < t, rows + 1, -(rows - t + 1))
        return items.astype(jnp.int32).reshape(SRC, SRC)

    t_elem = timeit(lambda: match_phase_elem(tiles3, src_packed), 1, 2)
    log(f"C3 production match phase (elem gather): {t_elem*1e3:.1f} ms")
    best = None
    for w in (8, 16):
        t_row = timeit(lambda: match_phase_rows(tiles3, src_packed, w=w), 1, 2)
        eq = bool(
            np.array_equal(
                np.asarray(jax.device_get(match_phase_rows(tiles3, src_packed, w=w))),
                np.asarray(jax.device_get(match_phase_elem(tiles3, src_packed))),
            )
        )
        log(f"C3 row{w} match phase: {t_row*1e3:.1f} ms (bit-equal: {eq})")
        if best is None or t_row < best[1]:
            best = (w, t_row)
    log(f"C3 best width: {best[0]} at {best[1]*1e3:.1f} ms vs elem {t_elem*1e3:.1f} ms")
    log("ALL EXPERIMENTS2 DONE")


if __name__ == "__main__":
    main()
