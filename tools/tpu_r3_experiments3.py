"""Round-3 final variant sweep.

Composite (unrolled issue loop shipped at 2.70 ms/band):
  C8 unrolled + double-buffered: with the fori overhead gone, overlapping
     next-step issues with the current writeback may now win.
  C9 unrolled at _CH=256: fewer grid steps, more in-flight copies.

Scoring (two-level min-identity shipped at 3.72 s):
  S4 bc=256 chunks.
  S5 cap=4 (stage-2 input 2048 instead of 4096; certification rate drops
     a bit, fallback covers it).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emosaic_tpu.ops import composite
from emosaic_tpu.ops.distance import _l1_topk_twolevel_jit

T0 = time.time()
B, T, D, K = 16384, 32767, 3072, 512
L = 2 * T


def log(msg):
    print(f"[r3exp3 {time.time() - T0:6.1f}s] {msg}", flush=True)


def sync(x):
    while isinstance(x, (tuple, list)):
        x = x[0]
    jax.device_get(x.reshape(-1)[0])


def timeit(fn, k1=1, k2=2, reps=2):
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


NUM_TILES = 100_000
TS = 32
NBY, NBX = 32, 4096


def _mk_db_kernel(ch):
    def kernel(rows_ref, aug_hbm, out_ref, scratch, sems, *, s3, nsteps):
        i = pl.program_id(0)
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        step = i * nj + j
        slot = jax.lax.rem(step, 2)

        @pl.when(step == 0)
        def _first():
            for c in range(ch):
                pltpu.make_async_copy(
                    aug_hbm.at[rows_ref[c]], scratch.at[0, c], sems.at[0, c]
                ).start()

        @pl.when(step + 1 < nsteps)
        def _next():
            nbase = (step + 1) * ch
            for c in range(ch):
                pltpu.make_async_copy(
                    aug_hbm.at[rows_ref[nbase + c]],
                    scratch.at[1 - slot, c],
                    sems.at[1 - slot, c],
                ).start()

        for c in range(ch):
            pltpu.make_async_copy(
                aug_hbm.at[0], scratch.at[slot, c], sems.at[slot, c]
            ).wait()
        for c in range(ch):
            out_ref[:, c * s3 : (c + 1) * s3] = scratch[slot, c][:, :s3]

    return kernel


def _mk_sb_kernel(ch):
    def kernel(rows_ref, aug_hbm, out_ref, scratch, sems, *, s3):
        i = pl.program_id(0)
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        base = (i * nj + j) * ch
        for c in range(ch):
            pltpu.make_async_copy(
                aug_hbm.at[rows_ref[base + c]], scratch.at[c], sems.at[c]
            ).start()
        for c in range(ch):
            pltpu.make_async_copy(aug_hbm.at[0], scratch.at[c], sems.at[c]).wait()
        for c in range(ch):
            out_ref[:, c * s3 : (c + 1) * s3] = scratch[c][:, :s3]

    return kernel


@functools.partial(jax.jit, static_argnames=("ts", "ch", "db"))
def _compose_variant(items, aug3, *, ts, ch, db):
    nby, nbx = items.shape
    t = aug3.shape[0] // 2
    lane = aug3.shape[2]
    rows = composite._rows_of(items, t).astype(jnp.int32)
    nj = nbx // ch
    nsteps = nby * nj
    if db:
        kern = functools.partial(_mk_db_kernel(ch), s3=ts * 3, nsteps=nsteps)
        scratch = [
            pltpu.VMEM((2, ch, ts, lane), jnp.uint8),
            pltpu.SemaphoreType.DMA((2, ch)),
        ]
    else:
        kern = functools.partial(_mk_sb_kernel(ch), s3=ts * 3)
        scratch = [
            pltpu.VMEM((ch, ts, lane), jnp.uint8),
            pltpu.SemaphoreType.DMA((ch,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nby, nj),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((ts, ch * ts * 3), lambda i, j, *_: (i, j)),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nby * ts, nbx * ts * 3), jnp.uint8),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(rows, aug3)


def composite_experiments():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    tiles3 = jax.random.randint(
        k1, (NUM_TILES, TS, TS * 3), 0, 256, dtype=jnp.uint8
    )
    items = jax.random.randint(
        k2, (NBY, NBX), -NUM_TILES, NUM_TILES + 1, dtype=jnp.int32
    )
    lane = composite._lane(TS)
    t = tiles3.shape[0]
    flipped = tiles3.reshape(t, TS, TS, 3)[:, :, ::-1, :].reshape(t, TS, TS * 3)
    aug = jnp.concatenate(
        [tiles3, flipped, jnp.zeros((1, TS, TS * 3), jnp.uint8)]
    )
    aug3 = jnp.pad(aug, ((0, 0), (0, 0), (0, lane - TS * 3)))
    sync(aug3[:1, :1])
    log("composite inputs ready")

    t0 = timeit(lambda: composite._compose_rows_dma(items, aug3, ts=TS), 4, 16)
    log(f"C6 shipped unrolled ch=128: {t0 * 1e3:.2f} ms/band")
    ref = np.asarray(
        jax.device_get(composite._compose_rows_dma(items[:2], aug3, ts=TS))
    )
    for name, ch, db in [
        ("C8 unrolled db ch=128", 128, True),
        ("C9 unrolled sb ch=256", 256, False),
        ("C10 unrolled db ch=256", 256, True),
    ]:
        try:
            tt = timeit(lambda: _compose_variant(items, aug3, ts=TS, ch=ch, db=db), 4, 16)
            out = np.asarray(
                jax.device_get(_compose_variant(items[:2], aug3, ts=TS, ch=ch, db=db))
            )
            log(f"{name}: {tt * 1e3:.2f} ms/band EQ={bool((out == ref).all())}")
        except Exception as e:
            log(f"{name} FAILED: {type(e).__name__}: {str(e)[:160]}")
    del tiles3, items, aug3, aug, flipped, ref


def scoring_experiments():
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    blocks = jax.random.randint(k1, (B, D), 0, 256, dtype=jnp.uint8)
    lp = -(-L // 128) * 128
    lib = jnp.pad(
        jax.random.randint(k2, (L, D), 0, 256, dtype=jnp.uint8),
        ((0, lp - L), (0, 0)),
    )
    sync(blocks[:1])
    log("scoring inputs ready")
    bf, lf = blocks.reshape(-1), lib.reshape(-1)
    for name, bc, cap in [
        ("S3 shipped bc=128 cap=8", 128, 8),
        ("S4 bc=256 cap=8", 256, 8),
        ("S5 bc=128 cap=4", 128, 4),
    ]:
        try:
            tt = timeit(
                lambda: _l1_topk_twolevel_jit(
                    bf, lf, d=D, bc=bc, k=K, real_l=L, cap=cap
                ),
                1,
                2,
            )
            _, _, ok = _l1_topk_twolevel_jit(
                bf, lf, d=D, bc=bc, k=K, real_l=L, cap=cap
            )
            nok = int(np.asarray(jax.device_get(ok)).sum())
            log(f"{name}: {tt:.3f} s certified {nok}/{B}")
        except Exception as e:
            log(f"{name} FAILED: {type(e).__name__}: {str(e)[:160]}")


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    x = jnp.ones((8, 128), jnp.float32)
    sync(x @ x.T)
    log("device probe ok")
    composite_experiments()
    scoring_experiments()
    log("ALL DONE")


if __name__ == "__main__":
    main()
