"""Round-3 follow-up: cheaper exact-L1 distance formulations + DMA issue
loop unrolling.

From tpu_r3_experiments.py: the flagship scoring floor is the distance
stripe itself (3.63 s at ~0.9 T elem/s, VPU-bound at ~3 ops/element:
widen/sub/abs/add). Candidates measured here — all EXACT:

  D1 min-identity: |x-t| = x + t - 2*min(x,t); per-element work becomes
     min+accumulate, with rank-1 corrections (col-sum of x per block is a
     constant shift that preserves per-row ordering; col-sum of t folds
     into a [bc, L] epilogue).
  D2 grouped i16 abs-diff: sum 64 u8 |diffs| in int16 (<= 16320, no
     overflow), then widen — half-width accumulate.
  D3 min-identity + grouped i16.
  D4 = D3 at bc=256 (chunk-size sensitivity).

Composite: C6 unrolls the per-copy DMA issue/wait loops (fori_loop ->
static Python range) to cut scalar-core overhead — double-buffering made
it *slower*, so the issue path is scalar-bound, not latency-bound.
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

T0 = time.time()
B, T, D, K = 16384, 32767, 3072, 512
L = 2 * T
I32_MAX = np.int32(2**31 - 1)


def log(msg):
    print(f"[r3exp2 {time.time() - T0:6.1f}s] {msg}", flush=True)


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


# ------------------------------------------------------- distance variants


def _chunked(blocks, per_chunk, bc):
    nb = blocks.shape[0] // bc
    return jax.lax.map(per_chunk, blocks.reshape(nb, bc, D)).reshape(-1)


@functools.partial(jax.jit, static_argnames=("bc",))
def d0_abs_i32(blocks, lib, *, bc):
    li = lib.astype(jnp.int32)

    def per_chunk(xc):
        dist = jnp.abs(xc.astype(jnp.int32)[:, None, :] - li[None]).sum(
            -1, dtype=jnp.int32
        )
        return dist.min(axis=1)

    return _chunked(blocks, per_chunk, bc)


@functools.partial(jax.jit, static_argnames=("bc",))
def d1_min_i32(blocks, lib, *, bc):
    ct = lib.astype(jnp.int32).sum(axis=1)  # [L]

    def per_chunk(xc):
        m = jnp.minimum(xc[:, None, :], lib[None]).astype(jnp.int32)
        s = m.sum(-1, dtype=jnp.int32)  # [bc, L]
        score = ct[None, :] - 2 * s  # dist = score + cx[b] (rank-1 shift)
        cx = xc.astype(jnp.int32).sum(-1)
        return score.min(axis=1) + cx

    return _chunked(blocks, per_chunk, bc)


@functools.partial(jax.jit, static_argnames=("bc",))
def d2_abs_i16(blocks, lib, *, bc):
    li = lib.astype(jnp.int16)

    def per_chunk(xc):
        ad = jnp.abs(xc.astype(jnp.int16)[:, None, :] - li[None])
        s = (
            ad.reshape(bc, L, D // 64, 64)
            .sum(-1, dtype=jnp.int16)
            .sum(-1, dtype=jnp.int32)
        )
        return s.min(axis=1)

    return _chunked(blocks, per_chunk, bc)


@functools.partial(jax.jit, static_argnames=("bc",))
def d3_min_i16(blocks, lib, *, bc):
    ct = lib.astype(jnp.int32).sum(axis=1)

    def per_chunk(xc):
        m = jnp.minimum(xc[:, None, :], lib[None]).astype(jnp.int16)
        s = (
            m.reshape(bc, L, D // 64, 64)
            .sum(-1, dtype=jnp.int16)
            .sum(-1, dtype=jnp.int32)
        )
        score = ct[None, :] - 2 * s
        cx = xc.astype(jnp.int32).sum(-1)
        return score.min(axis=1) + cx

    return _chunked(blocks, per_chunk, bc)


def distance_experiments():
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    blocks = jax.random.randint(k1, (B, D), 0, 256, dtype=jnp.uint8)
    lib = jax.random.randint(k2, (L, D), 0, 256, dtype=jnp.uint8)
    sync(blocks[:1])
    log("distance inputs ready")

    r0 = d0_abs_i32(blocks, lib, bc=128)
    for name, fn in [
        ("D0 abs i32 (baseline)", lambda: d0_abs_i32(blocks, lib, bc=128)),
        ("D1 min-identity i32", lambda: d1_min_i32(blocks, lib, bc=128)),
        ("D2 abs grouped-i16", lambda: d2_abs_i16(blocks, lib, bc=128)),
        ("D3 min-identity grouped-i16", lambda: d3_min_i16(blocks, lib, bc=128)),
        ("D4 = D3 bc=256", lambda: d3_min_i16(blocks, lib, bc=256)),
    ]:
        try:
            t = timeit(fn)
            rate = B * float(L) * D / t / 1e12
            log(f"{name}: {t:.3f} s ({rate:.2f} T elem/s)")
        except Exception as e:
            log(f"{name} FAILED: {type(e).__name__}: {str(e)[:160]}")

    for name, fn in [
        ("D1", lambda: d1_min_i32(blocks, lib, bc=128)),
        ("D2", lambda: d2_abs_i16(blocks, lib, bc=128)),
        ("D3", lambda: d3_min_i16(blocks, lib, bc=128)),
    ]:
        try:
            eq = bool(
                (
                    np.asarray(jax.device_get(fn()))
                    == np.asarray(jax.device_get(r0))
                ).all()
            )
            log(f"EQ {name} vs D0: {eq}")
        except Exception as e:
            log(f"EQ {name} FAILED: {type(e).__name__}")
    del blocks, lib, r0


# ------------------------------------------------------- composite unroll

NUM_TILES = 100_000
TS = 32
NBY, NBX = 32, 4096
_CH = composite._CH


def _dma_kernel_unrolled(rows_ref, aug_hbm, out_ref, scratch, sems, *, s3):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    base = (i * nj + j) * _CH
    for c in range(_CH):  # static unroll: no loop-carried scalar overhead
        pltpu.make_async_copy(
            aug_hbm.at[rows_ref[base + c]], scratch.at[c], sems.at[c]
        ).start()
    for c in range(_CH):
        pltpu.make_async_copy(aug_hbm.at[0], scratch.at[c], sems.at[c]).wait()
    for c in range(_CH):
        out_ref[:, c * s3 : (c + 1) * s3] = scratch[c][:, :s3]


@functools.partial(jax.jit, static_argnames=("ts",))
def _compose_rows_dma_unrolled(items, aug3, *, ts):
    nby, nbx = items.shape
    t = aug3.shape[0] // 2
    lane = aug3.shape[2]
    rows = composite._rows_of(items, t).astype(jnp.int32)
    nj = nbx // _CH
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nby, nj),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((ts, _CH * ts * 3), lambda i, j, *_: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((_CH, ts, lane), jnp.uint8),
            pltpu.SemaphoreType.DMA((_CH,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_dma_kernel_unrolled, s3=ts * 3),
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
    log(f"C0 dma fori issue: {t0 * 1e3:.2f} ms/band")
    try:
        t6 = timeit(
            lambda: _compose_rows_dma_unrolled(items, aug3, ts=TS), 4, 16
        )
        log(f"C6 dma unrolled issue: {t6 * 1e3:.2f} ms/band")
        eq = bool(
            (
                np.asarray(
                    jax.device_get(_compose_rows_dma_unrolled(items[:2], aug3, ts=TS))
                )
                == np.asarray(
                    jax.device_get(
                        composite._compose_rows_dma(items[:2], aug3, ts=TS)
                    )
                )
            ).all()
        )
        log(f"EQ C6 vs C0 (2 rows): {eq}")
    except Exception as e:
        log(f"C6 FAILED: {type(e).__name__}: {str(e)[:200]}")
    del tiles3, items, aug3, aug, flipped


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    x = jnp.ones((8, 128), jnp.float32)
    sync(x @ x.T)
    log("device probe ok")
    composite_experiments()
    distance_experiments()
    log("ALL DONE")


if __name__ == "__main__":
    main()
