#!/usr/bin/env python3
"""Compile-only HBM accounting for the adaptive scorer's two jits at the
2M-row library, plus a 2-D flat-addressed variant of the DMA rescore
kernel (`lib` as [LP*sl, lw] — slab DMA at pl.ds(row*sl, sl) — instead
of the [LP, sl, lw] reshape, which is suspected to materialize a full
library relayout copy: 6.1 GB at L=2M, the OOM that killed phases
L2_ad2M even at a 1024-row slice).

Uses jit(...).lower(...).compile().memory_analysis() — no device arrays
are allocated, so this is safe to run even right after an OOM. Prints
argument/output/temp bytes per computation.
"""

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from emosaic_tpu.ops import distance as dd  # noqa: E402

LP = 2_000_000
D = 3072
M = 8192
B_SLICE = 1024
S = jax.ShapeDtypeStruct


def report(tag, compiled):
    ma = compiled.memory_analysis()
    gb = 1 << 30
    print(
        f"[{tag}] args {ma.argument_size_in_bytes / gb:.2f} GB, "
        f"out {ma.output_size_in_bytes / gb:.2f} GB, "
        f"temp {ma.temp_size_in_bytes / gb:.2f} GB, "
        f"peak(args+out+temp) "
        f"{(ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes) / gb:.2f} GB",
        flush=True,
    )


# --- 2-D flat-addressed DMA rescore variant -------------------------------

def _l1_rows_kernel2(cand_ref, x_ref, lib_hbm, out_ref, scratch, sems, *, mc, sl):
    i = pl.program_id(0)
    j = pl.program_id(1)
    base = (i * pl.num_programs(1) + j) * mc
    for c in range(mc):
        row = cand_ref[base + c]
        pltpu.make_async_copy(
            lib_hbm.at[pl.ds(row * sl, sl), :], scratch.at[c], sems.at[c]
        ).start()
    x = x_ref[0].astype(jnp.int32)  # [sl, lw]
    for c in range(mc):
        pltpu.make_async_copy(
            lib_hbm.at[pl.ds(0, sl), :], scratch.at[c], sems.at[c]
        ).wait()
    r2 = jnp.abs(scratch[...].astype(jnp.int32) - x[None]).sum(
        axis=1, dtype=jnp.int32
    )
    ones = jnp.ones((1, r2.shape[1]), jnp.float32)
    dist = jax.lax.dot_general(
        ones,
        r2.astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[0] = dist.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("mc", "interpret"))
def _l1_rows_dma2(blocks, cand, libp, *, mc, interpret=False):
    b, d = blocks.shape
    m = cand.shape[1]
    if d % 128 == 0:
        dp = -(-d // 1024) * 1024
        sl, lw = dp // 128, 128
    else:
        dp, sl, lw = d, 1, d
    if dp != d:
        blocks = jnp.pad(blocks, ((0, 0), (0, dp - d)))
        libp = jnp.pad(libp, ((0, 0), (0, dp - d)))
    lib2 = libp.reshape(-1, lw)  # [LP*sl, lw]
    bs = max(1, min(b, dd._SMEM_CAND_BUDGET // (4 * m)))
    bp = -(-b // bs) * bs
    blocks3 = jnp.pad(
        blocks.reshape(b, sl, lw), ((0, bp - b), (0, 0), (0, 0))
    )
    cand = jnp.minimum(cand, lib2.shape[0] // sl - 1)
    cand_p = jnp.pad(cand, ((0, bp - b), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bs, m // mc),
        in_specs=[
            pl.BlockSpec((1, sl, lw), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, mc), lambda i, j, *_: (i, 0, j)),
        scratch_shapes=[
            pltpu.VMEM((mc, sl, lw), jnp.uint8),
            pltpu.SemaphoreType.DMA((mc,)),
        ],
    )
    call = pl.pallas_call(
        functools.partial(_l1_rows_kernel2, mc=mc, sl=sl),
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((bs, 1, m), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    def per_chunk(args):
        cc, bl = args
        return call(cc.reshape(-1), bl, lib2)

    out = jax.lax.map(
        per_chunk,
        (
            cand_p.reshape(bp // bs, bs, m),
            blocks3.reshape(bp // bs, bs, sl, lw),
        ),
    )
    return out.reshape(bp, m)[:b]


def main():
    mc = dd._rows_dma_mc(M, D)
    print(f"device: {jax.devices()[0].platform}, mc={mc}", flush=True)

    flat = S((LP * D,), jnp.uint8)
    blocks = S((B_SLICE, D), jnp.uint8)
    blocks_flat = S((B_SLICE * D,), jnp.uint8)
    cand = S((B_SLICE, M), jnp.int32)
    nsegcap = (LP // 128) * 8
    vals = S((B_SLICE, nsegcap), jnp.int32)
    cols = S((B_SLICE, nsegcap), jnp.int32)
    smin = S((B_SLICE,), jnp.int32)

    # A: current 3-D reshape rescore DMA (isolated)
    f_a = jax.jit(
        lambda fl, b, c: dd._l1_rows_dma(b, c, fl.reshape(LP, D), mc=mc)
    )
    report("A_rows_dma_3d", f_a.lower(flat, blocks, cand).compile())

    # B: 2-D flat-addressed variant (isolated)
    f_b = jax.jit(
        lambda fl, b, c: _l1_rows_dma2(b, c, fl.reshape(LP, D), mc=mc)
    )
    report("B_rows_dma_2d", f_b.lower(flat, blocks, cand).compile())

    # C: full production rescore jit
    f_c = functools.partial(
        dd._ad_rescore_jit, d=D, bc=64, m=M, k=512, real_l=LP, use_dma=True
    )
    report(
        "C_ad_rescore",
        jax.jit(f_c).lower(blocks_flat, vals, cols, smin, flat).compile(),
    )

    # D: full production coarse jit
    f_d = functools.partial(
        dd._ad_coarse_jit, d=D, g=32, chan=True, bc=128, cap=8, real_l=LP
    )
    report("D_ad_coarse", jax.jit(f_d).lower(blocks_flat, flat).compile())
    print("analysis done", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
