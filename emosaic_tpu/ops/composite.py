"""Mosaic composition: device-side gather of tile images + fused tint blend.

Replaces the reference's per-block `imageops::replace/overlay` placement
loops (rendering.rs:76-99, :346-381) with a gather over the prepared-tile
stack, and the host-side RGBA tint overlay (main.rs:447-465) with a fused
alpha blend.

Flip handling mirrors tileset.rs:146-161 `get_image`: negative item ids
select the horizontally mirrored tile image. The augmented stack holds
[originals; mirrored copies; one black row], so flips and the
unassigned-block case (item 0 -> black, like the reference's skipped
blocks in rendering.rs:349-351) are plain row selection.

Three composite paths, fastest first (per 1.61 GB band, measured v5e):
  1. `_compose_rows_dma` (~11 ms): a Pallas kernel with scalar-prefetched
     row indices issuing per-tile DMA gathers HBM->VMEM (statically
     unrolled — the path is scalar-issue-rate bound) and writing the
     band in final row-major layout — no intermediate buffer at all.
  2. `_compose_rows_pallas` (~27 ms): XLA row gather into a pre-tiled
     [*, ts, lane] intermediate + a VMEM-blocked transpose kernel.
  3. `_compose_rows_xla` (~64 ms, portable): gather + XLA transpose.

TPU layout notes: arrays crossing the jit boundary are kept 2D/3D with
large minor dimensions — a `u8[..., 3]` boundary buffer gets the
(8,128)-lane tiled layout on the size-3 minor dim (~42x inflation;
observed: a 1.6 GB band would allocate 64 GB). Stack rows are lane-padded
to multiples of 128 because DMA slices must be 128-aligned.
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: tiles per transpose/DMA chunk (block columns are padded to this)
_CH = 128
#: scalar-prefetch row indices must fit SMEM (1 MB): 512 KB of int32
_DMA_MAX_ROWS = 131072
#: VMEM budget for the DMA path's scratch + out blocks
_DMA_VMEM_BUDGET = 10 * 2**20
#: stack-byte ceiling for the DMA path: Pallas dynamic `.at[row]` byte
#: offsets wrap mod 2^32 (measured on the distance DMA kernel at a
#: 6.1 GB buffer — distance._DMA_LIB_BYTES_MAX / SCALE_r03 M_dma_limit),
#: so a >4 GiB augmented stack (e.g. ~131k tiles at ts=64 after
#: mirroring + lane padding) would fetch mod-aliased tile rows. Route
#: such stacks to `_compose_rows_pallas`: its row gather is XLA
#: (64-bit-safe; the megascale scale runs sliced 6.1 GB buffers via XLA
#: exactly), only its band-sized transpose input enters Pallas.
_DMA_STACK_BYTES_MAX = 1 << 32


def _lane(ts: int) -> int:
    """Padded row width for a [ts, ts*3] tile row (128-aligned for DMA)."""
    return -(-ts * 3 // 128) * 128


def _rows_of(items: jax.Array, t: int):
    """Signed items -> augmented-stack rows (tileset.rs:131-143 convention;
    rows T..2T are the pre-mirrored copies, row 2T is black for item 0)."""
    flat = items.reshape(-1)
    rows = jnp.clip(jnp.where(flat >= 0, flat - 1, t - flat - 1), 0, 2 * t - 1)
    return jnp.where(flat == 0, 2 * t, rows)


@functools.partial(jax.jit, static_argnames=("ts",))
def _compose_rows_xla(items: jax.Array, aug3: jax.Array, *, ts: int):
    """Portable path: gather + XLA transpose.
    items [nby, nbx] i32, aug3 [2T+1, ts, lane] u8 -> [nby*ts, nbx*ts*3]."""
    nby, nbx = items.shape
    t = aug3.shape[0] // 2
    sel = aug3[_rows_of(items, t)][:, :, : ts * 3]  # [B, ts, ts*3]
    band = sel.reshape(nby, nbx, ts, ts * 3)
    return jnp.transpose(band, (0, 2, 1, 3)).reshape(nby * ts, nbx * ts * 3)


def _tr_kernel(in_ref, out_ref, *, s3: int):
    # [CH, ts, lane] tile chunk -> [ts, CH*ts*3] band segment; explicit
    # per-tile copies (a jnp 3D transpose crashes the Mosaic compiler, and
    # element-gather formulations run ~4-8x slower — measured on v5e)
    for c in range(_CH):
        out_ref[:, c * s3 : (c + 1) * s3] = in_ref[c][:, :s3]


@functools.partial(jax.jit, static_argnames=("ts", "interpret"))
def _compose_rows_pallas(
    items: jax.Array, aug3: jax.Array, *, ts: int, interpret: bool = False
):
    """TPU middle path: row gather from the pre-tiled stack + VMEM-blocked
    transpose kernel. Requires ts % 8 == 0 and nbx % _CH == 0."""
    nby, nbx = items.shape
    t = aug3.shape[0] // 2
    lane = aug3.shape[2]
    sel = aug3[_rows_of(items, t)]  # [B, ts, lane], tiled layout
    nj = nbx // _CH
    return pl.pallas_call(
        functools.partial(_tr_kernel, s3=ts * 3),
        grid=(nby, nj),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(
                (_CH, ts, lane),
                lambda i, j: (i * nj + j, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (ts, _CH * ts * 3), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nby * ts, nbx * ts * 3), jnp.uint8),
    )(sel)


def _dma_kernel(rows_ref, aug_hbm, out_ref, scratch, sems, *, s3: int):
    """Fused gather+layout: per grid step, DMA _CH selected tile images
    HBM->VMEM (row indices scalar-prefetched), then write them into the
    band at their final positions. No HBM intermediate.

    The issue/wait loops are statically unrolled: the path is bound by
    the scalar core's per-copy issue rate, and a fori_loop's loop-carried
    overhead nearly doubles it (4.97 -> 2.70 ms per 402 MB band measured
    on v5e, tools/tpu_r3_experiments2.py C6; double-buffering the scratch
    measured *slower* for the same reason, and sequential vs random row
    indices measure the same, so HBM locality is not a factor)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    base = (i * nj + j) * _CH
    for c in range(_CH):
        pltpu.make_async_copy(
            aug_hbm.at[rows_ref[base + c]], scratch.at[c], sems.at[c]
        ).start()
    for c in range(_CH):
        pltpu.make_async_copy(aug_hbm.at[0], scratch.at[c], sems.at[c]).wait()
    for c in range(_CH):
        out_ref[:, c * s3 : (c + 1) * s3] = scratch[c][:, :s3]


@functools.partial(jax.jit, static_argnames=("ts", "interpret"))
def _compose_rows_dma(
    items: jax.Array, aug3: jax.Array, *, ts: int, interpret: bool = False
):
    """TPU fast path (see module docstring). Caller guarantees
    nby*nbx <= _DMA_MAX_ROWS, nbx % _CH == 0, ts % 8 == 0, VMEM budget."""
    nby, nbx = items.shape
    t = aug3.shape[0] // 2
    lane = aug3.shape[2]
    if not interpret and aug3.size > _DMA_STACK_BYTES_MAX:
        # .at[row] offsets wrap mod 2^32 — aliased tile rows, silently
        raise ValueError(
            f"augmented stack of {aug3.size} bytes exceeds the DMA "
            f"row-offset addressing limit ({_DMA_STACK_BYTES_MAX}); "
            "use _compose_rows_pallas (see _compose_rows_2d dispatch)"
        )
    rows = _rows_of(items, t).astype(jnp.int32)
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
        functools.partial(_dma_kernel, s3=ts * 3),
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((nby * ts, nbx * ts * 3), jnp.uint8),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(rows, aug3)


def _dma_vmem_ok(ts: int) -> bool:
    lane = _lane(ts)
    return _CH * ts * lane + ts * _CH * ts * 3 <= _DMA_VMEM_BUDGET


def _compose_rows_2d(items: jax.Array, aug3: jax.Array, *, ts: int):
    """Dispatch: DMA-fused / pallas-transpose on TPU when shapes allow,
    XLA otherwise. items [nby, nbx] i32 (caller pads columns), aug3
    [2T+1, ts, lane] u8 (see `augment_stack2d`)."""
    nby, nbx = items.shape
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu and ts % 8 == 0 and nbx % _CH == 0:
        if _dma_dispatch_ok(nby, nbx, ts, aug3.size):
            return _compose_rows_dma(items, aug3, ts=ts)
        return _compose_rows_pallas(items, aug3, ts=ts)
    return _compose_rows_xla(items, aug3, ts=ts)


def _dma_dispatch_ok(nby: int, nbx: int, ts: int, stack_bytes: int) -> bool:
    """DMA fast-path admission: scalar-prefetch budget, VMEM budget, and
    the 4 GiB row-offset addressing limit (`_DMA_STACK_BYTES_MAX`)."""
    return (
        nby * nbx <= _DMA_MAX_ROWS
        and _dma_vmem_ok(ts)
        and stack_bytes <= _DMA_STACK_BYTES_MAX
    )


def augment_stack2d(stack) -> tuple[jax.Array, int]:
    """[T, ts, ts, 3] uint8 -> device [2T+1, ts, lane] stack: originals,
    mirrored copies (the composite analogue of build_library's flip rows),
    and a black row for unassigned blocks; rows lane-padded to 128."""
    stack = np.asarray(stack, dtype=np.uint8)
    t, ts = stack.shape[0], stack.shape[1]
    lane = _lane(ts)
    aug = np.zeros((2 * t + 1, ts, lane), dtype=np.uint8)
    aug[:t, :, : ts * 3] = stack.reshape(t, ts, ts * 3)
    aug[t : 2 * t, :, : ts * 3] = stack[:, :, ::-1, :].reshape(t, ts, ts * 3)
    return jnp.asarray(aug), ts


def _compose_host(items_np: np.ndarray, aug3: jax.Array, ts: int) -> np.ndarray:
    """Pad block columns for the kernel chunking, split rows to respect the
    scalar-prefetch budget, compose, slice back."""
    nby, nbx = items_np.shape
    nbxp = -(-nbx // _CH) * _CH
    if nbxp != nbx:
        items_np = np.pad(items_np, ((0, 0), (0, nbxp - nbx)))  # 0 = black
    rows_per_call = max(1, _DMA_MAX_ROWS // nbxp)
    parts = []
    for y0 in range(0, nby, rows_per_call):
        part = jnp.asarray(items_np[y0 : y0 + rows_per_call])
        band = _compose_rows_2d(part, aug3, ts=ts)
        h = part.shape[0] * ts
        parts.append(np.asarray(jax.device_get(band)).reshape(h, nbxp * ts, 3))
    out = parts[0] if len(parts) == 1 else np.concatenate(parts, axis=0)
    return out[:, : nbx * ts] if nbxp != nbx else out


def compose_mosaic(items, stack) -> np.ndarray:
    """Assemble the mosaic image from signed tile selections.

    Args:
      items: [nby, nbx] int32 signed 1-based item ids (negative = flipped),
        the convention of tileset.rs:131-143; 0 = unassigned (black).
      stack: [T, ts, ts, 3] uint8 prepared tile images (1-based item id i
        lives at stack[i-1]).

    Returns:
      [nby*ts, nbx*ts, 3] uint8 mosaic (host numpy).
    """
    items = np.asarray(items, dtype=np.int32)
    aug3, ts = augment_stack2d(stack)
    return _compose_host(items, aug3, ts)


def iter_bands(items, stack, band_rows: int = 8) -> Iterator[np.ndarray]:
    """Stream the mosaic as horizontal bands of `band_rows` block-rows.

    For gigapixel outputs the full mosaic cannot live in HBM or host RAM;
    each yielded band is `[band_rows*ts, nbx*ts, 3]` uint8 on host, ready
    for a streaming PNG encoder (SURVEY.md section 7 "composite kernel").
    """
    items = np.asarray(items, dtype=np.int32)
    aug3, ts = augment_stack2d(stack)
    nby = items.shape[0]
    for y0 in range(0, nby, band_rows):
        yield _compose_host(items[y0 : y0 + band_rows], aug3, ts)


def iter_bands_host(
    items, tile_set, tile_size: int, band_rows: int = 4, cache_tiles: int = 4096
) -> Iterator[np.ndarray]:
    """Host-side banded composite for stacks too large for RAM/HBM
    (tile_size x library combos past ~10 GB — SURVEY §7 "memory geometry").

    Tile images stream from the prepared-tile disk cache with an LRU, the
    way the reference composes every block (tileset.rs:146-161 re-reads the
    cache per placement); flips are applied per placement. Slow relative to
    the device paths but memory-bounded: one band + the LRU.
    """
    import functools as _ft

    items = np.asarray(items, dtype=np.int32)
    nby, nbx = items.shape

    @_ft.lru_cache(maxsize=cache_tiles)
    def tile_img(idx: int) -> np.ndarray:
        from emosaic_tpu.io.prep import prepare_tile

        return prepare_tile(tile_set.get_path(idx), tile_size, crop=True)

    for y0 in range(0, nby, band_rows):
        rows = items[y0 : y0 + band_rows]
        band = np.zeros(
            (rows.shape[0] * tile_size, nbx * tile_size, 3), dtype=np.uint8
        )
        for by in range(rows.shape[0]):
            for bx in range(nbx):
                it = int(rows[by, bx])
                if it == 0:
                    continue
                img = tile_img(abs(it))
                if it < 0:
                    img = img[:, ::-1, :]
                band[
                    by * tile_size : (by + 1) * tile_size,
                    bx * tile_size : (bx + 1) * tile_size,
                ] = img
        yield band


# ---------------------------------------------------------------------------
# tint blending (reference main.rs:447-478)
# ---------------------------------------------------------------------------


def tint_scalars(alpha_255: int) -> np.ndarray:
    """The per-call f32 scalars of image-0.25.2's `Rgba::blend` (color.rs),
    computed host-side with numpy f32 (IEEE single, one rounding per op —
    the same semantics as Rust f32 expression evaluation).

    Returns [max_t, fg_a, 1-fg_a, alpha_final] as float32. With an opaque
    background (bg_a = 1.0, main.rs:464 converts RGB8 -> RGBA8) the crate's
    `alpha_final = bg_a + fg_a - bg_a*fg_a` is exactly 1.0 for 224 of the
    256 alphas and 1-2^-24 for the rest (alpha % 4 == 0, alpha >= 128) —
    the division below is therefore load-bearing and kept.
    """
    mt = np.float32(255.0)
    one = np.float32(1.0)
    fg_a = np.float32(np.float32(alpha_255) / mt)
    af = np.float32(np.float32(one + fg_a) - np.float32(one * fg_a))
    return np.array([mt, fg_a, np.float32(one - fg_a), af], np.float32)


def ref_tint_blend_u8(bg_u8, fg_u8, alpha_255: int) -> np.ndarray:
    """Scalar port of the reference tint compositing, bit-exact oracle.

    main.rs:447-478: overlay alpha = (255*opacity) as u8 (truncating),
    then imageops::overlay -> Rgba::blend per pixel (image-0.25.2
    src/color.rs `impl Blend for Rgba`): normalize to f32, src-over
    compositing with premultiplied channels, unmultiply by alpha_final,
    then `NumCast::from(255*out)` which TRUNCATES (num-traits float->u8
    goes through trunc + range check + `as` cast). Background is opaque.

    Every numpy op below rounds to f32 exactly once, in the crate's
    evaluation order; the device kernel `_tint_blend_2d` is CI-verified
    bit-equal to this for all 256 alphas x 65536 channel pairs
    (tests/test_ops.py).
    """
    mt, fg_a, inv, af = tint_scalars(alpha_255)
    one = np.float32(1.0)
    bg_r = np.float32(np.asarray(bg_u8, np.uint8).astype(np.float32) / mt)
    fg_r = np.float32(np.asarray(fg_u8, np.uint8).astype(np.float32) / mt)
    t = np.float32(
        np.float32(fg_r * fg_a) + np.float32(np.float32(bg_r * one) * inv)
    )
    u = np.float32(t / af)
    return np.trunc(np.float32(mt * u)).astype(np.uint8)


def _u8_over_255_f32(x_u8):
    """fl32(x / 255) for u8 x, computed WITHOUT a division.

    TPU f32 division is reciprocal+Newton, not correctly rounded (the
    on-chip exhaustive check caught ~7% off-by-one-ulp pixels through a
    real fdiv) — so the quotient is built from exact operations only:
    x/255 = p / (2^32 - 1) with p = x * 16843009 (exact: 255 * 16843009
    = 2^32 - 1). The u32->f32 convert rounds p to 24 bits (RNE); the
    true quotient exceeds p * 2^-32 by p * 2^-64 + ..., which matters
    exactly at conversion *ties* — adding 1 to p breaks those upward
    (host-enumerated: changes no non-tie case; x = 0 must stay 0 and
    x = 255 would overflow, both excluded from the nudge). The 2^-32
    scale is a pure exponent shift (exact). Verified against
    fl32(x/255.0) for all 256 values (tests + on-chip check).
    """
    p = x_u8.astype(jnp.uint32) * jnp.uint32(16843009)
    nudge = ((x_u8 > 0) & (x_u8 < 255)).astype(jnp.uint32)
    return (p + nudge).astype(jnp.float32) * jnp.float32(2.0**-32)


def _tint_sample_indices(bh, ow, sh, sw, out_h, y0):
    """Host-side nearest-neighbor sample grid at output-pixel centers,
    like image::imageops::resize(FilterType::Nearest) (main.rs:456-461).
    Passed to the jit as operands so a streamed render's per-band y0
    does not trigger a recompile per band (the kernel compiles once per
    band *shape*).

    Arithmetic is deliberately FLOAT32, op for op what the kernel used
    to compute on-device ((i32->f32 index + 0.5f) * f32(ratio), truncate)
    — host f64 would pick different source rows near rounding boundaries
    for ~half of (sh, out_h) pairs, silently changing tinted pixels vs
    prior releases and the reference's own f32 resize arithmetic."""
    yr = np.float32(sh / out_h)
    yi = np.clip(
        (
            (np.arange(y0, y0 + bh, dtype=np.int32).astype(np.float32)
             + np.float32(0.5))
            * yr
        ).astype(np.int32),
        0,
        sh - 1,
    )
    xr = np.float32(sw / ow)
    xi = np.clip(
        (
            (np.arange(ow, dtype=np.int32).astype(np.float32)
             + np.float32(0.5))
            * xr
        ).astype(np.int32),
        0,
        sw - 1,
    )
    xi3 = (xi[:, None] * 3 + np.arange(3)[None, :]).reshape(-1)
    return yi.astype(np.int32), xi3.astype(np.int32)


@functools.partial(jax.jit, static_argnames=("bump",))
def _tint_blend_2d(band2d, src2d, scal, yi, xi3, *, bump: bool):
    """band2d [bh, ow*3] u8, src2d [sh, sw*3] u8 -> blended [bh, ow*3] u8.

    (yi, xi3) are the host-computed nearest-sample indices
    (`_tint_sample_indices`), then the `Rgba::blend` arithmetic of
    `ref_tint_blend_u8` runs bit-exact on every backend. Three
    compiler/hardware hazards are designed out (each one was CAUGHT
    producing off-by-one pixels by the exhaustive oracle check):
    - x/255 via compile-time constant: XLA strength-reduces to
      x * (1/255.0). x/255 via runtime operand: exact on CPU but TPU
      fdiv is reciprocal+Newton. -> no division at all; see
      `_u8_over_255_f32` and the `bump` tail below.
    - mul feeding add: codegen contracts to FMA, skipping the product's
      rounding. -> products pass through abs(-x) (bit-identity for these
      non-negative values) + an optimization barrier.
    - the crate's alpha_final is 1 - 2^-24 (not 1.0) for 32 alphas; the
      division by it equals a one-ulp bit-increment for every reachable
      sum t (host-enumerated identity over all 65536 pairs per alpha) —
      `bump` selects that integer-exact tail, so alpha_final never
      reaches the device.
    """
    up = src2d[yi][:, xi3]
    mt, fg_a, inv = scal[0], scal[1], scal[2]
    fg_r = _u8_over_255_f32(up)
    bg_r = _u8_over_255_f32(band2d)
    prod_fg = jnp.abs(-(fg_r * fg_a))
    prod_bg = jnp.abs(-((bg_r * jnp.float32(1.0)) * inv))
    prod_fg, prod_bg = jax.lax.optimization_barrier((prod_fg, prod_bg))
    t = prod_fg + prod_bg
    if bump:
        t_bits = jax.lax.bitcast_convert_type(t, jnp.uint32)
        t_up = jax.lax.bitcast_convert_type(
            t_bits + jnp.uint32(1), jnp.float32
        )
        t = jnp.where(t == 0, t, t_up)
    return jnp.clip(jnp.trunc(mt * t), 0, 255).astype(jnp.uint8)


def tint_blend_band(band, src, y0: int, out_h: int, tint_opacity: float):
    """Per-band tint blend for the streamed gigapixel path: identical math
    to `tint_blend` applied to output rows [y0, y0+h)."""
    alpha = int(255.0 * float(tint_opacity))
    band = np.asarray(band, dtype=np.uint8)
    if alpha <= 0:
        # pure optimization: the blend with fg_a = 0 is the identity
        # (CI-verified bit-equal for all 65536 channel pairs at alpha 0)
        return band
    bh, ow = band.shape[0], band.shape[1]
    src = np.asarray(src, dtype=np.uint8)
    scal = tint_scalars(alpha)
    yi, xi3 = _tint_sample_indices(
        bh, ow, src.shape[0], src.shape[1], out_h, y0
    )
    out = _tint_blend_2d(
        jnp.asarray(band.reshape(bh, ow * 3)),
        jnp.asarray(src.reshape(src.shape[0], -1)),
        jnp.asarray(scal),
        jnp.asarray(yi),
        jnp.asarray(xi3),
        bump=bool(scal[3] != np.float32(1.0)),
    )
    return np.asarray(jax.device_get(out)).reshape(bh, ow, 3)


def stream_tinted_bands(
    items,
    tile_set,
    stack,
    tile_size: int,
    *,
    original_rgb=None,
    tint_opacity: float = 0.0,
    band_budget: int = 256 << 20,
):
    """Compose the mosaic as bands — device path when `stack` is given,
    host-LRU path otherwise — tint-blending each band when requested.
    Yields [h, W, 3] u8 bands top to bottom.

    The single source of truth for the gigapixel streaming pipeline:
    the CLI's banded PNG path and serve's chunked responses both use it
    (they are contract-bound to be pixel-identical).
    """
    items = np.asarray(items, dtype=np.int32)
    nby, nbx = items.shape
    out_h = nby * tile_size
    band_rows = max(1, band_budget // (nbx * tile_size**2 * 3))
    if stack is None:
        bands = iter_bands_host(items, tile_set, tile_size, band_rows=band_rows)
    else:
        bands = iter_bands(items, stack, band_rows=band_rows)
    tinting = original_rgb is not None and tint_opacity > 0.0
    y0 = 0
    for band in bands:
        if tinting:
            band = tint_blend_band(band, original_rgb, y0, out_h, tint_opacity)
        y0 += band.shape[0]
        yield band


def tint_blend(mosaic, src, tint_opacity: float) -> np.ndarray:
    """Alpha-composite the source image over the mosaic.

    Mirrors main.rs:447-465: overlay alpha is floor(255 * tint_opacity)
    (the reference's `as u8` cast truncates), source is nearest-upscaled to
    the output size, then `Rgba::blend` src-over compositing over an opaque
    background — bit-exact vs `ref_tint_blend_u8` (the scalar port of the
    image-0.25.2 float path, truncating final cast), CI-verified for all
    256 alphas x 65536 channel pairs.
    """
    mosaic = np.asarray(mosaic, dtype=np.uint8)
    return tint_blend_band(mosaic, src, 0, mosaic.shape[0], tint_opacity)
