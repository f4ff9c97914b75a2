"""Mosaic composition: device-side gather of tile images + fused tint blend.

Replaces the reference's per-block `imageops::replace/overlay` placement
loops (rendering.rs:76-99, :346-381) with a single gather/transpose over the
prepared-tile stack, and the host-side RGBA tint overlay (main.rs:447-465)
with a fused alpha blend.

Flip handling mirrors tileset.rs:146-161 `get_image`: negative item ids
select the horizontally mirrored tile image.

TPU layout note: arrays crossing the jit boundary are kept 2D with large
minor dimensions. A `u8[..., 3]` boundary buffer gets the (8,128)-lane
tiled layout on the size-3 minor dim — a ~42x physical inflation (observed
on v5e: a 1.6 GB band would allocate 64 GB). Pixel data therefore travels
as `[rows, width*3]` and is reshaped on the host.
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: tiles per pallas transpose chunk (block columns are padded to this)
_CH = 128


def _rows_of(items: jax.Array, t: int):
    """Signed items -> augmented-stack rows (tileset.rs:131-143 convention;
    rows T..2T are the pre-mirrored copies). item 0 stays masked black."""
    flat = items.reshape(-1)
    rows = jnp.clip(jnp.where(flat >= 0, flat - 1, t - flat - 1), 0, 2 * t - 1)
    return rows, flat


@functools.partial(jax.jit, static_argnames=("ts",))
def _compose_rows_xla(items: jax.Array, aug3: jax.Array, *, ts: int):
    """Portable path: gather + XLA transpose.
    items [nby, nbx] i32, aug3 [2T, ts, ts*3] u8 -> [nby*ts, nbx*ts*3]."""
    nby, nbx = items.shape
    t = aug3.shape[0] // 2
    rows, flat = _rows_of(items, t)
    sel = aug3[rows]  # [B, ts, ts*3]
    sel = jnp.where((flat == 0)[:, None, None], jnp.uint8(0), sel)
    band = sel.reshape(nby, nbx, ts, ts * 3)
    return jnp.transpose(band, (0, 2, 1, 3)).reshape(nby * ts, nbx * ts * 3)


def _tr_kernel(in_ref, out_ref):
    # [CH, ts, ts*3] tile chunk -> [ts, CH*ts*3] band segment; explicit
    # per-tile copies (a jnp 3D transpose crashes the Mosaic compiler, and
    # element-gather formulations run ~4-8x slower — measured on v5e)
    for c in range(_CH):
        out_ref[:, c * in_ref.shape[2] : (c + 1) * in_ref.shape[2]] = in_ref[c]


@functools.partial(jax.jit, static_argnames=("ts",))
def _compose_rows_pallas(items: jax.Array, aug3: jax.Array, *, ts: int):
    """TPU fast path: row gather from the pre-tiled stack + VMEM-blocked
    transpose kernel. ~2.4x the XLA path on v5e (26.5 vs 64 ms for a
    1.6 GB band): the pre-tiled [2T, ts, ts*3] operand avoids a per-band
    boundary relayout, and the kernel's blocks are large and contiguous on
    both sides. Requires ts % 8 == 0 and nbx % _CH == 0 (caller pads)."""
    nby, nbx = items.shape
    t = aug3.shape[0] // 2
    rows, flat = _rows_of(items, t)
    sel = aug3[rows]  # [B, ts, ts*3] — stays in the tiled layout
    sel = jnp.where((flat == 0)[:, None, None], jnp.uint8(0), sel)
    nj = nbx // _CH
    return pl.pallas_call(
        _tr_kernel,
        grid=(nby, nj),
        in_specs=[
            pl.BlockSpec(
                (_CH, ts, ts * 3),
                lambda i, j: (i * nj + j, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (ts, _CH * ts * 3), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nby * ts, nbx * ts * 3), jnp.uint8),
    )(sel)


def _compose_rows_2d(items: jax.Array, aug3: jax.Array, *, ts: int):
    """Dispatch: pallas on TPU when shapes allow, XLA otherwise.
    items [nby, nbx] i32 (may be padded by caller), aug3 [2T, ts, ts*3]."""
    nbx = items.shape[1]
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu and ts % 8 == 0 and nbx % _CH == 0:
        return _compose_rows_pallas(items, aug3, ts=ts)
    return _compose_rows_xla(items, aug3, ts=ts)


def augment_stack2d(stack) -> tuple[jax.Array, int]:
    """[T, ts, ts, 3] uint8 -> device [2T, ts, ts*3] with mirrored copies
    in rows T..2T (the composite analogue of build_library's flip rows).
    The 3D shape is deliberate: it pre-pays the TPU tiled-layout cost once
    instead of per band."""
    stack = np.asarray(stack, dtype=np.uint8)
    t, ts = stack.shape[0], stack.shape[1]
    flipped = stack[:, :, ::-1, :]
    aug = np.concatenate(
        [stack.reshape(t, ts, ts * 3), flipped.reshape(t, ts, ts * 3)]
    )
    return jnp.asarray(aug), ts


def _compose_host(items_np: np.ndarray, aug3: jax.Array, ts: int) -> np.ndarray:
    """Pad block columns for the pallas chunking, compose, slice back."""
    nby, nbx = items_np.shape
    nbxp = -(-nbx // _CH) * _CH
    if nbxp != nbx:
        items_np = np.pad(items_np, ((0, 0), (0, nbxp - nbx)))  # 0 = black
    band = _compose_rows_2d(jnp.asarray(items_np), aug3, ts=ts)
    out = np.asarray(jax.device_get(band)).reshape(nby * ts, nbxp * ts, 3)
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


# ---------------------------------------------------------------------------
# tint blending (reference main.rs:447-478)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("alpha_255", "out_h", "y0"))
def _tint_blend_2d(band2d, src2d, *, alpha_255: int, out_h: int, y0: int):
    """band2d [bh, ow*3] u8, src2d [sh, sw*3] u8 -> blended [bh, ow*3] u8.

    Nearest-neighbor upscale sampling at output-pixel centers, like
    image::imageops::resize(FilterType::Nearest) (main.rs:456-461).
    """
    bh, ow3 = band2d.shape
    ow = ow3 // 3
    sh, sw = src2d.shape[0], src2d.shape[1] // 3
    yi = jnp.clip(
        ((jnp.arange(y0, y0 + bh) + 0.5) * (sh / out_h)).astype(jnp.int32),
        0,
        sh - 1,
    )
    xi = jnp.clip(((jnp.arange(ow) + 0.5) * (sw / ow)).astype(jnp.int32), 0, sw - 1)
    xi3 = (xi[:, None] * 3 + jnp.arange(3)[None, :]).reshape(-1)  # [ow*3]
    up = src2d[yi][:, xi3].astype(jnp.float32)
    a = alpha_255 / 255.0
    out = up * a + band2d.astype(jnp.float32) * (1.0 - a)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def tint_blend_band(band, src, y0: int, out_h: int, tint_opacity: float):
    """Per-band tint blend for the streamed gigapixel path: identical math
    to `tint_blend` applied to output rows [y0, y0+h)."""
    alpha = int(255.0 * float(tint_opacity))
    band = np.asarray(band, dtype=np.uint8)
    if alpha <= 0:
        return band
    bh, ow = band.shape[0], band.shape[1]
    src = np.asarray(src, dtype=np.uint8)
    out = _tint_blend_2d(
        jnp.asarray(band.reshape(bh, ow * 3)),
        jnp.asarray(src.reshape(src.shape[0], -1)),
        alpha_255=alpha,
        out_h=out_h,
        y0=y0,
    )
    return np.asarray(jax.device_get(out)).reshape(bh, ow, 3)


def tint_blend(mosaic, src, tint_opacity: float) -> np.ndarray:
    """Alpha-composite the source image over the mosaic.

    Mirrors main.rs:447-465: overlay alpha is floor(255 * tint_opacity)
    (the reference's `as u8` cast truncates), source is nearest-upscaled to
    the output size, then standard alpha compositing over an opaque
    background. Rounding is round-to-nearest (float blend like the image
    crate's Rgba::blend); parity is within 1 LSB.
    """
    mosaic = np.asarray(mosaic, dtype=np.uint8)
    return tint_blend_band(mosaic, src, 0, mosaic.shape[0], tint_opacity)
