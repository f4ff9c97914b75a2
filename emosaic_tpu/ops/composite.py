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


@functools.partial(jax.jit, static_argnames=("ts",))
def _compose_rows_2d(items: jax.Array, stack2d_aug: jax.Array, *, ts: int):
    """items [nby, nbx] i32, stack2d_aug [2T, ts*ts*3] u8 (rows T..2T are
    pre-mirrored copies) -> band [nby*ts, nbx*ts*3] u8.

    Flip handling via the augmented stack keeps the hot path a single
    row-contiguous gather; selecting mirrored pixels with a minor-axis
    permutation gather instead costs ~10x (element gathers don't vectorize
    on the VPU).
    """
    nby, nbx = items.shape
    t = stack2d_aug.shape[0] // 2
    flat = items.reshape(-1)
    rows = jnp.where(flat >= 0, flat - 1, t - flat - 1)
    sel = stack2d_aug[jnp.clip(rows, 0, 2 * t - 1)]  # [B, S]
    # item 0 = unassigned block: stays black, like the reference's skipped
    # blocks in global-greedy no-repeat (rendering.rs:349-351).
    sel = jnp.where((flat == 0)[:, None], jnp.uint8(0), sel)
    band = sel.reshape(nby, nbx, ts, ts * 3)
    return jnp.transpose(band, (0, 2, 1, 3)).reshape(nby * ts, nbx * ts * 3)


def augment_stack2d(stack) -> tuple[jax.Array, int]:
    """[T, ts, ts, 3] uint8 -> device [2T, ts*ts*3] with mirrored copies in
    rows T..2T (the composite analogue of build_library's flip rows)."""
    stack = np.asarray(stack, dtype=np.uint8)
    t, ts = stack.shape[0], stack.shape[1]
    flipped = stack[:, :, ::-1, :]
    aug = np.concatenate([stack.reshape(t, -1), flipped.reshape(t, -1)])
    return jnp.asarray(aug), ts


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
    items = jnp.asarray(np.asarray(items, dtype=np.int32))
    stack2d, ts = augment_stack2d(stack)
    nby, nbx = items.shape
    band = _compose_rows_2d(items, stack2d, ts=ts)
    return np.asarray(jax.device_get(band)).reshape(nby * ts, nbx * ts, 3)


def iter_bands(items, stack, band_rows: int = 8) -> Iterator[np.ndarray]:
    """Stream the mosaic as horizontal bands of `band_rows` block-rows.

    For gigapixel outputs the full mosaic cannot live in HBM or host RAM;
    each yielded band is `[band_rows*ts, nbx*ts, 3]` uint8 on host, ready
    for a streaming PNG encoder (SURVEY.md section 7 "composite kernel").
    """
    items = np.asarray(items, dtype=np.int32)
    stack2d, ts = augment_stack2d(stack)
    nby, nbx = items.shape
    for y0 in range(0, nby, band_rows):
        part = jnp.asarray(items[y0 : y0 + band_rows])
        band = _compose_rows_2d(part, stack2d, ts=ts)
        h = part.shape[0] * ts
        yield np.asarray(jax.device_get(band)).reshape(h, nbx * ts, 3)


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
