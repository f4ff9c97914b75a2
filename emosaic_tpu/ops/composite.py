"""Mosaic composition: device-side gather of tile images + fused tint blend.

Replaces the reference's per-block `imageops::replace/overlay` placement
loops (rendering.rs:76-99, :346-381) with a single gather/transpose over the
prepared-tile stack, and the host-side RGBA tint overlay (main.rs:447-465)
with a fused alpha blend.

Flip handling mirrors tileset.rs:146-161 `get_image`: negative item ids
select the horizontally mirrored tile image.
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _compose_rows_jit(items: jax.Array, stack: jax.Array) -> jax.Array:
    nby, nbx = items.shape
    ts = stack.shape[1]
    rows = jnp.clip(jnp.abs(items) - 1, 0, stack.shape[0] - 1)
    imgs = stack[rows]  # [nby, nbx, ts, ts, 3]
    flipped = imgs[:, :, :, ::-1, :]
    imgs = jnp.where((items < 0)[:, :, None, None, None], flipped, imgs)
    # item 0 = unassigned block: stays black, like the reference's skipped
    # blocks in global-greedy no-repeat (rendering.rs:349-351).
    imgs = jnp.where((items == 0)[:, :, None, None, None], jnp.uint8(0), imgs)
    return jnp.transpose(imgs, (0, 2, 1, 3, 4)).reshape(nby * ts, nbx * ts, 3)


def compose_mosaic(items, stack) -> jax.Array:
    """Assemble the mosaic image from signed tile selections.

    Args:
      items: [nby, nbx] int32 signed 1-based item ids (negative = flipped),
        the convention of tileset.rs:131-143.
      stack: [T, ts, ts, 3] uint8 prepared tile images (1-based item id i
        lives at stack[i-1]).

    Returns:
      [nby*ts, nbx*ts, 3] uint8 mosaic.
    """
    items = jnp.asarray(items, dtype=jnp.int32)
    stack = jnp.asarray(stack, dtype=jnp.uint8)
    return _compose_rows_jit(items, stack)


def iter_bands(items, stack, band_rows: int = 8) -> Iterator[np.ndarray]:
    """Stream the mosaic as horizontal bands of `band_rows` block-rows.

    For gigapixel outputs the full mosaic cannot live in HBM or host RAM;
    each yielded band is `[band_rows*ts, nbx*ts, 3]` uint8 on host, ready
    for a streaming PNG encoder (SURVEY.md section 7 "composite kernel").
    """
    items = jnp.asarray(items, dtype=jnp.int32)
    stack = jnp.asarray(stack, dtype=jnp.uint8)
    nby = items.shape[0]
    for y0 in range(0, nby, band_rows):
        band = _compose_rows_jit(items[y0 : y0 + band_rows], stack)
        yield np.asarray(jax.device_get(band))


@functools.partial(jax.jit, static_argnames=("alpha_255",))
def _tint_blend_jit(mosaic: jax.Array, src: jax.Array, alpha_255: int) -> jax.Array:
    oh, ow = mosaic.shape[0], mosaic.shape[1]
    sh, sw = src.shape[0], src.shape[1]
    # Nearest-neighbor upscale, sampling at output-pixel centers like
    # image::imageops::resize(FilterType::Nearest) (main.rs:456-461).
    yi = jnp.clip(((jnp.arange(oh) + 0.5) * (sh / oh)).astype(jnp.int32), 0, sh - 1)
    xi = jnp.clip(((jnp.arange(ow) + 0.5) * (sw / ow)).astype(jnp.int32), 0, sw - 1)
    up = src[yi][:, xi].astype(jnp.float32)
    a = alpha_255 / 255.0
    out = up * a + mosaic.astype(jnp.float32) * (1.0 - a)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("alpha_255", "out_h", "y0"))
def _tint_blend_band_jit(band, src, *, alpha_255: int, out_h: int, y0: int):
    bh, ow = band.shape[0], band.shape[1]
    sh, sw = src.shape[0], src.shape[1]
    yi = jnp.clip(
        ((jnp.arange(y0, y0 + bh) + 0.5) * (sh / out_h)).astype(jnp.int32),
        0,
        sh - 1,
    )
    xi = jnp.clip(((jnp.arange(ow) + 0.5) * (sw / ow)).astype(jnp.int32), 0, sw - 1)
    up = src[yi][:, xi].astype(jnp.float32)
    a = alpha_255 / 255.0
    out = up * a + band.astype(jnp.float32) * (1.0 - a)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def tint_blend_band(band, src, y0: int, out_h: int, tint_opacity: float):
    """Per-band tint blend for the streamed gigapixel path: identical math
    to `tint_blend` applied to output rows [y0, y0+h)."""
    alpha = int(255.0 * float(tint_opacity))
    if alpha <= 0:
        return np.asarray(band, dtype=np.uint8)
    return np.asarray(
        _tint_blend_band_jit(
            jnp.asarray(band, jnp.uint8),
            jnp.asarray(src, jnp.uint8),
            alpha_255=alpha,
            out_h=out_h,
            y0=y0,
        )
    )


def tint_blend(mosaic, src, tint_opacity: float) -> jax.Array:
    """Alpha-composite the source image over the mosaic.

    Mirrors main.rs:447-465: overlay alpha is floor(255 * tint_opacity)
    (the reference's `as u8` cast truncates), source is nearest-upscaled to
    the output size, then standard alpha compositing over an opaque
    background. Rounding is round-to-nearest (float blend like the image
    crate's Rgba::blend); parity is within 1 LSB.
    """
    alpha = int(255.0 * float(tint_opacity))
    if alpha <= 0:
        return jnp.asarray(mosaic, dtype=jnp.uint8)
    return _tint_blend_jit(
        jnp.asarray(mosaic, dtype=jnp.uint8),
        jnp.asarray(src, dtype=jnp.uint8),
        alpha,
    )
