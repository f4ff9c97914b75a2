"""Streaming PNG encoder for gigapixel outputs.

The reference assembles the full output in RAM and PNG-encodes it in one
shot (rendering.rs:91-94, main.rs:482-490) — impossible at gigapixel scale
(SURVEY.md section 5 "long-context": W*H*ts^2*3 bytes). Here the device
composes the mosaic in horizontal bands (ops.composite.iter_bands) and this
encoder writes them straight into a single zlib stream, so peak host memory
is one band.

Pure Python over zlib (C speed); `compress_level=1` favors throughput,
`0` writes stored blocks (fastest, larger files).
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_IDAT_TARGET = 1 << 20  # emit ~1 MiB IDAT chunks


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


class StreamingPNGWriter:
    """Write an RGB8 PNG incrementally, band by band (top to bottom)."""

    def __init__(
        self,
        path: str | os.PathLike,
        width: int,
        height: int,
        compress_level: int = 1,
    ):
        self.width = width
        self.height = height
        self._rows_written = 0
        self._f = open(path, "wb")
        self._f.write(_PNG_SIG)
        ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
        self._f.write(_chunk(b"IHDR", ihdr))
        self._z = zlib.compressobj(compress_level)
        self._pending = bytearray()

    def write_band(self, band: np.ndarray) -> None:
        """Append `[h, width, 3]` uint8 rows."""
        band = np.ascontiguousarray(band, dtype=np.uint8)
        if band.ndim != 3 or band.shape[1] != self.width or band.shape[2] != 3:
            raise ValueError(f"band shape {band.shape} != (h, {self.width}, 3)")
        if self._rows_written + band.shape[0] > self.height:
            raise ValueError("too many rows")
        # PNG filter type 0 (None) prefixed per scanline
        h, w = band.shape[0], band.shape[1]
        filtered = np.empty((h, 1 + w * 3), dtype=np.uint8)
        filtered[:, 0] = 0
        filtered[:, 1:] = band.reshape(h, w * 3)
        self._pending += self._z.compress(filtered.tobytes())
        self._rows_written += h
        while len(self._pending) >= _IDAT_TARGET:
            self._f.write(_chunk(b"IDAT", bytes(self._pending[:_IDAT_TARGET])))
            del self._pending[:_IDAT_TARGET]

    def close(self) -> None:
        if self._f.closed:
            return
        if self._rows_written != self.height:
            self._f.close()
            raise ValueError(
                f"wrote {self._rows_written} rows, expected {self.height}"
            )
        self._pending += self._z.flush()
        if self._pending:
            self._f.write(_chunk(b"IDAT", bytes(self._pending)))
        self._f.write(_chunk(b"IEND", b""))
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if exc[0] is None:
            self.close()
        else:
            self._f.close()
        return False
