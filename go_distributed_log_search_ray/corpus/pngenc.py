"""Minimal PNG encoder -- test infrastructure for the real decoder in
``functions/png.py``.  Writes bit-depth-8 gray/RGB/RGBA, non-interlaced,
cycling through ALL FIVE scanline filters (y % 5) so every
reconstruction path in the decoder is exercised by corpus data.  PNG is
lossless, so golden columns are just the source pixels' channel sums --
no shared math with the decoder at all.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_CTYPE = {1: 0, 3: 2, 4: 6}


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (len(data).to_bytes(4, "big") + typ + data
            + zlib.crc32(typ + data).to_bytes(4, "big"))


def encode_png(img: np.ndarray) -> bytes:
    """(h, w) or (h, w, c) uint8 -> PNG payload, filters cycled y % 5."""
    if img.ndim == 2:
        img = img[..., None]
    h, w, nch = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CTYPE[nch], 0, 0, 0)
    stride = w * nch
    flat = img.reshape(h, stride).astype(np.int64)
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = y % 5
        cur = flat[y]
        left = np.zeros(stride, dtype=np.int64)
        left[nch:] = cur[:-nch]
        upleft = np.zeros(stride, dtype=np.int64)
        upleft[nch:] = prev[:-nch]
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((left + prev) >> 1)
        else:                                  # Paeth
            pp = left + prev - upleft
            pa = np.abs(pp - left)
            pb = np.abs(pp - prev)
            pc = np.abs(pp - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            enc = cur - pred
        lines.append(f)
        lines.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    return (b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(lines), 6))
            + _chunk(b"IEND", b""))
