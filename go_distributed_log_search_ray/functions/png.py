"""Pure-Python PNG decoder -- stdlib zlib + numpy, no codec library.

Implements the PNG (RFC 2083 / ISO 15948) baseline: chunk parse with
CRC verification, IHDR validation, IDAT zlib inflate, and all five
scanline reconstruction filters (None/Sub/Up/Average/Paeth).  Supported
images: bit depth 8, color types 0 (gray), 2 (RGB) and 6 (RGBA),
non-interlaced.  Anything else (16-bit, palette, Adam7) returns None --
the caller tags the row P11-style.

PNG is LOSSLESS, so the corpus generator's golden columns are simply
the source pixels' channel sums -- completely independent of this
decoder (unlike JPEG, no shared rounding contract is needed).

Vectorization: Sub is a per-byte-lane modular cumsum and Up a single
vector add; Average and Paeth carry a true sequential dependency along
the scanline and fall back to a per-byte loop over that one row (rows
are short; a 100 TB image corpus decodes rows inside actor-pool
map_batches tasks, so the loop is per-scanline, never per-dataset).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_NCH = {0: 1, 2: 3, 6: 4}


def decode_png(p: bytes | None):
    """payload -> (width, height, channels, pixels uint8 (h, w, c)) or
    None on malformation / unsupported variant."""
    try:
        return _decode(p)
    except Exception:
        return None


def _decode(p: bytes | None):
    if p is None or len(p) < 45 or p[:8] != _SIG:
        return None
    i = 8
    ihdr = None
    idat = bytearray()
    seen_end = False
    while i + 12 <= len(p):
        ln = int.from_bytes(p[i:i + 4], "big")
        typ = p[i + 4:i + 8]
        data = p[i + 8:i + 8 + ln]
        if len(data) != ln:
            return None
        crc = int.from_bytes(p[i + 8 + ln:i + 12 + ln], "big")
        if zlib.crc32(typ + data) != crc:
            return None
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            seen_end = True
            break
        i += 12 + ln
    if ihdr is None or not seen_end:
        return None
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if (depth != 8 or ctype not in _NCH or comp != 0 or filt != 0
            or interlace != 0 or w <= 0 or h <= 0):
        return None
    nch = _NCH[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) != h * (1 + stride):
        return None
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    ftypes = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(ftypes[y])
        line = rows[y, 1:].astype(np.int64)
        if f == 0:
            rec = line
        elif f == 1:                           # Sub: modular lane cumsum
            rec = np.cumsum(line.reshape(w, nch), axis=0).reshape(stride) \
                & 0xFF
        elif f == 2:                           # Up
            rec = (line + prev) & 0xFF
        elif f == 3:                           # Average (sequential)
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - nch] if x >= nch else 0
                rec[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:                           # Paeth (sequential)
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - nch] if x >= nch else 0
                b = prev[x]
                c = prev[x - nch] if x >= nch else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                rec[x] = (line[x] + pred) & 0xFF
        else:
            return None
        out[y] = rec.astype(np.uint8)
        prev = rec
    return w, h, nch, out.reshape(h, w, nch)
