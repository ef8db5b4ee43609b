"""GIF decoder (GIF87a/89a, single image, global or local palette).

Pure-stdlib/numpy LZW decode, independent of the corpus encoder
(``corpus/gifenc.py``) so the generator's SOURCE-pixel golden sums
cross-check this implementation end to end -- same contract as the
JPEG/PNG decoders (functions/jpeg.py, functions/png.py).

Public-knowledge format: CompuServe GIF87a/89a specification (public)
with Welch-1984 LZW; variable code width from ``min_code_size + 1`` to
12 bits, CLEAR resets the table, width grows when the next table slot
reaches ``2^width`` (the giflib convention), LSB-first bit packing in
<= 255-byte sub-blocks.

``decode_gif(data) -> (width, height, 3, pixels) | None``: pixels is
an (h*w, 3) uint8 RGB array via the palette; ``None`` for anything
malformed or truncated (P11 tolerance) -- a missing trailer, bad LZW
stream, wrong pixel count, or an interlaced image (not emitted by any
corpus this engine ingests; flagged malformed rather than silently
mis-ordering rows).
"""

from __future__ import annotations

import numpy as np


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int] | None:
    out = bytearray()
    n = len(data)
    while True:
        if pos >= n:
            return None
        sz = data[pos]
        pos += 1
        if sz == 0:
            return bytes(out), pos
        if pos + sz > n:
            return None
        out += data[pos:pos + sz]
        pos += sz


def _lzw_decompress(data: bytes, mcs: int,
                    expected: int) -> np.ndarray | None:
    if not 2 <= mcs <= 8:
        return None
    clear = 1 << mcs
    eoi = clear + 1
    # table as prefix/suffix arrays; sequences materialized on output
    prefix = np.full(4096, -1, np.int32)
    suffix = np.zeros(4096, np.uint8)
    seqlen = np.zeros(4096, np.int32)
    for i in range(clear):
        suffix[i] = i
        seqlen[i] = 1

    out = np.empty(expected, np.uint8)
    wpos = 0
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    width = mcs + 1
    next_code = eoi + 1
    prev = -1

    def expand(code: int, start: int) -> int:
        """Write code's sequence ending at start+len; returns len."""
        ln = int(seqlen[code])
        i = start + ln - 1
        c = code
        while c >= 0:
            out[i] = suffix[c]
            i -= 1
            c = int(prefix[c]) if c >= clear else -1
        return ln

    while True:
        while nbits < width:
            if pos >= n:
                return None                   # ran out before EOI
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            next_code = eoi + 1
            width = mcs + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:                          # first code after clear
            if code >= clear:
                return None
            if wpos + 1 > expected:
                return None
            out[wpos] = suffix[code]
            wpos += 1
            prev = code
            continue
        if code < next_code and code != clear:
            if wpos + seqlen[code] > expected:
                return None
            ln = expand(code, wpos)
            first = out[wpos]
            wpos += ln
        elif code == next_code:               # KwKwK case
            ln_prev = int(seqlen[prev])
            if wpos + ln_prev + 1 > expected:
                return None
            expand(prev, wpos)
            first = out[wpos]
            out[wpos + ln_prev] = first
            ln = ln_prev + 1
            wpos += ln
        else:
            return None                       # invalid code
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            seqlen[next_code] = seqlen[prev] + 1
            next_code += 1
            # insert-then-grow: width bumps when the next slot reaches
            # 2^width (the corpus encoder simulates exactly this state
            # machine, so the wire stays bit-synchronized)
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if wpos != expected:
        return None
    return out


def decode_gif(data: bytes):
    try:
        if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
            return None
        packed = data[10]
        pos = 13
        gct = None
        if packed & 0x80:
            sz = 2 << (packed & 0x07)
            if pos + 3 * sz > len(data):
                return None
            gct = np.frombuffer(data[pos:pos + 3 * sz],
                                np.uint8).reshape(sz, 3)
            pos += 3 * sz
        while True:
            if pos >= len(data):
                return None
            b = data[pos]
            pos += 1
            if b == 0x3B:                     # trailer before image
                return None
            if b == 0x21:                     # extension: skip
                if pos >= len(data):
                    return None
                pos += 1                      # label
                r = _read_subblocks(data, pos)
                if r is None:
                    return None
                _, pos = r
                continue
            if b == 0x2C:                     # image descriptor
                break
            return None
        if pos + 9 > len(data):
            return None
        w = int.from_bytes(data[pos + 4:pos + 6], "little")
        h = int.from_bytes(data[pos + 6:pos + 8], "little")
        ipacked = data[pos + 8]
        pos += 9
        if ipacked & 0x40:                    # interlaced: unsupported
            return None
        pal = gct
        if ipacked & 0x80:                    # local color table
            sz = 2 << (ipacked & 0x07)
            if pos + 3 * sz > len(data):
                return None
            pal = np.frombuffer(data[pos:pos + 3 * sz],
                                np.uint8).reshape(sz, 3)
            pos += 3 * sz
        if pal is None or w == 0 or h == 0:
            return None
        if pos >= len(data):
            return None
        mcs = data[pos]
        pos += 1
        r = _read_subblocks(data, pos)
        if r is None:
            return None
        stream, pos = r
        if pos >= len(data) or data[pos] != 0x3B:
            return None                       # trailer required
        idx = _lzw_decompress(stream, mcs, w * h)
        if idx is None or idx.max(initial=0) >= len(pal):
            return None
        return w, h, 3, pal[idx]
    except Exception:
        return None
