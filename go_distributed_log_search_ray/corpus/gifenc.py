"""GIF87a encoder for the synthetic media corpus (corpus side ONLY --
the engine decoder lives in functions/gif.py and shares no code with
this, so golden sums computed from the SOURCE palette + index map
cross-check the decoder's LZW/table handling end to end).

Real LZW compression per the GIF specification (CompuServe GIF87a,
public domain spec; Welch 1984 LZW): variable code width starting at
``min_code_size + 1``, CLEAR/EOI codes, dictionary growth to 12 bits
with CLEAR-and-reset when full, LSB-first bit packing into <= 255-byte
sub-blocks.
"""

from __future__ import annotations

import numpy as np


def _lzw_compress(indices: np.ndarray, mcs: int) -> bytes:
    """The code-width schedule SIMULATES the decoder exactly: the
    decoder inserts a table entry after every code it reads except the
    first following a CLEAR, and grows the width when its next slot
    reaches ``2^width`` -- so the encoder tracks (dec_next, dec_width)
    through that same state machine and emits every code at the
    decoder's current width.  This removes the classic off-by-one
    between encoder-side (insert-on-emit) and decoder-side
    (insert-on-next-read) width growth by construction."""
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    dec_next = eoi + 1
    dec_width = mcs + 1
    first_after_clear = True

    def put_bits(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += dec_width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def emit(code: int) -> None:
        """Emit a DATA code and advance the simulated decoder."""
        nonlocal dec_next, dec_width, first_after_clear
        put_bits(code)
        if first_after_clear:
            first_after_clear = False
            return
        if dec_next < 4096:
            dec_next += 1
            if dec_next == (1 << dec_width) and dec_width < 12:
                dec_width += 1

    def emit_clear() -> None:
        nonlocal dec_next, dec_width, first_after_clear
        put_bits(clear)
        dec_next = eoi + 1
        dec_width = mcs + 1
        first_after_clear = True

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit_clear()
    cur = b""
    for v in indices.astype(np.uint8).tobytes():
        nxt = cur + bytes([v])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        if next_code == 4096:
            emit_clear()
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
        cur = bytes([v])
    if cur:
        emit(table[cur])
    put_bits(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """GIF87a bytes for an (h, w) uint8 index map over a (p, 3) uint8
    palette; p must be a power of two in [4, 256]."""
    h, w = indices.shape
    p = len(palette)
    bits = int(p).bit_length() - 1
    if (1 << bits) != p or not 2 <= bits <= 8:
        raise ValueError("palette size must be a power of two in "
                         "[4, 256]")
    if indices.max(initial=0) >= p:
        raise ValueError("index out of palette range")
    out = bytearray(b"GIF87a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | ((bits - 1) << 4) | (bits - 1))  # GCT present
    out += b"\x00\x00"                       # bg color, aspect
    out += palette.astype(np.uint8).tobytes()
    out += b"\x2c" + b"\x00" * 4             # image descriptor at 0,0
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x00)                         # no local table/interlace
    mcs = max(2, bits)
    out.append(mcs)
    data = _lzw_compress(indices.reshape(-1), mcs)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"                       # block terminator, trailer
    return bytes(out)
