"""Pure-numpy baseline JPEG decoder -- no codec library.

Implements the baseline sequential DCT process of ITU-T T.81 (the
public JPEG spec): marker parse, DQT/DHT/SOF0/SOS/DRI, canonical
Huffman entropy decode (16-bit lookahead tables built from the file's
own DHT segments), dequantization, separable float IDCT, chroma box
upsampling for subsampled scans, and the JFIF YCbCr -> RGB transform.
Grayscale (1 component) and YCbCr (3 components) with sampling factors
1 or 2 are supported; progressive / arithmetic / 12-bit scans return
None (the caller maps that to a null row + decode_err, P11).

Output pixels are EXACT integers: ``clip(floor(x + 0.5))`` at both the
IDCT and the color transform, so decodes are reproducible bit-for-bit
across runs and machines -- which is what lets the corpus generator
publish golden per-channel sums computed through an INDEPENDENT
brute-force IDCT (corpus/jpegenc.py) and have the engine match them
exactly.

Performance shape: the Huffman layer decodes one SYMBOL (not one bit)
per Python-loop step via a 65536-entry lookahead table, and everything
after entropy decode (dequant, IDCT over all blocks at once, upsample,
color transform) is vectorized numpy.  Decode state that survives a
batch (nothing here -- tables are per-file by spec) would live in the
actor's __init__.
"""

from __future__ import annotations

import numpy as np

# standard zigzag: index i of the scan order -> raster position.
# corpus/jpegenc.py derives the same permutation programmatically from
# the diagonal walk, and tests assert the two agree -- a literal/
# derived cross-check so a transposed table cannot self-cancel.
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)


def _idct_matrix() -> np.ndarray:
    """A[u, x] = c(u)/2 * cos((2x+1) u pi / 16); IDCT f = A.T @ F @ A."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    a = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    a[0, :] *= 1 / np.sqrt(2)
    return a


_A = _idct_matrix()


def idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """Separable 2-D IDCT over a stack of (n, 8, 8) coefficient blocks
    -> (n, 8, 8) float sample values (before level shift)."""
    return np.einsum("ux,nuv,vy->nxy", _A, coefs, _A, optimize=True)


class _Huff:
    """Canonical Huffman table with a 16-bit lookahead: sym[peek16] and
    len[peek16] resolve any code (max length 16 by spec) in one step."""

    __slots__ = ("sym", "length")

    def __init__(self, bits: list[int], huffval: bytes) -> None:
        self.sym = np.zeros(1 << 16, dtype=np.int16)
        self.length = np.zeros(1 << 16, dtype=np.uint8)
        code, k = 0, 0
        for l in range(1, 17):
            for _ in range(bits[l - 1]):
                lo = code << (16 - l)
                hi = (code + 1) << (16 - l)
                self.sym[lo:hi] = huffval[k]
                self.length[lo:hi] = l
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an UNSTUFFED entropy segment.

    ``consumed`` counts bits actually advanced past (peek lookahead is
    free): a stream whose decode consumes more bits than the segment
    holds was truncated mid-entropy-data -- phantom zero fill would
    otherwise decode as innocent DC-0/EOB symbols and a cut file would
    pass as a valid image with wrong sums."""

    __slots__ = ("d", "i", "acc", "n", "consumed")

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.i = 0
        self.acc = 0
        self.n = 0
        self.consumed = 0

    def _fill(self, need: int) -> None:
        while self.n < need:
            b = self.d[self.i] if self.i < len(self.d) else 0
            self.i += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.n += 8

    def peek16(self) -> int:
        if self.n < 16:
            self._fill(16)
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        self.n -= k
        self.consumed += k

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill(k)
        self.n -= k
        self.consumed += k
        return (self.acc >> self.n) & ((1 << k) - 1)


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _parse_segments(p: bytes):
    """Yield (marker, payload_bytes, next_offset) until SOS/EOI/end."""
    if p[:2] != b"\xff\xd8":
        return None
    segs = []
    i = 2
    n = len(p)
    while i + 4 <= n:
        if p[i] != 0xFF:
            return None
        m = p[i + 1]
        if m == 0xD9:                         # EOI
            break
        if 0xD0 <= m <= 0xD7 or m == 0x01:    # RST / TEM: no length
            i += 2
            continue
        ln = int.from_bytes(p[i + 2:i + 4], "big")
        if ln < 2 or i + 2 + ln > n:
            return None
        segs.append((m, p[i + 4:i + 2 + ln], i + 2 + ln))
        if m == 0xDA:                          # SOS: entropy data follows
            return segs
        i += 2 + ln
    return segs


def _unstuff(p: bytes, start: int):
    """Entropy-coded data from ``start``: remove 0xFF00 stuffing, split
    at RSTn markers.  Returns the list of per-restart-interval chunks
    (one chunk when DRI is absent)."""
    chunks, cur = [], bytearray()
    i, n = start, len(p)
    while i < n:
        b = p[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        m = p[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            chunks.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:                                  # EOI or any real marker
            break
    chunks.append(bytes(cur))
    return chunks


def decode_jpeg(p: bytes | None):
    """payload -> (width, height, channels, pixels uint8 (h, w, c)) or
    None on any malformation / unsupported process (P11)."""
    try:
        return _decode(p)
    except Exception:
        return None


def _decode(p: bytes | None):
    if p is None or len(p) < 4:
        return None
    segs = _parse_segments(p)
    if not segs:
        return None

    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}
    sof = None
    restart_interval = 0
    sos = None
    sos_end = 0
    for m, body, nxt in segs:
        if m == 0xDB:                          # DQT (possibly several)
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 15
                if pq != 0:                    # 16-bit tables: not baseline
                    return None
                q = np.zeros(64, dtype=np.int32)
                q[ZIGZAG] = np.frombuffer(body[j + 1:j + 65], np.uint8)
                qt[tq] = q.reshape(8, 8)
                j += 65
        elif m == 0xC4:                        # DHT (possibly several)
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 15
                bits = list(body[j + 1:j + 17])
                nsym = sum(bits)
                huff[(tc, th)] = _Huff(bits, body[j + 17:j + 17 + nsym])
                j += 17 + nsym
        elif m == 0xC0 or m == 0xC1:           # SOF0/1: baseline sequential
            prec = body[0]
            if prec != 8:
                return None
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for c in range(nc):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": body[8 + 3 * c]})
            sof = (w, h, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):          # progressive/arith/lossless
            return None
        elif m == 0xDD:                        # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif m == 0xDA:                        # SOS
            ns = body[0]
            smap = {}
            for c in range(ns):
                smap[body[1 + 2 * c]] = (body[2 + 2 * c] >> 4,
                                         body[2 + 2 * c] & 15)
            sos = smap
            sos_end = nxt
    if sof is None or sos is None:
        return None
    w, h, comps = sof
    if w <= 0 or h <= 0 or len(comps) not in (1, 3):
        return None
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        return None
    for c in comps:
        if c["id"] not in sos or c["tq"] not in qt:
            return None
        c["td"], c["ta"] = sos[c["id"]]
        if (0, c["td"]) not in huff or (1, c["ta"]) not in huff:
            return None

    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy
    for c in comps:
        c["bw"] = mcux * c["h"]                # blocks per row
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 8, 8), dtype=np.int32)

    chunks = _unstuff(p, sos_end)
    interval = restart_interval or n_mcu
    mcu = 0
    for chunk in chunks:
        if mcu >= n_mcu:
            break
        br = _BitReader(chunk)
        pred = [0] * len(comps)
        for _ in range(min(interval, n_mcu - mcu)):
            my, mx = divmod(mcu, mcux)
            for ci, c in enumerate(comps):
                dc_t = huff[(0, c["td"])]
                ac_t = huff[(1, c["ta"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int32)
                        pk = br.peek16()
                        t = int(dc_t.sym[pk])
                        ln = int(dc_t.length[pk])
                        if ln == 0:
                            return None
                        br.skip(ln)
                        diff = _extend(br.read(t), t) if t else 0
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            pk = br.peek16()
                            sym = int(ac_t.sym[pk])
                            ln = int(ac_t.length[pk])
                            if ln == 0:
                                return None
                            br.skip(ln)
                            run, size = sym >> 4, sym & 15
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break          # EOB
                            k += run
                            if k > 63:
                                return None
                            blk[k] = _extend(br.read(size), size)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        out = np.zeros(64, dtype=np.int32)
                        out[ZIGZAG] = blk
                        c["coef"][row * c["bw"] + col] = out.reshape(8, 8)
            mcu += 1
        if br.consumed > 8 * len(chunk):       # truncated entropy data
            return None
    if mcu != n_mcu:
        return None

    planes = []
    for c in comps:
        deq = c["coef"] * qt[c["tq"]][None, :, :]
        pix = idct_blocks(deq.astype(np.float64)) + 128.0
        pix = np.clip(np.floor(pix + 0.5), 0, 255)
        # blocks -> plane
        plane = pix.reshape(c["bh"], c["bw"], 8, 8) \
            .transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8)
        # box-upsample to full resolution, crop to (h, w)
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return w, h, 1, planes[0].astype(np.uint8)[..., None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    rgb = np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    return w, h, 3, rgb
