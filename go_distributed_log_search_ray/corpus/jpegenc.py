"""Minimal baseline JPEG ENCODER + independent golden decode -- test
infrastructure for the real decoder in ``functions/jpeg.py``.

The encoder emits spec-conformant baseline sequential JPEG (ITU-T
T.81): SOI/DQT/SOF0/DHT/SOS/EOI, optional DRI/RSTn, 4:4:4 or 2x2-luma
subsampling.  It deliberately shares NOTHING with the decoder:

* the zigzag permutation is DERIVED here from the diagonal-walk rule
  (the decoder uses the literal spec table; tests assert they agree,
  so a transposed table cannot self-cancel);
* Huffman tables are flat canonical tables built here (DC: twelve
  4-bit codes; AC: all 256 symbols as 128 8-bit + 128 9-bit codes) and
  written to DHT -- the decoder must honor the file's own tables;
* golden pixel values are computed by a brute-force 4-D basis-tensor
  IDCT (`O(64^2)` per block, different float evaluation order from the
  decoder's separable form).

Bit-exactness: decoder and golden both define pixel = clip(floor(x +
0.5)).  Two different float evaluation orders can disagree only when x
sits within float error of a rounding boundary, so ``golden_decode``
returns None whenever any intermediate lands within 1e-6 of one and the
corpus generator simply regenerates that image -- decoded integers are
then provably identical for ANY correct IDCT.
"""

from __future__ import annotations

import numpy as np

# Annex K.1 example quantization tables (public spec)
QT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)
QT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int32)


def zigzag_walk() -> np.ndarray:
    """Derive the zigzag scan programmatically: walk anti-diagonals of
    the 8x8 grid, alternating direction.  Returns scan index -> raster
    position, same contract as the decoder's literal table."""
    order = []
    for s in range(15):
        diag = [(y, s - y) for y in range(8) if 0 <= s - y < 8]
        if s % 2 == 0:
            diag.reverse()                     # up-right on even diagonals
        order.extend(y * 8 + x for y, x in diag)
    return np.array(order, dtype=np.int64)


_ZZ = zigzag_walk()


def _fdct_matrix() -> np.ndarray:
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    a = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    a[0, :] *= 1 / np.sqrt(2)
    return a


_F = _fdct_matrix()


def _basis_tensor() -> np.ndarray:
    """B[u, v, x, y] = c(u)c(v)/4 cos((2x+1)u pi/16) cos((2y+1)v pi/16):
    the brute-force IDCT basis (independent of the separable form)."""
    c = np.ones(8)
    c[0] = 1 / np.sqrt(2)
    u = np.arange(8)
    cosx = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16)  # [u, x]
    return 0.25 * np.einsum("u,v,ux,vy->uvxy", c, c, cosx, cosx)


_B = _basis_tensor()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)          # byte stuffing

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)      # pad with 1-bits


# flat canonical Huffman tables (encoder-defined, written to DHT)
_DC_BITS = [0, 0, 0, 12] + [0] * 12            # twelve 4-bit codes
_DC_VALS = bytes(range(12))
_AC_BITS = [0] * 7 + [128, 128] + [0] * 7      # 128 x 8-bit + 128 x 9-bit
_AC_VALS = bytes(range(256))


def _canon_codes(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    codes, code, k = {}, 0, 0
    for l in range(1, 17):
        for _ in range(bits[l - 1]):
            codes[vals[k]] = (code, l)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODE = _canon_codes(_DC_BITS, _DC_VALS)
_AC_CODE = _canon_codes(_AC_BITS, _AC_VALS)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) plane (dims multiples of 8) -> (n, 8, 8) raster blocks."""
    hh, ww = plane.shape
    return plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8)


def _pad_to(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    hh, ww = plane.shape
    py = (-hh) % mult_y
    px = (-ww) % mult_x
    return np.pad(plane, ((0, py), (0, px)), mode="edge")


def encode_jpeg(rgb: np.ndarray, subsample: bool = False,
                restart_interval: int = 0):
    """(h, w, 3) uint8 RGB -> (payload bytes, quantized coefficient
    stacks per component).  ``subsample`` uses 2x2 luma sampling
    (4:2:0); ``restart_interval`` > 0 emits DRI + RSTn markers."""
    h, w = rgb.shape[:2]
    f = rgb.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = 128.0 - 0.168736 * f[..., 0] - 0.331264 * f[..., 1] \
        + 0.5 * f[..., 2]
    cr = 128.0 + 0.5 * f[..., 0] - 0.418688 * f[..., 1] \
        - 0.081312 * f[..., 2]

    hs = 2 if subsample else 1
    if subsample:
        ye = _pad_to(y, 16, 16)
        cbp = _pad_to(cb, 2, 2)
        crp = _pad_to(cr, 2, 2)
        cb = (cbp[0::2, 0::2] + cbp[0::2, 1::2]
              + cbp[1::2, 0::2] + cbp[1::2, 1::2]) / 4.0
        cr = (crp[0::2, 0::2] + crp[0::2, 1::2]
              + crp[1::2, 0::2] + crp[1::2, 1::2]) / 4.0
        planes = [ye, _pad_to(cb, 8, 8), _pad_to(cr, 8, 8)]
    else:
        planes = [_pad_to(c, 8, 8) for c in (y, cb, cr)]

    coef = []
    for pi, plane in enumerate(planes):
        blocks = _plane_blocks(np.round(plane) - 128.0)
        fdc = np.einsum("ux,nxy,vy->nuv", _F, blocks, _F, optimize=True)
        q = QT_LUMA if pi == 0 else QT_CHROMA
        coef.append(np.round(fdc / q[None]).astype(np.int32))

    # entropy-code MCU-interleaved
    mcux = -(-w // (8 * hs))
    mcuy = -(-h // (8 * hs))
    bw_l = mcux * hs                           # luma blocks per row
    chunks = []
    bwr = _BitWriter()
    pred = [0, 0, 0]
    n_since_rst = 0
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        if restart_interval and n_since_rst == restart_interval:
            bwr.flush()
            chunks.append(bytes(bwr.out))
            bwr = _BitWriter()
            pred = [0, 0, 0]
            n_since_rst = 0
        per_comp = ([(0, my * hs + by, mx * hs + bx, bw_l)
                     for by in range(hs) for bx in range(hs)]
                    + [(1, my, mx, mcux), (2, my, mx, mcux)])
        for ci, row, col, bw in per_comp:
            blk = coef[ci][row * bw + col].reshape(64)[_ZZ]
            diff = int(blk[0]) - pred[ci]
            pred[ci] += diff
            t = _category(diff)
            bwr.put(*_DC_CODE[t])
            if t:
                bwr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
            nz = np.nonzero(blk[1:])[0]
            prev = 0
            for idx in nz:
                run = int(idx) - prev
                prev = int(idx) + 1
                while run > 15:
                    bwr.put(*_AC_CODE[0xF0])   # ZRL
                    run -= 16
                v = int(blk[1 + idx])
                s = _category(v)
                bwr.put(*_AC_CODE[(run << 4) | s])
                bwr.put(v if v >= 0 else v + (1 << s) - 1, s)
            if prev != 63:
                bwr.put(*_AC_CODE[0x00])       # EOB
        n_since_rst += 1
    bwr.flush()
    chunks.append(bytes(bwr.out))

    out = bytearray(b"\xff\xd8")               # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]))
        out.extend((len(body) + 2).to_bytes(2, "big"))
        out.extend(body)

    for tq, q in ((0, QT_LUMA), (1, QT_CHROMA)):
        seg(0xDB, bytes([tq]) + bytes(int(v) for v in q.reshape(64)[_ZZ]))
    seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([3,
                 1, (hs << 4) | hs, 0,
                 2, 0x11, 1,
                 3, 0x11, 1]))
    for tc, th, bits, vals in ((0, 0, _DC_BITS, _DC_VALS),
                               (1, 0, _AC_BITS, _AC_VALS),
                               (0, 1, _DC_BITS, _DC_VALS),
                               (1, 1, _AC_BITS, _AC_VALS)):
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + vals)
    if restart_interval:
        seg(0xDD, restart_interval.to_bytes(2, "big"))
    seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    for i, ch in enumerate(chunks):
        if i:
            out.extend(b"\xff" + bytes([0xD0 + (i - 1) % 8]))
        out.extend(ch)
    out.extend(b"\xff\xd9")                    # EOI
    return bytes(out), coef


def _safe_round(x: np.ndarray, eps: float = 1e-6):
    """clip(floor(x + 0.5)) -- or None if any value sits within eps of
    a rounding boundary (caller regenerates the image)."""
    frac = (x + 0.5) % 1.0
    if np.min(np.minimum(frac, 1.0 - frac)) < eps:
        return None
    return np.clip(np.floor(x + 0.5), 0, 255)


def golden_decode(coef, w: int, h: int, subsample: bool = False):
    """Reference decode from quantized coefficients via the brute-force
    basis IDCT -- the decoder must reproduce these exact integers.
    Returns (sum_r, sum_g, sum_b) or None if rounding is ambiguous."""
    hs = 2 if subsample else 1
    mcux = -(-w // (8 * hs))
    mcuy = -(-h // (8 * hs))
    planes = []
    for pi, c in enumerate(coef):
        q = QT_LUMA if pi == 0 else QT_CHROMA
        deq = (c * q[None]).astype(np.float64)
        pix = np.einsum("uvxy,nuv->nxy", _B, deq, optimize=False) + 128.0
        pix = _safe_round(pix)
        if pix is None:
            return None
        bw = mcux * (hs if pi == 0 else 1)
        bh = mcuy * (hs if pi == 0 else 1)
        plane = pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(bh * 8, bw * 8)
        if pi > 0:
            plane = np.repeat(np.repeat(plane, hs, axis=0), hs, axis=1)
        planes.append(plane[:h, :w])
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = _safe_round(np.stack([r, g, b], axis=-1))
    if rgb is None:
        return None
    s = rgb.reshape(-1, 3).sum(axis=0, dtype=np.int64)
    return int(s[0]), int(s[1]), int(s[2])
