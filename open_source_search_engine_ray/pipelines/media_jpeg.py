"""Pure-numpy baseline JPEG codec (8-bit, SOF0; gray / YCbCr 4:4:4 /
4:2:0, restart markers).

The reference thumbnails crawled images through external converters
(``Images.cpp:14-40`` shells out to ``jpegtopnm``/``pngtopnm``/
``giftopnm``); none of those binaries — nor PIL — exist in this
container, and a real crawl's image bytes are overwhelmingly JPEG.
This module closes that case the same way the PDF extractor closed
CT_PDF: a from-scratch pure-Python implementation of the baseline
(ITU-T T.81) decode path — segment walk, Huffman entropy decode with
byte unstuffing and RSTn resync, dequantize + dezigzag, orthonormal
8×8 IDCT as two matrix products, chroma upsample, YCbCr→RGB — plus a
matching encoder used to build deterministic test fixtures (the codec
family pattern of :mod:`.media`'s BMP/PNG/WAV).

Scope (documented, raising ``ValueError`` outside it): baseline DCT
(SOF0) only — progressive (SOF2), arithmetic coding, 12-bit depth and
CMYK are not decoded.  That covers the vast majority of web JPEGs;
``MediaDecodeStage`` treats a raised error like any other undecodable
payload.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K — the interchange defaults every encoder ships)
# ---------------------------------------------------------------------------

#: zig-zag order: ZIGZAG[i] = raster index of the i-th coefficient
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: Annex K.1/K.2 base quantization tables (luminance, chrominance), raster order
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 Huffman specs: (BITS count per code length 1..16, HUFFVAL)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (libjpeg jcparam.c convention)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    qt = (base * s + 50) // 100
    return np.clip(qt, 1, 255)


def _basis() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis B (B @ B.T == I): T.81's 2-D FDCT is
    coef = B @ px @ B.T and the IDCT is px = B.T @ coef @ B."""
    k = np.arange(8).reshape(-1, 1)
    n = np.arange(8).reshape(1, -1)
    m = np.cos((2 * n + 1) * k * np.pi / 16) / 2
    m[0] /= np.sqrt(2)
    return m


_B = _basis()  # orthonormal: _B @ _B.T == I


def fdct8(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial → (n, 8, 8) T.81 DCT coefficients."""
    return _B @ blocks @ _B.T


def idct8(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) coefficients → (n, 8, 8) spatial."""
    return _B.T @ blocks @ _B


# ---------------------------------------------------------------------------
# Color transforms (JFIF / BT.601 full-range, the T.871 integer convention)
# ---------------------------------------------------------------------------


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


def _build_codes(bits: list, vals: list) -> dict:
    """T.81 C.2 canonical code assignment: {symbol: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """Peek-table Huffman decoder: one 16-bit window lookup per symbol."""

    __slots__ = ("sym", "ln")

    def __init__(self, bits: list, vals: list):
        self.sym = np.zeros(1 << 16, dtype=np.int16)
        self.ln = np.zeros(1 << 16, dtype=np.int8)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                hi = lo + (1 << (16 - length))
                self.sym[lo:hi] = vals[k]
                self.ln[lo:hi] = length
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an entropy segment (already unstuffed)."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 48:
            if self.pos < len(self.data):
                self.buf = (self.buf << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.buf <<= 8  # T.81 F.2.2.5 pads with (implied) 1s; zeros
                # also terminate cleanly because callers stop at MCU count
            self.nbits += 8

    def decode(self, hd: _HuffDecoder) -> int:
        self._fill()
        window = (self.buf >> (self.nbits - 16)) & 0xFFFF
        ln = hd.ln[window]
        if ln == 0:
            raise ValueError("invalid JPEG Huffman code")
        self.nbits -= int(ln)
        return int(hd.sym[window])

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        v = (self.buf >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return int(v)


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


class _BitWriter:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.buf >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.buf &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s (F.1.2.3)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dht_payload(tc: int, th: int, spec: tuple) -> bytes:
    bits, vals = spec
    return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)


def _encode_component_block(w: _BitWriter, zz: np.ndarray, pred: int,
                            dc_codes: dict, ac_codes: dict) -> int:
    """Encode one zig-zag-ordered quantized block; returns new DC pred."""
    dc = int(zz[0])
    diff = dc - pred
    if diff < 0:
        t = (-diff).bit_length()
        mag = diff + (1 << t) - 1
    else:
        t = diff.bit_length()
        mag = diff
    code, ln = dc_codes[t]
    w.put(code, ln)
    if t:
        w.put(mag & ((1 << t) - 1), t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k] != 0:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        if v < 0:
            t = (-v).bit_length()
            mag = v + (1 << t) - 1
        else:
            t = v.bit_length()
            mag = v
        code, ln = ac_codes[run << 4 | t]
        w.put(code, ln)
        w.put(mag & ((1 << t) - 1), t)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.put(code, ln)
    return dc


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W multiples of 8 → (H//8 * W//8, 8, 8), raster MCU order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _pad_edge(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, bh - h), (0, bw - w)), mode="edge")


def encode_jpeg(img: np.ndarray, quality: int = 85, subsample: str = "444",
                restart_interval: int = 0) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 → baseline JFIF bytes.

    ``subsample``: "444" (one block per component per MCU) or "420"
    (2×2 luma blocks + one chroma pair per MCU).  ``restart_interval``
    in MCUs (0 = none) exercises the decoder's RSTn resync."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt_l = scale_qt(QT_LUMA, quality)
    qt_c = scale_qt(QT_CHROMA, quality)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(qt_l[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(qt_c[ZIGZAG].astype(np.uint8)))
    # SOF0
    if gray:
        comp_spec = bytes([1, 0x11, 0])
        ncomp = 1
    elif subsample == "420":
        comp_spec = bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
        ncomp = 3
    else:
        comp_spec = bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
        ncomp = 3
    out += _seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([ncomp]) + comp_spec,
    )
    out += _seg(0xC4, _dht_payload(0, 0, HUFF_DC_LUMA))
    out += _seg(0xC4, _dht_payload(1, 0, HUFF_AC_LUMA))
    if not gray:
        out += _seg(0xC4, _dht_payload(0, 1, HUFF_DC_CHROMA))
        out += _seg(0xC4, _dht_payload(1, 1, HUFF_AC_CHROMA))
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    if gray:
        out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    else:
        out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    # planes
    if gray:
        planes = [img.astype(np.float64) - 128.0]
        hs, vs = [1], [1]
    else:
        ycc = rgb_to_ycbcr(img)
        y = ycc[..., 0]
        cb = ycc[..., 1]
        cr = ycc[..., 2]
        if subsample == "420":
            h2 = (h + 1) // 2 * 2
            w2 = (w + 1) // 2 * 2
            cbp = _pad_edge(cb, h2, w2)
            crp = _pad_edge(cr, h2, w2)
            cb = cbp.reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))
            hs, vs = [2, 1, 1], [2, 1, 1]
        else:
            hs, vs = [1, 1, 1], [1, 1, 1]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]

    hmax, vmax = max(hs), max(vs)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # pad each plane to its MCU-aligned size and pre-block
    comp_blocks = []
    comp_bw = []
    for ci, pl in enumerate(planes):
        bw = mcux * hs[ci]
        bh = mcuy * vs[ci]
        pl = _pad_edge(pl, bh * 8, bw * 8)
        coef = fdct8(_blocks_of(pl))
        qt_r = (qt_l if (ci == 0 or gray) else qt_c).reshape(8, 8).astype(np.float64)
        q = coef / qt_r
        q = np.sign(q) * np.floor(np.abs(q) + 0.5)  # round half away (dequant twin)
        zz = q.reshape(-1, 64)[:, ZIGZAG].astype(np.int64)
        comp_blocks.append(zz)
        comp_bw.append(bw)

    dc_codes = [_build_codes(*HUFF_DC_LUMA)] + (
        [] if gray else [_build_codes(*HUFF_DC_CHROMA)] * 2
    )
    ac_codes = [_build_codes(*HUFF_AC_LUMA)] + (
        [] if gray else [_build_codes(*HUFF_AC_CHROMA)] * 2
    )

    wtr = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                wtr.flush()
                out += wtr.out
                wtr = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * len(planes)
            for ci in range(len(planes)):
                for by in range(vs[ci]):
                    for bx in range(hs[ci]):
                        bi = (my * vs[ci] + by) * comp_bw[ci] + mx * hs[ci] + bx
                        preds[ci] = _encode_component_block(
                            wtr, comp_blocks[ci][bi], preds[ci],
                            dc_codes[ci], ac_codes[ci],
                        )
            mcu_i += 1
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _unstuff(data: bytes) -> tuple:
    """Split an entropy-coded segment on RSTn markers, dropping stuffed
    zero bytes.  Returns (list of byte-chunks, offset past the scan)."""
    chunks = []
    cur = bytearray()
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            chunks.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break  # next real marker (EOI / next SOS)
    chunks.append(bytes(cur))
    return chunks, i


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w) uint8 gray or (h, w, 3) uint8 RGB."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG payload")
    i = 2
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    comps: list = []
    h = w = 0
    restart_interval = 0
    scan: list = []
    while i + 1 < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if i + 2 > len(data):
            raise ValueError("truncated JPEG segment")
        seglen = int.from_bytes(data[i : i + 2], "big")
        seg = data[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.frombuffer(seg[j + 1 : j + 65], np.uint8).astype(np.int64)
                raster = np.zeros(64, np.int64)
                raster[ZIGZAG] = tab
                qt[tq] = raster
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17 : j + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, vals)
                j += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            if seg[0] != 8:
                raise ValueError("only 8-bit JPEG supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic)")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                for comp in comps:
                    if comp["id"] == cs:
                        comp["td"] = tt >> 4
                        comp["ta"] = tt & 15
            scan_start = i + seglen
            chunks, used = _unstuff(data[scan_start:])
            scan = chunks
            i = scan_start + used
            break  # single-scan baseline
        i += seglen
    if not comps or not scan or h == 0 or w == 0:
        raise ValueError("JPEG missing SOF/SOS")
    for c in comps:
        if c["tq"] not in qt or c.get("td") not in huff_dc or c.get("ta") not in huff_ac:
            raise ValueError("JPEG component references a missing table")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    n_mcu = mcux * mcuy
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["zz"] = np.zeros((c["bw"] * c["bh"], 64), dtype=np.int32)

    # entropy decode, MCU-interleaved, resync at restart boundaries
    chunk_i = 0
    rd = _BitReader(scan[0])
    preds = [0] * len(comps)
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            chunk_i += 1
            if chunk_i >= len(scan):
                raise ValueError("JPEG truncated at restart boundary")
            rd = _BitReader(scan[chunk_i])
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, c in enumerate(comps):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    t = rd.decode(huff_dc[c["td"]])
                    diff = _extend(rd.receive(t), t)
                    preds[ci] += diff
                    blk = c["zz"][(my * c["v"] + by) * c["bw"] + mx * c["h"] + bx]
                    blk[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = rd.decode(huff_ac[c["ta"]])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        blk[k] = _extend(rd.receive(s), s)
                        k += 1

    # dequantize → dezigzag → IDCT → plane assembly
    planes = []
    for c in comps:
        deq = c["zz"].astype(np.float64) * qt[c["tq"]][ZIGZAG]
        raster = np.zeros_like(deq)
        raster[:, ZIGZAG] = deq
        px = idct8(raster.reshape(-1, 8, 8)) + 128.0
        bh, bw = c["bh"], c["bw"]
        plane = (
            px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution (nearest / pixel replication)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(comps) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(comps) == 3:
        return ycbcr_to_rgb(np.stack(planes, axis=-1))
    raise ValueError(f"unsupported JPEG component count {len(comps)}")
