"""Pure-Python GIF codec (87a/89a, LZW, interlace, multi-frame count).

Completes the reference's ``Images.cpp:14-40`` converter trio
(``jpegtopnm``/``pngtopnm``/``giftopnm``) alongside the baseline JPEG
(:mod:`.media_jpeg`) and PNG (:mod:`.media`) codecs: a from-scratch
implementation of the GIF structure walk (logical screen descriptor,
color tables, extension/sub-block skipping) and the variable-width
LSB-first LZW entropy code, plus the 4-pass interlace reorder.

Like ``giftopnm``'s default, :func:`decode_gif` returns the FIRST
frame's pixels (composited frames with disposal methods are out of
scope — documented, not silently wrong: the frame COUNT is still
scanned from the full stream so animated payloads report their true
``n_frames``).  The encoder (single- or multi-frame, optional
interlace) exists to build deterministic test fixtures.
"""

from __future__ import annotations

import numpy as np

GIF_SIGS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# LZW (variable-width, LSB-first — GIF89a spec appendix F)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    pos = 0
    # bit reader state
    buf = 0
    nbits = 0
    di = 0
    width = min_code_size + 1
    # dict: list of byte strings; roots are single indices
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    prev: bytes | None = None
    while pos < n_pixels:
        while nbits < width:
            if di >= len(data):
                raise ValueError("GIF LZW stream truncated")
            buf |= data[di] << nbits
            di += 1
            nbits += 8
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        if pos + len(entry) > n_pixels:
            entry = entry[: n_pixels - pos]
        out[pos : pos + len(entry)] = np.frombuffer(entry, np.uint8)
        pos += len(entry)
        prev = table[code] if code < len(table) else entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if pos < n_pixels:
        raise ValueError("GIF LZW ended early")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    buf = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int):
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    table: dict = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    for b in bytes(indices.astype(np.uint8).tobytes()):
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Interlace (GIF89a spec appendix E: 4 passes 0::8, 4::8, 2::4, 1::2)
# ---------------------------------------------------------------------------


def _interlace_order(h: int) -> np.ndarray:
    return np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4),
         np.arange(1, h, 2)]
    )


# ---------------------------------------------------------------------------
# Encoder (fixture builder)
# ---------------------------------------------------------------------------


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: list | np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    loop: bool = True,
) -> bytes:
    """index frames ((h, w) uint8 arrays, or one array) + (n, 3) palette
    → GIF89a bytes.  Palette is padded to the next power of two."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    h, w = frames[0].shape
    pal = np.asarray(palette, dtype=np.uint8)
    ncol = len(pal)
    bits = max(1, int(ncol - 1).bit_length())
    full = 1 << bits
    pad = np.zeros((full - ncol, 3), np.uint8)
    pal_bytes = np.concatenate([pal, pad]).tobytes()
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])
    out += pal_bytes
    if len(frames) > 1 and loop:
        out += b"\x21\xff\x0bNETSCAPE2.0" + _sub_blocks(b"\x01\x00\x00")
    mcs = max(2, bits)
    for fr in frames:
        if len(frames) > 1:
            # graphic control extension (delay 4/100 s, no disposal)
            out += b"\x21\xf9" + _sub_blocks(b"\x00\x04\x00\x00")
        out += b"\x2c" + (0).to_bytes(2, "little") + (0).to_bytes(2, "little")
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0x40 if interlace else 0x00])
        px = fr[_interlace_order(h)] if interlace else fr
        out += bytes([mcs])
        out += _sub_blocks(_lzw_encode(px.reshape(-1), mcs))
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _read_sub_blocks(data: bytes, i: int) -> tuple:
    parts = []
    while True:
        if i >= len(data):
            raise ValueError("GIF sub-blocks truncated")
        n = data[i]
        i += 1
        if n == 0:
            break
        parts.append(data[i : i + n])
        if len(parts[-1]) < n:
            raise ValueError("GIF sub-block truncated")
        i += n
    return b"".join(parts), i


def decode_gif(data: bytes) -> tuple:
    """GIF bytes → ((h, w, 3) uint8 RGB of the FIRST frame, n_frames)."""
    if data[:6] not in GIF_SIGS:
        raise ValueError("not a GIF payload")
    if len(data) < 13:
        raise ValueError("GIF header truncated")
    w = int.from_bytes(data[6:8], "little")
    h = int.from_bytes(data[8:10], "little")
    if w == 0 or h == 0:
        raise ValueError("empty GIF canvas")
    packed = data[10]
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(data[i : i + 3 * n], np.uint8).reshape(-1, 3)
        if len(gct) < n:
            raise ValueError("GIF global color table truncated")
        i += 3 * n
    first: np.ndarray | None = None
    n_frames = 0
    while i < len(data):
        b = data[i]
        i += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            if i >= len(data):
                raise ValueError("GIF extension truncated")
            i += 1
            _, i = _read_sub_blocks(data, i)
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        # image descriptor
        if i + 9 > len(data):
            raise ValueError("GIF image descriptor truncated")
        fx = int.from_bytes(data[i : i + 2], "little")
        fy = int.from_bytes(data[i + 2 : i + 4], "little")
        fw = int.from_bytes(data[i + 4 : i + 6], "little")
        fh = int.from_bytes(data[i + 6 : i + 8], "little")
        fpack = data[i + 8]
        i += 9
        lct = gct
        if fpack & 0x80:
            n = 2 << (fpack & 7)
            lct = np.frombuffer(data[i : i + 3 * n], np.uint8).reshape(-1, 3)
            i += 3 * n
        if i >= len(data):
            raise ValueError("GIF image data truncated")
        mcs = data[i]
        i += 1
        lzw, i = _read_sub_blocks(data, i)
        n_frames += 1
        if first is not None:
            continue  # count remaining frames without decoding
        if lct is None:
            raise ValueError("GIF frame has no color table")
        if not (2 <= mcs <= 11):
            raise ValueError("bad GIF LZW min code size")
        idx = _lzw_decode(lzw, mcs, fw * fh).reshape(fh, fw)
        if fpack & 0x40:  # interlaced: inverse of the 4-pass order
            order = _interlace_order(fh)
            de = np.empty_like(idx)
            de[order] = idx
            idx = de
        if int(idx.max(initial=0)) >= len(lct):
            raise ValueError("GIF pixel index out of palette range")
        frame = lct[idx]
        # composite onto the canvas at (fx, fy) — first frame only
        if (fx, fy, fw, fh) == (0, 0, w, h):
            first = frame
        else:
            canvas = np.zeros((h, w, 3), np.uint8)
            canvas[fy : fy + fh, fx : fx + fw] = frame[: h - fy, : w - fx]
            first = canvas
    if first is None:
        raise ValueError("GIF has no image frames")
    return first, n_frames
