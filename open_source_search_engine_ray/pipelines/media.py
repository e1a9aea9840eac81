"""Multimodal columns: media refs as opaque binary payloads with typed
metadata, processed by actor-pool map_batches stages.

The crawl corpus interleaves image/video spans (Images.h:14-40 in the
reference; media URLs are excluded from the frontier at
XmlDoc.cpp:15293-15303 but their refs land in the span sequence).  This
module demonstrates the 100 TB-scale plumbing for them:

- a media table (doc_id, media_ref, kind, payload:binary) — payloads are
  deterministic synthetic bytes here (no image/audio libs in this
  container);
- ``MediaDecodeStage``: a callable CLASS for
  ``map_batches(Cls, concurrency=N, batch_size=small)`` — decoder
  loaded once per actor in ``__init__``.  Real decode (PIL/av) is
  gated behind an import-try; without the libs a clearly-marked
  deterministic fake decoder produces (width, height, n_frames,
  feature vector) from the payload bytes, keeping schema, batch sizing,
  actor signature, and output layout real and tested;
- resize / frame-sample implemented on the fake-decoded representation
  with the same batch contract a real implementation would use.

Large binary payloads are the reason ``batch_size`` here is small
(64): batch bytes × concurrency must fit each worker's heap.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa

FEATURE_DIM = 32

# ---------------------------------------------------------------------------
# BMP codec (pure numpy — 24bpp BITMAPINFOHEADER): image payloads are
# REAL spec-compliant bitmaps, so the decode stage exercises an actual
# binary image decode + pixel resize + feature extraction with no
# external libs.  JPEG decodes via the pure-numpy baseline codec
# (media_jpeg.py); video remains the deterministic stub.
# ---------------------------------------------------------------------------


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24bpp bottom-up BMP bytes."""
    h, w, _ = rgb.shape
    row = (w * 3 + 3) & ~3
    img_size = row * h
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    buf = np.zeros((h, row), np.uint8)
    buf[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    return head + info + buf.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24bpp BMP bytes → (h, w, 3) uint8 RGB (top-down)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    w = struct.unpack_from("<i", data, 18)[0]
    hgt = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    if bpp != 24:
        raise ValueError(f"unsupported BMP bpp {bpp}")
    row = (w * 3 + 3) & ~3
    arr = np.frombuffer(data, np.uint8, count=row * abs(hgt), offset=off)
    img = arr.reshape(abs(hgt), row)[:, : w * 3].reshape(abs(hgt), w, 3)[:, :, ::-1]
    return img[::-1] if hgt > 0 else img


# ---------------------------------------------------------------------------
# PNG codec (pure numpy + stdlib zlib).  The reference thumbnails crawled
# images via external converters (Images.cpp:14-40 jpegtopnm/pngtopnm);
# PNG is fully decodable here — zlib inflate + the five per-scanline
# filters — so the most common real media bytes after JPEG decode for
# real.  8-bit gray (color 0), RGB (2) and RGBA (6) supported.
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _zlib_stored(data: bytes) -> bytes:
    """zlib stream with STORED (uncompressed) deflate blocks — byte
    layout a SQL oracle can re-read: 2-byte header, then per block
    1 byte BFINAL/BTYPE=00 + LEN + ~LEN (LE u16) + LEN raw bytes,
    adler32 trailer."""
    import zlib

    out = bytearray(b"\x78\x01")
    pos = 0
    while True:
        chunk = data[pos : pos + 65535]
        final = 1 if pos + 65535 >= len(data) else 0
        out.append(final)
        out += struct.pack("<HH", len(chunk), 0xFFFF ^ len(chunk))
        out += chunk
        pos += 65535
        if final:
            break
    return bytes(out) + struct.pack(">I", zlib.adler32(data) & 0xFFFFFFFF)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec 9.4), vectorized."""
    p = a + b - c
    pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))


def encode_png(
    img: np.ndarray, filters=None, stored: bool = False
) -> bytes:
    """(h, w[, ch]) uint8 → PNG bytes (8-bit gray/RGB/RGBA).

    ``filters``: per-scanline filter types (0-4), default all 0.
    ``stored=True`` writes the zlib stream as STORED deflate blocks so
    the byte layout is SQL-re-readable (the media_png_decode oracle)."""
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    if filters is None:
        filters = [0] * h
    lines = img.astype(np.int64).reshape(h, w * ch)
    raw = bytearray()
    prev = np.zeros(w * ch, np.int64)
    for r in range(h):
        f = filters[r]
        cur = lines[r]
        left = np.zeros_like(cur)
        left[ch:] = cur[:-ch]
        upleft = np.zeros_like(prev)
        upleft[ch:] = prev[:-ch]
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - (left + prev) // 2
        elif f == 4:
            filt = cur - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"bad filter {f}")
        raw.append(f)
        raw += (filt % 256).astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = _zlib_stored(bytes(raw)) if stored else zlib.compress(bytes(raw), 6)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, ch) uint8.  8-bit depth, color types
    0/2/6, no interlace; all five scanline filters defiltered."""
    import zlib

    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = color = depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or color not in _PNG_CHANNELS or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color}, interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline stream length mismatch")
    raw = raw.reshape(h, stride + 1)
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    for r in range(h):
        f = raw[r, 0]
        line = raw[r, 1:].astype(np.int64)
        if f == 0:
            rec = line
        elif f == 1:
            # Sub: recon[i] = raw[i] + recon[i-ch]  ==  per-channel
            # prefix sum mod 256 (mod distributes over +)
            rec = (
                np.cumsum(line.reshape(w, ch), axis=0).reshape(stride) % 256
            )
        elif f == 2:
            rec = (line + prev) % 256
        elif f in (3, 4):
            # Average/Paeth need recon[left] — sequential per pixel,
            # vectorized across channels
            rec = np.empty(stride, np.int64)
            lm = line.reshape(w, ch)
            pm = prev.reshape(w, ch)
            rm = rec.reshape(w, ch)
            um = np.zeros(ch, np.int64)
            lf = np.zeros(ch, np.int64)
            for x in range(w):
                pred = (
                    (lf + pm[x]) // 2
                    if f == 3
                    else _paeth(lf, pm[x], um)
                )
                rm[x] = (lm[x] + pred) % 256
                lf = rm[x]
                um = pm[x]
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[r] = rec
        prev = rec
    return out.reshape(h, w, ch)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono PCM → RIFF/WAVE bytes."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 1, 1,
        rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav(data: bytes) -> tuple:
    """RIFF/WAVE bytes → (int16 samples ndarray, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    rate = 8000
    samples = np.empty(0, np.int16)
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        clen = struct.unpack_from("<I", data, pos + 4)[0]
        if cid == b"fmt ":
            rate = struct.unpack_from("<I", data, pos + 12)[0]
        elif cid == b"data":
            samples = np.frombuffer(data, "<i2", count=clen // 2, offset=pos + 8)
        pos += 8 + clen + (clen & 1)
    return samples, rate


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure index gather."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[yi][:, xi]


def synth_payload(media_ref: str, kind: str) -> bytes:
    """Deterministic payload for a media ref.  Images are REAL encoded
    bytes rotating BMP/PNG/JPEG by ref hash (procedural pattern);
    audio is real RIFF PCM; "video" alternates multi-frame GIF
    (animation — the one video-ish container with a pure-Python codec
    here) with opaque bytes so the stub path stays exercised."""
    h = hashlib.sha256(media_ref.encode()).digest()
    if kind == "audio":
        # real PCM: a few hash-seeded sine partials, 0.1-0.6 s at 8 kHz
        n = 800 + h[0] * 16
        t = np.arange(n, dtype=np.float64)
        wave = sum(
            np.sin(2 * np.pi * (60 + h[i] * 8) * t / 8000.0) * (1.0 / (i + 1))
            for i in range(1, 4)
        )
        return encode_wav((wave / np.abs(wave).max() * 20000).astype(np.int16))
    if kind == "image":
        w = 32 + h[0] % 48
        ht = 24 + h[1] % 40
        yy, xx = np.mgrid[0:ht, 0:w]
        img = np.empty((ht, w, 3), np.uint8)
        img[:, :, 0] = (xx * h[2] + yy * h[3]) % 256
        img[:, :, 1] = (xx ^ yy) + h[4] & 0xFF
        img[:, :, 2] = (xx * xx + yy + h[5]) % 256
        fmt = h[6] % 3
        if fmt == 1:
            return encode_png(img)
        if fmt == 2:
            from .media_jpeg import encode_jpeg

            return encode_jpeg(img, quality=85)
        return encode_bmp(img)
    if kind == "video" and h[6] % 2 == 0:
        # real animation: multi-frame GIF, hash-seeded palette/pattern
        from .media_gif import encode_gif

        nf = 3 + h[7] % 6
        ncol = 4 + h[8] % 12
        i = np.arange(ncol, dtype=np.int64)
        pal = np.stack(
            [(h[9] + i * (1 + h[10] % 37)) % 256,
             (h[11] + i * (1 + h[12] % 37)) % 256,
             (h[13] + i * (1 + h[14] % 37)) % 256],
            axis=-1,
        ).astype(np.uint8)
        w = 16 + h[0] % 32
        ht = 12 + h[1] % 24
        yy, xx = np.mgrid[0:ht, 0:w]
        frames = [
            ((h[2] + 7 * f + xx * h[3] + yy * h[4]) % ncol).astype(np.uint8)
            for f in range(nf)
        ]
        return encode_gif(frames, pal)
    size = 256 + h[0] * 4
    reps = (size // len(h)) + 1
    return (h * reps)[:size]


def media_batch_from_spans(t: pa.Table) -> pa.Table:
    """map_batches transform: explode documents(doc_id, spans) rows into
    media rows (doc_id, media_ref, kind, payload).  The span flatten is
    columnar (ListArray lengths + struct children); only the payload
    "fetch" (synth bytes standing in for the media GET) is per-row."""
    spans = t["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    lens = spans.value_lengths().to_numpy(zero_copy_only=False)
    flat = spans.flatten()
    kinds = flat.field("kind")
    refs = flat.field("media_ref")
    doc_ids = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), lens)
    keep = np.asarray(
        pa.compute.is_in(kinds, value_set=pa.array(["image", "video"]))
    )
    kept_refs = np.asarray(refs.to_numpy(zero_copy_only=False))[keep]
    kept_kinds = np.asarray(kinds.to_numpy(zero_copy_only=False))[keep]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[keep], pa.string()),
            "media_ref": pa.array(kept_refs, pa.string()),
            "kind": pa.array(kept_kinds, pa.string()),
            "payload": pa.array(
                [synth_payload(r, k) for r, k in zip(kept_refs, kept_kinds)],
                pa.binary(),
            ),
        }
    )


def media_table_from_spans(docs: pa.Table) -> pa.Table:
    """Driver-side convenience wrapper over media_batch_from_spans
    (fixtures/tests; the pipeline path runs it inside map_batches)."""
    return media_batch_from_spans(docs)


class MediaDecodeStage:
    """Actor-pool decode stage.  __init__ loads the decoder once per
    actor; __call__ decodes a batch → typed metadata + feature vector.

    With PIL/av present this would decode real payloads; here the
    STUB decoder derives deterministic (width, height, n_frames) and a
    FEATURE_DIM float vector from the payload bytes.  The schema and
    batch contract are exactly what a real decoder would produce.
    """

    def __init__(self, target_size: int = 64, frame_stride: int = 5):
        self.target_size = target_size
        self.frame_stride = frame_stride

    def _decode(self, payload: bytes, kind: str):
        """Dispatch on the payload magic: BMP, PNG, WAV and baseline
        JPEG decode for real (pure numpy); anything else falls back to
        the deterministic stub."""
        if payload[:2] == b"BM":
            return self._decode_bmp(payload)
        if payload[:8] == PNG_SIG:
            return self._image_features(decode_png(payload))
        if payload[:4] == b"RIFF":
            return self._decode_wav(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            # REAL GIF path (pure Python LZW, media_gif.py): first
            # frame's pixels + the TRUE frame count from the stream
            try:
                from .media_gif import decode_gif

                img, n_frames = decode_gif(payload)
                w, h, _one, feat = self._image_features(img)
                return w, h, n_frames, feat
            except ValueError:
                return self._decode_fake(payload, kind)
        if payload[:2] == b"\xff\xd8":
            # REAL baseline-JPEG path (pure numpy, media_jpeg.py);
            # progressive/arithmetic payloads raise and fall back to
            # the deterministic stub like any other undecodable bytes
            try:
                from .media_jpeg import decode_jpeg

                img = decode_jpeg(payload)
                if img.ndim == 2:
                    img = img[:, :, None]
                return self._image_features(img)
            except ValueError:
                return self._decode_fake(payload, kind)
        return self._decode_fake(payload, kind)

    def _decode_wav(self, payload: bytes):
        """REAL audio path: decode PCM, 'frames' = 100ms windows, and
        features = L2-normalized log band energies of the magnitude
        spectrum (the classic filterbank shape, pure numpy rFFT)."""
        samples, rate = decode_wav(payload)
        n = len(samples)
        windows = max(1, n * 10 // rate)  # 100 ms frame count
        spec = np.abs(np.fft.rfft(samples.astype(np.float64)))
        edges = np.linspace(0, len(spec), FEATURE_DIM + 1).astype(int)
        bands = np.array(
            [spec[a:b].sum() for a, b in zip(edges[:-1], edges[1:])]
        )
        feat = np.log1p(bands)
        norm = np.linalg.norm(feat)
        if norm > 0:
            feat = feat / norm
        # width/height carry (sample_rate, ms duration) for audio rows
        return rate, int(n * 1000 / rate), windows, feat

    def _decode_bmp(self, payload: bytes):
        return self._image_features(decode_bmp(payload))

    def _image_features(self, img: np.ndarray):
        """REAL image path (BMP + PNG): resize (aspect-preserving
        nearest-neighbor to target_size on the short side), and extract
        features from the RESIZED pixels — per-channel mean/std + a
        26-bin grayscale histogram, L2-normalized."""
        if img.shape[2] == 1:  # gray → 3-channel
            img = np.repeat(img, 3, axis=2)
        elif img.shape[2] == 4:  # drop alpha
            img = img[:, :, :3]
        h, w = img.shape[:2]
        scale = self.target_size / min(w, h)
        rw, rh = max(1, round(w * scale)), max(1, round(h * scale))
        small = resize_nearest(img, rw, rh).astype(np.float64)
        gray = small.mean(axis=2)
        hist, _ = np.histogram(gray, bins=FEATURE_DIM - 6, range=(0, 256))
        feat = np.concatenate(
            [
                small.reshape(-1, 3).mean(axis=0) / 255.0,
                small.reshape(-1, 3).std(axis=0) / 255.0,
                hist.astype(np.float64) / gray.size,
            ]
        )
        norm = np.linalg.norm(feat)
        if norm > 0:
            feat = feat / norm
        return w, h, 1, feat

    def _decode_fake(self, payload: bytes, kind: str):
        b = np.frombuffer(payload, dtype=np.uint8)
        width = 160 + int(b[0]) * 4
        height = 120 + int(b[1]) * 3
        n_frames = 1 if kind == "image" else 24 + int(b[2])
        # "feature extraction": mean-pooled byte histogram chunks,
        # resized to FEATURE_DIM — deterministic, vectorized
        hist = np.bincount(b, minlength=256).astype(np.float64)
        feat = hist.reshape(FEATURE_DIM, -1).mean(axis=1)
        norm = np.linalg.norm(feat)
        if norm > 0:
            feat = feat / norm
        return width, height, n_frames, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        n = len(payloads)
        w = np.empty(n, np.int32)
        h = np.empty(n, np.int32)
        fr = np.empty(n, np.int32)
        feats = np.empty((n, FEATURE_DIM), np.float64)
        for i in range(n):
            w[i], h[i], fr[i], feats[i] = self._decode(payloads[i], kinds[i])
        # resize metadata (aspect-preserving to target_size on the short
        # side) and frame sampling — the post-decode transforms
        scale = self.target_size / np.minimum(w, h)
        out_w = np.round(w * scale).astype(np.int32)
        out_h = np.round(h * scale).astype(np.int32)
        sampled = np.maximum(1, fr // self.frame_stride)
        norms = np.round(np.linalg.norm(feats, axis=1), 4)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_ref": batch["media_ref"],
                "kind": batch["kind"],
                "width": pa.array(w),
                "height": pa.array(h),
                "n_frames": pa.array(fr),
                "resized_w": pa.array(out_w),
                "resized_h": pa.array(out_h),
                "sampled_frames": pa.array(sampled),
                "feature": pa.array(list(feats), pa.list_(pa.float64(), FEATURE_DIM)),
                "feature_norm": pa.array(norms),
            }
        )


def media_features(sf_dir: str) -> pd.DataFrame:
    """End-to-end media pipeline over the synthetic corpus: spans →
    media table → actor-pool decode/resize/frame-sample → features.
    (sf_dir is unused for sizing; the corpus is the deterministic
    synthetic web.)"""
    import ray.data as rd

    from ..sources.synthweb import SynthWeb, WebConfig

    web = SynthWeb(WebConfig(n_hosts=30, n_hubs=2, hub_pages=12, max_pages=6))
    # distributed explode: documents → media rows inside map_batches
    # (at 100 TB the docs come from read_parquet over the docs dir)
    ds = rd.from_arrow(web.documents_table()).map_batches(
        media_batch_from_spans, batch_format="pyarrow", batch_size=256
    )
    out = ds.map_batches(
        MediaDecodeStage,
        concurrency=2,
        batch_size=64,  # binary payloads: keep batch × concurrency small
        batch_format="pyarrow",
        num_cpus=1,
    )
    df = out.drop_columns(["feature"]).to_pandas()
    return df.sort_values(["doc_id", "media_ref"]).reset_index(drop=True)


def media_caption_pairs(sf_dir: str) -> pd.DataFrame:
    """Image/video-caption pair extraction over INTERLEAVED text+media
    documents — the multimodal-training op the interleaved span layout
    exists for: each media span pairs with the nearest text span by
    offset distance (tie -> the PRECEDING text span, the usual
    caption-before-figure reading order); media in docs with no text
    span is dropped.

    Scale shape: doc-local and fully vectorized ACROSS docs — spans
    flatten to batch-wide Arrow children, a (doc_idx << 32 | offset)
    key makes one searchsorted resolve every media span's neighboring
    text spans in the whole batch at once (no per-doc Python loop).
    (sf_dir is unused for sizing; the corpus is the deterministic
    synthetic web, same as media_features.)"""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..sources.synthweb import SynthWeb, WebConfig

    web = SynthWeb(WebConfig(n_hosts=30, n_hubs=2, hub_pages=12, max_pages=6))
    ds = rd.from_arrow(web.documents_table())

    def pairs(t: pa.Table) -> pa.Table:
        spans = t["spans"].combine_chunks()
        flat = pc.list_flatten(spans)
        lens = pc.list_value_length(spans).to_numpy().astype(np.int64)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        kind = np.asarray(flat.field("kind").to_pylist(), dtype=object)
        off = flat.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)
        key = (doc_idx << np.int64(32)) | off
        is_t = kind == "text"
        is_m = (kind == "image") | (kind == "video")
        tkey = key[is_t]
        mkey = key[is_m]
        m_doc = doc_idx[is_m]
        pos = np.searchsorted(tkey, mkey)
        prev_i = np.clip(pos - 1, 0, max(len(tkey) - 1, 0))
        next_i = np.clip(pos, 0, max(len(tkey) - 1, 0))
        if len(tkey):
            prev_ok = (pos > 0) & ((tkey[prev_i] >> np.int64(32)) == m_doc)
            next_ok = (pos < len(tkey)) & ((tkey[next_i] >> np.int64(32)) == m_doc)
        else:
            prev_ok = next_ok = np.zeros(len(mkey), bool)
        d_prev = np.where(prev_ok, mkey - tkey[prev_i], np.int64(1) << 40)
        d_next = np.where(next_ok, tkey[next_i] - mkey, np.int64(1) << 40)
        use_prev = prev_ok & (~next_ok | (d_prev <= d_next))
        keep = prev_ok | next_ok
        chosen = np.where(use_prev, prev_i, next_i)[keep]
        t_rows = np.flatnonzero(is_t)
        m_rows = np.flatnonzero(is_m)[keep]
        texts = np.asarray(flat.field("text").to_pylist(), dtype=object)
        refs = np.asarray(flat.field("media_ref").to_pylist(), dtype=object)
        doc_ids = np.asarray(t["doc_id"].to_pylist(), dtype=object)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[doc_idx[m_rows]], pa.string()),
                "m_offset": pa.array(off[m_rows]),
                "kind": pa.array(kind[m_rows], pa.string()),
                "media_ref": pa.array(refs[m_rows], pa.string()),
                "caption": pa.array(texts[t_rows[chosen]], pa.string()),
                "dist": pa.array(
                    np.where(use_prev, d_prev, d_next)[keep].astype(np.int64)
                ),
            }
        )

    out = ds.map_batches(pairs, batch_format="pyarrow", batch_size=256).to_pandas()
    return out.sort_values(["doc_id", "m_offset"]).reset_index(drop=True)
