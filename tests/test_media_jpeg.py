"""Pure-numpy baseline JPEG codec: round-trips, exactness on DC-only
images, subsampling/restart variants, scope errors, hostile bytes.

No Ray needed — pure kernels (reference parity target: Images.cpp:14-40
thumbnails crawled images via external jpegtopnm; this codec is the
in-process replacement)."""

import numpy as np
import pytest

from open_source_search_engine_ray.pipelines.media import MediaDecodeStage
from open_source_search_engine_ray.pipelines.media_jpeg import (
    QT_LUMA,
    decode_jpeg,
    encode_jpeg,
    fdct8,
    idct8,
    rgb_to_ycbcr,
    scale_qt,
    ycbcr_to_rgb,
)


def _mae(a, b):
    return float(np.abs(a.astype(np.int64) - b.astype(np.int64)).mean())


def test_dct_roundtrip_orthonormal():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(17, 8, 8))
    assert np.allclose(idct8(fdct8(x)), x, atol=1e-12)


def test_color_roundtrip():
    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    back = ycbcr_to_rgb(rgb_to_ycbcr(rgb))
    assert _mae(back, rgb) < 0.7  # integer round-trip error only


def test_solid_gray_exact():
    # DC-only blocks survive quantization exactly when 8*(v-128) is a
    # multiple of q00 — v=128 (DC 0) always does
    img = np.full((24, 16), 128, np.uint8)
    out = decode_jpeg(encode_jpeg(img, 85))
    assert out.shape == (24, 16)
    assert (out == 128).all()


@pytest.mark.parametrize("quality", [50, 85, 95])
@pytest.mark.parametrize("shape", [(8, 8), (24, 33), (40, 56), (7, 5)])
def test_gray_roundtrip_bound(quality, shape):
    y, x = np.mgrid[0 : shape[0], 0 : shape[1]]
    img = ((x * 7 + y * 3) % 200 + 20).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality))
    assert out.shape == shape
    assert _mae(out, img) < (14 if quality == 50 else 6)


@pytest.mark.parametrize("subsample", ["444", "420"])
@pytest.mark.parametrize("restart", [0, 2])
def test_rgb_roundtrip_bound(subsample, restart):
    y, x = np.mgrid[0:40, 0:56]
    img = np.stack([(x * 4) % 256, (y * 5) % 256, ((x + y) * 3) % 256], -1).astype(
        np.uint8
    )
    out = decode_jpeg(
        encode_jpeg(img, 90, subsample=subsample, restart_interval=restart)
    )
    assert out.shape == img.shape
    assert _mae(out, img) < (1.5 if subsample == "444" else 4.0)


def test_restart_markers_present_and_equal():
    img = np.full((32, 32, 3), 200, np.uint8)
    plain = encode_jpeg(img, 85, restart_interval=0)
    rst = encode_jpeg(img, 85, restart_interval=1)
    assert b"\xff\xd0" in rst and b"\xff\xd0" not in plain
    assert (decode_jpeg(rst) == decode_jpeg(plain)).all()


def test_dc_only_closed_form():
    """The media_jpeg_decode oracle's expectation: for a solid gray v,
    every pixel decodes to round(round_half_away(8*(v-128)/q00)*q00/8
    + 128) — the same closed form the SQL twin computes.  Pairs where
    8*|v-128| lands EXACTLY on a .5 quantization boundary are skipped:
    there the FDCT's ~1e-13 float error decides the rounding, so the
    closed form is ill-defined (the oracle fixture avoids them too)."""
    checked = 0
    for v in (0, 37, 91, 128, 203, 255):
        for q in (50, 85, 95):
            q00 = int(scale_qt(QT_LUMA, q)[0])
            if (8 * abs(v - 128) * 2) % (2 * q00) == q00:
                continue  # exact .5 boundary — skip
            dcq = np.sign(8.0 * (v - 128)) * np.floor(
                np.abs(8.0 * (v - 128) / q00) + 0.5
            )
            exp = int(np.clip(np.round(dcq * q00 / 8.0 + 128.0), 0, 255))
            img = np.full((16, 24), v, np.uint8)
            out = decode_jpeg(encode_jpeg(img, q))
            assert (out == exp).all(), (v, q, exp, np.unique(out))
            checked += 1
    assert checked >= 12


def test_scope_errors():
    img = np.full((8, 8), 1, np.uint8)
    data = bytearray(encode_jpeg(img, 85))
    # flip SOF0 to SOF2 (progressive) — find the marker
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no SOF/SOS


def test_hostile_bytes_never_hang():
    rng = np.random.default_rng(9)
    base = encode_jpeg(np.full((16, 16), 77, np.uint8), 85)
    for k in range(40):
        data = bytearray(base)
        for _ in range(3):
            data[int(rng.integers(2, len(data)))] = int(rng.integers(0, 256))
        try:
            decode_jpeg(bytes(data))
        except (ValueError, IndexError):
            pass  # any clean error is fine; no hang/segfault


def test_media_stage_dispatches_jpeg():
    import pyarrow as pa

    img = np.full((20, 30, 3), [10, 200, 60], np.uint8)
    payload = encode_jpeg(img, 90)
    stage = MediaDecodeStage(target_size=8)
    out = stage(
        pa.table(
            {
                "doc_id": ["d0"],
                "media_ref": ["http://h.test/img0.jpg"],
                "kind": ["image"],
                "payload": pa.array([payload], pa.binary()),
            }
        )
    )
    d = out.to_pylist()[0]
    assert (d["width"], d["height"]) == (30, 20)
    assert d["n_frames"] == 1
