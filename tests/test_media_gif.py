"""Pure-Python GIF codec: LZW round-trips, interlace, multi-frame
count, palette edge sizes, scope errors, hostile bytes (reference
parity target: Images.cpp:14-40 giftopnm converter)."""

import numpy as np
import pytest

from open_source_search_engine_ray.pipelines.media import MediaDecodeStage
from open_source_search_engine_ray.pipelines.media_gif import (
    decode_gif,
    encode_gif,
)


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("shape", [(23, 31), (8, 8), (1, 1), (120, 200)])
def test_lossless_roundtrip(interlace, shape):
    rng = np.random.default_rng(hash(shape) % 1000)
    pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    img = rng.integers(0, 7, shape, dtype=np.uint8)
    out, nf = decode_gif(encode_gif(img, pal, interlace=interlace))
    assert nf == 1
    assert (out == pal[img]).all()


@pytest.mark.parametrize("ncol", [2, 4, 16, 256])
def test_palette_sizes(ncol):
    rng = np.random.default_rng(ncol)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    img = rng.integers(0, ncol, (17, 19), dtype=np.uint8)
    out, _ = decode_gif(encode_gif(img, pal))
    assert (out == pal[img]).all()


def test_multiframe_count_first_frame_pixels():
    rng = np.random.default_rng(2)
    pal = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    frames = [rng.integers(0, 5, (12, 14), dtype=np.uint8) for _ in range(7)]
    out, nf = decode_gif(encode_gif(frames, pal))
    assert nf == 7
    assert (out == pal[frames[0]]).all()


def test_lzw_table_overflow_path():
    # high-entropy 256-color image forces width growth to 12 bits and
    # the 4096-entry clear/reset
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    img = rng.integers(0, 256, (80, 120), dtype=np.uint8)
    out, _ = decode_gif(encode_gif(img, pal))
    assert (out == pal[img]).all()


def test_scope_errors():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 7)  # zero canvas
    pal = np.zeros((2, 3), np.uint8)
    data = bytearray(encode_gif(np.zeros((4, 4), np.uint8), pal))
    with pytest.raises(ValueError):
        decode_gif(bytes(data[:20]))  # truncated


def test_hostile_bytes_never_hang():
    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    base = encode_gif(rng.integers(0, 8, (16, 16), dtype=np.uint8), pal)
    for _ in range(40):
        data = bytearray(base)
        for _ in range(3):
            data[int(rng.integers(6, len(data)))] = int(rng.integers(0, 256))
        try:
            decode_gif(bytes(data))
        except (ValueError, IndexError):
            pass


def test_media_stage_dispatches_gif():
    import pyarrow as pa

    pal = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    img = np.zeros((20, 30), np.uint8)
    img[:, 15:] = 1
    frames = [img, 1 - img, img]
    stage = MediaDecodeStage(target_size=8)
    out = stage(
        pa.table(
            {
                "doc_id": ["d0"],
                "media_ref": ["http://h.test/anim.gif"],
                "kind": ["video"],
                "payload": pa.array([encode_gif(frames, pal)], pa.binary()),
            }
        )
    )
    d = out.to_pylist()[0]
    assert (d["width"], d["height"], d["n_frames"]) == (30, 20, 3)
