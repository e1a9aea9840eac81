"""Multimodal plumbing: media table extraction + actor-pool decode
stage (stubbed decoder, real schema/batch contract)."""

import numpy as np
import pyarrow as pa

from open_source_search_engine_ray.pipelines.media import (
    FEATURE_DIM,
    MediaDecodeStage,
    media_features,
    media_table_from_spans,
    synth_payload,
)
from open_source_search_engine_ray.sources.synthweb import SynthWeb, WebConfig


def test_media_table_shape():
    web = SynthWeb(WebConfig(n_hosts=10))
    t = media_table_from_spans(web.documents_table())
    assert t.column_names == ["doc_id", "media_ref", "kind", "payload"]
    assert set(t["kind"].to_pylist()) <= {"image", "video"}
    assert t.num_rows > 0
    assert all(len(p) > 0 for p in t["payload"].to_pylist())


def test_decode_stage_contract():
    web = SynthWeb(WebConfig(n_hosts=8))
    t = media_table_from_spans(web.documents_table())
    stage = MediaDecodeStage()
    out = stage(t.slice(0, min(16, t.num_rows)))
    assert out.schema.field("feature").type == pa.list_(pa.float64(), FEATURE_DIM)
    assert (np.array(out["width"].to_pylist()) > 0).all()
    vids = [i for i, k in enumerate(out["kind"].to_pylist()) if k == "video"]
    for i in vids:
        assert out["n_frames"][i].as_py() > 1
        assert out["sampled_frames"][i].as_py() >= 1
    # deterministic
    out2 = stage(t.slice(0, min(16, t.num_rows)))
    assert out.equals(out2)


def test_payload_deterministic():
    assert synth_payload("http://x.test/a.jpg", "image") == synth_payload(
        "http://x.test/a.jpg", "image"
    )
    assert synth_payload("http://x.test/a.jpg", "image") != synth_payload(
        "http://x.test/b.jpg", "image"
    )


def test_media_pipeline_e2e(ray_session):
    df = media_features("/root/testdata/sf0.001")
    assert len(df) > 0
    assert {"doc_id", "media_ref", "kind", "width", "height", "resized_w", "feature_norm"} <= set(df.columns)
    assert (df["feature_norm"] - 1.0).abs().max() < 1e-3


def test_bmp_roundtrip_and_real_decode():
    """Image payloads are real 24bpp BMPs decoded with pure numpy:
    encode→decode round-trips pixels exactly; the stage reports the
    true header dimensions and resizes actual pixels."""
    from open_source_search_engine_ray.pipelines.media import (
        decode_bmp,
        encode_bmp,
        resize_nearest,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)  # odd row pad
    assert (decode_bmp(encode_bmp(img)) == img).all()
    small = resize_nearest(img, 10, 7)
    assert small.shape == (7, 10, 3)
    # stage: width/height come from the real headers — synth_payload
    # rotates BMP/PNG/JPEG by ref hash; exercise one of each
    from open_source_search_engine_ray.pipelines.media import (
        PNG_SIG,
        decode_png,
    )
    from open_source_search_engine_ray.pipelines.media_jpeg import decode_jpeg

    cases = {  # ref → (expected signature check, decoder)
        "http://x.test/real1.jpg": (lambda p: p[:2] == b"BM", decode_bmp),
        "http://x.test/real3.jpg": (lambda p: p[:8] == PNG_SIG, decode_png),
        "http://x.test/real0.jpg": (
            lambda p: p[:2] == b"\xff\xd8",
            decode_jpeg,
        ),
    }
    for ref, (sig_ok, dec) in cases.items():
        payload = synth_payload(ref, "image")
        assert sig_ok(payload), ref
        w_hdr = dec(payload).shape[1]
        t = pa.table(
            {
                "doc_id": pa.array(["d"]),
                "media_ref": pa.array([ref]),
                "kind": pa.array(["image"]),
                "payload": pa.array([payload], pa.binary()),
            }
        )
        out = MediaDecodeStage()(t)
        assert out["width"][0].as_py() == w_hdr, ref
        assert abs(out["feature_norm"][0].as_py() - 1.0) < 1e-3


def test_wav_roundtrip_and_audio_decode():
    """Audio payloads are real RIFF/WAVE PCM decoded with pure numpy:
    encode→decode round-trips samples; the stage extracts spectral band
    features and 100ms frame counts from the actual waveform."""
    from open_source_search_engine_ray.pipelines.media import (
        decode_wav,
        encode_wav,
    )

    samples = (np.sin(np.arange(4000) * 0.05) * 10000).astype(np.int16)
    got, rate = decode_wav(encode_wav(samples, rate=8000))
    assert rate == 8000 and (got == samples).all()
    payload = synth_payload("http://x.test/clip.wav", "audio")
    assert payload[:4] == b"RIFF"
    t = pa.table(
        {
            "doc_id": pa.array(["d"]),
            "media_ref": pa.array(["http://x.test/clip.wav"]),
            "kind": pa.array(["audio"]),
            "payload": pa.array([payload], pa.binary()),
        }
    )
    out = MediaDecodeStage()(t)
    assert out["width"][0].as_py() == 8000  # sample rate for audio rows
    assert out["height"][0].as_py() > 0  # duration ms
    assert out["n_frames"][0].as_py() >= 1
    assert abs(out["feature_norm"][0].as_py() - 1.0) < 1e-3
    # distinct refs produce distinct spectra
    p2 = synth_payload("http://x.test/other.wav", "audio")
    assert p2 != payload


def test_png_roundtrip_all_filters_and_depths():
    """PNG codec (pure numpy + zlib): every scanline filter (0-4),
    gray/RGB/RGBA channels, stored AND compressed zlib streams all
    round-trip pixels exactly."""
    from open_source_search_engine_ray.pipelines.media import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(11)
    for ch in (1, 3, 4):
        img = rng.integers(0, 256, size=(6, 9, ch), dtype=np.uint8)
        src = img[:, :, 0] if ch == 1 else img
        for filters in (None, [1] * 6, [2] * 6, [3] * 6, [4] * 6,
                        [0, 1, 2, 3, 4, 2]):
            for stored in (False, True):
                back = decode_png(encode_png(src, filters=filters,
                                             stored=stored))
                assert back.shape == (6, 9, ch)
                assert (back == img).all(), (ch, filters, stored)


def test_png_stage_dispatch_and_hostile_input():
    """MediaDecodeStage dispatches on the PNG signature and decodes for
    real (header dims reported); truncated/corrupt PNG bytes raise
    ValueError instead of garbage."""
    import pytest
    import zlib

    from open_source_search_engine_ray.pipelines.media import (
        PNG_SIG,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(21, 34, 3), dtype=np.uint8)
    payload = encode_png(img, filters=[4] * 21)
    st = MediaDecodeStage()
    w, h, fr, feat = st._decode(payload, "image")
    assert (w, h, fr) == (34, 21, 1)
    assert abs(float(np.linalg.norm(feat)) - 1.0) < 1e-6
    with pytest.raises(ValueError):
        decode_png(b"\x89PNGxxxx" + payload[8:])  # bad signature
    with pytest.raises(ValueError):
        decode_png(PNG_SIG)  # no IHDR
    with pytest.raises((ValueError, zlib.error)):
        decode_png(payload[:60])  # truncated IDAT
    # 16-bit depth / interlace rejected, not mis-decoded
    bad = bytearray(payload)
    bad[24] = 16  # depth byte inside IHDR
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
