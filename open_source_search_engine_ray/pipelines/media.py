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

import numpy as np
import pandas as pd
import pyarrow as pa

FEATURE_DIM = 32

try:  # real decoders are not available in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def synth_payload(media_ref: str, kind: str) -> bytes:
    """Deterministic opaque payload for a media ref (stands in for the
    fetched image/video bytes)."""
    h = hashlib.sha256(media_ref.encode()).digest()
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
        if HAVE_PIL:
            # real path (unused in this container, kept for parity)
            self._decode = self._decode_real
        else:
            self._decode = self._decode_fake

    def _decode_real(self, payload: bytes, kind: str):
        raise NotImplementedError(
            "real decode requires PIL/av, not present in this container"
        )

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
