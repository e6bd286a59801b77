"""Multimodal (binary) column plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed metadata;
decode / feature-extraction runs as an actor-pool ``map_batches`` stage with
SMALL batches (payloads are large).  The decode libraries are not available in
this environment, so :class:`RealDecoder` raises ``NotImplementedError`` while
:class:`DeterministicFakeDecoder` derives an 8-dim uint16 feature vector from
the payload's md5 — keeping the Ray-side plumbing (schema, actor signature,
batch sizing, output layout) real and testable, and even SQL-checkable
(the fake features are a pure function of md5).
"""

from __future__ import annotations

import hashlib
import math
import os
from typing import Protocol

import pyarrow as pa

FEATURE_DIM = 8

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("meta", pa.string()),  # JSON metadata (dims, codec, duration...)
    ]
)


class Decoder(Protocol):
    def features(self, payload: bytes, media_type: str) -> list[float]: ...


class RealDecoder:
    """Placeholder for a real decode path (PIL/ffmpeg/torchvision)."""

    def features(self, payload: bytes, media_type: str) -> list[float]:
        raise NotImplementedError(
            "media decode libraries are not available in this environment; "
            "use DeterministicFakeDecoder or install a decoder"
        )


class DeterministicFakeDecoder:
    """8 × uint16 features from the payload md5 (matches the SQL oracle:
    ('0x' || substr(md5(payload), i*4+1, 4))::INT for i in 0..7)."""

    def features(self, payload: bytes, media_type: str) -> list[float]:
        hx = hashlib.md5(payload).hexdigest()
        return [float(int(hx[i * 4 : i * 4 + 4], 16)) for i in range(FEATURE_DIM)]


class MediaFeatureStage:
    """Actor-pool stage: binary payloads → feature vectors + norms.

    Use ``batch_size`` small (e.g. 16-64) — payload bytes × batch ×
    concurrency must fit the worker heap.
    """

    def __init__(self, decoder: Decoder | None = None):
        self.decoder = decoder or DeterministicFakeDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats, norms = [], []
        for payload, mtype in zip(payloads, types):
            f = self.decoder.features(payload or b"", mtype)
            feats.append(f)
            norms.append(round(math.sqrt(sum(x * x for x in f)), 4))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(types, pa.string()),
                "features": pa.array(feats, pa.list_(pa.float64())),
                "feature_norm": pa.array(norms, pa.float64()),
            }
        )


def documents_as_media(sf_dir: str):
    """Deterministic media table derived from documents (text bytes as
    payload) — exercises the binary-column path without real media files."""
    import ray.data as rd

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(["image"] * len(ids), pa.string()),
                "payload": pa.array(
                    [(t or "").encode("utf-8") for t in texts], pa.binary()
                ),
                "meta": pa.array(["{}"] * len(ids), pa.string()),
            },
            schema=MEDIA_SCHEMA,
        )

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)


def media_feature_norms(sf_dir: str):
    ds = documents_as_media(sf_dir)
    out = ds.map_batches(
        MediaFeatureStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=64,
        concurrency=2,
    )
    return out.map_batches(
        lambda t: t.select(["media_id", "feature_norm"]), batch_format="pyarrow"
    )
