"""Multimodal (binary) column plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed metadata;
decode / feature-extraction runs as an actor-pool ``map_batches`` stage with
SMALL batches (payloads are large).  :class:`RealDecoder` really decodes the
stdlib-decodable formats (RIFF/WAVE PCM audio via ``wave``; uncompressed BMP
and binary PPM images) and raises ``NotImplementedError`` for compressed
formats whose libraries are absent here; :class:`DeterministicFakeDecoder`
derives an 8-dim uint16 feature vector from the payload's md5 — keeping the
Ray-side plumbing (schema, actor signature, batch sizing, output layout)
SQL-checkable (the fake features are a pure function of md5).
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
    """Real decode for stdlib-decodable formats; NotImplementedError beyond.

    - audio: RIFF/WAVE PCM via the stdlib ``wave`` module → features =
      [n_channels, sample_rate, n_frames, duration_ms, mean|sample|,
      max|sample|, rms, zero_crossings] over the first channel;
    - image: uncompressed 24/32-bit BMP or binary PPM (P6) → features =
      [width, height, mean R, mean G, mean B, min luma, max luma, mean luma].

    Compressed formats (jpeg/png/mp3/mp4 …) still raise — those decoders are
    genuinely absent here; in production swap in a PIL/ffmpeg-backed Decoder
    through the same protocol."""

    def features(self, payload: bytes, media_type: str) -> list[float]:
        if media_type == "audio" and payload[:4] == b"RIFF":
            return self._wav_features(payload)
        if media_type == "image" and payload[:2] == b"BM":
            return self._bmp_features(payload)
        if media_type == "image" and payload[:2] == b"P6":
            return self._ppm_features(payload)
        raise NotImplementedError(
            f"no stdlib decoder for this {media_type} payload "
            "(supported: WAV PCM audio, BMP/PPM images); install a decoder "
            "or use DeterministicFakeDecoder"
        )

    @staticmethod
    def _wav_features(payload: bytes) -> list[float]:
        import io
        import wave

        import numpy as np

        with wave.open(io.BytesIO(payload)) as w:
            n_ch, width, rate, n_frames = (
                w.getnchannels(), w.getsampwidth(), w.getframerate(),
                w.getnframes(),
            )
            raw = w.readframes(n_frames)
        dtype = {1: np.int8, 2: np.int16, 4: np.int32}.get(width)
        if dtype is None:
            raise NotImplementedError(f"unsupported WAV sample width {width}")
        samples = np.frombuffer(raw, dtype=dtype).astype(np.float64)
        first = samples[::n_ch] if n_ch > 1 else samples  # first channel
        if first.size == 0:
            first = np.zeros(1)
        return [
            float(n_ch),
            float(rate),
            float(n_frames),
            round(1000.0 * n_frames / rate, 4) if rate else 0.0,
            round(float(np.abs(first).mean()), 4),
            float(np.abs(first).max()),
            round(float(np.sqrt((first**2).mean())), 4),
            float((np.diff(np.signbit(first)) != 0).sum()),
        ]

    @staticmethod
    def _rgb_features(w: int, h: int, rgb) -> list[float]:
        import numpy as np

        rgb = rgb.astype(np.float64)
        luma = 0.299 * rgb[:, 0] + 0.587 * rgb[:, 1] + 0.114 * rgb[:, 2]
        return [
            float(w), float(h),
            round(float(rgb[:, 0].mean()), 4),
            round(float(rgb[:, 1].mean()), 4),
            round(float(rgb[:, 2].mean()), 4),
            round(float(luma.min()), 4),
            round(float(luma.max()), 4),
            round(float(luma.mean()), 4),
        ]

    @classmethod
    def _bmp_features(cls, payload: bytes) -> list[float]:
        import struct

        import numpy as np

        data_offset = struct.unpack_from("<I", payload, 10)[0]
        header_size = struct.unpack_from("<I", payload, 14)[0]
        if header_size < 40:
            raise NotImplementedError("BMP core-header variant not supported")
        w, h = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        if compression != 0 or bpp not in (24, 32):
            raise NotImplementedError(
                f"only uncompressed 24/32-bit BMP supported (bpp={bpp})"
            )
        bytes_pp = bpp // 8
        row_stride = (w * bytes_pp + 3) & ~3
        rows = []
        for r in range(abs(h)):
            off = data_offset + r * row_stride
            row = np.frombuffer(payload, np.uint8, w * bytes_pp, off)
            rows.append(row.reshape(w, bytes_pp))
        px = np.concatenate(rows)  # BGR(A) order
        return cls._rgb_features(w, abs(h), px[:, [2, 1, 0]])

    @classmethod
    def _ppm_features(cls, payload: bytes) -> list[float]:
        import numpy as np

        # header: P6 <ws> width <ws> height <ws> maxval <single ws> data
        fields: list[bytes] = []
        i = 2
        while len(fields) < 3:
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":  # comment to end of line
                while i < len(payload) and payload[i : i + 1] != b"\n":
                    i += 1
                continue
            start = i
            while i < len(payload) and not payload[i : i + 1].isspace():
                i += 1
            fields.append(payload[start:i])
        i += 1  # the single whitespace after maxval
        w, h, maxval = (int(f) for f in fields)
        if maxval > 255:
            raise NotImplementedError("16-bit PPM not supported")
        px = np.frombuffer(payload, np.uint8, w * h * 3, i).reshape(-1, 3)
        return cls._rgb_features(w, h, px)


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
