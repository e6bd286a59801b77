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


# ---------------------------------------------------------------------------
# Frame sampling + resize (the video-shaped half of the multimodal story)

_FRAME_W = 2
_FRAME_H = 2
_FRAME_EVERY = 2
_PPM_HDR = f"P6\n{_FRAME_W} {_FRAME_H}\n255\n".encode()


def split_ppm_stream(payload: bytes) -> list[bytes]:
    """Split a concatenation of binary P6 frames into individual frames —
    the REAL frame-splitting kernel (each P6 header is self-describing, so
    the stream needs no container format).  Raises on trailing garbage."""
    frames = []
    i = 0
    while i < len(payload):
        if payload[i : i + 2] != b"P6":
            raise ValueError(f"not a P6 frame at offset {i}")
        # parse the three header fields to find the pixel-data extent
        j = i + 2
        fields = []
        while len(fields) < 3:
            while payload[j : j + 1].isspace():
                j += 1
            if payload[j : j + 1] == b"#":
                while payload[j : j + 1] not in (b"\n", b""):
                    j += 1
                continue
            start = j
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            fields.append(payload[start:j])
        j += 1  # single whitespace after maxval
        w, h, maxval = (int(f) for f in fields)
        if maxval > 255:
            raise NotImplementedError("16-bit PPM not supported")
        end = j + w * h * 3
        if end > len(payload):
            raise ValueError("truncated P6 frame")
        frames.append(payload[i:end])
        i = end
    return frames


def resize_ppm(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbour resize of a binary P6 frame → a new P6 frame —
    the REAL resize kernel (src index = i·src_dim // dst_dim, the exact
    integer rule, so any two runs agree byte-for-byte)."""
    import numpy as np

    frame = split_ppm_stream(payload)[0]
    hdr_end = len(frame) - _frame_dims(frame)[0] * _frame_dims(frame)[1] * 3
    w, h = _frame_dims(frame)
    px = np.frombuffer(frame, np.uint8, w * h * 3, hdr_end).reshape(h, w, 3)
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    out = px[ys][:, xs]
    return f"P6\n{out_w} {out_h}\n255\n".encode() + out.tobytes()


def _frame_dims(frame: bytes) -> tuple[int, int]:
    fields = []
    j = 2
    while len(fields) < 3:
        while frame[j : j + 1].isspace():
            j += 1
        start = j
        while j < len(frame) and not frame[j : j + 1].isspace():
            j += 1
        fields.append(frame[start:j])
    return int(fields[0]), int(fields[1])


def synth_frame_stream(doc_id: int) -> bytes:
    """doc_id → a REAL multi-frame P6 stream: 2 + doc_id % 4 frames of
    2×2 pixels whose bytes are md5("{doc_id}:{f}") truncated to 12 — tiny
    enough that the SQL oracle can restate the pixel bytes from the same
    md5 hex, which makes the REAL decoder itself hash-checked."""
    n_frames = 2 + doc_id % 4
    parts = []
    for f in range(n_frames):
        px = hashlib.md5(f"{doc_id}:{f}".encode()).digest()[
            : _FRAME_W * _FRAME_H * 3
        ]
        parts.append(_PPM_HDR + px)
    return b"".join(parts)


class FrameSampleStage:
    """Actor-pool stage: (media_id, payload stream) → one row per SAMPLED
    frame (every ``every``-th), decoded by the REAL P6 decoder.  The
    video-pipeline pattern: split container → sample frames → per-frame
    features, all inside one ``__call__`` so the stream bytes never leave
    the worker."""

    def __init__(self, every: int = _FRAME_EVERY):
        self.every = every
        self.decoder = RealDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "frame_idx": [], "mean_r": [], "mean_g": [],
               "mean_b": []}
        for media_id, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            for idx, frame in enumerate(split_ppm_stream(payload or b"")):
                if idx % self.every:
                    continue
                f = self.decoder.features(frame, "image")
                out["media_id"].append(media_id)
                out["frame_idx"].append(idx)
                out["mean_r"].append(f[2])
                out["mean_g"].append(f[3])
                out["mean_b"].append(f[4])
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], pa.int64()),
                "mean_r": pa.array(out["mean_r"], pa.float64()),
                "mean_g": pa.array(out["mean_g"], pa.float64()),
                "mean_b": pa.array(out["mean_b"], pa.float64()),
            }
        )


def frame_sample_means(sf_dir: str):
    """Every-2nd-frame sampling over synthesized REAL P6 streams with the
    REAL decoder's per-frame channel means — rows are (media_id, frame_idx,
    mean_r/g/b), and the oracle recomputes the same means from the md5
    bytes the frames were synthesized from, so the split + decode kernels
    are hash-checked end to end."""
    import ray.data as rd

    def to_streams(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [synth_frame_stream(int(d)) for d in ids], pa.binary()
                ),
            }
        )

    return (
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id"])
        .map_batches(to_streams, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            FrameSampleStage,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=64,
            concurrency=2,
        )
    )


# pixel byte j of frame f = byte j of md5("{doc_id}:{f}"); the 2×2 RGB frame
# lays R at bytes 0,3,6,9, G at 1,4,7,10, B at 2,5,8,11; channel mean =
# integer sum / 4.0 (exact quarters — float-safe on both engines).
SQL_FRAME_SAMPLE = f"""
WITH f AS (
  SELECT d.doc_id AS media_id, g.g::BIGINT AS frame_idx,
         md5(d.doc_id::VARCHAR || ':' || g.g::VARCHAR) AS hx
  FROM documents d
  JOIN generate_series(0, {4 + 1}) g(g)
    ON g.g < 2 + d.doc_id % 4 AND g.g % {_FRAME_EVERY} = 0
),
b AS (
  SELECT media_id, frame_idx,
         list_transform(range(0, 12),
                        j -> ('0x' || substr(hx, j::INT * 2 + 1, 2))::INT) AS px
  FROM f
)
SELECT media_id, frame_idx,
       round((px[1] + px[4] + px[7] + px[10]) / 4.0, 4) AS mean_r,
       round((px[2] + px[5] + px[8] + px[11]) / 4.0, 4) AS mean_g,
       round((px[3] + px[6] + px[9] + px[12]) / 4.0, 4) AS mean_b
FROM b
"""
