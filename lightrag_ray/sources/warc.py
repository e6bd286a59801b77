"""WARC source: the Common-Crawl container format, written and parsed for
real.

``write_warc_files`` serializes the documents table into genuine WARC/1.0
response records (named headers, CRLF framing, Content-Length payload
extents, the canonical ``WARC-Target-URI`` / ``WARC-Date`` headers);
``read_warc`` streams the files back through ``read_binary_files`` and a
REAL record parser that honors Content-Length (never splits on payload
bytes — a payload may contain anything, including "WARC/1.0").

Scale shape: a WARC file is the parallel unit (records inside one file are
sequential by design — each record's extent comes from the previous one's
Content-Length), so the reader parallelizes across files exactly the way
Common Crawl ships: many ~1 GB segments.  The parse kernel is one pass per
file, O(bytes), and emits an Arrow table — no per-record Python object
graph survives the batch.

Reference intent: LightRAG ingests raw text/binary documents
(lightrag/lightrag.py insert paths); WARC is the crawl-native upstream of
that ingestion.
"""

from __future__ import annotations

import os

import pyarrow as pa

_CRLF = b"\r\n"
_URL_PREFIX = "https://w.example.org/doc/"
# deterministic WARC-Date: epoch + doc_id minutes, ISO-8601 Zulu
_EPOCH = "2024-01-01T00:00:00Z"


def _warc_date(doc_id: int) -> str:
    # doc_id minutes after the epoch, rendered without importing datetime
    # arithmetic subtleties: minutes → (day-of-January, hh, mm) with the day
    # wrapping modulo 31, so the rule is TOTAL — every doc_id yields a valid
    # 2-char day and the oracle's lpad(..., 2, '0') can never truncate
    # (pre-fix, doc_id ≥ 142560 rendered 3-char days the SQL silently cut).
    total_min = doc_id
    days, rem = divmod(total_min, 1440)
    hh, mm = divmod(rem, 60)
    return f"2024-01-{days % 31 + 1:02d}T{hh:02d}:{mm:02d}:00Z"


def make_warc_record(doc_id: int, text: str) -> bytes:
    payload = (text or "").encode("utf-8")
    headers = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + f"WARC-Target-URI: {_URL_PREFIX}{doc_id:010d}".encode() + _CRLF
        + f"WARC-Date: {_warc_date(doc_id)}".encode() + _CRLF
        + f"Content-Length: {len(payload)}".encode() + _CRLF
        + _CRLF
    )
    return headers + payload + _CRLF + _CRLF


def parse_warc(blob: bytes) -> pa.Table:
    """One WARC file → (url, warc_date, text).  Content-Length-driven: the
    payload extent is taken from the header, never found by scanning, so
    payloads containing record markers parse correctly."""
    urls, dates, texts = [], [], []
    i = 0
    n = len(blob)
    while i < n:
        if blob[i : i + 8] != b"WARC/1.0":
            raise ValueError(f"not a WARC/1.0 record at offset {i}")
        hdr_end = blob.index(_CRLF + _CRLF, i)
        headers = {}
        for line in blob[i + 8 + 2 : hdr_end].split(_CRLF):
            k, _, v = line.decode("utf-8").partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        body_start = hdr_end + 4
        payload = blob[body_start : body_start + length]
        if blob[body_start + length : body_start + length + 4] != _CRLF + _CRLF:
            raise ValueError("missing record trailer")
        urls.append(headers["warc-target-uri"])
        dates.append(headers["warc-date"])
        texts.append(payload.decode("utf-8"))
        i = body_start + length + 4
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_date": pa.array(dates, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )


def write_warc_files(sf_dir: str, out_dir: str, num_files: int = 4) -> list[str]:
    """documents.parquet → ``num_files`` WARC segments (doc_id % num_files
    per segment, ascending doc_id inside — deterministic layout).

    The corpus never touches the driver: documents are tagged with their
    segment, ONE bounded exchange co-locates each segment's rows, and each
    group task serializes + writes its own segment file (the resumable
    per-partition sink pattern — a re-run overwrites whole segments, never
    appends).  The driver sees only the ``num_files`` path strings."""
    import pandas as pd
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)

    def tag(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = np.asarray(batch.column("doc_id"), np.int64)
        return pa.table(
            {
                "seg": pa.array(ids % num_files, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "text": batch.column("text").combine_chunks()
                if hasattr(batch.column("text"), "combine_chunks")
                else batch.column("text"),
            }
        )

    def write_segment(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values("doc_id")
        seg = int(g["seg"].iloc[0])
        path = os.path.join(out_dir, f"segment-{seg:05d}.warc")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            for d, t in zip(g["doc_id"], g["text"]):
                f.write(make_warc_record(int(d), t))
        os.replace(tmp, path)  # atomic publish per segment
        return pa.table({"path": pa.array([path], pa.string())})

    written = (
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("seg")
        .map_groups(write_segment, batch_format="pandas")
    )
    paths = sorted(r["path"] for r in written.take_all())
    # empty segments (no doc_id ≡ k) still need a file for the reader
    for k in range(num_files):
        path = os.path.join(out_dir, f"segment-{k:05d}.warc")
        if path not in paths:
            open(path, "wb").close()
            paths.append(path)
    return sorted(paths)


def read_warc(paths: list[str]):
    """WARC segments → Dataset of (url, warc_date, text); one task per
    file (the WARC parallel unit)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [parse_warc(b) for b in batch.column("bytes").to_pylist()]
        return pa.concat_tables(tables) if tables else parse_warc(b"")

    return ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)
