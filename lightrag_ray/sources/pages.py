"""The ``pages`` input table (Common-Crawl-style web pages).

Schema (per BASELINE.json input_hint):
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

``synth_pages_from_documents`` derives a deterministic pages corpus from the
driver's read-only ``documents`` table (no external data; fixed epoch, ids and
wrapping) — the small-scale stand-in for a real WARC-derived Parquet lake.
Written as multiple files so the partitioned/resumable build path is exercised.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z, fixed


def documents_batch_to_pages(batch: pa.Table) -> pa.Table:
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    sources = batch.column("source").to_pylist()
    urls = [
        f"https://{src}.example.org/doc/{did:010d}"
        for src, did in zip(sources, doc_ids)
    ]
    ts = [_EPOCH_US + did * 1_000_000 for did in doc_ids]
    html = [f"<html><body><p>{t}</p></body></html>".encode() for t in texts]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(html, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def synth_pages_from_documents(
    sf_dir: str, out_dir: str, num_files: int = 8
) -> list[str]:
    """Deterministically materialize a pages corpus from ``documents.parquet``.

    Idempotent: returns the existing files when the directory is already
    populated.  Runs through Ray Data so synthesis streams at any scale.
    """
    existing = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    if existing:
        return existing
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    # keep output deterministic: one block per output file, ordered by doc_id
    ds = ds.map_batches(
        documents_batch_to_pages, batch_format="pyarrow", zero_copy_batch=True
    )
    ds.repartition(num_files).write_parquet(out_dir)
    return sorted(glob.glob(os.path.join(out_dir, "*.parquet")))


def read_pages(paths: list[str] | str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(paths, columns=columns)
