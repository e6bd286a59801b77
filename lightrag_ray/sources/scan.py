"""Input-directory scan: discover new/changed raw files and enqueue them.

The Ray mapping of the reference's scan operation (``/documents/scan`` +
``DocumentManager.iter_new_files``,
lightrag/api/routers/document_routes.py:1400-1520): one streaming
``os.scandir`` pass over the watch directory — no whole-directory list, so
scan memory is O(batch), not O(files) — with a persistent per-file marker
journal under the build directory as the deduplication authority (the
reference uses its ``doc_status`` rows).  New files are read through
``ray.data.read_binary_files``, routed through the same stdlib extractors
as the binary-extract stage, written as a pages partition, and enqueued via
:func:`~lightrag_ray.pipelines.incremental.add_documents`.

Change detection is ``(name, size, mtime_ns)``: a modified file gets a new
marker key and re-ingests (its path-keyed ``doc-<md5(url)>`` id makes the
re-ingest an upsert of the same document, reference parity with re-uploading
a changed file).  Marker writes are atomic renames, so an interrupted scan
needs no resume state — the next scan re-discovers anything unmarked.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import time
from typing import Iterator

import pyarrow as pa

# the suffixes our stdlib extractors can route (functions/extractors.py);
# the reference derives this live from its parser registry
SUPPORTED_SUFFIXES = (".txt", ".md", ".pdf", ".docx", ".pptx", ".xlsx")


def _journal_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest", "scan")


def _file_key(name: str, size: int, mtime_ns: int) -> str:
    return hashlib.md5(f"{name}|{size}|{mtime_ns}".encode()).hexdigest()


def iter_new_files(
    input_dir: str, out_dir: str, suffixes: tuple[str, ...] = SUPPORTED_SUFFIXES
) -> Iterator[tuple[str, str]]:
    """Yield ``(path, marker_key)`` for each supported file not yet
    ingested into ``out_dir``'s build, one at a time (streaming scandir)."""
    journal = _journal_dir(out_dir)
    os.makedirs(journal, exist_ok=True)
    with os.scandir(input_dir) as entries:
        for entry in entries:
            if not entry.is_file():
                continue
            suffix = os.path.splitext(entry.name)[1].lower()
            if suffix not in suffixes:
                continue
            st = entry.stat()
            key = _file_key(entry.name, st.st_size, st.st_mtime_ns)
            if os.path.exists(os.path.join(journal, key + ".json")):
                continue
            yield entry.path, key


def _mark_ingested(out_dir: str, path: str, key: str, pages_file: str) -> None:
    journal = _journal_dir(out_dir)
    target = os.path.join(journal, key + ".json")
    tmp = target + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"path": path, "pages_file": pages_file, "ingested_at": time.time()},
            f,
        )
    os.replace(tmp, target)


def ingest_files(paths: list[str], pages_file: str) -> int:
    """Read raw files → extracted text → ONE pages-schema parquet file.

    Streams through ``read_binary_files`` (payloads never land on the
    driver) and the same stdlib extractor routing as the binary-extract
    stage; extraction failures quarantine as empty-text rows with the error
    recorded in ``lang='error:<...>'``-free form — kept out-of-band in the
    scan journal instead, so the pages schema stays reference-shaped.
    Returns the number of pages written."""
    import ray.data as rd

    from lightrag_ray.functions.extractors import extract_file_text
    from lightrag_ray.sources.pages import PAGES_SCHEMA

    def to_pages(batch: pa.Table) -> pa.Table:
        file_paths = batch.column("path").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        urls, ts, texts = [], [], []
        for path, payload in zip(file_paths, payloads):
            suffix = os.path.splitext(path)[1].lower().lstrip(".")
            try:
                text = extract_file_text(payload or b"", suffix)
            except Exception:
                text = ""  # quarantined: empty doc, id still journaled
            urls.append("file://" + os.path.abspath(path))
            ts.append(int(os.stat(path).st_mtime * 1_000_000))
            texts.append(text)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "html": pa.array(
                    [t.encode("utf-8") for t in texts], pa.binary()
                ),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["und"] * len(texts), pa.string()),
            },
            schema=PAGES_SCHEMA,
        )

    os.makedirs(os.path.dirname(pages_file), exist_ok=True)
    ds = rd.read_binary_files(paths, include_paths=True).map_batches(
        to_pages, batch_format="pyarrow", zero_copy_batch=True
    )
    # one pages file per scan batch (batches are bounded by scan_and_add's
    # batch_size, so a single block is fine); write via Ray then promote
    # the part file atomically so an interrupted ingest leaves no partial
    tmp_dir = pages_file + ".tmpdir"
    import shutil

    shutil.rmtree(tmp_dir, ignore_errors=True)
    # bounded by the scan batch size → safe to pin before the double
    # consumption (write + count) so the extract runs once
    ds = ds.repartition(1).materialize()
    ds.write_parquet(tmp_dir)
    n_rows = ds.count()
    part = sorted(glob.glob(os.path.join(tmp_dir, "*.parquet")))[0]
    os.replace(part, pages_file)
    shutil.rmtree(tmp_dir, ignore_errors=True)
    return n_rows


def scan_and_add(
    input_dir: str,
    out_dir: str,
    pages_dir: str,
    cfg=None,
    num_partitions: int = 4,
    batch_size: int = 10_000,
):
    """One scan pass: discover → ingest → enqueue.

    Returns ``(n_new_files, build_result_or_None)``.  New files land as one
    pages parquet per scan batch (name keyed by the batch's file-key
    digest, so re-running an interrupted scan reuses the same unit), then
    ``add_documents`` re-reduces the graph over old + new partitions.  With
    nothing new the build is untouched and ``(0, None)`` returns."""
    from lightrag_ray.pipelines.incremental import add_documents

    found = list(iter_new_files(input_dir, out_dir))
    if not found:
        return 0, None

    os.makedirs(pages_dir, exist_ok=True)
    n_new = 0
    for i in range(0, len(found), batch_size):
        chunk = found[i : i + batch_size]
        digest = hashlib.md5(
            "|".join(key for _p, key in chunk).encode()
        ).hexdigest()[:16]
        pages_file = os.path.join(pages_dir, f"scan-{digest}.parquet")
        if not os.path.exists(pages_file):
            ingest_files([p for p, _k in chunk], pages_file)
        for path, key in chunk:
            _mark_ingested(out_dir, path, key, pages_file)
        n_new += len(chunk)

    all_pages = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    result = add_documents(out_dir, all_pages, cfg, num_partitions=num_partitions)
    return n_new, result
