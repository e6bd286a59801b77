"""Sequence packing: bin the tokenized corpus into fixed-length training
sequences — the shard-assembly step of every LLM pretraining pipeline
(concatenate documents in a stable order, cut every ``SEQ_LEN`` tokens).

The packing rule is deterministic document-level offset binning: documents
are laid out in ascending ``doc_id`` order, each document starts at the
global token offset equal to the sum of all earlier documents' token counts
(an EXCLUSIVE prefix sum), and a document belongs to training sequence
``offset // SEQ_LEN`` — the sequence its first token lands in.  The emitted
table is one row per sequence: how many documents it holds, their token
mass, and the (first, last) doc-id span — the manifest a shard writer needs.
All arithmetic is integer, so the DuckDB oracle (a window-function prefix
sum) hash-matches exactly.

Scale shape — the distributed prefix scan:

1. One streamed pass tokenizes each document to a COUNT (``doc_id``,
   ``n_tokens``) — 16 bytes per document; this narrow table is materialized
   once (the only thing ever held, never the text) and read twice.
2. Documents are range-bucketed by ``doc_id`` (monotone in pack order, so
   bucket order IS document order).  A per-batch combiner emits per-bucket
   partial sums; the ≤``_BUCKETS``-row bucket-total table collects on the
   driver, which computes the exclusive per-bucket starting offsets — the
   classic two-phase parallel scan (Blelloch 1990), with the middle step
   O(buckets), not O(docs).
3. Each bucket independently sorts its slice, adds its broadcast starting
   offset to a local cumulative sum, assigns ``seq_id = off // SEQ_LEN``,
   and pre-aggregates per-sequence partials; a final tiny groupby merges the
   two buckets a boundary-spanning sequence touches.  Three bounded
   exchanges end to end; the corpus text streams through step 1 exactly
   once.

Reference intent: LightRAG's chunker assembles token-budgeted windows per
document (``lightrag/operate.py`` chunking_by_token_size); sequence packing
is the corpus-level analogue that assembles fixed-budget TRAINING windows
across documents.
"""

from __future__ import annotations

import os
import re
from typing import Callable

import numpy as np
import pyarrow as pa

SEQ_LEN = 2048
_BUCKETS = 64
_TOKEN_RE = re.compile(r"[a-z0-9_]+")

_PACK_ROW = pa.schema(
    [("bucket", pa.int32()), ("doc_id", pa.int64()), ("n", pa.int64())]
)
_SEQ_PARTIAL = pa.schema(
    [
        ("seq_id", pa.int64()),
        ("n_docs", pa.int64()),
        ("n_tokens", pa.int64()),
        ("first_doc", pa.int64()),
        ("last_doc", pa.int64()),
    ]
)


def _range_bucket(ids: np.ndarray, hi: int) -> np.ndarray:
    """Monotone doc_id → bucket (order-preserving, unlike the hash fold)."""
    return (ids.astype(np.uint64) * _BUCKETS // np.uint64(hi + 1)).astype(np.int32)


def q_seq_pack(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    # 1. text → narrow (doc_id, n_tokens); the corpus's only full pass.
    def count_tokens(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        n = [
            len(_TOKEN_RE.findall((t or "").lower()))
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    tok = docs.map_batches(
        count_tokens, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # 16 B/doc — the text itself is never materialized

    hi = int(tok.max("doc_id"))

    def tag_bucket(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        return pa.table(
            {
                "bucket": pa.array(_range_bucket(ids, hi), pa.int32()),
                "doc_id": batch.column("doc_id").combine_chunks()
                if hasattr(batch.column("doc_id"), "combine_chunks")
                else batch.column("doc_id"),
                "n": batch.column("n").combine_chunks()
                if hasattr(batch.column("n"), "combine_chunks")
                else batch.column("n"),
            },
            schema=_PACK_ROW,
        )

    rows = tok.map_batches(tag_bucket, batch_format="pyarrow", zero_copy_batch=True)

    # 2. per-bucket token totals → exclusive starting offsets on the driver
    # (≤ _BUCKETS rows — the O(buckets) middle step of the parallel scan).
    def partial_sums(batch: pa.Table) -> pa.Table:
        b = np.asarray(batch.column("bucket"), np.int64)
        n = np.asarray(batch.column("n"), np.int64)
        sums = np.zeros(_BUCKETS, np.int64)
        np.add.at(sums, b, n)
        nz = np.flatnonzero(sums)
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "total": pa.array(sums[nz], pa.int64()),
            }
        )

    totals = np.zeros(_BUCKETS, np.int64)
    for b in (
        rows.map_batches(partial_sums, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("total", alias_name="total"))
        .iter_batches(batch_format="pyarrow", batch_size=_BUCKETS)
    ):
        for bkt, tot in zip(
            np.asarray(b.column("bucket"), np.int64),
            np.asarray(b.column("total"), np.int64),
        ):
            totals[bkt] = tot
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))
    off_ref = ray.put(offsets)

    # 3. per-bucket local scan + per-sequence partials; boundary sequences
    # are merged by the final (tiny) seq_id groupby.
    import pandas as pd

    def pack_bucket(group: pd.DataFrame) -> pa.Table:
        start = int(ray.get(off_ref)[int(group["bucket"].iloc[0])])
        ids = group["doc_id"].to_numpy(np.int64)
        n = group["n"].to_numpy(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, n = ids[order], n[order]
        off = start + np.concatenate(([0], np.cumsum(n)[:-1]))
        seq = off // SEQ_LEN
        starts = np.concatenate(([True], seq[1:] != seq[:-1]))
        pos = np.flatnonzero(starts)
        counts = np.diff(np.concatenate((pos, [len(seq)])))
        return pa.table(
            {
                "seq_id": pa.array(seq[pos], pa.int64()),
                "n_docs": pa.array(counts.astype(np.int64), pa.int64()),
                "n_tokens": pa.array(np.add.reduceat(n, pos), pa.int64()),
                "first_doc": pa.array(ids[pos], pa.int64()),
                "last_doc": pa.array(
                    ids[np.concatenate((pos[1:] - 1, [len(ids) - 1]))], pa.int64()
                ),
            },
            schema=_SEQ_PARTIAL,
        )

    return (
        rows.groupby("bucket")
        .map_groups(pack_bucket, batch_format="pandas")
        .groupby("seq_id")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Min("first_doc", alias_name="first_doc"),
            Max("last_doc", alias_name="last_doc"),
        )
    )


SQL_SEQ_PACK = f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '[a-z0-9_]+'))::BIGINT AS n
  FROM documents
),
o AS (
  SELECT doc_id, n,
         coalesce(sum(n) OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0)::BIGINT AS off
  FROM t
)
SELECT (off // {SEQ_LEN})::BIGINT AS seq_id,
       count(*)::BIGINT AS n_docs,
       sum(n)::BIGINT AS n_tokens,
       min(doc_id)::BIGINT AS first_doc,
       max(doc_id)::BIGINT AS last_doc
FROM o GROUP BY 1
"""


def queries() -> dict[str, Callable]:
    return {"seq_pack": q_seq_pack}


def oracle_sql() -> dict[str, str]:
    return {"seq_pack": SQL_SEQ_PACK}
