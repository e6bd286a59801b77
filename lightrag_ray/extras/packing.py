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
    import ray.data as rd

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

    return pack_counts(
        docs.map_batches(count_tokens, batch_format="pyarrow", zero_copy_batch=True)
    )


def pack_counts(tok_ds):
    """The distributed two-phase prefix scan over a narrow ``(doc_id, n)``
    count table → per-sequence manifest (``seq_id, n_docs, n_tokens,
    first_doc, last_doc``).  Shared by :func:`q_seq_pack` (whole corpus,
    regex counts) and the curated training-shard flagships below (curated
    survivors, regex or learned-BPE counts) — the count table is ~16 B/doc,
    the only thing ever materialized."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    tok = tok_ds.materialize()  # 16 B/doc — the text itself never lands

    hi_val = tok.max("doc_id") if tok.count() else None
    if hi_val is None:  # empty after curation — empty manifest, stable schema
        return rd.from_arrow(_SEQ_PARTIAL.empty_table())
    hi = int(hi_val)

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


def q_training_shards(sf_dir: str):
    """End-to-end training-shard assembly — the flagship composition of the
    curation and packing surfaces: quality/language/near-dup curation
    (:func:`lightrag_ray.extras.catalog.q_curated_corpus` — exact near-dup
    arm, every gate individually oracled) → pack the SURVIVORS into
    ``SEQ_LEN``-token training sequences in ascending ``doc_id`` order using
    the curated word counts as the token counts.  Output = the shard
    manifest ``(seq_id, n_docs, n_tokens, first_doc, last_doc)``.

    Fully SQL-oracled end to end (``SQL_TRAINING_SHARDS`` splices the
    curated-corpus CTEs with the window-function prefix sum) — the hash
    check covers curation ∘ packing as one composed pipeline, which is the
    shape a pretraining-data user actually runs.

    Scale: curation is one streamed text pass over the canonical-filtered
    corpus; packing then touches only the 16 B/doc count table (three
    bounded exchanges — see module docstring).  Nothing here is new
    machinery, so the 100-TB judgments of the parts carry over."""
    from lightrag_ray.extras.catalog import q_curated_corpus

    return _pack_curated(q_curated_corpus(sf_dir))


def q_training_shards_lsh(sf_dir: str, cc_stats: dict | None = None):
    """The flagship with the MinHash-LSH near-dup arm — the production
    scale path (the exact arm's pair graph is O(n²) by design).  rows-only
    in the driver; the LSH≡exact curation agreement is pinned in
    tests/test_extras.py, and the pack step is identical."""
    from lightrag_ray.extras.catalog import q_curated_corpus_lsh

    return _pack_curated(q_curated_corpus_lsh(sf_dir, cc_stats=cc_stats))


def _pack_curated(curated_ds):
    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n": batch.column("n_words"),
            }
        )

    return pack_counts(
        curated_ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)
    )


def _sql_training_shards() -> str:
    from lightrag_ray.extras.catalog import _sql_curated_corpus

    curated = _sql_curated_corpus().strip()
    # The curated oracle is `WITH RECURSIVE <ctes> SELECT <cols> FROM ...` —
    # wrap its SELECT as one more CTE and append the prefix-sum window.
    head, sel = curated.split("\nSELECT ", 1)
    return (
        head
        + f""",
curated AS (
SELECT {sel}
),
o AS (
  SELECT doc_id, n_words AS n,
         coalesce(sum(n_words) OVER (ORDER BY doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0)::BIGINT AS off
  FROM curated
)
SELECT (off // {SEQ_LEN})::BIGINT AS seq_id,
       count(*)::BIGINT AS n_docs,
       sum(n)::BIGINT AS n_tokens,
       min(doc_id)::BIGINT AS first_doc,
       max(doc_id)::BIGINT AS last_doc
FROM o GROUP BY 1
"""
    )


def q_training_shards_bpe(sf_dir: str, n_merges: int = 200):
    """The same flagship with the corpus-TRAINED BPE tokenizer supplying the
    token counts (curate → learned-BPE encode → pack): the full
    pretraining-data flow.  One extra streamed pass trains the merges
    (:func:`lightrag_ray.extras.bpe_train.train_bpe`); curation + encode
    then share a single text pass — the gates run first so only survivors
    pay the encode.  The rank table ships once via ``ray.put``; each actor
    rebuilds its tokenizer in ``__init__``.

    rows-only in the driver (BPE has no SQL analogue); the composition is
    pinned by tests against the oracled regex-count flagship (identical
    survivor sets, manifest invariants) and by the BPE round-trip suite."""
    import ray
    import ray.data as rd

    from lightrag_ray.extras import bpe_train
    from lightrag_ray.extras.catalog import (
        CURATE_MIN_UNIQ_RATIO,
        CURATE_MIN_WORDS,
        _filter_noncanonical,
        q_dup_clusters,
    )
    from lightrag_ray.extras.textstats import _WORD_RE, predict_lang

    merges, _stats = bpe_train.train_bpe(sf_dir, n_merges=n_merges)
    ranks_ref = ray.put(bpe_train.merges_to_ranks(merges))

    class CurateEncode:
        def __init__(self):
            from lightrag_ray.functions.tokenizer import BPETokenizer

            self._tok = BPETokenizer(ranks=ray.get(ranks_ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            keep_ids, keep_n = [], []
            for doc_id, text in zip(ids, texts):
                text = text or ""
                words = _WORD_RE.findall(text)
                nw = len(words)
                if nw < CURATE_MIN_WORDS:
                    continue
                if len(set(words)) / nw < CURATE_MIN_UNIQ_RATIO:
                    continue
                lang, _ = predict_lang(text)
                if lang == "und":
                    continue
                keep_ids.append(doc_id)
                keep_n.append(len(self._tok.encode(text)))
            return pa.table(
                {
                    "doc_id": pa.array(keep_ids, pa.int64()),
                    "n": pa.array(keep_n, pa.int64()),
                }
            )

    corpus = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    counts = _filter_noncanonical(corpus, q_dup_clusters(sf_dir)).map_batches(
        CurateEncode,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    return pack_counts(counts)


def queries() -> dict[str, Callable]:
    return {
        "seq_pack": q_seq_pack,
        "training_shards": q_training_shards,
        "training_shards_lsh": q_training_shards_lsh,  # rows-only (LSH arm; exact ≡ training_shards)
        "training_shards_bpe": q_training_shards_bpe,  # rows-only (learned BPE)
    }


def oracle_sql() -> dict[str, str]:
    return {
        "seq_pack": SQL_SEQ_PACK,
        "training_shards": _sql_training_shards(),
    }
