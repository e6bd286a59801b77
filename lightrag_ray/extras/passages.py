"""Passage-level exact-substring deduplication: tumbling token-gram
fingerprints with first-occurrence-keep semantics.

The training-data dedup gate from "Deduplicating Training Data Makes
Language Models Better" (Lee et al., 2021, arXiv:2107.06499) at passage
granularity: document text is cut into TUMBLING windows of ``GRAM_W``
whitespace tokens (non-overlapping — the dedup unit is the passage, not the
shingle; overlapping shingles are the boilerplate scorer's job in
extras/webquality.py), each window is fingerprinted, and a passage is a
*duplicate* when its exact text occurs ≥ 2 times corpus-wide.  The keep
rule is the standard one: the globally FIRST occurrence (ordered by
``(doc_id, gpos)``) survives, every other occurrence is marked removed.

Two queries, both with exact DuckDB oracles over the same ``documents``
table (tokenization is ``text.split(' ')`` on the Ray side and
``string_split(text, ' ')`` in SQL — the same function by construction,
empty tokens under repeated spaces included):

* ``passage_dup_stats`` — per-document ``(n_grams, n_dup_grams,
  n_removed)``: how much of each document is duplicated passage mass, and
  how much the first-keep rule would cut.
* ``passage_dedup_docs`` — the document-level gate composed on top: keep
  documents whose removed-passage share is ≤ 20 % (integer
  cross-multiplication ``n_removed * 5 <= n_grams`` — no float thresholds
  to diverge on).

Scale shape (the part that matters at 100 TB):

* The gram stream is ``n_tokens / GRAM_W`` skinny rows per document
  (16-byte md5 fingerprint + two int64s — the 8-word passage TEXT never
  enters the exchange), bucketed by fingerprint into ``_BUCKETS`` groups,
  so the only wide operation is one bounded-bucket exchange regardless of
  corpus size.  All occurrences of a fingerprint land in one bucket, so
  per-gram counts and the global argmin occurrence are EXACT within the
  group — no driver-side state, no broadcast.
* Inside a bucket group the kernel is fully vectorized: one ``np.lexsort``
  over (g, doc_id, gpos), run-length boundaries via ``np.flatnonzero``,
  per-occurrence dup/removed flags by repeat, then a per-doc
  ``np.bincount`` reduction — no Python loop over rows.
* Per-doc partials (a document touches at most ``min(n_grams, _BUCKETS)``
  buckets) are summed in a SECOND bounded exchange bucketed by
  ``doc_id % _BUCKETS`` — never a per-key ``map_groups``.
* First-occurrence ordering uses true lexicographic ``(doc_id, gpos)``
  (np.lexsort), not a packed ``doc_id * 2^32 + gpos`` composite, so it
  stays correct past 2^31 documents; the SQL oracle uses the composite,
  which is identical while ``doc_id < 2^31`` and ``gpos < 2^32`` (a gpos
  that large needs a 34-billion-token document) — i.e. at any oracle-
  checkable scale.

Reference intent: LightRAG dedups whole documents at enqueue by content
hash (``lightrag/lightrag.py`` ainsert MD5 dedup); this is the
finer-grained passage gate a crawl corpus needs BEFORE that enqueue, same
front-end role as the gates in extras/webcrawl.py.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

GRAM_W = 8  # tokens per tumbling passage window
_BUCKETS = 256  # fingerprint-exchange width (bounded, corpus-size-free)
_KEEP_NUM, _KEEP_DEN = 1, 5  # keep docs with n_removed/n_grams <= 1/5

_PARTIAL_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_grams", pa.int64()),
        ("n_dup_grams", pa.int64()),
        ("n_removed", pa.int64()),
    ]
)


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def emit_grams(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → one row per tumbling GRAM_W-token window:
    (bucket, g1+g2: the window text's 128-bit md5 as two int64s, doc_id,
    gpos).  The window text itself is hashed and dropped here — only
    16-byte fingerprints shuffle."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_g1: list[int] = []
    out_g2: list[int] = []
    out_doc: list[int] = []
    out_pos: list[int] = []
    for doc_id, text in zip(doc_ids, texts):
        toks = (text or "").split(" ")
        for i in range(len(toks) // GRAM_W):
            d = hashlib.md5(
                " ".join(toks[i * GRAM_W : (i + 1) * GRAM_W]).encode()
            ).digest()
            out_g1.append(int.from_bytes(d[:8], "little", signed=True))
            out_g2.append(int.from_bytes(d[8:], "little", signed=True))
            out_doc.append(doc_id)
            out_pos.append(i)
    g1 = np.asarray(out_g1, np.int64)
    return pa.table(
        {
            "bucket": pa.array((g1 % _BUCKETS + _BUCKETS) % _BUCKETS),
            "g1": pa.array(g1),
            "g2": pa.array(out_g2, pa.int64()),
            "doc_id": pa.array(out_doc, pa.int64()),
            "gpos": pa.array(out_pos, pa.int64()),
        }
    )


def _bucket_stats(df: pd.DataFrame) -> pa.Table:
    """All occurrences of every fingerprint in this bucket are present, so
    dup (count ≥ 2) and removed (not the (doc_id, gpos)-min occurrence) are
    exact.  Emits per-doc PARTIAL sums for this bucket's grams."""
    g1 = df["g1"].to_numpy(np.int64)
    g2 = df["g2"].to_numpy(np.int64)
    doc = df["doc_id"].to_numpy(np.int64)
    pos = df["gpos"].to_numpy(np.int64)
    order = np.lexsort((pos, doc, g2, g1))
    g1_s, g2_s, doc_s = g1[order], g2[order], doc[order]
    n = len(doc_s)
    starts = np.flatnonzero(
        np.concatenate(
            ([True], (g1_s[1:] != g1_s[:-1]) | (g2_s[1:] != g2_s[:-1]))
        )
    )
    sizes = np.diff(np.concatenate((starts, [n])))
    counts = np.repeat(sizes, sizes)  # per-occurrence group size
    is_first = np.zeros(n, dtype=bool)
    is_first[starts] = True  # lexsort put the (doc_id, gpos)-min first
    dup = counts >= 2
    removed = dup & ~is_first
    uniq_docs, inv = np.unique(doc_s, return_inverse=True)
    return pa.table(
        {
            "doc_id": pa.array(uniq_docs, pa.int64()),
            "n_grams": pa.array(np.bincount(inv), pa.int64()),
            "n_dup_grams": pa.array(
                np.bincount(inv, weights=dup).astype(np.int64), pa.int64()
            ),
            "n_removed": pa.array(
                np.bincount(inv, weights=removed).astype(np.int64), pa.int64()
            ),
        },
        schema=_PARTIAL_SCHEMA,
    )


def _sum_doc_partials(df: pd.DataFrame) -> pa.Table:
    doc = df["doc_id"].to_numpy(np.int64)
    uniq, inv = np.unique(doc, return_inverse=True)
    cols = {"doc_id": pa.array(uniq, pa.int64())}
    for c in ("n_grams", "n_dup_grams", "n_removed"):
        cols[c] = pa.array(
            np.bincount(inv, weights=df[c].to_numpy(np.int64)).astype(
                np.int64
            ),
            pa.int64(),
        )
    return pa.table(cols, schema=_PARTIAL_SCHEMA)


def passage_dup_stats_ds(docs_ds, buckets: int = _BUCKETS):
    grams = docs_ds.map_batches(
        emit_grams, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = (
        grams.groupby("bucket")
        .map_groups(
            lambda df: _bucket_stats(df.drop(columns=["bucket"])),
            batch_format="pandas",
        )
        # re-tag by doc_id for the per-doc sum — the second exchange is
        # bounded at the same width as the first
        .map_batches(
            lambda b: pa.table(
                {
                    "bucket": pa.array(
                        b.column("doc_id").to_numpy(zero_copy_only=False)
                        % buckets,
                        pa.int64(),
                    ),
                    **{c: b.column(c) for c in _PARTIAL_SCHEMA.names},
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    return partials.groupby("bucket").map_groups(
        lambda df: _sum_doc_partials(df.drop(columns=["bucket"])),
        batch_format="pandas",
    )


def q_passage_dup_stats(sf_dir: str):
    """Per-document passage-duplication stats: total tumbling GRAM_W-token
    windows, windows whose exact text recurs corpus-wide, and windows the
    first-occurrence-keep rule would remove.  Documents shorter than one
    window emit no row (the SQL oracle's join drops them identically)."""
    return passage_dup_stats_ds(_docs(sf_dir))


def q_passage_dedup_docs(sf_dir: str):
    """The document gate composed on the stats: keep documents whose
    removed-passage share is ≤ _KEEP_NUM/_KEEP_DEN, by exact integer
    cross-multiplication."""
    import pyarrow.compute as pc

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.less_equal(
            pc.multiply(batch.column("n_removed"), _KEEP_DEN),
            pc.multiply(batch.column("n_grams"), _KEEP_NUM),
        )
        return batch.filter(mask)

    return passage_dup_stats_ds(_docs(sf_dir)).map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    )


# ------------------------------------------------------------------ oracles

_SQL_GRAMS = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, CAST(i AS BIGINT) AS gpos,
         array_to_string(
           t[(CAST(i AS BIGINT)*{GRAM_W}+1):(CAST(i AS BIGINT)*{GRAM_W}+{GRAM_W})],
           ' ') AS g
  FROM toks, UNNEST(range(len(t)//{GRAM_W})) AS u(i)
),
counted AS (
  SELECT g, COUNT(*) AS c,
         MIN(doc_id*4294967296 + gpos) AS first_key
  FROM grams GROUP BY g
),
per_doc AS (
  SELECT gr.doc_id,
         COUNT(*) AS n_grams,
         CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_grams,
         CAST(SUM(CASE WHEN c >= 2
                        AND gr.doc_id*4294967296 + gpos <> first_key
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
  FROM grams gr JOIN counted USING (g)
  GROUP BY gr.doc_id
)
"""

SQL_PASSAGE_DUP_STATS = (
    _SQL_GRAMS
    + "SELECT doc_id, n_grams, n_dup_grams, n_removed FROM per_doc"
)

SQL_PASSAGE_DEDUP_DOCS = _SQL_GRAMS + (
    "SELECT doc_id, n_grams, n_dup_grams, n_removed FROM per_doc\n"
    f"WHERE n_removed * {_KEEP_DEN} <= n_grams * {_KEEP_NUM}"
)


def queries() -> dict[str, Callable]:
    return {
        "passage_dup_stats": q_passage_dup_stats,
        "passage_dedup_docs": q_passage_dedup_docs,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "passage_dup_stats": SQL_PASSAGE_DUP_STATS,
        "passage_dedup_docs": SQL_PASSAGE_DEDUP_DOCS,
    }
