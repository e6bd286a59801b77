"""Webtext curation operators: repetition quality, boilerplate shingles, PII.

Three classic training-data-pipeline gates over the ``documents`` table,
each a streaming Ray Data pipeline with an exact DuckDB oracle:

* **Repetition stats** (Gopher-style quality signals, Rae et al. 2021
  "Scaling Language Models: ... Gopher", §A1.1): per-document duplicate-word,
  top-word and duplicate-bigram counts.  Embarrassingly parallel — one
  ``map_batches`` pass, no shuffle.
* **Boilerplate shingles**: word trigrams whose document frequency exceeds a
  corpus-fraction threshold (the shingle analogue of CCNet/RefinedWeb
  repeated-line removal — the synthetic corpus has no newlines, so the
  repeated-unit is the word trigram).  Scale shape mirrors
  ``catalog.q_term_df_top100``: per-batch distinct-shingle DF combiner →
  vocab-bounded groupby → threshold filter.  The per-document scorer then
  broadcasts the (small) boilerplate set once via ``ray.put`` and streams the
  corpus — the big side never shuffles.
* **PII scan / redaction**: email / phone / IPv4 regex counts and a redacted
  text column.  The synthetic corpus carries no PII ([a-z ] only), so the
  operator runs over a deterministic PII-bearing augmentation derived from
  ``doc_id`` (stated identically in the SQL oracle — no external data); the
  regexes themselves are the real operator and are additionally unit-tested
  on crafted PII-laden strings in tests/test_webquality.py.

Reference intent: LightRAG filters/cleans documents before chunking
(``lightrag/utils.py`` sanitize + dedup at enqueue); these gates are the
web-scale curation front-end that feeds that pipeline.

Tokenization is ``[a-z0-9_]+`` over lowercased text on BOTH sides (ASCII
class — no engine-specific ``\\w`` unicode divergence).  All emitted metrics
are integer counts, never float ratios, so the driver's value hash cannot
diverge on FP rounding; callers derive fractions downstream.
"""

from __future__ import annotations

import os
import re
from collections import Counter
from typing import Callable

import pyarrow as pa

_TOKEN_RE = re.compile(r"[a-z0-9_]+")

# Boilerplate threshold: a trigram is boilerplate when it appears in at least
# ceil(n_docs / DF_DENOM) distinct documents (floor 2).  Integer arithmetic
# on both sides — (n + DF_DENOM - 1) // DF_DENOM — so the engine and the
# oracle can never disagree on the cutoff via FP rounding.
DF_DENOM = 100

# Broadcast guard for the boilerplate set (same pattern as
# catalog.q_distinctive_terms): boilerplate shingles are DF-thresholded so
# the set is tiny in practice, but a pathological corpus (one shared page
# template) could blow it up — raise rather than OOM the driver.
MAX_BROADCAST_SHINGLES = 5_000_000


def _docs(sf_dir: str, columns: list[str]):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


def _min_df(n_docs: int) -> int:
    return max(2, (n_docs + DF_DENOM - 1) // DF_DENOM)


def _n_docs(sf_dir: str) -> int:
    """Corpus document count from Parquet footer metadata — a metadata-only
    read (no row groups are touched), so it stays O(#files) at 100 TB.
    Accepts both a single file and a directory of part files."""
    import glob

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "documents.parquet")
    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


# ---------------------------------------------------------------------------
# 1. Gopher-style repetition stats


def q_repetition_stats(sf_dir: str):
    """Per-document repetition quality counts: duplicate words, top-word
    count, duplicate bigrams.  One stateless ``map_batches`` pass — no
    shuffle, no driver state; the canonical Gopher repetition filters
    (duplicate-line/ngram fractions) restated as integer counts over the
    word stream."""

    def stats(batch: pa.Table) -> pa.Table:
        out = {
            "doc_id": batch.column("doc_id"),
            "n_words": [],
            "n_dup_words": [],
            "top_word_count": [],
            "n_2grams": [],
            "n_dup_2grams": [],
        }
        for text in batch.column("text").to_pylist():
            ws = _TOKEN_RE.findall((text or "").lower())
            n = len(ws)
            grams = [f"{ws[i]} {ws[i + 1]}" for i in range(n - 1)]
            counts = Counter(ws)
            out["n_words"].append(n)
            out["n_dup_words"].append(n - len(counts))
            out["top_word_count"].append(max(counts.values()) if counts else 0)
            out["n_2grams"].append(len(grams))
            out["n_dup_2grams"].append(len(grams) - len(set(grams)))
        return pa.table(
            {
                "doc_id": out["doc_id"],
                "n_words": pa.array(out["n_words"], pa.int64()),
                "n_dup_words": pa.array(out["n_dup_words"], pa.int64()),
                "top_word_count": pa.array(out["top_word_count"], pa.int64()),
                "n_2grams": pa.array(out["n_2grams"], pa.int64()),
                "n_dup_2grams": pa.array(out["n_dup_2grams"], pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_REPETITION_STATS = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws
  FROM documents
), grams AS (
  SELECT doc_id,
         list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) AS gs
  FROM w
), cnt AS (
  SELECT doc_id, t, count(*) AS c
  FROM (SELECT doc_id, unnest(ws) AS t FROM w) GROUP BY doc_id, t
), top AS (
  SELECT doc_id, max(c) AS top_word_count FROM cnt GROUP BY doc_id
)
SELECT w.doc_id,
       len(ws) AS n_words,
       len(ws) - len(list_distinct(ws)) AS n_dup_words,
       coalesce(top.top_word_count, 0) AS top_word_count,
       len(gs) AS n_2grams,
       len(gs) - len(list_distinct(gs)) AS n_dup_2grams
FROM w
JOIN grams ON w.doc_id = grams.doc_id
LEFT JOIN top ON w.doc_id = top.doc_id
"""


# ---------------------------------------------------------------------------
# 2. Boilerplate shingles (corpus-frequent word trigrams)


def _partial_shingle_df(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one (shingle, df) partial per distinct trigram in
    the batch, so the shuffle carries ~|shingle vocab| rows per block, not
    one row per trigram occurrence."""
    df: Counter = Counter()
    for text in batch.column("text").to_pylist():
        ws = _TOKEN_RE.findall((text or "").lower())
        df.update({f"{ws[i]} {ws[i + 1]} {ws[i + 2]}" for i in range(len(ws) - 2)})
    shingles = sorted(df)
    return pa.table(
        {
            "shingle": pa.array(shingles, pa.string()),
            "df": pa.array([df[s] for s in shingles], pa.int64()),
        }
    )


def _boilerplate_ds(sf_dir: str):
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    min_df = _min_df(_n_docs(sf_dir))
    return (
        _docs(sf_dir, ["text"])
        .map_batches(_partial_shingle_df, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shingle")
        .aggregate(Sum("df", alias_name="df"))
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("df"), min_df)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def q_boilerplate_ngrams(sf_dir: str):
    """Corpus boilerplate shingles: word trigrams appearing in ≥
    ``ceil(n_docs / DF_DENOM)`` distinct documents (floor 2).  Combiner →
    shingle-vocab-bounded groupby → threshold filter; the exchange is bounded
    by distinct-shingle count × block count, never corpus token count."""
    return _boilerplate_ds(sf_dir)


SQL_BOILERPLATE_NGRAMS = rf"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws
  FROM documents
), g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             range(1, len(ws) - 1),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
  FROM w
)
SELECT shingle, count(*) AS df
FROM g
GROUP BY shingle
HAVING count(*) >= greatest(
    2, ((SELECT count(*) FROM documents) + {DF_DENOM - 1}) // {DF_DENOM})
"""


def q_boilerplate_frac(sf_dir: str):
    """Per-document boilerplate exposure: how many of a document's trigram
    positions land in the corpus boilerplate set.  The boilerplate table is
    DF-thresholded (small); it streams to the driver under a guard and ships
    once via ``ray.put`` while the corpus streams through a stateless scorer
    — the broadcast-join scale shape, identical to
    ``catalog.q_distinctive_terms``.  Past ``MAX_BROADCAST_SHINGLES`` (a
    template-dominated corpus) the shingle-hash-sharded join arm takes over
    instead of raising."""
    try:
        return _boilerplate_frac_broadcast(sf_dir)
    except _VocabOverGuard:
        return _boilerplate_frac_sharded(sf_dir)


def _boilerplate_frac_broadcast(sf_dir: str):
    import ray

    boiler: set[str] = set()
    for b in _boilerplate_ds(sf_dir).iter_batches(
        batch_format="pyarrow", batch_size=65536
    ):
        boiler.update(b.column("shingle").to_pylist())
        if len(boiler) > MAX_BROADCAST_SHINGLES:
            raise _VocabOverGuard(
                f"boilerplate set exceeds {MAX_BROADCAST_SHINGLES} shingles — "
                "switching to the shingle-hash-sharded scorer"
            )
    boiler_ref = ray.put(boiler)

    def score(batch: pa.Table) -> pa.Table:
        bset = ray.get(boiler_ref)
        n_grams, n_boiler = [], []
        for text in batch.column("text").to_pylist():
            ws = _TOKEN_RE.findall((text or "").lower())
            grams = [
                f"{ws[i]} {ws[i + 1]} {ws[i + 2]}" for i in range(len(ws) - 2)
            ]
            n_grams.append(len(grams))
            n_boiler.append(sum(1 for g in grams if g in bset))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_3grams": pa.array(n_grams, pa.int64()),
                "n_boiler_3grams": pa.array(n_boiler, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def _boilerplate_frac_sharded(sf_dir: str):
    """Over-guard boilerplate arm: the DF-thresholded shingle table never
    reaches the driver.  Each document emits its distinct trigrams with
    position counts; a bounded hash join against the (materialized)
    boilerplate table keeps only boilerplate hits, and one bounded-bucket
    exchange sums hits per doc — with a totals branch from the corpus scan
    so every document (including gram-free ones) keeps its row.  Output is
    row-identical to the broadcast arm."""
    import numpy as np
    import pandas as pd

    from lightrag_ray.extras.dedup import _mix64, hash_join_partitions

    boiler_ds = _boilerplate_ds(sf_dir).materialize()

    def doc_grams(batch: pa.Table) -> pa.Table:
        ids, shingles, cnts = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = _TOKEN_RE.findall((text or "").lower())
            grams = Counter(
                f"{ws[i]} {ws[i + 1]} {ws[i + 2]}" for i in range(len(ws) - 2)
            )
            ids.extend([doc_id] * len(grams))
            shingles.extend(grams.keys())
            cnts.extend(grams.values())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "shingle": pa.array(shingles, pa.string()),
                "cnt": pa.array(cnts, pa.int64()),
            }
        )

    gram_rows = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        doc_grams, batch_format="pyarrow", zero_copy_batch=True
    )
    hits = gram_rows.join(
        boiler_ds, "inner", hash_join_partitions(), on=("shingle",)
    )

    _BUCKETS = 256

    def _bkt(ids: np.ndarray) -> pa.Array:
        return pa.array(
            (_mix64(ids.view(np.uint64)).view(np.int64) % _BUCKETS).astype(
                np.int32
            ),
            pa.int32(),
        )

    def hit_parts(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        cnt = np.asarray(batch.column("cnt"), np.int64)
        return pa.table(
            {
                "_bkt": _bkt(ids),
                "doc_id": pa.array(ids, pa.int64()),
                "grams_part": pa.array(np.zeros(len(ids), np.int64), pa.int64()),
                "boiler_part": pa.array(cnt, pa.int64()),
            }
        )

    def total_parts(batch: pa.Table) -> pa.Table:
        ids, totals = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = _TOKEN_RE.findall((text or "").lower())
            ids.append(doc_id)
            totals.append(max(0, len(ws) - 2))
        arr = np.asarray(ids, np.int64)
        return pa.table(
            {
                "_bkt": _bkt(arr),
                "doc_id": pa.array(arr, pa.int64()),
                "grams_part": pa.array(totals, pa.int64()),
                "boiler_part": pa.array(np.zeros(len(arr), np.int64), pa.int64()),
            }
        )

    union = hits.map_batches(
        hit_parts, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            total_parts, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def sum_bucket(group: pd.DataFrame) -> pa.Table:
        ids = group["doc_id"].to_numpy(np.int64)
        g = group["grams_part"].to_numpy(np.int64)
        h = group["boiler_part"].to_numpy(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, g, h = ids[order], g[order], h[order]
        new = np.empty(len(ids), bool)
        if len(ids):
            new[0] = True
            new[1:] = ids[1:] != ids[:-1]
        idx = np.flatnonzero(new)
        return pa.table(
            {
                "doc_id": pa.array(ids[idx], pa.int64()),
                "n_3grams": pa.array(
                    np.add.reduceat(g, idx) if len(idx) else np.empty(0, np.int64),
                    pa.int64(),
                ),
                "n_boiler_3grams": pa.array(
                    np.add.reduceat(h, idx) if len(idx) else np.empty(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    return union.groupby("_bkt").map_groups(sum_bucket, batch_format="pandas")


SQL_BOILERPLATE_FRAC = rf"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws
  FROM documents
), gd AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             range(1, len(ws) - 1),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
  FROM w
), boiler AS (
  SELECT shingle FROM gd GROUP BY shingle
  HAVING count(*) >= greatest(
      2, ((SELECT count(*) FROM documents) + {DF_DENOM - 1}) // {DF_DENOM})
), g AS (
  SELECT doc_id,
         unnest(list_transform(
             range(1, len(ws) - 1),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
  FROM w
), hits AS (
  SELECT g.doc_id, count(*) AS n_boiler_3grams
  FROM g JOIN boiler USING (shingle) GROUP BY g.doc_id
)
SELECT w.doc_id,
       greatest(len(ws) - 2, 0) AS n_3grams,
       coalesce(hits.n_boiler_3grams, 0) AS n_boiler_3grams
FROM w LEFT JOIN hits ON w.doc_id = hits.doc_id
"""


# ---------------------------------------------------------------------------
# 3. PII scan + redaction

# ASCII-only patterns with identical semantics under Python re and DuckDB's
# RE2 (no backreferences, no lookaround, \b is the ASCII word boundary in
# both).  Order of redaction is fixed: email, phone, IPv4.
PII_EMAIL = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE = r"\b555-[0-9]{4}\b"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

_PII = [
    (re.compile(PII_EMAIL), "<EMAIL>"),
    (re.compile(PII_PHONE), "<PHONE>"),
    (re.compile(PII_IPV4), "<IP>"),
]


def scan_pii(text: str) -> tuple[int, int, int, str]:
    """Count and redact email / phone / IPv4 matches.  Pure function — the
    real operator, unit-tested on crafted PII strings independently of the
    doc_id augmentation below."""
    counts = []
    for pat, token in _PII:
        counts.append(len(pat.findall(text)))
        text = pat.sub(token, text)
    return counts[0], counts[1], counts[2], text


def _augment(text: str, doc_id: int) -> str:
    # Deterministic PII fixture: the synthetic corpus is [a-z ]-only, so
    # derive one email, one phone and one IP per document from doc_id.
    # Stated identically in SQL_PII_SCAN.
    return (
        f"{text} contact user{doc_id}@example.com or call "
        f"555-{doc_id % 10000:04d} from 10.0.{doc_id % 256}.1"
    )


def q_pii_scan(sf_dir: str):
    """PII scan over the deterministically augmented corpus: per-document
    email/phone/IPv4 counts plus the redacted text.  Stateless
    ``map_batches`` — no shuffle; the regex set compiles once at module
    import, not per batch."""

    def scan(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        n_em, n_ph, n_ip, red = [], [], [], []
        for doc_id, text in zip(doc_ids, batch.column("text").to_pylist()):
            e, p, i, r = scan_pii(_augment(text or "", doc_id))
            n_em.append(e)
            n_ph.append(p)
            n_ip.append(i)
            red.append(r)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_emails": pa.array(n_em, pa.int64()),
                "n_phones": pa.array(n_ph, pa.int64()),
                "n_ips": pa.array(n_ip, pa.int64()),
                "redacted": pa.array(red, pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        scan, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_PII_SCAN = rf"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com or call 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' AS t
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(t, '{PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(
           regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g'),
           '{PII_PHONE}')) AS n_phones,
       len(regexp_extract_all(
           regexp_replace(regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g'),
                          '{PII_PHONE}', '<PHONE>', 'g'),
           '{PII_IPV4}')) AS n_ips,
       regexp_replace(
           regexp_replace(regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g'),
                          '{PII_PHONE}', '<PHONE>', 'g'),
           '{PII_IPV4}', '<IP>', 'g') AS redacted
FROM aug
"""


# ---------------------------------------------------------------------------
# 5. Unigram-LM quality score (CCNet-style LM filter, integer-quantized)

# Broadcast guard for the unigram vocabulary (same pattern as
# catalog.q_distinctive_terms / MAX_BROADCAST_SHINGLES above): the full
# vocabulary of a web corpus is bounded but can be large — stream it to the
# driver with an early stop.  Beyond the guard the TERM-HASH-SHARDED arm
# below takes over (token rows hash-join their surprisal shard); nothing
# raises and nothing driver-materializes the vocabulary.
MAX_LM_VOCAB = 5_000_000


class _VocabOverGuard(Exception):
    pass


def _lm_partial_tf(batch: pa.Table) -> pa.Table:
    """Per-batch tf combiner: one (term, tf) partial per distinct term, so
    the vocab groupby's exchange is |vocab|×blocks rows, never the token
    stream."""
    tf: Counter = Counter()
    for text in batch.column("text").to_pylist():
        tf.update(_TOKEN_RE.findall((text or "").lower()))
    terms = sorted(tf)
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "tf": pa.array([tf[t] for t in terms], pa.int64()),
        }
    )


def _lm_tf_ds(sf_dir: str):
    from ray.data.aggregate import Sum

    return (
        _docs(sf_dir, ["text"])
        .map_batches(_lm_partial_tf, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("tf", alias_name="tf"))
    )


def _bit_length_u64(x: "np.ndarray") -> "np.ndarray":
    """Exact vectorized ``int.bit_length`` for non-negative int64 — 64
    shift-adds, no float log (a float path would round at ≥2⁵³ counts)."""
    import numpy as np

    v = x.astype(np.uint64)
    n = np.zeros(len(v), np.int64)
    while v.any():
        n += (v > 0).astype(np.int64)
        v >>= np.uint64(1)
    return n


def q_lm_quality(sf_dir: str):
    """Per-document unigram-LM quality score (the CCNet LM-filter primitive,
    Wenzek et al. 2020 "CCNet: Extracting High Quality Monolingual Datasets
    from Web Crawl Data", §3 — there a KenLM 5-gram; here the corpus-trained
    unigram analogue whose arithmetic is exact).

    Per-token surprisal is quantized to WHOLE BITS via integer bit length:
    ``bits(w) = bitlen(T) - bitlen(tf(w))`` where ``T`` is the corpus token
    count — a monotone integer proxy for ``log2(T / tf(w))`` that both
    engines compute exactly (Python ``int.bit_length`` ↔ DuckDB
    ``length(bin(x))``, verified identical), so the driver's value hash
    cannot diverge on transcendental rounding.  A document's score is the
    token-sum of surprisals plus the floor-divided centibit average; LOW
    ``avg_bits_x100`` = commonest language = the "keep" end of the CCNet
    head/middle/tail split.

    Scale shape (broadcast arm): per-batch tf combiner → vocab-bounded
    groupby (the shuffle carries |vocab|×blocks partial rows, never the
    token stream) → guarded driver stream → surprisal table broadcast ONCE
    via ``ray.put`` → the corpus streams through a stateless scorer.  The
    big side never shuffles.  Past ``MAX_LM_VOCAB`` the term-hash-sharded
    arm (:func:`_lm_quality_sharded`) takes over instead of raising.
    """
    try:
        return _lm_quality_broadcast(sf_dir)
    except _VocabOverGuard:
        return _lm_quality_sharded(sf_dir)


def _lm_quality_broadcast(sf_dir: str):
    import ray

    docs = _docs(sf_dir, ["doc_id", "text"])

    tf_lookup: dict = {}
    for b in _lm_tf_ds(sf_dir).iter_batches(
        batch_format="pyarrow", batch_size=65536
    ):
        tf_lookup.update(zip(b.column("term").to_pylist(), b.column("tf").to_pylist()))
        if len(tf_lookup) > MAX_LM_VOCAB:
            raise _VocabOverGuard(
                f"vocabulary exceeds {MAX_LM_VOCAB} terms — switching to the "
                "term-hash-sharded LM arm"
            )
    total = sum(tf_lookup.values())
    bits_total = int(total).bit_length()
    surp_ref = ray.put(
        {t: bits_total - int(c).bit_length() for t, c in tf_lookup.items()}
    )

    def score(batch: pa.Table) -> pa.Table:
        surp = ray.get(surp_ref)
        n_toks, lm_bits, avg = [], [], []
        for text in batch.column("text").to_pylist():
            toks = _TOKEN_RE.findall((text or "").lower())
            n = len(toks)
            # trained on this same corpus ⇒ every token is in-vocab; a miss
            # would mean train/score tokenizer drift, which must raise.
            bits = sum(surp[w] for w in toks)
            n_toks.append(n)
            lm_bits.append(bits)
            avg.append((100 * bits) // n if n else 0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_toks, pa.int64()),
                "lm_bits": pa.array(lm_bits, pa.int64()),
                "avg_bits_x100": pa.array(avg, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def _lm_quality_sharded(sf_dir: str):
    """Over-guard LM arm: the vocabulary NEVER reaches the driver.

    1. The (term, tf) table stays a distributed Dataset; the only driver
       scalar is the corpus token total (one ``Dataset.sum``).
    2. Surprisal bits are derived per vocab shard (vectorized exact
       ``bit_length``) and the table materializes in the object store.
    3. Each document emits (doc_id, term, cnt) distinct-term rows; a
       bounded hash join attaches the term's surprisal shard.
    4. One bounded-bucket exchange sums (cnt, cnt·bits) per doc — the
       lexsort/``reduceat`` house kernel, with a zeros branch from the
       corpus scan so zero-token documents keep their (0, 0, 0) row.

    Output is row-identical to the broadcast arm (same integer arithmetic,
    same tokenizer); only the surprisal transport differs."""
    import numpy as np
    import pandas as pd

    from lightrag_ray.extras.dedup import _mix64, hash_join_partitions

    docs = _docs(sf_dir, ["doc_id", "text"])
    tf_ds = _lm_tf_ds(sf_dir)
    total = tf_ds.sum("tf") or 0
    bits_total = int(total).bit_length()

    def to_bits(batch: pa.Table) -> pa.Table:
        tf = np.asarray(batch.column("tf"), np.int64)
        return pa.table(
            {
                "term": batch.column("term"),
                "bits": pa.array(bits_total - _bit_length_u64(tf), pa.int64()),
            }
        )

    surp_ds = tf_ds.map_batches(
        to_bits, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def doc_terms(batch: pa.Table) -> pa.Table:
        ids, terms, cnts = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            tf = Counter(_TOKEN_RE.findall((text or "").lower()))
            ids.extend([doc_id] * len(tf))
            terms.extend(tf.keys())
            cnts.extend(tf.values())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "term": pa.array(terms, pa.string()),
                "cnt": pa.array(cnts, pa.int64()),
            }
        )

    joined = docs.map_batches(
        doc_terms, batch_format="pyarrow", zero_copy_batch=True
    ).join(
        surp_ds,
        "inner",
        hash_join_partitions(),
        on=("term",),
    )

    _BUCKETS = 256

    def to_parts(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        cnt = np.asarray(batch.column("cnt"), np.int64)
        bits = np.asarray(batch.column("bits"), np.int64)
        bkt = (_mix64(ids.view(np.uint64)).view(np.int64) % _BUCKETS).astype(
            np.int32
        )
        return pa.table(
            {
                "_bkt": pa.array(bkt, pa.int32()),
                "doc_id": pa.array(ids, pa.int64()),
                "n_part": pa.array(cnt, pa.int64()),
                "bits_part": pa.array(cnt * bits, pa.int64()),
            }
        )

    def zero_parts(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        bkt = (_mix64(ids.view(np.uint64)).view(np.int64) % _BUCKETS).astype(
            np.int32
        )
        z = np.zeros(len(ids), np.int64)
        return pa.table(
            {
                "_bkt": pa.array(bkt, pa.int32()),
                "doc_id": pa.array(ids, pa.int64()),
                "n_part": pa.array(z, pa.int64()),
                "bits_part": pa.array(z, pa.int64()),
            }
        )

    union = joined.map_batches(
        to_parts, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        _docs(sf_dir, ["doc_id"]).map_batches(
            zero_parts, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def sum_bucket(group: pd.DataFrame) -> pa.Table:
        ids = group["doc_id"].to_numpy(np.int64)
        n = group["n_part"].to_numpy(np.int64)
        b = group["bits_part"].to_numpy(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, n, b = ids[order], n[order], b[order]
        new = np.empty(len(ids), bool)
        if len(ids):
            new[0] = True
            new[1:] = ids[1:] != ids[:-1]
        idx = np.flatnonzero(new)
        n_tok = np.add.reduceat(n, idx) if len(idx) else np.empty(0, np.int64)
        bits = np.add.reduceat(b, idx) if len(idx) else np.empty(0, np.int64)
        avg = np.where(n_tok > 0, (100 * bits) // np.maximum(n_tok, 1), 0)
        return pa.table(
            {
                "doc_id": pa.array(ids[idx], pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "lm_bits": pa.array(bits, pa.int64()),
                "avg_bits_x100": pa.array(avg, pa.int64()),
            }
        )

    return union.groupby("_bkt").map_groups(sum_bucket, batch_format="pandas")


SQL_LM_QUALITY = r"""
WITH w AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM documents
),
cnt AS (SELECT term, count(*) AS tf FROM w GROUP BY term),
tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM w),
per AS (
  SELECT w.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(length(bin((SELECT t FROM tot))) - length(bin(cnt.tf)))
              AS BIGINT) AS lm_bits
  FROM w JOIN cnt USING (term)
  GROUP BY w.doc_id
)
SELECT d.doc_id,
       coalesce(per.n_tokens, 0) AS n_tokens,
       coalesce(per.lm_bits, 0) AS lm_bits,
       CASE WHEN coalesce(per.n_tokens, 0) = 0 THEN 0
            ELSE 100 * per.lm_bits // per.n_tokens END AS avg_bits_x100
FROM documents d LEFT JOIN per USING (doc_id)
"""


# ---------------------------------------------------------------------------
# 5b. CCNet head/middle/tail perplexity buckets


def _ccnet_scored_dir(sf_dir: str) -> str:
    import hashlib
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), "lightrag_ray_ccnet", tag)


def _ccnet_build_scored(sf_dir: str) -> str:
    """Persist the narrow (doc_id, lang, avg_bits_x100) table ONCE: the
    corpus text streams exactly one time (inside :func:`q_lm_quality`),
    the language column is attached by a bucketed marker cogroup (two
    skinny exchanges — the empty-partition-safe hash-join substitute, same
    pattern as ``query_ops._attach_degree``), and the threshold/assign
    passes below read the few-ints-per-doc parquet instead of re-scanning
    the 100-TB text column.  Idempotent via a marker file (the
    ``_bm25_build_tf`` contract)."""
    import json
    import shutil

    import numpy as np
    import pandas as pd

    out_dir = _ccnet_scored_dir(sf_dir)
    marker = os.path.join(out_dir, "_CCNET_SCORED.json")
    if os.path.exists(marker):
        return out_dir
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)

    from lightrag_ray.extras.dedup import _mix64

    _BUCKETS = 256

    def _bkt(ids: "np.ndarray") -> pa.Array:
        b = (_mix64(ids.view(np.uint64)).view(np.int64) % _BUCKETS).astype(
            np.int32
        )
        return pa.array(b, pa.int32())

    def lm_side(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        return pa.table(
            {
                "_bkt": _bkt(ids),
                "doc_id": batch.column("doc_id"),
                "avg_bits_x100": batch.column("avg_bits_x100"),
                "lang": pa.nulls(batch.num_rows, pa.string()),
            }
        )

    def lang_side(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        return pa.table(
            {
                "_bkt": _bkt(ids),
                "doc_id": batch.column("doc_id"),
                "avg_bits_x100": pa.nulls(batch.num_rows, pa.int64()),
                "lang": batch.column("lang"),
            }
        )

    union = (
        q_lm_quality(sf_dir)
        .select_columns(["doc_id", "avg_bits_x100"])
        .map_batches(lm_side, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            _docs(sf_dir, ["doc_id", "lang"]).map_batches(
                lang_side, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("lang", pa.string()),
            ("avg_bits_x100", pa.int64()),
        ]
    )

    def zip_bucket(group: pd.DataFrame) -> pa.Table:
        is_lang = group["lang"].notna()
        lang_lookup = pd.Series(
            group.loc[is_lang, "lang"].to_numpy(),
            index=group.loc[is_lang, "doc_id"].to_numpy(np.int64),
        )
        score_rows = group[~is_lang]
        out = pd.DataFrame(
            {
                "doc_id": score_rows["doc_id"].to_numpy(np.int64),
                "lang": score_rows["doc_id"]
                .to_numpy(np.int64)
                .astype(object),
                "avg_bits_x100": score_rows["avg_bits_x100"].to_numpy(
                    np.int64
                ),
            }
        )
        out["lang"] = pd.Series(out["doc_id"]).map(lang_lookup)
        return pa.Table.from_pandas(
            out, schema=out_schema, preserve_index=False
        )

    union.groupby("_bkt").map_groups(
        zip_bucket, batch_format="pandas"
    ).write_parquet(out_dir)
    with open(marker, "w") as f:
        json.dump({"sf_dir": sf_dir}, f)
    return out_dir


def q_ccnet_buckets(sf_dir: str):
    """CCNet head/middle/tail perplexity split (Wenzek et al. 2020, §3.4):
    per LANGUAGE, documents are cut at the exact LM-score terciles into
    ``head`` (most fluent third), ``middle`` and ``tail`` — the bucket CCNet
    uses to keep head+middle and drop tail when composing training corpora.

    The split is THRESHOLD-based, exactly as in CCNet (docs compare against
    per-language cutoffs, not against a rank): ``t_j`` is the smallest
    ``avg_bits_x100`` value whose cumulative count reaches ``j/3`` of the
    language — integer arithmetic (``cum * 3 >= j * n``) on both engines,
    ties all fall on the low-bucket side of the cutoff value.

    Scale shape: corpus text streams ONCE (the persisted narrow table,
    :func:`_ccnet_build_scored`); the threshold pass is a per-batch
    (lang, avg) count combiner → a groupby bounded by |langs| × |avg
    values| (``avg_bits_x100 ≤ 100 × 64`` by construction — bit-length
    surprisals — so the histogram is ≤ ~6400·|langs| rows regardless of
    corpus size); cutoffs ship in the assign closure (2 ints per
    language); the assign pass is one vectorized dictionary-encode +
    gather.  No full-table sort, no per-language group task."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    scored_dir = _ccnet_build_scored(sf_dir)
    scored = rd.read_parquet(scored_dir)

    def hist_partial(batch: pa.Table) -> pa.Table:
        t = (
            batch.group_by(["lang", "avg_bits_x100"])
            .aggregate([("doc_id", "count")])
            .rename_columns(["lang", "avg_bits_x100", "c"])
        )
        return t

    hist = (
        rd.read_parquet(scored_dir)
        .map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "avg_bits_x100"])
        .sum("c")
    ).take_all()  # ≤ 6400 × |langs| rows by construction — driver-safe

    by_lang: dict = {}
    for row in hist:
        by_lang.setdefault(row["lang"], []).append(
            (row["avg_bits_x100"], row["sum(c)"])
        )
    cuts: dict = {}
    for lang, pairs in by_lang.items():
        pairs.sort()
        vals = np.array([v for v, _ in pairs], np.int64)
        cum = np.cumsum(np.array([c for _, c in pairs], np.int64))
        n = int(cum[-1])
        t1 = int(vals[np.searchsorted(cum * 3, n)])
        t2 = int(vals[np.searchsorted(cum * 3, 2 * n)])
        cuts[lang] = (t1, t2)

    def assign(batch: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(batch.column("lang").combine_chunks())
        langs = enc.dictionary.to_pylist()
        t1 = np.array([cuts[lg][0] for lg in langs], np.int64)
        t2 = np.array([cuts[lg][1] for lg in langs], np.int64)
        idx = np.asarray(enc.indices, np.int64)
        avg = np.asarray(batch.column("avg_bits_x100"), np.int64)
        bucket = np.where(
            avg <= t1[idx], "head", np.where(avg <= t2[idx], "middle", "tail")
        )
        return batch.append_column("bucket", pa.array(bucket, pa.string()))

    return scored.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_CCNET_BUCKETS = f"""
WITH lq AS ({SQL_LM_QUALITY}),
l AS (
  SELECT lq.doc_id, d.lang, lq.avg_bits_x100
  FROM lq JOIN documents d USING (doc_id)
),
h AS (
  SELECT lang, avg_bits_x100 AS v, CAST(count(*) AS BIGINT) AS c
  FROM l GROUP BY lang, avg_bits_x100
),
cum AS (
  SELECT lang, v,
         sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY lang) AS n
  FROM h
),
t AS (
  SELECT lang,
         min(CASE WHEN cum * 3 >= n THEN v END) AS t1,
         min(CASE WHEN cum * 3 >= 2 * n THEN v END) AS t2
  FROM cum GROUP BY lang
)
SELECT l.doc_id, l.lang, l.avg_bits_x100,
       CASE WHEN l.avg_bits_x100 <= t.t1 THEN 'head'
            WHEN l.avg_bits_x100 <= t.t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM l JOIN t USING (lang)
"""


DOMAIN_MIX_BUDGET = 1_000_000


def q_domain_mixture(sf_dir: str):
    """Domain (host) mixture weights for a training run: allocate a fixed
    budget of ``DOMAIN_MIX_BUDGET`` training slots across hosts proportional
    to token mass, rounded by the largest-remainder (Hamilton) method so
    the slots sum EXACTLY to the budget — the integer-exact form of the
    per-domain sampling-weight step every pretraining mixture needs
    (cf. the Pile / DoReMi domain weighting; no float shares, so the DuckDB
    row_number oracle hash-matches bit for bit).

    Scale shape: per-host token mass comes from :func:`_host_stats` (one
    streamed corpus pass with a per-batch host combiner → host-bounded
    groupby).  Quota arithmetic runs per batch in Python ints (the
    ``budget × tokens`` product overflows int64 at web scale — the
    host_quality_gate precedent).  The +1 winners are chosen WITHOUT any
    broadcast or rank materialization: one distributed sort of the
    host-bounded parts table by (remainder DESC, host ASC), a constant-
    memory driver scan that only COUNTS rows until the deficit is reached
    to learn the threshold pair, then a stateless vectorized filter marks
    winners — O(1) driver state at any host count.
    """
    import numpy as np

    hs = _host_stats(sf_dir).materialize()
    tot = int(hs.sum("sum_words") or 0)
    OUT_SCHEMA = pa.schema(
        [("host", pa.string()), ("n_tokens", pa.int64()), ("slots", pa.int64())]
    )
    if tot == 0:
        import ray.data as rd

        return rd.from_arrow(OUT_SCHEMA.empty_table())
    budget = DOMAIN_MIX_BUDGET

    def parts(batch: pa.Table) -> pa.Table:
        hosts = batch.column("host").to_pylist()
        w = [int(x) for x in batch.column("sum_words").to_pylist()]
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "n_tokens": pa.array(w, pa.int64()),
                "base": pa.array([(budget * x) // tot for x in w], pa.int64()),
                "rem": pa.array([(budget * x) % tot for x in w], pa.int64()),
            }
        )

    p = hs.map_batches(parts, batch_format="pyarrow").materialize()
    deficit = budget - int(p.sum("base") or 0)

    # threshold pair = the deficit-th row of the (rem DESC, host ASC) order;
    # the driver streams COUNTS only (constant memory), never the table
    thr = None
    if deficit > 0:
        seen = 0
        for b in p.sort(["rem", "host"], descending=[True, False]).iter_batches(
            batch_format="pyarrow", batch_size=65536
        ):
            if seen + b.num_rows >= deficit:
                i = deficit - seen - 1
                thr = (int(b.column("rem")[i].as_py()),
                       str(b.column("host")[i].as_py()))
                break
            seen += b.num_rows

    def finalize(batch: pa.Table) -> pa.Table:
        base = np.asarray(batch.column("base"), np.int64)
        if thr is None:
            slots = base
        else:
            rem = np.asarray(batch.column("rem"), np.int64)
            host = np.asarray(batch.column("host").to_pylist(), object)
            win = (rem > thr[0]) | ((rem == thr[0]) & (host <= thr[1]))
            slots = base + win.astype(np.int64)
        return pa.table(
            {
                "host": batch.column("host"),
                "n_tokens": batch.column("n_tokens"),
                "slots": pa.array(slots, pa.int64()),
            },
            schema=OUT_SCHEMA,
        )

    return p.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


SQL_DOMAIN_MIXTURE = f"""
WITH q AS (
  SELECT doc_id,
         'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS host,
         len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS n_words
  FROM documents
),
hw AS (SELECT host, CAST(sum(n_words) AS HUGEINT) AS w FROM q GROUP BY host),
tot AS (SELECT CAST(sum(w) AS HUGEINT) AS t FROM hw),
parts AS (
  SELECT host, w,
         ({DOMAIN_MIX_BUDGET}::HUGEINT * w) // t AS base,
         ({DOMAIN_MIX_BUDGET}::HUGEINT * w) % t AS rem
  FROM hw, tot
),
d AS (SELECT {DOMAIN_MIX_BUDGET} - sum(base) AS deficit FROM parts),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, host ASC) AS rk FROM parts
)
SELECT host, w::BIGINT AS n_tokens,
       (base + CASE WHEN rk <= (SELECT deficit FROM d) THEN 1 ELSE 0 END)::BIGINT
           AS slots
FROM ranked
"""


def queries() -> dict[str, Callable]:
    return {
        "domain_mixture": q_domain_mixture,  # round-5: largest-remainder slot allocation
        "host_quality_gate": q_host_quality_gate,  # round-5 addition: first so the driver reaches it
        "repetition_stats": q_repetition_stats,
        "boilerplate_ngrams": q_boilerplate_ngrams,
        "boilerplate_frac": q_boilerplate_frac,
        "pii_scan": q_pii_scan,
        "lm_quality": q_lm_quality,
        "ccnet_buckets": q_ccnet_buckets,
        "compression_ratio": q_compression_ratio,  # rows-only (no SQL zlib)
        "char_entropy_bits": q_char_entropy_bits,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "domain_mixture": SQL_DOMAIN_MIXTURE,
        "host_quality_gate": SQL_HOST_QUALITY_GATE,
        "repetition_stats": SQL_REPETITION_STATS,
        "boilerplate_ngrams": SQL_BOILERPLATE_NGRAMS,
        "boilerplate_frac": SQL_BOILERPLATE_FRAC,
        "pii_scan": SQL_PII_SCAN,
        "lm_quality": SQL_LM_QUALITY,
        "ccnet_buckets": SQL_CCNET_BUCKETS,
        "char_entropy_bits": SQL_CHAR_ENTROPY_BITS,
    }


# ---------------------------------------------------------------------------
# 6. Compression-ratio + character self-information quality signals


def q_compression_ratio(sf_dir: str):
    """Per-document zlib compression ratio ×1000 (integer): highly
    templated / repetitive text compresses far below natural prose, making
    deflate a classic cheap quality discriminator.  Deterministic for a
    fixed zlib level (9), but not SQL-expressible — rows-only driver
    entry; the arithmetic is pinned by unit tests instead.  Stateless
    ``map_batches``; no shuffle."""
    import zlib

    def ratio(batch: pa.Table) -> pa.Table:
        n_raw, n_comp, r1000 = [], [], []
        for text in batch.column("text").to_pylist():
            raw = (text or "").encode("utf-8")
            comp = zlib.compress(raw, 9)
            n_raw.append(len(raw))
            n_comp.append(len(comp))
            r1000.append((1000 * len(comp)) // len(raw) if raw else 0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_raw": pa.array(n_raw, pa.int64()),
                "n_comp": pa.array(n_comp, pa.int64()),
                "ratio_x1000": pa.array(r1000, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ratio, batch_format="pyarrow", zero_copy_batch=True
    )


def q_char_entropy_bits(sf_dir: str):
    """Per-document character self-information, bit-quantized: for each
    character occurrence, ``bitlen(n) − bitlen(count_of_that_char)`` summed
    over the document (n = doc length) — the integer-exact entropy proxy
    (low = few distinct characters dominating = template/garbage, high =
    diverse text), same bit-length quantization as ``q_lm_quality`` so the
    oracle is transcendental-free.  Stateless pass; no shuffle."""
    from collections import Counter

    def bits(batch: pa.Table) -> pa.Table:
        n_out, bits_out = [], []
        for text in batch.column("text").to_pylist():
            s = text or ""
            n = len(s)
            c = Counter(s)
            bl_n = n.bit_length()
            total = sum(cnt * (bl_n - cnt.bit_length()) for cnt in c.values())
            n_out.append(n)
            bits_out.append(total)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pa.array(n_out, pa.int64()),
                "self_info_bits": pa.array(bits_out, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        bits, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_CHAR_ENTROPY_BITS = """
WITH ch AS (
  SELECT doc_id, unnest(split(text, '')) AS c FROM documents
),
cnt AS (SELECT doc_id, c, count(*)::BIGINT AS k FROM ch GROUP BY doc_id, c),
n AS (SELECT doc_id, length(text)::BIGINT AS n FROM documents),
per AS (
  SELECT cnt.doc_id,
         CAST(sum(cnt.k * (length(bin(n.n)) - length(bin(cnt.k))))
              AS BIGINT) AS bits
  FROM cnt JOIN n USING (doc_id) GROUP BY cnt.doc_id
)
SELECT d.doc_id, length(d.text)::BIGINT AS n_chars,
       coalesce(per.bits, 0)::BIGINT AS self_info_bits
FROM documents d LEFT JOIN per USING (doc_id)
"""

# ---------------------------------------------------------------------------
# 7. Host-level quality gate (RefinedWeb-style URL/host curation)

# Kept-host stat rows broadcast once via ray.put behind this guard; past it
# the gate DEGRADES to a host-hash-bucketed cogroup join (never raises) —
# the round-4 VERDICT #2 discipline.  5M hosts x ~40 B/row ~ 200 MB.
MAX_HOST_BROADCAST = 5_000_000
_HOST_GATE_BUCKETS = 64


def _hosts_for(ids):
    """Canonical host per doc_id — extras/webcrawl's deterministic page
    rule AFTER canonicalize_urls (lowercased, ``www.`` stripped):
    ``site{doc_id % 7}.example.com``.  Same host space as
    webcrawl.q_host_stats, so the two tables join.  Vectorized np.char."""
    import numpy as np

    return np.char.add(
        np.char.add("site", (ids % 7).astype("U4")), ".example.com"
    )


def _host_gate_keep(n_docs: int, sum_words: int, t_docs: int, t_words: int) -> bool:
    """Host passes when its mean tokens-per-doc >= the corpus mean, as
    integer cross-multiplication in PYTHON ints (arbitrary precision: at
    10^9 docs x 10^12 host tokens the int64 product overflows; the oracle
    casts to HUGEINT for the same reason)."""
    return int(sum_words) * int(t_docs) >= int(t_words) * int(n_docs)


class _HostGateScorer:
    """Second pass, broadcast arm: re-derive the host from doc_id alone and
    attach the kept-host stats.  The stat map rides the object store once
    (ray.put in the driver); each actor fetches it in __init__."""

    def __init__(self, stats_ref):
        import ray

        self.stats = ray.get(stats_ref)  # host -> (host_n_docs, host_sum_words)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = np.asarray(batch.column("doc_id"), np.int64)
        host = _hosts_for(ids)
        uniq, inv = np.unique(host, return_inverse=True)
        # bounded per-uniq-host loop (distinct hosts per batch, not rows)
        u = [self.stats.get(h) for h in uniq.tolist()]
        u_keep = np.array([s is not None for s in u], bool)
        u_nd = np.array([s[0] if s else 0 for s in u], np.int64)
        u_sw = np.array([s[1] if s else 0 for s in u], np.int64)
        keep = u_keep[inv]
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "host": pa.array(host[keep].tolist(), pa.string()),
                "host_n_docs": pa.array(u_nd[inv][keep], pa.int64()),
                "host_sum_words": pa.array(u_sw[inv][keep], pa.int64()),
            }
        )


def _host_stats(sf_dir: str):
    """Pass 1: tokenize once, combine per batch to one partial row per host
    per batch (the combiner-before-groupby discipline), then a host-bounded
    groupby.  The corpus text never shuffles."""
    import numpy as np
    from ray.data.aggregate import Sum

    tok = _TOKEN_RE

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        texts = batch.column("text").to_pylist()
        n_words = np.fromiter(
            (len(tok.findall((t or "").lower())) for t in texts),
            np.int64,
            count=len(texts),
        )
        key = ids % 7
        uniq, inv = np.unique(key, return_inverse=True)
        sums = np.bincount(inv, weights=n_words).astype(np.int64)
        cnts = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "host": pa.array(_hosts_for(uniq).tolist(), pa.string()),
                "sum_words": pa.array(sums, pa.int64()),
                "n_docs": pa.array(cnts, pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("host")
        .aggregate(
            Sum("sum_words", alias_name="sum_words"),
            Sum("n_docs", alias_name="n_docs"),
        )
    )


def q_host_quality_gate(sf_dir: str):
    """RefinedWeb-style host-level quality gate (Penedo et al. 2023, "The
    RefinedWeb Dataset": URL/host-level curation before document-level
    filters): aggregate a per-document quality signal to the host, gate
    whole hosts, keep only documents on passing hosts.

    Signal: token count per document (``[a-z0-9_]+`` over lowercased text —
    module convention).  Gate: host mean tokens-per-doc >= corpus mean,
    evaluated as integer cross-multiplication (no float threshold, so the
    DuckDB oracle cannot diverge on rounding; Python/HUGEINT on the two
    sides because the int64 product overflows at web scale).

    Scale shape: pass 1 tokenizes the corpus once with a per-batch host
    combiner -> host-bounded groupby (the stat table is O(#hosts), the
    small side by construction).  Pass 2 streams ONLY the doc_id column
    (the host is doc_id-derived in the synthetic page identity) and joins
    the kept-host stats either by one ray.put broadcast (<= MAX_HOST_BROADCAST
    hosts) or, past the guard, by a host-hash bucketed cogroup — two
    bounded exchanges of skinny rows, never a raise.

    Reference intent: LightRAG ingests pre-curated text (SURVEY §2.1); this
    gate is the web-curation front-end the brief's training-data tier
    requires, sharing its host identity with webcrawl.q_host_stats.
    """
    import numpy as np
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    hs = _host_stats(sf_dir).materialize()
    n_hosts = hs.count()
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    if n_hosts <= MAX_HOST_BROADCAST:
        rows = hs.take_all()
        t_docs = sum(r["n_docs"] for r in rows)
        t_words = sum(r["sum_words"] for r in rows)
        stats = {
            r["host"]: (r["n_docs"], r["sum_words"])
            for r in rows
            if _host_gate_keep(r["n_docs"], r["sum_words"], t_docs, t_words)
        }
        stats_ref = ray.put(stats)
        return docs.map_batches(
            _HostGateScorer,
            fn_constructor_args=(stats_ref,),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        )

    # --- over-guard arm: host-hash bucketed cogroup, no broadcast -------
    tot = hs.aggregate(
        Sum("n_docs", alias_name="t_docs"), Sum("sum_words", alias_name="t_words")
    )
    t_docs, t_words = int(tot["t_docs"]), int(tot["t_words"])

    def kept_stats(batch: pa.Table) -> pa.Table:
        import zlib

        hosts = batch.column("host").to_pylist()
        nd = batch.column("n_docs").to_pylist()
        sw = batch.column("sum_words").to_pylist()
        # Python-int gate over HOST rows only (the small side) — exempt
        # from the no-row-loop rule for the overflow reason above.
        keep = [
            i
            for i in range(len(hosts))
            if _host_gate_keep(nd[i], sw[i], t_docs, t_words)
        ]
        return pa.table(
            {
                "host": pa.array([hosts[i] for i in keep], pa.string()),
                "doc_id": pa.array([-1] * len(keep), pa.int64()),
                "host_n_docs": pa.array([nd[i] for i in keep], pa.int64()),
                "host_sum_words": pa.array([sw[i] for i in keep], pa.int64()),
                "_bkt": pa.array(
                    [
                        zlib.crc32(hosts[i].encode()) % _HOST_GATE_BUCKETS
                        for i in keep
                    ],
                    pa.int64(),
                ),
            }
        )

    def doc_rows(batch: pa.Table) -> pa.Table:
        import zlib

        ids = np.asarray(batch.column("doc_id"), np.int64)
        host = _hosts_for(ids)
        uniq, inv = np.unique(host, return_inverse=True)
        u_bkt = np.array(
            [zlib.crc32(h.encode()) % _HOST_GATE_BUCKETS for h in uniq.tolist()],
            np.int64,
        )
        zero = np.zeros(len(ids), np.int64)
        return pa.table(
            {
                "host": pa.array(host.tolist(), pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "host_n_docs": pa.array(zero, pa.int64()),
                "host_sum_words": pa.array(zero, pa.int64()),
                "_bkt": pa.array(u_bkt[inv], pa.int64()),
            }
        )

    union = hs.map_batches(
        kept_stats, batch_format="pyarrow", zero_copy_batch=True
    ).union(docs.map_batches(doc_rows, batch_format="pyarrow", zero_copy_batch=True))

    def join(group) -> pa.Table:
        stats = group[group["doc_id"] < 0]
        docs_g = group[group["doc_id"] >= 0]
        out = docs_g[["doc_id", "host"]].merge(
            stats[["host", "host_n_docs", "host_sum_words"]], on="host"
        )
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(np.int64), pa.int64()),
                "host": pa.array(out["host"].tolist(), pa.string()),
                "host_n_docs": pa.array(
                    out["host_n_docs"].to_numpy(np.int64), pa.int64()
                ),
                "host_sum_words": pa.array(
                    out["host_sum_words"].to_numpy(np.int64), pa.int64()
                ),
            }
        )

    return union.groupby("_bkt").map_groups(join, batch_format="pandas")


SQL_HOST_QUALITY_GATE = """
WITH q AS (
  SELECT doc_id,
         'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS host,
         len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS n_words
  FROM documents
),
h AS (
  SELECT host, count(*) AS host_n_docs, sum(n_words) AS host_sum_words
  FROM q GROUP BY host
),
t AS (SELECT sum(host_n_docs) AS t_docs, sum(host_sum_words) AS t_words FROM h)
SELECT q.doc_id, q.host, h.host_n_docs, h.host_sum_words
FROM q JOIN h USING (host), t
WHERE h.host_sum_words::HUGEINT * t.t_docs >= t.t_words::HUGEINT * h.host_n_docs
"""
