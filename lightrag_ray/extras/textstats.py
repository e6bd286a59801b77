"""Text analysis operators: language ID heuristic and token statistics.

Language ID is a deterministic stopword/charset heuristic (no model):
score = fraction of words in each language's closed stopword list, with a CJK
charset override.  The heuristic IS SQL-expressible (list membership + argmax
with sorted tie-break), so ``SQL_LANGID`` below is generated from the same
``_PROFILES`` dict — the stopword lists can never drift between engine and
oracle.  Caveat: Python's ``\\w`` is Unicode while DuckDB's RE2 ``\\w`` is
ASCII; the two agree on ASCII corpora (the driver's synthetic tables are pure
ASCII — verified), and the CJK override handles the non-ASCII class the
heuristic actually distinguishes.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa

_WORD_RE = re.compile(r"\w+", re.UNICODE)
_CJK_RE = re.compile(r"[一-龥]")

_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is it for with that on as are was".split()),
    "de": frozenset("der die das und ist von zu mit den ein eine nicht".split()),
    "fr": frozenset("le la les et de des un une est pour que dans".split()),
    "es": frozenset("el la los las y de un una es para que en".split()),
}


def predict_lang(text: str) -> tuple[str, float]:
    text = text or ""
    if _CJK_RE.search(text):
        return "zh", 1.0
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if not words:
        return "und", 0.0
    best_lang, best = "und", 0.0
    for lang in sorted(_PROFILES):  # sorted → deterministic tie-break
        score = sum(1 for w in words if w in _PROFILES[lang]) / len(words)
        if score > best:
            best_lang, best = lang, score
    # Raw fraction, not round(best, 4): hits/total is the same IEEE-double
    # division the SQL oracle performs, so both sides are bit-identical;
    # a round() here would reintroduce banker's-vs-half-away divergence.
    return best_lang, best


def langid_batch(batch: pa.Table) -> pa.Table:
    preds, scores = [], []
    for text in batch.column("text").to_pylist():
        lang, score = predict_lang(text)
        preds.append(lang)
        scores.append(score)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(preds, pa.string()),
            "lang_score": pa.array(scores, pa.float64()),
        }
    )


def langid(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(langid_batch, batch_format="pyarrow", zero_copy_batch=True)


def _sql_in(words: frozenset[str]) -> str:
    return ", ".join(f"'{w}'" for w in sorted(words))


# Generated from _PROFILES so the oracle's stopword lists are the engine's.
# Argmax semantics mirror predict_lang exactly: strict `>` over langs in
# sorted order == max count with ascending-lang tie-break, and the winner
# must have count >= 1 (else 'und'); same denominator for every lang means
# comparing raw counts is equivalent to comparing score fractions.
# Exposed as bare CTEs (no WITH) so composite oracles (q_curated_corpus)
# can splice the same logic instead of duplicating it.
SQL_LANGID_CTES = f"""
tot AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\\w+')) AS n,
         regexp_matches(text, '[一-龥]') AS is_cjk
  FROM documents
), w AS (
  SELECT doc_id, lower(unnest(regexp_extract_all(text, '\\w+'))) AS w
  FROM documents
), cnt AS (
  SELECT doc_id, lang, c FROM (
    SELECT doc_id,
           count(*) FILTER (WHERE w IN ({_sql_in(_PROFILES["de"])})) AS de,
           count(*) FILTER (WHERE w IN ({_sql_in(_PROFILES["en"])})) AS en,
           count(*) FILTER (WHERE w IN ({_sql_in(_PROFILES["es"])})) AS es,
           count(*) FILTER (WHERE w IN ({_sql_in(_PROFILES["fr"])})) AS fr
    FROM w GROUP BY doc_id
  ) UNPIVOT (c FOR lang IN (de, en, es, fr))
), best AS (
  SELECT doc_id, lang, c,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, lang ASC) AS rk
  FROM cnt
), langpred AS (
  SELECT t.doc_id,
         CASE WHEN t.is_cjk THEN 'zh'
              WHEN b.c IS NULL OR b.c = 0 THEN 'und'
              ELSE b.lang END AS lang_pred,
         CASE WHEN t.is_cjk THEN 1.0
              WHEN b.c IS NULL OR b.c = 0 THEN 0.0
              ELSE b.c::DOUBLE / t.n END AS lang_score
  FROM tot t LEFT JOIN best b ON t.doc_id = b.doc_id AND b.rk = 1
)
"""

SQL_LANGID = (
    "WITH " + SQL_LANGID_CTES
    + "\nSELECT doc_id, lang_pred, lang_score FROM langpred"
)


# ---------------------------------------------------------------------------
# Exact distributed quantiles (per-language corpus length percentiles)

_QUANTILE_PCTS = (50, 90, 99)


def length_quantiles(sf_dir: str):
    """Exact p50/p90/p99 of ``n_chars`` per language — the distributed
    exact-quantile primitive.  The rank rule is stated explicitly so both
    engines agree without trusting a builtin's interpolation mode: the
    p-th percentile is the value at 1-indexed rank ``1 + (n-1)*p // 100``
    of the ascending sort (lower discrete quantile) — pure integer
    arithmetic.

    Scale shape: lengths are integers from a bounded domain, so each batch
    combines to a (lang, n_chars, count) HISTOGRAM partial; the shuffle
    carries histogram rows (|langs| × |distinct lengths| per block), never
    documents.  The per-language finalizer walks the merged histogram's
    cumulative counts — O(distinct values), driver never involved."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "n_chars"]
    )

    def histogram(batch: pa.Table) -> pa.Table:
        df = (
            batch.select(["lang", "n_chars"])
            .to_pandas()
            .groupby(["lang", "n_chars"], sort=True)
            .size()
            .reset_index(name="c")
        )
        return pa.table(
            {
                "lang": pa.array(df["lang"], pa.string()),
                "n_chars": pa.array(df["n_chars"].astype("int64"), pa.int64()),
                "c": pa.array(df["c"].astype("int64"), pa.int64()),
            }
        )

    hist = (
        docs.map_batches(histogram, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("c", alias_name="c"))
    )

    def finalize(group: "pd.DataFrame") -> pa.Table:
        g = group.sort_values("n_chars")
        vals = g["n_chars"].to_numpy(np.int64)
        counts = g["c"].to_numpy(np.int64)
        cum = np.cumsum(counts)
        n = int(cum[-1])
        out = {"lang": [g["lang"].iloc[0]], "n_docs": [n]}
        for p in _QUANTILE_PCTS:
            rank = 1 + (n - 1) * p // 100
            out[f"p{p}"] = [int(vals[np.searchsorted(cum, rank)])]
        return pa.table(
            {
                "lang": pa.array(out["lang"], pa.string()),
                "n_docs": pa.array(out["n_docs"], pa.int64()),
                **{
                    f"p{p}": pa.array(out[f"p{p}"], pa.int64())
                    for p in _QUANTILE_PCTS
                },
            }
        )

    return hist.groupby("lang").map_groups(finalize, batch_format="pandas")


SQL_LENGTH_QUANTILES = """
WITH r AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rk,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT lang,
       any_value(n)::BIGINT AS n_docs,
       max(CASE WHEN rk = 1 + (n - 1) * 50 // 100 THEN n_chars END)::BIGINT AS p50,
       max(CASE WHEN rk = 1 + (n - 1) * 90 // 100 THEN n_chars END)::BIGINT AS p90,
       max(CASE WHEN rk = 1 + (n - 1) * 99 // 100 THEN n_chars END)::BIGINT AS p99
FROM r GROUP BY lang
"""
