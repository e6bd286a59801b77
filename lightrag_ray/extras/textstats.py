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
import pyarrow.compute as pc

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


# ---------------------------------------------------------------------------
# Heavy hitters: Misra-Gries sketch + exact recount (two-pass, exact output)

_MG_K = 256  # sketch size → guaranteed candidate superset for freq > N/(K+1)
_TOKEN_RE = re.compile(r"[a-z0-9_]+")


def _mg_trim(counts: dict, k: int) -> dict:
    """Misra-Gries reduction: keep ≤ k counters by subtracting the
    (k+1)-th largest count from everything (the mergeable-summaries merge
    step, Agarwal et al. 2013) — each surviving counter underestimates the
    true frequency by at most the stream mass decremented so far."""
    if len(counts) <= k:
        return counts
    kth = sorted(counts.values(), reverse=True)[k]
    return {t: c - kth for t, c in counts.items() if c > kth}


def heavy_hitters(sf_dir: str, k: int = _MG_K):
    """EXACT corpus heavy hitters (terms with frequency > N/(k+1)) via the
    classic sketch-then-verify two-pass:

    pass 1 — each batch emits its ≤k-entry Misra-Gries summary (per-batch
    exact counts, MG-trimmed); the driver merges summaries sequentially
    with the same MG reduction (mergeable summaries: the merged sketch's
    keys are a GUARANTEED superset of every term with true frequency >
    N/(k+1), whatever the merge order).  The shuffle-free pass streams
    ≤k rows per block to the driver — no vocabulary-sized state anywhere.

    pass 2 — the ≤k candidates broadcast in the recount closure; one more
    streamed pass counts them EXACTLY (per-batch combiner → k-row groupby),
    and the integer threshold ``tf * (k+1) > N`` keeps the true heavy
    hitters.  Output is exact, so the DuckDB oracle is a plain GROUP BY —
    the sketch is an optimization the oracle can't distinguish."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def batch_sketch(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        n = 0
        for text in batch.column("text").to_pylist():
            toks = _TOKEN_RE.findall((text or "").lower())
            n += len(toks)
            c.update(toks)
        keep = _mg_trim(dict(c), k)
        terms = sorted(keep)
        if not terms:
            # an adversarial batch (> k equally-frequent terms) trims to an
            # EMPTY sketch — its token mass must still reach the total, so
            # emit one null-term carrier row instead of dropping n.
            return pa.table(
                {
                    "term": pa.array([None], pa.string()),
                    "c": pa.array([0], pa.int64()),
                    "n": pa.array([n], pa.int64()),
                }
            )
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "c": pa.array([keep[t] for t in terms], pa.int64()),
                "n": pa.array([n] + [0] * (len(terms) - 1), pa.int64()),
            }
        )

    # driver merge: ≤ k entries retained at any time, N accumulated exactly
    merged: dict = {}
    total = 0
    for b in docs.map_batches(
        batch_sketch, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow", batch_size=4 * k):
        total += int(np.asarray(pc.fill_null(b.column("n"), 0), np.int64).sum())
        for t, c in zip(b.column("term").to_pylist(), b.column("c").to_pylist()):
            if t is not None:  # null-term rows only carry token mass
                merged[t] = merged.get(t, 0) + c
        merged = _mg_trim(merged, k)
    candidates = frozenset(merged)

    def recount(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for text in batch.column("text").to_pylist():
            c.update(
                t
                for t in _TOKEN_RE.findall((text or "").lower())
                if t in candidates
            )
        terms = sorted(c)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "tf": pa.array([c[t] for t in terms], pa.int64()),
            }
        )

    exact = (
        docs.map_batches(recount, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("tf", alias_name="tf"))
    )
    thresh_n, thresh_d = total, k + 1  # keep tf iff tf * (k+1) > N

    def gate(batch: pa.Table) -> pa.Table:
        tf = np.asarray(batch.column("tf"), np.int64)
        return batch.filter(pa.array(tf * thresh_d > thresh_n))

    return exact.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


SQL_HEAVY_HITTERS = f"""
WITH w AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM documents
),
n AS (SELECT count(*)::BIGINT AS total FROM w)
SELECT term, count(*)::BIGINT AS tf
FROM w GROUP BY term
HAVING count(*) * {_MG_K + 1} > (SELECT total FROM n)
"""


# ---------------------------------------------------------------------------
# HyperLogLog registers: distributed distinct-count sketch, hash-exact

_HLL_P = 8  # 2^8 = 256 registers → ~6.5 % standard error
_HLL_REG = 1 << _HLL_P
_HLL_REM_BITS = 64 - _HLL_P


def _hll_parts(term: str) -> tuple[int, int]:
    """term → (register, rho): top p bits of the 64-bit md5 prefix index the
    register; rho = 1 + leading zeros of the remaining 56 bits (position of
    the first set bit), the classic Flajolet rank."""
    import hashlib

    h = int(hashlib.md5(term.encode()).hexdigest()[:16], 16)
    idx = h >> _HLL_REM_BITS
    rem = h & ((1 << _HLL_REM_BITS) - 1)
    rho = _HLL_REM_BITS - rem.bit_length() + 1
    return idx, rho


def hll_registers(sf_dir: str):
    """HyperLogLog register table over the corpus vocabulary (Flajolet et
    al. 2007) — the mergeable distinct-count sketch, kept hash-checkable by
    emitting the REGISTERS (exact integers: register max of the Flajolet
    rank) rather than the float estimate; callers derive the harmonic-mean
    estimate downstream (``hll_estimate`` below, accuracy pinned in tests).

    Scale shape: register state is a fixed 256-slot array; each batch
    combines its distinct terms locally and emits ≤256 (register, rho)
    partials, the groupby merges with MAX — the shuffle carries sketch
    rows, never vocabulary.  Registers depend only on the SET of term
    hashes, so merge order, batch boundaries and duplicate terms cannot
    change the result — the same reason the DuckDB oracle can state it
    from DISTINCT terms."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Max

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def batch_registers(batch: pa.Table) -> pa.Table:
        regs = np.zeros(_HLL_REG, np.int64)
        seen: set = set()
        for text in batch.column("text").to_pylist():
            seen.update(_TOKEN_RE.findall((text or "").lower()))
        for t in seen:
            idx, rho = _hll_parts(t)
            if rho > regs[idx]:
                regs[idx] = rho
        nz = np.flatnonzero(regs)
        return pa.table(
            {
                "register": pa.array(nz, pa.int64()),
                "rho": pa.array(regs[nz], pa.int64()),
            }
        )

    return (
        docs.map_batches(batch_registers, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("register")
        .aggregate(Max("rho", alias_name="rho"))
    )


def hll_estimate(registers: dict[int, int]) -> float:
    """Flajolet harmonic-mean estimate (with the small-range linear
    counting correction) from a {register: rho} dict — driver-side, float,
    deliberately OUTSIDE the hash-checked query."""
    import math

    m = _HLL_REG
    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -registers.get(i, 0) for i in range(m))
    e = alpha * m * m / s
    zeros = sum(1 for i in range(m) if registers.get(i, 0) == 0)
    if e <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return e


SQL_HLL_REGISTERS = f"""
WITH t AS (
  SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM documents
),
h AS (
  SELECT ('0x' || substr(md5(term), 1, 16))::UBIGINT AS hv FROM t
),
parts AS (
  SELECT (hv >> {_HLL_REM_BITS})::BIGINT AS register,
         hv & {(1 << _HLL_REM_BITS) - 1} AS rem
  FROM h
)
SELECT register,
       max(CASE WHEN rem = 0 THEN {_HLL_REM_BITS + 1}
                ELSE {_HLL_REM_BITS} - length(bin(rem)) + 1 END)::BIGINT AS rho
FROM parts GROUP BY register
"""
