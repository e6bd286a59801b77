"""Common-Crawl-style web-corpus operators: URL canonicalization + refetch
dedup, per-host crawl stats, BM25 keyword retrieval, benchmark
decontamination.

Four webtext-pipeline gates that operate on the page/url shape of the
north-star input (``url:string, warc_ts:timestamp`` per page), each a
streaming Ray Data pipeline with an exact DuckDB oracle:

* **URL canonicalization + latest-wins dedup**: Common Crawl refetches the
  same page across snapshots under cosmetically different URLs (scheme/host
  case, ``www.`` prefix, tracking query params, fragments).  The
  canonicalizer is a chain of vectorized Arrow RE2 kernels (both Arrow and
  DuckDB run RE2, so the two sides are byte-identical by construction);
  dedup keeps the latest fetch per canonical URL — per-batch combiner, one
  bounded-bucket shuffle, never a per-key ``map_groups``.
* **Host stats**: pages / fetches / last-crawl per registered host over the
  deduped crawl — one aggregate over the dedup output.
* **BM25 top-k retrieval**: the classic keyword-retrieval scorer
  (Robertson/Sparck Jones; k1=1.2, b=0.75) for a fixed query-term set.  The
  corpus is tokenized ONCE into a narrow per-doc term-frequency table
  (written to Parquet so the stats pass and the scoring pass never re-read
  the 100-TB text column); global stats are one tiny aggregate; scoring
  streams with per-batch top-k combiners so the final sort sees only
  k × blocks survivor rows.  IDFs are computed once on the driver with libm
  ``math.log`` — DuckDB's ``ln`` is the same libm call, and every remaining
  per-row operation is IEEE +,-,*,/ stated in identical association order
  on both sides, so scores match bit-for-bit before the round(4).
* **Decontamination**: flag training documents sharing any 8-word-gram with
  a held-out benchmark set (the GPT-3/Pile 13-gram decontamination gate,
  shortened to 8 for the synthetic corpus's short docs).  The benchmark
  side of the real operator is always small (eval suites, not corpora), so
  its distinct-gram set is streamed to the driver under an explicit guard
  and broadcast once via ``ray.put``; the training corpus streams through a
  stateless membership scorer and NEVER shuffles.

The synthetic ``documents`` table has no url/timestamp columns, so the page
identity (url, warc_ts) is a deterministic augmentation derived from
``doc_id`` — stated identically in the SQL oracles (no external data), same
precedent as the PII augmentation in extras/webquality.py.  The
canonicalizer, BM25 scorer and gram-membership kernels are the real
operators and are additionally unit-tested on crafted inputs in
tests/test_webcrawl.py.

Reference intent: LightRAG ingests pre-curated documents
(``lightrag/lightrag.py`` ``ainsert`` path — enqueue dedup, sanitize); these
gates are the crawl-side curation front-end that produces that corpus, and
BM25 is the keyword-retrieval analogue of its vector top-k
(``lightrag/operate.py`` keyword/vector mixed query path).

Tokenization is ``[a-z0-9_]+`` over lowercased text on BOTH sides (ASCII
class — no engine-specific ``\\w`` unicode divergence).
"""

from __future__ import annotations

import math
import os
import re
from collections import Counter
from typing import Callable

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(r"[a-z0-9_]+")

# ---------------------------------------------------------------------------
# Synthetic page identity (deterministic doc_id augmentation, mirrored in SQL)

_TS_EPOCH = 1_600_000_000  # warc_ts = epoch + doc_id * 7 (monotone in doc_id)


def _synth_urls(ids: np.ndarray) -> np.ndarray:
    """Deterministic raw URL per doc_id, vectorized (np.char elementwise
    kernels — no Python loop).  Collisions are built in: doc_ids congruent
    mod lcm(7, 50) = 350 canonicalize to the same page, differing only in
    case, ``www.``, tracking params and fragments."""
    u = ids.astype("U20")
    prefix = np.where(ids % 2 == 0, "https://WWW.", "https://")
    site = np.char.add(np.char.add("Site", (ids % 7).astype("U4")), ".Example.com/a/")
    path = (ids % 50).astype("U4")
    query = np.where(
        ids % 3 == 0, np.char.add("?utm_source=feed&sess=", u), ""
    )
    frag = np.where(ids % 5 == 0, np.char.add("#sec", (ids % 4).astype("U4")), "")
    out = np.char.add(prefix, site)
    out = np.char.add(out, path)
    out = np.char.add(out, query)
    return np.char.add(out, frag)


SQL_SYNTH_PAGES = """
  SELECT doc_id,
         'https://' || CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END
           || 'Site' || CAST(doc_id % 7 AS VARCHAR) || '.Example.com/a/'
           || CAST(doc_id % 50 AS VARCHAR)
           || CASE WHEN doc_id % 3 = 0
                THEN '?utm_source=feed&sess=' || CAST(doc_id AS VARCHAR)
                ELSE '' END
           || CASE WHEN doc_id % 5 = 0
                THEN '#sec' || CAST(doc_id % 4 AS VARCHAR)
                ELSE '' END AS url,
         1600000000 + doc_id * 7 AS warc_ts
  FROM documents
"""


# ---------------------------------------------------------------------------
# 1. URL canonicalization + latest-wins refetch dedup


def canonicalize_urls(urls: pa.Array) -> pa.Array:
    """Canonical form of crawl URLs, fully vectorized (Arrow RE2 kernels):
    lowercase, strip the fragment, strip trailing tracking query strings
    (``?utm_...``), strip a ``www.`` host prefix.  DuckDB's regexp_replace
    is the same RE2 engine, so the oracle restates these four rewrites
    verbatim and the two sides agree byte-for-byte."""
    import pyarrow.compute as pc

    x = pc.utf8_lower(urls)
    x = pc.replace_substring_regex(x, pattern="#.*$", replacement="")
    x = pc.replace_substring_regex(x, pattern=r"\?utm_[^#]*$", replacement="")
    return pc.replace_substring_regex(x, pattern=r"://www\.", replacement="://")


_SQL_CANON = (
    r"regexp_replace(regexp_replace(regexp_replace(lower(url), "
    r"'#.*$', ''), '\?utm_[^#]*$', ''), '://www\.', '://')"
)

_DEDUP_BUCKETS = 64


def _url_bucket(canon: list) -> list:
    """Deterministic coarse bucket per canonical URL (zlib.crc32 — stable
    across runs/processes, unlike Python hash()).  Applied only to
    combiner-shrunken partial rows, never the raw corpus."""
    import zlib

    return [zlib.crc32(c.encode()) % _DEDUP_BUCKETS for c in canon]


def _synth_canon_pages(sf_dir: str):
    """documents → (doc_id, warc_ts, canonical_url), streaming."""
    import ray.data as rd

    def to_pages(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        urls = pa.array(_synth_urls(ids), pa.string())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "warc_ts": pa.array(_TS_EPOCH + ids * 7, pa.int64()),
                "canonical_url": canonicalize_urls(urls),
            }
        )

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(to_pages, batch_format="pyarrow", zero_copy_batch=True)


def q_url_dedup(sf_dir: str):
    """Latest-wins page dedup over the canonicalized crawl: one surviving
    row per canonical URL — the fetch with the greatest (warc_ts, doc_id) —
    plus the refetch count.

    Scale shape: a per-batch combiner collapses each batch to one partial
    row per canonical URL (lexicographic max + count, vectorized pandas
    sort/tail), then ONE bounded-bucket shuffle (``_DEDUP_BUCKETS`` groups,
    never per-key ``map_groups``) finishes the argmax — the same bucketed
    reduce shape as stages/merge.py.  The exchange carries combiner
    partials, not raw fetches."""
    import pandas as pd

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        last = (
            df.sort_values(["canonical_url", "warc_ts", "doc_id"])
            .groupby("canonical_url", sort=False)
            .tail(1)
        )
        cnt = (
            df.groupby("canonical_url", sort=False, as_index=False)
            .agg(n_fetches=("n_fetches", "sum"))
            if "n_fetches" in df.columns
            else df.groupby("canonical_url", sort=False, as_index=False)
            .agg(n_fetches=("doc_id", "size"))
        )
        out = last.merge(cnt, on="canonical_url", suffixes=("_drop", ""))
        if "n_fetches_drop" in out.columns:
            out = out.drop(columns=["n_fetches_drop"])
        return out[["canonical_url", "doc_id", "warc_ts", "n_fetches"]]

    def partial(batch: pa.Table) -> pa.Table:
        out = combine(batch.to_pandas())
        out["bucket"] = _url_bucket(out["canonical_url"].tolist())
        return pa.Table.from_pandas(out, preserve_index=False)

    def finalize(group: pd.DataFrame) -> pa.Table:
        out = combine(group)
        return pa.Table.from_pandas(
            out,
            schema=pa.schema(
                [
                    ("canonical_url", pa.string()),
                    ("doc_id", pa.int64()),
                    ("warc_ts", pa.int64()),
                    ("n_fetches", pa.int64()),
                ]
            ),
            preserve_index=False,
        )

    return (
        _synth_canon_pages(sf_dir)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(finalize, batch_format="pandas")
    )


SQL_URL_DEDUP = f"""
WITH pages AS ({SQL_SYNTH_PAGES}),
canon AS (
  SELECT doc_id, warc_ts, {_SQL_CANON} AS canonical_url FROM pages
)
SELECT canonical_url,
       max(doc_id)  AS doc_id,
       max(warc_ts) AS warc_ts,
       count(*)     AS n_fetches
FROM canon GROUP BY canonical_url
"""


def q_host_stats(sf_dir: str):
    """Per-host crawl summary over the deduped pages: distinct pages,
    total fetches, last crawl timestamp.  Host extraction is one RE2
    backreference rewrite (identical kernel in DuckDB); the aggregate runs
    over the (already combiner-shrunken) dedup output — hosts are few, the
    groupby exchange is tiny."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum

    def add_host(batch: pa.Table) -> pa.Table:
        host = pc.replace_substring_regex(
            batch.column("canonical_url"),
            pattern=r"^https://([^/]*).*$",
            replacement=r"\1",
        )
        return pa.table(
            {
                "host": host,
                "n_fetches": batch.column("n_fetches"),
                "warc_ts": batch.column("warc_ts"),
                "one": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
            }
        )

    return (
        q_url_dedup(sf_dir)
        .map_batches(add_host, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("host")
        .aggregate(
            Sum("n_fetches", alias_name="n_fetches"),
            Max("warc_ts", alias_name="last_ts"),
            Sum("one", alias_name="n_pages"),
        )
    )


SQL_HOST_STATS = f"""
WITH pages AS ({SQL_SYNTH_PAGES}),
canon AS (
  SELECT doc_id, warc_ts, {_SQL_CANON} AS canonical_url FROM pages
),
dedup AS (
  SELECT canonical_url, max(warc_ts) AS warc_ts, count(*) AS n_fetches
  FROM canon GROUP BY canonical_url
)
SELECT regexp_replace(canonical_url, '^https://([^/]*).*$', '\\1') AS host,
       sum(n_fetches) AS n_fetches,
       max(warc_ts)   AS last_ts,
       count(*)       AS n_pages
FROM dedup GROUP BY host
"""


# ---------------------------------------------------------------------------
# 2. BM25 top-k keyword retrieval

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY_TERMS = ("key", "merge", "table", "window")


def _bm25_tf_dir(sf_dir: str, terms: tuple) -> str:
    import hashlib
    import tempfile

    tag = hashlib.md5(
        (os.path.abspath(sf_dir) + "|" + ",".join(terms)).encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), "lightrag_ray_bm25", tag)


def _bm25_build_tf(sf_dir: str, terms: tuple) -> str:
    """Tokenize the corpus ONCE into the narrow per-doc table
    (doc_id, dl, tf_0..tf_{n-1}) and persist it as Parquet — the stats pass
    and the scoring pass read the few-ints-per-doc table instead of
    re-scanning the 100-TB text column.  Idempotent via a marker file, same
    contract as dedup.ivf_build_index."""
    import json
    import shutil

    import ray.data as rd

    out_dir = _bm25_tf_dir(sf_dir, terms)
    marker = os.path.join(out_dir, "_BM25_TF.json")
    if os.path.exists(marker):
        return out_dir
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)

    def tf_batch(batch: pa.Table) -> pa.Table:
        cols: dict = {"doc_id": batch.column("doc_id")}
        dl, tfs = [], [[] for _ in terms]
        for text in batch.column("text").to_pylist():
            toks = _TOKEN_RE.findall((text or "").lower())
            c = Counter(toks)
            dl.append(len(toks))
            for i, t in enumerate(terms):
                tfs[i].append(c.get(t, 0))
        cols["dl"] = pa.array(dl, pa.int64())
        for i in range(len(terms)):
            cols[f"tf_{i}"] = pa.array(tfs[i], pa.int64())
        return pa.table(cols)

    rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(
        tf_batch, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(out_dir)
    with open(marker, "w") as f:
        json.dump({"sf_dir": sf_dir, "terms": list(terms)}, f)
    return out_dir


def q_bm25_topk(sf_dir: str, k: int = 10, terms: tuple = BM25_QUERY_TERMS):
    """BM25 top-``k`` documents for the fixed query-term set.

    Three cheap passes over the NARROW tf table (built once): (1) one
    aggregate for N, Σdl and per-term document frequencies; (2) a driver
    scalar per term — ``idf = ln((N - df + .5)/(df + .5) + 1)`` via libm
    ``math.log`` (DuckDB ``ln`` is the same libm); (3) a streamed scorer
    whose per-row math is pure IEEE +,-,*,/ written in the identical
    association order as the oracle, with a per-batch local top-k combiner
    so the global sort sees k × blocks rows, not the corpus."""
    import ray.data as rd

    tf_dir = _bm25_build_tf(sf_dir, terms)
    glob_files = sorted(
        os.path.join(tf_dir, f)
        for f in os.listdir(tf_dir)
        if f.endswith(".parquet")
    )
    tf_ds = rd.read_parquet(glob_files)

    nt = len(terms)

    def indicators(batch: pa.Table) -> pa.Table:
        cols = {"dl": batch.column("dl")}
        for i in range(nt):
            cols[f"nz_{i}"] = pa.array(
                (np.asarray(batch.column(f"tf_{i}"), np.int64) > 0).astype(
                    np.int64
                ),
                pa.int64(),
            )
        return pa.table(cols)

    n_docs = tf_ds.count()
    sums = tf_ds.map_batches(
        indicators, batch_format="pyarrow", zero_copy_batch=True
    ).sum(on=["dl"] + [f"nz_{i}" for i in range(nt)])
    avgdl = sums["sum(dl)"] / n_docs
    idf = [
        math.log((n_docs - sums[f"sum(nz_{i})"] + 0.5) / (sums[f"sum(nz_{i})"] + 0.5) + 1.0)
        for i in range(nt)
    ]

    def score(batch: pa.Table) -> pa.Table:
        dl = np.asarray(batch.column("dl"), np.float64)
        denom_norm = 1.0 - BM25_B + BM25_B * (dl / avgdl)
        s = np.zeros(len(dl), np.float64)
        for i in range(nt):
            tf = np.asarray(batch.column(f"tf_{i}"), np.float64)
            s = s + idf[i] * (tf * (BM25_K1 + 1.0)) / (tf + BM25_K1 * denom_norm)
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "score": pa.array(np.round(s, 4), pa.float64()),
            }
        )
        # local top-k combiner: only k rows per batch reach the global sort
        order = np.lexsort(
            (np.asarray(out.column("doc_id"), np.int64), -np.asarray(out.column("score"), np.float64))
        )[:k]
        return out.take(pa.array(np.sort(order), pa.int64()))

    return (
        tf_ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )


def _sql_bm25(k: int = 10, terms: tuple = BM25_QUERY_TERMS) -> str:
    tf_cols = ",\n         ".join(
        f"len(list_filter(ts, t -> t = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n         ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    score = " + ".join(
        f"ln((n - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        f" * (tf_{i} * {BM25_K1 + 1.0}) "
        f"/ (tf_{i} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * (dl / avgdl)))"
        for i in range(len(terms))
    )
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts
  FROM documents
),
tf AS (
  SELECT doc_id, len(ts) AS dl,
         {tf_cols}
  FROM toks
),
stats AS (
  SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
         {df_cols}
  FROM tf
)
SELECT doc_id, round({score}, 4) AS score
FROM tf, stats
ORDER BY score DESC, doc_id
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# 3. Benchmark decontamination (8-word-gram overlap vs a held-out eval set)

DECONTAM_N = 8
EVAL_MOD = 20  # doc is in the benchmark set iff md5(doc_id) % EVAL_MOD == 0
MAX_BROADCAST_GRAMS = 5_000_000  # eval suites are small; a benchmark whose
# distinct-gram set exceeds this is a mis-specified input — raise, don't OOM.


def _is_eval_mask(ids: list, eval_mod: int = EVAL_MOD) -> pa.Array:
    import hashlib

    return pa.array(
        [
            int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % eval_mod
            == 0
            for d in ids
        ]
    )


def _doc_grams(text: str) -> set:
    ws = _TOKEN_RE.findall((text or "").lower())
    return {
        " ".join(ws[i : i + DECONTAM_N])
        for i in range(len(ws) - DECONTAM_N + 1)
    }


def q_decontam(sf_dir: str, eval_mod: int = EVAL_MOD):
    """Per-training-doc contamination flags vs the held-out benchmark set:
    ``n_eval_grams`` = distinct 8-grams of the doc that appear anywhere in
    the eval set, ``contaminated`` = 1 iff any overlap.

    Scale shape: the eval side (1/``eval_mod`` of docs here; real eval
    suites are tiny and FIXED-size — callers at corpus scale pass a larger
    ``eval_mod`` so the slice stays benchmark-sized) streams its per-batch
    DISTINCT grams to the driver under ``MAX_BROADCAST_GRAMS`` (raise,
    never OOM), broadcast once via ``ray.put``; the training corpus then
    streams through a stateless membership scorer — the big side never
    shuffles and is read exactly once."""
    import ray
    import ray.data as rd

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def eval_grams(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        keep = _is_eval_mask(ids, eval_mod)
        grams: set = set()
        for text in batch.filter(keep).column("text").to_pylist():
            grams |= _doc_grams(text)
        return pa.table({"gram": pa.array(sorted(grams), pa.string())})

    gram_set: set = set()
    for b in docs.map_batches(
        eval_grams, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow", batch_size=65536):
        gram_set.update(b.column("gram").to_pylist())
        if len(gram_set) > MAX_BROADCAST_GRAMS:
            raise ValueError(
                f"benchmark gram set exceeds {MAX_BROADCAST_GRAMS} — "
                "not a held-out eval set; refusing to broadcast"
            )
    gram_ref = ray.put(gram_set)

    # Actor pool, not a task fn: the gram set can be hundreds of MB, and a
    # plain function would re-deserialize it from the object store on every
    # batch — the class fetches it ONCE per actor in __init__.
    return docs.map_batches(
        _GramScorer,
        fn_constructor_args=(gram_ref, eval_mod),
        concurrency=(1, 8),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


class _GramScorer:
    """Stateless-per-batch contamination scorer holding the broadcast
    eval-gram set (fetched once per actor)."""

    def __init__(self, gram_ref, eval_mod: int = EVAL_MOD):
        import ray

        self.grams = ray.get(gram_ref)
        self.eval_mod = eval_mod

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch.column("doc_id").to_pylist()
        keep = _is_eval_mask(ids, self.eval_mod)
        train = batch.filter(pc.invert(keep))
        n_hits = [
            sum(1 for g in _doc_grams(text) if g in self.grams)
            for text in train.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": train.column("doc_id"),
                "n_eval_grams": pa.array(n_hits, pa.int64()),
                "contaminated": pa.array(
                    [1 if h > 0 else 0 for h in n_hits], pa.int64()
                ),
            }
        )


SQL_DECONTAM = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
           % {EVAL_MOD} = 0 AS is_eval
  FROM documents
),
grams AS (
  SELECT doc_id, is_eval,
         array_to_string(ts[i:i + {DECONTAM_N - 1}], ' ') AS gram
  FROM toks,
       UNNEST(range(1, greatest(len(ts) - {DECONTAM_N - 2}, 1))) AS u(i)
),
eval_grams AS (SELECT DISTINCT gram FROM grams WHERE is_eval),
hits AS (
  SELECT g.doc_id, count(DISTINCT g.gram) AS n_eval_grams
  FROM (SELECT DISTINCT doc_id, gram FROM grams WHERE NOT is_eval) g
  JOIN eval_grams e USING (gram)
  GROUP BY g.doc_id
)
SELECT t.doc_id,
       coalesce(h.n_eval_grams, 0) AS n_eval_grams,
       CASE WHEN coalesce(h.n_eval_grams, 0) > 0 THEN 1 ELSE 0 END
         AS contaminated
FROM toks t LEFT JOIN hits h ON t.doc_id = h.doc_id
WHERE NOT t.is_eval
"""


# ---------------------------------------------------------------------------
# registration


def q_bm25_top10(sf_dir: str):
    return q_bm25_topk(sf_dir, k=10)


# ---------------------------------------------------------------------------
# 4b. Reciprocal-rank-fusion hybrid retrieval (BM25 ⊕ vector cosine)

RRF_K = 60  # the constant from Cormack/Clarke/Buettcher 2009
RRF_POOL = 50  # per-leg candidate pool fed into the fusion
RRF_TOPK = 20


def _cosine_topk(sf_dir: str, k: int):
    """Brute-force cosine top-``k`` neighbours of vec_id 0 (the engine's
    vector-retrieval leg, same conventions as pipelines.queries.q_knn_top10:
    query vector broadcast once via ``ray.put``, one float64 matmul per
    batch, sims rounded to 4, self excluded) — plus a per-batch local top-k
    combiner so the global sort sees k × blocks rows, not the corpus."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    q_table = pq.read_table(path, columns=["vec_id", "embedding"])
    q_vec = None
    for batch in q_table.to_batches():
        ids = batch.column("vec_id").to_pylist()
        if 0 in ids:
            q_vec = np.array(
                batch.column("embedding")[ids.index(0)].as_py(),
                dtype=np.float64,
            )
            break
    q_ref = ray.put(q_vec / np.linalg.norm(q_vec))

    def score(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = np.asarray(batch.column("vec_id"), np.int64)
        mat = np.array(batch.column("embedding").to_pylist(), np.float64)
        norms = np.linalg.norm(mat, axis=1)
        sims = np.round((mat @ q) / np.where(norms == 0, 1.0, norms), 4)
        keep = ids != 0
        ids, sims = ids[keep], sims[keep]
        top = np.lexsort((ids, -sims))[:k]  # local combiner
        top.sort()
        return pa.table(
            {
                "doc_id": pa.array(ids[top], pa.int64()),
                "sim": pa.array(sims[top], pa.float64()),
            }
        )

    return (
        rd.read_parquet(path, columns=["vec_id", "embedding"])
        .map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["sim", "doc_id"], descending=[True, False])
        .limit(k)
    )


def q_rrf_fusion(sf_dir: str):
    """Hybrid retrieval by reciprocal rank fusion (Cormack, Clarke &
    Buettcher, SIGIR 2009): the BM25 keyword leg and the cosine vector leg
    each contribute a rank-1..POOL candidate list, and a document's fused
    score is Σ 1/(60 + rank) over the legs that retrieved it.  This is the
    crawl-side analogue of the reference's ``mix`` query mode
    (lightrag/operate.py — keyword path merged with vector path before
    context assembly), expressed as pure rank arithmetic.

    Determinism/parity: per-leg ranks are positions in the (score DESC,
    doc_id ASC) order of ALREADY hash-verified leg scores (bm25_top10 /
    knn_top10 conventions), and the fused score is computed in EXACT integer
    arithmetic — ``round(1e12/(60+r))`` summed as int64 — so no
    float-association divergence can reach the hash.  A leg that missed the
    document contributes 0 and reports rank 0.

    Scale shape: each leg ends in a per-batch top-k combiner → global sort
    over k × blocks survivor rows → LIMIT POOL; the fusion itself touches
    exactly 2 × POOL rows (constant, driver-safe by construction)."""
    import ray.data as rd

    def _ranks(rows: list, id_col: str) -> dict:
        return {int(r[id_col]): i + 1 for i, r in enumerate(rows)}

    bm = _ranks(q_bm25_topk(sf_dir, k=RRF_POOL).take(RRF_POOL), "doc_id")
    vec = _ranks(_cosine_topk(sf_dir, RRF_POOL).take(RRF_POOL), "doc_id")

    fused = []
    for d in set(bm) | set(vec):
        rb, rv = bm.get(d, 0), vec.get(d, 0)
        s = 0
        if rb:
            s += int(round(1e12 / (RRF_K + rb)))
        if rv:
            s += int(round(1e12 / (RRF_K + rv)))
        fused.append((d, rb, rv, s))
    fused.sort(key=lambda t: (-t[3], t[0]))
    fused = fused[:RRF_TOPK]
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([t[0] for t in fused], pa.int64()),
                "bm25_rank": pa.array([t[1] for t in fused], pa.int64()),
                "vec_rank": pa.array([t[2] for t in fused], pa.int64()),
                "rrf_x1e12": pa.array([t[3] for t in fused], pa.int64()),
            }
        )
    )


def _sql_rrf() -> str:
    bm25_pool = _sql_bm25(k=RRF_POOL)
    return f"""
WITH bm AS ({bm25_pool}),
bmr AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id) AS r
  FROM bm
),
knn AS (
  SELECT e.vec_id AS doc_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[],
                                      q.embedding::DOUBLE[]), 4) AS sim
  FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
  WHERE e.vec_id <> 0
  ORDER BY sim DESC, e.vec_id
  LIMIT {RRF_POOL}
),
knr AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY sim DESC, doc_id) AS r
  FROM knn
),
f AS (
  SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
         CAST(COALESCE(b.r, 0) AS BIGINT) AS bm25_rank,
         CAST(COALESCE(v.r, 0) AS BIGINT) AS vec_rank,
         (CASE WHEN b.r IS NULL THEN 0
               ELSE CAST(round(1e12 / ({RRF_K} + b.r)) AS BIGINT) END
          + CASE WHEN v.r IS NULL THEN 0
                 ELSE CAST(round(1e12 / ({RRF_K} + v.r)) AS BIGINT) END)
           AS rrf_x1e12
  FROM bmr b FULL OUTER JOIN knr v ON b.doc_id = v.doc_id
)
SELECT * FROM f ORDER BY rrf_x1e12 DESC, doc_id LIMIT {RRF_TOPK}
"""


# ---------------------------------------------------------------------------
# 5. Crawl snapshot CDC (change-data-capture)

_CDC_ROWS_PER_BUCKET = 250_000


def _synth_content_sig(ids: np.ndarray) -> np.ndarray:
    """Deterministic per-fetch content signature (the synthetic corpus has
    one text per doc_id, so refetch content identity is an augmentation —
    rule stated identically in SQL_CRAWL_CDC, same precedent as the url/ts
    synthesis above): canonical groups are doc_ids congruent mod 350 with
    fetch index k = doc_id // 350; groups with (doc_id % 350) % 3 == 0
    never change content, every other group changes on each refetch — so
    new / changed / unchanged all occur from 500 docs up."""
    c = ids % 350
    k = ids // 350
    return c * 1000 + np.where(c % 3 == 0, 0, k)


def classify_fetch_history(group) -> pa.Table:
    """(canonical_url, warc_ts, doc_id, sig) rows → per-fetch CDC status.
    One np.unique factorize + lexsort + shifted compare — no Python loop;
    every fetch of a canonical URL must be present (the caller's bucketing
    guarantees it)."""
    urls = group["canonical_url"].to_numpy(object)
    ts = group["warc_ts"].to_numpy(np.int64)
    ids = group["doc_id"].to_numpy(np.int64)
    sig = group["sig"].to_numpy(np.int64)
    uniq, codes = np.unique(urls, return_inverse=True)
    order = np.lexsort((ids, ts, codes))
    codes_s, ids_s, sig_s, urls_s = (
        codes[order],
        ids[order],
        sig[order],
        urls[order],
    )
    first = np.concatenate(([True], codes_s[1:] != codes_s[:-1]))
    changed = np.concatenate(([False], sig_s[1:] != sig_s[:-1]))
    status = np.where(
        first, "new", np.where(changed, "changed", "unchanged")
    )
    return pa.table(
        {
            "doc_id": pa.array(ids_s, pa.int64()),
            "canonical_url": pa.array(urls_s.tolist(), pa.string()),
            "status": pa.array(status.tolist(), pa.string()),
        }
    )


def q_crawl_cdc(sf_dir: str):
    """Classify every fetch of the canonicalized crawl as new / changed /
    unchanged vs the PREVIOUS fetch of the same canonical URL (ordered by
    (warc_ts, doc_id)) — the snapshot-to-snapshot change-data-capture a
    recurrent crawl uses to skip re-processing unchanged pages.

    Scale shape: lag() cannot pre-combine (each fetch needs its
    predecessor), so the exchange carries the narrow fetch rows (url hash
    bucket, ts, id, sig) exactly once, bucketed by canonical-URL crc32
    into a width that SCALES WITH THE CORPUS (≤ ~250k rows per group) —
    wider than url_dedup's fixed 64 because these are raw fetch rows, not
    combiner partials."""
    import zlib

    from lightrag_ray.extras.webquality import _n_docs

    n = _n_docs(sf_dir)
    buckets = max(_DEDUP_BUCKETS, -(-n // _CDC_ROWS_PER_BUCKET))

    def tag(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        tbl = batch.append_column(
            "sig", pa.array(_synth_content_sig(ids), pa.int64())
        )
        buck = [
            zlib.crc32(c.encode()) % buckets
            for c in tbl.column("canonical_url").to_pylist()
        ]
        return tbl.append_column("bucket", pa.array(buck, pa.int64()))

    return (
        _synth_canon_pages(sf_dir)
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(classify_fetch_history, batch_format="pandas")
    )


SQL_CRAWL_CDC = f"""
WITH pages AS ({SQL_SYNTH_PAGES}),
canon AS (
  SELECT doc_id, warc_ts, {_SQL_CANON} AS canonical_url,
         (doc_id % 350) * 1000
           + CASE WHEN (doc_id % 350) % 3 = 0 THEN 0
                  ELSE doc_id // 350 END AS sig
  FROM pages
),
ordered AS (
  SELECT doc_id, canonical_url, sig,
         lag(sig) OVER (PARTITION BY canonical_url
                        ORDER BY warc_ts, doc_id) AS prev_sig
  FROM canon
)
SELECT doc_id, canonical_url,
       CASE WHEN prev_sig IS NULL THEN 'new'
            WHEN sig <> prev_sig THEN 'changed'
            ELSE 'unchanged' END AS status
FROM ordered
"""


def queries() -> dict[str, Callable]:
    return {
        "url_dedup": q_url_dedup,
        "host_stats": q_host_stats,
        "bm25_top10": q_bm25_top10,
        "rrf_fusion": q_rrf_fusion,
        "decontam": q_decontam,
        "crawl_cdc": q_crawl_cdc,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "url_dedup": SQL_URL_DEDUP,
        "host_stats": SQL_HOST_STATS,
        "bm25_top10": _sql_bm25(),
        "rrf_fusion": _sql_rrf(),
        "decontam": SQL_DECONTAM,
        "crawl_cdc": SQL_CRAWL_CDC,
    }
