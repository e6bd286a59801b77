"""Driver-facing query catalog: Ray pipelines + DuckDB oracle SQL.

Each entry runs over the driver's read-only tables (`documents`,
`embeddings`, ...) in ``sf_dir`` and has a matching ANSI-SQL oracle producing
identical rows (same column NAMES and values) — the driver's correctness gate.
Entries without an oracle (full KG build, LSH dedup, language-ID) get the
driver's weaker rows-only check and are additionally pinned by the in-repo
parity/golden tests.

The SQL-checked KG queries restrict to single-chunk documents (token count ≤
chunk stride) because token-window overlap is not expressible in SQL; the
multi-chunk path is covered by the golden-pipeline tests.  All Ray sides run
the REAL kernels (tokenizer → chunker → extractor → parser), not closed forms.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pyarrow as pa

from lightrag_ray.config import PipelineConfig
from lightrag_ray.functions.chunking import chunk_text
from lightrag_ray.functions.parse import parse_extraction_result
from lightrag_ray.functions.text import md5_hex
from lightrag_ray.functions.tokenizer import default_tokenizer
from lightrag_ray.stages.extract import RuleExtractor

CFG = PipelineConfig()
_STRIDE = CFG.chunk_token_size - CFG.chunk_overlap_token_size  # 1100

STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")


def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# chunk statistics (real chunker per doc)


class _DocChunkStats:
    def __init__(self):
        self.tokenizer = default_tokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n_tokens, n_chunks = [], []
        for t in texts:
            t = t or ""
            toks = self.tokenizer.encode(t)
            chunks = chunk_text(self.tokenizer, t) if t.strip() else []
            n_tokens.append(len(toks) if t.strip() else 0)
            n_chunks.append(len([c for c in chunks if c["content"]]))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_chunks": pa.array(n_chunks, pa.int64()),
            }
        )


def q_doc_chunk_stats(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _DocChunkStats, batch_format="pyarrow", zero_copy_batch=True, concurrency=2
    )


SQL_DOC_CHUNK_STATS = rf"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+')) AS n_tokens,
       CAST(ceil(len(regexp_extract_all(text, '\S+')) / {_STRIDE}.0) AS BIGINT)
           AS n_chunks
FROM documents
"""


# ---------------------------------------------------------------------------
# single-chunk KG queries (real extract+parse path)


class _DocMentions:
    """documents → (doc_id, kind, name, tgt) mention rows, single-chunk docs
    only (token count ≤ stride)."""

    def __init__(self):
        self.tokenizer = default_tokenizer()
        self.extractor = RuleExtractor(
            max_entities=CFG.max_extraction_entities,
            max_records=CFG.max_extraction_records,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "kind": [], "name": [], "tgt": []}
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        for doc_id, text in zip(doc_ids, texts):
            text = (text or "").strip()
            if not text or len(self.tokenizer.encode(text)) > _STRIDE:
                continue
            chunks = chunk_text(self.tokenizer, text)
            assert len(chunks) == 1
            result = self.extractor.extract(chunks[0]["content"], f"{doc_id}", 0, "")
            entities, relations = parse_extraction_result(
                result, chunk_key=str(doc_id), timestamp=0, file_path=str(doc_id)
            )
            for e in entities:
                out["doc_id"].append(doc_id)
                out["kind"].append("e")
                out["name"].append(e.entity_name)
                out["tgt"].append("")
            for r in relations:
                a, b = sorted((r.src_id, r.tgt_id))
                out["doc_id"].append(doc_id)
                out["kind"].append("r")
                out["name"].append(a)
                out["tgt"].append(b)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "kind": pa.array(out["kind"], pa.string()),
                "name": pa.array(out["name"], pa.string()),
                "tgt": pa.array(out["tgt"], pa.string()),
            }
        )


def _mentions_ds(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _DocMentions, batch_format="pyarrow", zero_copy_batch=True, concurrency=2
    )


def q_entity_mentions(sf_dir: str):
    import pyarrow.compute as pc

    return _mentions_ds(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "e")).select(["doc_id", "name"])
        .rename_columns(["doc_id", "entity_name"]),
        batch_format="pyarrow",
    )


_SQL_WORDS_1CHUNK = rf"""
  words AS (
    SELECT doc_id,
           unnest(regexp_extract_all(text, '\w+')) AS word,
           generate_subscripts(regexp_extract_all(text, '\w+'), 1) AS pos
    FROM documents
    WHERE len(regexp_extract_all(text, '\S+')) BETWEEN 1 AND {_STRIDE}
  ),
  firsts AS (
    SELECT doc_id, word, min(pos) AS first_pos
    FROM words WHERE length(word) >= 5
    GROUP BY doc_id, word
  ),
  ranked AS (
    SELECT doc_id, word, first_pos,
           row_number() OVER (PARTITION BY doc_id ORDER BY first_pos) AS rk
    FROM firsts
  ),
  ents AS (
    SELECT doc_id, word, first_pos, rk FROM ranked WHERE rk <= {CFG.max_extraction_entities}
  )
"""

SQL_ENTITY_MENTIONS = f"""
WITH {_SQL_WORDS_1CHUNK}
SELECT doc_id, word AS entity_name FROM ents
"""


def q_kg_nodes_simple(sf_dir: str):
    import pyarrow.compute as pc

    ents = _mentions_ds(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "e")), batch_format="pyarrow"
    )
    from ray.data.aggregate import Count

    agg = ents.groupby("name").aggregate(Count(alias_name="n_mentions"))
    return agg.map_batches(
        lambda t: t.rename_columns(["entity_name", "n_mentions"]),
        batch_format="pyarrow",
    )


SQL_KG_NODES_SIMPLE = f"""
WITH {_SQL_WORDS_1CHUNK}
SELECT word AS entity_name, count(*) AS n_mentions FROM ents GROUP BY word
"""


def q_kg_edges_simple(sf_dir: str):
    import pyarrow.compute as pc

    rels = _mentions_ds(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "r")), batch_format="pyarrow"
    )
    from ray.data.aggregate import Count

    agg = rels.groupby(["name", "tgt"]).aggregate(Count(alias_name="weight"))
    return agg.map_batches(
        lambda t: t.rename_columns(["src_id", "tgt_id", "weight"]),
        batch_format="pyarrow",
    )


SQL_KG_EDGES_SIMPLE = f"""
WITH {_SQL_WORDS_1CHUNK},
pairs AS (
  SELECT doc_id, word AS a,
         lead(word) OVER (PARTITION BY doc_id ORDER BY first_pos) AS b
  FROM ents
)
SELECT least(a, b) AS src_id, greatest(a, b) AS tgt_id, count(*) AS weight
FROM pairs WHERE b IS NOT NULL AND a <> b
GROUP BY 1, 2
"""


_COOC_BUCKETS = 64


def _name_bucket(names, buckets: int = _COOC_BUCKETS) -> "pa.Array":
    """Deterministic md5-based bucket per entity name — internal transport
    only (the oracle never sees it), cached over the batch's unique names."""
    import hashlib

    uniq: dict[str, int] = {}
    out = np.empty(len(names), np.int32)
    for i, s in enumerate(names):
        b = uniq.get(s)
        if b is None:
            b = int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big") % buckets
            uniq[s] = b
        out[i] = b
    return pa.array(out, pa.int32())


def q_entity_cooc_pmi(sf_dir: str):
    """Corpus-wide entity co-occurrence PMI — the "how related are these two
    entities" signal behind LightRAG's relation weighting (cf.
    lightrag/operate.py edge weight accumulation), computed document-wise:
    for every unordered entity pair extracted in the same document,
    ``n_docs_both`` and the whole-bit positive PMI
    ``bits(n_ab) + bits(T) − bits(n_a) − bits(n_b)`` (clamped at 0) — the
    integer-exact PMI idiom shared with walk_ppmi so the DuckDB oracle
    hash-matches bit for bit.

    Scale shape: mentions are per-doc distinct and never split across
    batches, so PAIR GENERATION is batch-local (np.triu per doc slice, ≤
    C(cap,2) pairs/doc) with an in-batch combiner; one pair groupby and one
    name groupby (both vocab-bounded), then marginals attach via two
    bucketed cogroups of (marginal ∪ pair) rows — the walk_ppmi transport,
    never a row-count-coupled join."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from lightrag_ray.extras.webquality import _bit_length_u64

    ment = (
        _mentions_ds(sf_dir)
        .map_batches(
            lambda t: t.filter(pc.equal(t["kind"], "e")).select(["doc_id", "name"]),
            batch_format="pyarrow",
        )
        .materialize()  # narrow (doc_id, name); read for T, marginals, pairs
    )

    # T: docs with ≥1 entity.  Mentions for one doc never split across
    # batches (per-__call__ emission), so per-batch distinct counts sum.
    def distinct_docs(batch: pa.Table) -> pa.Table:
        n = len(np.unique(np.asarray(batch.column("doc_id"), np.int64)))
        return pa.table({"n": pa.array([n], pa.int64())})

    t_total = int(
        ment.map_batches(distinct_docs, batch_format="pyarrow").sum("n") or 0
    )
    bits_t = t_total.bit_length()

    # per-entity doc counts (rows are per-doc distinct already)
    from ray.data.aggregate import Count

    na = ment.groupby("name").aggregate(Count(alias_name="c"))

    # batch-local unordered pair generation + in-batch combiner
    def gen_pairs(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        names = np.asarray(batch.column("name"), object)
        order = np.argsort(ids, kind="stable")
        ids, names = ids[order], names[order]
        starts = np.flatnonzero(np.concatenate(([True], ids[1:] != ids[:-1])))
        bounds = np.concatenate((starts, [len(ids)]))
        agg: dict[tuple, int] = {}
        for k in range(len(starts)):
            doc_names = np.sort(names[bounds[k] : bounds[k + 1]])
            iu, ju = np.triu_indices(len(doc_names), k=1)
            for a, b in zip(doc_names[iu], doc_names[ju]):
                key = (a, b)
                agg[key] = agg.get(key, 0) + 1
        keys = sorted(agg)
        return pa.table(
            {
                "a": pa.array([k[0] for k in keys], pa.string()),
                "b": pa.array([k[1] for k in keys], pa.string()),
                "n": pa.array([agg[k] for k in keys], pa.int64()),
            }
        )

    pairs = (
        ment.map_batches(gen_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .aggregate(Sum("n", alias_name="n_docs_both"))
    )

    # attach marginals: union (marginal ∪ pair) rows cogrouped per name
    # bucket — the walk_ppmi transport, two bounded exchanges
    UNION_SCHEMA = pa.schema(
        [("bucket", pa.int32()), ("key", pa.string()), ("other", pa.string()),
         ("n", pa.int64()), ("c", pa.int64()), ("ca", pa.int64())]
    )

    def marg_rows(batch: pa.Table) -> pa.Table:
        names = batch.column("name").to_pylist()
        return pa.table(
            {
                "bucket": _name_bucket(names),
                "key": pa.array(names, pa.string()),
                "other": pa.nulls(len(names), pa.string()),
                "n": pa.nulls(len(names), pa.int64()),
                "c": batch.column("c").cast(pa.int64()),
                "ca": pa.nulls(len(names), pa.int64()),
            },
            schema=UNION_SCHEMA,
        )

    def pair_rows_a(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_pylist()
        return pa.table(
            {
                "bucket": _name_bucket(a),
                "key": pa.array(a, pa.string()),
                "other": batch.column("b"),
                "n": batch.column("n_docs_both").cast(pa.int64()),
                "c": pa.nulls(len(a), pa.int64()),
                "ca": pa.nulls(len(a), pa.int64()),
            },
            schema=UNION_SCHEMA,
        )

    def attach(group: pd.DataFrame) -> pa.Table:
        # pass 1: attach ca = doc count of the `a` endpoint, then re-key the
        # pair row on its OTHER endpoint (b) for the second cogroup
        is_marg = group["c"].notna().to_numpy()
        cmap = dict(
            zip(group["key"].to_numpy(object)[is_marg],
                group["c"].to_numpy(object)[is_marg])
        )
        rows = group[~is_marg]
        if not len(rows):
            return UNION_SCHEMA.empty_table()
        keys = rows["key"].to_numpy(object)
        looked = np.array([int(cmap[k]) for k in keys], np.int64)
        out_key = [str(k) for k in rows["other"].to_numpy(object)]
        return pa.table(
            {
                "bucket": _name_bucket(out_key),
                "key": pa.array(out_key, pa.string()),
                "other": pa.array([str(k) for k in keys], pa.string()),
                "n": pa.array(rows["n"].to_numpy(np.int64), pa.int64()),
                "c": pa.nulls(len(rows), pa.int64()),
                "ca": pa.array(looked, pa.int64()),
            },
            schema=UNION_SCHEMA,
        )

    def attach_final(group: pd.DataFrame) -> pa.Table:
        is_marg = group["c"].notna().to_numpy()
        cmap = dict(
            zip(group["key"].to_numpy(object)[is_marg],
                group["c"].to_numpy(object)[is_marg])
        )
        rows = group[~is_marg]
        if not len(rows):
            return pa.schema(
                [("entity_a", pa.string()), ("entity_b", pa.string()),
                 ("n_docs_both", pa.int64()), ("pmi_bits", pa.int64())]
            ).empty_table()
        keys = rows["key"].to_numpy(object)  # = b after the re-key
        cb = np.array([int(cmap[k]) for k in keys], np.int64)
        ca = rows["ca"].to_numpy(np.int64)
        n = rows["n"].to_numpy(np.int64)
        bits = (
            _bit_length_u64(n).astype(np.int64)
            + bits_t
            - _bit_length_u64(ca).astype(np.int64)
            - _bit_length_u64(cb).astype(np.int64)
        )
        return pa.table(
            {
                "entity_a": pa.array(
                    [str(x) for x in rows["other"].to_numpy(object)], pa.string()
                ),
                "entity_b": pa.array([str(k) for k in keys], pa.string()),
                "n_docs_both": pa.array(n, pa.int64()),
                "pmi_bits": pa.array(np.maximum(bits, 0), pa.int64()),
            }
        )

    marg = na.map_batches(marg_rows, batch_format="pyarrow")
    leg1 = (
        marg.union(pairs.map_batches(pair_rows_a, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(attach, batch_format="pandas")
    )
    return (
        marg.union(leg1)
        .groupby("bucket")
        .map_groups(attach_final, batch_format="pandas")
    )


def _one_edit_leq(a: str, b: str) -> bool:
    """Exact ``levenshtein(a, b) <= 1`` — the DuckDB oracle's predicate,
    implemented directly (equal; one substitution; or one insertion) so the
    Ray side never needs a DP table."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def _entity_vocab_ds(sf_dir: str):
    from ray.data.aggregate import Count

    return (
        q_entity_mentions(sf_dir)
        .groupby("entity_name")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["entity_name"])
    )


def q_entity_aliases(sf_dir: str):
    """Fuzzy alias candidates over the extracted entity vocabulary — the
    blocking step of entity linking (cf. the reference's exact
    normalize-then-merge in lightrag/operate.py: this finds the near-miss
    names normalization cannot unify).  Pairs with the SAME FIRST CHARACTER,
    length difference ≤ 1 and levenshtein ≤ 1, emitted once (name_a <
    name_b).

    The first-char block is the recall/scale tradeoff (a leading-char edit
    is not found) and is IDENTICAL in the oracle, so parity holds.  Scale:
    the vocabulary groupby is vocab-bounded; within a block the comparison
    is restricted to equal and ±1 lengths (sorted slices), so cost is
    Σ n_l·(n_l + n_{l+1}) per block — salt a pathological block on
    (first_char, length) if a real vocabulary ever concentrates."""
    return _aliases_from_vocab(_entity_vocab_ds(sf_dir))


def _aliases_from_vocab(vocab_ds):
    import pandas as pd

    def block_key(batch: pa.Table) -> pa.Table:
        names = batch.column("entity_name").to_pylist()
        return pa.table(
            {
                "blk": pa.array([n[:1] for n in names], pa.string()),
                "name": pa.array(names, pa.string()),
            }
        )

    def pairs_in_block(group: pd.DataFrame) -> pa.Table:
        names = sorted(group["name"].tolist())
        by_len: dict[int, list] = {}
        for n in names:
            by_len.setdefault(len(n), []).append(n)
        out_a, out_b = [], []
        for ln, bucket in by_len.items():
            for cand in (bucket, by_len.get(ln + 1, [])):
                for a in bucket:
                    for b in cand:
                        if a < b and _one_edit_leq(a, b):
                            out_a.append(a)
                            out_b.append(b)
        return pa.table(
            {
                "name_a": pa.array(out_a, pa.string()),
                "name_b": pa.array(out_b, pa.string()),
            }
        )

    return (
        vocab_ds.map_batches(block_key, batch_format="pyarrow")
        .groupby("blk")
        .map_groups(pairs_in_block, batch_format="pandas")
    )


_SQL_ALIAS_CTES = f"""{_SQL_WORDS_1CHUNK},
v AS (SELECT DISTINCT word AS name FROM ents),
al AS (
  SELECT a.name AS name_a, b.name AS name_b
  FROM v a JOIN v b
    ON substr(a.name, 1, 1) = substr(b.name, 1, 1)
   AND abs(length(a.name) - length(b.name)) <= 1
   AND a.name < b.name
  WHERE levenshtein(a.name, b.name) <= 1
)"""

SQL_ENTITY_ALIASES = f"""
WITH {_SQL_ALIAS_CTES}
SELECT name_a, name_b FROM al
"""


def q_entity_resolution(sf_dir: str):
    """Entity linking: connected components over the alias-pair graph, each
    component resolved to its lexicographically smallest member; every
    vocabulary name maps to its canonical form (itself when un-aliased) —
    the step that turns near-miss surface forms into one graph node.

    Transport: alias names get deterministic md5-63-bit ids for the
    bucketed CC engine (``extras/dedup.connected_components``), with an
    EXPLICIT injectivity check (distinct-name count per id — a collision
    raises instead of silently merging strangers; P(collision) ≈ V²/2⁶⁴).
    The id↔name map and the label table are alias-graph-bounded (names
    within one edit of another name are a small fraction of any real
    vocabulary); the final vocab-wide resolve is a bucketed cogroup of
    (map ∪ vocab) rows — no broadcast."""
    import pandas as pd
    from ray.data.aggregate import Count

    from lightrag_ray.extras.dedup import connected_components

    vocab = _entity_vocab_ds(sf_dir).materialize()  # names only, vocab-bounded
    aliases = _aliases_from_vocab(vocab).materialize()

    def to_ids(batch: pa.Table) -> pa.Table:
        import hashlib  # noqa: F811 — worker-side

        a = batch.column("name_a").to_pylist()
        b = batch.column("name_b").to_pylist()

        def hid(n):
            return int.from_bytes(hashlib.md5(n.encode()).digest()[:8], "big") >> 1

        return pa.table(
            {
                "doc_a": pa.array([hid(x) for x in a], pa.int64()),
                "doc_b": pa.array([hid(x) for x in b], pa.int64()),
            }
        )

    def id_name_rows(batch: pa.Table) -> pa.Table:
        import hashlib  # noqa: F811 — worker-side

        names = set(batch.column("name_a").to_pylist()) | set(
            batch.column("name_b").to_pylist()
        )
        names = sorted(names)

        def hid(n):
            return int.from_bytes(hashlib.md5(n.encode()).digest()[:8], "big") >> 1

        return pa.table(
            {
                "id": pa.array([hid(n) for n in names], pa.int64()),
                "name": pa.array(names, pa.string()),
            }
        )

    id_name = (
        aliases.map_batches(id_name_rows, batch_format="pyarrow")
        .groupby(["id", "name"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["id", "name"])
        .materialize()
    )
    # injectivity guard: an md5-63 collision would silently merge two
    # unrelated components — detect and raise instead
    from ray.data.aggregate import Count as _Count

    bad = (
        id_name.groupby("id")
        .aggregate(_Count(alias_name="n_names"))
        .filter(lambda r: r["n_names"] > 1)
        .count()
    )
    if bad:
        raise RuntimeError(
            "entity_resolution: md5-63 id collision across distinct names"
        )

    labels = connected_components(
        aliases.map_batches(to_ids, batch_format="pyarrow")
    )

    # canonical per component = min member NAME: label rows cogrouped with
    # the id→name map per id-hash bucket, then min-name per label
    import numpy as np

    def tag_id(batch: pa.Table, col: str) -> pa.Table:
        ids = np.asarray(batch.column(col), np.int64)
        t = batch.rename_columns(
            [c if c != col else "id" for c in batch.column_names]
        )
        return t.append_column(
            "bucket", pa.array((ids % 64).astype(np.int32), pa.int32())
        )

    def join_names(group: pd.DataFrame) -> pa.Table:
        have_name = group["name"].notna().to_numpy()
        nmap = dict(
            zip(group["id"].to_numpy(object)[have_name],
                group["name"].to_numpy(object)[have_name])
        )
        rows = group[~have_name]
        if not len(rows):
            return pa.schema(
                [("label", pa.int64()), ("name", pa.string())]
            ).empty_table()
        return pa.table(
            {
                "label": pa.array(rows["label"].to_numpy(np.int64), pa.int64()),
                "name": pa.array(
                    [str(nmap[i]) for i in rows["id"].to_numpy(object)],
                    pa.string(),
                ),
            }
        )

    def as_union(batch: pa.Table, with_label: bool) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "bucket": batch.column("bucket"),
                "id": batch.column("id"),
                "label": batch.column("label")
                if with_label
                else pa.nulls(n, pa.int64()),
                "name": pa.nulls(n, pa.string())
                if with_label
                else batch.column("name"),
            }
        )

    from ray.data.aggregate import Min

    named = (
        id_name.map_batches(
            lambda b: as_union(tag_id(b, "id"), False), batch_format="pyarrow"
        )
        .union(
            labels.map_batches(
                lambda b: as_union(tag_id(b, "node"), True),
                batch_format="pyarrow",
            )
        )
        .groupby("bucket")
        .map_groups(join_names, batch_format="pandas")
    )
    canon = named.groupby("label").aggregate(Min("name", alias_name="canonical"))

    # label → canonical joined back to members, then the vocab-wide resolve
    def relabel(group: pd.DataFrame) -> pa.Table:
        has_canon = group["canonical"].notna().to_numpy()
        cmap = dict(
            zip(group["label"].to_numpy(object)[has_canon],
                group["canonical"].to_numpy(object)[has_canon])
        )
        rows = group[~has_canon]
        if not len(rows):
            return pa.schema(
                [("name", pa.string()), ("canonical", pa.string())]
            ).empty_table()
        return pa.table(
            {
                "name": pa.array(
                    [str(x) for x in rows["name"].to_numpy(object)], pa.string()
                ),
                "canonical": pa.array(
                    [str(cmap[l]) for l in rows["label"].to_numpy(object)],
                    pa.string(),
                ),
            }
        )

    def canon_union(batch: pa.Table, is_canon: bool) -> pa.Table:
        n = batch.num_rows
        lab = np.asarray(batch.column("label"), np.int64)
        return pa.table(
            {
                "bucket": pa.array((lab % 64).astype(np.int32), pa.int32()),
                "label": batch.column("label"),
                "name": pa.nulls(n, pa.string())
                if is_canon
                else batch.column("name"),
                "canonical": batch.column("canonical")
                if is_canon
                else pa.nulls(n, pa.string()),
            }
        )

    name_canon = (
        canon.map_batches(lambda b: canon_union(b, True), batch_format="pyarrow")
        .union(
            named.map_batches(
                lambda b: canon_union(b, False), batch_format="pyarrow"
            )
        )
        .groupby("bucket")
        .map_groups(relabel, batch_format="pandas")
        .materialize()  # alias-graph-bounded
    )

    # vocab-wide resolve: (alias map ∪ vocabulary) cogrouped per name hash
    def vocab_union(batch: pa.Table, is_map: bool) -> pa.Table:
        import hashlib  # noqa: F811 — worker-side

        col = "name" if is_map else "entity_name"
        names = batch.column(col).to_pylist()
        bk = [
            int.from_bytes(hashlib.md5(n.encode()).digest()[:4], "big") % 64
            for n in names
        ]
        n = batch.num_rows
        return pa.table(
            {
                "bucket": pa.array(bk, pa.int32()),
                "name": pa.array(names, pa.string()),
                "canonical": batch.column("canonical")
                if is_map
                else pa.nulls(n, pa.string()),
            }
        )

    def resolve(group: pd.DataFrame) -> pa.Table:
        has_map = group["canonical"].notna().to_numpy()
        cmap = dict(
            zip(group["name"].to_numpy(object)[has_map],
                group["canonical"].to_numpy(object)[has_map])
        )
        rows = group[~has_map]
        if not len(rows):
            return pa.schema(
                [("entity_name", pa.string()), ("canonical_name", pa.string())]
            ).empty_table()
        names = [str(x) for x in rows["name"].to_numpy(object)]
        return pa.table(
            {
                "entity_name": pa.array(names, pa.string()),
                "canonical_name": pa.array(
                    [str(cmap.get(n, n)) for n in names], pa.string()
                ),
            }
        )

    return (
        name_canon.map_batches(
            lambda b: vocab_union(b, True), batch_format="pyarrow"
        )
        .union(
            vocab.map_batches(
                lambda b: vocab_union(b, False), batch_format="pyarrow"
            )
        )
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
    )


SQL_ENTITY_RESOLUTION = f"""
WITH RECURSIVE {_SQL_ALIAS_CTES},
adj AS (
  SELECT name_a AS node, name_b AS nbr FROM al
  UNION ALL SELECT name_b, name_a FROM al
),
cc(node, label) AS (
  SELECT node, node FROM (SELECT DISTINCT node FROM adj)
  UNION
  SELECT adj.node, cc.label FROM cc JOIN adj ON adj.nbr = cc.node
),
canon AS (SELECT node AS name, min(label) AS canonical FROM cc GROUP BY node)
SELECT v.name AS entity_name, coalesce(canon.canonical, v.name) AS canonical_name
FROM v LEFT JOIN canon ON v.name = canon.name
"""


SQL_ENTITY_COOC_PMI = f"""
WITH {_SQL_WORDS_1CHUNK},
m AS (SELECT DISTINCT doc_id, word AS name FROM ents),
prs AS (
  SELECT a.name AS entity_a, b.name AS entity_b, count(*)::BIGINT AS n_docs_both
  FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.name < b.name
  GROUP BY 1, 2
),
na AS (SELECT name, count(*)::BIGINT AS c FROM m GROUP BY name),
tot AS (SELECT count(DISTINCT doc_id)::BIGINT AS t FROM m)
SELECT p.entity_a, p.entity_b, p.n_docs_both,
       greatest(0, length(bin(p.n_docs_both)) + length(bin((SELECT t FROM tot)))
                 - length(bin(na1.c)) - length(bin(na2.c)))::BIGINT AS pmi_bits
FROM prs p
JOIN na na1 ON p.entity_a = na1.name
JOIN na na2 ON p.entity_b = na2.name
"""


# ---------------------------------------------------------------------------
# dedup / fingerprints


def q_exact_dedup(sf_dir: str):
    def hash_batch(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "content_hash": pa.array([md5_hex(t or "") for t in texts]),
                "doc_id": batch.column("doc_id"),
            }
        )

    from ray.data.aggregate import Count, Min

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        hash_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return ds.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="rep_doc_id"), Count(alias_name="n_copies")
    )


SQL_EXACT_DEDUP = """
SELECT md5(text) AS content_hash, min(doc_id) AS rep_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY 1
"""


def q_doc_fingerprint(sf_dir: str):
    import re

    ws = re.compile(r"\s+")

    def fp_batch(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        fps = [md5_hex(ws.sub(" ", (t or "").strip().lower())) for t in texts]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "fingerprint": pa.array(fps)}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fp_batch, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_DOC_FINGERPRINT = r"""
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
FROM documents
"""


# ---------------------------------------------------------------------------
# text quality stats


def q_text_quality(sf_dir: str):
    import re

    word_re = re.compile(r"\w+")
    stop = set(STOPWORDS)

    def quality(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_words, n_uniq, n_stop = [], [], []
        for t in texts:
            words = word_re.findall(t or "")
            n_words.append(len(words))
            n_uniq.append(len(set(words)))
            n_stop.append(sum(1 for w in words if w in stop))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(n_words, pa.int64()),
                "n_uniq_words": pa.array(n_uniq, pa.int64()),
                "n_stopwords": pa.array(n_stop, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        quality, batch_format="pyarrow", zero_copy_batch=True
    )


SQL_TEXT_QUALITY = rf"""
SELECT doc_id,
       len(regexp_extract_all(text, '\w+')) AS n_words,
       len(list_distinct(regexp_extract_all(text, '\w+'))) AS n_uniq_words,
       len(list_filter(regexp_extract_all(text, '\w+'),
                       w -> w IN {STOPWORDS!r})) AS n_stopwords
FROM documents
"""


def q_lang_distribution(sf_dir: str):
    from ray.data.aggregate import Count

    return _docs(sf_dir, ["lang"]).groupby("lang").aggregate(
        Count(alias_name="n_docs")
    )


SQL_LANG_DISTRIBUTION = "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang"


# ---------------------------------------------------------------------------
# similarity search: brute-force cosine top-k (the baseline ANN path)


def q_knn_top10(sf_dir: str):
    """Top-10 cosine neighbors of vec_id 0: the query vector is broadcast via
    ray.put once; each batch does one float64 matmul."""
    import ray
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    import pyarrow.parquet as pq

    q_table = pq.read_table(path, columns=["vec_id", "embedding"])
    q_vec = None
    for batch in q_table.to_batches():
        ids = batch.column("vec_id").to_pylist()
        if 0 in ids:
            q_vec = np.array(
                batch.column("embedding")[ids.index(0)].as_py(), dtype=np.float64
            )
            break
    q_ref = ray.put(q_vec / np.linalg.norm(q_vec))

    def score(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = np.asarray(batch.column("vec_id"))
        mat = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        sims = (mat @ q) / np.where(norms == 0, 1.0, norms)
        keep = ids != 0
        return pa.table(
            {
                "vec_id": pa.array(ids[keep], pa.int64()),
                "sim": pa.array(np.round(sims[keep], 4), pa.float64()),
            }
        )

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["sim", "vec_id"], descending=[True, False]
    ).limit(10)


SQL_KNN_TOP10 = """
SELECT e.vec_id,
       round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4)
           AS sim
FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
WHERE e.vec_id <> 0
ORDER BY sim DESC, e.vec_id
LIMIT 10
"""


# ---------------------------------------------------------------------------
# catalog


def queries() -> dict[str, Callable]:
    return {
        "doc_chunk_stats": q_doc_chunk_stats,
        "entity_mentions": q_entity_mentions,
        "kg_nodes_simple": q_kg_nodes_simple,
        "kg_edges_simple": q_kg_edges_simple,
        "entity_cooc_pmi": q_entity_cooc_pmi,
        # entity_aliases is API-only: the synthetic vocabulary has no
        # one-edit pairs, so the driver entry would always be empty (and an
        # empty Dataset→pandas drops columns, reading as a schema mismatch);
        # the pair kernel is exercised through entity_resolution and pinned
        # on crafted corpora in tests/test_text_kernels.py
        "entity_resolution": q_entity_resolution,
        "exact_dedup": q_exact_dedup,
        "doc_fingerprint": q_doc_fingerprint,
        "text_quality": q_text_quality,
        "lang_distribution": q_lang_distribution,
        "knn_top10": q_knn_top10,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "doc_chunk_stats": SQL_DOC_CHUNK_STATS,
        "entity_mentions": SQL_ENTITY_MENTIONS,
        "kg_nodes_simple": SQL_KG_NODES_SIMPLE,
        "kg_edges_simple": SQL_KG_EDGES_SIMPLE,
        "entity_cooc_pmi": SQL_ENTITY_COOC_PMI,
        "entity_resolution": SQL_ENTITY_RESOLUTION,
        "exact_dedup": SQL_EXACT_DEDUP,
        "doc_fingerprint": SQL_DOC_FINGERPRINT,
        "text_quality": SQL_TEXT_QUALITY,
        "lang_distribution": SQL_LANG_DISTRIBUTION,
        "knn_top10": SQL_KNN_TOP10,
    }
