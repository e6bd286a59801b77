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


def _range_bucket(
    ids: np.ndarray, hi: int, buckets: int = _BUCKETS
) -> np.ndarray:
    """Monotone doc_id → bucket (order-preserving, unlike the hash fold)."""
    return (ids.astype(np.uint64) * buckets // np.uint64(hi + 1)).astype(np.int32)


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


def _bucket_offsets(tok, hi: int, buckets: int = _BUCKETS):
    """Phase 1+2 of the parallel scan: range-bucket the ``(doc_id, n)``
    count table and compute each bucket's EXCLUSIVE starting token offset
    (per-batch combiner → ≤``buckets``-row groupby → O(buckets) driver
    cumsum).  Returns ``(rows, offsets)``: the bucketed rows dataset and the
    per-bucket offset array."""
    from ray.data.aggregate import Sum

    def tag_bucket(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        return pa.table(
            {
                "bucket": pa.array(_range_bucket(ids, hi, buckets), pa.int32()),
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

    # per-bucket token totals → exclusive starting offsets on the driver
    # (≤ _BUCKETS rows — the O(buckets) middle step of the parallel scan).
    def partial_sums(batch: pa.Table) -> pa.Table:
        b = np.asarray(batch.column("bucket"), np.int64)
        n = np.asarray(batch.column("n"), np.int64)
        sums = np.zeros(buckets, np.int64)
        np.add.at(sums, b, n)
        nz = np.flatnonzero(sums)
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "total": pa.array(sums[nz], pa.int64()),
            }
        )

    totals = np.zeros(buckets, np.int64)
    for b in (
        rows.map_batches(partial_sums, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("total", alias_name="total"))
        .iter_batches(batch_format="pyarrow", batch_size=65536)
    ):
        for bkt, tot in zip(
            np.asarray(b.column("bucket"), np.int64),
            np.asarray(b.column("total"), np.int64),
        ):
            totals[bkt] = tot
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))
    return rows, offsets


def pack_counts(tok_ds, base_offset: int = 0):
    """The distributed two-phase prefix scan over a narrow ``(doc_id, n)``
    count table → per-sequence manifest (``seq_id, n_docs, n_tokens,
    first_doc, last_doc``).  Shared by :func:`q_seq_pack` (whole corpus,
    regex counts) and the curated training-shard flagships below (curated
    survivors, regex or learned-BPE counts) — the count table is ~16 B/doc,
    the only thing ever materialized.  ``base_offset`` shifts the whole
    layout (the incremental-append path packs a delta AFTER an existing
    corpus's sequences)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    tok = tok_ds.materialize()  # 16 B/doc — the text itself never lands

    hi_val = tok.max("doc_id") if tok.count() else None
    if hi_val is None:  # empty after curation — empty manifest, stable schema
        return rd.from_arrow(_SEQ_PARTIAL.empty_table())
    hi = int(hi_val)

    rows, offsets = _bucket_offsets(tok, hi)
    off_ref = ray.put(offsets + base_offset)

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
    from lightrag_ray.extras.catalog import _filter_noncanonical, q_dup_clusters

    merges, _stats = bpe_train.train_bpe(sf_dir, n_merges=n_merges)
    ranks_ref = ray.put(bpe_train.merges_to_ranks(merges))

    corpus = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    counts = _filter_noncanonical(corpus, q_dup_clusters(sf_dir)).map_batches(
        _CurateEncodeCounts,
        fn_constructor_args=(ranks_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    return pack_counts(counts)


def _passes_curation(text: str) -> bool:
    """The curation gates of :func:`catalog._curated_corpus`, shared by the
    counting and assembly passes so both see the SAME survivor set."""
    from lightrag_ray.extras.catalog import CURATE_MIN_UNIQ_RATIO, CURATE_MIN_WORDS
    from lightrag_ray.extras.textstats import _WORD_RE, predict_lang

    words = _WORD_RE.findall(text)
    nw = len(words)
    if nw < CURATE_MIN_WORDS:
        return False
    if len(set(words)) / nw < CURATE_MIN_UNIQ_RATIO:
        return False
    return predict_lang(text)[0] != "und"


class _CurateEncodeCounts:
    """Actor-pool stage: curation gates + learned-BPE token COUNT per
    surviving document — the narrow phase-1 pass of the shard flow.  The
    tokenizer is rebuilt once per actor from the broadcast rank table."""

    def __init__(self, ranks_ref):
        import ray

        from lightrag_ray.functions.tokenizer import BPETokenizer

        self._tok = BPETokenizer(ranks=ray.get(ranks_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        keep_ids, keep_n = [], []
        for doc_id, text in zip(ids, texts):
            text = text or ""
            if not _passes_curation(text):
                continue
            keep_ids.append(doc_id)
            keep_n.append(len(self._tok.encode(text)))
        return pa.table(
            {
                "doc_id": pa.array(keep_ids, pa.int64()),
                "n": pa.array(keep_n, pa.int64()),
            }
        )


SEQS_PER_SHARD = 1024


def write_training_shards(
    sf_dir: str,
    out_dir: str,
    n_merges: int = 200,
    seqs_per_shard: int = SEQS_PER_SHARD,
) -> dict:
    """Materialize the curated corpus as REAL training shards: fixed-length
    ``SEQ_LEN`` sequences of learned-BPE token ids, written as Hive-
    partitioned Parquet (one ``shard=K`` directory per ``seqs_per_shard``
    consecutive sequences) plus a per-shard ``lineage.parquet`` and a done
    marker — the resumable sink of the training-data flow (the manifest
    flagships above only SIZE the shards; this writes them).

    Two streamed corpus passes, no corpus-sized driver state:

    1. curate + learned-BPE COUNT per survivor (16 B/doc) → per-bucket
       starting token offsets via the two-phase scan (`_bucket_offsets`).
    2. the corpus streams again through a per-bucket assembly `map_groups`:
       each range bucket re-runs the gates + encode in doc order (both
       passes share :func:`_passes_curation` and the broadcast rank table,
       so the survivor sets are identical), lays its token stream out from
       the bucket's broadcast start offset, and emits COMPLETE sequences
       straight into the partitioned Parquet sink — the token mass is never
       materialized or shuffled.  The ≤2 partial fragments at each bucket
       edge (≤ 2×``_BUCKETS`` rows total, ~1 MB) go to a small collector
       actor keyed by bucket (idempotent under task retry); the driver
       merges them and appends one extra file per affected shard.

    The final (globally last) sequence may be shorter than ``SEQ_LEN`` — it
    is written and flagged in the returned totals, the convention a shard
    consumer expects.  Resume: if the done marker exists with the same
    params the write is skipped and the recorded totals returned (the unit
    is idempotent — same model as pipelines/kg_build).
    """
    import json
    import shutil

    import pandas as pd
    import ray
    import ray.data as rd

    from lightrag_ray.extras import bpe_train
    from lightrag_ray.extras.catalog import _filter_noncanonical, q_dup_clusters

    params = {"sf_dir": sf_dir, "n_merges": n_merges, "seq_len": SEQ_LEN,
              "seqs_per_shard": seqs_per_shard}
    marker = os.path.join(out_dir, "_manifest", "done.json")
    if os.path.exists(marker):
        with open(marker) as f:
            meta = json.load(f)
        if meta.get("params") == params:
            return meta
        shutil.rmtree(out_dir, ignore_errors=True)  # params changed: rebuild

    merges, _stats = bpe_train.train_bpe(sf_dir, n_merges=n_merges)
    ranks_ref = ray.put(bpe_train.merges_to_ranks(merges))

    # `hi` must be identical in both passes: the RAW corpus doc-id max
    # (survivor-independent), read from the pruned single-column scan.
    pages = os.path.join(sf_dir, "documents.parquet")
    hi = int(rd.read_parquet(pages, columns=["doc_id"]).max("doc_id"))

    # materialize the CLUSTERS (one skinny row per duplicate doc), never the
    # corpus text — both passes re-read the pages and re-apply the cheap
    # broadcast/anti-join canonical gate against the same cluster table
    clusters = q_dup_clusters(sf_dir).materialize()

    shards_dir = os.path.join(out_dir, "shards")
    lineage_dir = os.path.join(out_dir, "lineage.parquet")
    n_docs_total, n_tokens_total = _pack_write_pass(
        pages, clusters, ranks_ref, hi, 0, shards_dir, lineage_dir,
        seqs_per_shard, "edge_sequences.parquet",
    )
    if n_docs_total == 0:
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        meta = {"params": params, "n_seqs": 0, "n_docs": 0, "n_tokens": 0,
                "n_shards": 0, "out_dir": out_dir, "ragged_tail": False,
                "appends": []}
        with open(marker, "w") as f:
            json.dump(meta, f)
        return meta

    vocab_path = os.path.join(out_dir, "vocab.tiktoken")
    bpe_train.write_tiktoken_vocab(bpe_train.merges_to_ranks(merges), vocab_path)

    n_seqs = (n_tokens_total + SEQ_LEN - 1) // SEQ_LEN
    meta = {
        "params": params,
        "n_seqs": int(n_seqs),
        "n_docs": int(n_docs_total),
        "n_tokens": int(n_tokens_total),
        "n_shards": int((n_seqs + seqs_per_shard - 1) // seqs_per_shard),
        "out_dir": out_dir,
        "shards_dir": shards_dir,
        "lineage_dir": lineage_dir,
        "vocab_path": vocab_path,
        "ragged_tail": bool(n_tokens_total % SEQ_LEN),
        "appends": [],
    }
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, marker)  # atomic: the unit is done only once this lands
    return meta


def _path_bytes(path: str) -> int:
    """Total on-disk bytes of a parquet file or directory of files."""
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _pack_write_pass(
    pages: str,
    clusters,
    ranks_ref,
    hi: int,
    base_offset: int,
    shards_dir: str,
    lineage_dir: str,
    seqs_per_shard: int,
    edge_name: str,
) -> tuple[int, int]:
    """The shared two-pass pack-and-write flow of :func:`write_training_shards`
    (``base_offset`` 0) and :func:`append_training_shards` (``base_offset`` =
    existing corpus's sequence-aligned token count).  Writes complete
    sequences + merged edge fragments + lineage rows; returns
    ``(n_docs, n_tokens)`` for the pass (0, 0 if nothing survived)."""
    import pandas as pd
    import ray
    import ray.data as rd

    from lightrag_ray.extras.catalog import _filter_noncanonical

    def curated_corpus():
        return _filter_noncanonical(
            rd.read_parquet(pages, columns=["doc_id", "text"]), clusters
        )

    counts = curated_corpus().map_batches(
        _CurateEncodeCounts,
        fn_constructor_args=(ranks_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    ).materialize()

    n_docs_total = counts.count()
    if n_docs_total == 0:
        return 0, 0

    # The assembly map_groups holds ONE bucket's text per task, so the
    # bucket count must scale with corpus size — a fixed 64 would put
    # corpus/64 bytes in a single task at 100 TB.  Target ~512 MB of
    # on-disk pages per bucket (floor _BUCKETS); the offsets array and the
    # fragment collector stay O(buckets) ≈ O(corpus_bytes / 512 MB).
    n_buckets = max(_BUCKETS, int(_path_bytes(pages) // (512 << 20)) + 1)

    _rows, offsets = _bucket_offsets(counts, hi, n_buckets)
    off_ref = ray.put(offsets + base_offset)
    n_tokens_total = int(counts.sum("n"))

    OUT_SCHEMA = pa.schema(
        [
            ("seq_id", pa.int64()),
            ("n_docs", pa.int64()),
            ("tokens", pa.list_(pa.int32())),
            ("shard", pa.int64()),
        ]
    )

    @ray.remote(num_cpus=0)
    class FragmentCollector:
        """Holds the ≤2 bucket-edge fragments per bucket (~1 MB total).
        Keyed by bucket so a retried assembly task OVERWRITES its own
        fragments instead of double-counting them."""

        def __init__(self):
            self._frags: dict[int, list] = {}

        def put(self, bucket: int, rows: list) -> None:
            self._frags[bucket] = rows

        def all(self) -> list:
            return [r for rows in self._frags.values() for r in rows]

    collector = FragmentCollector.remote()

    def tag_text_bucket(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        return pa.table(
            {
                "bucket": pa.array(_range_bucket(ids, hi, n_buckets), pa.int32()),
                "doc_id": batch.column("doc_id").combine_chunks()
                if hasattr(batch.column("doc_id"), "combine_chunks")
                else batch.column("doc_id"),
                "text": batch.column("text").combine_chunks()
                if hasattr(batch.column("text"), "combine_chunks")
                else batch.column("text"),
            }
        )

    def assemble(group: pd.DataFrame) -> pa.Table:
        from lightrag_ray.functions.tokenizer import BPETokenizer

        tok = BPETokenizer(ranks=ray.get(ranks_ref))
        bucket = int(group["bucket"].iloc[0])
        start = int(ray.get(off_ref)[bucket])
        order = np.argsort(group["doc_id"].to_numpy(np.int64), kind="stable")
        texts = group["text"].to_numpy(object)[order]

        pieces, doc_starts, pos = [], [], start
        for text in texts:
            text = text or ""
            if not _passes_curation(text):
                continue
            ids = tok.encode(text)
            doc_starts.append(pos)
            pieces.append(np.asarray(ids, np.int32))
            pos += len(ids)
        if not pieces:
            ray.get(collector.put.remote(bucket, []))
            return OUT_SCHEMA.empty_table()
        stream = np.concatenate(pieces)
        starts_arr = np.asarray(doc_starts, np.int64)
        end = start + len(stream)

        out_seq, out_ndocs, out_tokens, frag_rows = [], [], [], []
        s0, s1 = start // SEQ_LEN, (end - 1) // SEQ_LEN
        for s in range(s0, s1 + 1):
            lo, hi_tok = max(start, s * SEQ_LEN), min(end, (s + 1) * SEQ_LEN)
            piece = stream[lo - start : hi_tok - start]
            nd = int(
                np.searchsorted(starts_arr, hi_tok, side="left")
                - np.searchsorted(starts_arr, lo, side="left")
            )
            if lo == s * SEQ_LEN and hi_tok == (s + 1) * SEQ_LEN:
                out_seq.append(s)
                out_ndocs.append(nd)
                out_tokens.append(piece)
            else:
                frag_rows.append(
                    {"seq_id": s, "frag_off": lo - s * SEQ_LEN,
                     "n_docs": nd, "tokens": piece.tolist()}
                )
        # fragments go to the collector (keyed by bucket: retry-idempotent);
        # the ray.get makes the handoff durable before the task reports done
        ray.get(collector.put.remote(bucket, frag_rows))
        sid = np.asarray(out_seq, np.int64)
        return pa.table(
            {
                "seq_id": pa.array(sid, pa.int64()),
                "n_docs": pa.array(out_ndocs, pa.int64()),
                "tokens": pa.array(
                    [t.tolist() for t in out_tokens], pa.list_(pa.int32())
                ),
                "shard": pa.array(sid // seqs_per_shard, pa.int64()),
            },
            schema=OUT_SCHEMA,
        )

    # one streaming pass: complete sequences flow straight into the
    # Hive-partitioned sink; nothing token-sized is ever materialized
    curated_corpus().map_batches(
        tag_text_bucket, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("bucket").map_groups(
        assemble, batch_format="pandas"
    ).write_parquet(shards_dir, partition_cols=["shard"])

    # merge the collected bucket-edge fragments on the driver (≤ 2×_BUCKETS
    # rows) and append one extra file per affected shard
    frags = ray.get(collector.all.remote())
    by_seq: dict[int, list] = {}
    for r in frags:
        by_seq.setdefault(int(r["seq_id"]), []).append(r)
    shard_rows: dict[int, list] = {}
    for s, rows_ in sorted(by_seq.items()):
        rows_.sort(key=lambda r: r["frag_off"])
        toks = [t for r in rows_ for t in r["tokens"]]
        shard_rows.setdefault(s // seqs_per_shard, []).append(
            {"seq_id": s, "n_docs": sum(r["n_docs"] for r in rows_),
             "tokens": toks, "shard": s // seqs_per_shard}
        )
    import pyarrow.parquet as pq_mod

    for shard, rows_ in shard_rows.items():
        d = os.path.join(shards_dir, f"shard={shard}")
        os.makedirs(d, exist_ok=True)
        # hive layout: the partition column lives in the PATH, not the file
        # (matching the files the sink wrote), so drop it from the rows
        pq_mod.write_table(
            pa.Table.from_pylist(
                [{k: v for k, v in r.items() if k != "shard"} for r in rows_],
                schema=pa.schema(
                    [("seq_id", pa.int64()), ("n_docs", pa.int64()),
                     ("tokens", pa.list_(pa.int32()))]
                ),
            ),
            os.path.join(d, edge_name),
        )

    # per-shard lineage from the already-materialized count table (no
    # re-read of the token output): the manifest rows aggregated per shard
    from ray.data.aggregate import Max, Min, Sum

    def shard_of(batch: pa.Table) -> pa.Table:
        sid = np.asarray(batch.column("seq_id"), np.int64)
        return batch.append_column(
            "shard", pa.array((sid // seqs_per_shard).astype(np.int64), pa.int64())
        )

    lineage = (
        pack_counts(counts, base_offset=base_offset)
        .map_batches(shard_of, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Min("first_doc", alias_name="first_doc"),
            Max("last_doc", alias_name="last_doc"),
        )
    )
    lineage.write_parquet(lineage_dir)
    return int(n_docs_total), int(n_tokens_total)


def append_training_shards(delta_sf_dir: str, out_dir: str) -> dict:
    """Incrementally append a DELTA corpus (a crawl refresh) to an existing
    shard directory — the shard-sink counterpart of the engine's
    incremental LSH / IVF maintenance: base shard files are NEVER rewritten.

    The delta starts at the next SEQ_LEN boundary after the base corpus
    (``base_offset = n_seqs × SEQ_LEN``), so the base's ragged tail (if
    any) stays as written — the standard append convention; the wasted tail
    slots are recorded.  The tokenizer is NOT retrained: the vocabulary
    persisted at base-write time (``vocab.tiktoken``) is loaded and
    broadcast, so base and delta shards share one id space (the
    ivf_delta precedent — quantizer persisted WITH the index).  Delta
    curation gates run within the delta (base-vs-delta near-dup joins are
    the job of the incremental LSH index, ``dedup.lsh_delta_pairs``).
    Complete sequences and lineage rows append as new uniquely-named files
    in the same Hive layout; edge fragments get a generation-tagged file
    name so repeated appends never collide.  The done marker updates
    atomically with an ``appends`` log entry — re-running the same delta
    append is detected and skipped (idempotent unit)."""
    import json

    import ray
    import ray.data as rd

    from lightrag_ray.extras.catalog import q_dup_clusters
    from lightrag_ray.functions.tokenizer import BPETokenizer

    marker = os.path.join(out_dir, "_manifest", "done.json")
    with open(marker) as f:
        meta = json.load(f)
    if meta["n_seqs"] == 0:
        raise ValueError("append_training_shards: base shard dir is empty")
    if any(a["delta_sf_dir"] == delta_sf_dir for a in meta.get("appends", [])):
        return meta  # this delta already applied — idempotent skip

    ranks = BPETokenizer(vocab_path=meta["vocab_path"])._ranks
    ranks_ref = ray.put(ranks)
    seqs_per_shard = int(meta["params"]["seqs_per_shard"])
    base_offset = int(meta["n_seqs"]) * SEQ_LEN
    gen = len(meta.get("appends", [])) + 1

    pages = os.path.join(delta_sf_dir, "documents.parquet")
    hi = int(rd.read_parquet(pages, columns=["doc_id"]).max("doc_id"))
    clusters = q_dup_clusters(delta_sf_dir).materialize()

    n_docs, n_tokens = _pack_write_pass(
        pages, clusters, ranks_ref, hi, base_offset,
        meta["shards_dir"], meta["lineage_dir"], seqs_per_shard,
        f"edge_sequences_g{gen}.parquet",
    )

    new_total = base_offset + n_tokens  # tail slots between old ragged end
    # and base_offset are padding by convention — recorded, not stored
    n_seqs = (new_total + SEQ_LEN - 1) // SEQ_LEN if n_tokens else meta["n_seqs"]
    meta["appends"] = meta.get("appends", []) + [
        {"delta_sf_dir": delta_sf_dir, "n_docs": n_docs, "n_tokens": n_tokens,
         "start_seq": int(meta["n_seqs"]) if n_tokens else None}
    ]
    meta["n_seqs"] = int(n_seqs)
    meta["n_docs"] = int(meta["n_docs"]) + n_docs
    meta["n_tokens"] = int(meta["n_tokens"]) + n_tokens
    meta["n_shards"] = int((n_seqs + seqs_per_shard - 1) // seqs_per_shard)
    meta["ragged_tail"] = bool(new_total % SEQ_LEN) if n_tokens else meta["ragged_tail"]
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, marker)
    return meta


def q_shard_lineage(sf_dir: str):
    """Catalog entry: write (or resume) the training shards under a
    deterministic per-sf_dir scratch path and return the per-shard lineage
    rows.  rows-only in the driver; byte-level shard correctness (exact
    SEQ_LEN slicing, fragment merge, totals conservation, resume skip) is
    pinned in tests/test_packing.py."""
    import hashlib
    import tempfile

    import ray.data as rd

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    out = os.path.join(tempfile.gettempdir(), f"lightrag_ray_shards_{tag}")
    meta = write_training_shards(sf_dir, out, n_merges=50)
    if meta["n_seqs"] == 0:
        return rd.from_arrow(
            pa.schema(
                [("shard", pa.int64()), ("n_docs", pa.int64()),
                 ("n_tokens", pa.int64()), ("first_doc", pa.int64()),
                 ("last_doc", pa.int64())]
            ).empty_table()
        )
    return rd.read_parquet(meta["lineage_dir"])


def queries() -> dict[str, Callable]:
    return {
        "seq_pack": q_seq_pack,
        "training_shards": q_training_shards,
        "training_shards_lsh": q_training_shards_lsh,  # rows-only (LSH arm; exact ≡ training_shards)
        "training_shards_bpe": q_training_shards_bpe,  # rows-only (learned BPE)
        "shard_lineage": q_shard_lineage,  # rows-only (writes real token shards; byte-level tests)
    }


def oracle_sql() -> dict[str, str]:
    return {
        "seq_pack": SQL_SEQ_PACK,
        "training_shards": _sql_training_shards(),
    }
