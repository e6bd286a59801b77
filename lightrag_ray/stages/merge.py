"""Canonicalization: mention rows → node / edge tables.

Semantics-parity with the reference merge (fresh-build path):
  - entity merge  ``_merge_nodes_then_upsert``   lightrag/operate.py:2271-2609
  - edge merge    ``_merge_edges_then_upsert``   lightrag/operate.py:2612-3264
  - mention collection + undirected edge keys    lightrag/operate.py:3374-3387
  - description combine/dedup                    lightrag/operate.py:2226-2268
  - source-id union + caps                       lightrag/utils.py:5729-5822

Physical plan — a salted, bucketed two-stage aggregation:

  stage 0 (map_batches combiner): partial-merge mention rows per key within
      each batch → one compact partial row per (key, batch); rows are capped
      per partial in KEEP mode (safe: any sid in the global first-K is within
      the first K of every partial containing it).
  stage 1 (groupby bucket(key, salt)): merge partials per (key, salt).  The
      SALT (hash of source chunk id, ``salt_buckets`` values) splits a
      planet-hot key's partials across reducers; the BUCKET (hash of
      key+salt, ``reduce_buckets`` values) makes the shuffle coarse — one
      group-fn call per bucket, plain-dict merging inside, instead of one
      pandas frame per key (per-key map_groups cost dominated edge
      canonicalization before this).
  stage 2 (groupby bucket(key)): ≤ ``salt_buckets`` partials per key arrive;
      final merge + summarization per key, one output table per bucket.

Every per-key field merges associatively:
  - ``sources``: ordered first-seen dedup by the total order key
    ``ord = (timestamp, file_path, chunk_order, rec_index)`` — the
    deterministic stand-in for the reference's sequential doc/chunk
    processing order (lightrag/operate.py:4092-4125);
  - FIFO mode keeps full source lists in partials (tail-cap needs the whole
    ordered list — same unboundedness as the reference; KEEP is default).

Deterministic deviations from the reference (documented, P/R-neutral):
  - ``created_at`` = max mention timestamp (reference: wall clock);
  - cross-document processing order is the total order above (the
    reference's is completion-order nondeterministic at
    ``max_parallel_insert>1``).
"""

from __future__ import annotations

import json
from collections import Counter
from functools import lru_cache

import pandas as pd
import pyarrow as pa

from lightrag_ray.config import PipelineConfig
from lightrag_ray.constants import SOURCE_IDS_LIMIT_KEEP
from lightrag_ray.functions.text import sanitize_text_for_encoding
from lightrag_ray.stages.summarize import (
    make_deterministic_summary_model,
    summarize_descriptions,
)

# ---------------------------------------------------------------------------
# worker-local heavyweight state (one per process, like an actor __init__)


@lru_cache(maxsize=1)
def _worker_summary_ctx():
    from lightrag_ray.functions.tokenizer import default_tokenizer

    return default_tokenizer()


NODES_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("entity_type", pa.string()),
        ("description", pa.string()),
        ("source_ids", pa.list_(pa.string())),
        ("file_paths", pa.list_(pa.string())),
        ("created_at", pa.int64()),
        ("truncate", pa.string()),
        ("n_fragments", pa.int64()),
        ("n_mentions", pa.int64()),
        ("_sources_complete", pa.bool_()),
    ]
)

EDGES_SCHEMA = pa.schema(
    [
        ("src_id", pa.string()),
        ("tgt_id", pa.string()),
        ("weight", pa.float64()),
        ("description", pa.string()),
        ("keywords", pa.list_(pa.string())),
        ("source_ids", pa.list_(pa.string())),
        ("file_paths", pa.list_(pa.string())),
        ("created_at", pa.int64()),
        ("truncate", pa.string()),
        ("n_mentions", pa.int64()),
        ("_ord", pa.list_(pa.string())),
    ]
)


def _crc(text: str) -> int:
    """Well-mixed deterministic hash for salt/bucket routing.  NOT crc32:
    crc is XOR-linear, so structured ids (``doc-000100-chunk-000``...) land
    in periodic patterns that defeat the spread.  md5 cost is per PARTIAL
    (per key per batch), not per mention row."""
    import hashlib

    return int.from_bytes(hashlib.md5(text.encode("utf-8")).digest()[:8], "big")


def _salt_of(source_id: str, buckets: int) -> int:
    return _crc(source_id) % buckets


# ---------------------------------------------------------------------------
# partial representation (JSON blob per (key, salt))
#
# entity row: [ts, fp, co, ri, sid, entity_type, description]
# edge row:   [ts, fp, co, ri, sid, keywords, weight, description]
# source:     [ts, fp, co, ri, sid]


def _merge_sources(
    source_lists: list[list], cap: int, keep_mode: bool
) -> tuple[list, bool, int]:
    """Ordered first-seen dedup union; returns (sources, truncated_here, n_seen)."""
    merged: dict[str, list] = {}
    for sources in source_lists:
        for s in sources:
            sid = s[4]
            prev = merged.get(sid)
            if prev is None or tuple(s[:4]) < tuple(prev[:4]):
                merged[sid] = s
    ordered = sorted(merged.values(), key=lambda s: tuple(s[:4]))
    n_seen = len(ordered)
    truncated = False
    if keep_mode and len(ordered) > cap:
        ordered = ordered[:cap]
        truncated = True
    return ordered, truncated, n_seen


def _merge_partials(blobs: list[dict], cap: int, keep_mode: bool) -> dict:
    sources, trunc_here, n_seen = _merge_sources(
        [b["sources"] for b in blobs], cap, keep_mode
    )
    src_truncated = trunc_here or any(b["src_truncated"] for b in blobs)
    if src_truncated:
        # exact distinct count unknowable once any partial dropped sids;
        # report the max lower bound
        n_sources_seen = max(n_seen, max(b["n_sources_seen"] for b in blobs))
    else:
        n_sources_seen = n_seen
    allowed = {s[4] for s in sources}
    rows: list[list] = []
    for b in blobs:
        for r in b["rows"]:
            if not keep_mode or r[4] in allowed:
                rows.append(r)
    return {
        "rows": rows,
        "sources": sources,
        "n_mentions": sum(b["n_mentions"] for b in blobs),
        "src_truncated": src_truncated,
        "n_sources_seen": n_sources_seen,
    }


def _partial_from_rows(rows: list[list], cap: int, keep_mode: bool) -> dict:
    """Build one partial from raw mention rows (same row layout, sid at [4])."""
    sources, truncated, n_seen = _merge_sources(
        [[[r[0], r[1], r[2], r[3], r[4]] for r in rows]], cap, keep_mode
    )
    allowed = {s[4] for s in sources}
    kept = [r for r in rows if not keep_mode or r[4] in allowed]
    return {
        "rows": kept,
        "sources": sources,
        "n_mentions": len(rows),
        "src_truncated": truncated,
        "n_sources_seen": n_seen,
    }


# ---------------------------------------------------------------------------
# stage 0: combiner (map_batches over mention rows → partial rows)


def make_entity_partials_fn(cfg: PipelineConfig):
    cap = cfg.max_source_ids_per_entity
    keep_mode = cfg.source_ids_limit_method == SOURCE_IDS_LIMIT_KEEP
    salts = cfg.salt_buckets
    rbuckets = cfg.reduce_buckets

    def to_partials(batch: pa.Table) -> pa.Table:
        names = batch.column("name").to_pylist()
        types = batch.column("entity_type").to_pylist()
        descs = batch.column("description").to_pylist()
        sids = batch.column("source_id").to_pylist()
        fps = batch.column("file_path").to_pylist()
        tss = batch.column("timestamp").to_pylist()
        cos = batch.column("chunk_order").to_pylist()
        ris = batch.column("rec_index").to_pylist()

        grouped: dict[str, list[list]] = {}
        for i, name in enumerate(names):
            grouped.setdefault(name, []).append(
                [tss[i], fps[i], cos[i], ris[i], sids[i], types[i], descs[i]]
            )
        out = {"key": [], "salt": [], "b1": [], "blob": []}
        for name, rows in grouped.items():
            partial = _partial_from_rows(rows, cap, keep_mode)
            salt = _salt_of(rows[0][4], salts)
            out["key"].append(name)
            out["salt"].append(salt)
            out["b1"].append(_crc(f"{name}\x00{salt}") % rbuckets)
            out["blob"].append(json.dumps(partial, ensure_ascii=False))
        return pa.table(
            {
                "key": pa.array(out["key"], pa.string()),
                "salt": pa.array(out["salt"], pa.int32()),
                "b1": pa.array(out["b1"], pa.int32()),
                "blob": pa.array(out["blob"], pa.string()),
            }
        )

    return to_partials


def make_edge_partials_fn(cfg: PipelineConfig):
    cap = cfg.max_source_ids_per_relation
    keep_mode = cfg.source_ids_limit_method == SOURCE_IDS_LIMIT_KEEP
    salts = cfg.salt_buckets
    rbuckets = cfg.reduce_buckets

    def to_partials(batch: pa.Table) -> pa.Table:
        srcs = batch.column("name").to_pylist()
        tgts = batch.column("tgt").to_pylist()
        kws = batch.column("keywords").to_pylist()
        wts = batch.column("weight").to_pylist()
        descs = batch.column("description").to_pylist()
        sids = batch.column("source_id").to_pylist()
        fps = batch.column("file_path").to_pylist()
        tss = batch.column("timestamp").to_pylist()
        cos = batch.column("chunk_order").to_pylist()
        ris = batch.column("rec_index").to_pylist()

        grouped: dict[str, list[list]] = {}
        for i in range(len(srcs)):
            # undirected: sorted pair (lightrag/operate.py:3383-3386)
            a, b = (srcs[i], tgts[i]) if srcs[i] <= tgts[i] else (tgts[i], srcs[i])
            grouped.setdefault(f"{a}\x00{b}", []).append(
                [tss[i], fps[i], cos[i], ris[i], sids[i], kws[i], wts[i], descs[i]]
            )
        out = {"key": [], "salt": [], "b1": [], "blob": []}
        for key, rows in grouped.items():
            partial = _partial_from_rows(rows, cap, keep_mode)
            salt = _salt_of(rows[0][4], salts)
            out["key"].append(key)
            out["salt"].append(salt)
            out["b1"].append(_crc(f"{key}\x00{salt}") % rbuckets)
            out["blob"].append(json.dumps(partial, ensure_ascii=False))
        return pa.table(
            {
                "key": pa.array(out["key"], pa.string()),
                "salt": pa.array(out["salt"], pa.int32()),
                "b1": pa.array(out["b1"], pa.int32()),
                "blob": pa.array(out["blob"], pa.string()),
            }
        )

    return to_partials


# ---------------------------------------------------------------------------
# stage 1: per-(key, salt) partial merge, one group-fn call per b1 bucket


def make_bucket_merge_groupfn(cfg: PipelineConfig, kind: str):
    cap = (
        cfg.max_source_ids_per_entity
        if kind == "e"
        else cfg.max_source_ids_per_relation
    )
    keep_mode = cfg.source_ids_limit_method == SOURCE_IDS_LIMIT_KEEP
    rbuckets = cfg.reduce_buckets

    def merge_bucket(group: pd.DataFrame) -> pa.Table:
        by_key: dict[tuple, list[dict]] = {}
        for key, salt, blob in zip(group["key"], group["salt"], group["blob"]):
            by_key.setdefault((key, int(salt)), []).append(json.loads(blob))
        out = {"key": [], "salt": [], "b2": [], "blob": []}
        for (key, salt), blobs in by_key.items():
            merged = blobs[0] if len(blobs) == 1 else _merge_partials(
                blobs, cap, keep_mode
            )
            out["key"].append(key)
            out["salt"].append(salt)
            out["b2"].append(_crc(key) % rbuckets)
            out["blob"].append(json.dumps(merged, ensure_ascii=False))
        return pa.table(
            {
                "key": pa.array(out["key"], pa.string()),
                "salt": pa.array(out["salt"], pa.int32()),
                "b2": pa.array(out["b2"], pa.int32()),
                "blob": pa.array(out["blob"], pa.string()),
            }
        )

    return merge_bucket


# ---------------------------------------------------------------------------
# per-key finalize helpers (shared by the bucket reducers and unit tests)


def _dedup_descriptions(rows: list[list], desc_idx: int) -> list[str]:
    """first-occurrence dedup by description over arrival order, then sort by
    (timestamp, -len) — stable, preserving arrival order on ties
    (lightrag/operate.py:2417-2432)."""
    unique: dict[str, list] = {}
    for r in rows:
        desc = r[desc_idx]
        if desc and desc not in unique:
            unique[desc] = r
    ordered = sorted(unique.values(), key=lambda r: (r[0], -len(r[desc_idx])))
    return [r[desc_idx] for r in ordered]


def _combine_sanitized(descriptions: list[str]) -> list[str]:
    """sanitize-then-dedup (lightrag/operate.py:2226-2268, fresh path)."""
    combined: list[str] = []
    seen: set[str] = set()
    for d in descriptions:
        s = sanitize_text_for_encoding(d)
        if s and s not in seen:
            seen.add(s)
            combined.append(s)
    return combined


def _file_paths_capped(rows: list[list], cfg: PipelineConfig) -> list[str]:
    """first-seen dedup of file paths over surviving rows, capped at
    max_file_paths with a placeholder entry (lightrag/operate.py:2464-2519)."""
    seen: set[str] = set()
    paths: list[str] = []
    for r in rows:
        fp = r[1]
        if fp and fp not in seen:
            seen.add(fp)
            paths.append(fp)
    if len(paths) > cfg.max_file_paths:
        keep_mode = cfg.source_ids_limit_method == SOURCE_IDS_LIMIT_KEEP
        ph = cfg.file_path_more_placeholder
        if keep_mode:
            paths = paths[: cfg.max_file_paths] + [f"...{ph}...(KEEP Old)"]
        else:
            paths = paths[-cfg.max_file_paths :] + [f"...{ph}...(FIFO)"]
    return paths


def _finalize_common(
    blobs: list[dict], cap: int, cfg: PipelineConfig
) -> tuple[list[list], list[str], dict, str, bool]:
    """Shared tail of both finalizers.

    Returns (surviving_rows_sorted, source_ids, merged_partial, truncate_flag,
    sources_complete)."""
    keep_mode = cfg.source_ids_limit_method == SOURCE_IDS_LIMIT_KEEP
    merged = _merge_partials(blobs, cap, keep_mode)
    sources = merged["sources"]
    if not keep_mode and len(sources) > cap:  # FIFO: tail-cap at final only
        kept_sources = sources[-cap:]
        fifo_truncated = True
    else:
        kept_sources = sources
        fifo_truncated = False
    allowed = {s[4] for s in kept_sources}
    if keep_mode:
        rows = [r for r in merged["rows"] if r[4] in allowed]
        truncated = merged["src_truncated"]
    else:
        rows = list(merged["rows"])  # FIFO keeps all mention rows
        truncated = fifo_truncated
    rows.sort(key=lambda r: (r[0], r[1], r[2], r[3]))

    if truncated:
        if keep_mode:
            flag = "KEEP Old"
        else:
            flag = f"FIFO {len(kept_sources)}/{merged['n_sources_seen']}"
    else:
        flag = ""
    source_ids = [s[4] for s in kept_sources]
    sources_complete = not truncated
    return rows, source_ids, merged, flag, sources_complete


def finalize_entity_key(
    name: str, blobs: list[dict], cfg: PipelineConfig, tokenizer, summarize_fn
) -> dict:
    rows, source_ids, merged, flag, complete = _finalize_common(
        blobs, cfg.max_source_ids_per_entity, cfg
    )
    # entity_type: plurality vote over surviving mention rows, ties broken by
    # first-seen order (lightrag/operate.py:2408-2415 — Counter insertion
    # order + stable sort)
    counts = Counter(r[5] for r in rows)
    entity_type = (
        sorted(counts.items(), key=lambda x: x[1], reverse=True)[0][0]
        if counts
        else "UNKNOWN"
    )
    description_list = _combine_sanitized(_dedup_descriptions(rows, 6))
    if not description_list:
        description_list = [f"Entity {name}"]
    description, _used = summarize_descriptions(
        "Entity", name, description_list, cfg, tokenizer, summarize_fn
    )
    return {
        "entity_id": name,
        "entity_type": entity_type,
        "description": description,
        "source_ids": source_ids,
        "file_paths": _file_paths_capped(rows, cfg),
        "created_at": max((r[0] for r in rows), default=0),
        "truncate": flag,
        "n_fragments": len(description_list),
        "n_mentions": merged["n_mentions"],
        "_sources_complete": complete,
    }


def finalize_edge_key(
    src: str, tgt: str, blobs: list[dict], cfg: PipelineConfig, tokenizer,
    summarize_fn,
) -> dict:
    rows, source_ids, merged, flag, _complete = _finalize_common(
        blobs, cfg.max_source_ids_per_relation, cfg
    )
    # weight: sum of surviving mention weights (fresh-build arm of the
    # anti-double-count rule, lightrag/operate.py:2765-2798)
    weight = float(sum(r[6] for r in rows))
    # keywords: set-union of comma-split keywords over surviving rows, sorted
    # (lightrag/operate.py:2800-2817)
    kw: set[str] = set()
    for r in rows:
        if r[5]:
            kw.update(k.strip() for k in r[5].split(",") if k.strip())
    description_list = _combine_sanitized(_dedup_descriptions(rows, 7))
    if not description_list:
        raise ValueError(f"Relation {src}~{tgt} has no description")
    description, _used = summarize_descriptions(
        "Relation", f"({src}, {tgt})", description_list, cfg, tokenizer, summarize_fn
    )
    first = rows[0]
    return {
        "src_id": src,
        "tgt_id": tgt,
        "weight": weight,
        "description": description,
        "keywords": sorted(kw),
        "source_ids": source_ids,
        "file_paths": _file_paths_capped(rows, cfg),
        "created_at": max((r[0] for r in rows), default=0),
        "truncate": flag,
        "n_mentions": merged["n_mentions"],
        # deterministic edge-processing order key for the endpoint stage
        # (reference order is completion-nondeterministic); zero-padded
        # numerics so string comparison == numeric
        "_ord": [f"{first[0]:020d}", first[1], f"{first[2]:010d}", f"{first[3]:010d}"],
    }


# ---------------------------------------------------------------------------
# stage 2: per-b2-bucket finalize


def _rows_to_table(rows: list[dict], schema: pa.Schema) -> pa.Table:
    return pa.table(
        {name: [r[name] for r in rows] for name in schema.names}, schema=schema
    )


def make_bucket_finalize_entities_groupfn(cfg: PipelineConfig):
    def finalize_bucket(group: pd.DataFrame) -> pa.Table:
        tokenizer = _worker_summary_ctx()
        summarize_fn = make_deterministic_summary_model(
            tokenizer, cfg.summary_length_recommended
        )
        by_key: dict[str, list[dict]] = {}
        for key, blob in zip(group["key"], group["blob"]):
            by_key.setdefault(key, []).append(json.loads(blob))
        rows = [
            finalize_entity_key(name, blobs, cfg, tokenizer, summarize_fn)
            for name, blobs in by_key.items()
        ]
        return _rows_to_table(rows, NODES_SCHEMA)

    return finalize_bucket


def make_bucket_finalize_edges_groupfn(cfg: PipelineConfig):
    def finalize_bucket(group: pd.DataFrame) -> pa.Table:
        tokenizer = _worker_summary_ctx()
        summarize_fn = make_deterministic_summary_model(
            tokenizer, cfg.summary_length_recommended
        )
        by_key: dict[str, list[dict]] = {}
        for key, blob in zip(group["key"], group["blob"]):
            by_key.setdefault(key, []).append(json.loads(blob))
        rows = []
        for key, blobs in by_key.items():
            src, tgt = key.split("\x00", 1)
            rows.append(
                finalize_edge_key(src, tgt, blobs, cfg, tokenizer, summarize_fn)
            )
        return _rows_to_table(rows, EDGES_SCHEMA)

    return finalize_bucket


# ---------------------------------------------------------------------------
# dataset-level drivers


def canonicalize_entities(mentions_e, cfg: PipelineConfig):
    """entity mention rows → node table (pre endpoint-append)."""
    partials = mentions_e.map_batches(
        make_entity_partials_fn(cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.merge_batch_size,
    )
    salted = partials.groupby(
        "b1", num_partitions=cfg.shuffle_partitions
    ).map_groups(make_bucket_merge_groupfn(cfg, "e"), batch_format="pandas")
    return salted.groupby(
        "b2", num_partitions=cfg.shuffle_partitions
    ).map_groups(make_bucket_finalize_entities_groupfn(cfg), batch_format="pandas")


def canonicalize_edges(mentions_r, cfg: PipelineConfig):
    """relation mention rows → edge table."""
    partials = mentions_r.map_batches(
        make_edge_partials_fn(cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.merge_batch_size,
    )
    salted = partials.groupby(
        "b1", num_partitions=cfg.shuffle_partitions
    ).map_groups(make_bucket_merge_groupfn(cfg, "r"), batch_format="pandas")
    return salted.groupby(
        "b2", num_partitions=cfg.shuffle_partitions
    ).map_groups(make_bucket_finalize_edges_groupfn(cfg), batch_format="pandas")
