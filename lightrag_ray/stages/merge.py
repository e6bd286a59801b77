"""Canonicalization: mention rows → node / edge tables.

Semantics-parity with the reference merge (fresh-build path):
  - entity merge  ``_merge_nodes_then_upsert``   lightrag/operate.py:2271-2609
  - edge merge    ``_merge_edges_then_upsert``   lightrag/operate.py:2612-3264
  - mention collection + undirected edge keys    lightrag/operate.py:3374-3387
  - description combine/dedup                    lightrag/operate.py:2226-2268
  - source-id union + caps                       lightrag/utils.py:5729-5822

Executed as a **salted two-stage aggregation** so a planet-hot entity ("United
States"-class, present in a large fraction of all chunks) never lands on one
reducer:

  stage 0 (map_batches combiner): partial-merge mention rows per key within
      each batch → one compact partial row per (key, batch);
  stage 1 (groupby [key, salt]):  merge partials; ≤ ``salt_buckets`` rows
      per key survive;
  stage 2 (groupby key):          final merge + summarization → output row.

Every per-key field is merged associatively:
  - ``sources``: ordered first-seen dedup by a total order key
    ``ord = (timestamp, file_path, chunk_order, rec_index)`` — the
    deterministic stand-in for the reference's sequential doc/chunk processing
    order (lightrag/operate.py:4092-4125 pins chunk order for exactly this
    reason); capped at the source-id limit per partial in KEEP mode (safe:
    any sid in the global first-K is within the first K of every partial that
    contains it).
  - ``rows`` (mention fragments): restricted to sids within the partial's
    source cap in KEEP mode — the final KEEP filter
    (lightrag/operate.py:2367-2383) can only keep rows whose sid survives the
    global cap, and that set is covered by the partial caps.
  - FIFO mode keeps full source lists in partials (tail-cap needs the whole
    ordered list — same unboundedness as the reference; KEEP is the default).

Deterministic deviations from the reference (documented, P/R-neutral):
  - ``created_at`` = max mention timestamp (reference: wall clock).
  - cross-document processing order is the total order above (the reference's
    is completion-order nondeterministic at ``max_parallel_insert>1``).
"""

from __future__ import annotations

import json
import zlib
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

    tokenizer = default_tokenizer()
    return tokenizer


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


def _salt_of(source_id: str, buckets: int) -> int:
    return zlib.crc32(source_id.encode("utf-8")) % buckets


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
    buckets = cfg.salt_buckets

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
        out_names, out_salts, out_blobs = [], [], []
        for name, rows in grouped.items():
            partial = _partial_from_rows(rows, cap, keep_mode)
            out_names.append(name)
            out_salts.append(_salt_of(rows[0][4], buckets))
            out_blobs.append(json.dumps(partial, ensure_ascii=False))
        return pa.table(
            {
                "name": pa.array(out_names, pa.string()),
                "salt": pa.array(out_salts, pa.int32()),
                "blob": pa.array(out_blobs, pa.string()),
            }
        )

    return to_partials


def make_edge_partials_fn(cfg: PipelineConfig):
    cap = cfg.max_source_ids_per_relation
    keep_mode = cfg.source_ids_limit_method == SOURCE_IDS_LIMIT_KEEP
    buckets = cfg.salt_buckets

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

        grouped: dict[tuple[str, str], list[list]] = {}
        for i in range(len(srcs)):
            # undirected: sorted pair (lightrag/operate.py:3383-3386)
            key = (srcs[i], tgts[i]) if srcs[i] <= tgts[i] else (tgts[i], srcs[i])
            grouped.setdefault(key, []).append(
                [tss[i], fps[i], cos[i], ris[i], sids[i], kws[i], wts[i], descs[i]]
            )
        out_src, out_tgt, out_salts, out_blobs = [], [], [], []
        for (src, tgt), rows in grouped.items():
            partial = _partial_from_rows(rows, cap, keep_mode)
            out_src.append(src)
            out_tgt.append(tgt)
            out_salts.append(_salt_of(rows[0][4], buckets))
            out_blobs.append(json.dumps(partial, ensure_ascii=False))
        return pa.table(
            {
                "src": pa.array(out_src, pa.string()),
                "tgt": pa.array(out_tgt, pa.string()),
                "salt": pa.array(out_salts, pa.int32()),
                "blob": pa.array(out_blobs, pa.string()),
            }
        )

    return to_partials


# ---------------------------------------------------------------------------
# stage 1: per-(key, salt) partial merge


def make_partial_merge_groupfn(cfg: PipelineConfig, kind: str):
    cap = (
        cfg.max_source_ids_per_entity
        if kind == "e"
        else cfg.max_source_ids_per_relation
    )
    keep_mode = cfg.source_ids_limit_method == SOURCE_IDS_LIMIT_KEEP

    def merge_group(group: pd.DataFrame) -> pd.DataFrame:
        blobs = [json.loads(b) for b in group["blob"]]
        merged = _merge_partials(blobs, cap, keep_mode)
        first = group.iloc[:1].copy()
        first["blob"] = json.dumps(merged, ensure_ascii=False)
        return first

    return merge_group


# ---------------------------------------------------------------------------
# stage 2: finalize


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


def _file_paths_capped(
    rows: list[list], cfg: PipelineConfig
) -> list[str]:
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


def make_finalize_entities_groupfn(cfg: PipelineConfig):
    def finalize(group: pd.DataFrame) -> pd.DataFrame:
        tokenizer = _worker_summary_ctx()
        summarize_fn = make_deterministic_summary_model(
            tokenizer, cfg.summary_length_recommended
        )
        name = group["name"].iloc[0]
        blobs = [json.loads(b) for b in group["blob"]]
        rows, source_ids, merged, flag, complete = _finalize_common(
            blobs, cfg.max_source_ids_per_entity, cfg
        )

        # entity_type: plurality vote over surviving mention rows, ties broken
        # by first-seen order (lightrag/operate.py:2408-2415 — Counter
        # insertion order + stable sort)
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
        file_paths = _file_paths_capped(rows, cfg)
        created_at = max((r[0] for r in rows), default=0)
        return pa.table(
            {
                "entity_id": [name],
                "entity_type": [entity_type],
                "description": [description],
                "source_ids": [source_ids],
                "file_paths": [file_paths],
                "created_at": [created_at],
                "truncate": [flag],
                "n_fragments": [len(description_list)],
                "n_mentions": [merged["n_mentions"]],
                "_sources_complete": [complete],
            },
            schema=NODES_SCHEMA,
        )

    return finalize


def make_finalize_edges_groupfn(cfg: PipelineConfig):
    def finalize(group: pd.DataFrame) -> pd.DataFrame:
        tokenizer = _worker_summary_ctx()
        summarize_fn = make_deterministic_summary_model(
            tokenizer, cfg.summary_length_recommended
        )
        src = group["src"].iloc[0]
        tgt = group["tgt"].iloc[0]
        blobs = [json.loads(b) for b in group["blob"]]
        rows, source_ids, merged, flag, _complete = _finalize_common(
            blobs, cfg.max_source_ids_per_relation, cfg
        )

        # weight: sum of surviving mention weights (fresh-build arm of the
        # anti-double-count rule, lightrag/operate.py:2765-2798)
        weight = float(sum(r[6] for r in rows))

        # keywords: set-union of comma-split keywords over surviving rows,
        # sorted (lightrag/operate.py:2800-2817)
        kw: set[str] = set()
        for r in rows:
            if r[5]:
                kw.update(k.strip() for k in r[5].split(",") if k.strip())
        keywords = sorted(kw)

        description_list = _combine_sanitized(_dedup_descriptions(rows, 7))
        if not description_list:
            raise ValueError(f"Relation {src}~{tgt} has no description")
        description, _used = summarize_descriptions(
            "Relation", f"({src}, {tgt})", description_list, cfg, tokenizer,
            summarize_fn,
        )
        file_paths = _file_paths_capped(rows, cfg)
        created_at = max((r[0] for r in rows), default=0)
        first = rows[0]
        return pa.table(
            {
                "src_id": [src],
                "tgt_id": [tgt],
                "weight": [weight],
                "description": [description],
                "keywords": [keywords],
                "source_ids": [source_ids],
                "file_paths": [file_paths],
                "created_at": [created_at],
                "truncate": [flag],
                "n_mentions": [merged["n_mentions"]],
                # deterministic edge-processing order key for the endpoint
                # stage (reference order is completion-nondeterministic);
                # numeric parts zero-padded so string comparison == numeric
                "_ord": [
                    [f"{first[0]:020d}", first[1], f"{first[2]:010d}", f"{first[3]:010d}"]
                ],
            },
            schema=EDGES_SCHEMA,
        )

    return finalize


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
        ["name", "salt"], num_partitions=cfg.shuffle_partitions
    ).map_groups(make_partial_merge_groupfn(cfg, "e"), batch_format="pandas")
    return salted.groupby(
        "name", num_partitions=cfg.shuffle_partitions
    ).map_groups(make_finalize_entities_groupfn(cfg), batch_format="pandas")


def canonicalize_edges(mentions_r, cfg: PipelineConfig):
    """relation mention rows → edge table."""
    partials = mentions_r.map_batches(
        make_edge_partials_fn(cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.merge_batch_size,
    )
    salted = partials.groupby(
        ["src", "tgt", "salt"], num_partitions=cfg.shuffle_partitions
    ).map_groups(make_partial_merge_groupfn(cfg, "r"), batch_format="pandas")
    return salted.groupby(
        ["src", "tgt"], num_partitions=cfg.shuffle_partitions
    ).map_groups(make_finalize_edges_groupfn(cfg), batch_format="pandas")
