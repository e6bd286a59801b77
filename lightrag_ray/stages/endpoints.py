"""Endpoint back-propagation: edges → node updates / UNKNOWN nodes.

Reference semantics (lightrag/operate.py:2954-3160, step 11 of the edge merge):
for each endpoint of every merged edge,
  - endpoint entity missing → create it with ``entity_type="UNKNOWN"`` and the
    edge's description / source_ids / file_paths;
  - endpoint exists → append the edge's (capped) source_ids to the node's
    source list (first-seen order preserved, node cap re-applied after EVERY
    edge append — the FIFO tail-cap is not associative,
    lightrag/operate.py:3062-3101); nothing else on the node changes.

Expressed as ONE keyed aggregation instead of per-edge node lookups: the node
table and an edge-endpoint contribution table are unioned (same schema,
tagged by ``_row_kind``) and reduced per ``entity_id``, hash-bucketed so each
group-fn call covers many entities (same rationale as stages/merge.py).
Contributions apply in a deterministic edge order (the edge's min
mention-order key; the reference's order here is asyncio-completion
nondeterministic, so any fixed order is parity-equivalent at the triple
level).

Scale note: a node whose source list is already cap-truncated (KEEP mode)
cannot change — appends land beyond the cap — so the reducer short-circuits
on ``_sources_complete == False`` and never needs the untruncated list.
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa

from lightrag_ray.config import PipelineConfig
from lightrag_ray.constants import SOURCE_IDS_LIMIT_KEEP

ENDPOINT_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("_bucket", pa.int32()),
        ("_row_kind", pa.string()),  # 'node' | 'contrib'
        ("entity_type", pa.string()),
        ("description", pa.string()),
        ("source_ids", pa.list_(pa.string())),
        ("file_paths", pa.list_(pa.string())),
        ("created_at", pa.int64()),
        ("truncate", pa.string()),
        ("n_fragments", pa.int64()),
        ("n_mentions", pa.int64()),
        ("_sources_complete", pa.bool_()),
        ("_ord", pa.list_(pa.string())),
    ]
)

FINAL_NODES_COLUMNS = [
    "entity_id",
    "entity_type",
    "description",
    "source_ids",
    "file_paths",
    "created_at",
    "truncate",
    "n_fragments",
    "n_mentions",
]

FINAL_NODES_SCHEMA = pa.schema(
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
    ]
)


def _bucket_of(entity_id: str, buckets: int) -> int:
    return zlib.crc32(entity_id.encode("utf-8")) % buckets


def make_nodes_to_endpoint_rows(cfg: PipelineConfig):
    buckets = cfg.reduce_buckets

    def convert(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column("entity_id").to_pylist()
        return pa.table(
            {
                "entity_id": batch.column("entity_id"),
                "_bucket": pa.array(
                    [_bucket_of(e, buckets) for e in ids], pa.int32()
                ),
                "_row_kind": pa.array(["node"] * n, pa.string()),
                "entity_type": batch.column("entity_type"),
                "description": batch.column("description"),
                "source_ids": batch.column("source_ids"),
                "file_paths": batch.column("file_paths"),
                "created_at": batch.column("created_at"),
                "truncate": batch.column("truncate"),
                "n_fragments": batch.column("n_fragments"),
                "n_mentions": batch.column("n_mentions"),
                "_sources_complete": batch.column("_sources_complete"),
                "_ord": pa.array([[]] * n, pa.list_(pa.string())),
            },
            schema=ENDPOINT_SCHEMA,
        )

    return convert


def make_edges_to_endpoint_rows(cfg: PipelineConfig):
    buckets = cfg.reduce_buckets

    def convert(batch: pa.Table) -> pa.Table:
        """Two contribution rows per edge (one per endpoint)."""
        srcs = batch.column("src_id").to_pylist()
        tgts = batch.column("tgt_id").to_pylist()
        descs = batch.column("description").to_pylist()
        sids = batch.column("source_ids").to_pylist()
        fps = batch.column("file_paths").to_pylist()
        cas = batch.column("created_at").to_pylist()
        ords = batch.column("_ord").to_pylist()

        out = {name: [] for name in ENDPOINT_SCHEMA.names}
        sentinel = ["0" * 20, "", "0" * 10, "0" * 10]
        for i in range(len(srcs)):
            if list(ords[i]) == sentinel:
                # stored-passthrough edge (incremental run, no new mentions):
                # its provenance was appended to the endpoints in the run that
                # created it — re-contributing would re-append FIFO-dropped ids
                continue
            for endpoint in (srcs[i], tgts[i]):
                out["entity_id"].append(endpoint)
                out["_bucket"].append(_bucket_of(endpoint, buckets))
                out["_row_kind"].append("contrib")
                out["entity_type"].append("UNKNOWN")
                out["description"].append(descs[i])
                out["source_ids"].append(sids[i])
                out["file_paths"].append(fps[i])
                out["created_at"].append(cas[i])
                out["truncate"].append("")
                out["n_fragments"].append(0)
                out["n_mentions"].append(0)
                out["_sources_complete"].append(True)
                out["_ord"].append(list(ords[i]) + [srcs[i], tgts[i]])
        return pa.table(out, schema=ENDPOINT_SCHEMA)

    return convert


def make_finalize_endpoint_bucket_groupfn(cfg: PipelineConfig):
    keep_mode = cfg.source_ids_limit_method == SOURCE_IDS_LIMIT_KEEP
    cap = cfg.max_source_ids_per_entity

    def append_capped(sources: list[str], contrib_sids) -> list[str]:
        # one reference edge-append step: first-seen dedup union, then the cap
        # — per edge, because the FIFO tail-cap is not associative
        seen = set(sources)
        merged = list(sources)
        for sid in contrib_sids:
            if sid not in seen:
                seen.add(sid)
                merged.append(sid)
        if len(merged) > cap:
            merged = merged[:cap] if keep_mode else merged[-cap:]
        return merged

    def finalize_one(node_row, contribs: list[dict]) -> dict:
        contribs.sort(key=lambda c: tuple(c["_ord"]))
        if node_row is not None:
            out = {c: node_row[c] for c in FINAL_NODES_COLUMNS}
            out["source_ids"] = list(node_row["source_ids"])
            out["file_paths"] = list(node_row["file_paths"])
            if contribs and (node_row["_sources_complete"] or not keep_mode):
                sources = list(node_row["source_ids"])
                for c in contribs:
                    sources = append_capped(sources, c["source_ids"])
                out["source_ids"] = sources
            return out
        # endpoint never extracted as an entity → UNKNOWN node from the first
        # contributing edge; later edges append their sources
        first = contribs[0]
        sources = list(first["source_ids"])
        for c in contribs[1:]:
            sources = append_capped(sources, c["source_ids"])
        return {
            "entity_id": first["entity_id"],
            "entity_type": "UNKNOWN",
            "description": first["description"],
            "source_ids": sources,
            "file_paths": list(first["file_paths"]),
            "created_at": first["created_at"],
            "truncate": "",
            "n_fragments": 0,
            "n_mentions": 0,
        }

    def finalize_bucket(group: pd.DataFrame) -> pa.Table:
        records = group.to_dict("records")
        nodes: dict[str, dict] = {}
        contribs: dict[str, list[dict]] = {}
        for r in records:
            if r["_row_kind"] == "node":
                nodes[r["entity_id"]] = r
            else:
                contribs.setdefault(r["entity_id"], []).append(r)
        rows = []
        for entity_id in set(nodes) | set(contribs):
            rows.append(
                finalize_one(nodes.get(entity_id), contribs.get(entity_id, []))
            )
        rows.sort(key=lambda r: r["entity_id"])
        return pa.table(
            {name: [r[name] for r in rows] for name in FINAL_NODES_SCHEMA.names},
            schema=FINAL_NODES_SCHEMA,
        )

    return finalize_bucket


def apply_endpoints(nodes_pre, edges, cfg: PipelineConfig):
    """nodes_pre ∪ edge-endpoint contributions → final node table."""
    node_rows = nodes_pre.map_batches(
        make_nodes_to_endpoint_rows(cfg), batch_format="pyarrow", zero_copy_batch=True
    )
    contrib_rows = edges.map_batches(
        make_edges_to_endpoint_rows(cfg), batch_format="pyarrow", zero_copy_batch=True
    )
    unioned = node_rows.union(contrib_rows)
    return unioned.groupby(
        "_bucket", num_partitions=cfg.shuffle_partitions
    ).map_groups(make_finalize_endpoint_bucket_groupfn(cfg), batch_format="pandas")
