"""Endpoint back-propagation: edges → node updates / UNKNOWN nodes.

Reference semantics (lightrag/operate.py:2954-3160, step 11 of the edge merge):
for each endpoint of every merged edge,
  - endpoint entity missing → create it with ``entity_type="UNKNOWN"`` and the
    edge's description / source_ids / file_paths;
  - endpoint exists → append the edge's (capped) source_ids to the node's
    source list (first-seen order preserved, node cap re-applied); nothing
    else on the node changes.

Expressed as ONE keyed aggregation instead of per-edge node lookups: the node
table and an edge-endpoint contribution table are unioned (same schema, tagged
by ``_row_kind``) and reduced per ``entity_id``.  Contributions are applied in
a deterministic edge order (the edge's min mention-order key; the reference's
order here is asyncio-completion nondeterministic, so any fixed order is
parity-equivalent at the triple level).

Scale note: a node whose source list is already cap-truncated (KEEP mode)
cannot change — appends land beyond the cap — so the reducer short-circuits on
``_sources_complete == False`` and never needs the untruncated list.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from lightrag_ray.config import PipelineConfig
from lightrag_ray.constants import SOURCE_IDS_LIMIT_KEEP

ENDPOINT_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
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


def nodes_to_endpoint_rows(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.table(
        {
            "entity_id": batch.column("entity_id"),
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


def edges_to_endpoint_rows(batch: pa.Table) -> pa.Table:
    """Two contribution rows per edge (one per endpoint)."""
    srcs = batch.column("src_id").to_pylist()
    tgts = batch.column("tgt_id").to_pylist()
    descs = batch.column("description").to_pylist()
    sids = batch.column("source_ids").to_pylist()
    fps = batch.column("file_paths").to_pylist()
    cas = batch.column("created_at").to_pylist()
    ords = batch.column("_ord").to_pylist()

    out = {name: [] for name in ENDPOINT_SCHEMA.names}
    for i in range(len(srcs)):
        for endpoint in (srcs[i], tgts[i]):
            out["entity_id"].append(endpoint)
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
            out["_ord"].append(ords[i] + [srcs[i], tgts[i]])
    return pa.table(out, schema=ENDPOINT_SCHEMA)


def make_finalize_endpoint_groupfn(cfg: PipelineConfig):
    keep_mode = cfg.source_ids_limit_method == SOURCE_IDS_LIMIT_KEEP
    cap = cfg.max_source_ids_per_entity

    def finalize(group: pd.DataFrame) -> pd.DataFrame:
        nodes = group[group["_row_kind"] == "node"]
        contribs = group[group["_row_kind"] == "contrib"]
        if len(contribs):
            contribs = contribs.sort_values(
                "_ord", key=lambda col: col.map(tuple), kind="stable"
            )

        def append_capped(sources: list[str], contrib_sids) -> list[str]:
            # one reference edge-append step: first-seen dedup union, then the
            # cap — applied PER EDGE because the FIFO tail-cap is not
            # associative (each append re-truncates before the next edge sees
            # the list, lightrag/operate.py:3062-3101); KEEP is prefix-stable
            # so per-edge vs batch capping agree there.
            seen = set(sources)
            merged = list(sources)
            for sid in contrib_sids:
                if sid not in seen:
                    seen.add(sid)
                    merged.append(sid)
            if len(merged) > cap:
                merged = merged[:cap] if keep_mode else merged[-cap:]
            return merged

        if len(nodes):
            node = nodes.iloc[0]
            out = {c: [node[c]] for c in FINAL_NODES_COLUMNS}
            out["source_ids"] = [list(node["source_ids"])]
            out["file_paths"] = [list(node["file_paths"])]
            if len(contribs) and (node["_sources_complete"] or not keep_mode):
                sources = list(node["source_ids"])
                for contrib_sids in contribs["source_ids"]:
                    sources = append_capped(sources, contrib_sids)
                out["source_ids"] = [sources]
            return pa.table(out, schema=FINAL_NODES_SCHEMA)

        # endpoint never extracted as an entity → UNKNOWN node from the first
        # contributing edge; later edges append their sources
        first = contribs.iloc[0]
        sources = list(first["source_ids"])
        for contrib_sids in contribs["source_ids"].iloc[1:]:
            sources = append_capped(sources, contrib_sids)
        return pa.table(
            {
                "entity_id": [first["entity_id"]],
                "entity_type": ["UNKNOWN"],
                "description": [first["description"]],
                "source_ids": [sources],
                "file_paths": [list(first["file_paths"])],
                "created_at": [first["created_at"]],
                "truncate": [""],
                "n_fragments": [0],
                "n_mentions": [0],
            },
            schema=FINAL_NODES_SCHEMA,
        )

    return finalize


def apply_endpoints(nodes_pre, edges, cfg: PipelineConfig):
    """nodes_pre ∪ edge-endpoint contributions → final node table."""
    node_rows = nodes_pre.map_batches(
        nodes_to_endpoint_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    contrib_rows = edges.map_batches(
        edges_to_endpoint_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    unioned = node_rows.union(contrib_rows)
    return unioned.groupby(
        "entity_id", num_partitions=cfg.shuffle_partitions
    ).map_groups(make_finalize_endpoint_groupfn(cfg), batch_format="pandas")
