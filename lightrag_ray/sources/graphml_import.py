"""Import a reference LightRAG graph (GraphML) into our node/edge tables.

The reference's NetworkX backend persists the whole graph as GraphML with
flat string properties (lightrag/kg/networkx_impl.py:130-139, 724-784;
``<SEP>``-joined multi-value fields, node/edge property dicts per SURVEY
§1.1).  This importer converts such a file into our Arrow tables — the
migration path for a reference user switching engines: import once, then
continue with :func:`lightrag_ray.pipelines.incremental.update_kg`.

Streamed with ``xml.etree.ElementTree.iterparse`` so a multi-GB graph never
fully resides in memory; writes Parquet in batches.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import pyarrow as pa
import pyarrow.parquet as pq

from lightrag_ray.constants import GRAPH_FIELD_SEP
from lightrag_ray.stages.endpoints import FINAL_NODES_SCHEMA
from lightrag_ray.stages.merge import EDGES_SCHEMA

_NS = "{http://graphml.graphdrawing.org/xmlns}"


def _split(joined: str | None) -> list[str]:
    return [p for p in (joined or "").split(GRAPH_FIELD_SEP) if p.strip()]


def import_graphml(
    path: str, out_dir: str, batch_rows: int = 50_000
) -> tuple[str, str]:
    """Parse a GraphML graph into ``{out_dir}/nodes`` + ``{out_dir}/edges``
    Parquet (our output schemas).  Returns the two directories."""
    nodes_dir = os.path.join(out_dir, "nodes")
    edges_dir = os.path.join(out_dir, "edges")
    os.makedirs(nodes_dir, exist_ok=True)
    os.makedirs(edges_dir, exist_ok=True)

    key_names: dict[str, str] = {}  # GraphML key id -> attr.name
    node_rows: list[dict] = []
    edge_rows: list[dict] = []
    part = {"nodes": 0, "edges": 0}

    def flush(kind: str, rows: list[dict], schema: pa.Schema, out: str):
        if not rows:
            if part[kind] == 0:  # empty graph: still emit a readable table
                pq.write_table(
                    schema.empty_table(), os.path.join(out, "part-00000.parquet")
                )
            return
        table = pa.table(
            {name: [r.get(name) for r in rows] for name in schema.names},
            schema=schema,
        )
        pq.write_table(table, os.path.join(out, f"part-{part[kind]:05d}.parquet"))
        part[kind] += 1
        rows.clear()

    def node_row(node_id: str, data: dict) -> dict:
        return {
            "entity_id": data.get("entity_id") or node_id,
            "entity_type": data.get("entity_type") or "UNKNOWN",
            "description": data.get("description") or "",
            "source_ids": _split(data.get("source_id")),
            "file_paths": _split(data.get("file_path")),
            "created_at": int(float(data.get("created_at") or 0)),
            "truncate": data.get("truncate") or "",
            "n_fragments": 0,
            "n_mentions": 0,
        }

    def edge_row(src: str, tgt: str, data: dict) -> dict:
        a, b = sorted((src, tgt))  # undirected canonical pair
        return {
            "src_id": a,
            "tgt_id": b,
            "weight": float(data.get("weight") or 1.0),
            "description": data.get("description") or "",
            "keywords": [
                k.strip() for k in (data.get("keywords") or "").split(",")
                if k.strip()
            ],
            "source_ids": _split(data.get("source_id")),
            "file_paths": _split(data.get("file_path")),
            "created_at": int(float(data.get("created_at") or 0)),
            "truncate": data.get("truncate") or "",
            "n_mentions": 0,
            "_ord": ["0" * 20, "", "0" * 10, "0" * 10],
        }

    for event, elem in ET.iterparse(path, events=("end",)):
        tag = elem.tag.removeprefix(_NS)
        if tag == "key":
            key_names[elem.get("id", "")] = elem.get("attr.name", "")
        elif tag == "node":
            data = {
                key_names.get(d.get("key", ""), d.get("key", "")): (d.text or "")
                for d in elem
                if d.tag.removeprefix(_NS) == "data"
            }
            node_rows.append(node_row(elem.get("id", ""), data))
            if len(node_rows) >= batch_rows:
                flush("nodes", node_rows, FINAL_NODES_SCHEMA, nodes_dir)
            elem.clear()
        elif tag == "edge":
            data = {
                key_names.get(d.get("key", ""), d.get("key", "")): (d.text or "")
                for d in elem
                if d.tag.removeprefix(_NS) == "data"
            }
            edge_rows.append(edge_row(elem.get("source", ""), elem.get("target", ""), data))
            if len(edge_rows) >= batch_rows:
                flush("edges", edge_rows, EDGES_SCHEMA, edges_dir)
            elem.clear()

    flush("nodes", node_rows, FINAL_NODES_SCHEMA, nodes_dir)
    flush("edges", edge_rows, EDGES_SCHEMA, edges_dir)
    return nodes_dir, edges_dir
