"""Export surfaces: reference-shaped projections, CSV, GraphML.

``sep_projection_*`` flattens our Arrow list columns into the reference's
``<SEP>``-joined scalar strings (graph node/edge records,
lightrag/operate.py:2558-2566 / 3202-3214) — the byte-comparable view used by
parity tests and by consumers expecting the reference layout.

``write_graphml`` emits a self-contained GraphML document equivalent to the
reference's ``nx.write_graphml`` flush (lightrag/kg/networkx_impl.py:130-139,
724-784) without a networkx dependency.  Driver-side: the whole-graph XML file
is inherently a single-writer artifact (same in the reference).
"""

from __future__ import annotations

from xml.sax.saxutils import escape, quoteattr

import pyarrow as pa

from lightrag_ray.constants import GRAPH_FIELD_SEP


def sep_projection_nodes(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "entity_id": batch.column("entity_id"),
            "entity_type": batch.column("entity_type"),
            "description": batch.column("description"),
            "source_id": pa.array(
                [GRAPH_FIELD_SEP.join(v) for v in batch.column("source_ids").to_pylist()]
            ),
            "file_path": pa.array(
                [GRAPH_FIELD_SEP.join(v) for v in batch.column("file_paths").to_pylist()]
            ),
            "created_at": batch.column("created_at"),
            "truncate": batch.column("truncate"),
        }
    )


def sep_projection_edges(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "src_id": batch.column("src_id"),
            "tgt_id": batch.column("tgt_id"),
            "weight": batch.column("weight"),
            "description": batch.column("description"),
            "keywords": pa.array(
                [",".join(v) for v in batch.column("keywords").to_pylist()]
            ),
            "source_id": pa.array(
                [GRAPH_FIELD_SEP.join(v) for v in batch.column("source_ids").to_pylist()]
            ),
            "file_path": pa.array(
                [GRAPH_FIELD_SEP.join(v) for v in batch.column("file_paths").to_pylist()]
            ),
            "created_at": batch.column("created_at"),
            "truncate": batch.column("truncate"),
        }
    )


def export_csv(nodes_ds, edges_ds, out_dir: str) -> None:
    nodes_ds.map_batches(
        sep_projection_nodes, batch_format="pyarrow", zero_copy_batch=True
    ).write_csv(f"{out_dir}/entities")
    edges_ds.map_batches(
        sep_projection_edges, batch_format="pyarrow", zero_copy_batch=True
    ).write_csv(f"{out_dir}/relations")


# ---------------------------------------------------------------------------
# aexport_data formats (lightrag/utils.py:4020-4366): csv / excel / md / txt
# over the reference's export row shapes — entity rows
# {entity_name, source_id, graph_data} and relation rows
# {src_entity, tgt_entity, source_id, graph_data} (graph_data is the
# stringified reference-shaped property dict), plus relationship-VDB rows
# {relationship_id, data}.  Driver-side single-file sinks, like the
# reference (and write_graphml below); the tables stream batch-wise.


def _export_rows(nodes_ds, edges_ds):
    entities_data, relations_data, relationships_data = [], [], []
    for batch in nodes_ds.map_batches(
        sep_projection_nodes, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=4096, batch_format="pyarrow"):
        for row in batch.to_pylist():
            graph = {
                "entity_id": row["entity_id"],
                "entity_type": row["entity_type"],
                "description": row["description"],
                "source_id": row["source_id"],
                "file_path": row["file_path"],
                "created_at": row["created_at"],
            }
            entities_data.append(
                {
                    "entity_name": row["entity_id"],
                    "source_id": row["source_id"],
                    "graph_data": str(graph),
                }
            )
    for batch in edges_ds.map_batches(
        sep_projection_edges, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=4096, batch_format="pyarrow"):
        for row in batch.to_pylist():
            graph = {
                "weight": row["weight"],
                "description": row["description"],
                "keywords": row["keywords"],
                "source_id": row["source_id"],
                "file_path": row["file_path"],
                "created_at": row["created_at"],
            }
            relations_data.append(
                {
                    "src_entity": row["src_id"],
                    "tgt_entity": row["tgt_id"],
                    "source_id": row["source_id"],
                    "graph_data": str(graph),
                }
            )
            from lightrag_ray.functions.text import compute_mdhash_id

            a, b = sorted((row["src_id"], row["tgt_id"]))
            relationships_data.append(
                {
                    "relationship_id": compute_mdhash_id(a + b, prefix="rel-"),
                    "data": str(graph),
                }
            )
    return entities_data, relations_data, relationships_data


def export_data(nodes_ds, edges_ds, output_path: str,
                file_format: str = "csv") -> None:
    """The reference's ``aexport_data`` sink (lightrag/utils.py:4020-4366)."""
    entities_data, relations_data, relationships_data = _export_rows(
        nodes_ds, edges_ds
    )
    sections = [
        ("ENTITIES", "Entities", entities_data),
        ("RELATIONS", "Relations", relations_data),
        ("RELATIONSHIPS", "Relationships", relationships_data),
    ]
    if file_format == "csv":
        import csv

        with open(output_path, "w", newline="", encoding="utf-8") as f:
            for i, (upper, _title, data) in enumerate(sections):
                if not data:
                    continue
                f.write(f"# {upper}\n")
                writer = csv.DictWriter(f, fieldnames=data[0].keys())
                writer.writeheader()
                writer.writerows(data)
                if i < 2:
                    f.write("\n\n")
    elif file_format == "excel":
        from lightrag_ray.sources.binary_docs import make_xlsx

        sheets = {}
        for _upper, title, data in sections:
            if data:
                sheets[title] = [list(data[0].keys())] + [
                    [str(v) for v in row.values()] for row in data
                ]
        with open(output_path, "wb") as f:
            f.write(make_xlsx(sheets))
    elif file_format == "md":
        with open(output_path, "w", encoding="utf-8") as f:
            f.write("# LightRAG Data Export\n\n")
            for _upper, title, data in sections:
                f.write(f"## {title}\n\n")
                if not data:
                    f.write(f"*No {title.lower()[:-1]} data available*\n\n")
                    continue
                keys = list(data[0].keys())
                f.write("| " + " | ".join(keys) + " |\n")
                f.write("| " + " | ".join(["---"] * len(keys)) + " |\n")
                for row in data:
                    f.write(
                        "| " + " | ".join(str(v) for v in row.values()) + " |\n"
                    )
                f.write("\n\n")
    elif file_format == "txt":
        with open(output_path, "w", encoding="utf-8") as f:
            f.write("LIGHTRAG DATA EXPORT\n")
            f.write("=" * 80 + "\n\n")
            for upper, _title, data in sections:
                f.write(f"{upper}\n")
                f.write("-" * 80 + "\n")
                if not data:
                    f.write(f"No {_title.lower()[:-1]} data available\n\n")
                    continue
                keys = list(data[0].keys())
                widths = {
                    k: max(len(k), max(len(str(r[k])) for r in data))
                    for k in keys
                }
                header = "  ".join(k.ljust(widths[k]) for k in keys)
                f.write(header + "\n")
                f.write("-" * len(header) + "\n")
                for row in data:
                    f.write(
                        "  ".join(
                            str(v).ljust(widths[k]) for k, v in row.items()
                        )
                        + "\n"
                    )
                f.write("\n\n")
    else:
        raise ValueError(f"Unsupported file format: {file_format}")


_NODE_KEYS = ["entity_id", "entity_type", "description", "source_id", "file_path",
              "created_at", "truncate"]
_EDGE_KEYS = ["weight", "description", "keywords", "source_id", "file_path",
              "created_at", "truncate"]


def write_graphml(nodes_ds, edges_ds, path: str) -> None:
    """Stream both tables into one GraphML file (driver-side sink)."""

    def key_defs(prefix: str, keys: list[str], target: str) -> list[str]:
        lines = []
        for i, k in enumerate(keys):
            attr_type = "long" if k == "created_at" else (
                "double" if k == "weight" else "string"
            )
            lines.append(
                f'  <key id="{prefix}{i}" for="{target}" attr.name="{k}" '
                f'attr.type="{attr_type}"/>'
            )
        return lines

    with open(path, "w", encoding="utf-8") as f:
        f.write('<?xml version="1.0" encoding="utf-8"?>\n')
        f.write(
            '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n'
        )
        f.write("\n".join(key_defs("dn", _NODE_KEYS, "node")) + "\n")
        f.write("\n".join(key_defs("de", _EDGE_KEYS, "edge")) + "\n")
        f.write('  <graph edgedefault="undirected">\n')
        for batch in nodes_ds.map_batches(
            sep_projection_nodes, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_size=4096, batch_format="pyarrow"):
            rows = batch.to_pylist()
            for row in rows:
                f.write(f'    <node id={quoteattr(str(row["entity_id"]))}>\n')
                for i, k in enumerate(_NODE_KEYS):
                    f.write(f'      <data key="dn{i}">{escape(str(row[k]))}</data>\n')
                f.write("    </node>\n")
        for batch in edges_ds.map_batches(
            sep_projection_edges, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_size=4096, batch_format="pyarrow"):
            for row in batch.to_pylist():
                f.write(
                    f'    <edge source={quoteattr(str(row["src_id"]))} '
                    f'target={quoteattr(str(row["tgt_id"]))}>\n'
                )
                for i, k in enumerate(_EDGE_KEYS):
                    f.write(f'      <data key="de{i}">{escape(str(row[k]))}</data>\n')
                f.write("    </edge>\n")
        f.write("  </graph>\n</graphml>\n")


def export_vector_upserts(
    nodes_ds,
    edges_ds,
    out_dir: str,
    embedder_factory=None,
    concurrency=(1, 4),
    batch_size: int = 256,
):
    """Outbound bulk-upsert export for external vector stores.

    The reference upserts entity/relation vectors directly into 13 storage
    backends (lightrag/kg/: milvus, qdrant, faiss, …) whose clients are not
    installable here; the portable equivalent is the bulk-load artifact
    every one of those stores accepts: partitioned JSONL of
    ``{"id", "vector", "payload": {...}}`` records — qdrant's upload format,
    trivially mappable to a milvus insert or a faiss id/vector pair.

    The content and id schemes are the SAME ones the query path embeds
    (stages/embed.entity_vdb_rows / relation_vdb_rows), so an external store
    loaded from this export answers the same nearest-neighbor queries as the
    built-in vector_topk.  Streaming end to end: rows → embed actor pool →
    ``write_json`` (one JSONL file per block; resumable partitioned output).
    Returns the two output directories."""
    import os

    from lightrag_ray.stages.embed import (
        HashEmbedder,
        embed_table,
        entity_vdb_rows,
        relation_vdb_rows,
    )

    embedder_factory = embedder_factory or HashEmbedder

    def _records(id_col: str, payload_cols: list[str]):
        def to_records(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_pylist()
            vecs = batch.column("embedding").to_pylist()
            payload_lists = {c: batch.column(c).to_pylist() for c in payload_cols}
            payloads = [
                {c: payload_lists[c][i] for c in payload_cols}
                for i in range(batch.num_rows)
            ]
            return pa.table(
                {
                    "id": pa.array(ids, pa.string()),
                    "vector": pa.array(vecs, pa.list_(pa.float64())),
                    "payload": pa.array(payloads),
                }
            )

        return to_records

    ent_dir = os.path.join(out_dir, "entities")
    rel_dir = os.path.join(out_dir, "relationships")
    embed_table(
        nodes_ds.map_batches(
            entity_vdb_rows, batch_format="pyarrow", zero_copy_batch=True
        ),
        concurrency=concurrency,
        batch_size=batch_size,
        embedder_factory=embedder_factory,
    ).map_batches(
        _records("vdb_id", ["entity_name", "content"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).write_json(ent_dir)
    embed_table(
        edges_ds.map_batches(
            relation_vdb_rows, batch_format="pyarrow", zero_copy_batch=True
        ),
        concurrency=concurrency,
        batch_size=batch_size,
        embedder_factory=embedder_factory,
    ).map_batches(
        _records("vdb_id", ["src_id", "tgt_id", "content"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).write_json(rel_dir)
    return ent_dir, rel_dir
