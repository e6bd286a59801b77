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
