"""Subgraph exploration: ``get_knowledge_graph`` / ``get_graph_labels``.

Re-expresses the reference's graph-viewer surface
(lightrag/kg/networkx_impl.py:398-410 ``get_all_labels``, :505-690
``get_knowledge_graph``) over the Parquet node/edge tables:

- ``graph_labels``     → all entity labels, alphabetically sorted (a lazy
  Dataset — the full label list is webui-scale output; callers ``take`` a
  page of it).
- ``knowledge_graph``  → degree-prioritized breadth-first subgraph around a
  seed label (``"*"`` = global top-degree view), bounded by ``max_nodes``
  with the reference's ``is_truncated`` contract: truncated only when the
  node budget was hit while unexplored structure remained; a pure
  ``max_depth`` stop is not "truncated".

Scale shape: each BFS level is ONE broadcast semi-join pass over the edge
table (frontier set via ``ray.put``); per-level candidates are deduped,
anti-joined against the visited set, degree-attached (cogroup against the
degree table) and top-K'd INSIDE the Dataset before only ≤ ``max_nodes`` ids
reach the driver — a hot node with millions of neighbors never materializes
its neighbor list.  ``max_depth`` (default 3) bounds the number of passes.

Deterministic deviation (documented, same policy as pipelines/admin.py):
within one BFS level, equal-degree candidates tie-break by entity_id; the
reference follows NetworkX adjacency insertion order, which is
ingest-order-dependent.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from lightrag_ray.pipelines.query_ops import (
    _attach_degree,
    broadcast_fetch,
    node_degrees,
)

DEFAULT_MAX_GRAPH_NODES = 1000


def graph_labels(nodes_ds):
    """All entity labels, alphabetically sorted (``get_all_labels``)."""
    return nodes_ds.select_columns(["entity_id"]).sort("entity_id")


def _degree_lookup(deg_ds, ids: list[str]) -> dict[str, int]:
    rows = broadcast_fetch(deg_ds, ids, lambda b: b.column("entity_id").to_pylist())
    return {k: int(v["degree"]) for k, v in rows.items()}


def _level_candidates(
    edges_ds, deg_ds, frontier: set[str], visited: set[str], k: int
) -> list[str]:
    """Unvisited neighbors of ``frontier``: one edge-table pass, distinct,
    degree-ranked inside the Dataset, top ``k+1`` collected (the +1 lets the
    caller detect overflow for the is_truncated flag)."""
    import ray

    f_ref = ray.put(frozenset(frontier))
    v_ref = ray.put(frozenset(visited))

    def collect(batch: pa.Table) -> pa.Table:
        f = ray.get(f_ref)
        v = ray.get(v_ref)
        out: set[str] = set()
        for s, t in zip(
            batch.column("src_id").to_pylist(), batch.column("tgt_id").to_pylist()
        ):
            if s in f and t not in v:
                out.add(t)
            if t in f and s not in v:
                out.add(s)
        return pa.table({"entity_id": pa.array(sorted(out), pa.string())})

    distinct = (
        edges_ds.map_batches(collect, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("entity_id")
        .count()
        .select_columns(["entity_id"])
    )
    if distinct.schema() is None:  # no candidate anywhere → empty level
        return []
    ranked = _attach_degree(distinct, deg_ds, "entity_id", "degree").sort(
        ["degree", "entity_id"], descending=[True, False]
    )
    return [r["entity_id"] for r in ranked.take(k + 1)]


def knowledge_graph(
    nodes_ds,
    edges_ds,
    node_label: str,
    max_depth: int = 3,
    max_nodes: int | None = None,
) -> dict[str, Any]:
    """Degree-prioritized BFS subgraph around ``node_label``
    (networkx_impl.py:505-690).  Returns
    ``{"nodes": [...], "edges": [...], "is_truncated": bool}`` with full
    property dicts from the node/edge tables; the output is bounded by
    ``max_nodes`` (≤ 1000), so materializing it driver-side is safe."""
    import ray

    if max_nodes is None:
        max_nodes = DEFAULT_MAX_GRAPH_NODES
    else:
        max_nodes = min(max_nodes, DEFAULT_MAX_GRAPH_NODES)

    deg_ds = node_degrees(edges_ds).materialize()
    truncated = False

    if node_label == "*":
        # Global view: top max_nodes by (degree desc, id asc) over ALL
        # nodes — isolated nodes carry degree 0 via a union with the node
        # table, max-combined per id.
        zero = nodes_ds.select_columns(["entity_id"]).map_batches(
            lambda b: pa.table(
                {
                    "entity_id": b.column("entity_id"),
                    "degree": pa.array([0] * len(b), pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        ranked = (
            zero.union(deg_ds)
            .groupby("entity_id")
            .max("degree")
            .sort(["max(degree)", "entity_id"], descending=[True, False])
        )
        picked = ranked.take(max_nodes + 1)
        if len(picked) > max_nodes:
            truncated = True
            picked = picked[:max_nodes]
        chosen = [r["entity_id"] for r in picked]
    else:
        node_key = lambda b: b.column("entity_id").to_pylist()  # noqa: E731
        if node_label not in broadcast_fetch(nodes_ds, [node_label], node_key):
            return {"nodes": [], "edges": [], "is_truncated": False}
        visited: set[str] = set()
        chosen = []
        level = [node_label]
        depth = 0
        pending_unexplored = False
        while level and len(chosen) < max_nodes:
            capacity = max_nodes - len(chosen)
            degs = _degree_lookup(deg_ds, level)
            ordered = sorted(level, key=lambda n: (-degs.get(n, 0), n))
            admit, leftover = ordered[:capacity], ordered[capacity:]
            visited.update(admit)
            chosen.extend(admit)
            if leftover:
                pending_unexplored = True
            remaining = max_nodes - len(chosen)
            # At the depth limit (or with a full budget) we only need to KNOW
            # whether unexplored neighbors exist, not fetch them.
            probe_k = 0 if (depth >= max_depth or remaining <= 0) else remaining
            cand_ids = _level_candidates(edges_ds, deg_ds, set(admit), visited, probe_k)
            if depth >= max_depth or remaining <= 0:
                if cand_ids:
                    pending_unexplored = True
                break
            if len(cand_ids) > remaining:
                pending_unexplored = True
            level = cand_ids[:remaining]
            depth += 1
        truncated = len(chosen) >= max_nodes and pending_unexplored

    ref = ray.put(frozenset(chosen))

    def node_rows(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ref)
        mask = pa.array([n in wanted for n in batch.column("entity_id").to_pylist()])
        return batch.filter(mask)

    def edge_rows(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ref)
        mask = pa.array(
            [
                s in wanted and t in wanted
                for s, t in zip(
                    batch.column("src_id").to_pylist(),
                    batch.column("tgt_id").to_pylist(),
                )
            ]
        )
        return batch.filter(mask)

    nodes = nodes_ds.map_batches(
        node_rows, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    edges = edges_ds.map_batches(
        edge_rows, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    order = {n: i for i, n in enumerate(chosen)}
    nodes.sort(key=lambda r: order.get(r["entity_id"], len(order)))
    edges.sort(key=lambda r: (r["src_id"], r["tgt_id"]))
    return {"nodes": nodes, "edges": edges, "is_truncated": truncated}
