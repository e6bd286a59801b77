"""Query-side data-plane operators over the output node/edge tables.

The reference's query path (SURVEY §2.10) sits downstream of the graph
tables; these are its data-plane pieces re-expressed as small Ray/Arrow jobs:

  - ``node_degrees``      degree per entity (undirected edge count)
  - ``rank_edges``        edges ranked by (edge degree, weight) desc —
                          reference `_find_most_related_edges_from_entities`
                          (lightrag/operate.py:5680-5685; edge degree =
                          deg(src)+deg(tgt))
  - ``popular_labels``    degree-sorted entity labels, top-k
                          (lightrag/kg/networkx_impl.py:412-504)
  - ``one_hop_edges``     1-hop edges of a seed set, ranked like the
                          reference local-query expansion
  - ``dedup_chunk_hits``  chunk-occurrence counting with first-entity-wins
                          dedup (lightrag/operate.py:5739-5753)
  - ``round_robin_merge`` interleave two ranked lists, dedup by key
                          (lightrag/operate.py:4880-4934)

All are small-output jobs; `one_hop_edges` broadcasts the seed set instead of
joining (semi-join via ``ray.put``).
"""

from __future__ import annotations

import pyarrow as pa


def node_degrees(edges_ds):
    """edge table → (entity_id, degree)."""
    from ray.data.aggregate import Count

    def explode(batch: pa.Table) -> pa.Table:
        srcs = batch.column("src_id").to_pylist()
        tgts = batch.column("tgt_id").to_pylist()
        return pa.table({"entity_id": pa.array(srcs + tgts, pa.string())})

    ends = edges_ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    return ends.groupby("entity_id").aggregate(Count(alias_name="degree"))


def rank_edges(edges_ds):
    """edge table → edges with ``rank`` = deg(src)+deg(tgt), sorted by
    (rank, weight) descending."""
    import ray

    deg_table = node_degrees(edges_ds).to_pandas()
    deg_ref = ray.put(dict(zip(deg_table["entity_id"], deg_table["degree"])))

    def add_rank(batch: pa.Table) -> pa.Table:
        deg = ray.get(deg_ref)
        srcs = batch.column("src_id").to_pylist()
        tgts = batch.column("tgt_id").to_pylist()
        ranks = [int(deg.get(s, 0)) + int(deg.get(t, 0)) for s, t in zip(srcs, tgts)]
        return batch.append_column("rank", pa.array(ranks, pa.int64()))

    ranked = edges_ds.map_batches(
        add_rank, batch_format="pyarrow", zero_copy_batch=True
    )
    return ranked.sort(["rank", "weight"], descending=[True, True])


def popular_labels(edges_ds, k: int = 20):
    return node_degrees(edges_ds).sort(
        ["degree", "entity_id"], descending=[True, False]
    ).limit(k)


def one_hop_edges(edges_ds, seed_entities: list[str]):
    """Edges touching any seed entity (broadcast semi-join), ranked."""
    import ray

    seeds_ref = ray.put(set(seed_entities))

    def touch(batch: pa.Table) -> pa.Table:
        seeds = ray.get(seeds_ref)
        srcs = batch.column("src_id").to_pylist()
        tgts = batch.column("tgt_id").to_pylist()
        mask = pa.array([s in seeds or t in seeds for s, t in zip(srcs, tgts)])
        return batch.filter(mask)

    return rank_edges(
        edges_ds.map_batches(touch, batch_format="pyarrow", zero_copy_batch=True)
    )


def dedup_chunk_hits(entities_with_chunks: list[dict]) -> list[dict]:
    """First-entity-wins chunk dedup + per-entity occurrence counting
    (pure function, reference lightrag/operate.py:5739-5753)."""
    occurrence: dict[str, int] = {}
    out = []
    for info in entities_with_chunks:
        kept = []
        for chunk_id in info["chunks"]:
            occurrence[chunk_id] = occurrence.get(chunk_id, 0) + 1
            if occurrence[chunk_id] == 1:
                kept.append(chunk_id)
        out.append({**info, "chunks": kept})
    return out


def round_robin_merge(list_a: list[dict], list_b: list[dict], key) -> list[dict]:
    """Interleave two ranked lists a,b,a,b..., dropping later duplicates by
    ``key`` (reference lightrag/operate.py:4880-4934)."""
    merged: list[dict] = []
    seen = set()
    for i in range(max(len(list_a), len(list_b))):
        for lst in (list_a, list_b):
            if i < len(lst):
                k = key(lst[i])
                if k not in seen:
                    seen.add(k)
                    merged.append(lst[i])
    return merged
