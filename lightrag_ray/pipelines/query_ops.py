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


def rank_edges(edges_ds, degree_join: str = "broadcast"):
    """edge table → edges with ``rank`` = deg(src)+deg(tgt), sorted by
    (rank, weight) descending.

    ``degree_join``:
      - ``"broadcast"`` (default): collect the degree table driver-side and
        ``ray.put`` it as a lookup dict.  Right for the REDUCED graph
        (degree table ≪ corpus), bounded by a hard row guard — at 10⁸+
        entities use the shuffle path instead.
      - ``"shuffle"``: two distributed hash joins (``Dataset.join`` on
        src then tgt) — no driver materialization, scale-safe.
    """
    import ray

    if degree_join == "shuffle":
        # Two keyed aggregations instead of Dataset.join (Ray 2.49's hash
        # join crashes on empty partitions — schema-less blocks): explode
        # each edge to one row per endpoint, groupby(entity) attaches the
        # group size as that endpoint's degree, groupby(edge) sums the two
        # contributions back onto one payload row.  No driver materialization.
        import pandas as pd

        def explode_payload(batch: pa.Table) -> pa.Table:
            import uuid

            # per-ROW key (uuid), not the (src,tgt) pair: duplicate edge rows
            # must each survive the reassembly groupby with their own rank
            keys = [uuid.uuid4().hex for _ in range(batch.num_rows)]
            key_col = pa.array(keys + keys, pa.string())
            ends = pa.array(
                batch.column("src_id").to_pylist()
                + batch.column("tgt_id").to_pylist(),
                pa.string(),
            )
            doubled = pa.concat_tables([batch, batch])
            return doubled.append_column("_edge_key", key_col).append_column(
                "_end", ends
            )

        def per_entity(group: pd.DataFrame) -> pd.DataFrame:
            group = group.copy()
            group["_deg"] = len(group)
            return group

        def per_edge(group: pd.DataFrame) -> pd.DataFrame:
            first = group.iloc[[0]].copy()
            first["rank"] = int(group["_deg"].sum())
            return first.drop(columns=["_edge_key", "_end", "_deg"])

        exploded = edges_ds.map_batches(
            explode_payload, batch_format="pyarrow", zero_copy_batch=True
        )
        with_deg = exploded.groupby("_end").map_groups(
            per_entity, batch_format="pandas"
        )
        ranked = with_deg.groupby("_edge_key").map_groups(
            per_edge, batch_format="pandas"
        )
        return ranked.sort(["rank", "weight"], descending=[True, True])

    MAX_BROADCAST_NODES = 5_000_000  # ~100 MB dict; beyond this, shuffle
    deg_table = node_degrees(edges_ds).to_pandas()
    if len(deg_table) > MAX_BROADCAST_NODES:
        raise ValueError(
            f"degree table has {len(deg_table)} nodes — too large to "
            'broadcast; call rank_edges(..., degree_join="shuffle")'
        )
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


def broadcast_fetch(ds, keys: list[str], key_of_batch) -> dict[str, dict]:
    """Fetch full rows for a SMALL key set from a large table: the key set is
    broadcast (``ray.put`` once), the table streams through a filter — the
    de-driverized replacement for iter_rows()-built lookup dicts (round-1
    VERDICT flag on query_path).  ``key_of_batch(batch) -> list[str]``
    computes each row's key.  Returns {key: row}."""
    import ray

    if not keys:
        return {}
    keys_ref = ray.put(frozenset(keys))

    def keep(batch: pa.Table) -> pa.Table:
        wanted = ray.get(keys_ref)
        row_keys = key_of_batch(batch)
        mask = pa.array([k in wanted for k in row_keys])
        return batch.append_column("_fetch_key", pa.array(row_keys, pa.string())).filter(
            mask
        )

    rows = ds.map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    return {row.pop("_fetch_key"): row for row in rows}


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


def pick_by_weighted_polling(
    entities_or_relations: list[dict],
    max_related_chunks: int,
    min_related_chunks: int = 1,
) -> list[str]:
    """Linear-gradient weighted polling chunk selection (reference
    ``pick_by_weighted_polling``, lightrag/utils.py:5189-5268): importance
    rank i gets a linearly decreasing chunk quota, then leftover quota is
    round-robin scanned.  Items carry ``sorted_chunks``."""
    if not entities_or_relations or max_related_chunks <= 0:
        return []
    n = len(entities_or_relations)
    if n == 1:
        return entities_or_relations[0].get("sorted_chunks", [])[
            :max_related_chunks
        ]
    expected_counts = []
    for i in range(n):
        ratio = i / (n - 1)
        expected_counts.append(
            int(
                round(
                    max_related_chunks
                    - ratio * (max_related_chunks - min_related_chunks)
                )
            )
        )
    selected, used, total_remaining = [], [], 0
    for i, item in enumerate(entities_or_relations):
        chunks = item.get("sorted_chunks", [])
        actual = min(expected_counts[i], len(chunks))
        selected.extend(chunks[:actual])
        used.append(actual)
        total_remaining += max(0, expected_counts[i] - actual)
    for _ in range(total_remaining):
        for i, item in enumerate(entities_or_relations):
            chunks = item.get("sorted_chunks", [])
            if used[i] < len(chunks):
                selected.append(chunks[used[i]])
                used[i] += 1
                break
        else:
            break
    return selected


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
