"""Graph admin surface: manual entity merge / entity edit / relation edit.

Re-expresses the reference's admin operations as Dataset transformations over
the output node/edge tables:

  - ``merge_entities``  ← ``amerge_entities`` (lightrag/utils_graph.py:1848-1960)
    via ``_merge_entities_impl`` (:1343-1600) and ``_merge_attributes``
    (:1963-2040): per-field strategies (description=concatenate,
    entity_type=keep_first, provenance=join_unique; relations additionally
    keywords=join_unique_comma, weight=max), incident-edge rewiring with
    self-loop skipping and per-normalized-pair dedup-merge.
  - ``edit_entity``     ← ``aedit_entity`` (:572-838) /
    ``_edit_entity_impl``: property update; rename rewires incident edges;
    rename onto an existing name merges when ``allow_merge``.
  - ``edit_relation``   ← ``aedit_relation`` (:839-1000): property update on
    the undirected pair, weight coerced to float.

Scale shape: the TABLES stream — untouched rows pass through a broadcast
filter; only the touched rows (the named entities and their incident edges,
bounded by those entities' degree) are materialized driver-side for the merge
arithmetic, then unioned back.  All outputs are new lazy Datasets; callers
persist with ``write_parquet``.

Deterministic deviations (documented, consistent with stages/merge.py):
``join_unique`` keeps FIRST-SEEN order (the reference joins a Python set —
iteration order is hash-seed dependent); incident edges process in sorted
(src, tgt) order (the reference follows NetworkX adjacency insertion order).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from lightrag_ray.constants import GRAPH_FIELD_SEP
from lightrag_ray.functions.text import normalize_entity_name
from lightrag_ray.pipelines.query_ops import broadcast_fetch

# ---------------------------------------------------------------------------
# field-merge strategies (reference _merge_attributes, utils_graph.py:1963-2040)
# adapted to our Arrow list columns

ENTITY_MERGE_STRATEGY = {
    "description": "concatenate",
    "entity_type": "keep_first",
    "source_ids": "join_unique",
    "file_paths": "join_unique",
}

RELATION_MERGE_STRATEGY = {
    "description": "concatenate",
    "keywords": "join_unique_comma",
    "source_ids": "join_unique",
    "file_paths": "join_unique",
    "weight": "max",
}


def _merge_attributes(
    data_list: list[dict], strategy: dict[str, str], filter_none_only: bool = False
) -> dict:
    merged: dict[str, Any] = {}
    all_keys: dict[str, None] = {}
    for data in data_list:
        for k in data:
            all_keys.setdefault(k)
    for key in all_keys:
        if filter_none_only:
            values = [d.get(key) for d in data_list if d.get(key) is not None]
        else:
            values = [d.get(key) for d in data_list if _truthy(d.get(key))]
        if not values:
            continue
        strat = strategy.get(key, "keep_first")
        if strat == "concatenate":
            merged[key] = GRAPH_FIELD_SEP.join(str(v) for v in values)
        elif strat == "keep_last":
            merged[key] = values[-1]
        elif strat == "join_unique":
            # list-valued provenance columns: first-seen ordered union
            out: dict[str, None] = {}
            for v in values:
                items = v if isinstance(v, (list, tuple)) else str(v).split(
                    GRAPH_FIELD_SEP
                )
                for item in items:
                    out.setdefault(item)
            merged[key] = list(out)
        elif strat == "join_unique_comma":
            items: set[str] = set()
            for v in values:
                parts = v if isinstance(v, (list, tuple)) else str(v).split(",")
                items.update(p.strip() for p in parts if str(p).strip())
            merged[key] = sorted(items)
        elif strat == "max":
            try:
                merged[key] = max(float(v) for v in values)
            except (ValueError, TypeError):
                merged[key] = values[0]
        else:  # keep_first
            merged[key] = values[0]
    return merged


def _truthy(v: Any) -> bool:
    if isinstance(v, (list, tuple)):
        return len(v) > 0
    return bool(v)


# ---------------------------------------------------------------------------
# helpers


def _names_of(batch: pa.Table) -> list[str]:
    return batch.column("entity_id").to_pylist()


def _fetch_nodes(nodes_ds, names: list[str]) -> dict[str, dict]:
    return broadcast_fetch(nodes_ds, names, _names_of)


def _resolve_name(requested: str, present: set[str]) -> str:
    """Prefer the exact (legacy) spelling when that node exists, else the
    extraction-normalized identifier (utils_graph.py:1908-1945)."""
    normalized = normalize_entity_name(requested)
    if requested != normalized and requested in present:
        return requested
    if not normalized:
        raise ValueError("Entity name cannot be empty after normalization")
    return normalized


def _drop_nodes(nodes_ds, names: set[str]):
    import ray

    ref = ray.put(frozenset(names))

    def keep(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ref)
        mask = pa.array([n not in wanted for n in _names_of(batch)])
        return batch.filter(mask)

    return nodes_ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def _split_edges(edges_ds, names: set[str]):
    """(untouched_ds, touched_rows): edges with any endpoint in ``names`` are
    materialized (bounded by those entities' degree), the rest stream."""
    import ray

    ref = ray.put(frozenset(names))

    def pass_through(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ref)
        mask = pa.array(
            [
                s not in wanted and t not in wanted
                for s, t in zip(
                    batch.column("src_id").to_pylist(),
                    batch.column("tgt_id").to_pylist(),
                )
            ]
        )
        return batch.filter(mask)

    def touched(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ref)
        mask = pa.array(
            [
                s in wanted or t in wanted
                for s, t in zip(
                    batch.column("src_id").to_pylist(),
                    batch.column("tgt_id").to_pylist(),
                )
            ]
        )
        return batch.filter(mask)

    untouched = edges_ds.map_batches(
        pass_through, batch_format="pyarrow", zero_copy_batch=True
    )
    touched_rows = edges_ds.map_batches(
        touched, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    return untouched, touched_rows


def _union_rows(ds, rows: list[dict], schema: pa.Schema):
    import ray.data as rd

    if not rows:
        return ds
    table = pa.Table.from_pylist(
        [{f.name: r.get(f.name) for f in schema} for r in rows], schema=schema
    )
    return ds.union(rd.from_arrow(table))


def _arrow_schema(ds) -> pa.Schema:
    schema = ds.schema()
    return getattr(schema, "base_schema", schema)


# ---------------------------------------------------------------------------
# merge_entities


def merge_entities(
    nodes_ds,
    edges_ds,
    source_entities: list[str],
    target_entity: str,
    target_entity_data: dict | None = None,
):
    """Merge ``source_entities`` into ``target_entity``; returns
    (nodes_ds, edges_ds, merged_node_row)."""
    if not source_entities:
        raise ValueError("At least one source entity is required for merge")

    node_schema = _arrow_schema(nodes_ds)
    edge_schema = _arrow_schema(edges_ds)

    candidates = set(source_entities) | {target_entity}
    candidates |= {normalize_entity_name(n) for n in candidates}
    candidates.discard("")
    present_rows = _fetch_nodes(nodes_ds, sorted(candidates))
    present = set(present_rows)

    resolved_sources: list[str] = []
    for name in source_entities:
        resolved = _resolve_name(name, present)
        if resolved not in resolved_sources:
            resolved_sources.append(resolved)
    target = _resolve_name(target_entity, present)

    for name in resolved_sources:
        if name not in present:
            raise ValueError(f"Source entity '{name}' does not exist")
    target_exists = target in present

    # 3. merge node attributes (sources in caller order, then existing target)
    data_list = [present_rows[n] for n in resolved_sources]
    if target_exists and target not in resolved_sources:
        data_list.append(present_rows[target])
    merged_node = _merge_attributes(data_list, ENTITY_MERGE_STRATEGY)
    merged_node.update(target_entity_data or {})
    merged_node["entity_id"] = target

    # 4-6. rewire incident edges (see module docstring on ordering)
    collect = list(resolved_sources)
    if target_exists and target not in collect:
        collect.append(target)
    untouched, touched_rows = _split_edges(edges_ds, set(collect))
    # per entity in collect order, incident edges in sorted (src, tgt) order
    by_pair: dict[tuple[str, str], dict] = {
        (r["src_id"], r["tgt_id"]): r for r in touched_rows
    }
    sources_set = set(resolved_sources)
    relation_updates: dict[tuple[str, str], dict] = {}
    seen_pairs: set[tuple[str, str]] = set()
    for entity in collect:
        incident = sorted(
            (k for k in by_pair if entity in k), key=lambda k: (k[0], k[1])
        )
        for pair in incident:
            if pair in seen_pairs:
                continue  # edge between two merged entities: process once
            seen_pairs.add(pair)
            edge = by_pair[pair]
            new_src = target if edge["src_id"] in sources_set else edge["src_id"]
            new_tgt = target if edge["tgt_id"] in sources_set else edge["tgt_id"]
            if new_src == new_tgt:
                continue  # self-loop between merged entities
            key = tuple(sorted((new_src, new_tgt)))
            payload = dict(edge, src_id=key[0], tgt_id=key[1])
            if key in relation_updates:
                relation_updates[key] = dict(
                    relation_updates[key],
                    **_merge_attributes(
                        [relation_updates[key], payload],
                        RELATION_MERGE_STRATEGY,
                        filter_none_only=True,
                    ),
                )
                relation_updates[key]["src_id"], relation_updates[key]["tgt_id"] = key
            else:
                relation_updates[key] = payload

    new_nodes = _union_rows(
        _drop_nodes(nodes_ds, set(collect)), [merged_node], node_schema
    )
    new_edges = _union_rows(
        untouched, list(relation_updates.values()), edge_schema
    )
    return new_nodes, new_edges, merged_node


# ---------------------------------------------------------------------------
# delete_entity / delete_relation (lightrag/utils_graph.py:81-260)


def delete_entity(nodes_ds, edges_ds, entity_name: str):
    """Delete one entity and every incident relation
    (``adelete_by_entity``); returns (nodes_ds, edges_ds, status).  One
    streaming filter per table — incident edges are never materialized
    driver-side (a hub entity may have millions)."""
    import ray

    candidates = {entity_name, normalize_entity_name(entity_name)}
    candidates.discard("")
    present = _fetch_nodes(nodes_ds, sorted(candidates))
    try:
        name = _resolve_name(entity_name, set(present))
    except ValueError:
        return nodes_ds, edges_ds, "not_found"
    if name not in present:
        return nodes_ds, edges_ds, "not_found"

    name_ref = ray.put(name)

    def keep_edges(batch: pa.Table) -> pa.Table:
        n = ray.get(name_ref)
        mask = pa.array(
            [
                s != n and t != n
                for s, t in zip(
                    batch.column("src_id").to_pylist(),
                    batch.column("tgt_id").to_pylist(),
                )
            ]
        )
        return batch.filter(mask)

    remaining_edges = edges_ds.map_batches(
        keep_edges, batch_format="pyarrow", zero_copy_batch=True
    )
    return _drop_nodes(nodes_ds, {name}), remaining_edges, "success"


def _edge_pair_keys(batch: pa.Table) -> list[str]:
    return [
        "\x00".join(sorted((s, t)))
        for s, t in zip(
            batch.column("src_id").to_pylist(),
            batch.column("tgt_id").to_pylist(),
        )
    ]


def delete_relation(edges_ds, source_entity: str, target_entity: str):
    """Delete one undirected relation (``adelete_by_relation``); returns
    (edges_ds, status).  Missing pairs return ``"not_found"`` (the reference
    checks has_edge and warns); both the normalized spelling and the
    caller's exact (legacy) spelling are matched, consistent with
    ``_resolve_name``'s legacy-name contract."""
    import ray

    raw = "\x00".join(sorted((source_entity, target_entity)))
    norm = "\x00".join(
        sorted(
            (normalize_entity_name(source_entity),
             normalize_entity_name(target_entity))
        )
    )
    wanted = {raw, norm}
    found = broadcast_fetch(edges_ds, sorted(wanted), _edge_pair_keys)
    if not found:
        return edges_ds, "not_found"
    keys_ref = ray.put(frozenset(found))

    def keep(batch: pa.Table) -> pa.Table:
        drop = ray.get(keys_ref)
        mask = pa.array([k not in drop for k in _edge_pair_keys(batch)])
        return batch.filter(mask)

    return (
        edges_ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True),
        "success",
    )


# ---------------------------------------------------------------------------
# insert_custom_kg (direct writer, lightrag/lightrag.py:3237-3480)


def insert_custom_kg(nodes_ds, edges_ds, custom_kg: dict):
    """Insert caller-constructed KG objects directly into the tables
    (``ainsert_custom_kg``): names normalized with the extraction contract,
    last-wins dedup within the payload, entity defaults
    ``entity_type=UNKNOWN`` / ``"No description provided"``, chunk-level
    ``source_id`` resolved through the payload's chunks; rows with existing
    keys are REPLACED (the reference upserts node data wholesale, it does
    not merge).  Returns (nodes_ds, edges_ds, chunk_rows)."""
    from lightrag_ray.functions.text import sanitize_text_for_encoding

    node_schema = _arrow_schema(nodes_ds)
    edge_schema = _arrow_schema(edges_ds)

    chunk_rows = []
    chunk_to_source: dict[str, str] = {}
    for i, chunk in enumerate(custom_kg.get("chunks", [])):
        content = sanitize_text_for_encoding(chunk["content"])
        source_id = chunk["source_id"]
        chunk_to_source[source_id] = source_id
        chunk_rows.append(
            {
                "chunk_id": source_id,
                "content": content,
                "chunk_order_index": chunk.get("chunk_order_index", 0),
                "file_path": chunk.get("file_path", "custom_kg"),
            }
        )

    def _norm(value, field):
        if not isinstance(value, str):
            raise ValueError(f"Custom KG {field} must be a string")
        normalized = normalize_entity_name(value)
        if not normalized:
            raise ValueError(f"Custom KG {field} cannot be empty after normalization")
        return normalized

    deduped_entities: dict[str, dict] = {}
    for i, e in enumerate(custom_kg.get("entities", [])):
        name = _norm(e["entity_name"], f"entities[{i}].entity_name")
        deduped_entities.pop(name, None)  # last wins, at last position
        deduped_entities[name] = e
    node_rows = []
    for name, e in deduped_entities.items():
        source_id = chunk_to_source.get(e.get("source_id", "UNKNOWN"), "UNKNOWN")
        node_rows.append(
            {
                "entity_id": name,
                "entity_type": e.get("entity_type", "UNKNOWN"),
                "description": e.get("description", "No description provided"),
                "source_ids": [source_id],
                "file_paths": [e.get("file_path", "custom_kg")],
                "created_at": int(e.get("created_at", 0)),
                "truncate": "",
            }
        )

    deduped_rels: dict[tuple[str, str], dict] = {}
    for i, r in enumerate(custom_kg.get("relationships", [])):
        src = _norm(r["src_id"], f"relationships[{i}].src_id")
        tgt = _norm(r["tgt_id"], f"relationships[{i}].tgt_id")
        key = tuple(sorted((src, tgt)))
        deduped_rels.pop(key, None)
        deduped_rels[key] = dict(r, src_id=src, tgt_id=tgt)
    edge_rows = []
    for (a, b), r in deduped_rels.items():
        source_id = chunk_to_source.get(r.get("source_id", "UNKNOWN"), "UNKNOWN")
        kw = r.get("keywords", "")
        edge_rows.append(
            {
                "src_id": a,
                "tgt_id": b,
                "weight": float(r.get("weight", 1.0)),
                "description": r.get("description", ""),
                "keywords": [k.strip() for k in str(kw).split(",") if k.strip()],
                "source_ids": [source_id],
                "file_paths": [r.get("file_path", "custom_kg")],
                "created_at": int(r.get("created_at", 0)),
                "truncate": "",
            }
        )

    new_nodes = _union_rows(
        _drop_nodes(nodes_ds, set(deduped_entities)), node_rows, node_schema
    )
    # replace any existing edge rows for the inserted pairs
    import ray

    pair_ref = ray.put(frozenset(deduped_rels))

    def drop_pairs(batch: pa.Table) -> pa.Table:
        wanted = ray.get(pair_ref)
        mask = pa.array(
            [
                tuple(sorted((s, t))) not in wanted
                for s, t in zip(
                    batch.column("src_id").to_pylist(),
                    batch.column("tgt_id").to_pylist(),
                )
            ]
        )
        return batch.filter(mask)

    remaining = edges_ds.map_batches(
        drop_pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    new_edges = _union_rows(remaining, edge_rows, edge_schema)
    return new_nodes, new_edges, chunk_rows


# ---------------------------------------------------------------------------
# edit_entity / edit_relation


def edit_entity(
    nodes_ds,
    edges_ds,
    entity_name: str,
    updated_data: dict,
    allow_rename: bool = True,
    allow_merge: bool = False,
):
    """Update (and optionally rename) one entity; returns
    (nodes_ds, edges_ds, updated_node_row)."""
    if "description" in updated_data and not updated_data["description"]:
        raise ValueError("description cannot be empty")
    updated_data = dict(updated_data)
    node_schema = _arrow_schema(nodes_ds)
    edge_schema = _arrow_schema(edges_ds)

    candidates = {entity_name, normalize_entity_name(entity_name)}
    new_name_req = updated_data.get("entity_name")
    if new_name_req:
        candidates |= {new_name_req, normalize_entity_name(new_name_req)}
    candidates.discard("")
    present_rows = _fetch_nodes(nodes_ds, sorted(candidates))
    present = set(present_rows)

    name = _resolve_name(entity_name, present)
    if name not in present:
        raise ValueError(f"Entity '{name}' does not exist")
    new_name = _resolve_name(new_name_req, present) if new_name_req else name
    is_renaming = new_name != name
    if is_renaming and not allow_rename:
        raise ValueError(
            "Entity renaming is not allowed. Set allow_rename=True to enable"
        )

    if is_renaming and new_name in present:
        if not allow_merge:
            raise ValueError(
                f"Entity name '{new_name}' already exists, cannot rename"
            )
        # non-name updates apply first, then merge (aedit_entity:723-760)
        non_name = {k: v for k, v in updated_data.items() if k != "entity_name"}
        if non_name:
            nodes_ds, edges_ds, _ = edit_entity(
                nodes_ds, edges_ds, name, non_name
            )
        return merge_entities(nodes_ds, edges_ds, [name], new_name)

    updated_row = dict(present_rows[name], **{
        k: v for k, v in updated_data.items() if k != "entity_name"
    })
    updated_row["entity_id"] = new_name

    new_nodes = _union_rows(_drop_nodes(nodes_ds, {name}), [updated_row], node_schema)
    if not is_renaming:
        return new_nodes, edges_ds, updated_row

    untouched, touched_rows = _split_edges(edges_ds, {name})
    rewired = []
    for edge in touched_rows:
        new_src = new_name if edge["src_id"] == name else edge["src_id"]
        new_tgt = new_name if edge["tgt_id"] == name else edge["tgt_id"]
        a, b = sorted((new_src, new_tgt))
        rewired.append(dict(edge, src_id=a, tgt_id=b))
    return new_nodes, _union_rows(untouched, rewired, edge_schema), updated_row


def edit_relation(
    edges_ds, source_entity: str, target_entity: str, updated_data: dict
):
    """Update one undirected relation's properties; returns
    (edges_ds, updated_edge_row)."""
    if "description" in updated_data and not updated_data["description"]:
        raise ValueError("description cannot be empty")
    edge_schema = _arrow_schema(edges_ds)
    a, b = sorted(
        (normalize_entity_name(source_entity), normalize_entity_name(target_entity))
    )

    def pair_keys(batch: pa.Table) -> list[str]:
        return [
            "\x00".join(sorted((s, t)))
            for s, t in zip(
                batch.column("src_id").to_pylist(),
                batch.column("tgt_id").to_pylist(),
            )
        ]

    key = f"{a}\x00{b}"
    found = broadcast_fetch(edges_ds, [key], pair_keys)
    if key not in found:
        raise ValueError(f"Relation from '{a}' to '{b}' does not exist")
    edge = found[key]
    new_edge = {**edge, **updated_data}
    new_edge["weight"] = float(new_edge.get("weight", 1.0))
    new_edge["src_id"], new_edge["tgt_id"] = a, b

    import ray

    ref = ray.put(key)

    def drop_pair(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ref)
        mask = pa.array([k != wanted for k in pair_keys(batch)])
        return batch.filter(mask)

    remaining = edges_ds.map_batches(
        drop_pair, batch_format="pyarrow", zero_copy_batch=True
    )
    return _union_rows(remaining, [new_edge], edge_schema), new_edge


# ---------------------------------------------------------------------------
# create_entity / create_relation (reference acreate_entity /
# acreate_relation, utils_graph.py:1036-1341) and entity/relation info
# lookups (utils_graph.py:2043-2110).


def _require_description(value: Any, what: str) -> None:
    if not isinstance(value, str) or not value.strip():
        raise ValueError(f"A non-empty description is required to create a {what}")


def create_entity(
    nodes_ds,
    entity_name: str,
    entity_data: dict[str, Any],
    created_at: int = 0,
):
    """Create a new entity row (``acreate_entity``): the name takes the
    extraction naming contract, creation refuses BOTH spellings when either
    already exists, defaults are ``entity_type=UNKNOWN`` and
    ``manual_creation`` provenance.  Returns ``(nodes_ds, node_row)``."""
    _require_description(entity_data.get("description"), "entity")
    requested = entity_name
    if not isinstance(requested, str):
        raise ValueError("Entity name must be a string")
    normalized = normalize_entity_name(requested)
    if not normalized:
        raise ValueError("Entity name cannot be empty after normalization")

    present = _fetch_nodes(nodes_ds, list({requested, normalized}))
    if requested != normalized and requested in present:
        raise ValueError(f"Entity '{requested}' already exists")
    if normalized in present:
        raise ValueError(f"Entity '{normalized}' already exists")

    source_id = str(entity_data.get("source_id", "manual_creation"))
    file_path = str(entity_data.get("file_path", "manual_creation"))
    row = {
        "entity_id": normalized,
        "entity_type": entity_data.get("entity_type", "UNKNOWN"),
        "description": entity_data.get("description", ""),
        "source_ids": [s for s in source_id.split(GRAPH_FIELD_SEP) if s],
        "file_paths": [s for s in file_path.split(GRAPH_FIELD_SEP) if s],
        "created_at": int(created_at),
        "truncate": "",
    }
    return _union_rows(nodes_ds, [row], _arrow_schema(nodes_ds)), row


def create_relation(
    nodes_ds,
    edges_ds,
    source_entity: str,
    target_entity: str,
    relation_data: dict[str, Any],
    created_at: int = 0,
):
    """Create a new relation row (``acreate_relation``): both endpoints must
    exist, the undirected pair must not, ``weight`` coerces to float with
    default 1.0.  Returns ``(edges_ds, edge_row)``."""
    _require_description(relation_data.get("description"), "relation")
    present = _fetch_nodes(nodes_ds, [source_entity, target_entity])
    if source_entity not in present:
        raise ValueError(f"Source entity '{source_entity}' does not exist")
    if target_entity not in present:
        raise ValueError(f"Target entity '{target_entity}' does not exist")
    a, b = sorted((source_entity, target_entity))

    def pair_keys(batch: pa.Table) -> list[str]:
        return [
            "\x00".join(sorted((s, t)))
            for s, t in zip(
                batch.column("src_id").to_pylist(),
                batch.column("tgt_id").to_pylist(),
            )
        ]

    if f"{a}\x00{b}" in broadcast_fetch(edges_ds, [f"{a}\x00{b}"], pair_keys):
        raise ValueError(
            f"Relation from '{source_entity}' to '{target_entity}' already exists"
        )

    keywords = relation_data.get("keywords", "")
    source_id = str(relation_data.get("source_id", "manual_creation"))
    file_path = str(relation_data.get("file_path", "manual_creation"))
    row = {
        "src_id": a,
        "tgt_id": b,
        "weight": float(relation_data.get("weight", 1.0)),
        "description": relation_data.get("description", ""),
        "keywords": [k.strip() for k in str(keywords).split(",") if k.strip()],
        "source_ids": [s for s in source_id.split(GRAPH_FIELD_SEP) if s],
        "file_paths": [s for s in file_path.split(GRAPH_FIELD_SEP) if s],
        "created_at": int(created_at),
        "truncate": "",
    }
    return _union_rows(edges_ds, [row], _arrow_schema(edges_ds)), row


def get_entity_info(nodes_ds, entity_name: str) -> dict[str, Any]:
    """``get_entity_info``: one broadcast lookup; ``graph_data`` is None for
    a missing entity (never raises)."""
    node = _fetch_nodes(nodes_ds, [entity_name]).get(entity_name)
    return {
        "entity_name": entity_name,
        "source_id": (node or {}).get("source_ids") or None,
        "graph_data": node,
    }


def get_relation_info(edges_ds, src_entity: str, tgt_entity: str) -> dict[str, Any]:
    """``get_relation_info``: undirected pair lookup; swapping the endpoints
    resolves the same relation."""

    def pair_keys(batch: pa.Table) -> list[str]:
        return [
            "\x00".join(sorted((s, t)))
            for s, t in zip(
                batch.column("src_id").to_pylist(),
                batch.column("tgt_id").to_pylist(),
            )
        ]

    key = "\x00".join(sorted((src_entity, tgt_entity)))
    edge = broadcast_fetch(edges_ds, [key], pair_keys).get(key)
    return {
        "src_entity": src_entity,
        "tgt_entity": tgt_entity,
        "source_id": (edge or {}).get("source_ids") or None,
        "graph_data": edge,
    }
