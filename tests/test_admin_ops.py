"""Graph admin ops (merge_entities / edit_entity / edit_relation) vs the
reference's manual-merge implementation driven over an in-memory graph
(lightrag/utils_graph.py:1343-1600, 1963-2040)."""

from __future__ import annotations

import asyncio

import pyarrow as pa
import pytest

from lightrag_ray.constants import GRAPH_FIELD_SEP
from lightrag_ray.pipelines.admin import (
    edit_entity,
    edit_relation,
    merge_entities,
)

NODE_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("entity_type", pa.string()),
        ("description", pa.string()),
        ("source_ids", pa.list_(pa.string())),
        ("file_paths", pa.list_(pa.string())),
        ("created_at", pa.int64()),
        ("truncate", pa.string()),
    ]
)

EDGE_SCHEMA = pa.schema(
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
    ]
)


def _node(name, etype="person", desc=None, sids=("c1",), fps=("f1",)):
    return {
        "entity_id": name,
        "entity_type": etype,
        "description": desc or f"{name} description",
        "source_ids": list(sids),
        "file_paths": list(fps),
        "created_at": 1,
        "truncate": "",
    }


def _edge(src, tgt, weight=1.0, desc=None, kws=("kw",), sids=("c1",)):
    return {
        "src_id": src,
        "tgt_id": tgt,
        "weight": weight,
        "description": desc or f"{src}~{tgt}",
        "keywords": list(kws),
        "source_ids": list(sids),
        "file_paths": ["f1"],
        "created_at": 1,
        "truncate": "",
    }


def _datasets(nodes, edges):
    import ray.data as rd

    return (
        rd.from_arrow(pa.Table.from_pylist(nodes, schema=NODE_SCHEMA)),
        rd.from_arrow(pa.Table.from_pylist(edges, schema=EDGE_SCHEMA)),
    )


# ---------------------------------------------------------------------------
# reference oracle: _merge_entities_impl over an in-memory graph


class _Graph:
    def __init__(self, nodes, edges):
        self.nodes = {n["entity_id"]: dict(n) for n in nodes}
        self.edges = {(e["src_id"], e["tgt_id"]): dict(e) for e in edges}

    async def has_node(self, name):
        return name in self.nodes

    async def get_node(self, name):
        return self.nodes.get(name)

    async def upsert_node(self, name, data):
        self.nodes[name] = dict(data)

    async def get_node_edges(self, name):
        out = []
        for s, t in sorted(self.edges):
            if s == name:
                out.append((s, t))
            elif t == name:
                out.append((name, s))  # networkx returns (query, other)
        return out

    async def get_edge(self, src, tgt):
        return self.edges.get((src, tgt)) or self.edges.get((tgt, src))

    async def upsert_edge(self, src, tgt, data):
        if (tgt, src) in self.edges:
            self.edges[(tgt, src)] = dict(data)
        else:
            self.edges[(src, tgt)] = dict(data)

    async def delete_node(self, name):
        self.nodes.pop(name, None)
        for k in [k for k in self.edges if name in k]:
            del self.edges[k]

    async def index_done_callback(self):
        pass


class _Vdb:
    global_config: dict = {}

    async def upsert(self, data):
        pass

    async def delete(self, ids):
        pass

    async def delete_entity(self, name):
        pass

    async def index_done_callback(self):
        pass


def _to_sep(row, list_cols=("source_ids", "file_paths"), kw=False):
    """Our list-column row → the reference's <SEP>-joined flat dict."""
    out = dict(row)
    out["source_id"] = GRAPH_FIELD_SEP.join(out.pop("source_ids"))
    out["file_path"] = GRAPH_FIELD_SEP.join(out.pop("file_paths"))
    if kw:
        out["keywords"] = ",".join(out.pop("keywords"))
    return out


def _run_reference_merge(ref_graph, sources, target, target_data=None):
    import importlib
    import sys

    from conftest import _install_reference_stubs

    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    _install_reference_stubs()
    ug = importlib.import_module("lightrag.utils_graph")
    return asyncio.run(
        ug._merge_entities_impl(
            ref_graph, _Vdb(), _Vdb(), sources, target,
            merge_strategy=None, target_entity_data=target_data,
        )
    )


NODES = [
    _node("alpha corp", "organization", "alpha desc", ("c1", "c2"), ("f1",)),
    _node("alpha inc", "organization", "alpha inc desc", ("c2", "c3"), ("f2",)),
    _node("beta", "person", "beta desc", ("c4",), ("f1",)),
    _node("gamma", "location", "gamma desc", ("c5",), ("f3",)),
]
EDGES = [
    _edge("alpha corp", "beta", 2.0, "ab", ("deal",), ("c1",)),
    _edge("alpha inc", "beta", 3.0, "a2b", ("deal", "joint"), ("c3",)),
    _edge("alpha corp", "alpha inc", 1.0, "self", ("dup",), ("c2",)),
    _edge("beta", "gamma", 1.5, "bg", ("travel",), ("c4",)),
]


def test_merge_entities_parity_with_reference(ray_session):
    nodes_ds, edges_ds = _datasets(NODES, EDGES)
    new_nodes, new_edges, merged = merge_entities(
        nodes_ds, edges_ds, ["alpha corp", "alpha inc"], "alpha"
    )
    ours_nodes = {r["entity_id"]: r for r in new_nodes.take_all()}
    ours_edges = {
        tuple(sorted((r["src_id"], r["tgt_id"]))): r for r in new_edges.take_all()
    }

    ref_graph = _Graph([_to_sep(n) for n in NODES],
                       [_to_sep(e, kw=True) for e in EDGES])
    _run_reference_merge(ref_graph, ["alpha corp", "alpha inc"], "alpha")

    assert set(ours_nodes) == set(ref_graph.nodes)
    ref_alpha = ref_graph.nodes["alpha"]
    assert ours_nodes["alpha"]["description"] == ref_alpha["description"]
    assert ours_nodes["alpha"]["entity_type"] == ref_alpha["entity_type"]
    # reference join_unique iterates a set (order hash-dependent) — compare
    # as sets; ours is first-seen ordered
    assert set(ours_nodes["alpha"]["source_ids"]) == set(
        ref_alpha["source_id"].split(GRAPH_FIELD_SEP)
    )
    assert ours_nodes["alpha"]["source_ids"] == ["c1", "c2", "c3"]

    ref_edges = {tuple(sorted(k)): v for k, v in ref_graph.edges.items()}
    assert set(ours_edges) == set(ref_edges)
    # the two alpha→beta edges collapse into one with weight=max
    merged_edge = ours_edges[("alpha", "beta")]
    ref_edge = ref_edges[("alpha", "beta")]
    assert merged_edge["weight"] == ref_edge["weight"] == 3.0
    assert merged_edge["description"] == ref_edge["description"]
    assert ",".join(merged_edge["keywords"]) == ref_edge["keywords"]
    assert set(merged_edge["source_ids"]) == set(
        ref_edge["source_id"].split(GRAPH_FIELD_SEP)
    )
    # self-loop between the two merged entities dropped on both sides
    assert ("alpha", "alpha") not in ours_edges


def test_merge_into_existing_target_with_override(ray_session):
    nodes_ds, edges_ds = _datasets(NODES, EDGES)
    new_nodes, new_edges, merged = merge_entities(
        nodes_ds, edges_ds, ["gamma"], "beta",
        target_entity_data={"entity_type": "PERSON"},
    )
    ours = {r["entity_id"]: r for r in new_nodes.take_all()}
    assert "gamma" not in ours
    assert ours["beta"]["entity_type"] == "PERSON"  # explicit override wins
    # gamma desc concatenated before existing target's (sources first)
    assert ours["beta"]["description"] == (
        "gamma desc" + GRAPH_FIELD_SEP + "beta desc"
    )
    pairs = {tuple(sorted((r["src_id"], r["tgt_id"]))) for r in new_edges.take_all()}
    assert ("beta", "gamma") not in pairs  # became self-loop, dropped


def test_merge_missing_source_raises(ray_session):
    nodes_ds, edges_ds = _datasets(NODES, EDGES)
    with pytest.raises(ValueError, match="does not exist"):
        merge_entities(nodes_ds, edges_ds, ["nope"], "alpha")


def test_edit_entity_update_and_rename(ray_session):
    nodes_ds, edges_ds = _datasets(NODES, EDGES)
    new_nodes, new_edges, row = edit_entity(
        nodes_ds, edges_ds, "beta",
        {"description": "updated beta", "entity_name": "delta"},
    )
    ours = {r["entity_id"]: r for r in new_nodes.take_all()}
    assert "beta" not in ours and ours["delta"]["description"] == "updated beta"
    pairs = {tuple(sorted((r["src_id"], r["tgt_id"]))) for r in new_edges.take_all()}
    assert ("alpha corp", "delta") in pairs and ("delta", "gamma") in pairs
    assert not any("beta" in p for p in pairs)


def test_edit_entity_rename_onto_existing_requires_allow_merge(ray_session):
    nodes_ds, edges_ds = _datasets(NODES, EDGES)
    with pytest.raises(ValueError, match="already exists"):
        edit_entity(nodes_ds, edges_ds, "gamma", {"entity_name": "beta"})
    new_nodes, _, _ = edit_entity(
        nodes_ds, edges_ds, "gamma", {"entity_name": "beta"}, allow_merge=True
    )
    ours = {r["entity_id"]: r for r in new_nodes.take_all()}
    assert "gamma" not in ours and "beta" in ours


def test_edit_relation(ray_session):
    _, edges_ds = _datasets(NODES, EDGES)
    new_edges, row = edit_relation(
        edges_ds, "beta", "gamma", {"description": "edited", "weight": 9}
    )
    rows = {tuple(sorted((r["src_id"], r["tgt_id"]))): r for r in new_edges.take_all()}
    assert rows[("beta", "gamma")]["description"] == "edited"
    assert rows[("beta", "gamma")]["weight"] == 9.0
    with pytest.raises(ValueError, match="does not exist"):
        edit_relation(edges_ds, "alpha corp", "gamma", {"weight": 1})


def test_insert_custom_kg(ray_session):
    """ainsert_custom_kg semantics (lightrag/lightrag.py:3237): name
    normalization, last-wins payload dedup, UNKNOWN defaults, wholesale
    replacement of existing rows."""
    from lightrag_ray.pipelines.admin import insert_custom_kg

    nodes_ds, edges_ds = _datasets(NODES, EDGES)
    custom = {
        "chunks": [{"content": "custom chunk text", "source_id": "ck-1"}],
        "entities": [
            {"entity_name": '"beta"', "description": "replaced beta",
             "source_id": "ck-1"},
            {"entity_name": "newco", "entity_type": "organization",
             "source_id": "ck-1"},
            {"entity_name": "newco", "entity_type": "startup",
             "source_id": "ck-1"},  # last wins
        ],
        "relationships": [
            {"src_id": "newco", "tgt_id": "beta", "keywords": "custom, link",
             "weight": 2.5, "description": "custom rel", "source_id": "ck-1"},
        ],
    }
    new_nodes, new_edges, chunks = insert_custom_kg(nodes_ds, edges_ds, custom)
    ours = {r["entity_id"]: r for r in new_nodes.take_all()}
    # outer quotes normalized away; existing beta REPLACED, not merged
    assert ours["beta"]["description"] == "replaced beta"
    assert ours["beta"]["source_ids"] == ["ck-1"]
    assert ours["newco"]["entity_type"] == "startup"
    assert ours["alpha corp"]["description"] == "alpha desc"  # untouched
    pairs = {tuple(sorted((r["src_id"], r["tgt_id"]))): r
             for r in new_edges.take_all()}
    assert pairs[("beta", "newco")]["keywords"] == ["custom", "link"]
    assert pairs[("beta", "newco")]["weight"] == 2.5
    assert ("alpha corp", "beta") in pairs  # untouched edge kept
    assert chunks[0]["chunk_id"] == "ck-1"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="must be a string"):
        insert_custom_kg(nodes_ds, edges_ds, {"entities": [{"entity_name": 3}]})


def test_delete_entity_and_relation(ray_session):
    """adelete_by_entity / adelete_by_relation (utils_graph.py:81-260):
    entity delete removes incident edges; relation delete is undirected."""
    from lightrag_ray.pipelines.admin import delete_entity, delete_relation

    nodes_ds, edges_ds = _datasets(NODES, EDGES)
    new_nodes, new_edges, status = delete_entity(nodes_ds, edges_ds, "beta")
    assert status == "success"
    assert "beta" not in {r["entity_id"] for r in new_nodes.take_all()}
    pairs = {tuple(sorted((r["src_id"], r["tgt_id"])))
             for r in new_edges.take_all()}
    assert not any("beta" in p for p in pairs)
    assert ("alpha corp", "alpha inc") in pairs  # untouched edge survives

    _, _, status = delete_entity(nodes_ds, edges_ds, "nonexistent")
    assert status == "not_found"

    new_edges2, status = delete_relation(edges_ds, "gamma", "beta")
    assert status == "success"
    pairs2 = {tuple(sorted((r["src_id"], r["tgt_id"])))
              for r in new_edges2.take_all()}
    assert ("beta", "gamma") not in pairs2 and len(pairs2) == 3
