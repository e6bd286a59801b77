"""knowledge_graph BFS / graph_labels / create+info admin surfaces."""

from __future__ import annotations

import pyarrow as pa
import pytest

NODE_FIELDS = [
    ("entity_id", pa.string()),
    ("entity_type", pa.string()),
    ("description", pa.string()),
    ("source_ids", pa.list_(pa.string())),
    ("file_paths", pa.list_(pa.string())),
    ("created_at", pa.int64()),
    ("truncate", pa.string()),
]
EDGE_FIELDS = [
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


def _nodes_ds(names):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "entity_id": pa.array(names, pa.string()),
                "entity_type": pa.array(["concept"] * len(names), pa.string()),
                "description": pa.array([f"desc {n}" for n in names], pa.string()),
                "source_ids": pa.array([["s1"]] * len(names), pa.list_(pa.string())),
                "file_paths": pa.array([["f1"]] * len(names), pa.list_(pa.string())),
                "created_at": pa.array([1] * len(names), pa.int64()),
                "truncate": pa.array([""] * len(names), pa.string()),
            }
        )
    )


def _edges_ds(pairs):
    import ray.data as rd

    srcs = [min(a, b) for a, b in pairs]
    tgts = [max(a, b) for a, b in pairs]
    n = len(pairs)
    return rd.from_arrow(
        pa.table(
            {
                "src_id": pa.array(srcs, pa.string()),
                "tgt_id": pa.array(tgts, pa.string()),
                "weight": pa.array([1.0] * n, pa.float64()),
                "description": pa.array(["d"] * n, pa.string()),
                "keywords": pa.array([["k"]] * n, pa.list_(pa.string())),
                "source_ids": pa.array([["s1"]] * n, pa.list_(pa.string())),
                "file_paths": pa.array([["f1"]] * n, pa.list_(pa.string())),
                "created_at": pa.array([1] * n, pa.int64()),
                "truncate": pa.array([""] * n, pa.string()),
            }
        )
    )


@pytest.fixture()
def chain(ray_session):
    # a - b - c - d - e   plus hub x connected to b,c,d  and isolated z
    nodes = _nodes_ds(["a", "b", "c", "d", "e", "x", "z"])
    edges = _edges_ds([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
                       ("x", "b"), ("x", "c"), ("x", "d")])
    return nodes, edges


def test_bfs_depth_and_order(chain):
    from lightrag_ray.pipelines.subgraph import knowledge_graph

    nodes, edges = chain
    out = knowledge_graph(nodes, edges, "a", max_depth=1)
    ids = [n["entity_id"] for n in out["nodes"]]
    assert ids == ["a", "b"]  # depth 1 from a
    assert not out["is_truncated"]  # depth stop is not truncation
    # edges restricted to the subgraph
    assert [(e["src_id"], e["tgt_id"]) for e in out["edges"]] == [("a", "b")]


def test_bfs_degree_priority(chain):
    from lightrag_ray.pipelines.subgraph import knowledge_graph

    nodes, edges = chain
    out = knowledge_graph(nodes, edges, "b", max_depth=1, max_nodes=3)
    ids = [n["entity_id"] for n in out["nodes"]]
    # neighbors of b = {a(1), c(3), x(3)}; capacity 2 → degree-desc, id tie
    assert ids == ["b", "c", "x"]
    assert out["is_truncated"]  # a was left out under the node budget


def test_bfs_full_graph_not_truncated(chain):
    from lightrag_ray.pipelines.subgraph import knowledge_graph

    nodes, edges = chain
    out = knowledge_graph(nodes, edges, "c", max_depth=4)
    assert len(out["nodes"]) == 6  # everything except isolated z
    assert not out["is_truncated"]


def test_bfs_missing_label(chain):
    from lightrag_ray.pipelines.subgraph import knowledge_graph

    nodes, edges = chain
    out = knowledge_graph(nodes, edges, "nope")
    assert out == {"nodes": [], "edges": [], "is_truncated": False}


def test_star_mode_includes_isolated(chain):
    from lightrag_ray.pipelines.subgraph import knowledge_graph

    nodes, edges = chain
    out = knowledge_graph(nodes, edges, "*")
    ids = [n["entity_id"] for n in out["nodes"]]
    assert set(ids) == {"a", "b", "c", "d", "e", "x", "z"}
    assert ids[0] in {"b", "c", "d", "x"}  # a degree-3 node leads
    assert not out["is_truncated"]
    out2 = knowledge_graph(nodes, edges, "*", max_nodes=4)
    assert len(out2["nodes"]) == 4 and out2["is_truncated"]
    # top-4 are exactly the degree-3 nodes, id-tiebreak order
    assert [n["entity_id"] for n in out2["nodes"]] == ["b", "c", "d", "x"]


def test_graph_labels_sorted(chain):
    from lightrag_ray.pipelines.subgraph import graph_labels

    nodes, _ = chain
    labels = [r["entity_id"] for r in graph_labels(nodes).take_all()]
    assert labels == sorted(labels) and len(labels) == 7


def test_create_entity_and_info(chain):
    from lightrag_ray.pipelines.admin import create_entity, get_entity_info

    nodes, _ = chain
    new_nodes, row = create_entity(
        nodes, "New Thing", {"description": "fresh", "entity_type": "widget"},
        created_at=42,
    )
    assert row["entity_id"] == "New Thing"
    info = get_entity_info(new_nodes, "New Thing")
    assert info["graph_data"]["description"] == "fresh"
    assert info["graph_data"]["entity_type"] == "widget"
    assert info["source_id"] == ["manual_creation"]
    # duplicates refuse
    with pytest.raises(ValueError, match="already exists"):
        create_entity(new_nodes, "New Thing", {"description": "again"})
    # empty description refuses
    with pytest.raises(ValueError, match="description"):
        create_entity(nodes, "Other", {"description": "  "})
    # missing entity info is None, not an error
    assert get_entity_info(nodes, "ghost")["graph_data"] is None


def test_create_relation_and_info(chain):
    from lightrag_ray.pipelines.admin import create_relation, get_relation_info

    nodes, edges = chain
    new_edges, row = create_relation(
        nodes, edges, "e", "a", {"description": "link", "keywords": "k1, k2"},
        created_at=7,
    )
    assert (row["src_id"], row["tgt_id"]) == ("a", "e")  # canonical order
    assert row["keywords"] == ["k1", "k2"]
    info = get_relation_info(new_edges, "a", "e")
    assert info["graph_data"]["description"] == "link"
    # swapped endpoints resolve the same relation
    assert get_relation_info(new_edges, "e", "a")["graph_data"] is not None
    # existing pair refuses (undirected)
    with pytest.raises(ValueError, match="already exists"):
        create_relation(nodes, new_edges, "a", "e", {"description": "dup"})
    # missing endpoint refuses
    with pytest.raises(ValueError, match="does not exist"):
        create_relation(nodes, edges, "a", "ghost", {"description": "x"})
