"""Query-side ops + export round-trips over a small built graph."""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import pytest

from lightrag_ray.pipelines.export import export_csv, write_graphml
from lightrag_ray.pipelines.query_ops import (
    dedup_chunk_hits,
    node_degrees,
    one_hop_edges,
    popular_labels,
    rank_edges,
    round_robin_merge,
)


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd

    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.pipelines.kg_build import build_kg
    from lightrag_ray.sources.pages import synth_pages_from_documents

    work = str(tmp_path_factory.mktemp("qops"))
    files = synth_pages_from_documents(
        "/root/testdata/sf0.001", f"{work}/pages", num_files=2
    )
    res = build_kg(files, f"{work}/build", PipelineConfig(), num_partitions=1)
    return rd.read_parquet(res.nodes_dir), rd.read_parquet(res.edges_dir)


def test_node_degrees_match_edge_table(built):
    nodes, edges = built
    deg = node_degrees(edges).to_pandas()
    edges_df = edges.to_pandas()
    for _, row in deg.iterrows():
        expected = int(
            (edges_df["src_id"] == row["entity_id"]).sum()
            + (edges_df["tgt_id"] == row["entity_id"]).sum()
        )
        assert row["degree"] == expected


def test_rank_edges_sorted(built):
    _, edges = built
    ranked = rank_edges(edges).to_pandas()
    keys = list(zip(ranked["rank"], ranked["weight"]))
    assert keys == sorted(keys, reverse=True)


def test_popular_labels_topk(built):
    _, edges = built
    top = popular_labels(edges, k=5).to_pandas()
    assert len(top) == 5
    assert top["degree"].is_monotonic_decreasing


def test_one_hop(built):
    _, edges = built
    seed = edges.take(1)[0]["src_id"]
    hop = one_hop_edges(edges, [seed]).to_pandas()
    assert len(hop) >= 1
    assert ((hop["src_id"] == seed) | (hop["tgt_id"] == seed)).all()


def test_dedup_chunk_hits_first_entity_wins():
    out = dedup_chunk_hits(
        [
            {"name": "a", "chunks": ["c1", "c2"]},
            {"name": "b", "chunks": ["c2", "c3"]},
            {"name": "c", "chunks": ["c1", "c3", "c4"]},
        ]
    )
    assert [o["chunks"] for o in out] == [["c1", "c2"], ["c3"], ["c4"]]


def test_round_robin_merge():
    a = [{"k": 1}, {"k": 2}, {"k": 3}]
    b = [{"k": 2}, {"k": 4}]
    merged = round_robin_merge(a, b, key=lambda x: x["k"])
    assert [m["k"] for m in merged] == [1, 2, 4, 3]


def test_export_csv_and_graphml(built, tmp_path):
    nodes, edges = built
    out = str(tmp_path)
    export_csv(nodes, edges, out)
    assert os.listdir(f"{out}/entities") and os.listdir(f"{out}/relations")

    gml = f"{out}/graph.graphml"
    write_graphml(nodes, edges, gml)
    tree = ET.parse(gml)  # well-formed XML
    ns = {"g": "http://graphml.graphdrawing.org/xmlns"}
    xml_nodes = tree.findall(".//g:node", ns)
    xml_edges = tree.findall(".//g:edge", ns)
    assert len(xml_nodes) == nodes.count()
    assert len(xml_edges) == edges.count()


def test_rank_edges_shuffle_matches_broadcast(ray_session, tmp_path):
    """The scale-safe Dataset.join degree path must produce the same ranking
    as the broadcast-dict default."""
    import ray.data as rd

    from lightrag_ray.pipelines.query_ops import rank_edges

    edges = rd.from_items(
        [
            {"src_id": "a", "tgt_id": "b", "weight": 2.0},
            {"src_id": "a", "tgt_id": "c", "weight": 1.0},
            {"src_id": "b", "tgt_id": "c", "weight": 3.0},
            {"src_id": "c", "tgt_id": "d", "weight": 1.0},
            # duplicate pair: both rows must survive the shuffle path too
            {"src_id": "a", "tgt_id": "b", "weight": 5.0},
        ]
    )
    cols = ["src_id", "tgt_id", "weight", "rank"]
    broadcast = [
        {k: r[k] for k in cols} for r in rank_edges(edges).take_all()
    ]
    shuffle = [
        {k: r[k] for k in cols}
        for r in rank_edges(edges, degree_join="shuffle").take_all()
    ]
    assert broadcast == shuffle


def test_attach_degree_bucketed_not_per_key(ray_session):
    """The shuffle-fallback cogroup is keyed on a COARSE bucket, not on the
    node key (round-3 VERDICT #4): buckets=1 forces EVERY key through one
    vectorized group call — pinning multi-key handling inside a bucket — and
    must agree with a wide bucketing and with per-key expectations."""
    import ray.data as rd

    from lightrag_ray.pipelines.query_ops import _attach_degree, node_degrees

    edges = rd.from_items(
        [
            {"src_id": "a", "tgt_id": "b", "weight": 2.0},
            {"src_id": "a", "tgt_id": "c", "weight": 1.0},
            {"src_id": "b", "tgt_id": "c", "weight": 3.0},
            {"src_id": "c", "tgt_id": "d", "weight": 1.0},
            {"src_id": "e", "tgt_id": "f", "weight": 9.0},  # no-marker bucket mix
        ]
    )
    deg = node_degrees(edges)
    expected_deg = {"a": 2, "b": 2, "c": 3, "d": 1, "e": 1, "f": 1}

    for buckets in (1, 256):
        out = _attach_degree(edges, deg, "src_id", "_d", buckets=buckets)
        got = {
            (r["src_id"], r["tgt_id"], r["weight"]): r["_d"]
            for r in out.take_all()
        }
        assert len(got) == 5
        for (s, _t, _w), d in got.items():
            assert d == expected_deg[s]


def test_export_data_formats(ray_session, tmp_path):
    """aexport_data formats (lightrag/utils.py:4020-4366): csv sections, md
    tables, txt fixed-width, excel sheets (read back via our own xlsx
    extractor)."""
    import ray.data as rd

    from lightrag_ray.functions.extractors import extract_xlsx
    from lightrag_ray.pipelines.export import export_data

    nodes = rd.from_items(
        [
            {
                "entity_id": "alpha", "entity_type": "org",
                "description": "a", "source_ids": ["c1", "c2"],
                "file_paths": ["f1"], "created_at": 1, "truncate": "",
            }
        ]
    )
    edges = rd.from_items(
        [
            {
                "src_id": "alpha", "tgt_id": "beta", "weight": 2.0,
                "description": "ab", "keywords": ["kw"],
                "source_ids": ["c1"], "file_paths": ["f1"],
                "created_at": 1, "truncate": "",
            }
        ]
    )
    csv_path = str(tmp_path / "x.csv")
    export_data(nodes, edges, csv_path, "csv")
    text = open(csv_path).read()
    assert "# ENTITIES" in text and "# RELATIONS" in text
    assert "alpha" in text and "c1<SEP>c2" in text

    md_path = str(tmp_path / "x.md")
    export_data(nodes, edges, md_path, "md")
    md = open(md_path).read()
    assert md.startswith("# LightRAG Data Export")
    assert "| entity_name | source_id | graph_data |" in md

    txt_path = str(tmp_path / "x.txt")
    export_data(nodes, edges, txt_path, "txt")
    txt = open(txt_path).read()
    assert txt.startswith("LIGHTRAG DATA EXPORT\n" + "=" * 80)
    assert "ENTITIES" in txt and "RELATIONSHIPS" in txt

    xlsx_path = str(tmp_path / "x.xlsx")
    export_data(nodes, edges, xlsx_path, "excel")
    sheet_text = extract_xlsx(open(xlsx_path, "rb").read())
    assert "Sheet: Entities" in sheet_text and "alpha" in sheet_text
    assert "Sheet: Relationships" in sheet_text

    import pytest as _pytest

    with _pytest.raises(ValueError):
        export_data(nodes, edges, str(tmp_path / "x.bad"), "bad")


def test_rank_edges_auto_falls_back_on_guard(ray_session, monkeypatch):
    """Round-2 VERDICT #7: the default arm must never hold more than the
    guard's worth of degree rows on the driver — when the guard trips, auto
    silently degrades to the shuffle join (same result), while an explicit
    degree_join="broadcast" raises."""
    import pytest
    import ray.data as rd

    from lightrag_ray.pipelines import query_ops

    edges = rd.from_items(
        [
            {"src_id": "a", "tgt_id": "b", "weight": 2.0},
            {"src_id": "b", "tgt_id": "c", "weight": 3.0},
            {"src_id": "c", "tgt_id": "d", "weight": 1.0},
        ]
    )
    cols = ["src_id", "tgt_id", "weight", "rank"]
    normal = [
        {k: r[k] for k in cols} for r in query_ops.rank_edges(edges).take_all()
    ]
    monkeypatch.setattr(query_ops, "MAX_BROADCAST_NODES", 1)
    fallback = [
        {k: r[k] for k in cols} for r in query_ops.rank_edges(edges).take_all()
    ]
    assert normal == fallback
    with pytest.raises(ValueError, match="too large to broadcast"):
        query_ops.rank_edges(edges, degree_join="broadcast").take_all()


def test_export_vector_upserts(built, tmp_path):
    """Outbound vector-store bulk export: JSONL records whose ids, contents
    and vectors match the query path's own VDB build."""
    import glob
    import json

    import numpy as np
    import ray.data as rd

    from lightrag_ray.pipelines.export import export_vector_upserts
    from lightrag_ray.stages.embed import (
        HashEmbedder,
        entity_vdb_rows,
    )

    nodes, edges = built
    ent_dir, rel_dir = export_vector_upserts(
        nodes, edges, str(tmp_path / "vdb_export")
    )
    ent_records = []
    for f in sorted(glob.glob(f"{ent_dir}/*.json")):
        with open(f) as fh:
            ent_records += [json.loads(line) for line in fh if line.strip()]
    assert len(ent_records) == nodes.count()
    by_id = {r["id"]: r for r in ent_records}

    # ids + contents must be exactly the query path's VDB rows, and vectors
    # must be the same deterministic embedding vector_topk would use
    expected = nodes.map_batches(
        entity_vdb_rows, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    emb = HashEmbedder()
    for row in expected:
        rec = by_id[row["vdb_id"]]
        assert rec["payload"]["content"] == row["content"]
        np.testing.assert_allclose(
            np.array(rec["vector"]), emb.embed([row["content"]])[0], atol=1e-9
        )

    rel_records = []
    for f in sorted(glob.glob(f"{rel_dir}/*.json")):
        with open(f) as fh:
            rel_records += [json.loads(line) for line in fh if line.strip()]
    assert len(rel_records) == edges.count()
    assert {"src_id", "tgt_id", "content"} <= set(rel_records[0]["payload"])
