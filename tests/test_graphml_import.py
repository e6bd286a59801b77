"""GraphML import: round-trip with our exporter + a networkx-written file
(the reference's storage format)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from lightrag_ray.sources.graphml_import import import_graphml


def test_roundtrip_with_our_exporter(ray_session, tmp_path):
    import ray.data as rd

    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.pipelines.export import write_graphml
    from lightrag_ray.pipelines.kg_build import build_kg
    from lightrag_ray.sources.pages import synth_pages_from_documents

    work = str(tmp_path)
    files = synth_pages_from_documents(
        "/root/testdata/sf0.001", f"{work}/pages", num_files=2
    )
    res = build_kg(files, f"{work}/build", PipelineConfig(), num_partitions=1)
    nodes = rd.read_parquet(res.nodes_dir)
    edges = rd.read_parquet(res.edges_dir)
    write_graphml(nodes, edges, f"{work}/graph.graphml")

    nodes_dir, edges_dir = import_graphml(f"{work}/graph.graphml", f"{work}/imported")
    imp_nodes = rd.read_parquet(nodes_dir).to_pandas().sort_values("entity_id")
    orig_nodes = nodes.to_pandas().sort_values("entity_id")
    assert list(imp_nodes["entity_id"]) == list(orig_nodes["entity_id"])
    assert list(imp_nodes["description"]) == list(orig_nodes["description"])
    assert [list(s) for s in imp_nodes["source_ids"]] == [
        list(s) for s in orig_nodes["source_ids"]
    ]
    imp_edges = rd.read_parquet(edges_dir).to_pandas().sort_values(
        ["src_id", "tgt_id"]
    )
    orig_edges = edges.to_pandas().sort_values(["src_id", "tgt_id"])
    assert list(imp_edges["weight"]) == list(orig_edges["weight"])
    assert [list(k) for k in imp_edges["keywords"]] == [
        list(k) for k in orig_edges["keywords"]
    ]


def test_import_networkx_written_graphml(tmp_path):
    """A graph written by networkx itself (the reference's persistence path,
    lightrag/kg/networkx_impl.py:724-784) imports correctly."""
    nx = pytest.importorskip("networkx")
    g = nx.Graph()
    g.add_node(
        "Acme Corp",
        entity_id="Acme Corp",
        entity_type="organization",
        description="desc a<SEP>desc b",
        source_id="chunk-1<SEP>chunk-2",
        file_path="http://a<SEP>http://b",
        created_at=1234,
        truncate="",
    )
    g.add_node(
        "Jane Doe",
        entity_id="Jane Doe",
        entity_type="person",
        description="engineer",
        source_id="chunk-1",
        file_path="http://a",
        created_at=1234,
        truncate="",
    )
    g.add_edge(
        "Jane Doe",
        "Acme Corp",
        weight=2.0,
        description="works at",
        keywords="employment,work",
        source_id="chunk-1<SEP>chunk-2",
        file_path="http://a",
        created_at=1235,
        truncate="",
    )
    path = str(tmp_path / "ref.graphml")
    nx.write_graphml(g, path)

    nodes_dir, edges_dir = import_graphml(path, str(tmp_path / "imported"))
    import glob

    nodes = pq.read_table(glob.glob(f"{nodes_dir}/*.parquet")[0]).to_pylist()
    edges = pq.read_table(glob.glob(f"{edges_dir}/*.parquet")[0]).to_pylist()
    by_id = {n["entity_id"]: n for n in nodes}
    assert by_id["Acme Corp"]["source_ids"] == ["chunk-1", "chunk-2"]
    assert by_id["Acme Corp"]["entity_type"] == "organization"
    assert len(edges) == 1
    e = edges[0]
    assert (e["src_id"], e["tgt_id"]) == ("Acme Corp", "Jane Doe")  # sorted pair
    assert e["weight"] == 2.0
    assert e["keywords"] == ["employment", "work"]
    assert e["source_ids"] == ["chunk-1", "chunk-2"]


def test_quotes_in_entity_names_roundtrip(ray_session, tmp_path):
    """Double quotes survive normalize_entity_name (only OUTER quote pairs are
    stripped), so attribute values must be emitted with quoteattr — plain
    escape() leaves '"' intact and produces unparseable GraphML."""
    import ray.data as rd

    from lightrag_ray.pipelines.export import write_graphml

    name = 'ACME "HOLDINGS" LLC'
    other = "Partner & <Co>"
    nodes = rd.from_items(
        [
            {
                "entity_id": n,
                "entity_type": "organization",
                "description": 'desc with "quotes" & <angles>',
                "source_ids": ["c1"],
                "file_paths": ["https://x"],
                "created_at": 1,
                "truncate": "",
            }
            for n in (name, other)
        ]
    )
    edges = rd.from_items(
        [
            {
                "src_id": name,
                "tgt_id": other,
                "weight": 1.0,
                "description": "d",
                "keywords": ["k"],
                "source_ids": ["c1"],
                "file_paths": ["https://x"],
                "created_at": 1,
                "truncate": "",
            }
        ]
    )
    path = str(tmp_path / "g.graphml")
    write_graphml(nodes, edges, path)
    nodes_dir, edges_dir = import_graphml(path, str(tmp_path / "imp"))
    imp_nodes = pq.read_table(nodes_dir).to_pylist()
    assert {r["entity_id"] for r in imp_nodes} == {name, other}
    assert imp_nodes[0]["description"] == 'desc with "quotes" & <angles>'
    imp_edges = pq.read_table(edges_dir).to_pylist()
    assert (imp_edges[0]["src_id"], imp_edges[0]["tgt_id"]) == (name, other)
