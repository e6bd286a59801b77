"""Incremental maintenance: delete-rebuild equivalence and add-only-new-work."""

from __future__ import annotations

import glob
import os
import shutil

import pytest


@pytest.fixture()
def corpus(ray_session, tmp_path):
    from lightrag_ray.sources.pages import synth_pages_from_documents

    files = synth_pages_from_documents(
        "/root/testdata/sf0.001", f"{tmp_path}/pages", num_files=4
    )
    return str(tmp_path), files


def _nodes_edges(build_dir):
    import ray.data as rd

    nodes = rd.read_parquet(f"{build_dir}/nodes").to_pandas()
    edges = rd.read_parquet(f"{build_dir}/edges").to_pandas()
    return (
        nodes.sort_values("entity_id").reset_index(drop=True),
        edges.sort_values(["src_id", "tgt_id"]).reset_index(drop=True),
    )


def test_delete_matches_fresh_build_without_docs(corpus):
    import pyarrow.parquet as pq

    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.pipelines.incremental import delete_documents
    from lightrag_ray.pipelines.kg_build import build_kg

    work, files = corpus
    cfg = PipelineConfig()
    build_kg(files, f"{work}/full", cfg, num_partitions=2)

    # delete every doc from one source prefix
    urls = []
    for f in files:
        urls.extend(pq.read_table(f, columns=["url"]).column("url").to_pylist())
    removed = [u for u in urls if "/src1." in u or u.endswith("5")][:40]
    assert removed

    res_inc = delete_documents(f"{work}/full", removed, files, cfg, num_partitions=2)

    # oracle: fresh build over a pages copy with those docs filtered out
    import pyarrow.compute as pc
    import pyarrow as pa

    os.makedirs(f"{work}/pages2", exist_ok=True)
    for f in files:
        t = pq.read_table(f)
        mask = pc.invert(
            pc.is_in(t.column("url"), value_set=pa.array(removed, pa.string()))
        )
        pq.write_table(t.filter(mask), f"{work}/pages2/{os.path.basename(f)}")
    files2 = sorted(glob.glob(f"{work}/pages2/*.parquet"))
    res_fresh = build_kg(files2, f"{work}/fresh", cfg, num_partitions=2)

    n_inc, e_inc = _nodes_edges(f"{work}/full")
    n_fresh, e_fresh = _nodes_edges(f"{work}/fresh")
    assert list(n_inc["entity_id"]) == list(n_fresh["entity_id"])
    assert list(n_inc["description"]) == list(n_fresh["description"])
    assert [list(s) for s in n_inc["source_ids"]] == [
        list(s) for s in n_fresh["source_ids"]
    ]
    assert list(e_inc["weight"]) == list(e_fresh["weight"])
    assert list(zip(e_inc["src_id"], e_inc["tgt_id"])) == list(
        zip(e_fresh["src_id"], e_fresh["tgt_id"])
    )


def test_update_kg_upserts_against_prior_snapshot(corpus):
    """update_kg (snapshot upsert, no old-mention re-reduce) must agree with
    add_documents (full re-reduce) on the graph topology and provenance."""
    import ray.data as rd

    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.pipelines.incremental import update_kg
    from lightrag_ray.pipelines.kg_build import build_kg

    work, files = corpus
    cfg = PipelineConfig()
    build_kg(files[:2], f"{work}/base", cfg, num_partitions=1)
    res_up = update_kg(f"{work}/base", files[2:], f"{work}/upsert", cfg,
                       num_partitions=1)

    res_full = build_kg(files, f"{work}/oracle", cfg, num_partitions=1)

    up_n = rd.read_parquet(res_up.nodes_dir).to_pandas().set_index("entity_id")
    full_n = rd.read_parquet(res_full.nodes_dir).to_pandas().set_index("entity_id")
    assert set(up_n.index) == set(full_n.index)
    up_e = rd.read_parquet(res_up.edges_dir).to_pandas()
    full_e = rd.read_parquet(res_full.edges_dir).to_pandas()
    assert set(zip(up_e["src_id"], up_e["tgt_id"])) == set(
        zip(full_e["src_id"], full_e["tgt_id"])
    )
    # provenance sets agree (ORDER may differ: the upsert path fixes the
    # prior snapshot's ordering first, the full rebuild re-sorts globally —
    # exactly the reference's incremental behavior)
    for name in full_n.index:
        assert set(up_n.loc[name, "source_ids"]) == set(
            full_n.loc[name, "source_ids"]
        ), name
    # weights agree (anti-double-count across the snapshot boundary)
    up_w = {(r.src_id, r.tgt_id): r.weight for r in up_e.itertuples()}
    full_w = {(r.src_id, r.tgt_id): r.weight for r in full_e.itertuples()}
    assert up_w == full_w


def test_add_documents_recomputes_only_new_partitions(corpus):
    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.pipelines.incremental import add_documents
    from lightrag_ray.pipelines.kg_build import build_kg

    work, files = corpus
    cfg = PipelineConfig()
    first = files[:3]
    build_kg(first, f"{work}/grow", cfg, num_partitions=3)
    manifest = f"{work}/grow/_manifest"
    markers_before = set(os.listdir(manifest))
    mention_mtimes = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{work}/grow/mentions/**/*.parquet", recursive=True)
    }

    add_documents(f"{work}/grow", files, cfg, num_partitions=3)

    # full-corpus result equals a fresh full build
    res_fresh = build_kg(files, f"{work}/grow_fresh", cfg, num_partitions=3)
    n_inc, e_inc = _nodes_edges(f"{work}/grow")
    n_fresh, e_fresh = _nodes_edges(f"{work}/grow_fresh")
    assert n_inc["entity_id"].equals(n_fresh["entity_id"])
    assert e_inc["weight"].equals(e_fresh["weight"])

    # partitions whose file set did not change were not recomputed
    untouched = [
        f
        for f, t in mention_mtimes.items()
        if os.path.exists(f) and os.path.getmtime(f) == t
    ]
    assert untouched, "expected at least one unchanged partition to be reused"

    markers_after = set(os.listdir(manifest))
    assert markers_before & markers_after, "stable partitions should keep markers"


def test_insert_custom_chunks(corpus):
    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.pipelines.incremental import insert_custom_chunks
    from lightrag_ray.pipelines.kg_build import build_kg

    work, files = corpus
    cfg = PipelineConfig()
    out = f"{work}/custom"
    build_kg(files, out, cfg, num_partitions=2)
    base_nodes, _ = _nodes_edges(out)

    # words outside the corpus vocabulary so the new entities are attributable
    res = insert_custom_chunks(
        out, files,
        full_text="zebraic quixotry flambeau",
        text_chunks=["zebraic quixotry flambeau onyxish", "flambeau onyxish zebraic"],
        cfg=cfg, num_partitions=2,
    )
    assert res is not None
    nodes, edges = _nodes_edges(out)
    added = set(nodes["entity_id"]) - set(base_nodes["entity_id"])
    assert {"zebraic", "quixotry", "flambeau", "onyxish"} <= added
    # provenance points at the custom chunk ids
    row = nodes[nodes.entity_id == "quixotry"].iloc[0]
    assert any(s.startswith("chunk-") for s in row["source_ids"])

    # idempotent: repeating the same logical input resumes to the same graph
    res2 = insert_custom_chunks(
        out, files,
        full_text="zebraic quixotry flambeau",
        text_chunks=["zebraic quixotry flambeau onyxish", "flambeau onyxish zebraic"],
        cfg=cfg, num_partitions=2,
    )
    nodes2, edges2 = _nodes_edges(out)
    assert nodes.equals(nodes2) and edges.equals(edges2)

    # overlapping operation: the repeated chunk is anti-joined away, only the
    # new chunk lands, and no chunk_id is ever duplicated across partitions
    # (pre-fix the repeat landed again and the re-reduce double-counted its
    # mentions, ADVICE r2)
    def _edge_weight(edges, a, b):
        m = edges[(edges.src_id == a) & (edges.tgt_id == b)]
        return float(m.iloc[0]["weight"]) if len(m) else None

    w_before = _edge_weight(edges, *sorted(["quixotry", "onyxish"]))
    res3 = insert_custom_chunks(
        out, files,
        full_text="zebraic quixotry flambeau",
        text_chunks=["zebraic quixotry flambeau onyxish", "glyphward zebraic"],
        cfg=cfg, num_partitions=2,
    )
    assert res3 is not None
    nodes3, edges3 = _nodes_edges(out)
    assert "glyphward" in set(nodes3["entity_id"])
    assert _edge_weight(edges3, *sorted(["quixotry", "onyxish"])) == w_before

    import glob as _g

    import pyarrow.parquet as _pq

    cids: list[str] = []
    for fn in _g.glob(f"{out}/chunks/custom-*/**/*.parquet", recursive=True):
        cids += _pq.read_table(fn, columns=["chunk_id"]).column(
            "chunk_id"
        ).to_pylist()
    assert len(cids) == len(set(cids)) and len(cids) == 3

    # all-empty chunk list is a no-op
    assert insert_custom_chunks(out, files, "x", ["", "  "], cfg=cfg) is None


def test_untouched_bypass_equals_full_reduce(ray_session, tmp_path, monkeypatch):
    """The delta-key semi-join bypass must produce byte-identical graphs to
    the always-correct full reduce (forced via a zero broadcast guard), and
    an update whose delta shares NO keys with the prior graph must re-emit
    every prior row verbatim."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.pipelines.incremental import update_kg
    from lightrag_ray.pipelines.kg_build import build_kg
    from lightrag_ray.sources.pages import PAGES_SCHEMA
    from lightrag_ray.stages import merge as M

    def write_pages(path, texts, base):
        table = pa.table(
            {
                "url": [f"https://b.example.org/doc/{base + i}" for i in
                        range(len(texts))],
                "warc_ts": pa.array(
                    [1_000_000 + base + i for i in range(len(texts))],
                    pa.timestamp("us"),
                ),
                "html": [f"<p>{t}</p>".encode() for t in texts],
                "text": texts,
                "lang": ["en"] * len(texts),
            },
            schema=PAGES_SCHEMA,
        )
        pq.write_table(table, path)
        return [str(path)]

    prior_texts = [
        "alphaword betaword gammaword", "alphaword deltaword",
        "betaword gammaword epsilonword",
    ]
    # delta overlaps one key (alphaword) and introduces new ones
    delta_texts = ["alphaword zetaword", "etaword thetaword"]
    prior_files = write_pages(tmp_path / "prior.parquet", prior_texts, 0)
    delta_files = write_pages(tmp_path / "delta.parquet", delta_texts, 100)

    cfg = PipelineConfig()
    prior = build_kg(prior_files, str(tmp_path / "prior"), cfg, num_partitions=1)

    def graph(out):
        nodes = rd.read_parquet(out.nodes_dir).take_all()
        edges = rd.read_parquet(out.edges_dir).take_all()
        nodes.sort(key=lambda r: r["entity_id"])
        edges.sort(key=lambda r: (r["src_id"], r["tgt_id"]))
        return nodes, edges

    up_bypass = update_kg(str(tmp_path / "prior"), delta_files,
                          str(tmp_path / "up1"), cfg, num_partitions=1)
    g_bypass = graph(up_bypass)

    monkeypatch.setattr(M, "MAX_DELTA_KEY_BROADCAST", 0)  # force full reduce
    up_full = update_kg(str(tmp_path / "prior"), delta_files,
                        str(tmp_path / "up2"), cfg, num_partitions=1)
    g_full = graph(up_full)
    monkeypatch.undo()
    assert g_bypass == g_full

    # disjoint delta (single-entity pages -> zero relation mentions): every
    # prior edge must re-emit verbatim through the empty-reduce + bypass path
    disjoint = write_pages(tmp_path / "disjoint.parquet",
                           ["omegaword99", "sigmaword99"], 200)
    up3 = update_kg(str(tmp_path / "prior"), disjoint,
                    str(tmp_path / "up3"), cfg, num_partitions=1)
    prior_edges = {
        (r["src_id"], r["tgt_id"], r["weight"], r["description"])
        for r in rd.read_parquet(prior.edges_dir).take_all()
    }
    up3_edges = {
        (r["src_id"], r["tgt_id"], r["weight"], r["description"])
        for r in rd.read_parquet(up3.edges_dir).take_all()
    }
    assert up3_edges == prior_edges
    up3_nodes = {r["entity_id"] for r in rd.read_parquet(up3.nodes_dir).take_all()}
    assert {"omegaword99", "sigmaword99"} <= up3_nodes
