"""Query-path modes over a small built graph."""

from __future__ import annotations

import pytest

from lightrag_ray.pipelines.query_path import KGQueryEngine, default_keywords_fn


@pytest.fixture(scope="module")
def engine(ray_session, tmp_path_factory):
    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.pipelines.kg_build import build_kg
    from lightrag_ray.sources.pages import synth_pages_from_documents

    work = str(tmp_path_factory.mktemp("qp"))
    files = synth_pages_from_documents(
        "/root/testdata/sf0.001", f"{work}/pages", num_files=2
    )
    res = build_kg(files, f"{work}/build", PipelineConfig(), num_partitions=1)
    return KGQueryEngine(res.nodes_dir, res.edges_dir, chunks_dir=res.chunks_dir)


def test_keywords_fn():
    kw = default_keywords_fn("find the stream table merge relations")
    assert "stream" in kw["low_level_keywords"]
    assert "the" not in kw["low_level_keywords"]


def test_hybrid_mode(engine):
    ctx = engine.query("how do stream and merge relate to the table", mode="hybrid")
    assert ctx.entities, "expected entity hits"
    assert ctx.relations, "expected relation hits"
    assert ctx.chunks, "expected related chunks"
    names = {e["entity"] for e in ctx.entities}
    for r in ctx.relations[:5]:
        assert r["weight"] > 0
    # related chunks reference retrieved entities
    assert all(c["via_entity"] in names for c in ctx.chunks)


def test_local_vs_global(engine):
    local = engine.query("stream merge table", mode="local")
    glob = engine.query("stream merge table", mode="global")
    assert local.entities
    assert glob.relations
    # hybrid is a round-robin superset of sorts
    hybrid = engine.query("stream merge table", mode="hybrid")
    assert len(hybrid.entities) >= max(len(local.entities), 1)


def test_naive_and_bypass(engine):
    naive = engine.query("stream merge table", mode="naive")
    assert naive.chunks and not naive.entities
    bypass = engine.query("anything", mode="bypass")
    assert not bypass.entities and not bypass.chunks


def test_llm_query_engine_end_to_end(engine):
    """Pluggable keyword + answer models drive the full query path (round-1
    VERDICT #10): keyword JSON parsed tolerantly, answer model receives the
    assembled context, responses cached by the reference key scheme."""
    from lightrag_ray.pipelines.query_llm import LLMQueryEngine

    calls = {"keywords": 0, "answer": 0}

    def keyword_model(user_prompt, system_prompt, history):
        calls["keywords"] += 1
        assert "high_level_keywords" in user_prompt
        return (
            '<think>hmm</think>```json\n'
            '{"high_level_keywords": ["stream merge"],'
            ' "low_level_keywords": ["stream", "merge", "table"]}\n```'
        )

    def answer_model(user_prompt, system_prompt, history):
        calls["answer"] += 1
        assert "---Context---" in system_prompt
        assert "Knowledge Graph Data (Entity)" in system_prompt
        return "Grounded answer."

    q = LLMQueryEngine(
        engine, keyword_model_fn=keyword_model, answer_model_fn=answer_model
    )
    result = q.query("how do stream and merge relate to the table")
    assert result.answer == "Grounded answer."
    assert result.context.entities
    # cache hit: same query again does not call the answer model
    again = q.query("how do stream and merge relate to the table")
    assert again.answer == "Grounded answer."
    assert calls["answer"] == 1


def test_llm_query_engine_offline_defaults(engine):
    from lightrag_ray.pipelines.query_llm import LLMQueryEngine

    q = LLMQueryEngine(engine)
    result = q.query("stream merge table")
    assert result.answer.startswith("Entities in context:")
    assert result.context.entities


def test_llm_keywords_fallback_on_garbage():
    from lightrag_ray.pipelines.query_llm import make_llm_keywords_fn

    fn = make_llm_keywords_fn(lambda u, s, h: "not json at all")
    assert fn("whatever") == {
        "high_level_keywords": [],
        "low_level_keywords": [],
    }


def test_weighted_polling_algorithm():
    """Exact port of pick_by_weighted_polling (lightrag/utils.py:5189-5268):
    linear quota gradient + leftover round-robin."""
    from lightrag_ray.pipelines.query_ops import pick_by_weighted_polling

    items = [
        {"sorted_chunks": ["a1", "a2", "a3", "a4", "a5"]},
        {"sorted_chunks": ["b1", "b2"]},
        {"sorted_chunks": ["c1", "c2", "c3", "c4"]},
    ]
    out = pick_by_weighted_polling(items, max_related_chunks=4)
    # quotas: 4, round(2.5)=2, 1; b has only 2 → leftover goes to a then c
    assert out[:4] == ["a1", "a2", "a3", "a4"]
    assert "b1" in out and "b2" in out and "c1" in out
    assert pick_by_weighted_polling([], 5) == []
    assert pick_by_weighted_polling(items[:1], 2) == ["a1", "a2"]


def test_related_chunks_selection_modes(engine):
    """VECTOR (default, reference constants.py:61) ranks provenance chunks
    by cosine to the query; WEIGHT uses the polling quotas."""
    q = "how do stream and merge relate to the table"
    engine.related_chunk_selection = "VECTOR"
    vec = engine.query(q, mode="local").chunks
    engine.related_chunk_selection = "WEIGHT"
    wt = engine.query(q, mode="local").chunks
    engine.related_chunk_selection = "VECTOR"
    assert vec and wt
    assert {c["chunk_id"] for c in vec}  # non-empty, ids resolved
    # both draw from entity provenance
    names = {c["via_entity"] for c in vec} | {c["via_entity"] for c in wt}
    assert names


def test_llm_engine_does_not_mutate_shared_engine(engine):
    """Wrapping a shared KGQueryEngine must not overwrite its keywords_fn
    (code-review regression)."""
    from lightrag_ray.pipelines.query_llm import LLMQueryEngine

    original = engine.keywords_fn
    q = LLMQueryEngine(engine)
    q.query("stream merge table")
    assert engine.keywords_fn is original


def test_query_data_envelope(engine):
    out = engine.query_data("stream table merge", mode="hybrid")
    assert out["status"] == "success"
    data = out["data"]
    assert data["entities"] and data["relationships"] and data["chunks"]
    ent = data["entities"][0]
    assert set(ent) == {
        "entity_name", "entity_type", "description", "source_id",
        "file_path", "created_at", "reference_id",
    }
    rel = data["relationships"][0]
    assert {"src_id", "tgt_id", "keywords", "weight"} <= set(rel)
    # reference ids: "1"-based, frequency-ranked, chunks point into them
    refs = {r["reference_id"]: r["file_path"] for r in data["references"]}
    assert refs and all(int(k) >= 1 for k in refs)
    for c in data["chunks"]:
        if c["reference_id"]:
            assert refs[c["reference_id"]] == c["file_path"]
    meta = out["metadata"]
    assert meta["query_mode"] == "hybrid"
    assert meta["keywords"]["low_level"]
    assert meta["processing_info"]["final_chunks_count"] == len(data["chunks"])


def test_query_data_failures_and_modes(engine):
    assert engine.query_data("  ")["status"] == "failure"
    naive = engine.query_data("stream table", mode="naive")
    assert naive["status"] == "success"
    assert naive["data"]["entities"] == [] and naive["data"]["chunks"]
    bypass = engine.query_data("anything", mode="bypass")
    assert bypass["data"] == {
        "entities": [], "relationships": [], "chunks": [], "references": [],
    }


def test_mix_mode(engine):
    hybrid = engine.query("stream table merge", mode="hybrid")
    mix = engine.query("stream table merge", mode="mix")
    # mix keeps the hybrid KG context...
    assert [e["entity"] for e in mix.entities] == [
        e["entity"] for e in hybrid.entities
    ]
    # ...and interleaves vector-retrieved chunks with the entity-derived ones
    assert len(mix.chunks) >= len(hybrid.chunks)
    assert any("sim" in c for c in mix.chunks)
    ids = [c["chunk_id"] for c in mix.chunks]
    assert len(ids) == len(set(ids))  # round-robin merge dedups
    # query_data supports mix too
    out = engine.query_data("stream table merge", mode="mix")
    assert out["status"] == "success" and out["data"]["chunks"]


def test_query_batch_matches_sequential(engine):
    """query_batch must return EXACTLY what per-query query() returns, for
    every mode — it is the same retrieval with the Dataset executions
    amortized across the batch (one vector pass per VDB, one fetch per
    table, one one-hop semi-join)."""
    queries = [
        "how do stream and merge relate to the table",
        "stream merge table",
        "window partition shuffle",
        "nothing matches zzzzqqqq",
    ]
    for mode in ("hybrid", "local", "global", "naive", "mix", "bypass"):
        batched = engine.query_batch(queries, mode=mode)
        for q, got in zip(queries, batched):
            want = engine.query(q, mode=mode)
            assert got.entities == want.entities, (mode, q)
            assert got.relations == want.relations, (mode, q)
            assert got.chunks == want.chunks, (mode, q)
