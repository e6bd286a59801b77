"""Evaluation harness: retrieval metrics over a real build + judge battles
(reference offline_retrieval_check.py / reproduce/batch_eval.py)."""

from __future__ import annotations

import pytest

from lightrag_ray.pipelines.evaluate import (
    batch_answer_eval,
    build_judge_prompt,
    mrr,
    offline_judge_model_fn,
    recall_at,
    retrieval_eval,
    summarize_eval,
)


def test_metric_kernels():
    assert recall_at(["a", "b"], ["b", "c", "a"], 2) == 0.5
    assert recall_at(["a", "b"], ["b", "c", "a"], 3) == 1.0
    assert recall_at([], ["x"], 5) == 1.0
    assert mrr(["a"], ["c", "b", "a"]) == pytest.approx(1 / 3)
    assert mrr(["z"], ["c", "b", "a"]) == 0.0


@pytest.fixture(scope="module")
def built_engine(ray_session, tmp_path_factory):
    import ray.data as rd

    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.pipelines.kg_build import build_kg
    from lightrag_ray.pipelines.query_path import KGQueryEngine
    from lightrag_ray.sources.pages import synth_pages_from_documents

    root = tmp_path_factory.mktemp("eval")
    files = synth_pages_from_documents(
        "/root/testdata/sf0.001", str(root / "pages"), num_files=2
    )
    res = build_kg(files, str(root / "build"), PipelineConfig(), num_partitions=1)
    engine = KGQueryEngine(res.nodes_dir, res.edges_dir)
    nodes = rd.read_parquet(res.nodes_dir).take_all()
    return engine, nodes


def test_retrieval_eval_on_built_graph(built_engine):
    """Pin the harness plumbing (ranked lists → metrics) against a real
    build: an oracle derived from a probe retrieval must score exactly
    (recall 1.0, mrr 1.0 for the top hit), a miss-oracle exactly 0 — the
    deterministic stand-in embedder makes retrieval itself reproducible but
    not semantically faithful, so the test must not assume 'question naming
    X retrieves X'."""
    engine, nodes = built_engine
    question = f"tell me about {nodes[0]['entity_id']}"
    probe = engine.query(question, mode="local")
    assert probe.entities and probe.chunks  # word-soup graph always hits
    top_entity = probe.entities[0]["entity"]
    top_chunk = probe.chunks[0]["chunk_id"]
    oracle = [
        {
            "question": question,
            "expected_entities": [top_entity],
            "expected_chunks": [top_chunk],
        },
        {  # miss case: metrics must be 0, not crash
            "question": question,
            "expected_entities": ["no-such-entity"],
        },
    ]
    table = retrieval_eval(engine, oracle, mode="local", k=10)
    rows = table.to_pylist()
    assert rows[0]["entity_recall_at_k"] == 1.0
    assert rows[0]["entity_mrr"] == 1.0  # probe's rank-1 hit
    assert rows[0]["chunk_recall_at_k"] == 1.0
    assert rows[0]["chunk_mrr"] == 1.0
    assert rows[1]["entity_recall_at_k"] == 0.0
    assert rows[1]["chunk_recall_at_k"] is None  # no chunk expectation given
    summary = summarize_eval(table)
    assert summary["n_questions"] == 2
    assert summary["entity_recall_at_k"] == 0.5


def test_judge_prompt_and_offline_judge():
    q = "what makes arrow columnar formats fast"
    a1 = "Arrow columnar formats are fast because vectorized kernels."
    a2 = "Bananas are yellow."
    prompt = build_judge_prompt(q, a1, a2)
    # reference prompt landmarks (reproduce/batch_eval.py)
    for marker in ("**Comprehensiveness**", "**Answer 1:**", "**Answer 2:**",
                   "Overall Winner"):
        assert marker in prompt
    table = batch_answer_eval([q], [a1], [a2])
    row = table.to_pylist()[0]
    assert row["overall_winner"] == "Answer 1"
    assert row["comprehensiveness"] == "Answer 1"

    # judge is symmetric on content, deterministic on ties
    table2 = batch_answer_eval([q], [a2], [a1])
    assert table2.to_pylist()[0]["overall_winner"] == "Answer 2"


def test_batch_eval_with_custom_judge():
    """A canned 'LLM' judge (JSON with think-tags noise) flows through the
    tolerant parser."""
    verdict = (
        '<think>hmm</think>{"Comprehensiveness": {"Winner": "Answer 2"},'
        ' "Diversity": {"Winner": "Answer 2"},'
        ' "Empowerment": {"Winner": "Answer 1"},'
        ' "Overall Winner": {"Winner": "Answer 2"}}'
    )
    table = batch_answer_eval(
        ["q"], ["a"], ["b"], judge_model_fn=lambda u, s, h: verdict
    )
    row = table.to_pylist()[0]
    assert row["overall_winner"] == "Answer 2"
    assert row["empowerment"] == "Answer 1"
