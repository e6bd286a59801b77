"""Rerank kernels: window chunking, score aggregation, orchestration."""

from __future__ import annotations

import pytest

from lightrag_ray.functions.tokenizer import SegmentTokenizer
from lightrag_ray.pipelines.rerank import (
    aggregate_chunk_scores,
    chunk_documents_for_rerank,
    make_cosine_rerank_fn,
    rerank_chunks,
)

TOK = SegmentTokenizer()


def test_short_docs_pass_through():
    docs = ["one two", "three"]
    windows, idx = chunk_documents_for_rerank(TOK, docs, max_tokens=10)
    assert windows == docs and idx == [0, 1]


def test_long_doc_windows_with_overlap():
    doc = " ".join(f"w{i}" for i in range(25))
    windows, idx = chunk_documents_for_rerank(
        TOK, ["short", doc], max_tokens=10, overlap_tokens=2
    )
    assert idx[0] == 0 and all(i == 1 for i in idx[1:])
    assert len(windows) > 2
    # windows cover the whole doc: last window ends with the last word
    assert windows[-1].rstrip().endswith("w24")
    # overlap: each window after the first starts with the previous one's tail
    for a, b in zip(windows[1:-1], windows[2:]):
        tail = TOK.decode(TOK.encode(a)[-2:])
        assert b.startswith(tail)


def test_chunking_clamp_rules():
    with pytest.raises(ValueError):
        chunk_documents_for_rerank(TOK, ["x"], max_tokens=0)
    # overlap >= max clamps to max//2 instead of hanging
    doc = " ".join(f"w{i}" for i in range(30))
    windows, _ = chunk_documents_for_rerank(
        TOK, [doc], max_tokens=4, overlap_tokens=9
    )
    assert len(windows) < 30  # advances ~half a window per step


def test_aggregate_strategies():
    results = [
        {"index": 0, "relevance_score": 0.2},
        {"index": 1, "relevance_score": 0.8},
        {"index": 2, "relevance_score": 0.4},
    ]
    idx = [0, 0, 1]  # windows 0,1 → doc 0; window 2 → doc 1
    for strat, doc0 in (("max", 0.8), ("mean", 0.5), ("first", 0.2)):
        agg = aggregate_chunk_scores(results, idx, 2, aggregation=strat)
        by_doc = {r["index"]: r["relevance_score"] for r in agg}
        assert by_doc[0] == pytest.approx(doc0)
        assert by_doc[1] == pytest.approx(0.4)
    # descending order
    agg = aggregate_chunk_scores(results, idx, 2)
    assert [r["index"] for r in agg] == [0, 1]
    # malformed rows and out-of-range indices are skipped
    assert aggregate_chunk_scores(
        [{"index": 99, "relevance_score": 1.0}, {"bad": 1}], idx, 2
    ) == []


def test_cosine_fn_protocol():
    fn = make_cosine_rerank_fn()
    out = fn("stream merge", ["a doc", "another doc"])
    assert [r["index"] for r in out] == [0, 1]
    assert all(-1.0 <= r["relevance_score"] <= 1.0 for r in out)
    assert out == fn("stream merge", ["a doc", "another doc"])  # deterministic


def test_rerank_chunks_end_to_end():
    # controlled scorer: score = fraction of query words present in the window
    def fn(query, documents):
        words = set(query.split())
        return [
            {
                "index": i,
                "relevance_score": len(words & set(d.split())) / len(words),
            }
            for i, d in enumerate(documents)
        ]

    chunks = [
        {"chunk_id": "a", "content": "the weather is sunny today"},
        {"chunk_id": "b", "content": "stream table merge shuffle"},
        # long chunk: relevant words only in its tail window — max-aggregation
        # must still surface it
        {"chunk_id": "c", "content": "pad " * 600 + " stream merge appears here"},
    ]
    out = rerank_chunks("stream merge", chunks, fn, TOK)
    assert [c["chunk_id"] for c in out] == ["b", "c", "a"]
    assert all("rerank_score" in c for c in out)
    assert out[0]["rerank_score"] == 1.0 and out[1]["rerank_score"] == 1.0 or (
        out[0]["rerank_score"] >= out[1]["rerank_score"]
    )
    # top_n / min_score filters
    assert len(rerank_chunks("stream merge", chunks, fn, TOK, top_n=1)) == 1
    assert rerank_chunks("stream merge", chunks, fn, TOK, min_score=1.01) == []
