"""Semantic-vector chunker (C3) + embedding-limit hard re-split (C5)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lightrag_ray.config import PipelineConfig
from lightrag_ray.functions.semantic_chunking import (
    chunk_text_semantic,
    enforce_chunk_token_limit,
)
from lightrag_ray.functions.tokenizer import SegmentTokenizer


class TopicEmbedder:
    """Deterministic embedder mapping sentences to one of two topic axes —
    makes the semantic breakpoint location predictable."""

    def embed(self, texts):
        out = []
        for t in texts:
            if "ocean" in t or "fish" in t:
                out.append([1.0, 0.05])
            else:
                out.append([0.05, 1.0])
        return np.asarray(out)


TEXT = (
    "The ocean is vast. Fish swim in the ocean. The fish follow currents. "
    "Compilers parse source code. Registers hold operands. "
    "Optimization passes rewrite code."
)


def test_semantic_breakpoint_between_topics():
    chunks = chunk_text_semantic(
        TopicEmbedder(), TEXT, buffer_size=0,
        breakpoint_threshold_type="percentile",
        breakpoint_threshold_amount=80.0,
    )
    assert len(chunks) == 2
    assert "ocean" in chunks[0]["content"] and "fish" not in chunks[1]["content"]
    assert "Compilers" in chunks[1]["content"]
    assert [c["chunk_order_index"] for c in chunks] == [0, 1]


def test_semantic_single_sentence_passthrough():
    chunks = chunk_text_semantic(TopicEmbedder(), "One sentence only.")
    assert chunks == [{"content": "One sentence only.", "chunk_order_index": 0}]
    assert chunk_text_semantic(TopicEmbedder(), "   ") == []


def test_enforce_chunk_token_limit_resplit():
    tok = SegmentTokenizer()
    text = " ".join(f"w{i}" for i in range(25))
    chunks = [
        {"content": "short one", "chunk_order_index": 0},
        {"content": text, "chunk_order_index": 1},
    ]
    out = enforce_chunk_token_limit(chunks, tok, max_tokens=10, overlap_tokens=2)
    assert out[0]["content"] == "short one" and out[0]["tokens"] == 2
    big = out[1:]
    # windows of 10 with stride 8 over 25 tokens → starts at 0, 8, 16 (the
    # 16-token window reaches the end, so no redundant tail window follows)
    assert [c["tokens"] for c in big] == [10, 10, 9]
    assert all(c["tokens"] <= 10 for c in big)
    assert [c["chunk_order_index"] for c in out] == list(range(len(out)))
    # overlap: each window repeats the previous window's last 2 tokens
    assert big[0]["content"].split()[-2:] == big[1]["content"].split()[:2]


def test_chunker_stage_v_strategy(ray_session):
    from lightrag_ray.stages.chunk import ChunkerStage

    cfg = PipelineConfig(
        chunking_strategy="V",
        chunker_options={
            "embedder_factory": TopicEmbedder,
            "buffer_size": 0,
            "breakpoint_threshold_type": "percentile",
            "breakpoint_threshold_amount": 80.0,
        },
        embedding_token_limit=4,
    )
    stage = ChunkerStage(cfg)
    batch = pa.table(
        {
            "doc_id": ["d1"],
            "url": ["https://x"],
            "lang": ["en"],
            "text": [TEXT],
            "timestamp": pa.array([1], pa.int64()),
        }
    )
    rows = stage(batch).to_pylist()
    assert all(r["tokens"] <= 4 for r in rows)  # C5 enforced after V
    assert [r["chunk_order_index"] for r in rows] == list(range(len(rows)))
    assert rows[0]["chunk_id"].startswith("d1-chunk-")
