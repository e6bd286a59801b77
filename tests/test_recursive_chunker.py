"""Recursive-character chunker invariants."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from lightrag_ray.functions.recursive_chunking import (
    chunking_by_recursive_character,
)
from lightrag_ray.functions.tokenizer import SegmentTokenizer

TEXT = st.lists(
    st.sampled_from(
        ["alpha beta", "gamma", "中文句子。", "delta epsilon zeta", "x", "，短语"]
    ),
    min_size=0,
    max_size=30,
).map(lambda parts: "\n\n".join(parts))


@settings(max_examples=100, deadline=None)
@given(TEXT, st.integers(4, 20), st.integers(0, 3))
def test_chunks_within_budget_and_cover_text(text, size, overlap):
    tok = SegmentTokenizer()
    chunks = chunking_by_recursive_character(
        tok, text, chunk_overlap_token_size=overlap, chunk_token_size=size
    )
    for i, c in enumerate(chunks):
        assert c["chunk_order_index"] == i
        assert c["content"] == c["content"].strip() and c["content"]
        # budget holds unless the chunk is a single unsplittable piece
        assert c["tokens"] <= size or " " not in c["content"]
    # every non-whitespace character of the input appears in some chunk
    flat = "".join(c["content"] for c in chunks)
    for ch in set(text):
        if not ch.isspace():
            assert ch in flat


def test_paragraph_preference():
    tok = SegmentTokenizer()
    text = "one two three\n\nfour five six\n\nseven eight nine"
    chunks = chunking_by_recursive_character(
        tok, text, chunk_overlap_token_size=0, chunk_token_size=4
    )
    # paragraphs fit the budget → split exactly at paragraph boundaries
    assert [c["content"] for c in chunks] == [
        "one two three",
        "four five six",
        "seven eight nine",
    ]


def test_cjk_sentence_split():
    tok = SegmentTokenizer()
    # whole CJK sentences are single segment-tokens; budget of 1 token forces
    # the cascade down to the 。 separator
    text = "第一句话。第二句话。第三句话。"
    chunks = chunking_by_recursive_character(
        tok, text, chunk_overlap_token_size=0, chunk_token_size=1
    )
    assert len(chunks) >= 2
    joined = "".join(c["content"] for c in chunks)
    assert "第一句话" in joined and "第三句话" in joined


def test_overlap_carries_context():
    tok = SegmentTokenizer()
    text = " ".join(f"w{i}" for i in range(20))
    chunks = chunking_by_recursive_character(
        tok, text, chunk_overlap_token_size=2, chunk_token_size=5
    )
    # consecutive chunks share their boundary words
    for a, b in zip(chunks, chunks[1:]):
        tail = a["content"].split()[-1]
        assert tail in b["content"].split()


def test_overlap_ge_size_raises():
    import pytest

    with pytest.raises(ValueError):
        chunking_by_recursive_character(
            SegmentTokenizer(), "a b", chunk_overlap_token_size=5, chunk_token_size=5
        )
