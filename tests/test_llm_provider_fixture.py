"""Recorded-fixture provider tests (round-2 VERDICT #10).

No live network exists here, so a RecordedProvider replays a canned
transcript exhibiting the protocol edges no deterministic stand-in
exercises: streaming chunk assembly, a retryable 429 with exponential
backoff, and a max-token truncation that must parse but never be cached
(reference cache-write guard, lightrag/utils.py:4602-4618).
"""

from __future__ import annotations

import pytest

from lightrag_ray.constants import COMPLETION_DELIMITER, TUPLE_DELIMITER
from lightrag_ray.functions.provider import (
    RetryableProviderError,
    TruncatedResponse,
    assemble_stream,
    is_truncated_response,
    make_provider_model_fn,
)
from lightrag_ray.stages.llm_cache import LLMCache, cached_model_fn
from lightrag_ray.stages.llm_extractor import LLMExtractor

TD, CD = TUPLE_DELIMITER, COMPLETION_DELIMITER

EXTRACTION_REPLY = (
    f"entity{TD}Apache Arrow{TD}concept{TD}A columnar in-memory format\n"
    f"entity{TD}Ray Data{TD}concept{TD}A distributed dataset library\n"
    f"relation{TD}Apache Arrow{TD}Ray Data{TD}zero-copy{TD}"
    f"Ray Data streams Arrow blocks\n{CD}"
)


def _stream_of(text: str, n: int = 7, finish: str = "stop"):
    """Split a reply into n SSE-ish delta events (generator, single-use)."""
    step = max(1, len(text) // n)
    pieces = [text[i : i + step] for i in range(0, len(text), step)]
    for i, piece in enumerate(pieces):
        yield {
            "delta": piece,
            "finish_reason": finish if i == len(pieces) - 1 else None,
        }


class RecordedProvider:
    """Replays a scripted transcript.  Each entry is one of:
    ("raise", status), ("stream", text, finish_reason), ("text", text)."""

    def __init__(self, script: list[tuple]):
        self.script = list(script)
        self.calls: list[str] = []

    def __call__(self, user_prompt, system_prompt, history):
        self.calls.append(user_prompt)
        kind, *rest = self.script.pop(0)
        if kind == "raise":
            raise RetryableProviderError("rate limited", status=rest[0])
        if kind == "stream":
            text, finish = rest
            return _stream_of(text, finish=finish)
        return rest[0]


def test_stream_assembly_and_truncation_marker():
    full = assemble_stream(_stream_of("hello world", finish="stop"))
    assert full == "hello world" and not is_truncated_response(full)
    cut = assemble_stream(_stream_of("hello wor", finish="length"))
    assert cut == "hello wor" and is_truncated_response(cut)


def test_retry_429_then_streamed_extraction():
    provider = RecordedProvider(
        [("raise", 429), ("stream", EXTRACTION_REPLY, "stop")]
    )
    sleeps: list[float] = []
    model_fn = make_provider_model_fn(provider, sleep=sleeps.append)
    extractor = LLMExtractor(model_fn)
    result = extractor.extract("some chunk text", "chunk-1", 0, "")
    assert result == EXTRACTION_REPLY.strip()
    assert len(provider.calls) == 2  # original + one retry
    assert sleeps == [4.0]  # wait_exponential(multiplier=1, min=4, max=10)

    from lightrag_ray.functions.parse import parse_extraction_result

    entities, relations = parse_extraction_result(result, "chunk-1", 0)
    assert {e.entity_name for e in entities} == {"Apache Arrow", "Ray Data"}
    assert len(relations) == 1


def test_retry_exhaustion_propagates():
    provider = RecordedProvider([("raise", 429)] * 3)
    sleeps: list[float] = []
    model_fn = make_provider_model_fn(provider, sleep=sleeps.append)
    with pytest.raises(RetryableProviderError):
        model_fn("u", None, [])
    assert len(provider.calls) == 3  # stop_after_attempt(3)
    assert sleeps == [4.0, 4.0]  # 2^0, 2^1 both clamp to min=4


def test_truncated_response_skips_cache_then_full_response_caches():
    truncated = EXTRACTION_REPLY.split("\n")[0]  # first entity line only
    provider = RecordedProvider(
        [
            ("stream", truncated, "length"),  # cut off by max tokens
            ("stream", EXTRACTION_REPLY, "stop"),  # retry-run completes
        ]
    )
    cache = LLMCache()
    model_fn = cached_model_fn(
        make_provider_model_fn(provider, sleep=lambda s: None), cache
    )

    first = model_fn("user", "system", [])
    # partial payload is RETURNED (parsing proceeds on it) but not cached
    assert is_truncated_response(first) and first == truncated
    second = model_fn("user", "system", [])
    assert second == EXTRACTION_REPLY and len(provider.calls) == 2
    third = model_fn("user", "system", [])  # now served from cache
    assert third == EXTRACTION_REPLY and len(provider.calls) == 2
    assert cache.hits == 1 and cache.misses == 2


def test_query_keywords_through_recorded_provider():
    """query_llm's keyword extraction through the same provider adapter:
    429 then a streamed JSON reply wrapped in <think> noise."""
    from lightrag_ray.pipelines.query_llm import make_llm_keywords_fn

    reply = (
        '<think>reasoning...</think>{"high_level_keywords": ["graph build"],'
        ' "low_level_keywords": ["Ray Data", "Arrow"]}'
    )
    provider = RecordedProvider([("raise", 429), ("stream", reply, "stop")])
    keywords_fn = make_llm_keywords_fn(
        make_provider_model_fn(provider, sleep=lambda s: None)
    )
    kw = keywords_fn("how does the graph build use Ray Data and Arrow?")
    assert kw["high_level_keywords"] == ["graph build"]
    assert kw["low_level_keywords"] == ["Ray Data", "Arrow"]
    assert len(provider.calls) == 2


def test_query_answer_truncation_not_cached():
    """LLMQueryEngine.query must capture the truncation marker BEFORE
    remove_think_tags rebuilds a plain str (lightrag/utils.py:4600-4604):
    a truncated answer is returned but the next identical query re-invokes
    the model."""
    from lightrag_ray.pipelines.query_llm import LLMQueryEngine

    from types import SimpleNamespace

    class _NullEngine:
        def query(self, query, mode="hybrid", keywords_fn=None):
            return SimpleNamespace(entities=[], relations=[], chunks=[])

    answers = [TruncatedResponse("partial ans"), "full answer"]
    calls = []

    def answer_fn(q, system, history):
        calls.append(q)
        return answers[len(calls) - 1]

    eng = LLMQueryEngine(_NullEngine(), answer_model_fn=answer_fn)
    r1 = eng.query("q?", mode="local")
    assert r1.answer == "partial ans"
    r2 = eng.query("q?", mode="local")
    assert r2.answer == "full answer" and len(calls) == 2
    r3 = eng.query("q?", mode="local")
    assert r3.answer == "full answer" and len(calls) == 2  # cache hit
