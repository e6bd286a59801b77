"""LLM cache: key parity with reference + cache behavior."""

from __future__ import annotations

from lightrag_ray.stages.llm_cache import (
    LLMCache,
    cached_model_fn,
    compute_args_hash,
    extraction_cache_key,
    generate_cache_key,
)


def test_args_hash_parity(ref):
    assert compute_args_hash("abc") == ref.utils.compute_args_hash("abc")
    assert compute_args_hash("a", "b", "c") == ref.utils.compute_args_hash(
        "a", "b", "c"
    )
    # boundary-ambiguity cases must NOT collide
    assert compute_args_hash("abc", "x") != compute_args_hash("ab", "cx")
    assert compute_args_hash("abc", "x") == ref.utils.compute_args_hash("abc", "x")


def test_cache_key_format(ref):
    h = compute_args_hash("p")
    assert generate_cache_key("default", "extract", h) == (
        ref.utils.generate_cache_key("default", "extract", h)
    )
    key = extraction_cache_key("user", "sys", [])
    assert key.startswith("default:extract:")


def test_cached_model_fn_and_persistence(tmp_path):
    calls = []

    def model(u, s, h):
        calls.append(u)
        return f"resp:{u}"

    path = str(tmp_path / "cache.parquet")
    cache = LLMCache(persist_path=path)
    fn = cached_model_fn(model, cache)
    assert fn("p1", None, []) == "resp:p1"
    assert fn("p1", None, []) == "resp:p1"
    assert len(calls) == 1  # second call served from cache
    assert fn("p2", "sys", [{"role": "user", "content": "x"}]) == "resp:p2"
    cache.flush()

    cache2 = LLMCache(persist_path=path)
    fn2 = cached_model_fn(model, cache2)
    assert fn2("p1", None, []) == "resp:p1"
    assert len(calls) == 2  # persisted entry reused across "actors"
    assert cache2.hits == 1


def test_truncated_responses_not_cached():
    cache = LLMCache()
    cache.put("k", "partial...", truncated=True)
    assert cache.get("k") is None


def test_clear_cache(tmp_path):
    from lightrag_ray.stages.llm_cache import LLMCache

    path = str(tmp_path / "cache.parquet")
    c = LLMCache(persist_path=path)
    c.put("k1", "v1")
    c.flush()
    assert LLMCache(persist_path=path).get("k1") == "v1"
    assert c.clear() is True
    assert c.get("k1") is None
    import os

    assert not os.path.exists(path)  # persisted file dropped too
    assert LLMCache(persist_path=path).get("k1") is None
