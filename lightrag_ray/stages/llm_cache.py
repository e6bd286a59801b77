"""LLM response cache (reference X2).

Key scheme parity with the reference:
  - ``compute_args_hash``: md5 over length-prefixed ``"{len}:{field}"`` fields
    (lightrag/utils.py:680-718 — prefixing makes field boundaries
    unambiguous, preventing ("abc","x") / ("ab","cx") collisions);
  - cache key = ``"{mode}:{cache_type}:{hash}"``
    (``generate_cache_key``, lightrag/utils.py:869-880);
  - hashed fields mirror ``use_llm_func_with_cache``: user prompt, system
    prompt, flattened history, response-format marker, and the non-secret
    LLM identity (lightrag/utils.py:4547-4567 + get_llm_cache_identity :747).

Storage: a per-actor dict, optionally persisted to Parquet so re-runs of an
idempotent partition skip their model calls — the Ray analogue of the
reference's ``llm_response_cache`` KV store.  Truncated responses are NOT
cached (lightrag/utils.py:4610-4618 — a response cut off by max-tokens would
poison every future run).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any


def compute_args_hash(*args: Any) -> str:
    if len(args) <= 1:
        args_str = "".join(str(a) for a in args)
    else:
        args_str = "".join(f"{len(s)}:{s}" for s in (str(a) for a in args))
    return hashlib.md5(args_str.encode("utf-8", errors="replace")).hexdigest()


def generate_cache_key(mode: str, cache_type: str, hash_value: str) -> str:
    return f"{mode}:{cache_type}:{hash_value}"


def extraction_cache_key(
    user_prompt: str,
    system_prompt: str | None,
    history: list[dict] | None,
    llm_identity: dict | None = None,
    response_format: Any = None,
    mode: str = "default",
    cache_type: str = "extract",
) -> str:
    history_str = json.dumps(history or [], ensure_ascii=False, sort_keys=True)
    identity_str = json.dumps(llm_identity or {}, ensure_ascii=False, sort_keys=True)
    fmt = "" if response_format is None else repr(response_format)
    h = compute_args_hash(user_prompt, system_prompt or "", history_str, fmt,
                          identity_str)
    return generate_cache_key(mode, cache_type, h)


class LLMCache:
    """Per-actor response cache with optional Parquet persistence."""

    def __init__(self, persist_path: str | None = None):
        self._mem: dict[str, str] = {}
        self.persist_path = persist_path
        self.hits = 0
        self.misses = 0
        if persist_path and os.path.exists(persist_path):
            import pyarrow.parquet as pq

            table = pq.read_table(persist_path)
            self._mem = dict(
                zip(
                    table.column("key").to_pylist(),
                    table.column("response").to_pylist(),
                )
            )

    def get(self, key: str) -> str | None:
        value = self._mem.get(key)
        if value is None:
            self.misses += 1
        else:
            self.hits += 1
        return value

    def put(self, key: str, response: str, truncated: bool = False) -> None:
        if truncated:  # never cache cut-off responses
            return
        self._mem[key] = response

    def clear(self) -> bool:
        """Drop all cached responses (``aclear_cache``, lightrag/lightrag.py:
        4192-4226): clears memory and removes the persisted file so re-runs
        re-invoke the model."""
        self._mem.clear()
        self.hits = self.misses = 0
        if self.persist_path and os.path.exists(self.persist_path):
            os.remove(self.persist_path)
        return True

    def flush(self) -> None:
        if not self.persist_path:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        keys = list(self._mem)
        table = pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "response": pa.array([self._mem[k] for k in keys], pa.string()),
            }
        )
        tmp = self.persist_path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, self.persist_path)


def cached_model_fn(model_fn, cache: LLMCache, llm_identity: dict | None = None):
    """Wrap a ``(user, system, history) -> str`` model fn with the cache.

    A reply carrying the :class:`functions.provider.TruncatedResponse`
    marker is returned to the caller (parsing proceeds on the partial
    payload) but never written to the cache — the reference's cache-write
    guard, lightrag/utils.py:4602-4618."""
    from lightrag_ray.functions.provider import is_truncated_response

    def wrapped(user_prompt: str, system_prompt: str | None, history: list[dict]):
        key = extraction_cache_key(user_prompt, system_prompt, history, llm_identity)
        hit = cache.get(key)
        if hit is not None:
            return hit
        response = model_fn(user_prompt, system_prompt, history)
        cache.put(key, response, truncated=is_truncated_response(response))
        return response

    return wrapped
