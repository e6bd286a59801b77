"""Chunk reranking — the reference's ``enable_rerank`` query-path surface.

The reference reranks retrieved chunks through a provider API
(lightrag/rerank.py: cohere/jina/ali behind ``generic_rerank_api``), with two
pure kernels around the call: long documents are re-chunked into token
windows sized for the model's 512-token limit, and per-window scores are
aggregated back to the original documents.  Those kernels are reimplemented
here with behavioral parity (window/overlap walk and clamp rules,
rerank.py:36-134; max/mean/first aggregation + descending sort,
rerank.py:158-224); the provider call is a pluggable ``RerankFn`` with a
deterministic embedding-cosine default so the path is testable offline.

Scale shape: reranking operates on the ≤ ``chunk_top_k`` retrieved chunks of
ONE query — driver-side list arithmetic by design (the reference ships the
same list to an HTTP API).  The batch-scoring default uses one vectorized
matmul per call.
"""

from __future__ import annotations

from typing import Any, Callable, Protocol

from lightrag_ray.functions.tokenizer import Tokenizer

RERANK_MAX_TOKENS = 480  # margin under the common 512-token rerank limit
RERANK_OVERLAP_TOKENS = 32


class RerankFn(Protocol):
    """``(query, documents) -> [{"index": int, "relevance_score": float}]``"""

    def __call__(
        self, query: str, documents: list[str]
    ) -> list[dict[str, Any]]: ...


def chunk_documents_for_rerank(
    tokenizer: Tokenizer,
    documents: list[str],
    max_tokens: int = RERANK_MAX_TOKENS,
    overlap_tokens: int = RERANK_OVERLAP_TOKENS,
) -> tuple[list[str], list[int]]:
    """Split over-limit documents into overlapping token windows.

    Returns ``(chunked_documents, original_doc_indices)``.  Clamp rules match
    the reference: ``max_tokens < 1`` raises; ``overlap >= max`` clamps to
    ``max // 2`` (halving keeps the walk advancing ~half a window instead of
    one token per step)."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if overlap_tokens >= max_tokens:
        overlap_tokens = max_tokens // 2

    chunked: list[str] = []
    indices: list[int] = []
    for idx, doc in enumerate(documents):
        tokens = tokenizer.encode(doc)
        if len(tokens) <= max_tokens:
            chunked.append(doc)
            indices.append(idx)
            continue
        start = 0
        while start < len(tokens):
            end = min(start + max_tokens, len(tokens))
            chunked.append(tokenizer.decode(tokens[start:end]))
            indices.append(idx)
            if end >= len(tokens):
                break
            start = end - overlap_tokens
    return chunked, indices


def aggregate_chunk_scores(
    chunk_results: list[dict[str, Any]],
    doc_indices: list[int],
    num_original_docs: int,
    aggregation: str = "max",
) -> list[dict[str, Any]]:
    """Window scores → per-document scores, sorted descending.

    ``aggregation`` ∈ {"max", "mean", "first"} (unknown values fall back to
    max, as the reference does)."""
    if not chunk_results or not doc_indices:
        return []
    scores: dict[int, list[float]] = {i: [] for i in range(num_original_docs)}
    for res in chunk_results:
        try:
            chunk_idx = int(res["index"])
            score = float(res["relevance_score"])
        except (KeyError, TypeError, ValueError):
            continue
        if not 0 <= chunk_idx < len(doc_indices):
            continue
        doc_idx = doc_indices[chunk_idx]
        if isinstance(doc_idx, int) and 0 <= doc_idx < num_original_docs:
            scores[doc_idx].append(score)
    out: list[dict[str, Any]] = []
    for doc_idx, vals in scores.items():
        if not vals:
            continue
        if aggregation == "mean":
            final = sum(vals) / len(vals)
        elif aggregation == "first":
            final = vals[0]
        else:
            final = max(vals)
        out.append({"index": doc_idx, "relevance_score": final})
    out.sort(key=lambda r: r["relevance_score"], reverse=True)
    return out


def make_cosine_rerank_fn(embedder=None) -> RerankFn:
    """Deterministic offline rerank model: embedding cosine to the query
    (the testable stand-in for a provider API, same protocol)."""

    def fn(query: str, documents: list[str]) -> list[dict[str, Any]]:
        import numpy as np

        if not documents:
            return []
        from lightrag_ray.stages.embed import HashEmbedder

        emb = embedder if embedder is not None else HashEmbedder()
        vecs = np.asarray(emb.embed([query] + list(documents)), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        vecs = vecs / norms[:, None]
        sims = vecs[1:] @ vecs[0]
        return [
            {"index": i, "relevance_score": float(s)} for i, s in enumerate(sims)
        ]

    return fn


def rerank_chunks(
    query: str,
    chunks: list[dict[str, Any]],
    rerank_fn: RerankFn,
    tokenizer: Tokenizer,
    content_of: Callable[[dict], str] = lambda c: c.get("content", ""),
    top_n: int | None = None,
    min_score: float | None = None,
    aggregation: str = "max",
) -> list[dict[str, Any]]:
    """Re-order ``chunks`` by model relevance to ``query``.

    Orchestration parity with the reference's rerank application: window
    over-limit contents, score all windows in ONE model call, aggregate back
    per chunk, sort descending, then apply ``top_n`` / ``min_score``.  Each
    returned chunk carries ``rerank_score``."""
    if not chunks:
        return []
    docs = [content_of(c) for c in chunks]
    windows, indices = chunk_documents_for_rerank(tokenizer, docs)
    results = rerank_fn(query, windows)
    ranked = aggregate_chunk_scores(results, indices, len(chunks), aggregation)
    out: list[dict[str, Any]] = []
    for r in ranked:
        if min_score is not None and r["relevance_score"] < min_score:
            continue
        chunk = dict(chunks[r["index"]])
        chunk["rerank_score"] = r["relevance_score"]
        out.append(chunk)
        if top_n is not None and len(out) >= top_n:
            break
    return out
