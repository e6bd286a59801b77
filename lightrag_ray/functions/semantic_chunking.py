"""Semantic-vector chunking ("V" strategy, SURVEY §2.3 C3) and the
embedding-limit hard re-split (C5).

C3 re-expresses the reference's ``chunking_by_semantic_vector``
(lightrag/chunker/semantic_vector.py — a wrapper over LangChain's
SemanticChunker) with the same algorithm, self-contained and driven by the
repo's pluggable :class:`~lightrag_ray.stages.embed.Embedder` protocol:

  1. split the text into sentences (LangChain's default
     ``(?<=[.?!])\\s+`` regex);
  2. embed each sentence together with ``buffer_size`` neighbors on each
     side (the combined window is what gets embedded);
  3. breakpoints where the cosine distance between consecutive window
     embeddings exceeds the ``breakpoint_threshold_type`` threshold
     (percentile / standard_deviation / interquartile over the observed
     distances);
  4. sentences between breakpoints merge into one chunk; chunks below
     ``min_chunk_chars`` merge forward.

Size is ADVISORY only, exactly like the reference (semantic_vector.py:20-21):
oversized chunks are cut afterwards by C5's
:func:`enforce_chunk_token_limit`, the re-expression of
``enforce_chunk_token_limit_before_embedding`` (lightrag/utils.py:3578-3746)
— token-window re-split with ``overlap_tokens`` of carried context, token
counts recomputed, order re-assigned by enumeration (C6 semantics,
lightrag/utils_pipeline.py:133-190).  Sidecar/source-span bookkeeping from
the reference does not apply to the web-text tier (no parser sidecars).

Deviation (documented): the reference inherits LangChain's private
breakpoint arithmetic; this implementation states it directly.  With no
embedder configured the reference falls back to the recursive-character
strategy (semantic_vector.py:22-24) — mirrored here.
"""

from __future__ import annotations

import re

import numpy as np

SENTENCE_SPLIT_RE = re.compile(r"(?<=[.?!])\s+")

BREAKPOINT_DEFAULTS = {
    "percentile": 95.0,
    "standard_deviation": 3.0,
    "interquartile": 1.5,
}


def _window_texts(sentences: list[str], buffer_size: int) -> list[str]:
    out = []
    n = len(sentences)
    for i in range(n):
        lo = max(0, i - buffer_size)
        hi = min(n, i + buffer_size + 1)
        out.append(" ".join(sentences[lo:hi]))
    return out


def _breakpoint_threshold(distances: np.ndarray, kind: str, amount: float) -> float:
    if kind == "percentile":
        return float(np.percentile(distances, amount))
    if kind == "standard_deviation":
        return float(distances.mean() + amount * distances.std())
    if kind == "interquartile":
        q1, q3 = np.percentile(distances, [25, 75])
        return float(distances.mean() + amount * (q3 - q1))
    raise ValueError(f"unknown breakpoint_threshold_type {kind!r}")


def chunk_text_semantic(
    embedder,
    text: str,
    buffer_size: int = 1,
    breakpoint_threshold_type: str = "percentile",
    breakpoint_threshold_amount: float | None = None,
    min_chunk_chars: int = 0,
) -> list[dict]:
    """text → [{content, chunk_order_index}] by semantic breakpoints."""
    text = text.strip()
    if not text:
        return []
    sentences = [s for s in SENTENCE_SPLIT_RE.split(text) if s.strip()]
    if len(sentences) <= 1:
        return [{"content": text, "chunk_order_index": 0}]

    vecs = np.asarray(
        embedder.embed(_window_texts(sentences, buffer_size)), dtype=np.float64
    )
    norms = np.linalg.norm(vecs, axis=1)
    unit = vecs / np.where(norms == 0, 1.0, norms)[:, None]
    distances = 1.0 - (unit[:-1] * unit[1:]).sum(axis=1)

    amount = (
        BREAKPOINT_DEFAULTS[breakpoint_threshold_type]
        if breakpoint_threshold_amount is None
        else breakpoint_threshold_amount
    )
    threshold = _breakpoint_threshold(
        distances, breakpoint_threshold_type, amount
    )
    breakpoints = set(np.nonzero(distances > threshold)[0].tolist())

    chunks: list[str] = []
    current: list[str] = []
    for i, sentence in enumerate(sentences):
        current.append(sentence)
        if i in breakpoints:
            chunks.append(" ".join(current))
            current = []
    if current:
        chunks.append(" ".join(current))

    if min_chunk_chars > 0:
        merged: list[str] = []
        for c in chunks:
            if merged and len(merged[-1]) < min_chunk_chars:
                merged[-1] = merged[-1] + " " + c
            else:
                merged.append(c)
        chunks = merged

    return [
        {"content": c, "chunk_order_index": i} for i, c in enumerate(chunks)
    ]


def enforce_chunk_token_limit(
    chunks: list[dict],
    tokenizer,
    max_tokens: int,
    overlap_tokens: int = 0,
) -> list[dict]:
    """C5: hard token-window re-split of any chunk over ``max_tokens``
    (lightrag/utils.py:3578-3746), order re-assigned by enumeration."""
    if max_tokens <= 0:
        return list(chunks)
    if overlap_tokens >= max_tokens:
        overlap_tokens = 0  # forward progress guard (reference warning path)
    out: list[dict] = []
    for dp in chunks:
        content = dp.get("content", "")
        if not isinstance(content, str) or not content.strip():
            continue
        ids = tokenizer.encode(content)
        if len(ids) <= max_tokens:
            out.append(dict(dp, tokens=len(ids)))
            continue
        stride = max_tokens - overlap_tokens
        for start in range(0, len(ids), stride):
            window = ids[start : start + max_tokens]
            piece = tokenizer.decode(window).strip()
            if piece:
                out.append(dict(dp, content=piece, tokens=len(window)))
            if start + max_tokens >= len(ids):
                break
    for i, dp in enumerate(out):
        dp["chunk_order_index"] = i
    return out
