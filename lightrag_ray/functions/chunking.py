"""Token-window chunking kernel.

Behavior parity with the reference default chunker ``chunking_by_token_size``
(lightrag/chunker/token_size.py:130-256): encode the whole document, slide
windows of ``chunk_token_size`` tokens with stride ``size - overlap``, decode
each window and ``.strip()`` it.  With ``split_by_character`` the text is
pre-split on that delimiter and each segment is either taken whole
(``split_by_character_only=True``, error if over the cap) or window-split when
it exceeds the cap.  ``overlap >= size`` raises ``ValueError`` (fail closed,
reference token_size.py:115-128).

Chunk ids follow ``build_chunks_dict_from_chunking_result``
(lightrag/utils_pipeline.py:133-190): ``{doc_id}-chunk-{order:03d}``.

Pure functions; the Ray actor stage wraps them in
:class:`lightrag_ray.stages.chunk.ChunkerStage`.
"""

from __future__ import annotations

from typing import Any

from lightrag_ray.constants import CHUNK_OVERLAP_TOKEN_SIZE, CHUNK_TOKEN_SIZE
from lightrag_ray.functions.tokenizer import Tokenizer


class ChunkTokenLimitExceededError(ValueError):
    def __init__(self, chunk_tokens: int, chunk_token_limit: int, chunk_preview: str):
        super().__init__(
            f"chunk of {chunk_tokens} tokens exceeds limit {chunk_token_limit}: "
            f"{chunk_preview!r}"
        )
        self.chunk_tokens = chunk_tokens
        self.chunk_token_limit = chunk_token_limit


def _window_step(chunk_token_size: int, chunk_overlap_token_size: int) -> int:
    if chunk_overlap_token_size >= chunk_token_size:
        raise ValueError(
            f"chunk_overlap_token_size ({chunk_overlap_token_size}) must be < "
            f"chunk_token_size ({chunk_token_size})"
        )
    return chunk_token_size - chunk_overlap_token_size


def chunk_text(
    tokenizer: Tokenizer,
    content: str,
    split_by_character: str | None = None,
    split_by_character_only: bool = False,
    chunk_overlap_token_size: int = CHUNK_OVERLAP_TOKEN_SIZE,
    chunk_token_size: int = CHUNK_TOKEN_SIZE,
) -> list[dict[str, Any]]:
    """Return ``[{tokens, content, chunk_order_index}]`` for one document."""
    step = _window_step(chunk_token_size, chunk_overlap_token_size)
    results: list[dict[str, Any]] = []

    if split_by_character:
        pieces: list[tuple[int, str]] = []  # (token_count, text)
        for segment in content.split(split_by_character):
            seg_tokens = tokenizer.encode(segment)
            if len(seg_tokens) > chunk_token_size:
                if split_by_character_only:
                    raise ChunkTokenLimitExceededError(
                        chunk_tokens=len(seg_tokens),
                        chunk_token_limit=chunk_token_size,
                        chunk_preview=segment[:120],
                    )
                for start in range(0, len(seg_tokens), step):
                    end = min(start + chunk_token_size, len(seg_tokens))
                    pieces.append(
                        (
                            min(chunk_token_size, len(seg_tokens) - start),
                            tokenizer.decode(seg_tokens[start:end]),
                        )
                    )
            else:
                pieces.append((len(seg_tokens), segment))
        for index, (n_tokens, text) in enumerate(pieces):
            results.append(
                {
                    "tokens": n_tokens,
                    "content": text.strip(),
                    "chunk_order_index": index,
                }
            )
        return results

    tokens = tokenizer.encode(content)
    for index, start in enumerate(range(0, len(tokens), step)):
        end = min(start + chunk_token_size, len(tokens))
        results.append(
            {
                "tokens": min(chunk_token_size, len(tokens) - start),
                "content": tokenizer.decode(tokens[start:end]).strip(),
                "chunk_order_index": index,
            }
        )
    return results


def chunk_id_for(doc_id: str, chunk_order_index: int) -> str:
    """``{doc_id}-chunk-{order:03d}`` (lightrag/utils_pipeline.py:161)."""
    return f"{doc_id}-chunk-{chunk_order_index:03d}"


def expected_chunk_count(
    n_tokens: int,
    chunk_token_size: int = CHUNK_TOKEN_SIZE,
    chunk_overlap_token_size: int = CHUNK_OVERLAP_TOKEN_SIZE,
) -> int:
    """Number of windows ``range(0, n, size-overlap)`` yields — the closed form
    the DuckDB oracle uses: ``ceil(n / (size - overlap))`` for ``n > 0``."""
    step = _window_step(chunk_token_size, chunk_overlap_token_size)
    return -(-n_tokens // step) if n_tokens > 0 else 0
