"""Recursive-character chunking (the reference's "R" strategy).

The reference wraps LangChain's ``RecursiveCharacterTextSplitter`` with a
token ``length_function`` and an i18n separator cascade
(lightrag/chunker/recursive_character.py, cascade
lightrag/constants.py:108-119: paragraph > line > CJK sentence enders > CJK
semi-clauses > space > char).  This is a from-scratch implementation of the
same public algorithm (split on the first separator present, recurse into
oversize pieces with the remaining cascade, greedily merge adjacent pieces
under the token budget while carrying ``chunk_overlap`` tokens of trailing
context), with separators kept at the START of the following piece and
chunks whitespace-stripped — LangChain's defaults.

English sentence punctuation is deliberately absent from the cascade (it
would split numerals like ``0.95`` — see the reference's comment at
lightrag/constants.py:100-107).
"""

from __future__ import annotations

from typing import Any, Callable

from lightrag_ray.functions.tokenizer import Tokenizer

DEFAULT_R_SEPARATORS: tuple[str, ...] = (
    "\n\n",
    "\n",
    "。",
    "！",
    "？",
    "；",
    "，",
    " ",
    "",
)


def _split_keep_start(text: str, separator: str) -> list[str]:
    """Split on ``separator``, attaching each separator occurrence to the
    START of the following piece; drops empty pieces."""
    if separator == "":
        return list(text)
    parts = text.split(separator)
    out: list[str] = []
    for i, piece in enumerate(parts):
        if i > 0:
            piece = separator + piece
        if piece:
            out.append(piece)
    return out


def _merge_pieces(
    pieces: list[str],
    length_fn: Callable[[str], int],
    chunk_size: int,
    chunk_overlap: int,
) -> list[str]:
    """Greedy packing with trailing-overlap carry (LangChain
    ``_merge_splits`` semantics, joined on '')."""
    chunks: list[str] = []
    current: list[str] = []
    total = 0
    for piece in pieces:
        plen = length_fn(piece)
        if current and total + plen > chunk_size:
            chunks.append("".join(current))
            # carry trailing pieces into the next chunk as overlap
            while current and (
                total > chunk_overlap or (total + plen > chunk_size and total > 0)
            ):
                total -= length_fn(current[0])
                current.pop(0)
        current.append(piece)
        total += plen
    if current:
        chunks.append("".join(current))
    return chunks


def _split_recursive(
    text: str,
    separators: tuple[str, ...],
    length_fn: Callable[[str], int],
    chunk_size: int,
    chunk_overlap: int,
) -> list[str]:
    # first separator present in the text (or the final catch-all)
    separator = separators[-1]
    remaining: tuple[str, ...] = ()
    for i, s in enumerate(separators):
        if s == "" or s in text:
            separator = s
            remaining = separators[i + 1 :]
            break

    good: list[str] = []
    out: list[str] = []
    for piece in _split_keep_start(text, separator):
        if length_fn(piece) <= chunk_size:
            good.append(piece)
        else:
            if good:
                out.extend(_merge_pieces(good, length_fn, chunk_size, chunk_overlap))
                good = []
            if remaining:
                out.extend(
                    _split_recursive(
                        piece, remaining, length_fn, chunk_size, chunk_overlap
                    )
                )
            else:
                out.append(piece)  # unsplittable oversize piece passes through
    if good:
        out.extend(_merge_pieces(good, length_fn, chunk_size, chunk_overlap))
    return out


def chunking_by_recursive_character(
    tokenizer: Tokenizer,
    content: str,
    chunk_overlap_token_size: int = 100,
    chunk_token_size: int = 1200,
    separators: tuple[str, ...] = DEFAULT_R_SEPARATORS,
) -> list[dict[str, Any]]:
    """Same output contract as :func:`chunk_text`:
    ``[{tokens, content, chunk_order_index}]`` (stripped, empties dropped)."""
    if chunk_overlap_token_size >= chunk_token_size:
        raise ValueError(
            f"chunk_overlap_token_size ({chunk_overlap_token_size}) must be < "
            f"chunk_token_size ({chunk_token_size})"
        )

    def length_fn(s: str) -> int:
        return len(tokenizer.encode(s))

    results: list[dict[str, Any]] = []
    order = 0
    for chunk in _split_recursive(
        content, tuple(separators), length_fn, chunk_token_size,
        chunk_overlap_token_size,
    ):
        stripped = chunk.strip()
        if not stripped:
            continue
        results.append(
            {
                "tokens": length_fn(stripped),
                "content": stripped,
                "chunk_order_index": order,
            }
        )
        order += 1
    return results
