"""Tokenizers for the token-window chunker.

The reference's chunker takes an injected ``Tokenizer`` with ``encode(str) ->
list[int]`` / ``decode(list[int]) -> str`` (contract: lightrag/utils.py:2840-2884;
default tiktoken o200k_base via model name gpt-4o-mini, lightrag/utils.py:3096-3123).

tiktoken is not installed in this environment, so the default here is
:class:`SegmentTokenizer` — a deterministic, lossless word-segment tokenizer:

  * a token is one ``\\s*\\S+`` match (leading whitespace attaches to the
    following word); a trailing whitespace-only tail attaches to the last
    token, so ``decode(encode(s)) == s`` exactly and any token-window slice
    decodes to the exact source substring (the property the chunker depends on);
  * for text with single-space word separation, ``len(encode(s))`` equals the
    whitespace word count — which makes chunk counts expressible in the DuckDB
    oracle SQL (``array_length(regexp_extract_all(text, '\\S+'))``).

Token ids are interned per tokenizer instance (id tables are actor-local; only
counts and decoded text ever leave the actor, so cross-actor id agreement is
not required).  The intern table grows with observed vocabulary; at web scale
swap in a vendored BPE (e.g. tiktoken) via the same protocol.
"""

from __future__ import annotations

import re
from typing import Protocol


class Tokenizer(Protocol):
    def encode(self, text: str) -> list[int]: ...
    def decode(self, tokens: list[int]) -> str: ...


_SEGMENT_RE = re.compile(r"\s*\S+")


class SegmentTokenizer:
    """Deterministic lossless word-segment tokenizer (see module docstring)."""

    def __init__(self) -> None:
        self._id_of: dict[str, int] = {}
        self._str_of: list[str] = []

    def _intern(self, segment: str) -> int:
        tid = self._id_of.get(segment)
        if tid is None:
            tid = len(self._str_of)
            self._id_of[segment] = tid
            self._str_of.append(segment)
        return tid

    def encode(self, text: str) -> list[int]:
        if not text:
            return []
        segments = _SEGMENT_RE.findall(text)
        if not segments:
            # whitespace-only text is one token so decode stays lossless
            return [self._intern(text)]
        consumed = sum(len(s) for s in segments)
        if consumed < len(text):  # trailing whitespace attaches to last segment
            segments[-1] = segments[-1] + text[consumed:]
        return [self._intern(s) for s in segments]

    def decode(self, tokens: list[int]) -> str:
        return "".join(self._str_of[t] for t in tokens)


def default_tokenizer() -> Tokenizer:
    """tiktoken o200k_base when importable (reference default), else
    :class:`SegmentTokenizer`."""
    try:
        import tiktoken  # noqa: F401

        enc = tiktoken.encoding_for_model("gpt-4o-mini")

        class _Tik:
            def encode(self, text: str) -> list[int]:
                return enc.encode(text)

            def decode(self, tokens: list[int]) -> str:
                return enc.decode(tokens)

        return _Tik()
    except Exception:
        return SegmentTokenizer()
