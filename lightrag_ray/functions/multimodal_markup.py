"""Multimodal-markup strip before extraction (SURVEY §2.2 M13).

Behavioral port of ``strip_internal_multimodal_markup_for_extraction``
(lightrag/chunk_schema.py:332-379): parser-internal identifier attributes
(``id`` / ``refid`` / ``path`` / ``src``) must never reach the extraction
LLM, while visible captions, equation/table bodies and the ``format``
attribute survive.  The stored chunk ``content`` is never mutated — callers
apply this only when building the extraction prompt (the reference applies
it at lightrag/operate.py:3767).

The web-text tier produces no such markup; the hook exists so parser-sidecar
corpora route through the same extraction stage unchanged.
"""

from __future__ import annotations

import re

_CITE_RE = re.compile(r"<cite\b[^>]*>(.*?)</cite>", re.IGNORECASE | re.DOTALL)
_CITE_REFID_ATTR_RE = re.compile(r'\s+refid\s*=\s*"[^"]*"', re.IGNORECASE)
_DRAWING_RE = re.compile(r"<drawing\b([^>]*)/>", re.IGNORECASE)
_EQUATION_RE = re.compile(
    r"<equation\b([^>]*)>(.*?)</equation>", re.IGNORECASE | re.DOTALL
)
_TABLE_RE = re.compile(r"<table\b([^>]*)>(.*?)</table>", re.IGNORECASE | re.DOTALL)
_ATTR_RE = re.compile(r'(\w+)\s*=\s*"((?:[^"\\]|\\.)*)"')


def _attrs_to_dict(attr_string: str) -> dict[str, str]:
    return {m.group(1).lower(): m.group(2) for m in _ATTR_RE.finditer(attr_string)}


def _format_attrs(pairs: list[tuple[str, str]]) -> str:
    return "".join(f' {k}="{v}"' for k, v in pairs if v)


def _replace_drawing(match: re.Match) -> str:
    caption = _attrs_to_dict(match.group(1)).get("caption", "")
    if not caption.strip():
        return ""  # caption-less placeholders are dropped entirely
    return f"<drawing{_format_attrs([('caption', caption)])} />"


def _keep_format_caption(tag: str, match: re.Match) -> str:
    attrs = _attrs_to_dict(match.group(1))
    keep: list[tuple[str, str]] = []
    if attrs.get("format", ""):
        keep.append(("format", attrs["format"]))
    if attrs.get("caption", "").strip():
        keep.append(("caption", attrs["caption"]))
    return f"<{tag}{_format_attrs(keep)}>{match.group(2)}</{tag}>"


def strip_internal_multimodal_markup_for_extraction(
    content: str, *, keep_cite_tag: bool = False
) -> str:
    """See module docstring; semantics per lightrag/chunk_schema.py:332-379."""
    if not content:
        return content
    if keep_cite_tag:
        cleaned = _CITE_REFID_ATTR_RE.sub("", content)
    else:
        cleaned = _CITE_RE.sub(lambda m: m.group(1), content)
    cleaned = _DRAWING_RE.sub(_replace_drawing, cleaned)
    cleaned = _TABLE_RE.sub(lambda m: _keep_format_caption("table", m), cleaned)
    cleaned = _EQUATION_RE.sub(
        lambda m: _keep_format_caption("equation", m), cleaned
    )
    return cleaned
