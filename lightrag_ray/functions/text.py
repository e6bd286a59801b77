"""Text sanitize / normalize kernels.

Behavior-parity ports of the reference's canonicalization functions — these
strings are the groupby keys of the whole pipeline, so their semantics are
pinned to the reference (cited per function) and covered by unit tests.  All
functions are pure and deterministic; they run inside ``map_batches`` bodies.

Reference behavior sources:
  - sanitize_text_for_encoding      lightrag/utils.py:4835-4873
  - normalize_extracted_info        lightrag/utils.py:4702-4832
  - normalize_entity_name           lightrag/utils.py:4697-4699
  - split_string_by_multi_markers   lightrag/utils.py:3310-3316
  - _truncate_entity_identifier     lightrag/operate.py:205-242
  - get_content_summary             lightrag/utils.py:4661-4674
  - compute_mdhash_id               lightrag/utils.py (md5-prefix ids)
"""

from __future__ import annotations

import hashlib
import html
import re

from lightrag_ray.constants import ENTITY_NAME_MAX_BYTES, ENTITY_NAME_MAX_LENGTH

# Unicode surrogates plus the two non-characters U+FFFE/U+FFFF.
_SURROGATES_RE = re.compile(r"[\uD800-\uDFFF￾￿]")
# C0/C1-ish control chars except \t \n \r.
_CONTROL_RE = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")

_P_TAG_RE = re.compile(r"</p\s*>|<p\s*>|<p/>", re.IGNORECASE)
_BR_TAG_RE = re.compile(r"</br\s*>|<br\s*>|<br/>", re.IGNORECASE)

_FULLWIDTH_MAP = str.maketrans(
    "ＡＢＣＤＥＦＧＨＩＪＫＬＭＮＯＰＱＲＳＴＵＶＷＸＹＺ"
    "ａｂｃｄｅｆｇｈｉｊｋｌｍｎｏｐｑｒｓｔｕｖｗｘｙｚ"
    "０１２３４５６７８９",
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789",
)

_CJK = "一-龥"
_CJK_GAP_RE = re.compile(rf"(?<=[{_CJK}])\s+(?=[{_CJK}])")
_ASCII_CLASS = r"a-zA-Z0-9\(\)\[\]@#$%!&\*\-=+_"
_CJK_THEN_ASCII_RE = re.compile(rf"(?<=[{_CJK}])\s+(?=[{_ASCII_CLASS}])")
_ASCII_THEN_CJK_RE = re.compile(rf"(?<=[{_ASCII_CLASS}])\s+(?=[{_CJK}])")
_QUOTE_BEFORE_CJK_RE = re.compile(rf"['\"]+(?=[{_CJK}])")
_QUOTE_AFTER_CJK_RE = re.compile(rf"(?<=[{_CJK}])['\"]+")
_NNBSP_AFTER_NONDIGIT_RE = re.compile("(?<=[^\\d])\u202f")
_PURE_DIGITS_RE = re.compile(r"^[0-9]+$")


def sanitize_text_for_encoding(text: str, replacement_char: str = "") -> str:
    """Strip → unescape HTML entities → drop surrogates/non-chars → drop
    control chars (keeping \\t \\n \\r) → strip.

    This IS the whole "text extraction" step for raw/web-text documents in the
    reference (applied at enqueue, lightrag/pipeline.py:1010/1025), and it
    defines the byte-identical-extracted-text-per-url invariant.
    """
    if not text:
        return text
    text = text.strip()
    if not text:
        return text
    if "&" in text:  # html.unescape touches only '&'-sequences
        text = html.unescape(text)
    if not text.isascii():
        text = _SURROGATES_RE.sub(replacement_char, text)
    text = _CONTROL_RE.sub(replacement_char, text)
    return text.strip()


def _strip_matched_outer(name: str, open_ch: str, close_ch: str) -> str:
    """Remove one layer of outer quotes when the inner text has none."""
    if name.startswith(open_ch) and name.endswith(close_ch):
        inner = name[1:-1]
        if open_ch == close_ch:
            if open_ch not in inner:
                return inner
        elif open_ch not in inner and close_ch not in inner:
            return inner
    return name


def _is_dotted_numeric(text: str) -> bool:
    return all(c.isdigit() or c == "." for c in text) and "." in text


def normalize_extracted_info(name: str, remove_inner_quotes: bool = False) -> str:
    """Entity/description normalization (reference lightrag/utils.py:4702-4832).

    Strips ``<p>``/``<br>`` tags, folds full-width CJK alphanumerics and
    punctuation to half-width, removes whitespace adjacent to CJK characters,
    strips one layer of matching outer quotes, optionally removes inner
    CJK-adjacent quotes, and filters out short numeric-only strings
    (pure digits < 3 chars; digits+dots < 6 chars).
    """
    # ASCII fast path: every full-width / CJK-adjacency rule targets non-ASCII
    # characters (CJK lookarounds, full-width punctuation, NBSP variants), so
    # for pure-ASCII input only the tag strip, ASCII outer-quote strip and
    # numeric filters can fire.  Byte-equivalence is pinned by the fuzz parity
    # tests against the reference.
    if name.isascii():
        if "<" in name:
            name = _P_TAG_RE.sub("", name)
            name = _BR_TAG_RE.sub("", name)
        if len(name) >= 2 and name[0] in "\"'":
            name = _strip_matched_outer(name, '"', '"')
            name = _strip_matched_outer(name, "'", "'")
        name = name.strip()
        if len(name) < 3 and _PURE_DIGITS_RE.match(name):
            return ""
        if len(name) < 6 and _is_dotted_numeric(name):
            return ""
        return name

    name = _P_TAG_RE.sub("", name)
    name = _BR_TAG_RE.sub("", name)

    name = name.translate(_FULLWIDTH_MAP)
    name = name.replace("－", "-").replace("＋", "+").replace("／", "/")
    name = name.replace("＊", "*")
    name = name.replace("（", "(").replace("）", ")")
    name = name.replace("—", "-")
    name = name.replace("　", " ")

    name = _CJK_GAP_RE.sub("", name)
    name = _CJK_THEN_ASCII_RE.sub("", name)
    name = _ASCII_THEN_CJK_RE.sub("", name)

    if len(name) >= 2:
        name = _strip_matched_outer(name, '"', '"')
        name = _strip_matched_outer(name, "'", "'")
        name = _strip_matched_outer(name, "“", "”")
        name = _strip_matched_outer(name, "‘", "’")
        name = _strip_matched_outer(name, "《", "》")

    if remove_inner_quotes:
        for q in ("“", "”", "‘", "’"):
            name = name.replace(q, "")
        name = _QUOTE_BEFORE_CJK_RE.sub("", name)
        name = _QUOTE_AFTER_CJK_RE.sub("", name)
        name = name.replace("\u00a0", " ")
        name = _NNBSP_AFTER_NONDIGIT_RE.sub(" ", name)

    name = name.strip()

    if len(name) < 3 and _PURE_DIGITS_RE.match(name):
        return ""
    if len(name) < 6 and _is_dotted_numeric(name):
        return ""
    return name


def sanitize_and_normalize(text: str, remove_inner_quotes: bool = False) -> str:
    """sanitize + normalize composition (reference lightrag/utils.py:4677-4694)."""
    safe = sanitize_text_for_encoding(text)
    if safe:
        return normalize_extracted_info(safe, remove_inner_quotes=remove_inner_quotes)
    return ""


def normalize_entity_name(text: str) -> str:
    """The canonical entity key (reference lightrag/utils.py:4697-4699)."""
    return sanitize_and_normalize(text, remove_inner_quotes=True)


def normalize_entity_name_short(text: str) -> str:
    """Memoized :func:`normalize_entity_name` for hot-name call sites."""
    return sanitize_and_normalize_short(text, remove_inner_quotes=True)


def truncate_entity_identifier(
    identifier: str,
    limit: int = ENTITY_NAME_MAX_LENGTH,
    byte_limit: int = ENTITY_NAME_MAX_BYTES,
) -> str:
    """Cap an identifier at ``limit`` chars AND ``byte_limit`` UTF-8 bytes,
    cutting on a character boundary (reference lightrag/operate.py:205-242)."""
    if len(identifier) <= limit and len(identifier.encode("utf-8")) <= byte_limit:
        return identifier
    out = identifier[:limit]
    encoded = out.encode("utf-8")
    if len(encoded) > byte_limit:
        out = encoded[:byte_limit].decode("utf-8", errors="ignore")
    return out


from functools import lru_cache


@lru_cache(maxsize=64)
def _marker_splitter(markers: tuple[str, ...]) -> re.Pattern:
    return re.compile("|".join(re.escape(m) for m in markers))


def split_string_by_multi_markers(content: str, markers: list[str]) -> list[str]:
    """Split on any of the literal markers; strip pieces; drop empties
    (reference lightrag/utils.py:3310-3316)."""
    if not markers:
        return [content]
    content = content if content is not None else ""
    parts = _marker_splitter(tuple(markers)).split(content)
    return [p.strip() for p in parts if p.strip()]


def get_content_summary(content: str, max_length: int = 250) -> str:
    content = content.strip()
    if len(content) <= max_length:
        return content
    return content[:max_length] + "..."


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def compute_mdhash_id(content: str, prefix: str = "") -> str:
    """Stable md5-based record id, e.g. ``doc-<md5>`` / ``ent-<md5>``."""
    return prefix + md5_hex(content)


@lru_cache(maxsize=131072)
def _sanitize_and_normalize_cached(text: str, remove_inner_quotes: bool) -> str:
    return sanitize_and_normalize(text, remove_inner_quotes=remove_inner_quotes)


def sanitize_and_normalize_short(text: str, remove_inner_quotes: bool = False) -> str:
    """Memoized ``sanitize_and_normalize`` for SHORT, high-repetition fields
    (entity names / types / keywords — a hot entity's name re-normalizes once
    per mention otherwise).  Long strings (descriptions) bypass the cache so
    the LRU holds ≤ ~35 MB worst-case per process.  Pure-function memo: the
    output is byte-identical to the uncached path."""
    if text is not None and len(text) <= 128:
        return _sanitize_and_normalize_cached(text, remove_inner_quotes)
    return sanitize_and_normalize(text, remove_inner_quotes=remove_inner_quotes)
