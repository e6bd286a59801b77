"""Markdown → HeadingBlocks sidecar rows — the webtext-native parser for "P".

The reference's paragraph-semantic chunker consumes ``.blocks.jsonl`` sidecars
that only parser engines (docx/mineru/docling/markdown) emit.  Web text has no
parser sidecars, so this module produces the same block rows directly from
markdown-ish page text, making the "P" strategy usable on the webtext tier
end-to-end.

Behavioral model (reference ``extract_markdown``,
lightrag/parser/markdown/extract.py:161-340 + the sidecar writer's single-line
table-tag invariant, chunker/paragraph_semantic.py:178-190):

- ATX headings (``#`` .. ``######``) split blocks; a heading's raw text is
  rendered back as the block's first content line
  (``render_heading_line``, parser/_markdown.py:46-66); trailing closing
  hashes are stripped from the STORED heading, parents come from the
  heading stack.  Text before any heading lands in a level-0
  ``Preface/Uncategorized`` block.
- Fenced code blocks (``` / ~~~) suppress heading/table/equation detection.
- GFM pipe tables (header + delimiter row + body) become single-line
  ``<table id="tb-N" format="json">[[...]]</table>`` tags; the header grid
  is ALSO lifted into the tables.json payload (``table_header``) so
  TableRowSplit's HeaderRecovery re-injects it into row slices.
- HTML ``<table>…</table>`` blocks are collapsed to one line (the sidecar
  single-line invariant) and tagged ``format="html"``; a ``<thead>…</thead>``
  fragment is lifted as the repeating header.
- ``$$`` block equations become single-line ``<equation>latex</equation>``
  tags (atomic non-table paragraphs for the chunker).

Deliberate scope cuts vs the reference parser (documented): no image/asset
materialization (web pages here carry no asset store — inline image markdown
stays verbatim text), no setext headings / reference-style images / nested
tables (the reference leaves those verbatim too).
"""

from __future__ import annotations

import json
import re
from typing import Any

PREFACE_HEADING = "Preface/Uncategorized"

_HEADING = re.compile(r"^(#{1,6})\s+(.*?)\s*$")
_TRAILING_HASHES = re.compile(r"\s+#+\s*$")
_FENCE = re.compile(r"^(`{3,}|~{3,})(.*)$")
_DELIM_ROW = re.compile(r"^\s*\|?\s*:?-+:?\s*(\|\s*:?-+:?\s*)*\|?\s*$")
_DELIM_CELL = re.compile(r"^:?-+:?$")
_THEAD = re.compile(r"<thead\b.*?</thead>", re.DOTALL | re.IGNORECASE)


def render_heading_line(level: int, text: str) -> str:
    """``"#" * clamp(level, 1..6) + " " + text`` unless already prefixed."""
    if re.match(r"^#{1,6} +", text):
        return text
    return "#" * min(max(level, 1), 6) + " " + text


def _clean_heading(raw: str) -> str:
    return _TRAILING_HASHES.sub("", raw).strip()


def _split_row(line: str) -> list[str]:
    s = line.strip()
    if s.startswith("|"):
        s = s[1:]
    if s.endswith("|"):
        s = s[:-1]
    return [c.strip() for c in s.split("|")]


def _is_delimiter(header_line: str, delim_line: str) -> bool:
    if not _DELIM_ROW.match(delim_line):
        return False
    cells = _split_row(delim_line)
    if not all(_DELIM_CELL.match(c) for c in cells):
        return False
    return len(cells) == len(_split_row(header_line))


def _take_pipe_table(lines: list[str], start: int):
    """(consumed, header_grid, body_rows) for a GFM table at ``start``."""
    header = _split_row(lines[start])
    body: list[list[str]] = []
    j = start + 2
    while j < len(lines):
        s = lines[j].strip()
        if not s or "|" not in s:
            break
        body.append(_split_row(lines[j]))
        j += 1
    return j - start, [header] if header else None, body


def _take_html_table(lines: list[str], start: int):
    """(consumed, html, remainder): the table ends at the FIRST ``</table>``
    — prose after the closing tag on the same line is returned as
    ``remainder`` for normal re-processing, not swallowed into the table."""
    buf: list[str] = []
    j = start
    while j < len(lines):
        low = lines[j].lower()
        close = low.find("</table>")
        if close >= 0:
            end = close + len("</table>")
            buf.append(lines[j][:end])
            return j - start + 1, "\n".join(buf).strip(), lines[j][end:].strip()
        buf.append(lines[j])
        j += 1
    return 0, "", ""


def _take_equation(lines: list[str], start: int):
    first = lines[start].strip()[2:]
    if first.rstrip().endswith("$$") and len(first.rstrip()) >= 2:
        return 1, first.rstrip()[:-2].strip()
    body: list[str] = []
    if first.strip():
        body.append(first.strip())
    j = start + 1
    while j < len(lines):
        s = lines[j].strip()
        if s.endswith("$$"):
            tail = s[:-2].strip()
            if tail:
                body.append(tail)
            return j - start + 1, "\n".join(body).strip()
        body.append(lines[j])
        j += 1
    return 0, ""


def markdown_to_blocks(text: str) -> tuple[list[dict[str, Any]], dict[str, Any]]:
    """Extract ``text`` into blocks.jsonl-shaped rows + a tables.json payload.

    Returns ``(rows, tables)`` where each row is
    ``{type, heading, parent_headings, level, content, blockid}`` and
    ``tables`` is ``{"tables": {tb_id: {"table_header": ...}}}``.
    """
    rows: list[dict[str, Any]] = []
    tables: dict[str, dict[str, str]] = {}
    lines = (text or "").splitlines()

    stack: list[tuple[int, str]] = []
    cur_heading = PREFACE_HEADING
    cur_level = 0
    cur_parents: list[str] = []
    buf: list[str] = []
    table_n = 0

    def flush() -> None:
        content = "\n".join(buf).rstrip()
        if content.strip():
            rows.append(
                {
                    "type": "content",
                    "heading": cur_heading,
                    "parent_headings": list(cur_parents),
                    "level": cur_level,
                    "content": content,
                    "blockid": f"mdb-{len(rows) + 1:04d}",
                }
            )
        buf.clear()

    fence: tuple[str, int] | None = None
    i, n = 0, len(lines)
    while i < n:
        line = lines[i]
        stripped = line.strip()

        fence_match = _FENCE.match(stripped)
        if fence is not None:
            buf.append(line)
            if fence_match:
                ch, run = fence_match.group(1)[0], len(fence_match.group(1))
                if ch == fence[0] and run >= fence[1] and not fence_match.group(2):
                    fence = None
            i += 1
            continue
        if fence_match:
            fence = (fence_match.group(1)[0], len(fence_match.group(1)))
            buf.append(line)
            i += 1
            continue

        m = _HEADING.match(line)
        if m:
            level = len(m.group(1))
            raw = m.group(2)
            clean = _clean_heading(raw)
            while stack and stack[-1][0] >= level:
                stack.pop()
            parents = [h for _, h in stack if h]
            stack.append((level, clean))
            flush()
            cur_heading, cur_level, cur_parents = clean, level, parents
            buf.append(render_heading_line(level, raw))
            i += 1
            continue

        if stripped.startswith("$$"):
            consumed, latex = _take_equation(lines, i)
            if consumed > 0:
                buf.append(f"<equation>{' '.join(latex.split())}</equation>")
                i += consumed
                continue

        if stripped.lower().startswith("<table"):
            consumed, html, rest = _take_html_table(lines, i)
            if consumed > 0:
                table_n += 1
                tid = f"tb-{table_n}"
                one_line = " ".join(html.split("\n"))
                # re-tag with our id so HeaderRecovery can find the header
                body = re.sub(r"^<table\b[^>]*>", "", one_line, flags=re.IGNORECASE)
                body = re.sub(r"</table>\s*$", "", body, flags=re.IGNORECASE)
                buf.append(f'<table id="{tid}" format="html">{body}</table>')
                thead = _THEAD.search(body)
                if thead:
                    tables[tid] = {"table_header": " ".join(thead.group(0).split("\n"))}
                i += consumed
                if rest:
                    lines.insert(i, rest)
                    n = len(lines)
                continue

        if "|" in line and i + 1 < n and _is_delimiter(line, lines[i + 1]):
            consumed, header, body_rows = _take_pipe_table(lines, i)
            if consumed > 0:
                table_n += 1
                tid = f"tb-{table_n}"
                grid = (header or []) + body_rows
                buf.append(
                    f'<table id="{tid}" format="json">'
                    f"{json.dumps(grid, ensure_ascii=False)}</table>"
                )
                if header:
                    tables[tid] = {
                        "table_header": json.dumps(header, ensure_ascii=False)
                    }
                i += consumed
                continue

        buf.append(line)
        i += 1

    flush()
    return rows, {"tables": tables}


def markdown_sidecar_strings(text: str) -> tuple[str, str]:
    """(blocks_jsonl, tables_json) column values for the "P" chunker stage."""
    rows, tables = markdown_to_blocks(text)
    blocks_jsonl = "\n".join(json.dumps(r, ensure_ascii=False) for r in rows)
    return blocks_jsonl, json.dumps(tables, ensure_ascii=False)
