"""Binary document extractors: pdf / docx / pptx / xlsx / plain text.

Stdlib-only re-expressions of the reference's legacy extractor semantics
(lightrag/parser/legacy/extractors.py:19-205).  The reference delegates to
pypdf / python-docx / python-pptx / openpyxl; none of those ship in this
environment, but docx/pptx/xlsx are ZIP+OOXML, so the element walks those
libraries perform are reproduced directly over ``zipfile`` +
``xml.etree.ElementTree``:

  - docx  (lightrag/parser/legacy/extractors.py:41-81): body-level
    paragraphs and tables in document order; table rows are tab-joined
    escaped cells (``\\t``→``&emsp;&emsp;``, newlines→``<br>``), blank line
    between tables and paragraph runs; cell text = its paragraphs joined by
    newline (python-docx ``cell.text``).
  - pptx  (:84-96): slides in sldIdLst order, shapes-with-text in document
    order, ``shape.text`` + newline each; paragraph runs joined, paragraphs
    newline-joined.
  - xlsx  (:99-162): per sheet a ``==== Sheet: title ====`` banner, rows as
    tab-joined escaped cells over the used range, formula cells indexed by
    cached value with formula-text fallback, trailing separator line.
  - pdf   (:19-38): page texts concatenated with ``\\n``; this extractor
    handles the common case (FlateDecode/plain content streams, Tj/TJ/'/"
    show ops, WinAnsi/ASCII strings) rather than pypdf's full model.
  - everything else (:169-186): UTF-8 decode with the same validation
    (non-UTF-8, empty, ``b'``-prefixed repr) raised as
    :class:`ExtractionError`.

All functions are pure (bytes → str): the Ray stage maps them over a
``payload: binary`` column in a stateless ``map_batches``.

Known deviations (documented, fixture-level parity only): docx merged cells
are not repeated per grid column; xlsx date formatting is not applied
(raw serial numbers are emitted); pdf positioning heuristics are simpler
than pypdf's.
"""

from __future__ import annotations

import re
import zipfile
import zlib
from io import BytesIO
from xml.etree import ElementTree as ET

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PR = "{http://schemas.openxmlformats.org/package/2006/relationships}"


class ExtractionError(ValueError):
    """Extraction cannot produce usable text (reference:
    LegacyExtractionError, lightrag/parser/legacy/extractors.py:15)."""


def _resolve_part(base_dir: str, target: str) -> str:
    """Resolve an OPC relationship Target against its source part's
    directory: absolute targets ('/ppt/slides/…') are package-rooted,
    relative ones (incl. '../') resolve per posix rules."""
    import posixpath

    if target.startswith("/"):
        return target.lstrip("/")
    return posixpath.normpath(posixpath.join(base_dir, target))


# ---------------------------------------------------------------------------
# docx


def _docx_paragraph_text(p: ET.Element) -> str:
    """python-docx ``Paragraph.text``: run texts with w:tab→\\t and
    w:br/w:cr→\\n."""
    parts: list[str] = []
    for r in p.iter(f"{_W}r"):
        for child in r:
            tag = child.tag
            if tag == f"{_W}t":
                parts.append(child.text or "")
            elif tag == f"{_W}tab":
                parts.append("\t")
            elif tag in (f"{_W}br", f"{_W}cr"):
                parts.append("\n")
    return "".join(parts)


def _docx_escape_cell(text: str) -> str:
    # lightrag/parser/legacy/extractors.py:51-61
    return (
        text.replace("\\", "\\\\")
        .replace("\t", "&emsp;&emsp;")
        .replace("\r\n", "<br>")
        .replace("\r", "<br>")
        .replace("\n", "<br>")
    )


def extract_docx(file_bytes: bytes) -> str:
    """Paragraphs + tables in document order
    (lightrag/parser/legacy/extractors.py:41-81)."""
    with zipfile.ZipFile(BytesIO(file_bytes)) as zf:
        root = ET.fromstring(zf.read("word/document.xml"))
    body = root.find(f"{_W}body")
    content_parts: list[str] = []
    in_table = False
    for element in body if body is not None else []:
        if element.tag == f"{_W}p":
            if in_table:
                content_parts.append("")
                in_table = False
            content_parts.append(_docx_paragraph_text(element))
        elif element.tag == f"{_W}tbl":
            if content_parts and not in_table:
                content_parts.append("")
            in_table = True
            for tr in element.findall(f"{_W}tr"):
                row_text = []
                for tc in tr.findall(f"{_W}tc"):
                    cell = "\n".join(
                        _docx_paragraph_text(p) for p in tc.findall(f"{_W}p")
                    )
                    row_text.append(_docx_escape_cell(cell))
                if any(row_text):
                    content_parts.append("\t".join(row_text))
    return "\n".join(content_parts)


# ---------------------------------------------------------------------------
# pptx


def _pptx_slide_paths(zf: zipfile.ZipFile) -> list[str]:
    """Slide part names in presentation (sldIdLst) order."""
    pres = ET.fromstring(zf.read("ppt/presentation.xml"))
    rels = ET.fromstring(zf.read("ppt/_rels/presentation.xml.rels"))
    targets = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.findall(f"{_PR}Relationship")
    }
    paths = []
    sld_lst = pres.find(f"{_P}sldIdLst")
    for sld in sld_lst if sld_lst is not None else []:
        target = targets.get(sld.get(f"{_R}id"))
        if target:
            paths.append(_resolve_part("ppt", target))
    return paths


def extract_pptx(file_bytes: bytes) -> str:
    """Per slide, per shape-with-text-frame: shape text + newline
    (lightrag/parser/legacy/extractors.py:84-96)."""
    content = ""
    with zipfile.ZipFile(BytesIO(file_bytes)) as zf:
        for path in _pptx_slide_paths(zf):
            slide = ET.fromstring(zf.read(path))
            for sp in slide.iter(f"{_P}sp"):
                tx = sp.find(f"{_P}txBody")
                if tx is None:
                    continue
                paras = []
                for p in tx.findall(f"{_A}p"):
                    paras.append(
                        "".join(t.text or "" for t in p.iter(f"{_A}t"))
                    )
                content += "\n".join(paras) + "\n"
    return content


# ---------------------------------------------------------------------------
# xlsx

_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n


def _xlsx_escape_cell(text: str) -> str:
    # lightrag/parser/legacy/extractors.py:115-125
    return (
        text.replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\r\n", "\\n")
        .replace("\r", "\\n")
        .replace("\n", "\\n")
    )


def _xlsx_cell_value(c: ET.Element, shared: list[str]) -> tuple[str | None, str | None]:
    """(cached/stored value, formula text) for one <c> element, rendered the
    way openpyxl's value types stringify (int for whole numbers, bool as
    True/False, formulas prefixed '=')."""
    ctype = c.get("t", "n")
    v = c.find(f"{_S}v")
    f = c.find(f"{_S}f")
    formula = ("=" + (f.text or "")) if f is not None else None
    value: str | None = None
    if ctype == "inlineStr":
        is_el = c.find(f"{_S}is")
        if is_el is not None:
            value = "".join(t.text or "" for t in is_el.iter(f"{_S}t"))
    elif v is not None and v.text is not None:
        raw = v.text
        if ctype == "s":
            value = shared[int(raw)]
        elif ctype == "b":
            value = "True" if raw == "1" else "False"
        elif ctype in ("str", "e"):
            value = raw
        else:  # numeric: openpyxl casts to int when no decimal point
            value = raw if ("." in raw or "e" in raw.lower()) else str(int(raw))
    return value, formula


def extract_xlsx(file_bytes: bytes) -> str:
    """Tab-delimited sheets with banners; formula cells indexed by cached
    value, formula-text fallback (lightrag/parser/legacy/extractors.py:99-162)."""
    with zipfile.ZipFile(BytesIO(file_bytes)) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        targets = {
            rel.get("Id"): rel.get("Target")
            for rel in rels.findall(f"{_PR}Relationship")
        }
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in sst.findall(f"{_S}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_S}t")))

        content_parts: list[str] = []
        sheet_separator = "=" * 20
        sheets = wb.find(f"{_S}sheets")
        for idx, sheet in enumerate(sheets if sheets is not None else []):
            if idx > 0:
                content_parts.append("")
            title = (sheet.get("name") or "").replace("\n", " ").replace(
                "\t", " "
            ).replace("\r", " ")
            content_parts.append(
                f"{sheet_separator} Sheet: {title} {sheet_separator}"
            )
            target = targets[sheet.get(f"{_R}id")]
            ws = ET.fromstring(zf.read(_resolve_part("xl", target)))
            # grid: {row -> {col -> (value, formula)}} over the used range.
            # row@r and c@r are OPTIONAL in OOXML — position is implied by
            # document order when absent (openpyxl behaves the same way)
            grid: dict[int, dict[int, tuple[str | None, str | None]]] = {}
            max_row = max_col = 0
            implied_row = 0
            for row in ws.iter(f"{_S}row"):
                r = int(row.get("r") or implied_row + 1)
                implied_row = r
                implied_col = 0
                for c in row.findall(f"{_S}c"):
                    m = _CELL_REF_RE.fullmatch(c.get("r") or "")
                    col = _col_index(m.group(1)) if m else implied_col + 1
                    implied_col = col
                    grid.setdefault(r, {})[col] = _xlsx_cell_value(c, shared)
                    max_row = max(max_row, r)
                    max_col = max(max_col, col)
            for r in range(1, max_row + 1):
                row_parts = []
                row_has_content = False
                for col in range(1, max_col + 1):
                    value, formula = grid.get(r, {}).get(col, (None, None))
                    if value is None:
                        value = formula
                    cell_text = _xlsx_escape_cell(value) if value is not None else ""
                    row_parts.append(cell_text)
                    if cell_text:
                        row_has_content = True
                content_parts.append(
                    "\t".join(row_parts) if row_has_content else ""
                )
        content_parts.append(sheet_separator)
    return "\n".join(content_parts)


# ---------------------------------------------------------------------------
# pdf (minimal: FlateDecode/plain content streams, literal-string show ops)

_PDF_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_PDF_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_PDF_TEXT_OP_RE = re.compile(
    rb"\(((?:[^()\\]|\\.)*)\)\s*(Tj|')"  # (string) Tj  /  (string) '
    rb"|\[((?:[^\]\\]|\\.)*)\]\s*TJ"  # [ (s) -kern (s) ] TJ
    rb"|(T\*|TD|Td)",  # line-advance operators
    re.DOTALL,
)
_PDF_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _pdf_unescape(s: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(s):
        ch = s[i : i + 1]
        if ch == b"\\" and i + 1 < len(s):
            nxt = s[i + 1 : i + 2]
            if nxt in b"01234567":  # octal escape, up to 3 OCTAL digits
                # ('\8'/'\9' are not octal — the PDF spec drops the backslash)
                j = i + 1
                while j < len(s) and j < i + 4 and s[j : j + 1] in b"01234567":
                    j += 1
                out.append(int(s[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            out += _PDF_ESCAPES.get(nxt, nxt)
            i += 2
            continue
        out += ch
        i += 1
    return bytes(out)


def _pdf_stream_text(data: bytes) -> str:
    """Text show ops of one content stream, newline per line-advance op."""
    lines: list[str] = []
    current = ""
    for m in _PDF_TEXT_OP_RE.finditer(data):
        if m.group(4):  # T* / TD / Td → new line
            if current:
                lines.append(current)
                current = ""
        elif m.group(3) is not None:  # TJ array
            for sm in re.finditer(rb"\(((?:[^()\\]|\\.)*)\)", m.group(3)):
                current += _pdf_unescape(sm.group(1)).decode(
                    "latin-1", "replace"
                )
        else:  # Tj / '
            if m.group(2) == b"'" and current:
                lines.append(current)
                current = ""
            current += _pdf_unescape(m.group(1)).decode("latin-1", "replace")
    if current:
        lines.append(current)
    return "\n".join(lines)


def extract_pdf(file_bytes: bytes) -> str:
    """Page-stream texts concatenated with a newline after each page
    (lightrag/parser/legacy/extractors.py:19-38).  Encrypted PDFs raise."""
    if b"/Encrypt" in file_bytes:
        raise ExtractionError("PDF is encrypted but no password provided")
    pages: list[str] = []
    for m in _PDF_OBJ_RE.finditer(file_bytes):
        body = m.group(3)
        sm = _PDF_STREAM_RE.search(body)
        if not sm:
            continue
        data = sm.group(1)
        if b"/FlateDecode" in body:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        if b"BT" not in data:
            continue
        text = _pdf_stream_text(data)
        if text:
            pages.append(text)
    return "".join(p + "\n" for p in pages)


# ---------------------------------------------------------------------------
# dispatch (lightrag/parser/legacy/extractors.py:165-205)

BINARY_EXTRACTORS = {
    "pdf": extract_pdf,
    "docx": extract_docx,
    "pptx": extract_pptx,
    "xlsx": extract_xlsx,
}


def decode_text(file_bytes: bytes) -> str:
    """UTF-8 decode with upload-path validation
    (lightrag/parser/legacy/extractors.py:169-186)."""
    try:
        content = file_bytes.decode("utf-8")
    except UnicodeDecodeError as e:
        raise ExtractionError(
            "File is not valid UTF-8 encoded text. Please convert it to "
            f"UTF-8 before processing: {e}"
        ) from e
    if not content or len(content.strip()) == 0:
        raise ExtractionError("File contains no content or only whitespace")
    if content.startswith("b'") or content.startswith('b"'):
        raise ExtractionError(
            "File appears to contain binary data representation instead of text"
        )
    return content


def extract_file_text(file_bytes: bytes, suffix: str) -> str:
    """Suffix-dispatched extraction (lightrag/parser/legacy/extractors.py:188-205)."""
    extractor = BINARY_EXTRACTORS.get(suffix.lower().lstrip("."))
    if extractor is not None:
        return extractor(file_bytes)
    return decode_text(file_bytes)
