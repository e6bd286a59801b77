"""Deterministic in-memory OOXML/PDF writers.

Test- and benchmark-side counterparts of :mod:`lightrag_ray.functions.
extractors`: build valid minimal docx/pptx/xlsx/pdf payloads from plain data
so binary-extraction pipelines can run on synthesized corpora (no external
files, no binary test assets in the repo).  Writers are deterministic — the
same input always yields byte-identical archives (fixed zip timestamps, no
compression randomness).
"""

from __future__ import annotations

import zipfile
import zlib
from io import BytesIO
from xml.sax.saxutils import escape

_FIXED_DATE = (2026, 1, 1, 0, 0, 0)

_CONTENT_TYPES_DOCX = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
</Types>"""

_RELS_ROOT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="{target}"/>
</Relationships>"""


def _zip_bytes(entries: list[tuple[str, str | bytes]]) -> bytes:
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in entries:
            info = zipfile.ZipInfo(name, date_time=_FIXED_DATE)
            zf.writestr(info, data)
    return buf.getvalue()


def _t(text: str) -> str:
    """A run with whitespace preserved."""
    return f'<w:r><w:t xml:space="preserve">{escape(text)}</w:t></w:r>'


def make_docx(
    paragraphs: list[str], tables: list[list[list[str]]] | None = None
) -> bytes:
    """One paragraph per entry (embedded newlines become w:br, so the docx
    extractor round-trips them); optional tables appended after."""
    body_parts = []
    for para in paragraphs:
        runs = []
        for i, line in enumerate(para.split("\n")):
            if i:
                runs.append("<w:r><w:br/></w:r>")
            if line:
                runs.append(_t(line))
        body_parts.append(f"<w:p>{''.join(runs)}</w:p>")
    for table in tables or []:
        rows = []
        for row in table:
            cells = "".join(
                f"<w:tc><w:p>{_t(cell) if cell else ''}</w:p></w:tc>"
                for cell in row
            )
            rows.append(f"<w:tr>{cells}</w:tr>")
        body_parts.append(f"<w:tbl>{''.join(rows)}</w:tbl>")
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        f"<w:body>{''.join(body_parts)}</w:body></w:document>"
    )
    return _zip_bytes(
        [
            ("[Content_Types].xml", _CONTENT_TYPES_DOCX),
            ("_rels/.rels", _RELS_ROOT.format(target="word/document.xml")),
            ("word/document.xml", document),
        ]
    )


_CONTENT_TYPES_PPTX = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>
{slides}
</Types>"""


def make_pptx(slides: list[list[str]]) -> bytes:
    """slides = list of slides, each a list of shape texts (newlines become
    separate a:p paragraphs)."""
    entries: list[tuple[str, str | bytes]] = []
    sld_ids = []
    rels = []
    overrides = []
    for i, shapes in enumerate(slides, start=1):
        sps = []
        for j, shape_text in enumerate(shapes, start=1):
            paras = "".join(
                f'<a:p><a:r><a:t>{escape(line)}</a:t></a:r></a:p>'
                for line in shape_text.split("\n")
            )
            sps.append(
                f'<p:sp><p:nvSpPr><p:cNvPr id="{j}" name="s{j}"/></p:nvSpPr>'
                f"<p:txBody>{paras}</p:txBody></p:sp>"
            )
        slide_xml = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"'
            ' xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">'
            f"<p:cSld><p:spTree>{''.join(sps)}</p:spTree></p:cSld></p:sld>"
        )
        entries.append((f"ppt/slides/slide{i}.xml", slide_xml))
        sld_ids.append(f'<p:sldId id="{255+i}" r:id="rId{i}"/>')
        rels.append(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/slide" Target="slides/slide{i}.xml"/>'
        )
        overrides.append(
            f'<Override PartName="/ppt/slides/slide{i}.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.presentationml.slide+xml"/>'
        )
    presentation = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<p:presentation xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"'
        ' xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<p:sldIdLst>{''.join(sld_ids)}</p:sldIdLst></p:presentation>"
    )
    pres_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f"{''.join(rels)}</Relationships>"
    )
    entries = [
        ("[Content_Types].xml", _CONTENT_TYPES_PPTX.format(slides="".join(overrides))),
        ("_rels/.rels", _RELS_ROOT.format(target="ppt/presentation.xml")),
        ("ppt/presentation.xml", presentation),
        ("ppt/_rels/presentation.xml.rels", pres_rels),
    ] + entries
    return _zip_bytes(entries)


_CONTENT_TYPES_XLSX = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheets}
</Types>"""


def _col_ref(col: int) -> str:
    ref = ""
    while col:
        col, rem = divmod(col - 1, 26)
        ref = chr(65 + rem) + ref
    return ref


def make_xlsx(sheets: dict[str, list[list[object]]]) -> bytes:
    """sheets = {title: rows}; cell values may be str, int, float, bool,
    None, or ``("=FORMULA", cached_value_or_None)`` tuples."""
    entries: list[tuple[str, str | bytes]] = []
    sheet_tags, rels, overrides = [], [], []
    for i, (title, rows) in enumerate(sheets.items(), start=1):
        row_xml = []
        for r, row in enumerate(rows, start=1):
            cells = []
            for c, value in enumerate(row, start=1):
                ref = f"{_col_ref(c)}{r}"
                if value is None:
                    continue
                if isinstance(value, tuple):  # (formula, cached value)
                    formula, cached = value
                    f = f"<f>{escape(formula.lstrip('='))}</f>"
                    v = "" if cached is None else f"<v>{cached}</v>"
                    cells.append(f'<c r="{ref}">{f}{v}</c>')
                elif isinstance(value, bool):
                    cells.append(f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>')
                elif isinstance(value, (int, float)):
                    cells.append(f'<c r="{ref}"><v>{value}</v></c>')
                else:
                    cells.append(
                        f'<c r="{ref}" t="inlineStr"><is>'
                        f'<t xml:space="preserve">{escape(str(value))}</t></is></c>'
                    )
            row_xml.append(f'<row r="{r}">{"".join(cells)}</row>')
        ws = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f"<sheetData>{''.join(row_xml)}</sheetData></worksheet>"
        )
        entries.append((f"xl/worksheets/sheet{i}.xml", ws))
        sheet_tags.append(
            f'<sheet name="{escape(title)}" sheetId="{i}" r:id="rId{i}"/>'
        )
        rels.append(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i}.xml"/>'
        )
        overrides.append(
            f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
        ' xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{''.join(sheet_tags)}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f"{''.join(rels)}</Relationships>"
    )
    entries = [
        ("[Content_Types].xml", _CONTENT_TYPES_XLSX.format(sheets="".join(overrides))),
        ("_rels/.rels", _RELS_ROOT.format(target="xl/workbook.xml")),
        ("xl/workbook.xml", workbook),
        ("xl/_rels/workbook.xml.rels", wb_rels),
    ] + entries
    return _zip_bytes(entries)


def make_pdf(pages: list[list[str]]) -> bytes:
    """pages = list of pages, each a list of text lines (latin-1 subset).
    Emits Flate-compressed content streams with Td/Tj text ops."""

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    objects: list[bytes] = []
    page_ids = []
    n_fixed = 3  # catalog, pages, font
    for i, lines in enumerate(pages):
        content_id = n_fixed + 1 + 2 * i
        page_id = content_id + 1
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for j, line in enumerate(lines):
            if j:
                ops.append("0 -14 Td")
            ops.append(f"({esc(line)}) Tj")
        ops.append("ET")
        stream = zlib.compress("\n".join(ops).encode("latin-1"))
        objects.append(
            b"%d 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
            % (content_id, len(stream), stream)
        )
        objects.append(
            (
                f"{page_id} 0 obj\n<< /Type /Page /Parent 2 0 R "
                f"/MediaBox [0 0 612 792] /Contents {content_id} 0 R "
                "/Resources << /Font << /F1 3 0 R >> >> >>\nendobj\n"
            ).encode()
        )
        page_ids.append(page_id)
    kids = " ".join(f"{p} 0 R" for p in page_ids)
    header = [
        b"%PDF-1.4\n",
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        (
            f"2 0 obj\n<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>\nendobj\n"
        ).encode(),
        b"3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n",
    ]
    out = BytesIO()
    offsets = []
    for part in header + objects:
        if part.split(b" ", 1)[0].isdigit():
            offsets.append(out.tell())
        out.write(part)
    xref_pos = out.tell()
    n_obj = len(offsets) + 1
    out.write(f"xref\n0 {n_obj}\n0000000000 65535 f \n".encode())
    for off in offsets:
        out.write(f"{off:010d} 00000 n \n".encode())
    out.write(
        (
            f"trailer\n<< /Size {n_obj} /Root 1 0 R >>\nstartxref\n{xref_pos}\n%%EOF\n"
        ).encode()
    )
    return out.getvalue()
