"""Binary document extractors (stdlib docx/pptx/xlsx/pdf) vs the reference's
legacy extractor semantics (lightrag/parser/legacy/extractors.py:19-205),
exercised over deterministically synthesized payloads."""

from __future__ import annotations

import pyarrow as pa
import pytest

from lightrag_ray.functions.extractors import (
    ExtractionError,
    decode_text,
    extract_docx,
    extract_file_text,
    extract_pdf,
    extract_pptx,
    extract_xlsx,
)
from lightrag_ray.sources.binary_docs import (
    make_docx,
    make_pdf,
    make_pptx,
    make_xlsx,
)


def test_docx_paragraphs_and_tables():
    """Paragraph order, blank line around tables, tab-joined escaped cells,
    all-empty rows dropped (extractors.py:41-81 reference semantics)."""
    payload = make_docx(
        ["Intro paragraph", "Second"],
        tables=[[["a", "b\tc"], ["multi\nline", ""], ["", ""]]],
    )
    out = extract_docx(payload)
    assert out == (
        "Intro paragraph\nSecond\n\n"
        "a\tb&emsp;&emsp;c\n"  # \t → &emsp;&emsp;
        "multi<br>line\t"  # \n → <br>; empty cell kept in row
        # all-empty row dropped entirely
    )


def test_docx_roundtrip_exact():
    text = "line one\nline two\n\nline four with\ttab"
    assert extract_docx(make_docx(text.split("\n"))) == text


def test_pptx_slides_in_order():
    payload = make_pptx([["Title", "Body text"], ["Second slide"]])
    assert extract_pptx(payload) == "Title\nBody text\nSecond slide\n"


def test_xlsx_sheets_formulas_types():
    payload = make_xlsx(
        {
            "Data": [
                ["name", "n"],
                ["alpha", 3],
                [("=SUM(B2:B2)", 3), ("=1+2", None)],  # cached / no cache
                [True, 2.5],
                [None, None],  # all-empty row → blank line
                ["tail", None],
            ],
            "Über": [["x"]],
        }
    )
    out = extract_xlsx(payload)
    sep = "=" * 20
    assert out == (
        f"{sep} Sheet: Data {sep}\n"
        "name\tn\n"
        "alpha\t3\n"  # whole numbers render as int (openpyxl cast)
        "3\t=1+2\n"  # cached value wins; fallback = formula text
        "True\t2.5\n"
        "\n"
        "tail\t\n"
        f"\n{sep} Sheet: Über {sep}\n"
        f"x\n{sep}"
    )


def test_pdf_pages_and_escapes():
    payload = make_pdf([["Hello (world)", "Second \\ line"], ["Page two"]])
    assert extract_pdf(payload) == "Hello (world)\nSecond \\ line\nPage two\n"


def test_pdf_encrypted_raises():
    bad = b"%PDF-1.4\n1 0 obj\n<< /Encrypt 2 0 R >>\nendobj\n"
    with pytest.raises(ExtractionError):
        extract_pdf(bad)


def test_decode_text_validation():
    assert decode_text(b"plain") == "plain"
    with pytest.raises(ExtractionError):
        decode_text("σ".encode("utf-16"))
    with pytest.raises(ExtractionError):
        decode_text(b"   ")
    with pytest.raises(ExtractionError):
        decode_text(b"b'binary repr'")


def test_dispatch_by_suffix():
    docx = make_docx(["via dispatch"])
    assert extract_file_text(docx, ".DOCX") == "via dispatch"
    assert extract_file_text(b"fallback text", "md") == "fallback text"


def test_binary_extract_stage_quarantines_errors():
    """One corrupt payload must not fail the batch (stage contract)."""
    from lightrag_ray.stages.extract_binary import make_binary_extract_fn

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "suffix": ["docx", "docx", "txt"],
            "payload": pa.array(
                [make_docx(["good"]), b"not a zip", b"ok text"], pa.binary()
            ),
        }
    )
    out = make_binary_extract_fn()(batch).to_pylist()
    assert out[0]["text"] == "good" and out[0]["error"] == ""
    assert out[1]["text"] == "" and "BadZipFile" in out[1]["error"]
    assert out[2]["text"] == "ok text" and out[2]["error"] == ""


def test_xlsx_implied_row_and_cell_positions():
    """row@r / c@r are optional in OOXML — positions are implied by order
    (code-review regression: such files silently extracted as empty)."""
    import zipfile
    from io import BytesIO

    payload = make_xlsx({"S": [["a", "b"], ["c", "d"]]})
    # strip every r attribute from the worksheet XML
    src = zipfile.ZipFile(BytesIO(payload))
    entries = {n: src.read(n) for n in src.namelist()}
    import re as _re

    ws = entries["xl/worksheets/sheet1.xml"].decode()
    ws = _re.sub(r' r="[^"]*"', "", ws)
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for n, data in entries.items():
            zf.writestr(n, ws if n == "xl/worksheets/sheet1.xml" else data)
    out = extract_xlsx(buf.getvalue())
    assert "a\tb" in out and "c\td" in out


def test_pptx_absolute_relationship_target():
    """Package-rooted Targets ('/ppt/slides/…') are spec-valid
    (code-review regression: naive join mangled them)."""
    import zipfile
    from io import BytesIO

    payload = make_pptx([["hello absolute"]])
    src = zipfile.ZipFile(BytesIO(payload))
    entries = {n: src.read(n) for n in src.namelist()}
    rels = entries["ppt/_rels/presentation.xml.rels"].decode().replace(
        'Target="slides/slide1.xml"', 'Target="/ppt/slides/slide1.xml"'
    )
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for n, data in entries.items():
            zf.writestr(
                n, rels if n == "ppt/_rels/presentation.xml.rels" else data
            )
    assert extract_pptx(buf.getvalue()) == "hello absolute\n"


def test_pdf_invalid_octal_escape():
    r"""'\8'/'\9' are not octal — the backslash is dropped per spec
    (code-review regression: int(s, 8) crashed on them)."""
    from lightrag_ray.functions.extractors import _pdf_unescape

    assert _pdf_unescape(rb"a\8b\9c") == b"a8b9c"
    assert _pdf_unescape(rb"\101\12") == b"A\n"
