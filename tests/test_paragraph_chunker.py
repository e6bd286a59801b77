"""Paragraph-semantic chunker (C4) parity vs the reference module.

The reference ``chunking_by_paragraph_semantic`` is run on a temp
``.blocks.jsonl`` sidecar file; ours on the same payload as a string column
value.  Outputs are compared dict-for-dict (tokens, content, order, nested
heading, sidecar refs).  The langchain stub in conftest unlocks the
reference's recursive-character fallback paths, which only read parsed
config attributes off the splitter object.
"""

from __future__ import annotations

import importlib
import json
import os
import tempfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lightrag_ray.functions.paragraph_chunking import (
    ParagraphSemanticEngine,
    chunk_text_paragraph_semantic,
    langchain_recursive_chunks,
)
from lightrag_ray.functions.tokenizer import SegmentTokenizer


@pytest.fixture(scope="module")
def ref_ps(ref):
    return importlib.import_module("lightrag.chunker.paragraph_semantic")


@pytest.fixture(scope="module")
def ref_rc(ref):
    return importlib.import_module("lightrag.chunker.recursive_character")


TOK = SegmentTokenizer()


def run_both(ref_ps, rows, tables=None, size=40, overlap=4, **kw):
    with tempfile.TemporaryDirectory() as d:
        bp = os.path.join(d, "doc.blocks.jsonl")
        with open(bp, "w", encoding="utf-8") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        if tables is not None:
            with open(os.path.join(d, "doc.tables.json"), "w") as f:
                json.dump(tables, f)
        theirs = ref_ps.chunking_by_paragraph_semantic(
            TOK, "fallback", size, blocks_path=bp,
            chunk_overlap_token_size=overlap, **kw,
        )
    ours = chunk_text_paragraph_semantic(
        TOK, "fallback", size,
        blocks_jsonl="\n".join(json.dumps(r) for r in rows),
        tables_json=json.dumps(tables) if tables is not None else None,
        chunk_overlap_token_size=overlap, **kw,
    )
    return ours, theirs


def row(heading, level, body_lines, parents=(), blockid=None, title=False):
    content = "\n".join(
        ([f"{'#' * max(level, 1)} {heading}"] if heading else []) + list(body_lines)
    )
    r = {
        "type": "content",
        "heading": heading,
        "parent_headings": list(parents),
        "level": level,
        "content": content,
    }
    if blockid:
        r["blockid"] = blockid
    if title:
        r["is_title_block"] = True
    return r


def json_table(tid, n_rows, cell="x " * 10, header=None):
    rows = (header or []) + [[f"r{i}", f"{cell}{i}"] for i in range(n_rows)]
    return f'<table id="{tid}" format="json">{json.dumps(rows)}</table>'


def html_table(tid, n_rows, with_thead=True):
    trs = "".join(f"<tr><td>a{i}</td><td>{'z ' * 6}</td></tr>" for i in range(n_rows))
    head = "<thead><tr><th>A</th><th>B</th></tr></thead>" if with_thead else ""
    return f'<table id="{tid}" format="html">{head}<tbody>{trs}</tbody></table>'


# -- deterministic structural cases -----------------------------------------


def test_hierarchy_merge_parity(ref_ps):
    rows = [
        row("Title", 1, ["intro words here"], blockid="b1"),
        row("Sec A", 2, ["alpha beta gamma"], parents=["Title"], blockid="b2"),
        row("Sec B", 2, ["delta epsilon"], parents=["Title"], blockid="b3"),
    ]
    ours, theirs = run_both(ref_ps, rows)
    assert ours == theirs
    assert ours[0]["sidecar"]["refs"][0]["id"] == "b1"


def test_heading_glue_parity(ref_ps):
    rows = [
        row("H1", 1, []),
        row("H1.1", 2, ["body text one two three"], parents=["H1"]),
        row("H2", 1, []),  # trailing bare heading, next not deeper
        row("H3", 1, ["tail words"]),
    ]
    ours, theirs = run_both(ref_ps, rows)
    assert ours == theirs


def test_anchor_split_parity(ref_ps):
    body = ["word " * 30, "anchor point", "more " * 30, "second anchor", "tail " * 30]
    ours, theirs = run_both(ref_ps, [row("Long", 1, body)], size=30)
    assert ours == theirs
    # part suffixes land on split fragments of one source row
    assert any("[part" in c["heading"]["heading"] for c in ours)


def test_dense_prose_no_anchor_parity(ref_ps):
    ours, theirs = run_both(ref_ps, [row("Dense", 1, ["lorem ipsum " * 80])], size=25)
    assert ours == theirs


def test_json_table_row_split_parity(ref_ps):
    tbl = json_table("tb-1", 30)
    rows = [row("T", 1, ["before text", tbl, "after text"])]
    ours, theirs = run_both(ref_ps, rows, size=60)
    assert ours == theirs
    assert any("<table " in c["content"] for c in ours)


def test_json_header_recovery_parity(ref_ps):
    hdr = [["col1", "col2"]]
    tbl = json_table("tb-2", 25, cell="y " * 8, header=hdr)
    tables = {"tables": {"tb-2": {"table_header": json.dumps(hdr)}}}
    ours, theirs = run_both(ref_ps, [row("T2", 1, [tbl])], tables=tables, size=60)
    assert ours == theirs
    # every table slice carries the pinned header
    for c in ours:
        if "<table " in c["content"]:
            assert '["col1", "col2"]' in c["content"]


def test_html_header_recovery_parity(ref_ps):
    tbl = html_table("tb-3", 20)
    tables = {
        "tables": {"tb-3": {"table_header": "<thead><tr><th>A</th><th>B</th></tr></thead>"}}
    }
    ours, theirs = run_both(ref_ps, [row("T3", 1, [tbl])], tables=tables, size=55)
    assert ours == theirs


def test_bridge_duplication_parity(ref_ps):
    t1, t2 = json_table("tb-1", 30), json_table("tb-2", 25, cell="y " * 8)
    rows = [row("B", 1, ["pre", t1, "short bridge text here", t2, "post"])]
    ours, theirs = run_both(ref_ps, rows, size=60, overlap=8)
    assert ours == theirs


def test_drop_references_parity(ref_ps):
    rows = [
        row("Body", 1, ["real content here"]),
        row("References", 1, ["[1] citation"]),
    ]
    ours, theirs = run_both(ref_ps, rows, drop_references=True)
    assert ours == theirs
    assert all("citation" not in c["content"] for c in ours)
    # references-only document keeps its rows rather than going empty
    only_refs = [row("References", 1, ["[1] citation"])]
    ours, theirs = run_both(ref_ps, only_refs, drop_references=True)
    assert ours == theirs and ours


def test_title_block_pinning_parity(ref_ps):
    rows = [
        row("Doc Title", 0, [], blockid="t1", title=True),
        row("Ch 1", 1, ["some words in chapter"]),
        row("Doc Title 2", 0, [], title=True),
        row("Ch A", 1, ["more words here"]),
    ]
    ours, theirs = run_both(ref_ps, rows)
    assert ours == theirs
    assert len(ours) >= 2  # adjacent title groups never fuse


def test_fallback_no_sidecar_parity(ref_ps):
    content = "para one\n\npara two " + "w " * 50
    ours = chunk_text_paragraph_semantic(TOK, content, 20, chunk_overlap_token_size=3)
    theirs = ref_ps.chunking_by_paragraph_semantic(
        TOK, content, 20, blocks_path=None, chunk_overlap_token_size=3
    )
    assert ours == [
        {k: v for k, v in c.items() if k != "_source_span"} for c in theirs
    ]


def test_cross_format_header_raises(ref_ps):
    tbl = json_table("tb-9", 25)
    tables = {"tables": {"tb-9": {"table_header": "<thead><tr><th>A</th></tr></thead>"}}}
    with pytest.raises(ValueError):
        chunk_text_paragraph_semantic(
            TOK, "x", 60,
            blocks_jsonl=json.dumps(row("T", 1, [tbl])),
            tables_json=json.dumps(tables),
        )


# -- recursive-character fallback kernel parity ------------------------------


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ["alpha beta gamma", "d " * 20, "word", "", "x y z w v u t s r q"]
        ),
        min_size=0,
        max_size=8,
    ).map(lambda ps: "\n\n".join(ps)),
    st.integers(3, 30),
    st.integers(0, 5),
)
def test_langchain_kernel_parity_fuzz(ref_rc, text, size, overlap):
    ours = langchain_recursive_chunks(TOK, text, size, min(overlap, size))
    theirs = [
        {k: v for k, v in c.items() if k != "_source_span"}
        for c in ref_rc.chunking_by_recursive_character(
            TOK, text, size, chunk_overlap_token_size=min(overlap, size)
        )
    ]
    assert ours == theirs


# -- randomized document fuzz -------------------------------------------------

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


@st.composite
def _doc(draw):
    n = draw(st.integers(1, 5))
    rows, tables = [], {"tables": {}}
    parents: list[str] = []
    for i in range(n):
        kind = draw(
            st.sampled_from(
                ["body", "body", "heading_only", "dense", "tbl_json",
                 "tbl_json_hdr", "tbl_html", "refs", "anchored"]
            )
        )
        level = draw(st.integers(1, 3))
        head = f"S{i} {draw(st.sampled_from(_WORDS))}"
        p = parents[: level - 1]
        if kind == "body":
            k = draw(st.integers(1, 3))
            body = [
                " ".join(draw(st.sampled_from(_WORDS)) for _ in range(draw(st.integers(1, 12))))
                for _ in range(k)
            ]
            rows.append(row(head, level, body, parents=p, blockid=f"b{i}"))
        elif kind == "heading_only":
            rows.append(row(head, level, [], parents=p))
        elif kind == "dense":
            rows.append(row(head, level, ["dense " * draw(st.integers(30, 60))], parents=p))
        elif kind == "anchored":
            body = []
            for _ in range(draw(st.integers(2, 4))):
                body.append("long part " + "w " * draw(st.integers(10, 25)))
                body.append("anchor " + draw(st.sampled_from(_WORDS)))
            rows.append(row(head, level, body, parents=p, blockid=f"b{i}"))
        elif kind == "tbl_json":
            tid = f"tb-{i}"
            rows.append(
                row(head, level,
                    ["pre text", json_table(tid, draw(st.integers(8, 25))), "post"],
                    parents=p)
            )
        elif kind == "tbl_json_hdr":
            tid = f"tb-{i}"
            hdr = [["h1", "h2"]]
            rows.append(
                row(head, level,
                    [json_table(tid, draw(st.integers(8, 20)), header=hdr)],
                    parents=p)
            )
            tables["tables"][tid] = {"table_header": json.dumps(hdr)}
        elif kind == "tbl_html":
            tid = f"tb-{i}"
            rows.append(row(head, level, [html_table(tid, draw(st.integers(8, 20)))], parents=p))
            tables["tables"][tid] = {
                "table_header": "<thead><tr><th>A</th><th>B</th></tr></thead>"
            }
        elif kind == "refs":
            rows.append(row("References", level, ["[1] some citation"], parents=p))
        parents = (p + [head])[:3]
    return rows, tables


@settings(max_examples=40, deadline=None)
@given(_doc(), st.integers(15, 80), st.integers(0, 8), st.booleans())
def test_document_fuzz_parity(ref_ps, doc, size, overlap, drop_refs):
    rows, tables = doc
    ours, theirs = run_both(
        ref_ps, rows, tables=tables, size=size, overlap=overlap,
        drop_references=drop_refs,
    )
    assert ours == theirs


# -- engine invariants --------------------------------------------------------


def test_engine_reusable_across_documents():
    eng = ParagraphSemanticEngine(TOK, 40, 4)
    rows = [row("A", 1, ["one two three"])]
    first = eng.run([dict(r) for r in rows])
    second = eng.run([dict(r) for r in rows])
    assert first == second


def test_chunk_cap_invariant():
    eng = ParagraphSemanticEngine(TOK, 30, 3)
    rows = [
        row("X", 1, ["w " * 100]),
        row("Y", 2, [json_table("tb-z", 40)], parents=["X"]),
    ]
    for c in eng.run(rows):
        # cap holds except for single unsplittable fragments (no spaces)
        assert c["tokens"] <= 30 or " " not in c["content"]
