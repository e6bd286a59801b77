"""Markdown → HeadingBlocks sidecar (the webtext-native "P" parser path)."""

from __future__ import annotations

import importlib
import json

import pytest

from lightrag_ray.functions.markdown_blocks import (
    markdown_sidecar_strings,
    markdown_to_blocks,
)
from lightrag_ray.functions.paragraph_chunking import chunk_text_paragraph_semantic
from lightrag_ray.functions.tokenizer import SegmentTokenizer

MD = """intro before any heading

# Title
opening paragraph

## Section A
alpha beta

### Deep
nested text

## Section B ##
closing-hash heading body
"""


def test_heading_hierarchy():
    rows, tables = markdown_to_blocks(MD)
    assert tables == {"tables": {}}
    heads = [(r["heading"], r["level"], r["parent_headings"]) for r in rows]
    assert heads == [
        ("Preface/Uncategorized", 0, []),
        ("Title", 1, []),
        ("Section A", 2, ["Title"]),
        ("Deep", 3, ["Title", "Section A"]),
        ("Section B", 2, ["Title"]),
    ]
    # heading rendered as the first content line, body follows
    assert rows[1]["content"] == "# Title\nopening paragraph"
    # closing hashes stripped from the stored heading, kept in the raw line
    assert rows[4]["content"].startswith("# Section B ##\n") is False
    assert rows[4]["content"].split("\n")[0] == "## Section B ##"


def test_fenced_code_suppresses_headings():
    md = "# Real\n```\n# not a heading\n| a | b |\n```\ntail"
    rows, _ = markdown_to_blocks(md)
    assert len(rows) == 1
    assert "# not a heading" in rows[0]["content"]


def test_pipe_table_with_header_lift():
    md = "# T\n| H1 | H2 |\n| --- | --- |\n| a | 1 |\n| b | 2 |\nafter"
    rows, tables = markdown_to_blocks(md)
    line = rows[0]["content"].split("\n")[1]
    assert line.startswith('<table id="tb-1" format="json">')
    grid = json.loads(line[line.index(">") + 1 : -len("</table>")])
    assert grid == [["H1", "H2"], ["a", "1"], ["b", "2"]]
    assert json.loads(tables["tables"]["tb-1"]["table_header"]) == [["H1", "H2"]]
    assert rows[0]["content"].split("\n")[2] == "after"


def test_html_table_single_line_and_thead():
    md = ("# T\n<table>\n<thead><tr><th>A</th></tr></thead>\n"
          "<tbody><tr><td>1</td></tr></tbody>\n</table>\n")
    rows, tables = markdown_to_blocks(md)
    line = rows[0]["content"].split("\n")[1]
    assert line.startswith('<table id="tb-1" format="html">')
    assert "\n" not in line
    assert "<thead>" in tables["tables"]["tb-1"]["table_header"]


def test_block_equation():
    md = "# E\n$$\ne = mc^2\n$$\ndone"
    rows, _ = markdown_to_blocks(md)
    assert "<equation>e = mc^2</equation>" in rows[0]["content"]


def test_not_a_table_without_delimiter():
    md = "# X\na | b\nplain text"
    rows, tables = markdown_to_blocks(md)
    assert "a | b" in rows[0]["content"]
    assert tables == {"tables": {}}


def test_structure_matches_reference_extractor(ref):
    """For marker-free markdown the reference extractor and ours produce the
    same block structure (heading/level/parents/content)."""
    ex = importlib.import_module("lightrag.parser.markdown.extract")

    class NoImages:
        def resolve(self, src):
            raise AssertionError("no images in this fixture")

    theirs = ex.extract_markdown(MD, image_resolver=NoImages()).blocks
    ours, _ = markdown_to_blocks(MD)
    assert [
        {k: r[k] for k in ("heading", "level", "parent_headings", "content")}
        for r in ours
    ] == theirs


def test_end_to_end_into_paragraph_chunker():
    big_table = "| H1 | H2 |\n| --- | --- |\n" + "\n".join(
        f"| r{i} | {'x ' * 8}{i} |" for i in range(25)
    )
    md = "# Doc\nintro words here\n\n## Data\n" + big_table + "\n\n## Outro\nbye"
    blocks_jsonl, tables_json = markdown_sidecar_strings(md)
    chunks = chunk_text_paragraph_semantic(
        SegmentTokenizer(), md, 60,
        blocks_jsonl=blocks_jsonl, tables_json=tables_json,
        chunk_overlap_token_size=4,
    )
    assert len(chunks) > 2
    # HeaderRecovery: every split table slice re-carries the lifted header
    table_chunks = [c for c in chunks if "<table " in c["content"]]
    assert len(table_chunks) >= 2
    for c in table_chunks:
        assert '["H1", "H2"]' in c["content"]
    # provenance sidecar refs trace back to markdown block ids
    assert any(
        c.get("sidecar", {}).get("id", "").startswith("mdb-") for c in chunks
    )


@pytest.mark.usefixtures("ray_session")
def test_chunker_stage_markdown_blocks_option():
    import pyarrow as pa
    import ray.data as rd

    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.stages.chunk import ChunkerStage

    tbl = pa.table(
        {
            "doc_id": ["d1"],
            "url": ["u1"],
            "lang": ["en"],
            "text": ["# A\none two three\n\n## B\nfour five six"],
            "timestamp": [1],
        }
    )
    cfg = PipelineConfig(
        chunking_strategy="P",
        chunk_token_size=5,
        chunk_overlap_token_size=0,
        chunker_options={"markdown_blocks": True},
    )
    rows = (
        rd.from_arrow(tbl)
        .map_batches(
            ChunkerStage,
            fn_constructor_args=(cfg,),
            batch_format="pyarrow",
            concurrency=1,
        )
        .take_all()
    )
    assert rows and all("#" in r["content"] for r in rows)
