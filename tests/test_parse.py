"""Parity tests for delimiter repair and the extraction-result parser."""

from __future__ import annotations

import asyncio

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lightrag_ray.functions.delimiters import fix_tuple_delimiter_corruption
from lightrag_ray.functions.parse import parse_extraction_result

DELIM_VECTORS = [
    "entity<|#|>A<|#|>type<|#|>desc",
    "entity<|##|>A<|##|>t<|##|>d",
    "entity<|#||#|>A<|#|>t<|#|>d",
    "entity<|\\#|>A<|#|>t<|#|>d",
    "entity<|>A<|>t<|>d",
    "entity<||>A<||>t<||>d",
    "entity<X|#|>A<|#|Y>t<X|#|Y>d",
    "entity<#>A<#|>t<|#>d",
    "entity<a#|>A<|#b>t<|#|>d",
    "entity<|#|A<|#||t<|#|d",
    "entity<|#:A<|#|>t",
    "entity<||#>A<||#>t",
    "entity<||A<|#|>t",
    "entity|#|>A|#|>t",
    "entity<|#|>|A",
    "entity||#||A||#||t",
    "free text with < | > no delimiters",
    "a <|> b spaced glue stays",
    "x <|| y spaced stays",
    "",
]


@pytest.mark.parametrize("vec", DELIM_VECTORS)
def test_delimiter_fix_parity(ref, vec):
    assert fix_tuple_delimiter_corruption(vec, "#", "<|#|>") == (
        ref.utils.fix_tuple_delimiter_corruption(vec, "#", "<|#|>")
    )


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=list("abE <|#>\\:еn"),
        max_size=40,
    )
)
def test_delimiter_fix_parity_fuzz(ref, s):
    assert fix_tuple_delimiter_corruption(s, "#", "<|#|>") == (
        ref.utils.fix_tuple_delimiter_corruption(s, "#", "<|#|>")
    )


PARSE_VECTORS = [
    # clean output (mirrors the reference's own test mock,
    # tests/extraction/test_extract_entities.py:55)
    "entity<|#|>TEST_ENTITY<|#|>CONCEPT<|#|>A test entity<|COMPLETE|>",
    # entities + relations, multiline
    (
        "entity<|#|>Acme Corp<|#|>Organization<|#|>A company\n"
        "entity<|#|>Jane Doe<|#|>Person<|#|>An engineer\n"
        "relation<|#|>Jane Doe<|#|>Acme Corp<|#|>employment, work<|#|>Jane works at Acme\n"
        "<|COMPLETE|>"
    ),
    # relationship prefix variant
    "relationship<|#|>A1<|#|>B1<|#|>kw<|#|>d\n<|COMPLETE|>",
    # glued records (tuple delimiter used as record separator)
    (
        "entity<|#|>AAA<|#|>thing<|#|>first<|#|>entity<|#|>BBB<|#|>thing<|#|>second"
        "<|COMPLETE|>"
    ),
    # mis-prefixed relation (entity prefix, 5 fields)
    "entity<|#|>SRC1<|#|>TGT1<|#|>kw1<|#|>a relation in disguise\n<|COMPLETE|>",
    # corrupted delimiters
    "entity<|##|>Broken<|>Fixed<|#|>desc here\n<|COMPLETE|>",
    # numeric-name filtering, empty descriptions, self-loops
    (
        "entity<|#|>42<|#|>number<|#|>dropped numeric\n"
        "entity<|#|>Kept One<|#|>thing<|#|>\n"
        "relation<|#|>Same<|#|>Same<|#|>kw<|#|>self loop dropped\n"
        "entity<|#|>Valid<|#|>thing<|#|>survives\n"
        "<|COMPLETE|>"
    ),
    # wrong field counts
    "entity<|#|>OnlyThree<|#|>x\nrelation<|#|>a<|#|>b<|#|>c\n<|COMPLETE|>",
    # type with comma / rejected chars; lowercasing and space removal
    (
        "entity<|#|>Multi Type<|#|>Big Org, Small Org<|#|>desc\n"
        "entity<|#|>Bad Type<|#|>we|rd<|#|>desc\n"
        "<|COMPLETE|>"
    ),
    # quotes around names
    'entity<|#|>"Quoted Co"<|#|>org<|#|>desc\n<|COMPLETE|>',
    # missing completion delimiter
    "entity<|#|>NoComplete<|#|>t<|#|>d",
    # lowercase completion delimiter
    "entity<|#|>LowComplete<|#|>t<|#|>d<|complete|>",
]


def _ref_parse(ref, result: str):
    return asyncio.run(
        ref.operate._process_extraction_result(
            result, chunk_key="chunk-001", timestamp=1234, file_path="http://u"
        )
    )


@pytest.mark.parametrize("vec", PARSE_VECTORS)
def test_parse_parity(ref, vec):
    entities, relations = parse_extraction_result(
        vec, chunk_key="chunk-001", timestamp=1234, file_path="http://u"
    )
    ref_nodes, ref_edges = _ref_parse(ref, vec)

    ours_nodes: dict[str, list[dict]] = {}
    for e in entities:
        ours_nodes.setdefault(e.entity_name, []).append(
            dict(
                entity_name=e.entity_name,
                entity_type=e.entity_type,
                description=e.description,
                source_id=e.source_id,
                file_path=e.file_path,
                timestamp=e.timestamp,
            )
        )
    assert ours_nodes == ref_nodes

    ours_edges: dict[tuple, list[dict]] = {}
    for r in relations:
        ours_edges.setdefault((r.src_id, r.tgt_id), []).append(
            dict(
                src_id=r.src_id,
                tgt_id=r.tgt_id,
                weight=r.weight,
                description=r.description,
                keywords=r.keywords,
                source_id=r.source_id,
                file_path=r.file_path,
                timestamp=r.timestamp,
            )
        )
    assert ours_edges == ref_edges


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            [
                "entity<|#|>Name A<|#|>org<|#|>desc a",
                "entity<|#|>Name B<|#|>person<|#|>desc b",
                "relation<|#|>Name A<|#|>Name B<|#|>kw<|#|>rel d",
                "entity<|##|>Corrupt<|>org<|#|>desc",
                "garbage line",
                "entity<|#|>X<|#|>y",
            ]
        ),
        max_size=6,
    )
)
def test_parse_parity_fuzz(ref, lines):
    result = "\n".join(lines) + "<|COMPLETE|>"
    entities, relations = parse_extraction_result(
        result, chunk_key="ck", timestamp=7, file_path="fp"
    )
    ref_nodes, ref_edges = _ref_parse(ref, result)
    assert {e.entity_name for e in entities} == set(ref_nodes)
    assert {(r.src_id, r.tgt_id) for r in relations} == set(ref_edges)
    # row multiplicity per key must match too
    for name, rows in ref_nodes.items():
        assert len([e for e in entities if e.entity_name == name]) == len(rows)
