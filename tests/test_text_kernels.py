"""Parity tests for the sanitize/normalize kernels vs the reference.

These strings are the canonical groupby keys — every vector is checked
byte-for-byte against the reference implementation imported as an oracle.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lightrag_ray.functions import text as K

SANITIZE_VECTORS = [
    "",
    "   ",
    "plain text",
    " leading and trailing  ",
    "a&amp;b &lt;tag&gt; &quot;q&quot; &#65;",
    "ctrl\x00chars\x08here\x0b\x0c\x1f\x7fend",
    "keep\ttabs\nnewlines\rreturns",
    "non￾char￿",
    "nbsp inside",
    "emoji 🎉 stays",
    "中文 文本",
]

NORMALIZE_VECTORS = [
    ("Acme Corp", False),
    ('"Quoted Name"', True),
    ("'Single'", True),
    ('"unmatched', True),
    ('"inner "quote" kept"', True),
    ("“中文名”", True),
    ("《书名》", True),
    ("ＡＢＣ１２３ ｆｕｌｌｗｉｄｔｈ", False),
    ("中文 之间 空格", False),
    ("中文 abc 混合 123", False),
    ("（括号）—破折号－减号", False),
    ("42", True),
    ("1.2.3", True),
    ("12345.", True),
    ("1.234567", True),
    ("<p>para</p><br>break<br/>", False),
    ("name’s “mark”", True),
    ("'中文'引号", True),
    ("nb sp and narrow", True),
    ("  spaced  out  ", False),
    ("x", False),
    ("", False),
]


@pytest.mark.parametrize("vec", SANITIZE_VECTORS)
def test_sanitize_parity(ref, vec):
    assert K.sanitize_text_for_encoding(vec) == ref.utils.sanitize_text_for_encoding(vec)


@pytest.mark.parametrize("vec,riq", NORMALIZE_VECTORS)
def test_normalize_parity(ref, vec, riq):
    assert K.normalize_extracted_info(vec, remove_inner_quotes=riq) == (
        ref.utils.normalize_extracted_info(vec, remove_inner_quotes=riq)
    )


@pytest.mark.parametrize("vec,_", NORMALIZE_VECTORS)
def test_entity_name_parity(ref, vec, _):
    assert K.normalize_entity_name(vec) == ref.utils.normalize_entity_name(vec)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=80))
def test_sanitize_parity_fuzz(ref, s):
    assert K.sanitize_text_for_encoding(s) == ref.utils.sanitize_text_for_encoding(s)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=80), st.booleans())
def test_normalize_parity_fuzz(ref, s, riq):
    assert K.normalize_extracted_info(s, remove_inner_quotes=riq) == (
        ref.utils.normalize_extracted_info(s, remove_inner_quotes=riq)
    )


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=600))
def test_truncate_identifier_parity(ref, s):
    ours = K.truncate_entity_identifier(s)
    theirs = ref.operate._truncate_entity_identifier(s, 256, "chunk-x", "Entity name")
    assert ours == theirs


def test_split_multi_markers_parity(ref):
    cases = [
        ("a<|#|>b<|#|>c", ["<|#|>"]),
        ("  x  \n y ", ["\n"]),
        ("a<SEP>b<SEP><SEP>c", ["<SEP>"]),
        ("no markers", ["<|#|>"]),
        ("", ["<|#|>"]),
        ("a|b.c", ["|", "."]),
    ]
    for content, markers in cases:
        assert K.split_string_by_multi_markers(content, markers) == (
            ref.utils.split_string_by_multi_markers(content, markers)
        )


def test_mdhash_id_matches_reference(ref):
    assert K.compute_mdhash_id("hello", prefix="doc-") == ref.utils.compute_mdhash_id(
        "hello", prefix="doc-"
    )


def test_multimodal_markup_strip_parity(ref):
    """M13 fuzz parity vs the reference's
    strip_internal_multimodal_markup_for_extraction (chunk_schema.py:332)."""
    import importlib
    import random
    import sys

    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    cs = importlib.import_module("lightrag.chunk_schema")

    from lightrag_ray.functions.multimodal_markup import (
        strip_internal_multimodal_markup_for_extraction as ours,
    )

    rng = random.Random(7)
    pieces = [
        'plain prose with <b>html</b> ',
        '<cite type="table" refid="tb-12">Table 1</cite>',
        '<cite refid="x">see figure</cite>',
        '<drawing id="im-1" path="/tmp/x" src="a.png" caption="Fig 2" />',
        '<drawing id="im-2" src="b.png" />',
        '<table id="tb-9" format="json" caption="Rates">{"a":1}</table>',
        '<table format="md">|a|</table>',
        '<equation id="eq-3" format="latex">e=mc^2</equation>',
        '<equation>x+y</equation>',
        'multi\nline\ntext',
        '<CITE TYPE="x" REFID="y">upper</CITE>',
    ]
    for _ in range(200):
        content = "".join(rng.choice(pieces) for _ in range(rng.randint(0, 6)))
        for keep in (False, True):
            assert ours(content, keep_cite_tag=keep) == (
                cs.strip_internal_multimodal_markup_for_extraction(
                    content, keep_cite_tag=keep
                )
            ), (content, keep)
