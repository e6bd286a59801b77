"""JSON-mode parser: tolerant loading parity + field-rule parity vs reference."""

from __future__ import annotations

import asyncio

import pytest

from lightrag_ray.functions.parse_json import (
    parse_json_extraction_result,
    tolerant_load_json_dict,
)

LOAD_VECTORS = [
    '{"a": 1}',
    '```json\n{"a": 1}\n```',
    'Here is the result: {"a": 1}',
    '{"facts": [1, 2]} trailing {brace}',
    '{"a": 1,}',
    "{'a': 1}",
    '{a: 1}',
    '{"a": 1',
    '[{"a": 1}, {"b": 2}]',          # top-level array → {}
    'Here is: [{"a": 1}]',           # prose + array → {}
    "",
    "no json at all",
]


@pytest.mark.parametrize("vec", LOAD_VECTORS)
def test_tolerant_load_parity(ref, vec):
    theirs = None
    try:
        theirs = ref.utils.tolerant_load_json_dict(vec)
    except Exception:
        pass
    ours = tolerant_load_json_dict(vec)
    if theirs is not None and theirs != {}:
        assert ours == theirs, vec
    else:
        # reference's json_repair path is stubbed in tests; at minimum agree
        # on the reject cases (arrays / empty) and never raise
        if vec.startswith("[") or "[{" in vec.split("{")[0] or not vec:
            assert ours == {}


JSON_RESULT = """
```json
{
  "entities": [
    {"name": "Acme Corp", "type": "Organization", "description": "A company"},
    {"name": "42", "type": "number", "description": "dropped numeric"},
    {"name": "Jane Doe", "type": "Person", "description": "An engineer"},
    {"name": "NoDesc", "type": "thing", "description": ""}
  ],
  "relationships": [
    {"source": "Jane Doe", "target": "Acme Corp", "keywords": "employment",
     "description": "Jane works at Acme"},
    {"source": "Same", "target": "Same", "keywords": "x", "description": "loop"}
  ]
}
```
"""


def test_parse_json_extraction(ref):
    entities, relations = parse_json_extraction_result(
        JSON_RESULT, chunk_key="c1", timestamp=5, file_path="fp"
    )
    ref_nodes, ref_edges = asyncio.run(
        ref.operate._process_json_extraction_result(
            JSON_RESULT, chunk_key="c1", timestamp=5, file_path="fp"
        )
    )
    ours_nodes = {}
    for e in entities:
        ours_nodes.setdefault(e.entity_name, []).append(
            dict(
                entity_name=e.entity_name, entity_type=e.entity_type,
                description=e.description, source_id=e.source_id,
                file_path=e.file_path, timestamp=e.timestamp,
            )
        )
    assert ours_nodes == ref_nodes
    ours_edges = {}
    for r in relations:
        ours_edges.setdefault((r.src_id, r.tgt_id), []).append(
            dict(
                src_id=r.src_id, tgt_id=r.tgt_id, weight=r.weight,
                description=r.description, keywords=r.keywords,
                source_id=r.source_id, file_path=r.file_path,
                timestamp=r.timestamp,
            )
        )
    assert ours_edges == ref_edges


def test_parse_json_garbage_returns_empty():
    assert parse_json_extraction_result("not json", "c", 0) == ([], [])
    assert parse_json_extraction_result('[{"entities": []}]', "c", 0) == ([], [])
