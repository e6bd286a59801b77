"""JSON-mode extraction parsing (the reference's alternate parse path).

Behavior modeled on:
  - ``tolerant_load_json_dict``            lightrag/utils.py:5072-5165
  - ``_process_json_extraction_result``    lightrag/operate.py:817-1002

Recovers a single JSON object from noisy model output (markdown fences,
leading/trailing prose, trailing commas, single quotes, unquoted keys,
truncation), rejects top-level arrays, then applies the SAME field rules as
the text-mode parser via :func:`make_entity_mention` /
:func:`make_relation_mention`.  Expected payload::

    {"entities": [{"name","type","description"}, ...],
     "relationships": [{"source","target","keywords","description"}, ...]}

The reference leans on the ``json_repair`` package for object-level slips;
that dependency is absent here, so ``_repair_json_slips`` fixes the common
shapes (trailing commas, single-quoted strings, unquoted keys, truncation)
with targeted rewrites.
"""

from __future__ import annotations

import json
import re

from lightrag_ray.constants import UNKNOWN_SOURCE
from lightrag_ray.functions.parse import (
    EntityMention,
    RelationMention,
    make_entity_mention,
    make_relation_mention,
)
from lightrag_ray.functions.text import truncate_entity_identifier

_FENCE_RE = re.compile(r"^```[a-zA-Z0-9_-]*\s*\n?|\n?```\s*$")


def _strip_fence(text: str) -> str:
    text = text.strip()
    if text.startswith("```"):
        text = _FENCE_RE.sub("", text)
    return text.strip()


def _first_structural_opener(text: str) -> tuple[str | None, int]:
    """First '{' or '[' outside a double-quoted string."""
    in_string = False
    escaped = False
    for i, ch in enumerate(text):
        if in_string:
            if escaped:
                escaped = False
            elif ch == "\\":
                escaped = True
            elif ch == '"':
                in_string = False
        elif ch == '"':
            in_string = True
        elif ch in "{[":
            return ch, i
    return None, -1


def _first_balanced_object_slice(text: str) -> str:
    depth = 0
    in_string = False
    escaped = False
    for i, ch in enumerate(text):
        if in_string:
            if escaped:
                escaped = False
            elif ch == "\\":
                escaped = True
            elif ch == '"':
                in_string = False
            continue
        if ch == '"':
            in_string = True
        elif ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                return text[: i + 1]
    return text  # unbalanced (truncated) — repair handles closing


_TRAILING_COMMA_RE = re.compile(r",(\s*[}\]])")
_UNQUOTED_KEY_RE = re.compile(r"([{,]\s*)([A-Za-z_][A-Za-z0-9_]*)(\s*:)")


def _repair_json_slips(slice_: str) -> str:
    out = _TRAILING_COMMA_RE.sub(r"\1", slice_)
    out = _UNQUOTED_KEY_RE.sub(r'\1"\2"\3', out)
    # single-quoted strings → double-quoted (only when the slice has no
    # double-quoted strings to collide with — the weak-model shape)
    if "'" in out and '"' not in out.replace('\\"', ""):
        out = re.sub(r"'([^']*)'", lambda m: json.dumps(m.group(1)), out)
    # truncation: close unbalanced strings/brackets
    opens = 0
    in_string = False
    escaped = False
    for ch in out:
        if in_string:
            if escaped:
                escaped = False
            elif ch == "\\":
                escaped = True
            elif ch == '"':
                in_string = False
            continue
        if ch == '"':
            in_string = True
        elif ch in "{[":
            opens += 1
        elif ch in "}]":
            opens -= 1
    if in_string:
        out += '"'
    out = out.rstrip().rstrip(",")
    out += "}" * max(0, opens)
    return out


def tolerant_load_json_dict(text: str) -> dict:
    """Return the first genuine JSON object, or {} (never raises).  Top-level
    arrays are rejected so one element is never mistaken for the answer."""
    if not text:
        return {}
    candidate = _strip_fence(text).strip()
    opener, index = _first_structural_opener(candidate)
    if opener != "{":
        return {}
    suffix = candidate[index:]
    try:
        obj, _end = json.JSONDecoder().raw_decode(suffix)
        if isinstance(obj, dict):
            return obj
    except Exception:
        pass
    slice_ = _first_balanced_object_slice(suffix)
    try:
        repaired = json.loads(_repair_json_slips(slice_))
        if isinstance(repaired, dict):
            return repaired
    except Exception:
        pass
    return {}


def parse_json_extraction_result(
    result: str,
    chunk_key: str,
    timestamp: int,
    file_path: str = UNKNOWN_SOURCE,
) -> tuple[list[EntityMention], list[RelationMention]]:
    parsed = tolerant_load_json_dict(result)
    entities: list[EntityMention] = []
    relations: list[RelationMention] = []
    if not parsed:
        return entities, relations

    rec_index = 0
    entities_list = parsed.get("entities", [])
    if isinstance(entities_list, list):
        for item in entities_list:
            if not isinstance(item, dict):
                continue
            m = make_entity_mention(
                str(item.get("name", "")),
                str(item.get("type", "")),
                str(item.get("description", "")),
                chunk_key,
                timestamp,
                file_path,
                comma_type_first_token=False,  # JSON mode keeps the raw type
            )
            if m is not None:
                m.entity_name = truncate_entity_identifier(m.entity_name)
                m.rec_index = rec_index
                rec_index += 1
                entities.append(m)

    relationships_list = parsed.get("relationships", [])
    if isinstance(relationships_list, list):
        for item in relationships_list:
            if not isinstance(item, dict):
                continue
            m = make_relation_mention(
                str(item.get("source", "")),
                str(item.get("target", "")),
                str(item.get("keywords", "")),
                str(item.get("description", "")),
                chunk_key,
                timestamp,
                file_path,
            )
            if m is not None:
                m.src_id = truncate_entity_identifier(m.src_id)
                m.tgt_id = truncate_entity_identifier(m.tgt_id)
                m.rec_index = rec_index
                rec_index += 1
                relations.append(m)

    return entities, relations
