"""Gleaning-round merge.

Behavior parity with the reference's glean merge (lightrag/operate.py:3928-3965):
for each key present in the gleaning round, keep the gleaned rows when the
gleaned first-row description is strictly longer than the original first-row
description, otherwise keep the originals; keys new in the gleaning round are
added.  Operates on the per-chunk parse output before it is exploded into
mention rows.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Hashable, TypeVar

from lightrag_ray.functions.parse import EntityMention, RelationMention

M = TypeVar("M", EntityMention, RelationMention)


def _group(mentions: list[M], key) -> dict[Hashable, list[M]]:
    grouped: dict[Hashable, list[M]] = defaultdict(list)
    for m in mentions:
        grouped[key(m)].append(m)
    return dict(grouped)


def _merge(
    original: dict[Hashable, list[M]], gleaned: dict[Hashable, list[M]]
) -> dict[Hashable, list[M]]:
    merged = dict(original)
    for key, glean_rows in gleaned.items():
        if key in merged:
            orig_len = len(merged[key][0].description or "")
            glean_len = len(glean_rows[0].description or "")
            if glean_len > orig_len:
                merged[key] = list(glean_rows)
        else:
            merged[key] = list(glean_rows)
    return merged


def merge_gleaning_results(
    entities: list[EntityMention],
    relations: list[RelationMention],
    glean_entities: list[EntityMention],
    glean_relations: list[RelationMention],
) -> tuple[list[EntityMention], list[RelationMention]]:
    """Merge a gleaning round into the initial parse for one chunk."""
    nodes = _merge(
        _group(entities, lambda m: m.entity_name),
        _group(glean_entities, lambda m: m.entity_name),
    )
    edges = _merge(
        _group(relations, lambda m: (m.src_id, m.tgt_id)),
        _group(glean_relations, lambda m: (m.src_id, m.tgt_id)),
    )
    out_entities = [m for rows in nodes.values() for m in rows]
    out_relations = [m for rows in edges.values() for m in rows]
    return out_entities, out_relations
