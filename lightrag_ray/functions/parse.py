"""Parse extraction-result strings into entity / relation mention records.

Behavior parity with the reference's text-mode parse path:
  - record splitting + glued-record recovery: lightrag/operate.py:1411-1538
  - entity field rules:                       lightrag/operate.py:614-696
  - relation field rules:                     lightrag/operate.py:699-776
  - mis-prefixed relation recovery:           lightrag/operate.py:779-798

The extraction result format (lightrag/prompt.py:12-13, 54-141) is a sequence
of newline-separated records::

    entity<|#|>NAME<|#|>TYPE<|#|>DESCRIPTION
    relation<|#|>SRC<|#|>TGT<|#|>KW1, KW2<|#|>DESCRIPTION
    <|COMPLETE|>

Pure functions — used both by the Ray extraction stage and by unit tests.
"""

from __future__ import annotations

from dataclasses import dataclass

from lightrag_ray.constants import (
    COMPLETION_DELIMITER,
    TUPLE_DELIMITER,
    UNKNOWN_SOURCE,
)
from lightrag_ray.functions.delimiters import fix_tuple_delimiter_corruption
from lightrag_ray.functions.text import (
    normalize_entity_name_short,
    sanitize_and_normalize,
    sanitize_and_normalize_short,
    split_string_by_multi_markers,
    truncate_entity_identifier,
)

_TYPE_REJECT_CHARS = ("'", "(", ")", "<", ">", "|", "/", "\\")


@dataclass
class EntityMention:
    entity_name: str
    entity_type: str
    description: str
    source_id: str
    file_path: str
    timestamp: int
    rec_index: int = 0


@dataclass
class RelationMention:
    src_id: str
    tgt_id: str
    weight: float
    description: str
    keywords: str
    source_id: str
    file_path: str
    timestamp: int
    rec_index: int = 0


def make_entity_mention(
    name_raw: str,
    type_raw: str,
    desc_raw: str,
    chunk_key: str,
    timestamp: int,
    file_path: str,
    *,
    comma_type_first_token: bool = True,
) -> EntityMention | None:
    """Shared entity field rules (text mode lightrag/operate.py:614-696; JSON
    mode :877-921 applies the same rules minus the comma-to-first-token
    repair — hence the flag)."""
    entity_name = normalize_entity_name_short(name_raw)
    if not entity_name or not entity_name.strip():
        return None
    entity_type = sanitize_and_normalize_short(type_raw, remove_inner_quotes=True)
    if not entity_type.strip() or any(ch in entity_type for ch in _TYPE_REJECT_CHARS):
        return None
    if comma_type_first_token and "," in entity_type:
        tokens = [t.strip() for t in entity_type.split(",")]
        non_empty = [t for t in tokens if t]
        if not non_empty:
            return None
        entity_type = non_empty[0]
    entity_type = entity_type.replace(" ", "").lower()
    description = sanitize_and_normalize(desc_raw)
    if not description.strip():
        return None
    return EntityMention(
        entity_name=entity_name,
        entity_type=entity_type,
        description=description,
        source_id=chunk_key,
        file_path=file_path,
        timestamp=timestamp,
    )


def make_relation_mention(
    src_raw: str,
    tgt_raw: str,
    kw_raw: str,
    desc_raw: str,
    chunk_key: str,
    timestamp: int,
    file_path: str,
) -> RelationMention | None:
    """Shared relation field rules (text mode lightrag/operate.py:699-776;
    JSON mode :934-996)."""
    source = normalize_entity_name_short(src_raw)
    target = normalize_entity_name_short(tgt_raw)
    if not source or not target or source == target:
        return None
    keywords = sanitize_and_normalize_short(kw_raw, remove_inner_quotes=True)
    keywords = keywords.replace("，", ",")
    description = sanitize_and_normalize(desc_raw)
    if not description.strip():
        return None
    return RelationMention(
        src_id=source,
        tgt_id=target,
        weight=1.0,  # rows carry no weight field; fixed 1.0
        description=description,
        keywords=keywords,
        source_id=chunk_key,
        file_path=file_path,
        timestamp=timestamp,
    )


def _parse_entity_fields(
    attrs: list[str], chunk_key: str, timestamp: int, file_path: str
) -> EntityMention | None:
    if len(attrs) != 4 or "entity" not in attrs[0]:
        return None
    return make_entity_mention(
        attrs[1], attrs[2], attrs[3], chunk_key, timestamp, file_path
    )


def _parse_relation_fields(
    attrs: list[str], chunk_key: str, timestamp: int, file_path: str
) -> RelationMention | None:
    # "relationship" and "relation" are interchangeable prefixes.
    if len(attrs) != 5 or "relation" not in attrs[0]:
        return None
    return make_relation_mention(
        attrs[1], attrs[2], attrs[3], attrs[4], chunk_key, timestamp, file_path
    )


def _recover_misprefixed_relation(attrs: list[str]) -> list[str]:
    """A 5-field row with an 'entity' prefix is a relation row whose prefix the
    model got wrong; rewrite the prefix (lightrag/operate.py:779-798)."""
    if len(attrs) != 5:
        return attrs
    prefix = attrs[0].strip().lower()
    if "entity" not in prefix or "relation" in prefix:
        return attrs
    fixed = list(attrs)
    fixed[0] = "relation"
    return fixed


def _split_glued_records(records: list[str], tuple_delimiter: str) -> list[str]:
    """Recover records glued together by ``<|#|>entity<|#|>`` /
    ``<|#|>relation<|#|>`` instead of newlines (lightrag/operate.py:1444-1474)."""
    entity_glue = f"{tuple_delimiter}entity{tuple_delimiter}"
    rel_glues = (
        f"{tuple_delimiter}relationship{tuple_delimiter}",
        f"{tuple_delimiter}relation{tuple_delimiter}",
    )
    fixed: list[str] = []
    for record in records:
        record = record.strip()
        if not record:
            continue
        # fast path: well-prefixed record with no glued sub-records passes
        # through unchanged (the rewrite branches below only fire on pieces
        # lacking an entity/relation prefix)
        if (
            (record.startswith("entity") or record.startswith("relation"))
            and entity_glue not in record
            and rel_glues[0] not in record
            and rel_glues[1] not in record
        ):
            fixed.append(record)
            continue
        entity_pieces = split_string_by_multi_markers(
            record, [f"{tuple_delimiter}entity{tuple_delimiter}"]
        )
        for piece in entity_pieces:
            if not piece.startswith("entity") and not piece.startswith("relation"):
                piece = f"entity<|{piece}"
            rel_pieces = split_string_by_multi_markers(
                piece,
                [
                    f"{tuple_delimiter}relationship{tuple_delimiter}",
                    f"{tuple_delimiter}relation{tuple_delimiter}",
                ],
            )
            for rel_piece in rel_pieces:
                if not rel_piece.startswith("entity") and not rel_piece.startswith(
                    "relation"
                ):
                    rel_piece = f"relation{tuple_delimiter}{rel_piece}"
                fixed.append(rel_piece)
    return fixed


def parse_extraction_result(
    result: str,
    chunk_key: str,
    timestamp: int,
    file_path: str = UNKNOWN_SOURCE,
    tuple_delimiter: str = TUPLE_DELIMITER,
    completion_delimiter: str = COMPLETION_DELIMITER,
) -> tuple[list[EntityMention], list[RelationMention]]:
    """Parse one extraction response into mention records.

    Returns entity and relation mentions in record-arrival order, each stamped
    with its ``rec_index`` (position within this chunk's output) — the order
    key that makes first-seen-order provenance deterministic downstream.
    """
    records = split_string_by_multi_markers(
        result, ["\n", completion_delimiter, completion_delimiter.lower()]
    )
    fixed_records = _split_glued_records(records, tuple_delimiter)

    delimiter_core = tuple_delimiter[2:-2]
    delimiter_core_lower = delimiter_core.lower()

    entities: list[EntityMention] = []
    relations: list[RelationMention] = []
    rec_index = 0
    for record in fixed_records:
        record = record.strip()
        if not record:
            continue
        record = fix_tuple_delimiter_corruption(record, delimiter_core, tuple_delimiter)
        if delimiter_core != delimiter_core_lower:
            record = fix_tuple_delimiter_corruption(
                record, delimiter_core_lower, tuple_delimiter
            )
        attrs = split_string_by_multi_markers(record, [tuple_delimiter])
        attrs = _recover_misprefixed_relation(attrs)

        entity = _parse_entity_fields(attrs, chunk_key, timestamp, file_path)
        if entity is not None:
            entity.entity_name = truncate_entity_identifier(entity.entity_name)
            entity.rec_index = rec_index
            entities.append(entity)
            rec_index += 1
            continue

        relation = _parse_relation_fields(attrs, chunk_key, timestamp, file_path)
        if relation is not None:
            relation.src_id = truncate_entity_identifier(relation.src_id)
            relation.tgt_id = truncate_entity_identifier(relation.tgt_id)
            relation.rec_index = rec_index
            relations.append(relation)
            rec_index += 1

    return entities, relations
