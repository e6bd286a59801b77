"""chunks → mentions: entity/relation extraction (stateful actor pool).

Mirrors the reference's ``extract_entities`` stage (lightrag/operate.py:3658-4146)
with the model quarantined behind an :class:`Extractor` protocol: the extractor
produces the reference's text-mode record format (lightrag/prompt.py:54-141)
and the SHARED parser (:mod:`lightrag_ray.functions.parse`) turns it into
mention rows — so a future LLM-backed extractor reuses the exact parse path.

The default :class:`RuleExtractor` is deterministic (pure function of the
chunk), which is what makes throughput/parity measurable without a live model:
  * entities = first-seen distinct word tokens of length ≥ 5
    (``\\w+`` tokens, capped at ``max_extraction_entities``),
    type = TYPES[len(word) % len(TYPES)], description cites the chunk;
  * relations = consecutive entity pairs in first-seen order (capped so
    records ≤ ``max_extraction_records``), keywords = "cooccurrence".

Output (mentions table) — one unified Arrow schema so a single streaming pass
writes one sink; ``kind`` splits it back at merge time:
  kind:'e'|'r', name, tgt, entity_type, description, keywords, weight:float64,
  source_id (chunk_id), file_path (url), timestamp:int64, chunk_order:int32,
  rec_index:int32
"""

from __future__ import annotations

import re
from typing import Protocol

import pyarrow as pa

from lightrag_ray.config import PipelineConfig
from lightrag_ray.functions.glean import merge_gleaning_results
from lightrag_ray.functions.parse import parse_extraction_result

MENTIONS_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),
        ("name", pa.string()),
        ("tgt", pa.string()),
        ("entity_type", pa.string()),
        ("description", pa.string()),
        ("keywords", pa.string()),
        ("weight", pa.float64()),
        ("source_id", pa.string()),
        ("file_path", pa.string()),
        ("timestamp", pa.int64()),
        ("chunk_order", pa.int32()),
        ("rec_index", pa.int32()),
    ]
)


class Extractor(Protocol):
    """Produces extraction-result strings in the reference record format.

    ``rounds`` > 1 enables gleaning: round 0 is the initial pass, later rounds
    see the prior output (reference gleaning: lightrag/operate.py:3864-3965).
    """

    def extract(self, content: str, chunk_key: str, round_index: int,
                prior_output: str) -> str: ...


_WORD_RE = re.compile(r"\w+", re.UNICODE)
_TYPES = ("person", "organization", "location", "event", "concept")


class RuleExtractor:
    """Deterministic rule-based extractor (see module docstring)."""

    def __init__(self, min_word_len: int = 5, max_entities: int = 40,
                 max_records: int = 100):
        self.min_word_len = min_word_len
        self.max_entities = max_entities
        self.max_records = max_records

    def extract(self, content: str, chunk_key: str, round_index: int = 0,
                prior_output: str = "") -> str:
        if round_index > 0:
            return "<|COMPLETE|>"  # nothing new to glean, deterministically
        seen: dict[str, None] = {}
        for word in _WORD_RE.findall(content):
            if len(word) >= self.min_word_len and word not in seen:
                seen[word] = None
                if len(seen) >= self.max_entities:
                    break
        entities = list(seen)
        lines = [
            f"entity<|#|>{w}<|#|>{_TYPES[len(w) % len(_TYPES)]}<|#|>"
            f"{w} occurs in {chunk_key}"
            for w in entities
        ]
        budget = self.max_records - len(lines)
        for a, b in zip(entities, entities[1:]):
            if budget <= 0:
                break
            lines.append(
                f"relation<|#|>{a}<|#|>{b}<|#|>cooccurrence<|#|>"
                f"{a} near {b} in {chunk_key}"
            )
            budget -= 1
        lines.append("<|COMPLETE|>")
        return "\n".join(lines)


def build_extractor(cfg: PipelineConfig) -> Extractor:
    if cfg.extractor == "rule":
        return RuleExtractor(
            max_entities=cfg.max_extraction_entities,
            max_records=cfg.max_extraction_records,
            **cfg.extractor_options,
        )
    if cfg.extractor == "llm":
        from lightrag_ray.stages.llm_extractor import LLMExtractor

        return LLMExtractor(
            max_total_records=cfg.max_extraction_records,
            max_entity_records=cfg.max_extraction_entities,
            **cfg.extractor_options,  # must include model_fn
        )
    raise ValueError(f"unknown extractor {cfg.extractor!r}")


class ExtractStage:
    """Callable class for ``map_batches(..., concurrency=N)``.

    The extractor (a model client in the LLM case) is built once per actor;
    each batch of chunks becomes mention rows via the shared parser.
    """

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.extractor = build_extractor(cfg)
        self._pool = None  # lazily-built LLM call pool (llm_max_async wide)

    def _extract_one(self, chunk_key, url, order, content, ts):
        """Full per-chunk extraction (initial + gleaning rounds) — runs
        entirely on one worker thread so gleaning state stays coherent."""
        result = self.extractor.extract(content, chunk_key, 0, "")
        entities, relations = parse_extraction_result(
            result, chunk_key=chunk_key, timestamp=ts, file_path=url
        )
        for r in range(1, self.cfg.max_gleaning + 1):
            glean = self.extractor.extract(content, chunk_key, r, result)
            g_entities, g_relations = parse_extraction_result(
                glean, chunk_key=chunk_key, timestamp=ts, file_path=url
            )
            entities, relations = merge_gleaning_results(
                entities, relations, g_entities, g_relations
            )
        return entities, relations

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {name: [] for name in MENTIONS_SCHEMA.names}
        chunk_ids = batch.column("chunk_id").to_pylist()
        urls = batch.column("url").to_pylist()
        orders = batch.column("chunk_order_index").to_pylist()
        contents = batch.column("content").to_pylist()
        stamps = batch.column("timestamp").to_pylist()
        args = list(zip(chunk_ids, urls, orders, contents, stamps))

        # LLM extraction keeps llm_max_async calls in flight per actor
        # (reference semaphore, lightrag/constants.py:91 / operate.py:4056-4058
        # — calls are network-bound, so threads, ordered results preserved);
        # the deterministic rule extractor is pure CPU and stays serial.
        if self.cfg.extractor == "llm" and self.cfg.llm_max_async > 1:
            from concurrent.futures import ThreadPoolExecutor

            if self._pool is None:
                self._pool = ThreadPoolExecutor(
                    max_workers=self.cfg.llm_max_async
                )
            results = list(
                self._pool.map(lambda a: self._extract_one(*a), args)
            )
        else:
            results = [self._extract_one(*a) for a in args]

        for (chunk_key, url, order, content, ts), (entities, relations) in zip(
            args, results
        ):
            for e in entities:
                out["kind"].append("e")
                out["name"].append(e.entity_name)
                out["tgt"].append("")
                out["entity_type"].append(e.entity_type)
                out["description"].append(e.description)
                out["keywords"].append("")
                out["weight"].append(0.0)
                out["source_id"].append(e.source_id)
                out["file_path"].append(e.file_path)
                out["timestamp"].append(e.timestamp)
                out["chunk_order"].append(order)
                out["rec_index"].append(e.rec_index)
            for rel in relations:
                out["kind"].append("r")
                out["name"].append(rel.src_id)
                out["tgt"].append(rel.tgt_id)
                out["entity_type"].append("")
                out["description"].append(rel.description)
                out["keywords"].append(rel.keywords)
                out["weight"].append(rel.weight)
                out["source_id"].append(rel.source_id)
                out["file_path"].append(rel.file_path)
                out["timestamp"].append(rel.timestamp)
                out["chunk_order"].append(order)
                out["rec_index"].append(rel.rec_index)
        return pa.table(out, schema=MENTIONS_SCHEMA)
