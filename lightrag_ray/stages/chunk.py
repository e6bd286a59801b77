"""docs → chunks: token-window chunking (stateful actor pool).

The tokenizer is constructed ONCE per actor in ``__init__`` (the reference
loads tiktoken once per process, lightrag/utils.py:3096-3123); each ``__call__``
explodes a batch of documents into chunk rows.

Output schema (chunks): chunk_id, doc_id, url, lang, chunk_order_index:int32,
                        tokens:int32, content, timestamp:int64

Chunks whose stripped content is empty are dropped, matching
``build_chunks_dict_from_chunking_result`` (lightrag/utils_pipeline.py:150-151).
"""

from __future__ import annotations

import pyarrow as pa

from lightrag_ray.config import PipelineConfig
from lightrag_ray.functions.chunking import chunk_id_for, chunk_text
from lightrag_ray.functions.tokenizer import default_tokenizer

CHUNKS_SCHEMA = pa.schema(
    [
        ("chunk_id", pa.string()),
        ("doc_id", pa.string()),
        ("url", pa.string()),
        ("lang", pa.string()),
        ("chunk_order_index", pa.int32()),
        ("tokens", pa.int32()),
        ("content", pa.string()),
        ("timestamp", pa.int64()),
    ]
)


class ChunkerStage:
    """Callable class for ``map_batches(..., concurrency=N)``."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.tokenizer = default_tokenizer()
        self.embedder = None
        self.paragraph_engine = None
        if cfg.chunking_strategy == "V":
            # sentence-embedding model: once per actor, like the tokenizer
            from lightrag_ray.stages.embed import HashEmbedder

            factory = cfg.chunker_options.get("embedder_factory", HashEmbedder)
            self.embedder = factory()
        elif cfg.chunking_strategy == "P":
            from lightrag_ray.functions.paragraph_chunking import (
                ParagraphSemanticEngine,
            )

            self.paragraph_engine = ParagraphSemanticEngine(
                self.tokenizer,
                chunk_token_size=cfg.chunk_token_size,
                chunk_overlap_token_size=cfg.chunk_overlap_token_size,
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        out: dict[str, list] = {name: [] for name in CHUNKS_SCHEMA.names}
        doc_ids = batch.column("doc_id").to_pylist()
        urls = batch.column("url").to_pylist()
        langs = batch.column("lang").to_pylist()
        texts = batch.column("text").to_pylist()
        stamps = batch.column("timestamp").to_pylist()
        # "P" sidecars ride the Dataset as optional columns: the blocks.jsonl
        # payload and the tables.json payload per document (at web scale the
        # sidecar travels through the object store with the page, not via a
        # shared filesystem path as in the reference).
        names = set(batch.schema.names)
        blocks_col = (
            batch.column("blocks_jsonl").to_pylist()
            if "blocks_jsonl" in names
            else [None] * len(doc_ids)
        )
        tables_col = (
            batch.column("tables_json").to_pylist()
            if "tables_json" in names
            else [None] * len(doc_ids)
        )
        for doc_id, url, lang, text, ts, blocks_jsonl, tables_json in zip(
            doc_ids, urls, langs, texts, stamps, blocks_col, tables_col
        ):
            if not text and not blocks_jsonl:
                continue
            if cfg.chunking_strategy == "R":
                from lightrag_ray.functions.recursive_chunking import (
                    chunking_by_recursive_character,
                )

                chunks = chunking_by_recursive_character(
                    self.tokenizer,
                    text,
                    chunk_overlap_token_size=cfg.chunk_overlap_token_size,
                    chunk_token_size=cfg.chunk_token_size,
                )
            elif cfg.chunking_strategy == "V":
                from lightrag_ray.functions.semantic_chunking import (
                    chunk_text_semantic,
                )

                chunks = chunk_text_semantic(
                    self.embedder,
                    text,
                    **{
                        k: v
                        for k, v in cfg.chunker_options.items()
                        if k != "embedder_factory"
                    },
                )
                for c in chunks:  # size is advisory; C5 below enforces caps
                    c["tokens"] = len(self.tokenizer.encode(c["content"]))
            elif cfg.chunking_strategy == "P":
                from lightrag_ray.functions.paragraph_chunking import (
                    parse_blocks_jsonl,
                    parse_table_headers,
                )

                if not blocks_jsonl and cfg.chunker_options.get("markdown_blocks"):
                    # webtext-native parser: derive the HeadingBlocks sidecar
                    # from the page text itself (functions/markdown_blocks.py)
                    from lightrag_ray.functions.markdown_blocks import (
                        markdown_sidecar_strings,
                    )

                    blocks_jsonl, tables_json = markdown_sidecar_strings(text or "")
                rows = parse_blocks_jsonl(blocks_jsonl)
                if rows:
                    chunks = self.paragraph_engine.run(
                        rows, parse_table_headers(tables_json)
                    )
                else:  # sidecar missing → recursive-character fallback
                    from lightrag_ray.functions.paragraph_chunking import (
                        langchain_recursive_chunks,
                    )

                    chunks = langchain_recursive_chunks(
                        self.tokenizer,
                        text or "",
                        self.paragraph_engine.cap,
                        self.paragraph_engine.overlap,
                    )
            else:
                chunks = chunk_text(
                    self.tokenizer,
                    text,
                    split_by_character=cfg.split_by_character,
                    split_by_character_only=cfg.split_by_character_only,
                    chunk_overlap_token_size=cfg.chunk_overlap_token_size,
                    chunk_token_size=cfg.chunk_token_size,
                )
            if cfg.embedding_token_limit:
                from lightrag_ray.functions.semantic_chunking import (
                    enforce_chunk_token_limit,
                )

                chunks = enforce_chunk_token_limit(
                    chunks,
                    self.tokenizer,
                    cfg.embedding_token_limit,
                    overlap_tokens=cfg.embedding_overlap_token_size,
                )
            for chunk in chunks:
                if not chunk["content"]:
                    continue
                order = chunk["chunk_order_index"]
                out["chunk_id"].append(chunk_id_for(doc_id, order))
                out["doc_id"].append(doc_id)
                out["url"].append(url)
                out["lang"].append(lang)
                out["chunk_order_index"].append(order)
                out["tokens"].append(chunk["tokens"])
                out["content"].append(chunk["content"])
                out["timestamp"].append(ts)
        return pa.table(out, schema=CHUNKS_SCHEMA)
