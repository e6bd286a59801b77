"""pages → docs: text extraction + sanitization (stateless map_batches).

Reference semantics: for raw/web-text input the whole "text extraction" is a
UTF-8 decode (for binary html) followed by ``sanitize_text_for_encoding``
(lightrag/parser/legacy/extractors.py:19-205 — html/txt route is a plain
decode with NO tag stripping; sanitize applied at enqueue,
lightrag/pipeline.py:1010/1025).  ``doc_id = "doc-" + md5(url)``: the url is a
"known document source", so ids are path-keyed (lightrag/pipeline.py:936-940).

Input schema  (pages):  url:string, warc_ts:timestamp[us], html:binary,
                        text:string, lang:string
Output schema (docs):   doc_id, url, text, lang, n_chars:int64,
                        timestamp:int64 (warc_ts epoch seconds)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from lightrag_ray.config import PipelineConfig
from lightrag_ray.functions.text import compute_mdhash_id, sanitize_text_for_encoding


def make_extract_text_fn(cfg: PipelineConfig):
    """Returns the per-batch function; zero-copy Arrow in/out."""
    use_html = cfg.text_source == "html"

    def extract_text(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        if use_html:
            raw = batch.column("html").to_pylist()
            texts = [
                sanitize_text_for_encoding(b.decode("utf-8", errors="replace"))
                if b is not None
                else ""
                for b in raw
            ]
        else:
            raw = batch.column("text").to_pylist()
            texts = [sanitize_text_for_encoding(t or "") for t in raw]

        doc_ids = [compute_mdhash_id(u, prefix="doc-") for u in urls]
        # µs → s by integer division (a straight cast to timestamp[s] raises
        # on sub-second timestamps)
        ts = pc.divide(pc.cast(batch.column("warc_ts"), pa.int64()), 1_000_000)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "url": batch.column("url"),
                "text": pa.array(texts, pa.string()),
                "lang": batch.column("lang"),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                "timestamp": ts,
            }
        )

    return extract_text
