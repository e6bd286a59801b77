"""Binary-file extraction stage: (payload: binary, suffix) → text.

The Ray mapping of the reference's legacy extractor dispatch
(lightrag/parser/legacy/extractors.py:188-205, SURVEY §2.1 S2): a stateless
``map_batches`` over a binary-payload column — pdf/docx/pptx/xlsx route to
the stdlib extractors in :mod:`lightrag_ray.functions.extractors`, everything
else is validated UTF-8 decode.  Failures land in an ``error`` column instead
of failing the block (one bad file must not kill a 100-TB partition); callers
filter or quarantine on ``error != ''``.

Output batch: passthrough of ``id_column`` + ``suffix``, plus ``text`` and
``error`` columns.
"""

from __future__ import annotations

import pyarrow as pa

from lightrag_ray.functions.extractors import extract_file_text


def make_binary_extract_fn(id_column: str = "doc_id",
                           payload_column: str = "payload",
                           suffix_column: str = "suffix"):
    def extract(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column)
        suffixes = batch.column(suffix_column).to_pylist()
        payloads = batch.column(payload_column).to_pylist()
        texts, errors = [], []
        for payload, suffix in zip(payloads, suffixes):
            try:
                texts.append(extract_file_text(payload or b"", suffix or ""))
                errors.append("")
            except Exception as e:  # quarantine, never fail the block
                texts.append("")
                errors.append(f"{type(e).__name__}: {e}")
        return pa.table(
            {
                id_column: ids,
                suffix_column: pa.array(suffixes, pa.string()),
                "text": pa.array(texts, pa.string()),
                "error": pa.array(errors, pa.string()),
            }
        )

    return extract
