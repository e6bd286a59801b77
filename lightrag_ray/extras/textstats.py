"""Text analysis operators: language ID heuristic and token statistics.

Language ID is a deterministic stopword/charset heuristic (no model):
score = fraction of words in each language's closed stopword list, with a CJK
charset override.  Rows-only checked (a heuristic has no SQL ground truth);
the remaining token statistics live in pipelines/queries.py with full oracles.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa

_WORD_RE = re.compile(r"\w+", re.UNICODE)
_CJK_RE = re.compile(r"[一-龥]")

_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is it for with that on as are was".split()),
    "de": frozenset("der die das und ist von zu mit den ein eine nicht".split()),
    "fr": frozenset("le la les et de des un une est pour que dans".split()),
    "es": frozenset("el la los las y de un una es para que en".split()),
}


def predict_lang(text: str) -> tuple[str, float]:
    text = text or ""
    if _CJK_RE.search(text):
        return "zh", 1.0
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if not words:
        return "und", 0.0
    best_lang, best = "und", 0.0
    for lang in sorted(_PROFILES):  # sorted → deterministic tie-break
        score = sum(1 for w in words if w in _PROFILES[lang]) / len(words)
        if score > best:
            best_lang, best = lang, score
    return best_lang, round(best, 4)


def langid_batch(batch: pa.Table) -> pa.Table:
    preds, scores = [], []
    for text in batch.column("text").to_pylist():
        lang, score = predict_lang(text)
        preds.append(lang)
        scores.append(score)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(preds, pa.string()),
            "lang_score": pa.array(scores, pa.float64()),
        }
    )


def langid(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(langid_batch, batch_format="pyarrow", zero_copy_batch=True)
