"""Deduplication operators.

All hashes derive from md5 (never Python ``hash()``, which is per-process
seeded) so results are deterministic across workers AND expressible in the
DuckDB oracles.

Scale notes per operator:
  - SimHash / shingling / signatures: embarrassingly parallel ``map_batches``.
  - MinHash-LSH: signatures → explode to (band, band_hash) rows → groupby
    band buckets → pairs within bucket (bucket-size capped to keep a
    degenerate bucket from going quadratic) → signature-estimated Jaccard.
    No full-corpus broadcast anywhere.
  - Exact-verify variants (n-gram Jaccard, embedding cosine) are O(n²)
    baselines run over a BROADCAST corpus (ray.put once, read per task);
    they exist as the correctness oracle for the LSH paths and are only for
    corpora that fit one node's memory — the scale path is the LSH variant.
"""

from __future__ import annotations

import hashlib
import os
from itertools import combinations

import numpy as np
import pyarrow as pa

_U60 = (1 << 60) - 1


def _md5_u60(token: str) -> int:
    """First 15 hex digits of md5 as a 60-bit uint (matches the SQL oracle's
    ``('0x' || substr(md5(w),1,15))::UBIGINT``)."""
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:15], 16)


def _words(text: str) -> list[str]:
    import re

    return re.findall(r"\w+", text or "")


def _char_shingles(text: str, k: int = 3) -> set[str]:
    return {text[i : i + k] for i in range(max(0, len(text) - k + 1))}


# ---------------------------------------------------------------------------
# SimHash (60-bit, word tokens weighted by occurrence count)


def simhash60(text: str) -> int | None:
    words = _words(text)
    if not words:
        return None
    v = [0] * 60
    for w in words:
        h = _md5_u60(w)
        for b in range(60):
            v[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(60):
        if v[b] > 0:
            out |= 1 << b
    return out


def simhash_batch(batch: pa.Table) -> pa.Table:
    doc_ids, hashes = [], []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        h = simhash60(text or "")
        if h is not None:
            doc_ids.append(doc_id)
            hashes.append(h)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "simhash": pa.array(hashes, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# MinHash + LSH


def minhash_signature(shingles: set[str], num_perm: int = 64) -> list[int]:
    """Deterministic one-hash-per-permutation via salted md5."""
    if not shingles:
        return [0] * num_perm
    sig = []
    for p in range(num_perm):
        salt = f"{p}:".encode()
        sig.append(
            min(
                int.from_bytes(
                    hashlib.md5(salt + s.encode("utf-8")).digest()[:8], "big"
                )
                for s in shingles
            )
        )
    return sig


def make_minhash_bands_fn(num_perm: int = 64, bands: int = 16, shingle_k: int = 5):
    rows_per_band = num_perm // bands

    def to_bands(batch: pa.Table) -> pa.Table:
        out = {"band_id": [], "band_hash": [], "doc_id": [], "sig": []}
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            shingles = _char_shingles(text or "", shingle_k)
            if not shingles:
                continue
            sig = minhash_signature(shingles, num_perm)
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                bh = hashlib.md5(
                    (",".join(map(str, chunk))).encode()
                ).hexdigest()[:16]
                out["band_id"].append(b)
                out["band_hash"].append(bh)
                out["doc_id"].append(doc_id)
                out["sig"].append(sig)
        return pa.table(
            {
                "band_id": pa.array(out["band_id"], pa.int32()),
                "band_hash": pa.array(out["band_hash"], pa.string()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "sig": pa.array(out["sig"], pa.list_(pa.int64())),
            }
        )

    return to_bands


def make_bucket_pairs_groupfn(max_bucket: int = 200, threshold: float = 0.5):
    """Per LSH bucket: emit candidate pairs with signature-estimated Jaccard.
    Buckets beyond ``max_bucket`` docs are truncated (logged via the
    ``truncated`` flag on emitted pairs) — a degenerate bucket would otherwise
    be quadratic."""
    import pandas as pd

    def pairs(group: pd.DataFrame) -> pa.Table:
        group = group.drop_duplicates("doc_id").sort_values("doc_id")
        truncated = len(group) > max_bucket
        group = group.head(max_bucket)
        ids = group["doc_id"].tolist()
        sigs = [np.asarray(s) for s in group["sig"]]
        out = {"doc_a": [], "doc_b": [], "est_jaccard": [], "truncated": []}
        for i, j in combinations(range(len(ids)), 2):
            est = float(np.mean(sigs[i] == sigs[j]))
            if est >= threshold:
                out["doc_a"].append(ids[i])
                out["doc_b"].append(ids[j])
                out["est_jaccard"].append(round(est, 4))
                out["truncated"].append(truncated)
        return pa.table(
            {
                "doc_a": pa.array(out["doc_a"], pa.int64()),
                "doc_b": pa.array(out["doc_b"], pa.int64()),
                "est_jaccard": pa.array(out["est_jaccard"], pa.float64()),
                "truncated": pa.array(out["truncated"], pa.bool_()),
            }
        )

    return pairs


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.5):
    """documents → near-duplicate candidate pairs (deduplicated across
    buckets, signature-estimated Jaccard ≥ threshold)."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    bands = ds.map_batches(
        make_minhash_bands_fn(), batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        make_bucket_pairs_groupfn(threshold=threshold), batch_format="pandas"
    )
    # a pair can surface from several bands — keep one row per pair
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Max("est_jaccard", alias_name="est_jaccard"),
        Min("truncated", alias_name="truncated"),
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (broadcast baseline; oracle for LSH)


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.8, k: int = 3):
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    table = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    all_ids = table.column("doc_id").to_pylist()
    all_sh = [_char_shingles(t or "", k) for t in table.column("text").to_pylist()]
    corpus_ref = ray.put((all_ids, all_sh))

    def score(batch: pa.Table) -> pa.Table:
        ids_all, sh_all = ray.get(corpus_ref)
        index = {d: i for i, d in enumerate(ids_all)}
        out = {"doc_a": [], "doc_b": [], "jaccard": []}
        for doc_id in batch.column("doc_id").to_pylist():
            i = index[doc_id]
            a = sh_all[i]
            if not a:
                continue
            for j in range(i + 1, len(ids_all)):
                b = sh_all[j]
                if not b:
                    continue
                inter = len(a & b)
                if not inter:
                    continue
                jac = inter / len(a | b)
                if jac >= threshold:
                    out["doc_a"].append(ids_all[i])
                    out["doc_b"].append(ids_all[j])
                    out["jaccard"].append(round(jac, 6))
        return pa.table(
            {
                "doc_a": pa.array(out["doc_a"], pa.int64()),
                "doc_b": pa.array(out["doc_b"], pa.int64()),
                "jaccard": pa.array(out["jaccard"], pa.float64()),
            }
        )

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# embedding cosine near-duplicates (broadcast baseline)


def embedding_near_dup_pairs(sf_dir: str, threshold: float = 0.45):
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    table = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.asarray(table.column("vec_id"))
    mat = np.array(table.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    unit = mat / np.where(norms == 0, 1.0, norms)[:, None]
    corpus_ref = ray.put((ids, unit))

    def score(batch: pa.Table) -> pa.Table:
        all_ids, all_unit = ray.get(corpus_ref)
        pos = {v: i for i, v in enumerate(all_ids.tolist())}
        out = {"id_a": [], "id_b": [], "sim": []}
        batch_ids = batch.column("vec_id").to_pylist()
        rows = np.array([all_unit[pos[v]] for v in batch_ids])
        sims = rows @ all_unit.T  # one matmul per batch
        for r, vid in enumerate(batch_ids):
            i = pos[vid]
            hits = np.nonzero(sims[r] >= threshold)[0]
            for j in hits:
                if all_ids[j] > vid:  # each unordered pair once
                    out["id_a"].append(vid)
                    out["id_b"].append(int(all_ids[j]))
                    out["sim"].append(round(float(sims[r][j]), 4))
        return pa.table(
            {
                "id_a": pa.array(out["id_a"], pa.int64()),
                "id_b": pa.array(out["id_b"], pa.int64()),
                "sim": pa.array(out["sim"], pa.float64()),
            }
        )

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id"])
    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
