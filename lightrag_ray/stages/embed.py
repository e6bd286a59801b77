"""Embedding stage (reference X4) + vector-search data plane (reference T2).

The reference wraps a provider embedding fn in ``EmbeddingFunc`` and batches
``embedding_batch_num=10`` texts per call at VDB flush
(lightrag/utils.py:540-677, lightrag/kg/nano_vector_db_impl.py:187,272-330).
Here embedding is an actor-pool ``map_batches`` stage over any table with a
``content`` column; the model is quarantined behind :class:`Embedder` with a
deterministic hash-projection default (no model in this environment).

VDB row construction mirrors the reference:
  entities:  id = "ent-"+md5(name),          content = f"{name}\\n{description}"
             (lightrag/operate.py:2580-2588)
  relations: id = "rel-"+md5(src+tgt sorted), content =
             f"{keywords}\\t{src}\\n{tgt}\\n{description}"
             (lightrag/operate.py:3188-3199)

``vector_topk`` is brute-force cosine with the reference's similarity
threshold (DEFAULT_COSINE_THRESHOLD=0.2, lightrag/constants.py:59) — the
baseline path; bucketed/IVF variants live with the dedup LSH machinery.
"""

from __future__ import annotations

import hashlib
from typing import Protocol

import numpy as np
import pyarrow as pa

from lightrag_ray.functions.text import compute_mdhash_id

DEFAULT_COSINE_THRESHOLD = 0.2


class Embedder(Protocol):
    dim: int

    def embed(self, texts: list[str]) -> np.ndarray: ...


class HashEmbedder:
    """Deterministic stand-in model: md5-seeded gaussian-ish projection.
    Stable across processes; unit-norm output."""

    def __init__(self, dim: int = 32):
        self.dim = dim

    def embed(self, texts: list[str]) -> np.ndarray:
        out = np.empty((len(texts), self.dim), dtype=np.float64)
        for i, text in enumerate(texts):
            h = hashlib.md5(text.encode("utf-8")).digest()
            rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
            v = rng.standard_normal(self.dim)
            out[i] = v / np.linalg.norm(v)
        return out


class EmbedStage:
    """Actor-pool stage: batches of rows with ``content`` → ``embedding``
    list<float64> column appended.  Model loads once per actor."""

    def __init__(self, embedder_factory=HashEmbedder):
        self.embedder = embedder_factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("content").to_pylist()
        vectors = self.embedder.embed([t or "" for t in texts])
        return batch.append_column(
            "embedding", pa.array(list(vectors), pa.list_(pa.float64()))
        )


def entity_vdb_rows(batch: pa.Table) -> pa.Table:
    names = batch.column("entity_id").to_pylist()
    descs = batch.column("description").to_pylist()
    return pa.table(
        {
            "vdb_id": pa.array(
                [compute_mdhash_id(str(n), prefix="ent-") for n in names]
            ),
            "entity_name": pa.array(names, pa.string()),
            "content": pa.array(
                [f"{n}\n{d}" for n, d in zip(names, descs)], pa.string()
            ),
        }
    )


def relation_vdb_rows(batch: pa.Table) -> pa.Table:
    srcs = batch.column("src_id").to_pylist()
    tgts = batch.column("tgt_id").to_pylist()
    descs = batch.column("description").to_pylist()
    kws = batch.column("keywords").to_pylist()
    ids, contents = [], []
    for s, t, d, kw in zip(srcs, tgts, descs, kws):
        a, b = (s, t) if s <= t else (t, s)
        ids.append(compute_mdhash_id(a + b, prefix="rel-"))
        contents.append(f"{','.join(kw)}\t{a}\n{b}\n{d}")
    return pa.table(
        {
            "vdb_id": pa.array(ids, pa.string()),
            "src_id": pa.array(srcs, pa.string()),
            "tgt_id": pa.array(tgts, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )


def embed_table(ds, concurrency=(1, 4), batch_size: int = 256,
                embedder_factory=HashEmbedder):
    return ds.map_batches(
        EmbedStage,
        fn_constructor_args=(embedder_factory,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def vector_topk(
    vdb_ds,
    query_text: str,
    k: int = 40,
    threshold: float = DEFAULT_COSINE_THRESHOLD,
    embedder_factory=HashEmbedder,
):
    """Brute-force cosine top-k over an embedded table (id/content rows).
    The query vector is broadcast once; each batch does one matmul."""
    import ray

    q = embedder_factory().embed([query_text])[0]
    q_ref = ray.put(q / np.linalg.norm(q))

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        mat = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        if mat.size == 0:
            return pa.table(
                {"vdb_id": pa.array([], pa.string()), "sim": pa.array([], pa.float64())}
            )
        norms = np.linalg.norm(mat, axis=1)
        sims = (mat @ qv) / np.where(norms == 0, 1.0, norms)
        keep = sims >= threshold
        return pa.table(
            {
                "vdb_id": pa.array(
                    np.asarray(batch.column("vdb_id"))[keep], pa.string()
                ),
                "sim": pa.array(np.round(sims[keep], 6), pa.float64()),
            }
        )

    return vdb_ds.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    ).sort(["sim", "vdb_id"], descending=[True, False]).limit(k)


def vector_topk_batch(
    vdb_ds,
    query_texts: list[str],
    k: int = 40,
    threshold: float = DEFAULT_COSINE_THRESHOLD,
    embedder_factory=HashEmbedder,
) -> list[list[dict]]:
    """Per-query cosine top-k for MANY queries in ONE Dataset execution —
    the batched sibling of :func:`vector_topk`, returning the identical
    (sim desc, vdb_id asc) rows per query.

    The normalized query MATRIX is broadcast once; each vdb batch does one
    (rows × queries) matmul and emits its LOCAL per-query top-k candidate
    rows (≤ n_queries × k per block — a combiner, so the driver merge sees
    blocks × n_queries × k skinny rows, never the table)."""
    import ray

    if not query_texts:
        return []
    q = embedder_factory().embed(list(query_texts))
    norms = np.linalg.norm(q, axis=1)
    q_ref = ray.put((q / np.where(norms == 0, 1.0, norms)[:, None]).T.copy())

    def score(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)  # (dim, n_q)
        mat = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        empty = pa.table(
            {
                "qi": pa.array([], pa.int32()),
                "vdb_id": pa.array([], pa.string()),
                "sim": pa.array([], pa.float64()),
            }
        )
        if mat.size == 0:
            return empty
        vnorms = np.linalg.norm(mat, axis=1)
        sims = (mat / np.where(vnorms == 0, 1.0, vnorms)[:, None]) @ qm  # (n, n_q)
        ids = np.asarray(batch.column("vdb_id"))
        out_qi, out_id, out_sim = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            keep = np.flatnonzero(col >= threshold)
            col_r = np.round(col[keep], 6)  # the emitted (compared) value
            if len(keep) > k:
                # local top-k cut under the GLOBAL total order
                # (rounded sim desc, vdb_id asc) so the driver merge sees
                # every global winner
                order = np.lexsort((ids[keep].astype(str), -col_r))[:k]
                keep, col_r = keep[order], col_r[order]
            out_qi.append(np.full(len(keep), qi, np.int32))
            out_id.append(ids[keep])
            out_sim.append(col_r)
        return pa.table(
            {
                "qi": pa.array(np.concatenate(out_qi), pa.int32()),
                "vdb_id": pa.array(np.concatenate(out_id), pa.string()),
                "sim": pa.array(np.concatenate(out_sim), pa.float64()),
            }
        )

    rows = vdb_ds.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    per_query: list[list[dict]] = [[] for _ in query_texts]
    for r in rows:
        per_query[r["qi"]].append(r)
    out = []
    for cand in per_query:
        cand.sort(key=lambda r: (-r["sim"], r["vdb_id"]))
        out.append(
            [{"vdb_id": r["vdb_id"], "sim": r["sim"]} for r in cand[:k]]
        )
    return out
