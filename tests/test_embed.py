"""Embedding stage + vector top-k."""

from __future__ import annotations

import numpy as np
import pytest

from lightrag_ray.stages.embed import (
    HashEmbedder,
    embed_table,
    entity_vdb_rows,
    relation_vdb_rows,
    vector_topk,
)


def test_hash_embedder_deterministic_unit_norm():
    e = HashEmbedder(dim=16)
    v1 = e.embed(["hello", "world"])
    v2 = e.embed(["hello", "world"])
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_allclose(np.linalg.norm(v1, axis=1), 1.0, rtol=1e-9)
    assert not np.allclose(v1[0], v1[1])


def test_vdb_row_construction(ref):
    import pyarrow as pa

    nodes = pa.table(
        {
            "entity_id": ["Beta", "Alpha"],
            "description": ["beta desc", "alpha desc"],
        }
    )
    rows = entity_vdb_rows(nodes).to_pylist()
    assert rows[0]["vdb_id"] == ref.utils.compute_mdhash_id("Beta", prefix="ent-")
    assert rows[0]["content"] == "Beta\nbeta desc"

    edges = pa.table(
        {
            "src_id": ["zeta"],
            "tgt_id": ["alpha"],
            "description": ["d"],
            "keywords": [["k1", "k2"]],
        }
    )
    erows = relation_vdb_rows(edges).to_pylist()
    # sorted pair: alpha+zeta
    assert erows[0]["vdb_id"] == ref.utils.compute_mdhash_id(
        "alphazeta", prefix="rel-"
    )
    assert erows[0]["content"] == "k1,k2\talpha\nzeta\nd"


def test_embed_and_topk(ray_session):
    import ray.data as rd

    rows = [{"vdb_id": f"ent-{i}", "content": f"entity number {i}"} for i in range(50)]
    rows.append({"vdb_id": "ent-q", "content": "the query text itself"})
    ds = rd.from_items(rows)
    embedded = embed_table(ds, concurrency=2, batch_size=16)
    top = vector_topk(embedded, "the query text itself", k=5, threshold=-1.0)
    got = top.to_pandas()
    assert got.iloc[0]["vdb_id"] == "ent-q"  # exact content match ranks first
    assert got.iloc[0]["sim"] == pytest.approx(1.0)
    assert len(got) == 5
    assert got["sim"].is_monotonic_decreasing
