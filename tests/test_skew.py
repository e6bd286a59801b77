"""Skew-handling properties of the salted bucketed merge (pure-function
checks on the production stage bodies — no Ray session needed)."""

from __future__ import annotations

from lightrag_ray.stages.merge import _loads

import pyarrow as pa

from lightrag_ray.config import PipelineConfig
from lightrag_ray.stages.extract import MENTIONS_SCHEMA
from lightrag_ray.stages.merge import (
    make_bucket_merge_groupfn,
    make_entity_partials_fn,
)


def _hot_mentions(n_chunks: int) -> list[dict]:
    """Every chunk mentions the same planet-hot entity."""
    rows = []
    for c in range(n_chunks):
        rows.append(
            dict(
                kind="e", name="United States", tgt="", entity_type="location",
                description=f"desc {c}", keywords="", weight=0.0,
                source_id=f"doc-{c:06d}-chunk-000",
                file_path=f"https://x/{c:06d}", timestamp=1 + c,
                chunk_order=0, rec_index=0,
            )
        )
    return rows


def test_hot_key_partials_spread_over_salt_buckets():
    cfg = PipelineConfig(salt_buckets=16, reduce_buckets=64)
    fn = make_entity_partials_fn(cfg)
    rows = _hot_mentions(2000)
    salts = set()
    buckets = set()
    for i in range(0, len(rows), 100):  # 20 batches
        out = fn(pa.Table.from_pylist(rows[i : i + 100], schema=MENTIONS_SCHEMA))
        salts.update(out.column("salt").to_pylist())
        buckets.update(out.column("b1").to_pylist())
    # one hot key fans its partials across many salts → many reducers
    assert len(salts) >= 8, salts
    assert len(buckets) >= 8, buckets


def test_partial_rows_bounded_by_source_cap():
    """In KEEP mode a partial never carries rows beyond its source cap —
    the property that bounds reducer input for arbitrarily hot keys."""
    cfg = PipelineConfig(max_source_ids_per_entity=50)
    fn = make_entity_partials_fn(cfg)
    out = fn(pa.Table.from_pylist(_hot_mentions(5000), schema=MENTIONS_SCHEMA))
    assert out.num_rows == 1
    blob = _loads(out.column("blob")[0].as_py())
    # sources no longer ship on the wire (re-derived from rows); the row
    # cap is the bounding property (blobs are columnar: cols[4] = sids)
    assert len(blob["cols"][4]) == 50  # one row per surviving source here
    assert len(set(blob["cols"][4])) == 50
    assert blob["src_truncated"] is True
    assert blob["n_mentions"] == 5000


def test_stage1_merge_stays_bounded():
    """Merging many capped partials of one hot (key, salt) yields one capped
    partial — reducer output is O(cap), not O(mentions)."""
    cfg = PipelineConfig(max_source_ids_per_entity=50, salt_buckets=1)
    fn = make_entity_partials_fn(cfg)
    import pandas as pd

    partial_tables = [
        fn(pa.Table.from_pylist(_hot_mentions(5000)[i : i + 500],
                                schema=MENTIONS_SCHEMA))
        for i in range(0, 5000, 500)
    ]
    df = pa.concat_tables(partial_tables).to_pandas()
    merged = make_bucket_merge_groupfn(cfg, "e")(df)
    assert merged.num_rows == 1
    blob = _loads(merged.column("blob")[0].as_py())
    assert len(blob["cols"][4]) == 50
    assert len(set(blob["cols"][4])) == 50
    assert blob["n_mentions"] == 5000
