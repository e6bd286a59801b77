"""Track-id / per-document status derived from build manifests
(reference lightrag.py:6247-6258, base.py:888-905, utils.py:5925-5936)."""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.parquet as pq


def _write_pages(pages_dir, n=12, files=3):
    from lightrag_ray.sources.pages import PAGES_SCHEMA

    pages_dir.mkdir()
    paths = []
    per = n // files
    for f in range(files):
        rows = range(f * per, (f + 1) * per)
        table = pa.table(
            {
                "url": [f"https://t.example.org/doc/{i}" for i in rows],
                "warc_ts": pa.array(
                    [1_000_000 + i for i in rows], pa.timestamp("us")
                ),
                "html": [f"<p>alpha{i:05d} beta{i:05d}</p>".encode() for i in rows],
                "text": [f"alpha{i:05d} beta{i:05d}" for i in rows],
                "lang": ["en"] * per,
            },
            schema=PAGES_SCHEMA,
        )
        p = pages_dir / f"part-{f}.parquet"
        pq.write_table(table, p)
        paths.append(str(p))
    return paths


def test_generate_track_id_format():
    from lightrag_ray.state.doc_status import generate_track_id

    tid = generate_track_id("insert")
    assert re.fullmatch(r"insert_\d{8}_\d{6}_[0-9a-f]{8}", tid)


def test_docs_by_track_id_processed_and_pending(ray_session, tmp_path):
    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.pipelines.kg_build import build_kg
    from lightrag_ray.state import doc_status as DS
    from lightrag_ray.state.checkpoint import BuildPaths

    files = _write_pages(tmp_path / "pages")
    out = str(tmp_path / "build")
    res = build_kg(files, out, PipelineConfig(), num_partitions=2)
    assert res.track_id and res.track_id.startswith("insert_")

    # all docs processed after a completed build
    rows = DS.docs_by_track_id(out, res.track_id).take_all()
    assert len(rows) == 12
    assert {r["status"] for r in rows} == {DS.PROCESSED}
    assert {r["track_id"] for r in rows} == {res.track_id}

    summary = DS.track_status(out, res.track_id)
    assert summary["docs_by_status"] == {DS.PROCESSED: 12}

    # deleting a unit marker demotes ONLY that partition's docs:
    # output dir still exists -> "processing" (mid-flight / died; resume
    # re-runs it)
    paths = BuildPaths(root=out)
    record = DS.list_tracks(out)[0]
    victim = record["partitions"][0]
    import os

    os.remove(paths.marker(victim["unit"]))
    summary2 = DS.track_status(out, res.track_id)
    assert summary2["docs_by_status"][DS.PROCESSING] == victim_docs(victim)
    assert (
        summary2["docs_by_status"][DS.PROCESSING]
        + summary2["docs_by_status"][DS.PROCESSED]
        == 12
    )
    by_part = {
        p["partition_id"]: p["status"] for p in summary2["partitions"]
    }
    assert by_part[victim["partition_id"]] == DS.PROCESSING

    # two tracks coexist: a second build into the same dir gets its own id
    res2 = build_kg(files, out, PipelineConfig(), num_partitions=2)
    assert res2.track_id != res.track_id
    assert {t["track_id"] for t in DS.list_tracks(out)} == {
        res.track_id,
        res2.track_id,
    }


def victim_docs(part: dict) -> int:
    return sum(pq.read_metadata(p).num_rows for p in part["files"])
