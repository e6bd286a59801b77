"""Track-id / per-document status: the ops surface over build manifests.

The reference tags every insert operation with a ``track_id``
(lightrag/utils.py:5925-5936) and answers ``aget_docs_by_track_id``
(lightrag/lightrag.py:6247-6258) from a DocStatus state machine
(lightrag/base.py:888-905: pending → processing → processed | failed).

Here a build's unit markers ARE the state machine, so per-doc status is
DERIVED, never stored: a document's partition is *processed* when its
mentions unit marker exists, *processing* when the partition's output
directory exists without a marker (a run is mid-flight or died — resume
re-runs it), and *pending* otherwise.  ``build_kg`` writes one small
``track-<id>.json`` per invocation recording the partition → files map;
``doc_status`` streams the pages urls (column-pruned read) and attaches the
per-partition status via a tiny broadcast dict — per-doc status for a
billion-page corpus is a Dataset, not a driver-side table.
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid

import pyarrow as pa

from lightrag_ray.state.checkpoint import BuildPaths, is_done

# reference DocStatus values (lightrag/base.py:894-905); the phases this
# engine cannot observe (parsing/analyzing) never occur
PENDING = "pending"
PROCESSING = "processing"
PROCESSED = "processed"
FAILED = "failed"


def generate_track_id(prefix: str = "upload") -> str:
    """``{prefix}_{timestamp}_{uuid8}`` — format parity with
    lightrag/utils.py:5925-5936."""
    timestamp = time.strftime("%Y%m%d_%H%M%S")
    return f"{prefix}_{timestamp}_{uuid.uuid4().hex[:8]}"


def _track_path(paths: BuildPaths, track_id: str) -> str:
    return os.path.join(paths.pages_manifest, f"track-{track_id}.json")


def record_track(
    paths: BuildPaths,
    track_id: str,
    parts: list[list[str]],
    digests: list[str],
) -> None:
    """Persist the invocation's partition → files map (atomic rename)."""
    payload = {
        "track_id": track_id,
        "created_at": time.time(),
        "partitions": [
            {
                "partition_id": k,
                "unit": f"mentions-part-{k:05d}-{digests[k]}",
                "files": files,
            }
            for k, files in enumerate(parts)
            if files
        ],
    }
    target = _track_path(paths, track_id)
    tmp = target + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, target)


def list_tracks(root: str) -> list[dict]:
    """All track records of a build directory, newest first."""
    paths = BuildPaths(root=root)
    records = []
    for f in glob.glob(os.path.join(paths.pages_manifest, "track-*.json")):
        with open(f) as fh:
            records.append(json.load(fh))
    return sorted(records, key=lambda r: r["created_at"], reverse=True)


def _partition_status(paths: BuildPaths, part: dict) -> str:
    if is_done(paths, part["unit"]):
        return PROCESSED
    out_dir = paths.part_dir("mentions", part["partition_id"])
    return PROCESSING if os.path.exists(out_dir) else PENDING


def track_status(root: str, track_id: str) -> dict:
    """Small summary for one track: per-partition status + doc counts from
    Parquet metadata (no data read) — the reference's
    ``aget_track_status`` shape."""
    import pyarrow.parquet as pq

    paths = BuildPaths(root=root)
    with open(_track_path(paths, track_id)) as f:
        record = json.load(f)
    by_status: dict[str, int] = {}
    partitions = []
    for part in record["partitions"]:
        status = _partition_status(paths, part)
        n_docs = sum(pq.read_metadata(p).num_rows for p in part["files"])
        by_status[status] = by_status.get(status, 0) + n_docs
        partitions.append(
            {"partition_id": part["partition_id"], "status": status,
             "n_docs": n_docs}
        )
    return {
        "track_id": track_id,
        "created_at": record["created_at"],
        "docs_by_status": by_status,
        "partitions": partitions,
    }


def docs_by_track_id(root: str, track_id: str):
    """Per-document status rows for one insert operation, as a streaming
    Dataset (url, partition_id, status, track_id).  The pages read is pruned
    to the url column; the file → (partition, status) map is tiny and rides
    inside the read tasks."""
    import ray.data as rd

    paths = BuildPaths(root=root)
    with open(_track_path(paths, track_id)) as f:
        record = json.load(f)

    datasets = []
    for part in record["partitions"]:
        status = _partition_status(paths, part)
        pid = part["partition_id"]

        def tag(batch: pa.Table, status=status, pid=pid) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "url": batch.column("url"),
                    "partition_id": pa.array([pid] * n, pa.int32()),
                    "status": pa.array([status] * n, pa.string()),
                    "track_id": pa.array([track_id] * n, pa.string()),
                }
            )

        datasets.append(
            rd.read_parquet(part["files"], columns=["url"]).map_batches(
                tag, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    if not datasets:
        schema = pa.schema(
            [
                ("url", pa.string()),
                ("partition_id", pa.int32()),
                ("status", pa.string()),
                ("track_id", pa.string()),
            ]
        )
        return rd.from_arrow(schema.empty_table())
    ds = datasets[0]
    return ds.union(*datasets[1:]) if len(datasets) > 1 else ds
