"""Checkpoint manifest and per-partition lineage records.

The reference tracks job state with a doc-status state machine plus
write-ahead candidate indexes (lightrag/base.py:888-942,
lightrag/operate.py:3398-3452).  The Ray-native equivalent is coarser and
simpler: every pipeline phase writes partitioned Parquet, and a tiny JSON
marker (atomic rename) per completed unit records its lineage row.  Resume =
skip units whose marker exists — an anti-join of input partitions against
completed lineage.  Partitions are deterministic and idempotent, so a re-run
of an unfinished unit simply overwrites its output directory.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass


@dataclass
class BuildPaths:
    root: str

    @property
    def pages_manifest(self) -> str:
        return os.path.join(self.root, "_manifest")

    def phase_dir(self, phase: str) -> str:
        return os.path.join(self.root, phase)

    def part_dir(self, phase: str, part: int) -> str:
        return os.path.join(self.root, phase, f"part={part:05d}")

    def marker(self, unit: str) -> str:
        return os.path.join(self.pages_manifest, f"{unit}.json")


def ensure_dirs(paths: BuildPaths) -> None:
    os.makedirs(paths.pages_manifest, exist_ok=True)


def is_done(paths: BuildPaths, unit: str) -> bool:
    return os.path.exists(paths.marker(unit))


def mark_done(paths: BuildPaths, unit: str, lineage: dict) -> None:
    marker = paths.marker(unit)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"unit": unit, "completed_at": time.time(), **lineage}, f)
    os.replace(tmp, marker)


def reset_unit(paths: BuildPaths, unit: str, out_dir: str) -> None:
    """Clear a possibly half-written unit before re-running it."""
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    if os.path.exists(paths.marker(unit)):
        os.remove(paths.marker(unit))


def clear_stale_markers(paths: BuildPaths, prefix: str, current_unit: str) -> None:
    """Drop markers for earlier versions of a unit (same prefix, different
    content digest) so lineage reflects only the live partition state."""
    manifest = paths.pages_manifest
    if not os.path.isdir(manifest):
        return
    for name in os.listdir(manifest):
        if (
            name.endswith(".json")
            and name.startswith(prefix)
            and name != f"{current_unit}.json"
        ):
            os.remove(os.path.join(manifest, name))


def lineage_rows(paths: BuildPaths) -> list[dict]:
    rows = []
    manifest = paths.pages_manifest
    if not os.path.isdir(manifest):
        return rows
    for name in sorted(os.listdir(manifest)):
        if name.endswith(".json"):
            with open(os.path.join(manifest, name)) as f:
                rows.append(json.load(f))
    return rows


def write_lineage_parquet(paths: BuildPaths) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = lineage_rows(paths)
    out = os.path.join(paths.root, "lineage.parquet")
    if rows:
        cols = sorted({k for r in rows for k in r})
        table = pa.table({c: [r.get(c) for r in rows] for c in cols})
        pq.write_table(table, out)
    return out


def build_status(root: str) -> dict:
    """Summarize a build directory from its manifest — the introspection
    surface the reference exposes as pipeline_status/doc_status."""
    paths = BuildPaths(root=root)
    rows = lineage_rows(paths)
    by_phase: dict[str, dict] = {}
    for r in rows:
        phase = r.get("phase", "unknown")
        agg = by_phase.setdefault(
            phase, {"units": 0, "rows_out": 0, "wall_s": 0.0}
        )
        agg["units"] += 1
        agg["rows_out"] += int(r.get("n_rows_out") or 0)
        agg["wall_s"] = round(agg["wall_s"] + float(r.get("wall_s") or 0.0), 3)
    return {
        "root": root,
        "completed_units": len(rows),
        "phases": by_phase,
    }


def parquet_row_count(directory: str) -> int:
    import glob

    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(directory, "**", "*.parquet"), recursive=True)
    )


def parquet_column_range(directory: str, column: str) -> tuple[str | None, str | None]:
    """min/max of a column from Parquet row-group statistics (no data read)."""
    import glob

    import pyarrow.parquet as pq

    lo = hi = None
    for f in glob.glob(os.path.join(directory, "**", "*.parquet"), recursive=True):
        md = pq.read_metadata(f)
        try:
            idx = md.schema.names.index(column)
        except ValueError:
            continue
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            if stats is None or not stats.has_min_max:
                continue
            lo = stats.min if lo is None else min(lo, stats.min)
            hi = stats.max if hi is None else max(hi, stats.max)
    return lo, hi
