"""Driver-shaped correctness sweep: run every __ray_entry__.queries() entry
and compare to its oracle_sql() with the driver's comparison (row count,
sorted-column schema, order-insensitive value hash) at a chosen sf dir.

Usage: python tools/sweep.py [sf_dir] [name_filter ...]
Prints one line per query and a JSON summary; exit 1 on any failure.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
            # an engine-side int64 column often arrives float64 from DuckDB
            # (sum() promotes); render integral floats as ints so the two
            # sides hash identically
            v = df[c]
            if v.notna().all() and (v % 1 == 0).all() and (v.abs() < 2**62).all():
                df[c] = v.astype("int64")
        else:
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError):
                pass
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _hash(df) -> str:
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.6f").encode()
    ).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    results, n_fail = {}, 0
    for name in qs:
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        row: dict = {}
        try:
            res = qs[name](sf_dir)
            ours = res if hasattr(res, "columns") else res.to_pandas()
            if not hasattr(ours, "sort_values"):
                ours = ours.to_pandas()
            if name in oracles:
                oracle = con.execute(oracles[name]).fetchdf()
                a, b = _normalize(ours), _normalize(oracle)
                row = {
                    "rows_match": len(a) == len(b),
                    "schema_match": list(a.columns) == list(b.columns),
                    "hash_match": _hash(a) == _hash(b),
                    "rows": len(a),
                    "oracle_rows": len(b),
                }
                ok = row["rows_match"] and row["schema_match"] and row["hash_match"]
            else:
                row = {"rows": len(ours), "rows_only": True}
                ok = True
        except Exception as exc:  # noqa: BLE001
            row, ok = {"err": f"{type(exc).__name__}: {exc}"}, False
        row["sec"] = round(time.perf_counter() - t0, 2)
        results[name] = row
        n_fail += 0 if ok else 1
        print(f"{'OK ' if ok else 'FAIL'} {name:32s} {json.dumps(row)}", flush=True)

    print(json.dumps({"sf_dir": sf_dir, "n": len(results), "fail": n_fail}))
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
