"""Run every SQL-checked query against its DuckDB oracle at sf0.001 — the
same comparison the driver performs (row counts + order-insensitive values)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from lightrag_ray.pipelines import queries as Q

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        else:
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError):
                pass
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(Q.oracle_sql()))
def test_query_matches_oracle(ray_session, con, name):
    ours = Q.queries()[name](SF_DIR)
    ours_df = _normalize(ours.to_pandas())
    oracle_df = _normalize(con.execute(Q.oracle_sql()[name]).fetchdf())
    assert list(ours_df.columns) == list(oracle_df.columns), name
    assert len(ours_df) == len(oracle_df), name
    pd.testing.assert_frame_equal(ours_df, oracle_df, check_dtype=False)


@pytest.mark.parametrize("name", ["kg_build_nodes_1c", "kg_build_edges_1c"])
def test_full_build_matches_oracle(ray_session, con, name):
    """The COMPLETE build (pages synth → chunk → extract → canonicalize →
    endpoints) hash-checked against a closed-form oracle on the single-chunk
    corpus (round-1 VERDICT #6)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    ours_df = _normalize(E.queries()[name](SF_DIR).to_pandas())
    oracle_df = _normalize(con.execute(E.oracle_sql()[name]).fetchdf())
    assert list(ours_df.columns) == list(oracle_df.columns), name
    assert len(ours_df) == len(oracle_df), name
    pd.testing.assert_frame_equal(ours_df, oracle_df, check_dtype=False)


def test_entity_aliases_and_resolution_crafted(ray_session, tmp_path):
    """The alias surface is inert on the synthetic vocabulary (no one-edit
    pairs exist — why entity_aliases is API-only in the driver catalog);
    pin the blocked pair kernel and the CC resolution on a crafted corpus
    where aliases DO exist, against the same DuckDB oracle SQL."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "tables tabled market stream",
                    "market marked stream window",
                    "window stream tabled market",
                ],
                pa.string(),
            ),
        }
    )
    sf = str(tmp_path)
    pq.write_table(docs, os.path.join(sf, "documents.parquet"))

    pairs = _normalize(Q.q_entity_aliases(sf).to_pandas())
    assert pairs.values.tolist() == [
        ["marked", "market"],
        ["tabled", "tables"],
    ]

    res = _normalize(Q.q_entity_resolution(sf).to_pandas())
    got = dict(zip(res["entity_name"], res["canonical_name"]))
    assert got == {
        "tables": "tabled",
        "tabled": "tabled",
        "market": "marked",
        "marked": "marked",
        "stream": "stream",
        "window": "window",
    }

    # same comparison the driver performs, on the crafted corpus
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    oracle_pairs = _normalize(c.execute(Q.SQL_ENTITY_ALIASES).fetchdf())
    assert pairs.values.tolist() == oracle_pairs.values.tolist()
    oracle_res = _normalize(c.execute(Q.SQL_ENTITY_RESOLUTION).fetchdf())
    assert res.values.tolist() == oracle_res.values.tolist()
