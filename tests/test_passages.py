"""Passage-level exact-substring dedup kernels (extras/passages.py).

The full-query ↔ DuckDB oracle comparison runs through tests/test_extras.py's
parametrization over catalog.oracle_sql(); here we pin the kernels on
crafted inputs where the expected windows/flags are known by hand."""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

from lightrag_ray.extras import passages as P


def _doc_table(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def test_emit_grams_windows_and_tail():
    # 17 tokens → 2 full 8-token windows, 1-token tail ignored
    text = " ".join(f"w{i}" for i in range(17))
    out = emitted = P.emit_grams(_doc_table([(7, text)]))
    assert emitted.num_rows == 2
    assert out.column("gpos").to_pylist() == [0, 1]
    assert out.column("doc_id").to_pylist() == [7, 7]
    # fingerprint is the md5 of the exact window text
    w0 = " ".join(f"w{i}" for i in range(8))
    d = hashlib.md5(w0.encode()).digest()
    assert out.column("g1")[0].as_py() == int.from_bytes(
        d[:8], "little", signed=True
    )


def test_emit_grams_short_empty_and_multispace():
    out = P.emit_grams(
        _doc_table([(1, "only three tokens"), (2, ""), (3, None)])
    )
    assert out.num_rows == 0
    # split(' ') keeps empty tokens: 8 spaces → 9 empty tokens → 1 window
    out = P.emit_grams(_doc_table([(4, " " * 8)]))
    assert out.num_rows == 1


def test_first_keep_rule_across_and_within_docs(ray_session):
    import ray.data as rd

    shared = " ".join(f"s{i}" for i in range(8))
    uniq = lambda tag: " ".join(f"{tag}{i}" for i in range(8))
    docs = _doc_table(
        [
            # doc 1: shared at gpos 0 AND gpos 1 (within-doc repeat)
            (1, shared + " " + shared),
            # doc 2: unique window then shared → its shared copy is removed
            (2, uniq("b") + " " + shared),
            # doc 3: all unique
            (3, uniq("c") + " " + uniq("d")),
        ]
    )
    res = (
        P.passage_dup_stats_ds(rd.from_arrow(docs))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 1 holds the global first occurrence (doc 1, gpos 0); its second
    # copy and doc 2's copy are removed
    assert res.loc[1].tolist() == [2, 2, 1]
    assert res.loc[2].tolist() == [2, 1, 1]
    assert res.loc[3].tolist() == [2, 0, 0]


def test_gate_boundary_integer_cross_multiplication(ray_session):
    import ray.data as rd

    import lightrag_ray.extras.passages as mod

    shared = " ".join(f"s{i}" for i in range(8))
    fill = lambda tag, k: " ".join(
        " ".join(f"{tag}{j}_{i}" for i in range(8)) for j in range(k)
    )
    docs = _doc_table(
        [
            (1, shared),  # first occurrence — 0 removed, kept
            # doc 2: 5 windows, 1 removed → exactly 1/5, boundary KEPT
            (2, shared + " " + fill("b", 4)),
            # doc 3: 4 windows, 1 removed → 1/4 > 1/5, dropped
            (3, shared + " " + fill("c", 3)),
        ]
    )
    stats = mod.passage_dup_stats_ds(rd.from_arrow(docs)).to_pandas()
    kept = stats[
        stats["n_removed"] * mod._KEEP_DEN
        <= stats["n_grams"] * mod._KEEP_NUM
    ]
    assert sorted(kept["doc_id"]) == [1, 2]
