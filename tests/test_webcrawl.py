"""Unit tests for the crawl-side operators (extras/webcrawl.py).

DuckDB parity for all four ops runs automatically via tests/test_extras.py's
parametrization over catalog.oracle_sql(); here we pin the kernels on
crafted inputs where the expected values are hand-computable — the URL
canonicalizer contract, latest-wins dedup semantics, the BM25 closed form
on a two-document corpus, and decontamination overlap counting including
the broadcast guard.
"""

from __future__ import annotations

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lightrag_ray.extras import webcrawl as W


def _write_docs(tmp_path, rows):
    """rows: list of (doc_id, text)."""
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_canonicalize_urls_contract():
    got = W.canonicalize_urls(
        pa.array(
            [
                "https://WWW.Site1.Example.com/a/3?utm_source=feed&sess=9#sec2",
                "https://site1.example.com/a/3",
                "HTTPS://EXAMPLE.ORG/Path#frag",
                "https://www.example.org/p?utm_medium=x",
                # a non-tracking query survives; only ?utm_... is stripped
                "https://example.net/p?q=1",
            ]
        )
    ).to_pylist()
    assert got == [
        "https://site1.example.com/a/3",
        "https://site1.example.com/a/3",
        "https://example.org/path",
        "https://example.org/p",
        "https://example.net/p?q=1",
    ]


def test_url_dedup_latest_wins(ray_session, tmp_path):
    # doc_ids 3 and 353 differ by 350 = lcm(7, 50): same canonical page.
    # 353 has the greater warc_ts (monotone in doc_id) and must win.
    sf = _write_docs(tmp_path, [(3, "a"), (353, "b"), (4, "c")])
    out = W.q_url_dedup(sf).to_pandas().set_index("canonical_url")
    assert len(out) == 2
    merged = out.loc["https://site3.example.com/a/3"]
    assert merged["doc_id"] == 353
    assert merged["warc_ts"] == W._TS_EPOCH + 353 * 7
    assert merged["n_fetches"] == 2
    solo = out.loc["https://site4.example.com/a/4"]
    assert solo["n_fetches"] == 1 and solo["doc_id"] == 4


def test_host_stats_composition(ray_session, tmp_path):
    # hosts are site{doc_id % 7}: 3 and 353 share site3; 10 is site3 too
    # (10 % 7 = 3) but a different page (10 % 50 = 10).
    sf = _write_docs(tmp_path, [(3, "a"), (353, "b"), (10, "c"), (4, "d")])
    out = W.q_host_stats(sf).to_pandas().set_index("host")
    s3 = out.loc["site3.example.com"]
    assert s3["n_pages"] == 2 and s3["n_fetches"] == 3
    assert s3["last_ts"] == W._TS_EPOCH + 353 * 7
    assert out.loc["site4.example.com"]["n_pages"] == 1


def test_bm25_closed_form(ray_session, tmp_path):
    # two docs, query term 'key' appears once in doc 0 (dl=2) and never in
    # doc 1 (dl=4): N=2, df=1, avgdl=3.
    sf = _write_docs(tmp_path, [(0, "key fox"), (1, "dog cat owl emu")])
    out = (
        W.q_bm25_topk(sf, k=2, terms=("key",))
        .to_pandas()
        .set_index("doc_id")["score"]
    )
    idf = math.log((2 - 1 + 0.5) / (1 + 0.5) + 1.0)
    tf, dl, avgdl = 1.0, 2.0, 3.0
    want = idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl)))
    assert out[0] == pytest.approx(round(want, 4), abs=1e-9)
    assert out[1] == 0.0


def test_bm25_tf_table_is_reused(ray_session, tmp_path):
    sf = _write_docs(tmp_path, [(0, "key fox"), (1, "dog cat")])
    d1 = W._bm25_build_tf(sf, ("key",))
    marker = os.path.join(d1, "_BM25_TF.json")
    mtime = os.path.getmtime(marker)
    d2 = W._bm25_build_tf(sf, ("key",))
    assert d1 == d2 and os.path.getmtime(marker) == mtime


def test_decontam_overlap_counting(ray_session, tmp_path):
    # doc_id 1 is an eval doc (md5(1) % 20 == 0); doc 0 shares its 8-gram,
    # doc 2 does not. 9 tokens shared across a window of 8 → 2 shared
    # distinct 8-grams in doc 0.
    shared = "a b c d e f g h i"
    sf = _write_docs(
        tmp_path,
        [
            (1, shared + " tail words here"),
            (0, "prefix " + shared),
            (2, "x y z " * 5),
        ],
    )
    out = W.q_decontam(sf).to_pandas().set_index("doc_id")
    assert 1 not in out.index  # eval docs are excluded from the output
    assert out.loc[0, "n_eval_grams"] == 2
    assert out.loc[0, "contaminated"] == 1
    assert out.loc[2, "n_eval_grams"] == 0
    assert out.loc[2, "contaminated"] == 0


def test_decontam_broadcast_guard(ray_session, tmp_path, monkeypatch):
    sf = _write_docs(tmp_path, [(1, " ".join(f"w{i}" for i in range(40)))])
    monkeypatch.setattr(W, "MAX_BROADCAST_GRAMS", 5)
    with pytest.raises(ValueError, match="refusing to broadcast"):
        W.q_decontam(sf)


def test_cdc_classify_kernel():
    import pandas as pd

    # two canonical urls: u changes then repeats, v has one fetch
    df = pd.DataFrame(
        {
            "canonical_url": ["u", "u", "u", "v"],
            "warc_ts": [10, 20, 30, 10],
            "doc_id": [1, 2, 3, 4],
            "sig": [5, 6, 6, 9],
        }
    )
    out = (
        W.classify_fetch_history(df)
        .to_pandas()
        .set_index("doc_id")["status"]
    )
    assert out.loc[1] == "new"
    assert out.loc[2] == "changed"
    assert out.loc[3] == "unchanged"
    assert out.loc[4] == "new"


def test_cdc_ts_tiebreak_by_doc_id():
    import pandas as pd

    # equal warc_ts: order falls back to doc_id, so doc 2 is the successor
    df = pd.DataFrame(
        {
            "canonical_url": ["u", "u"],
            "warc_ts": [10, 10],
            "doc_id": [2, 1],
            "sig": [7, 7],
        }
    )
    out = (
        W.classify_fetch_history(df)
        .to_pandas()
        .set_index("doc_id")["status"]
    )
    assert out.loc[1] == "new" and out.loc[2] == "unchanged"
