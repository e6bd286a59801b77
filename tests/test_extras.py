"""Extras operators: oracle comparisons + LSH recall against exact Jaccard."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from lightrag_ray.extras import catalog as C
from lightrag_ray.extras.dedup import minhash_signature, simhash60, _char_shingles
from lightrag_ray.extras.multimodal import DeterministicFakeDecoder, RealDecoder
from lightrag_ray.extras.textstats import predict_lang

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(C.oracle_sql()))
def test_extras_oracle(ray_session, con, name):
    ours = _normalize(C.queries()[name](SF_DIR).to_pandas())
    oracle = _normalize(con.execute(C.oracle_sql()[name]).fetchdf())
    assert len(ours) == len(oracle), name
    pd.testing.assert_frame_equal(ours, oracle, check_dtype=False)


def test_minhash_estimates_jaccard():
    ta = "the quick brown fox jumps over the lazy dog"
    tb = "the quick brown fox jumped over a lazy dog"
    a = {ta[i : i + 3] for i in range(len(ta) - 2)}
    b = {tb[i : i + 3] for i in range(len(tb) - 2)}
    true_j = len(a & b) / len(a | b)
    sa = minhash_signature(ta, 128, k=3)
    sb = minhash_signature(tb, 128, k=3)
    est = float((sa == sb).mean())
    assert abs(est - true_j) < 0.15


def test_minhash_lsh_finds_exact_duplicates(ray_session):
    """every exact-duplicate text pair must surface from LSH with est≈1."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    by_text: dict[str, list[int]] = {}
    for d, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        if x and x.strip():
            by_text.setdefault(x, []).append(d)
    expected = set()
    for ids in by_text.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                expected.add((ids[i], ids[j]))
    got = C.q_minhash_lsh(SF_DIR).to_pandas()
    found = set(zip(got["doc_a"], got["doc_b"]))
    missing = expected - found
    assert not missing, f"LSH missed exact duplicates: {sorted(missing)[:5]}"
    perfect = got[got["est_jaccard"] >= 0.999]
    assert expected <= set(zip(perfect["doc_a"], perfect["doc_b"]))


def test_simhash_properties():
    h1 = simhash60("alpha beta gamma delta")
    h2 = simhash60("alpha beta gamma delta")
    h3 = simhash60("totally different words here")
    assert h1 == h2
    assert h1 != h3
    assert simhash60("") is None
    assert 0 <= h1 < (1 << 60)


def test_langid_heuristic():
    assert predict_lang("the cat is on the mat and it is warm")[0] == "en"
    assert predict_lang("der Hund ist nicht mit der Katze")[0] == "de"
    assert predict_lang("中文文本测试")[0] == "zh"
    assert predict_lang("")[0] == "und"


def test_multimodal_decoders():
    fake = DeterministicFakeDecoder()
    f = fake.features(b"payload", "image")
    assert len(f) == 8 and f == fake.features(b"payload", "image")
    with pytest.raises(NotImplementedError):
        RealDecoder().features(b"x", "image")


def test_embedding_lsh_recall_vs_exact(ray_session):
    """Random-hyperplane LSH must recover the exact-cosine oracle's pairs at
    test scale (deterministic planes ⇒ deterministic recall), with no
    false positives below threshold."""
    from lightrag_ray.extras.dedup import (
        embedding_lsh_pairs,
        embedding_near_dup_pairs,
    )

    exact = embedding_near_dup_pairs(SF_DIR, threshold=0.45).to_pandas()
    lsh = embedding_lsh_pairs(SF_DIR, threshold=0.45).to_pandas()
    exact_pairs = set(zip(exact["id_a"], exact["id_b"]))
    lsh_pairs = set(zip(lsh["id_a"], lsh["id_b"]))
    assert exact_pairs == lsh_pairs  # recall 1.0 at this scale, no extras
    assert (lsh["sim"] >= 0.45).all()


def test_knn_lsh_recall_vs_brute_force(ray_session):
    """LSH-pruned top-k vs the exact broadcast matmul: deterministic planes
    ⇒ deterministic recall; head of the ranking must agree exactly."""
    from lightrag_ray.extras.dedup import knn_lsh_topk
    from lightrag_ray.pipelines.queries import q_knn_top10

    brute = [(r["vec_id"], r["sim"]) for r in q_knn_top10(SF_DIR).take_all()]
    lsh = [(r["vec_id"], r["sim"]) for r in knn_lsh_topk(SF_DIR).take_all()]
    assert lsh[:5] == brute[:5]  # top of the ranking exact
    recall = len({v for v, _ in brute} & {v for v, _ in lsh}) / len(brute)
    assert recall >= 0.8
