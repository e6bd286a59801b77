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


def _as_pandas(res) -> pd.DataFrame:
    # queries() may return a Dataset, a pyarrow.Table, or a pandas frame
    # (the driver contract) — mirror tools/sweep.py's tolerant conversion
    ours = res if hasattr(res, "columns") else res.to_pandas()
    if not hasattr(ours, "sort_values"):
        ours = ours.to_pandas()
    return ours


@pytest.mark.parametrize("name", sorted(C.oracle_sql()))
def test_extras_oracle(ray_session, con, name):
    ours = _normalize(_as_pandas(C.queries()[name](SF_DIR)))
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


def _make_wav(samples, rate=8000, n_ch=1):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def _make_bmp(pixels_rgb, w, h):
    """Minimal uncompressed 24-bit BMP (bottom-up rows, BGR, padded)."""
    import struct

    row_stride = (w * 3 + 3) & ~3
    data = bytearray()
    for r in range(h):
        row = bytearray()
        for c in range(w):
            rr, gg, bb = pixels_rgb[r * w + c]
            row += bytes([bb, gg, rr])
        row += b"\x00" * (row_stride - len(row))
        data += row
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + bytes(data)


def test_real_decoder_wav():
    from lightrag_ray.extras.multimodal import RealDecoder

    wav = _make_wav([0, 1000, -1000, 1000], rate=8000)
    f = RealDecoder().features(wav, "audio")
    n_ch, rate, n_frames, dur_ms, mean_abs, max_abs, rms, zc = f
    assert (n_ch, rate, n_frames) == (1.0, 8000.0, 4.0)
    assert dur_ms == 0.5 and max_abs == 1000.0
    assert mean_abs == 750.0 and zc == 2.0


def test_real_decoder_bmp_and_ppm():
    from lightrag_ray.extras.multimodal import RealDecoder

    px = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
    f = RealDecoder().features(_make_bmp(px, 2, 2), "image")
    assert f[0] == 2.0 and f[1] == 2.0
    assert f[2] == 127.5 and f[3] == 127.5 and f[4] == 127.5  # channel means

    ppm = b"P6\n# comment\n2 2\n255\n" + bytes(
        v for p in px for v in p
    )
    g = RealDecoder().features(ppm, "image")
    assert g[:5] == f[:5]  # same pixels (row order differs, means equal)


def test_real_decoder_unsupported_still_raises():
    from lightrag_ray.extras.multimodal import RealDecoder

    with pytest.raises(NotImplementedError):
        RealDecoder().features(b"\x89PNG....", "image")


def test_media_stage_with_real_decoder(ray_session):
    """The SAME actor stage runs with the real decoder over WAV payloads."""
    import pyarrow as pa

    from lightrag_ray.extras.multimodal import MediaFeatureStage, RealDecoder

    stage = MediaFeatureStage(decoder=RealDecoder())
    batch = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "media_type": ["audio"],
            "payload": pa.array([_make_wav([100, -100])], pa.binary()),
            "meta": ["{}"],
        }
    )
    out = stage(batch).to_pylist()
    assert out[0]["features"][0] == 1.0  # n_channels
    assert out[0]["feature_norm"] > 0


def test_connected_components_shapes(ray_session):
    """Unit topology cases for the label-propagation kernel."""
    import pyarrow as pa
    import ray.data as rd

    from lightrag_ray.extras.dedup import connected_components

    pairs = pa.table({"doc_a": [1, 2, 10, 11, 20, 21, 22, 30],
                      "doc_b": [2, 3, 11, 12, 21, 22, 20, 31]})
    out = sorted(
        (r["node"], r["label"])
        for r in connected_components(rd.from_arrow(pairs), buckets=4).take_all()
    )
    assert out == [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10),
                   (20, 20), (21, 20), (22, 20), (30, 30), (31, 30)]
    # a 20-hop chain converges (iterations ≈ diameter)
    chain = pa.table({"doc_a": list(range(100, 120)),
                      "doc_b": list(range(101, 121))})
    labs = {
        r["node"]: r["label"]
        for r in connected_components(rd.from_arrow(chain), buckets=4).take_all()
    }
    assert set(labs.values()) == {100} and len(labs) == 21
    # EMPTY edge set: must short-circuit to an empty labeled table instead
    # of spinning the propagation loop to max_iters (Dataset.sum returns
    # None on empty input, which used to defeat the `changed == 0` check
    # and blow the stats-lineage recursion limit after 50 rounds)
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64())})
    out_empty = connected_components(rd.from_arrow(empty), buckets=4)
    assert out_empty.count() == 0
    assert sorted(out_empty.schema().names) == ["label", "node"]
    # ids above 2^53 survive bit-exactly: the propagation transport uses a
    # -1 sentinel, never a nullable int64 column (pandas coerces those to
    # float64, silently destroying low bits of hash-derived node ids)
    big = [(1 << 62) + 7, (1 << 62) + 9, (1 << 61) + 3, (1 << 61) + 4]
    hp = pa.table({"doc_a": pa.array(big[:2] , pa.int64()),
                   "doc_b": pa.array(big[2:], pa.int64())})
    labs_big = {
        r["node"]: r["label"]
        for r in connected_components(rd.from_arrow(hp), buckets=4).take_all()
    }
    assert set(labs_big) == set(big)
    assert labs_big[big[0]] == labs_big[big[2]] == min(big[0], big[2])
    assert labs_big[big[1]] == labs_big[big[3]] == min(big[1], big[3])


def test_connected_components_long_chain(ray_session):
    """Diameter ≫ max_iters converges via pointer-doubling: a 150-hop chain
    with max_iters=12 (≈ log₂ 150 + slack) must fully shortcut to label 0 —
    pre-fix this silently returned unconverged labels (ADVICE r2)."""
    import pyarrow as pa
    import ray.data as rd

    from lightrag_ray.extras.dedup import connected_components

    chain = pa.table({"doc_a": list(range(150)), "doc_b": list(range(1, 151))})
    out = connected_components(
        rd.from_arrow(chain), buckets=4, max_iters=12
    ).take_all()
    assert len(out) == 151 and {r["label"] for r in out} == {0}


def test_connected_components_raises_on_exhaustion(ray_session):
    """max_iters too small to converge must raise, never return wrong ids."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from lightrag_ray.extras.dedup import connected_components

    chain = pa.table({"doc_a": list(range(60)), "doc_b": list(range(1, 61))})
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(rd.from_arrow(chain), buckets=4, max_iters=2)


def test_asof_join_null_handling(ray_session, tmp_path):
    """Null ts rows are dropped on both sides and a NULL right-side value
    joins as NULL (not NaN) — matching the SQL oracle where `r.t_us <= l.t_us`
    is never true for NULL ts (ADVICE r2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lightrag_ray.extras.events import asof_join

    t = lambda s: s * 1_000_000  # noqa: E731 — seconds → epoch-µs
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "ts": pa.array(
                [t(10), t(20), None, t(30), t(40), None],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([7, 7, 7, 7, 7, 7], pa.int64()),
            "event_type": [
                "click", "click", "click", "purchase", "purchase", "purchase"
            ],
            "value": pa.array([1.5, None, 9.9, 0.0, 0.0, 0.0], pa.float64()),
            "props": ["{}"] * 6,
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    out = (
        asof_join(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # purchase 6 (null ts) dropped; click 3 (null ts) never matches
    assert list(out["event_id"]) == [4, 5]
    assert list(out["right_event_id"]) == [2, 2]  # latest click at/before
    assert out["right_value"].isna().all()  # click 2 has NULL value → NULL


def test_dup_clusters_lsh_matches_exact(ray_session):
    """Round-2 VERDICT #4: the production clustering path (connected
    components over the BUCKETED MinHash-LSH pair table) must produce the
    same clusters as the exact O(n²) n-gram-Jaccard graph on the oracle
    corpus — recall 1.0 at the 0.8 threshold."""
    exact = C.q_dup_clusters(SF_DIR).to_pandas()
    lsh = C.q_dup_clusters_lsh(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(
        exact.sort_values("doc_id").reset_index(drop=True),
        lsh.sort_values("doc_id").reset_index(drop=True),
        check_dtype=False,
    )


def test_session_windows_bucket_invariant(ray_session):
    """Round-2 VERDICT #5: sessions are computed per user inside coarse
    user-hash buckets (O(buckets) group calls, not O(users)).  The result
    must be invariant to the bucket count — buckets=1 forces EVERY user
    through one vectorized group call, pinning the cross-user boundary
    handling of the reduceat kernel."""
    from lightrag_ray.extras import events as E

    a = E.session_windows(SF_DIR, buckets=1).to_pandas()
    b = E.session_windows(SF_DIR, buckets=64).to_pandas()
    key = ["user_id", "session_start"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    assert a["user_id"].nunique() > 1  # buckets=1 really mixed users per call


def test_corpus_dedup_oracle_and_lsh_agreement(ray_session, con):
    """End-to-end fuzzy dedup: the exact arm must match its recursive-CTE
    oracle, the LSH-fed arm must produce the identical surviving corpus, and
    every surviving cluster representative must be the min doc_id."""
    exact = _normalize(C.q_corpus_dedup(SF_DIR).to_pandas())
    oracle = _normalize(con.execute(C.SQL_CORPUS_DEDUP).fetchdf())
    pd.testing.assert_frame_equal(exact, oracle, check_dtype=False)

    lsh = _normalize(C.q_corpus_dedup_lsh(SF_DIR).to_pandas())
    pd.testing.assert_frame_equal(exact, lsh, check_dtype=False)

    clusters = C.q_dup_clusters(SF_DIR).to_pandas()
    dupes = set(clusters.loc[clusters.doc_id != clusters.cluster_id, "doc_id"])
    survivors = set(exact["doc_id"])
    assert dupes.isdisjoint(survivors)
    assert set(clusters["cluster_id"]) <= survivors


def test_curated_corpus_lsh_matches_exact_and_reports_cc(ray_session):
    """Round-3 VERDICT next #6: the LSH-fed curation arm (the production
    scale path — the exact pair graph is O(n²) by design) must produce the
    identical curated corpus on the oracle corpus, and must surface the CC
    iteration count through cc_stats for the bench legs."""
    exact = _normalize(C.q_curated_corpus(SF_DIR).to_pandas())
    cc: dict = {}
    lsh = _normalize(C.q_curated_corpus_lsh(SF_DIR, cc_stats=cc).to_pandas())
    pd.testing.assert_frame_equal(exact, lsh, check_dtype=False)
    assert cc["cc_iterations"] >= 1


def test_drop_set_broadcast_guard(ray_session, monkeypatch):
    """An over-guard duplicate set raises the documented error instead of
    OOMing the driver — shared by BOTH corpus-dedup and curated-corpus via
    _collect_drop_set (round-3 VERDICT what's-wrong #3)."""
    import ray.data as rd

    from lightrag_ray.extras import catalog as cat

    monkeypatch.setattr(cat, "MAX_DROP_BROADCAST", 5)
    clusters = rd.from_items(
        [{"doc_id": i, "cluster_id": 0} for i in range(10)]
    )
    with pytest.raises(ValueError, match="bucketed anti-join"):
        cat._collect_drop_set(clusters)


def test_minhash_broadcast_and_sharded_paths_agree(ray_session, monkeypatch):
    """The default broadcast-signature LSH path and the over-guard SHARDED
    arm (sig-free band rows + pair→signature cogroup attach) must emit the
    identical pair table — same algorithm, different signature transport."""
    from lightrag_ray.extras import dedup as D

    base = _normalize(C.q_minhash_lsh(SF_DIR).to_pandas())
    monkeypatch.setattr(D, "MAX_SIG_BROADCAST_BYTES", 0)
    fb = _normalize(C.q_minhash_lsh(SF_DIR).to_pandas())
    key = ["doc_a", "doc_b"]
    pd.testing.assert_frame_equal(
        base.sort_values(key).reset_index(drop=True),
        fb.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    assert len(base) > 0


@pytest.mark.parametrize("arm", ["cogroup", "grid"])
def test_minhash_sharded_arm_transports_agree(ray_session, arm):
    """Both over-guard transports — the cogroup sig-attach (realistic
    pair:doc ratios) and the grid-cell shard-read arm (candidate floods) —
    must be byte-identical to the broadcast path."""
    from lightrag_ray.extras import dedup as D

    base = _normalize(C.q_minhash_lsh(SF_DIR).to_pandas())
    forced = _normalize(
        D._minhash_lsh_pairs_sharded(SF_DIR, force_arm=arm).to_pandas()
    )
    key = ["doc_a", "doc_b"]
    pd.testing.assert_frame_equal(
        base.sort_values(key).reset_index(drop=True),
        forced.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


def test_corpus_dedup_lsh_over_guard_uses_sharded_arm(ray_session, monkeypatch):
    """End-to-end LSH corpus dedup with the signature-broadcast guard forced
    to 0: the whole chain (sharded pairs → CC → keep-one → filter) must match
    the exact arm — the 100-TB regime's operative path, exercised."""
    from lightrag_ray.extras import dedup as D

    exact = _normalize(C.q_corpus_dedup(SF_DIR).to_pandas())
    monkeypatch.setattr(D, "MAX_SIG_BROADCAST_BYTES", 0)
    lsh = _normalize(C.q_corpus_dedup_lsh(SF_DIR).to_pandas())
    pd.testing.assert_frame_equal(exact, lsh, check_dtype=False)


def test_distinctive_terms_over_guard_uses_sharded_arm(ray_session, monkeypatch):
    """Past the df-vocab broadcast guard, q_distinctive_terms must switch to
    the term-hash-sharded join arm and produce the identical argmax table
    (same float expression → bit-equal scores and tie-breaks)."""
    base = (
        C.q_distinctive_terms(SF_DIR).to_pandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    monkeypatch.setattr(C, "MAX_BROADCAST_VOCAB", 0)
    fb = (
        C.q_distinctive_terms(SF_DIR).to_pandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, fb[base.columns], check_dtype=False)
    assert len(base) > 0


def test_over_guard_falls_back_to_bucketed_anti_join(ray_session, monkeypatch):
    """When the drop set exceeds the broadcast guard, the corpus filters no
    longer raise: they fall back to the documented bucketed anti-join (one
    corpus shuffle, nothing driver-materialized) and must produce the
    IDENTICAL output as the broadcast fast path."""
    base_dedup = _normalize(C.q_corpus_dedup(SF_DIR).to_pandas())
    base_cur = _normalize(C.q_curated_corpus(SF_DIR).to_pandas())
    monkeypatch.setattr(C, "MAX_DROP_BROADCAST", 0)
    fb_dedup = _normalize(C.q_corpus_dedup(SF_DIR).to_pandas())
    fb_cur = _normalize(C.q_curated_corpus(SF_DIR).to_pandas())
    pd.testing.assert_frame_equal(base_dedup, fb_dedup, check_dtype=False)
    pd.testing.assert_frame_equal(base_cur, fb_cur, check_dtype=False)


def test_ivf_ann_recall_and_exactness(ray_session):
    """IVF ANN: full-probe equals brute force exactly; recall is monotone in
    nprobe; the quantizer covers all lists and assignments are total."""
    from lightrag_ray.extras.dedup import ivf_assignments, knn_ivf_topk
    from lightrag_ray.pipelines.queries import queries as Q

    brute = Q()["knn_top10"](SF_DIR).to_pandas()["vec_id"].tolist()
    full = [r["vec_id"] for r in knn_ivf_topk(SF_DIR, nprobe=16).take_all()]
    assert full == brute  # nprobe = n_lists ⇒ exact

    recalls = []
    for nprobe in (2, 8, 16):
        got = {r["vec_id"] for r in knn_ivf_topk(SF_DIR, nprobe=nprobe).take_all()}
        recalls.append(len(got & set(brute)) / len(brute))
    assert recalls[0] <= recalls[1] <= recalls[2] == 1.0

    a = ivf_assignments(SF_DIR).to_pandas()
    assert len(a) == 500 and a["vec_id"].is_unique
    assert a["list_id"].between(0, 15).all()


def test_ivf_probe_reads_only_nprobe_partitions(ray_session, tmp_path):
    """The whole point of IVF is the pruned read: a probe must touch ONLY
    its nprobe inverted-list partitions of the materialized index, never the
    full embeddings table (round-3 VERDICT #1/#2)."""
    import os

    from lightrag_ray.extras import dedup as D

    index_dir = str(tmp_path / "ivf_index")
    D.ivf_build_index(SF_DIR, index_dir, n_lists=16)
    # the index is Hive-partitioned: one directory per inverted list
    parts = sorted(p for p in os.listdir(index_dir) if p.startswith("list_id="))
    assert len(parts) == 16

    nprobe = 3
    import pyarrow.parquet as pq

    _, probe = D._ivf_query_probe(SF_DIR, 0, n_lists=16, nprobe=nprobe)
    assert len(probe) == nprobe
    probed_files = D._ivf_probe_paths(index_dir, probe)
    touched = {
        os.path.basename(os.path.dirname(f)) for f in probed_files
    }
    assert touched == {f"list_id={l}" for l in probe}
    # the probed partitions hold strictly fewer rows than the corpus: the
    # probe reads a fraction of the index, not the whole table
    n_probed = sum(
        pq.read_table(p, columns=["vec_id"]).num_rows for p in probed_files
    )
    assert 0 < n_probed < 500
    probed_ids = {
        v
        for p in probed_files
        for v in pq.read_table(p, columns=["vec_id"])["vec_id"].to_pylist()
    }

    ds = D.knn_ivf_topk(SF_DIR, nprobe=nprobe, index_dir=index_dir)
    rows = ds.take_all()
    assert len(rows) == 10
    sims = [r["sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    # every scored candidate came from a probed partition
    assert {r["vec_id"] for r in rows} <= probed_ids

    # the index build never recomputes assignments at probe time: the probed
    # candidate pool is exactly the union of the probed partitions' rows
    import pyarrow.parquet as pq

    probe_paths = D._ivf_probe_paths(index_dir, range(16))
    assert len(probe_paths) >= 16  # ≥1 Parquet file per inverted list
    n_indexed = sum(
        pq.read_table(p, columns=["vec_id"]).num_rows for p in probe_paths
    )
    assert n_indexed == 500

    # centroid training streams: the trainer's sample pool is bounded, not
    # the whole table materialized on the driver
    sample = D._ivf_training_sample(SF_DIR, max_train=64)
    assert sample.shape[0] == 64


def test_ivf_delta_maintenance(ray_session, tmp_path, monkeypatch):
    """Incremental IVF: the refresh assigns ONLY delta rows against the
    PERSISTED base quantizer and appends them — byte-identical to a full
    assignment with the same centroids filtered to the delta; the append is
    idempotent; full-probe search over the maintained index equals brute
    force (base bytes never rewritten)."""
    import os

    import ray
    import ray.data as rd

    from lightrag_ray.extras import dedup as D
    from lightrag_ray.pipelines.queries import queries as Q

    monkeypatch.setattr(
        D, "_ivf_delta_index_dir", lambda *a: str(tmp_path / "ivfdelta")
    )
    idx = D.build_ivf_base_index(SF_DIR)
    assert os.path.exists(os.path.join(idx, "_IVF_BASE.json"))
    cents = D._ivf_persisted_centroids(idx)
    assert cents.shape[0] == 16

    # ground truth: full-corpus assignment under the SAME persisted quantizer
    full = (
        rd.read_parquet(
            os.path.join(SF_DIR, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        .map_batches(
            D._make_ivf_assign_fn(ray.put(cents), with_embedding=False),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
    )
    exp = (
        full[full.vec_id % 10 == 0]
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    got = D.ivf_delta_assign(SF_DIR).to_pandas().sort_values("vec_id")
    got = got.reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert len(got) == 50  # vec_id % 10 == 0 of 500

    # base index holds exactly the non-delta rows before the append
    lists_dir = os.path.join(idx, "lists")
    base_ids = set(
        rd.read_parquet(lists_dir, columns=["vec_id"]).to_pandas()["vec_id"]
    )
    assert base_ids == set(full.vec_id[full.vec_id % 10 != 0])

    # append is idempotent and never rewrites base files
    before = {
        os.path.join(r, f)
        for r, _, fs in os.walk(lists_dir)
        for f in fs
    }
    D.ivf_delta_add(SF_DIR)
    after1 = {
        os.path.join(r, f)
        for r, _, fs in os.walk(lists_dir)
        for f in fs
    }
    assert before <= after1 and len(after1) > len(before)
    D.ivf_delta_add(SF_DIR)  # marker short-circuit
    after2 = {
        os.path.join(r, f)
        for r, _, fs in os.walk(lists_dir)
        for f in fs
    }
    assert after2 == after1
    all_ids = rd.read_parquet(lists_dir, columns=["vec_id"]).to_pandas()[
        "vec_id"
    ]
    assert all_ids.is_unique and set(all_ids) == set(full.vec_id)

    # search over the maintained index: exact at full probe
    brute = Q()["knn_top10"](SF_DIR).to_pandas()["vec_id"].tolist()
    maint = [
        r["vec_id"]
        for r in D.knn_ivf_delta_topk(SF_DIR, nprobe=16).take_all()
    ]
    assert maint == brute
    # pruned probe returns a well-formed result drawn from probed lists only
    rows = D.knn_ivf_delta_topk(SF_DIR, nprobe=4).take_all()
    assert len(rows) == 10
    sims = [r["sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_asof_join_bucket_invariant(ray_session):
    """asof_join groups by coarse user buckets; buckets=1 forces every user
    through ONE vectorized sweep call, pinning cross-user boundary handling
    of the per-user searchsorted kernel."""
    from lightrag_ray.extras import events as E

    a = E.asof_join(SF_DIR, buckets=1).to_pandas()
    b = E.asof_join(SF_DIR, buckets=64).to_pandas()
    key = ["event_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


def test_balanced_lang_sample_rebalances(ray_session, tmp_path):
    """Skewed strata are downsampled toward the minority share in
    expectation, selection is deterministic, and the minority stratum is
    kept (nearly) whole."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    n_en, n_de = 400, 40
    table = pa.table(
        {
            "doc_id": pa.array(range(n_en + n_de), pa.int64()),
            "lang": pa.array(["en"] * n_en + ["de"] * n_de, pa.string()),
        }
    )
    pq.write_table(table, os.path.join(tmp_path, "documents.parquet"))

    a = C.q_balanced_lang_sample(str(tmp_path)).to_pandas()
    b = C.q_balanced_lang_sample(str(tmp_path)).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )
    counts = a.groupby("lang").size()
    # en accepted at p = 40/400 = 0.1 → expect ~40; allow broad hash noise
    assert 15 <= counts.get("en", 0) <= 75
    # de accepted at p = 1.0 → kept whole
    assert counts.get("de", 0) == n_de


def test_temperature_lang_sample_sqrt_flattening(ray_session, tmp_path):
    """α=0.5 temperature: the majority stratum shrinks toward the geometric
    mean √(min·count) (NOT all the way to min — skew is compressed, not
    erased), the minority is kept whole, and selection is deterministic."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    n_en, n_de = 400, 40
    table = pa.table(
        {
            "doc_id": pa.array(range(n_en + n_de), pa.int64()),
            "lang": pa.array(["en"] * n_en + ["de"] * n_de, pa.string()),
        }
    )
    pq.write_table(table, os.path.join(tmp_path, "documents.parquet"))

    a = C.q_temperature_lang_sample(str(tmp_path)).to_pandas()
    b = C.q_temperature_lang_sample(str(tmp_path)).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )
    counts = a.groupby("lang").size()
    # en accepted at p = √(40/400) ≈ 0.316 → expect ~126 ≈ √(40·400);
    # strictly between the α=0 target (40) and the original 400
    assert 75 <= counts.get("en", 0) <= 190
    assert counts.get("de", 0) == n_de


def test_dsir_select_prefers_target_vocabulary(ray_session, tmp_path):
    """DSIR selection must rank docs written in the target slice's
    vocabulary above docs from a disjoint vocabulary, and break ties by
    doc_id — exercised on a corpus where the signal is unambiguous."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lightrag_ray.extras import catalog as C

    # target slice (lang=en) speaks {alpha beta}; the others speak {zeta}.
    texts, langs = [], []
    for i in range(30):
        if i % 3 == 0:
            texts.append("alpha beta alpha beta")
            langs.append("en")
        elif i % 3 == 1:
            texts.append("zeta zeta zeta zeta")
            langs.append("fr")
        else:  # non-en doc that still uses the target vocabulary
            texts.append("alpha beta alpha beta")
            langs.append("de")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(30), pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    out = C.q_dsir_select(str(tmp_path)).to_pandas()
    assert len(out) == 30  # top-k larger than corpus → everything, ranked
    top20 = set(out.head(20)["doc_id"])
    # every alpha-beta doc (en AND de) outranks every zeta doc
    assert top20 == {i for i in range(30) if i % 3 != 1}
    # ties inside a vocabulary class break by ascending doc_id
    alpha_rows = out[out["doc_id"] % 3 != 1]["doc_id"].tolist()
    assert alpha_rows == sorted(alpha_rows)


def test_length_quantiles_rank_rule(ray_session, tmp_path):
    """Pin the lower-discrete-quantile rank rule 1 + (n-1)*p // 100 on a
    hand corpus where off-by-one in either direction changes the answer."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lightrag_ray.extras import textstats as T

    # en lengths sorted: [10, 20, 30, 40] (n=4):
    #   p50 → rank 1+3*50//100 = 2 → 20; p90 → rank 3 → 30; p99 → rank 3
    # fr lengths: [7] → all percentiles are 7.
    rows = [(0, "en", 30), (1, "en", 10), (2, "en", 40), (3, "en", 20), (4, "fr", 7)]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "n_chars": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    out = (
        T.length_quantiles(str(tmp_path))
        .to_pandas()
        .set_index("lang")
        .sort_index()
    )
    assert out.loc["en", ["n_docs", "p50", "p90", "p99"]].tolist() == [4, 20, 30, 30]
    assert out.loc["fr", ["n_docs", "p50", "p90", "p99"]].tolist() == [1, 7, 7, 7]


def test_mg_trim_superset_guarantee():
    """Fuzz the Misra-Gries merge guarantee: after any sequence of batch
    sketches + trims, the surviving keys are a superset of every term whose
    TRUE frequency exceeds N/(k+1) — the property the recount pass relies
    on for exactness."""
    import random
    from collections import Counter

    from lightrag_ray.extras import textstats as T

    rng = random.Random(7)
    for trial in range(30):
        k = rng.choice([2, 3, 5, 8])
        # skewed stream: few hot terms + a heavy tail
        vocab = [f"t{i}" for i in range(rng.randint(5, 60))]
        weights = [rng.choice([1, 1, 1, 2, 10, 50]) for _ in vocab]
        stream = [
            rng.choices(vocab, weights)[0] for _ in range(rng.randint(50, 800))
        ]
        truth = Counter(stream)
        n = len(stream)
        # batch the stream arbitrarily, sketch each batch, merge with trim
        merged: dict = {}
        i = 0
        while i < n:
            j = min(n, i + rng.randint(1, 97))
            batch = Counter(stream[i:j])
            merged_batch = T._mg_trim(dict(batch), k)
            for t, c in merged_batch.items():
                merged[t] = merged.get(t, 0) + c
            merged = T._mg_trim(merged, k)
            i = j
        assert len(merged) <= k
        required = {t for t, c in truth.items() if c * (k + 1) > n}
        assert required <= set(merged), (trial, required - set(merged))


def test_hll_estimate_accuracy(ray_session):
    """The registers emitted by the hash-checked query must yield a
    distinct-count estimate within HLL's expected error (~6.5 % at 256
    registers; assert 15 %) of the true vocabulary size."""
    import duckdb

    from lightrag_ray.extras import textstats as T

    sf = "/root/testdata/sf0.001"
    regs = {
        int(r["register"]): int(r["rho"])
        for r in T.hll_registers(sf).take_all()
    }
    est = T.hll_estimate(regs)
    truth = duckdb.connect().execute(
        "SELECT count(DISTINCT t) FROM (SELECT "
        "unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t "
        f"FROM read_parquet('{sf}/documents.parquet'))"
    ).fetchone()[0]
    assert abs(est - truth) / truth < 0.15, (est, truth)


def test_hll_parts_rank_rule():
    from lightrag_ray.extras import textstats as T

    # rho is 1 + leading zeros of the 56-bit remainder: a remainder with
    # its top bit set gives rho 1; remainder 0 gives the sentinel 57.
    idx, rho = T._hll_parts("the")
    assert 0 <= idx < T._HLL_REG and 1 <= rho <= T._HLL_REM_BITS + 1
    # cross-check one value against a hand md5
    import hashlib

    h = int(hashlib.md5(b"the").hexdigest()[:16], 16)
    assert idx == h >> T._HLL_REM_BITS
    rem = h & ((1 << T._HLL_REM_BITS) - 1)
    assert rho == T._HLL_REM_BITS - rem.bit_length() + 1


def test_event_props_stats_bad_payloads(ray_session, tmp_path):
    """Malformed / missing / non-integer JSON payloads must count in n_bad
    with the valid rows still aggregated — same TRY_CAST semantics as the
    oracle."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lightrag_ray.extras import events as E

    rows = [
        ("click", '{"k": 3}'),
        ("click", '{"k": 7}'),
        ("click", "not json"),
        ("click", '{"other": 1}'),
        ("view", '{"k": true}'),  # bool is not an int payload
        ("view", None),
        ("view", '{"k": -2}'),
    ]
    tbl = pa.table(
        {
            "ts": pa.array([0] * len(rows), pa.timestamp("us")),
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "props": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "events.parquet"))
    out = {
        r["event_type"]: r
        for r in E.event_props_stats(str(tmp_path)).take_all()
    }
    assert out["click"]["n_events"] == 2
    assert out["click"]["sum_k"] == 10 and out["click"]["max_k"] == 7
    assert out["click"]["n_bad"] == 2
    assert out["view"]["n_events"] == 1 and out["view"]["sum_k"] == -2
    assert out["view"]["n_bad"] == 2


def test_heavy_hitters_adversarial_trim_keeps_token_mass(ray_session, tmp_path, monkeypatch):
    """A batch with > k equally-frequent terms trims to an EMPTY sketch;
    its token mass must still count toward N or the final threshold is
    wrong.  With k=2 the 5-term uniform doc sketches to nothing, yet the
    hot term's exactness gate must use the FULL corpus N."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lightrag_ray.extras import textstats as T

    docs = [
        "a b c d e",  # 5 distinct, count 1 each → MG(k=2) trims to empty
        " ".join(["hot"] * 10),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    out = {r["term"]: r["tf"] for r in T.heavy_hitters(str(tmp_path), k=2).take_all()}
    # N = 15 tokens; threshold tf*3 > 15 → only "hot" (10) qualifies —
    # and it must NOT be reported if N had collapsed to 10 (then a,b,..
    # would misreport); exact expected output:
    assert out == {"hot": 10}


def test_split_ppm_stream_and_resize():
    from lightrag_ray.extras import multimodal as M

    s = M.synth_frame_stream(7)  # 2 + 7%4 = 5 frames
    frames = M.split_ppm_stream(s)
    assert len(frames) == 5
    assert all(f.startswith(b"P6\n2 2\n255\n") for f in frames)
    # hand 4x4 → 2x2 nearest-neighbour: src index = i*4//2 = 0,2
    import numpy as np

    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    payload = b"P6\n4 4\n255\n" + px.tobytes()
    out = M.resize_ppm(payload, 2, 2)
    assert out.startswith(b"P6\n2 2\n255\n")
    got = np.frombuffer(out[len(b"P6\n2 2\n255\n"):], np.uint8).reshape(2, 2, 3)
    assert (got == px[[0, 2]][:, [0, 2]]).all()
    # resize is idempotent at the same size and decodable by the real path
    again = M.resize_ppm(out, 2, 2)
    assert again == out
    feats = M.RealDecoder().features(out, "image")
    assert feats[0] == 2.0 and feats[1] == 2.0


def test_split_ppm_stream_rejects_garbage():
    import pytest as _pytest

    from lightrag_ray.extras import multimodal as M

    with _pytest.raises(ValueError, match="not a P6 frame"):
        M.split_ppm_stream(b"JUNK")
    with _pytest.raises(ValueError, match="truncated"):
        M.split_ppm_stream(b"P6\n2 2\n255\n\x00\x01")


def test_warc_parser_honors_content_length():
    """A payload that CONTAINS record markers must not confuse the parser —
    extents come from Content-Length, never from scanning."""
    from lightrag_ray.sources import warc as W

    tricky = 'prefix WARC/1.0\r\n\r\n embedded marker'
    blob = W.make_warc_record(3, tricky) + W.make_warc_record(4, "plain")
    out = W.parse_warc(blob)
    assert out.column("text").to_pylist() == [tricky, "plain"]
    assert out.column("url").to_pylist() == [
        "https://w.example.org/doc/0000000003",
        "https://w.example.org/doc/0000000004",
    ]
    assert out.column("warc_date").to_pylist()[0] == "2024-01-01T00:03:00Z"


def test_warc_parser_rejects_bad_framing():
    import pytest as _pytest

    from lightrag_ray.sources import warc as W

    with _pytest.raises(ValueError, match="not a WARC/1.0 record"):
        W.parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    rec = W.make_warc_record(1, "x")
    with _pytest.raises(ValueError, match="missing record trailer"):
        W.parse_warc(rec[:-2])


def test_warc_date_rolls_days():
    from lightrag_ray.sources import warc as W

    assert W._warc_date(0) == "2024-01-01T00:00:00Z"
    assert W._warc_date(1439) == "2024-01-01T23:59:00Z"
    assert W._warc_date(1440) == "2024-01-02T00:00:00Z"


# ---------------------------------------------------------------------------
# SemDeDup (k-means semantic dedup) — independent brute-force agreement +
# structural invariants.  The distributed kernel's duplicate groups are
# connected components of the within-cluster eps-graph; the reference here
# recomputes them with a pure-Python BFS over the same assignments.


def _semdedup_reference(sf_dir: str, n_lists: int, eps: float) -> pd.DataFrame:
    import numpy as np
    import pyarrow.parquet as pq

    from lightrag_ray.extras import dedup as D

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id"), np.int64)
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    unit = mat / np.where(norms == 0, 1.0, norms)[:, None]
    cents = D._ivf_centroids(sf_dir, n_lists)
    assign = (unit @ cents.T).argmax(axis=1)

    rows = []
    for c in sorted(set(assign.tolist())):
        member_pos = np.nonzero(assign == c)[0]
        member_pos = member_pos[np.argsort(ids[member_pos])]
        u = unit[member_pos]
        cent = u.sum(axis=0)
        cn = np.linalg.norm(cent)
        if cn > 0:
            cent /= cn
        cent_sim = u @ cent
        sims = u @ u.T
        m = len(member_pos)
        adj = [set(np.nonzero(sims[i] >= 1.0 - eps)[0].tolist()) - {i} for i in range(m)]
        seen: set[int] = set()
        comp_of = {}
        for start in range(m):
            if start in seen:
                continue
            comp, frontier = {start}, [start]
            while frontier:
                nxt = frontier.pop()
                for nb in adj[nxt]:
                    if nb not in comp:
                        comp.add(nb)
                        frontier.append(nb)
            seen |= comp
            rep = min(
                comp,
                key=lambda i: (round(float(cent_sim[i]), 12), int(ids[member_pos[i]])),
            )
            for i in comp:
                comp_of[i] = rep
        for i in range(m):
            rep = comp_of[i]
            rows.append(
                {
                    "vec_id": int(ids[member_pos[i]]),
                    "list_id": int(c),
                    "rep_id": int(ids[member_pos[rep]]),
                    "keep": i == rep,
                    "centroid_sim": round(float(cent_sim[i]), 4),
                }
            )
    return pd.DataFrame(rows)


@pytest.mark.parametrize("eps", [0.15, 0.55])
def test_semdedup_agrees_with_brute_force(ray_session, eps):
    from lightrag_ray.extras.dedup import semdedup

    got = (
        semdedup(SF_DIR, n_lists=16, eps=eps)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ref = _semdedup_reference(SF_DIR, 16, eps).sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], ref[sorted(ref.columns)], check_dtype=False
    )


def test_semdedup_invariants(ray_session):
    import pyarrow.parquet as pq

    from lightrag_ray.extras.dedup import semdedup

    df = semdedup(SF_DIR, n_lists=16, eps=0.15).to_pandas()
    n_vecs = pq.read_metadata(f"{SF_DIR}/embeddings.parquet").num_rows
    # total cover: every vector decided exactly once
    assert len(df) == n_vecs
    assert df["vec_id"].is_unique
    # exactly one kept member per duplicate group, and it IS the rep
    grp = df.groupby(["list_id", "rep_id"])
    assert (grp["keep"].sum() == 1).all()
    kept = df[df["keep"]]
    assert (kept["vec_id"] == kept["rep_id"]).all()
    # reps never cross clusters
    rep_list = df.set_index("vec_id")["list_id"]
    assert (df["rep_id"].map(rep_list).to_numpy() == df["list_id"].to_numpy()).all()


def test_semdedup_cap_degrades_not_drops(ray_session):
    """Members beyond max_cluster pass through as undeduped singletons —
    full cover, no silent drops."""
    import pyarrow.parquet as pq

    from lightrag_ray.extras.dedup import semdedup

    df = semdedup(SF_DIR, n_lists=4, eps=0.15, max_cluster=5).to_pandas()
    n_vecs = pq.read_metadata(f"{SF_DIR}/embeddings.parquet").num_rows
    assert len(df) == n_vecs
    assert df["vec_id"].is_unique
    saw_tail = False
    for _lid, g in df.groupby("list_id"):
        tail = g.sort_values("vec_id").iloc[5:]
        if len(tail):
            saw_tail = True
            assert (tail["vec_id"] == tail["rep_id"]).all()
            assert tail["keep"].all()
    assert saw_tail  # sf0.001 clusters exceed 5 members


def test_semdedup_corpus_matches_keep_policy(ray_session):
    from lightrag_ray.extras.dedup import semdedup

    decisions = semdedup(SF_DIR, eps=0.55).to_pandas()
    assert not decisions["keep"].all()  # eps=0.55 must exercise drops
    expect = set(decisions.loc[decisions["keep"], "vec_id"].tolist())
    got = C.q_semdedup_corpus(SF_DIR).to_pandas()
    assert set(got["doc_id"].tolist()) == expect
    assert set(got.columns) == {"doc_id", "lang"}


def test_bestrep_dedup_lsh_equals_exact(ray_session):
    """LSH-fed cluster reps must equal the exact-pair-graph reps on the
    test corpus (recall 1.0 at the 0.8 threshold), same contract as
    dup_clusters_lsh."""
    exact = _normalize(C.q_bestrep_dedup(SF_DIR).to_pandas())
    lsh = _normalize(C.q_bestrep_dedup_lsh(SF_DIR).to_pandas())
    pd.testing.assert_frame_equal(exact, lsh, check_dtype=False)


def test_bestrep_dedup_over_guard_uses_cogroup_arm(ray_session, monkeypatch):
    """Past the member-map broadcast guard the bestrep pass degrades to the
    doc_id-hash bucketed cogroup and must produce the identical table."""
    base = _normalize(C.q_bestrep_dedup(SF_DIR).to_pandas())
    monkeypatch.setattr(C, "MAX_DROP_BROADCAST", 0)
    fb = _normalize(C.q_bestrep_dedup(SF_DIR).to_pandas())
    pd.testing.assert_frame_equal(base, fb, check_dtype=False)
    # the policy differs from min-id canonical: at least one rep is not its
    # cluster's min doc_id on this corpus (longest-copy wins)
    assert (base["rep_doc_id"] != base["cluster_id"]).any()


def test_lsh_delta_pairs_equals_full_run_subset(ray_session, tmp_path, monkeypatch):
    """The incremental probe's pinned contract: byte-equality with the full
    minhash_lsh_pairs run restricted to pairs touching the refresh delta
    (doc_id % 10 == 0) — same est values, same truncated flags."""
    import os
    import shutil
    import tempfile

    from lightrag_ray.extras import dedup as D

    shutil.rmtree(
        os.path.join(tempfile.gettempdir(), "lightrag_ray_lshindex"),
        ignore_errors=True,
    )
    full = D.minhash_lsh_pairs(SF_DIR, threshold=0.5).to_pandas()
    sub = _normalize(full[(full.doc_a % 10 == 0) | (full.doc_b % 10 == 0)])
    probe = _normalize(C.q_lsh_delta_pairs(SF_DIR).to_pandas())
    assert len(sub) > 0  # the contract is non-vacuous on the test corpus
    pd.testing.assert_frame_equal(sub, probe, check_dtype=False)
    # second call must reuse the persisted index (idempotent marker)
    idx = D._lsh_band_index_dir(SF_DIR, 64, 5, 16, 10)
    marker_mtime = os.path.getmtime(os.path.join(idx, "_LSH_INDEX.json"))
    probe2 = _normalize(C.q_lsh_delta_pairs(SF_DIR).to_pandas())
    pd.testing.assert_frame_equal(probe, probe2, check_dtype=False)
    assert os.path.getmtime(os.path.join(idx, "_LSH_INDEX.json")) == marker_mtime


def test_lsh_delta_pairs_crafted_base_delta_dup(ray_session, tmp_path):
    """A delta doc (id 10) duplicating a base doc (id 3) must surface with
    est 1.0; base-base duplicates (ids 1, 2) must NOT appear."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lightrag_ray.extras import dedup as D

    dup = "the quick brown fox jumps over the lazy dog again and again"
    texts = {
        1: "base duplicate pair one shared text content here",
        2: "base duplicate pair one shared text content here",
        3: dup,
        10: dup,  # delta member (10 % 10 == 0)
        7: "completely unrelated filler words nothing matches at all",
    }
    table = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(tmp_path, "documents.parquet"))
    out = D.lsh_delta_pairs(str(tmp_path), threshold=0.5).to_pandas()
    assert [(r.doc_a, r.doc_b) for r in out.itertuples()] == [(3, 10)]
    assert out["est_jaccard"].iloc[0] == 1.0


def test_lsh_delta_pairs_grid_arm_agreement(ray_session):
    """The candidate-FLOOD dispatch (force_arm='grid'): the grid-cell
    transport must produce the identical delta pair table the cogroup
    sig-attach arm produces — the bench corpus's adversarial density
    trips this dispatch for real (the cogroup arm's 145M-row sort wedged
    the executor there)."""
    import os
    import shutil
    import tempfile

    from lightrag_ray.extras import dedup as D

    shutil.rmtree(
        os.path.join(tempfile.gettempdir(), "lightrag_ray_lshindex"),
        ignore_errors=True,
    )
    cog = _normalize(D.lsh_delta_pairs(SF_DIR, threshold=0.5).to_pandas())
    grid = _normalize(
        D.lsh_delta_pairs(SF_DIR, threshold=0.5, force_arm="grid").to_pandas()
    )
    assert len(cog) > 0
    pd.testing.assert_frame_equal(cog, grid, check_dtype=False)


def test_pq_codes_deterministic_and_total(ray_session):
    """PQ encode: every vector gets an m-byte code, codes are bit-identical
    across runs and batch-split choices (seeded codebooks + streamed
    deterministic training sample)."""
    from lightrag_ray.extras.dedup import _PQ_M, pq_codes

    a = pq_codes(SF_DIR).to_pandas().sort_values("vec_id").reset_index(drop=True)
    b = pq_codes(SF_DIR).to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert len(a) == 500 and a["vec_id"].is_unique
    assert all(len(c) == _PQ_M for c in a["code"])
    assert [list(c) for c in a["code"]] == [list(c) for c in b["code"]]


def test_pq_adc_recall_vs_brute_force(ray_session):
    """ADC + exact-rerank recall vs the brute-force oracle is monotone in
    the rerank depth and ≥ the measured floor at each depth (deterministic
    pipeline, so these are stable, not flaky, bounds)."""
    from lightrag_ray.extras.dedup import knn_pq_topk
    from lightrag_ray.pipelines.queries import queries as Q

    brute = set(Q()["knn_top10"](SF_DIR).to_pandas()["vec_id"])
    r50 = set(knn_pq_topk(SF_DIR, rerank=50).to_pandas()["vec_id"])
    r100 = set(knn_pq_topk(SF_DIR, rerank=100).to_pandas()["vec_id"])
    r200 = set(knn_pq_topk(SF_DIR, rerank=200).to_pandas()["vec_id"])
    rec = [len(s & brute) / 10 for s in (r50, r100, r200)]
    assert rec[0] <= rec[1] <= rec[2]
    assert rec[0] >= 0.6 and rec[1] >= 0.8 and rec[2] == 1.0


def test_pq_exact_with_overcomplete_codebooks(ray_session, tmp_path):
    """When the codebook is overcomplete (ksub ≥ distinct training rows and
    the training sample IS the corpus), Lloyd's fixed point puts every
    subvector on its own codeword, encode is lossless, and PQ top-k equals
    brute force EXACTLY — the end-to-end correctness pin for the
    encode/ADC/rerank plumbing."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lightrag_ray.extras import dedup as D

    rng = np.random.default_rng(7)
    n, dim = 12, 16
    mat = rng.normal(size=(n, dim))
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in mat],
                pa.list_(pa.float32()),
            ),
        }
    )
    pq.write_table(table, os.path.join(tmp_path, "embeddings.parquet"))
    sf = str(tmp_path)

    books = D.pq_train_codebooks(sf, m=4, ksub=16, max_train=n)
    norms = np.linalg.norm(mat, axis=1)
    unit = mat / norms[:, None]
    codes = D._pq_encode_mat(unit, books)
    # lossless: decoding the codes reproduces the unit vectors
    dsub = dim // 4
    recon = np.concatenate(
        [books[j][codes[:, j]] for j in range(4)], axis=1
    )
    assert np.allclose(recon, unit, atol=1e-9)

    q_unit = unit[0]
    exact = np.round(unit @ q_unit, 4)
    order = np.lexsort((np.arange(n), -exact))
    expect = [i for i in order if i != 0][:5]
    got = D.knn_pq_topk(sf, query_vec_id=0, k=5, m=4, ksub=16).to_pandas()
    assert got["vec_id"].tolist() == expect


def test_ivfpq_recall_and_full_probe_exactness(ray_session):
    """IVF-PQ: at full probe + rerank ≥ corpus the composed path equals
    brute force exactly (the PQ stage only orders candidates; the exact
    rerank recovers truth); at pruned probes recall ≥ the IVF-only path's
    floor can't be guaranteed, so pin the measured deterministic values."""
    from lightrag_ray.extras.dedup import knn_ivfpq_topk
    from lightrag_ray.pipelines.queries import queries as Q

    brute = Q()["knn_top10"](SF_DIR).to_pandas()["vec_id"].tolist()
    full = knn_ivfpq_topk(
        SF_DIR, nprobe=16, rerank=500
    ).to_pandas()["vec_id"].tolist()
    assert full == brute

    # at a pruned probe the PQ stage must lose NOTHING beyond the IVF
    # prune itself — PROVIDED rerank covers the probed rows' candidate
    # pool (rerank=500 ≥ corpus here): then the exact rerank recovers the
    # IVF-only result exactly.  (A smaller rerank may drop true neighbors
    # the ADC ordering misranks — that path is deliberately approximate.)
    from lightrag_ray.extras.dedup import knn_ivf_topk

    for nprobe in (4, 8):
        ivf_only = set(
            r["vec_id"] for r in knn_ivf_topk(SF_DIR, nprobe=nprobe).take_all()
        )
        ivfpq = set(
            knn_ivfpq_topk(SF_DIR, nprobe=nprobe, rerank=500)
            .to_pandas()["vec_id"]
        )
        assert ivfpq == ivf_only
