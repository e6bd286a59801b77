"""Sequence-packing kernels (extras/packing.py).

DuckDB parity for seq_pack runs via tests/test_extras.py's parametrization
over catalog.oracle_sql(); here we pin the distributed prefix scan on
hand-computed corpora — including a sequence that spans a bucket boundary,
which must be merged (not duplicated) by the final seq_id groupby — and the
zero-token-document edge."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lightrag_ray.extras import packing as P


def _write_docs(tmp_path, rows):
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_seq_pack_hand_computed(ray_session, tmp_path, monkeypatch):
    monkeypatch.setattr(P, "SEQ_LEN", 5)
    # tokens per doc: 3, 4, 1, 2 → exclusive offsets 0, 3, 7, 8
    # seq 0: docs 0 (off 0) and 1 (off 3); seq 1: docs 2 (off 7), 3 (off 8)
    sf = _write_docs(
        tmp_path,
        [(0, "a b c"), (1, "d e f g"), (2, "h"), (3, "i j")],
    )
    out = (
        P.q_seq_pack(sf)
        .to_pandas()
        .sort_values("seq_id")
        .reset_index(drop=True)
    )
    assert out["seq_id"].tolist() == [0, 1]
    assert out["n_docs"].tolist() == [2, 2]
    assert out["n_tokens"].tolist() == [7, 3]
    assert out["first_doc"].tolist() == [0, 2]
    assert out["last_doc"].tolist() == [1, 3]


def test_seq_pack_zero_token_doc_takes_no_space(ray_session, tmp_path, monkeypatch):
    monkeypatch.setattr(P, "SEQ_LEN", 4)
    # doc 1 is empty: it is COUNTED in the sequence at its offset but
    # advances nothing — docs 0 (off 0), 1 (off 3), 2 (off 3) share seq 0.
    sf = _write_docs(tmp_path, [(0, "a b c"), (1, ""), (2, "d e")])
    out = P.q_seq_pack(sf).to_pandas().sort_values("seq_id").reset_index(drop=True)
    # no document STARTS in window 1 (doc 2's second token merely spills
    # into it), so exactly one sequence row exists.
    assert out["seq_id"].tolist() == [0]
    assert out.iloc[0]["n_docs"] == 3
    assert out.iloc[0]["n_tokens"] == 5
    assert out.iloc[0]["first_doc"] == 0 and out.iloc[0]["last_doc"] == 2


def test_seq_pack_merges_bucket_boundary_sequences(ray_session, tmp_path, monkeypatch):
    # 128 docs × 3 tokens with SEQ_LEN=7: sequences constantly straddle the
    # 64-way range-bucket boundaries; every sequence must appear exactly
    # once with doc/token conservation.
    monkeypatch.setattr(P, "SEQ_LEN", 7)
    sf = _write_docs(tmp_path, [(i, "t u v") for i in range(128)])
    out = P.q_seq_pack(sf).to_pandas().sort_values("seq_id").reset_index(drop=True)
    assert out["seq_id"].is_unique
    assert int(out["n_docs"].sum()) == 128
    assert int(out["n_tokens"].sum()) == 384
    assert out["seq_id"].tolist() == list(range(int(np.ceil(384 / 7))))
    # doc spans are contiguous and ordered across sequences
    assert (out["first_doc"] <= out["last_doc"]).all()
    assert (out["first_doc"].iloc[1:].to_numpy()
            > out["last_doc"].iloc[:-1].to_numpy() - 1).all()


def test_range_bucket_is_monotone():
    ids = np.array([0, 1, 5, 99, 100, 101], np.int64)
    b = P._range_bucket(ids, 101)
    assert (np.diff(b) >= 0).all()
    assert b.min() >= 0 and b.max() < P._BUCKETS


SF_DIR = "/root/testdata/sf0.001"


def test_training_shards_bpe_packs_same_survivors(ray_session):
    """The BPE flagship packs EXACTLY the curated survivor set the oracled
    regex flagship packs (same doc universe, same order) — only the token
    counts differ.  Conservation + contiguity invariants pin the composed
    prefix scan."""
    reg = (
        P.q_training_shards(SF_DIR)
        .to_pandas()
        .sort_values("seq_id")
        .reset_index(drop=True)
    )
    bpe = (
        P.q_training_shards_bpe(SF_DIR, n_merges=50)
        .to_pandas()
        .sort_values("seq_id")
        .reset_index(drop=True)
    )
    # identical survivor universe: same doc count, same first/last doc
    assert int(bpe["n_docs"].sum()) == int(reg["n_docs"].sum()) > 0
    assert int(bpe["first_doc"].min()) == int(reg["first_doc"].min())
    assert int(bpe["last_doc"].max()) == int(reg["last_doc"].max())
    # manifest invariants: unique contiguous seq ids, ordered doc spans
    for out in (reg, bpe):
        assert out["seq_id"].is_unique
        assert out["seq_id"].tolist() == list(range(len(out)))
        assert (out["first_doc"] <= out["last_doc"]).all()
        assert (
            out["first_doc"].iloc[1:].to_numpy()
            > out["last_doc"].iloc[:-1].to_numpy() - 1
        ).all()
    # BPE at 50 merges tokenizes byte-level: counts at least the regex words
    assert int(bpe["n_tokens"].sum()) >= int(reg["n_tokens"].sum())
    # every full sequence except the last carries ≥ SEQ_LEN-starting mass:
    # a doc STARTS in seq k only if the previous mass filled k*SEQ_LEN
    assert int(bpe["seq_id"].max()) == (len(bpe) - 1)


def test_training_shards_empty_after_curation(ray_session, tmp_path):
    """A corpus where nothing survives the gates yields an EMPTY manifest
    with the stable 5-column schema (the pack_counts empty arm)."""
    sf = _write_docs(tmp_path, [(0, "short"), (1, "x y")])
    ds = P.q_training_shards(sf)
    assert ds.count() == 0
    # Dataset.to_pandas drops columns on a fully-empty dataset; the schema
    # contract lives on the dataset itself.
    assert sorted(ds.schema().names) == [
        "first_doc",
        "last_doc",
        "n_docs",
        "n_tokens",
        "seq_id",
    ]


def test_write_training_shards_byte_exact(ray_session, tmp_path):
    """The written shard files hold EXACTLY the concatenated learned-BPE
    encodes of the curated survivors in doc_id order, cut every SEQ_LEN —
    a byte-level check that pins fragment placement and merge order, not
    just conservation totals.  Also pins the resume skip."""
    import time

    import pandas as pd
    import ray.data as rd

    from lightrag_ray.extras import bpe_train
    from lightrag_ray.extras import catalog as C
    from lightrag_ray.extras.packing import write_training_shards
    from lightrag_ray.functions.tokenizer import BPETokenizer

    out = str(tmp_path / "shards-out")
    meta = write_training_shards(SF_DIR, out, n_merges=50, seqs_per_shard=4)

    # expected stream: curated survivors (the ORACLED gate) in doc_id order,
    # encoded with the same trained merge table
    surv = (
        C.q_curated_corpus(SF_DIR)
        .to_pandas()
        .sort_values("doc_id")["doc_id"]
        .tolist()
    )
    docs = (
        rd.read_parquet(
            os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
        )
        .to_pandas()
        .set_index("doc_id")["text"]
    )
    merges, _ = bpe_train.train_bpe(SF_DIR, n_merges=50)
    tok = BPETokenizer(ranks=bpe_train.merges_to_ranks(merges))
    expected = [t for d in surv for t in tok.encode(docs.loc[d] or "")]

    df = (
        rd.read_parquet(meta["shards_dir"])
        .to_pandas()
        .sort_values("seq_id")
        .reset_index(drop=True)
    )
    actual = [t for toks in df["tokens"] for t in toks]
    assert actual == expected
    assert int(df["n_docs"].sum()) == len(surv) == meta["n_docs"]
    # every sequence except the ragged tail is exactly SEQ_LEN
    lens = df["tokens"].map(len)
    assert (lens.iloc[:-1] == P.SEQ_LEN).all()
    assert meta["ragged_tail"] == (lens.iloc[-1] != P.SEQ_LEN)
    # shard partitioning: seq_id // seqs_per_shard
    # hive partition values read back as strings
    assert (df["shard"].astype("int64") == df["seq_id"] // 4).all()
    # lineage rows agree with the oracled manifest flagship per shard
    lin = (
        rd.read_parquet(meta["lineage_dir"])
        .to_pandas()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    man = P.q_training_shards_bpe(SF_DIR, n_merges=50).to_pandas()
    man["shard"] = man["seq_id"] // 4
    agg = (
        man.groupby("shard")
        .agg(
            n_docs=("n_docs", "sum"),
            n_tokens=("n_tokens", "sum"),
            first_doc=("first_doc", "min"),
            last_doc=("last_doc", "max"),
        )
        .reset_index()
    )
    pd.testing.assert_frame_equal(
        lin[["shard", "n_docs", "n_tokens", "first_doc", "last_doc"]]
        .astype("int64")
        .reset_index(drop=True),
        agg.astype("int64"),
    )
    # resume: a second call returns the recorded meta without recomputing
    t0 = time.perf_counter()
    meta2 = write_training_shards(SF_DIR, out, n_merges=50, seqs_per_shard=4)
    assert meta2 == meta and time.perf_counter() - t0 < 1.0


def test_append_training_shards_incremental(ray_session, tmp_path):
    """Crawl-refresh append: base shard files stay byte-identical, the delta
    packs from the next SEQ_LEN boundary with the PERSISTED vocabulary (no
    retrain), lineage accumulates, and re-applying the same delta is an
    idempotent no-op."""
    import glob
    import hashlib

    import ray.data as rd

    from lightrag_ray.extras.packing import (
        append_training_shards,
        write_training_shards,
    )
    from lightrag_ray.functions.tokenizer import BPETokenizer

    out = str(tmp_path / "shards-base")
    meta = write_training_shards(SF_DIR, out, n_merges=50, seqs_per_shard=4)
    base_seqs = meta["n_seqs"]

    def snap():
        return {
            p: hashlib.md5(open(p, "rb").read()).hexdigest()
            for p in glob.glob(os.path.join(meta["shards_dir"], "**", "*.parquet"),
                               recursive=True)
        }

    base_files = snap()

    # delta corpus = the same pages with shifted doc ids (a refresh batch)
    delta = str(tmp_path / "delta")
    os.makedirs(delta)
    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                      columns=["doc_id", "text"])
    import pyarrow.compute as pc

    t = t.set_column(0, "doc_id", pc.add(t.column("doc_id"), 1_000_000))
    pq.write_table(t, os.path.join(delta, "documents.parquet"))

    meta2 = append_training_shards(delta, out)
    assert meta2["n_docs"] == 2 * meta["n_docs"]
    assert meta2["appends"][0]["start_seq"] == base_seqs

    after = snap()
    # base files untouched, byte for byte
    for p, h in base_files.items():
        assert after[p] == h
    assert len(after) > len(base_files)

    # delta content: same texts → same survivor encodes, packed from
    # seq_id = base_seqs with the persisted (not retrained) vocabulary
    df = (
        rd.read_parquet(meta["shards_dir"])
        .to_pandas()
        .sort_values("seq_id")
        .reset_index(drop=True)
    )
    base_df = df[df["seq_id"] < base_seqs]
    delta_df = df[df["seq_id"] >= base_seqs].reset_index(drop=True)
    assert delta_df["seq_id"].tolist() == list(
        range(base_seqs, base_seqs + len(delta_df))
    )
    base_stream = [t_ for toks in base_df["tokens"] for t_ in toks]
    delta_stream = [t_ for toks in delta_df["tokens"] for t_ in toks]
    assert delta_stream == base_stream  # identical texts, identical vocab
    # lineage accumulated to cover the delta shards too
    lin = rd.read_parquet(meta["lineage_dir"]).to_pandas()
    assert int(lin["n_docs"].sum()) == meta2["n_docs"]

    # idempotent re-apply: marker log detects the delta, nothing changes
    meta3 = append_training_shards(delta, out)
    assert meta3 == meta2
    assert snap() == after
