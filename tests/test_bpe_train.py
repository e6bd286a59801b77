"""BPE trainer: incremental-vs-naive parity, determinism, tiktoken-format
round-trip through the existing BPETokenizer encode path."""

from __future__ import annotations

import random

import pytest

from lightrag_ray.extras import bpe_train as B
from lightrag_ray.functions.tokenizer import BPETokenizer

SF_DIR = "/root/testdata/sf0.001"


def _hist(texts: list[str]) -> dict[bytes, int]:
    from collections import Counter

    pat = B._compiled(B.O200K_PATTERN)
    c: Counter = Counter()
    for t in texts:
        c.update(m.group().encode("utf-8") for m in pat.finditer(t))
    return dict(c)


def test_learn_merges_matches_naive_small():
    wc = _hist(
        [
            "the quick brown fox jumps over the lazy dog",
            "the lazy dog sleeps while the quick fox runs",
            "pack my box with five dozen liquor jugs",
        ]
        * 3
    )
    fast = B.learn_merges(wc, 40)
    naive = B.learn_merges_naive(wc, 40)
    assert fast == naive
    assert len(fast) > 0


def test_learn_merges_matches_naive_fuzz():
    rng = random.Random(7)
    alphabet = "abcdeXY あい"
    for trial in range(12):
        words = {}
        for _ in range(rng.randint(3, 30)):
            w = "".join(
                rng.choice(alphabet) for _ in range(rng.randint(1, 9))
            ).encode("utf-8")
            words[w] = rng.randint(1, 9)
        n = rng.randint(1, 25)
        assert B.learn_merges(words, n) == B.learn_merges_naive(words, n), trial


def test_learn_merges_overlapping_pairs_and_early_stop():
    # 'aaaa' ×3: pair (a,a) counts overlapping (3 per word = 9); first merge
    # gives 'aa'; second merges ('aa','aa')
    wc = {b"aaaa": 3}
    merges = B.learn_merges(wc, 10)
    assert merges == B.learn_merges_naive(wc, 10)
    assert merges[0][:2] == (b"a", b"a")
    assert merges[1][:2] == (b"aa", b"aa")
    # all-singleton histogram: nothing repeats, training stops at zero
    assert B.learn_merges({b"xy": 1}, 5) == []


def test_merged_tokens_unique_and_ranks_dense():
    # exhaust merges on a mixed histogram: every merged byte string must be
    # unique (tiktoken ranks are keyed by token bytes) and ranks dense
    wc = {b"zabzab": 6, b"ybcybc": 5, b"xabcv": 4, b"bcw": 3, b"aaaa": 7, b"aaa": 9}
    merges = B.learn_merges(wc, 30)
    assert merges == B.learn_merges_naive(wc, 30)
    ranks = B.merges_to_ranks(merges)
    toks = [a + b for a, b, _ in merges]
    assert len(set(toks)) == len(toks)
    assert sorted(ranks.values()) == list(range(len(ranks)))


def test_train_bpe_partitioning_invariant(ray_session):
    import ray.data as rd

    m1, s1 = B.train_bpe(SF_DIR, n_merges=48)
    # same corpus through a different block structure
    hist = B.word_histogram(SF_DIR)
    m2 = B.learn_merges(B.collect_histogram(hist)[0], 48)
    assert m1 == m2
    assert s1["kept_mass"] == s1["total_mass"]  # no truncation at sf0.001

    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["text"]).repartition(
        13
    )
    from collections import Counter

    pat = B._compiled(B.O200K_PATTERN)
    c: Counter = Counter()
    for batch in ds.iter_batches(batch_format="pyarrow"):
        for t in batch.column("text").to_pylist():
            c.update(m.group().encode("utf-8") for m in pat.finditer(t or ""))
    assert B.learn_merges(dict(c), 48) == m1


def test_truncated_histogram_still_trains(ray_session):
    counts, total, kept = B.collect_histogram(B.word_histogram(SF_DIR), max_words=50)
    assert len(counts) == 50 and kept < total
    merges = B.learn_merges(counts, 16)
    assert merges == B.learn_merges_naive(counts, 16)
    assert len(merges) > 0


def test_trained_vocab_round_trips_through_bpetokenizer(ray_session, tmp_path):
    merges, _ = B.train_bpe(SF_DIR, n_merges=64)
    ranks = B.merges_to_ranks(merges)
    path = str(tmp_path / "trained.tiktoken")
    B.write_tiktoken_vocab(ranks, path)
    tok_file = BPETokenizer(path)
    tok_mem = BPETokenizer(ranks=ranks)
    samples = [
        "The quick brown fox jumps over the lazy dog.",
        "Ray Data streams Arrow blocks with backpressure.",
        "  mixed   whitespace\nand\tpunctuation!! 12345",
    ]
    for s in samples:
        enc = tok_mem.encode(s)
        assert tok_file.encode(s) == enc
        assert tok_mem.decode(enc) == s
        # merges compress: fewer tokens than raw bytes once trained
        assert len(enc) <= len(s.encode("utf-8"))


def test_bpetokenizer_requires_exactly_one_source(tmp_path):
    with pytest.raises(ValueError):
        BPETokenizer()
    with pytest.raises(ValueError):
        BPETokenizer("x", ranks={b"a": 0})


def test_q_bpe_encode_stats_consistent(ray_session):
    import pyarrow.parquet as pq

    out = B.q_bpe_encode_stats(SF_DIR, n_merges=48).to_pandas()
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["lang", "text"])
    assert int(out["n_docs"].sum()) == docs.num_rows
    assert set(out["lang"]) == set(docs.column("lang").to_pylist())
    assert (out["n_tokens"] <= out["n_bytes"]).all()
    assert (out["n_tokens"] > 0).all()


def test_q_bpe_merges_shape(ray_session):
    t = B.q_bpe_merges(SF_DIR, n_merges=32).to_pandas()
    assert list(t.columns) == ["rank", "left", "right", "pair_count"]
    assert list(t["rank"]) == list(range(256, 256 + len(t)))
    assert (t["pair_count"] >= 2).all()
    # hex-decodable and concatenations unique
    toks = [bytes.fromhex(a) + bytes.fromhex(b) for a, b in zip(t["left"], t["right"])]
    assert len(set(toks)) == len(toks)
