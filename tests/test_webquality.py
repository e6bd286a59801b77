"""Unit tests for the webtext curation operators (extras/webquality.py).

DuckDB parity for all four ops runs automatically via
tests/test_extras.py's parametrization over catalog.oracle_sql(); here we
pin the kernels on crafted inputs where the expected values are hand-
computable — repetition arithmetic, boilerplate thresholding, and the PII
regex/redaction contract on genuinely PII-laden strings (independent of the
doc_id augmentation used for the driver oracle).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lightrag_ray.extras import webquality as W


def _write_docs(tmp_path, texts):
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(table, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_scan_pii_counts_and_redacts():
    e, p, i, red = W.scan_pii(
        "mail a.b_c@sub.example.org now, call 555-0199 or 555-12345, "
        "host 192.168.0.1 and 999.999.999.999 but not 1.2.3"
    )
    assert e == 1
    # 555-12345 fails the trailing \b? no — \b after 4 digits falls inside
    # the digit run, so only 555-0199 matches.
    assert p == 1
    # the regex is a scanner, not a validator: 999.999.999.999 matches by
    # design (same RE2 semantics as the oracle); 1.2.3 has 3 octets — no.
    assert i == 2
    assert "<EMAIL>" in red and "<PHONE>" in red and red.count("<IP>") == 2
    assert "a.b_c@sub.example.org" not in red
    assert "555-0199" not in red


def test_scan_pii_order_email_before_phone():
    # counts are computed sequentially post-redaction, same as the oracle.
    # The email local-part class has no hyphen, so only "0111@mail.com"
    # matches; the leading "x555-" survives and does NOT count as a phone
    # (no word boundary between "x" and "5").
    e, p, i, red = W.scan_pii("x555-0111@mail.com 555-0111")
    assert e == 1 and p == 1
    assert red == "x555-<EMAIL> <PHONE>"


def test_repetition_stats_hand_computed(ray_session, tmp_path):
    sf = _write_docs(tmp_path, ["a b a b c", "x x x", "", "solo"])
    rows = {
        r["doc_id"]: r
        for r in W.q_repetition_stats(sf).take_all()
    }
    # "a b a b c": 5 words, 3 distinct → 2 dup; top count 2 ("a"/"b");
    # bigrams: "a b","b a","a b","b c" → 4, distinct 3 → 1 dup
    assert rows[0] == {
        "doc_id": 0,
        "n_words": 5,
        "n_dup_words": 2,
        "top_word_count": 2,
        "n_2grams": 4,
        "n_dup_2grams": 1,
    }
    # "x x x": 3 words 1 distinct → 2 dup; top 3; bigrams "x x","x x" → 1 dup
    assert rows[1]["n_dup_words"] == 2
    assert rows[1]["top_word_count"] == 3
    assert rows[1]["n_2grams"] == 2 and rows[1]["n_dup_2grams"] == 1
    # empty doc: all zeros
    assert rows[2]["n_words"] == 0 and rows[2]["top_word_count"] == 0
    assert rows[3] == {
        "doc_id": 3,
        "n_words": 1,
        "n_dup_words": 0,
        "top_word_count": 1,
        "n_2grams": 0,
        "n_dup_2grams": 0,
    }


def test_boilerplate_threshold_and_frac(ray_session, tmp_path):
    # 10 docs: "nav home about" is a planted template shingle in 4 of them
    # (min_df = max(2, ceil(10/100)) = 2); "p q r" appears once — below.
    texts = ["nav home about body %d" % i for i in range(4)] + [
        "p%d q%d r%d unique" % (i, i, i) for i in range(6)
    ]
    sf = _write_docs(tmp_path, texts)
    boiler = {
        r["shingle"]: r["df"] for r in W.q_boilerplate_ngrams(sf).take_all()
    }
    assert boiler["nav home about"] == 4
    assert "p0 q0 r0" not in boiler  # df=1 < 2 (every tail doc differs)
    assert all(df >= 2 for df in boiler.values())

    frac = {r["doc_id"]: r for r in W.q_boilerplate_frac(sf).take_all()}
    # "nav home about body 0": 5 words → 3 trigram positions; hits =
    # positions whose trigram is boilerplate (at least "nav home about";
    # "home about body" also has df=4 → boiler too; "about body i" differs
    # per doc → df=1).
    assert frac[0]["n_3grams"] == 3
    assert frac[0]["n_boiler_3grams"] == 2
    assert frac[9]["n_boiler_3grams"] == 0


def test_min_df_integer_arithmetic():
    assert W._min_df(10) == 2  # floor
    assert W._min_df(100) == 2
    assert W._min_df(101) == 2  # ceil(101/100)
    assert W._min_df(201) == 3
    assert W._min_df(500) == 5
    assert W._min_df(5000) == 50


def test_boilerplate_over_guard_uses_sharded_arm(ray_session, tmp_path, monkeypatch):
    """Past the broadcast guard the scorer no longer raises: the
    shingle-hash-sharded join arm must produce the identical table."""
    texts = ["one shared template line x" for _ in range(5)] + ["zz", ""]
    sf = _write_docs(tmp_path, texts)
    base = (
        W.q_boilerplate_frac(sf).to_pandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    monkeypatch.setattr(W, "MAX_BROADCAST_SHINGLES", 0)
    fb = (
        W.q_boilerplate_frac(sf).to_pandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, fb[base.columns], check_dtype=False)
    assert base["n_boiler_3grams"].sum() > 0


def test_pii_scan_augmentation_round_trip(ray_session, tmp_path):
    sf = _write_docs(tmp_path, ["hello world", ""])
    rows = {r["doc_id"]: r for r in W.q_pii_scan(sf).take_all()}
    assert rows[0]["n_emails"] == 1
    assert rows[0]["n_phones"] == 1
    assert rows[0]["n_ips"] == 1
    assert rows[0]["redacted"] == (
        "hello world contact <EMAIL> or call <PHONE> from <IP>"
    )
    assert rows[1]["redacted"].startswith(" contact <EMAIL>")


def test_lm_quality_hand_computed(ray_session, tmp_path):
    # corpus: "a a b" + "a c" + "" → tf: a=3, b=1, c=1; T=5, bitlen(T)=3.
    # surprisal bits: a → 3-2=1, b → 3-1=2, c → 3-1=2.
    sf = _write_docs(tmp_path, ["a a b", "a c", ""])
    rows = {r["doc_id"]: r for r in W.q_lm_quality(sf).take_all()}
    assert rows[0] == {
        "doc_id": 0,
        "n_tokens": 3,
        "lm_bits": 1 + 1 + 2,
        "avg_bits_x100": (100 * 4) // 3,
    }
    assert rows[1]["lm_bits"] == 1 + 2 and rows[1]["avg_bits_x100"] == 150
    # empty document: zero tokens, zero bits, zero average (oracle LEFT JOIN)
    assert rows[2] == {
        "doc_id": 2,
        "n_tokens": 0,
        "lm_bits": 0,
        "avg_bits_x100": 0,
    }


def test_lm_quality_over_guard_uses_sharded_arm(ray_session, tmp_path, monkeypatch):
    """Past the vocab guard the LM no longer raises: the term-hash-sharded
    arm (distributed surprisal table + token→shard join) must produce the
    identical integer scores, including the zero-token document row."""
    sf = _write_docs(tmp_path, ["a a b", "a c", ""])
    base = (
        W.q_lm_quality(sf).to_pandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    monkeypatch.setattr(W, "MAX_LM_VOCAB", 1)
    fb = (
        W.q_lm_quality(sf).to_pandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, fb[base.columns], check_dtype=False)
    assert (fb[fb["doc_id"] == 2]["n_tokens"] == 0).all()


def test_compression_ratio_discriminates(ray_session, tmp_path):
    """Repetitive text must compress far better than diverse text, and the
    integer ratio must be the exact floor of 1000·comp/raw."""
    import zlib

    repetitive = "spam ham " * 200
    diverse = " ".join(f"w{i}x{i * 7 % 97}" for i in range(400))
    sf = _write_docs(tmp_path, [repetitive, diverse, ""])
    rows = {r["doc_id"]: r for r in W.q_compression_ratio(sf).take_all()}
    for i, text in enumerate([repetitive, diverse]):
        raw = text.encode()
        comp = zlib.compress(raw, 9)
        assert rows[i]["n_raw"] == len(raw)
        assert rows[i]["n_comp"] == len(comp)
        assert rows[i]["ratio_x1000"] == (1000 * len(comp)) // len(raw)
    assert rows[0]["ratio_x1000"] < rows[1]["ratio_x1000"] // 4
    assert rows[2] == {"doc_id": 2, "n_raw": 0, "n_comp": len(zlib.compress(b"", 9)), "ratio_x1000": 0}


def test_char_entropy_bits_hand_computed(ray_session, tmp_path):
    # "aab": n=3 bitlen 2; counts a=2 (bitlen 2), b=1 (bitlen 1);
    # bits = 2*(2-2) + 1*(2-1) = 1.  "zzzz": n=4 bitlen 3, z=4 bitlen 3 → 0.
    sf = _write_docs(tmp_path, ["aab", "zzzz", ""])
    rows = {r["doc_id"]: r for r in W.q_char_entropy_bits(sf).take_all()}
    assert rows[0] == {"doc_id": 0, "n_chars": 3, "self_info_bits": 1}
    assert rows[1] == {"doc_id": 1, "n_chars": 4, "self_info_bits": 0}
    assert rows[2] == {"doc_id": 2, "n_chars": 0, "self_info_bits": 0}


def test_host_quality_gate_hand_computed(ray_session, tmp_path):
    """7 hosts keyed doc_id % 7; docs 0..6 so one doc per host.  Tokens per
    doc: host h gets h+1 words -> corpus mean = 4; kept hosts are h >= 3
    (mean-per-host >= corpus mean via integer cross-multiplication)."""
    texts = [" ".join(["w"] * (h + 1)) for h in range(7)]
    sf = _write_docs(tmp_path, texts)
    out = W.q_host_quality_gate(sf).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [3, 4, 5, 6]
    assert out["host"].tolist() == [f"site{h}.example.com" for h in (3, 4, 5, 6)]
    assert out["host_n_docs"].tolist() == [1, 1, 1, 1]
    assert out["host_sum_words"].tolist() == [4, 5, 6, 7]


def test_host_gate_keep_python_ints_no_overflow():
    # web-scale products overflow int64; the gate must use Python ints
    assert W._host_gate_keep(10**9, 10**12 * 10, 10**9, 10**12)
    assert not W._host_gate_keep(10**9, 10**11, 10**9, 10**12)


def test_host_quality_gate_over_guard_uses_cogroup_arm(
    ray_session, tmp_path, monkeypatch
):
    """Past the broadcast guard the gate degrades to the host-hash bucketed
    cogroup join and must produce the identical table."""
    texts = [" ".join(["w"] * ((i * 13) % 29 + 1)) for i in range(40)]
    sf = _write_docs(tmp_path, texts)
    base = (
        W.q_host_quality_gate(sf).to_pandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    monkeypatch.setattr(W, "MAX_HOST_BROADCAST", 0)
    fb = (
        W.q_host_quality_gate(sf).to_pandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, fb[base.columns], check_dtype=False)
    assert 0 < len(base) < 40  # the gate actually discriminates


def test_domain_mixture_hand_computed(ray_session, tmp_path):
    """Largest-remainder allocation: slots sum EXACTLY to the budget, the
    +1 winners are the largest remainders with host-ASC tie-break."""
    # hosts are doc_id % 7: three docs on three distinct hosts, one word each
    sf = _write_docs(tmp_path, ["alpha", "beta", "gamma"])
    out = (
        W.q_domain_mixture(sf)
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    assert len(out) == 3
    assert int(out["slots"].sum()) == W.DOMAIN_MIX_BUDGET
    # tot=3: base = 333333 each, rem = 1 each, deficit = 1 → the host-ASC
    # tie-break gives the single +1 to site0
    assert out.loc[out["host"] == "site0.example.com", "slots"].iloc[0] == 333334
    assert (out.loc[out["host"] != "site0.example.com", "slots"] == 333333).all()
    assert (out["n_tokens"] == 1).all()


def test_domain_mixture_empty_corpus(ray_session, tmp_path):
    sf = _write_docs(tmp_path, [])
    ds = W.q_domain_mixture(sf)
    assert ds.count() == 0
    assert sorted(ds.schema().names) == ["host", "n_tokens", "slots"]
