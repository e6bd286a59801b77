"""Distributed BPE tokenizer *training* over the documents corpus.

The reference ships with a fixed pretrained vocabulary (tiktoken o200k,
``lightrag/utils.py:3096-3123``); a training-data engine additionally needs
to LEARN a tokenizer from the corpus it curates.  This module closes that
loop: the corpus streams once through a pretokenize-and-count combiner, the
resulting word histogram (vocabulary-bounded, NOT corpus-bounded) is
reduced by a small groupby, and the classic BPE merge loop runs driver-side
over that bounded histogram — the same shape every public BPE trainer uses
(SentencePiece / GPT-2 / minbpe train on a word-frequency table, not on the
raw token stream).

Scale story (100 TB):
- The only corpus-sized pass is the pretokenize map; each batch emits one
  ``(piece, n)`` partial row per *distinct* piece in the batch, so the
  shuffle carries ~|vocab| rows per block, not one row per token.
- The merge loop's input is capped at ``max_words`` distinct pieces taken
  by ``(n DESC, piece ASC)`` — a deterministic truncation with the dropped
  token mass measured and reported (web-scale Zipf vocabularies put
  >99.9 % of token mass in the top ~1M pieces).  The loop itself is
  corpus-size independent: O(max_words) state, lazy max-heap over pair
  counts.
- Applying the learned vocabulary is the existing
  :class:`~lightrag_ray.functions.tokenizer.BPETokenizer` encode path:
  ranks are broadcast once via ``ray.put`` and each actor rebuilds its
  tokenizer in ``__init__``.

Merge conventions (pinned by tests against the quadratic reference trainer
in this module):
- adjacency counts are overlapping (``zip(parts, parts[1:])`` — ``aaa``
  contributes the pair ``(a, a)`` twice),
- the best pair is max count, ties broken by the lexicographically
  smallest ``(left, right)`` bytes pair,
- in-word replacement is greedy left-to-right,
- training stops early when no pair occurs at least twice,
- if a chosen pair's concatenation already exists as a token (two merge
  routes to the same byte string — possible, though vanishingly rare on
  natural text), the words are rewritten but no duplicate vocabulary entry
  is created: tiktoken-format ranks are keyed by token *bytes*, and the
  byte-identical token unifies naturally in the encoder.
"""

from __future__ import annotations

import heapq
import os
from collections import Counter, defaultdict
from typing import Iterable

import pyarrow as pa

from lightrag_ray.functions.tokenizer import O200K_PATTERN

_PAT_CACHE: dict[str, object] = {}


def _compiled(pattern: str):
    pat = _PAT_CACHE.get(pattern)
    if pat is None:
        import regex

        pat = _PAT_CACHE[pattern] = regex.compile(pattern)
    return pat


# Bound on the driver-collected histogram (rows, not bytes): 2M pieces at a
# ~20 B mean piece is ~40 MB plus counts — comfortably a broadcast-class
# object.  Module-level so tests can force the truncated arm.
MAX_TRAIN_WORDS = 2_000_000


def word_histogram(sf_dir: str, pattern: str = O200K_PATTERN):
    """``(piece: binary, n: int64)`` Dataset: corpus pretokenizer-piece
    counts, combined per batch before the vocabulary-bounded groupby."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        pat = _compiled(pattern)
        counts: Counter = Counter()
        for text in batch.column("text").to_pylist():
            counts.update(m.group().encode("utf-8") for m in pat.finditer(text or ""))
        pieces = sorted(counts)
        return pa.table(
            {
                "piece": pa.array(pieces, pa.binary()),
                "n": pa.array([counts[p] for p in pieces], pa.int64()),
            }
        )

    return (
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
        .map_batches(partial_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("piece")
        .aggregate(Sum("n", alias_name="n"))
    )


def collect_histogram(
    hist_ds, max_words: int = MAX_TRAIN_WORDS
) -> tuple[dict[bytes, int], int, int]:
    """Driver-collect the (bounded) histogram.

    Returns ``(word_counts, total_mass, kept_mass)``.  The histogram is
    vocabulary-bounded so materializing it is safe; if it still exceeds
    ``max_words`` distinct pieces the top slice by ``(n DESC, piece ASC)``
    is kept — a deterministic truncation whose dropped mass the caller can
    report (Zipf: negligible for any natural corpus)."""
    hist = hist_ds.materialize()
    total_mass = int(hist.sum(on="n") or 0)
    if hist.count() > max_words:
        hist = hist.sort(["n", "piece"], descending=[True, False]).limit(max_words)
    counts: dict[bytes, int] = {}
    for batch in hist.iter_batches(batch_format="pyarrow"):
        for piece, n in zip(
            batch.column("piece").to_pylist(), batch.column("n").to_pylist()
        ):
            counts[piece] = counts.get(piece, 0) + int(n)
    kept_mass = sum(counts.values())
    return counts, total_mass, kept_mass


def learn_merges_naive(
    word_counts: dict[bytes, int], n_merges: int
) -> list[tuple[bytes, bytes, int]]:
    """Quadratic reference trainer: recount every adjacent pair from
    scratch each step.  Semantic oracle for :func:`learn_merges`."""
    words = {w: [w[i : i + 1] for i in range(len(w))] for w in word_counts}
    vocab = {bytes([b]) for b in range(256)}
    merges: list[tuple[bytes, bytes, int]] = []
    while len(merges) < n_merges:
        pair_counts: Counter = Counter()
        for w, parts in words.items():
            c = word_counts[w]
            for p in zip(parts, parts[1:]):
                pair_counts[p] += c
        best = None
        for p, c in pair_counts.items():
            if c < 2:
                continue
            if best is None or c > best[1] or (c == best[1] and p < best[0]):
                best = (p, c)
        if best is None:
            break
        (a, b), c = best
        merged = a + b
        for w, parts in words.items():
            words[w] = _replace_pair(parts, a, b, merged)
        if merged not in vocab:
            vocab.add(merged)
            merges.append((a, b, c))
    return merges


def _replace_pair(
    parts: list[bytes], a: bytes, b: bytes, merged: bytes
) -> list[bytes]:
    out: list[bytes] = []
    i = 0
    n = len(parts)
    while i < n:
        if i < n - 1 and parts[i] == a and parts[i + 1] == b:
            out.append(merged)
            i += 2
        else:
            out.append(parts[i])
            i += 1
    return out


def learn_merges(
    word_counts: dict[bytes, int], n_merges: int
) -> list[tuple[bytes, bytes, int]]:
    """Incremental BPE trainer over a word histogram.

    A pair→word-indices inverted index confines each merge's bookkeeping to
    the words that actually contain the pair, and a lazy max-heap (stale
    entries skipped by comparing against the live count) yields the best
    pair in O(log) pops instead of a full scan per merge — O(updates) total
    instead of O(n_merges × |pairs|).  Output (and every tie-break) is
    pinned to :func:`learn_merges_naive` by fuzz tests."""
    idx_of: list[bytes] = sorted(word_counts)
    counts: list[int] = [word_counts[w] for w in idx_of]
    words: list[list[bytes]] = [
        [w[i : i + 1] for i in range(len(w))] for w in idx_of
    ]

    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for wi, parts in enumerate(words):
        c = counts[wi]
        for p in zip(parts, parts[1:]):
            pair_counts[p] += c
            pair_words[p].add(wi)
    # heap of (-count, pair); stale entries are skipped on pop
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    vocab = {bytes([b]) for b in range(256)}
    merges: list[tuple[bytes, bytes, int]] = []
    # safety bound: byte-collision merges (no vocab growth) don't count
    # toward n_merges, so cap total loop trips independently
    for _ in range(4 * n_merges + 64):
        if len(merges) >= n_merges:
            break
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            c = pair_counts.get(p, 0)
            if c == -negc and c >= 2:
                best = (p, c)
                break
        if best is None:
            break
        (a, b), c = best
        merged = a + b
        for wi in sorted(pair_words[(a, b)]):
            parts = words[wi]
            wc = counts[wi]
            for p in zip(parts, parts[1:]):
                pair_counts[p] -= wc
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                else:
                    heapq.heappush(heap, (-pair_counts[p], p))
                pair_words[p].discard(wi)
            new = _replace_pair(parts, a, b, merged)
            words[wi] = new
            for p in zip(new, new[1:]):
                pair_counts[p] += wc
                heapq.heappush(heap, (-pair_counts[p], p))
                pair_words[p].add(wi)
        if merged not in vocab:
            vocab.add(merged)
            merges.append((a, b, c))
    return merges


def merges_to_ranks(merges: Iterable[tuple[bytes, bytes, int]]) -> dict[bytes, int]:
    """tiktoken-format rank table: bytes 0–255 first, merged tokens after
    in merge order.  Feeds :class:`BPETokenizer` directly."""
    ranks = {bytes([b]): b for b in range(256)}
    for a, b, _c in merges:
        ranks[a + b] = len(ranks)
    return ranks


def write_tiktoken_vocab(ranks: dict[bytes, int], path: str) -> None:
    """Write ``base64(token) rank`` lines (tiktoken ``load_tiktoken_bpe``
    format) so the trained vocabulary is a drop-in ``vocab_path``."""
    import base64

    with open(path, "wb") as f:
        for tok, rank in sorted(ranks.items(), key=lambda kv: kv[1]):
            f.write(base64.b64encode(tok) + b" " + str(rank).encode() + b"\n")


def train_bpe(
    sf_dir: str,
    n_merges: int = 200,
    pattern: str = O200K_PATTERN,
    max_words: int | None = None,
) -> tuple[list[tuple[bytes, bytes, int]], dict]:
    """Corpus → learned merges.  Returns ``(merges, stats)`` where stats
    records the histogram size and the kept/total token-mass coverage of
    the (possibly truncated) training table."""
    cap = MAX_TRAIN_WORDS if max_words is None else max_words
    counts, total_mass, kept_mass = collect_histogram(
        word_histogram(sf_dir, pattern), max_words=cap
    )
    merges = learn_merges(counts, n_merges)
    stats = {
        "n_words": len(counts),
        "total_mass": total_mass,
        "kept_mass": kept_mass,
        "n_merges": len(merges),
    }
    return merges, stats


def q_bpe_merges(sf_dir: str, n_merges: int = 200):
    """Catalog entry: the learned merge table ``(rank, left, right,
    pair_count)`` with token bytes hex-encoded for a stable hashable
    rendering.  rows-only (the merge loop is iterative — no SQL oracle);
    exactness is pinned by the naive-trainer fuzz and the determinism
    tests in tests/test_bpe_train.py."""
    merges, _stats = train_bpe(sf_dir, n_merges=n_merges)
    return pa.table(
        {
            "rank": pa.array(range(256, 256 + len(merges)), pa.int64()),
            "left": pa.array([a.hex() for a, _b, _c in merges], pa.string()),
            "right": pa.array([b.hex() for _a, b, _c in merges], pa.string()),
            "pair_count": pa.array([c for _a, _b, c in merges], pa.int64()),
        }
    )


def q_bpe_encode_stats(sf_dir: str, n_merges: int = 200):
    """Catalog entry: train on the corpus, then encode the corpus with the
    learned vocabulary — per-language ``(lang, n_docs, n_tokens, n_bytes)``.
    The rank table ships once via ``ray.put``; each encode actor rebuilds
    its :class:`BPETokenizer` in ``__init__`` (per-piece LRU intact).
    rows-only; self-consistency (n_tokens ≤ n_bytes, round-trip identity)
    is pinned by tests."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    merges, _stats = train_bpe(sf_dir, n_merges=n_merges)
    ranks_ref = ray.put(merges_to_ranks(merges))

    class Encode:
        def __init__(self):
            from lightrag_ray.functions.tokenizer import BPETokenizer

            self._tok = BPETokenizer(ranks=ray.get(ranks_ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            langs = batch.column("lang").to_pylist()
            texts = batch.column("text").to_pylist()
            agg: dict[str, list[int]] = {}
            for lang, text in zip(langs, texts):
                text = text or ""
                row = agg.setdefault(lang, [0, 0, 0])
                row[0] += 1
                row[1] += len(self._tok.encode(text))
                row[2] += len(text.encode("utf-8"))
            keys = sorted(agg)
            return pa.table(
                {
                    "lang": pa.array(keys, pa.string()),
                    "n_docs": pa.array([agg[k][0] for k in keys], pa.int64()),
                    "n_tokens": pa.array([agg[k][1] for k in keys], pa.int64()),
                    "n_bytes": pa.array([agg[k][2] for k in keys], pa.int64()),
                }
            )

    return (
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
        )
        .map_batches(
            # autoscaling pool: a FIXED pool this wide deadlocks a small
            # test cluster by starving the upstream read (README design
            # note on oversubscribed fixed pools)
            Encode,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        )
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_bytes", alias_name="n_bytes"),
        )
    )
