"""Hyperlink-graph operators: anchor extraction, degree stats, fixed-point
PageRank and k-core decomposition over the crawl's link graph.

The link graph is THE web-native structure a Common-Crawl-style corpus
carries beyond its text: which page links to which.  Four operators, each
a streaming Ray Data pipeline with an exact DuckDB oracle:

* **Anchor extraction** (``link_edges``): parse ``<a href=...>`` targets out
  of the binary ``html`` column with one compiled regex per actor — the
  crawl-side edge-list builder.  The synthetic ``documents`` table has no
  hyperlinks, so the page html is a deterministic augmentation derived from
  ``doc_id`` (same precedent as the url/timestamp augmentation in
  extras/webcrawl.py and the PII augmentation in extras/webquality.py): the
  link RULE is stated identically in the SQL oracles, while the Ray side
  round-trips it through real html synthesis + regex parsing — so the
  hash-check covers the extraction kernel, not just the arithmetic.
* **Degree stats** (``link_stats``): in/out-degree per page, top-k by
  in-degree — one bounded-bucket exchange with segmented ``reduceat``
  counts (never a per-node ``map_groups``).
* **PageRank** (``pagerank_top20``): the classic power iteration (Page et
  al. 1999, damping 85/100, dangling mass redistributed uniformly) run a
  FIXED number of rounds in exact int64 fixed-point (1.0 ≡ 10^12).  Floats
  would make the result depend on summation order — different between Ray's
  block-parallel reduces, a re-run, and the SQL oracle; integer arithmetic
  is associative, so the output is bit-reproducible and the oracle is the
  same recurrence unrolled as CTEs.
* **K-core decomposition** (``kcore_nodes``): iterative peel of the
  undirected simple link graph (Seidman 1983) — the dense-core extractor
  behind link-farm/spam filtering.  Monotone peel with a free count()-based
  fixpoint check; the oracle unrolls the peel, which is idempotent at the
  fixpoint.

Scale shape (the part that matters at 10^9+ nodes):
  - The text/html column never enters the iteration — edges are extracted
    once into a skinny (src, tgt) table.
  - Adjacency (src, tgt, outdeg) is built with ONE bounded-bucket exchange
    and reused by every iteration.
  - Per iteration: one streaming sum over the materialized rank table (the
    dangling mass — a scalar), then two bounded-bucket exchanges: ranks
    co-grouped with adjacency on bucket(src) → per-edge contributions
    pre-combined per target inside each bucket; contributions co-grouped
    with the node universe on bucket(node) → new ranks.  All group kernels
    are lexsort + ``searchsorted`` + ``reduceat`` — no per-row Python, no
    per-key pandas groups (the CC-kernel idiom from extras/dedup.py).
  - The rank table is materialized each round (node, rank, dangling ≈ 17
    B/row — the standard iterative-algorithm state), so iteration i never
    re-executes iterations 1..i-1.
  - Block counts are BOUNDED per round: ``map_groups`` emits as many output
    blocks as its sort-input had, and each round unions the previous round's
    output twice, so without a bound the block count follows
    b_{i+1} = 2·b_i + b_adj — geometric in the iteration count, and the
    sort scheduler's metadata goes quadratic in it (measured: the 5-round
    bench leg's driver-memory estimate climbed 7 → 27 GB before the fix).
    Every materialized state table is therefore ``repartition``-ed back to
    ``buckets`` blocks (there are only ``buckets`` groups, so a wider sort
    cannot parallelize further anyway), making every round's shuffle an
    identical bounded exchange.

Reference intent: LightRAG exposes graph-degree analytics over its KG
(``lightrag/kg/networkx_impl.py`` node_degree/edge_degree, used by the
query path's edge ranking at ``lightrag/operate.py``); the hyperlink graph
is the crawl-side analogue, and PageRank is the canonical centrality the
reference's degree ranking approximates.
"""

from __future__ import annotations

import os
import re
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lightrag_ray.extras.dedup import _cc_bucket_of

# --- the deterministic link rule (mirrored verbatim in the SQL oracles) ---
# page d is DANGLING (no outlinks) iff d % 11 == 0; otherwise it links to
# 1 + (d % 4) targets t_k = (d*MULT + k*STEP + OFF) % n, k = 1..K, with
# self-links dropped.  Parallel duplicate edges (possible for some n) are
# kept — real pages repeat links, and both sides count them identically.
_MULT = 2654435761  # Knuth multiplicative hash constant
_STEP = 40503
_OFF = 12345
_DANGLE_MOD = 11
_MAX_K = 4

FP_ONE = 10**12  # fixed-point 1.0
_DAMP_NUM, _DAMP_DEN = 85, 100
_PR_ITERS = 5
_BUCKETS = 64

_HREF_RE = re.compile(rb'<a\s+href="https://w\.example\.org/doc/(\d+)"')


def _synth_anchor_html(batch: pa.Table, n: int) -> pa.Table:
    """documents → (doc_id, html) with deterministic anchor links."""
    ids = np.asarray(batch.column("doc_id"), np.int64)
    htmls = []
    for d in ids:
        d = int(d)
        if d % _DANGLE_MOD == 0:
            body = ""
        else:
            body = "".join(
                f'<li><a href="https://w.example.org/doc/{t:010d}">'
                f"doc {t} ref{d % 3}</a></li>"
                for k in range(1, 2 + d % _MAX_K)
                if (t := (d * _MULT + k * _STEP + _OFF) % n) != d
            )
        htmls.append(f"<html><body><ul>{body}</ul></body></html>".encode())
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "html": pa.array(htmls, pa.binary()),
        }
    )


def extract_links(batch: pa.Table) -> pa.Table:
    """(doc_id, html) → (src, tgt) anchor edge list — the real parse kernel."""
    ids = np.asarray(batch.column("doc_id"), np.int64)
    src_out: list[int] = []
    tgt_out: list[int] = []
    for d, h in zip(ids, batch.column("html").to_pylist()):
        if not h:
            continue
        for m in _HREF_RE.findall(h):
            src_out.append(int(d))
            tgt_out.append(int(m))
    return pa.table(
        {
            "src": pa.array(src_out, pa.int64()),
            "tgt": pa.array(tgt_out, pa.int64()),
        }
    )


_ANCHOR_RE = re.compile(
    rb'<a\s+href="https://w\.example\.org/doc/(\d+)">([^<]*)</a>'
)


def extract_anchors(batch: pa.Table) -> pa.Table:
    """(doc_id, html) → (src, tgt, anchor) — href target + INNER TEXT."""
    ids = np.asarray(batch.column("doc_id"), np.int64)
    src_out: list[int] = []
    tgt_out: list[int] = []
    txt_out: list[str] = []
    for d, h in zip(ids, batch.column("html").to_pylist()):
        if not h:
            continue
        for m in _ANCHOR_RE.finditer(h):
            src_out.append(int(d))
            tgt_out.append(int(m.group(1)))
            txt_out.append(m.group(2).decode("utf-8", "replace"))
    return pa.table(
        {
            "src": pa.array(src_out, pa.int64()),
            "tgt": pa.array(tgt_out, pa.int64()),
            "anchor": pa.array(txt_out, pa.string()),
        }
    )


def _doc_count(sf_dir: str) -> int:
    """Corpus row count from Parquet footer metadata only — accepts both a
    single file and a directory of part files (O(#files) at any scale)."""
    import glob

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "documents.parquet")
    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    return sum(pq.read_metadata(f).num_rows for f in files)


def link_edges_ds(sf_dir: str):
    """documents → synthesized anchor html → parsed (src, tgt) edges."""
    import ray.data as rd

    n = _doc_count(sf_dir)
    return (
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        )
        .map_batches(
            lambda b: _synth_anchor_html(b, n),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .map_batches(extract_links, batch_format="pyarrow", zero_copy_batch=True)
    )


def q_link_edges(sf_dir: str):
    return link_edges_ds(sf_dir)


# ---------------------------------------------------------------- degrees
def link_stats_ds(nodes_ds, edges_ds, k: int = 20, buckets: int = _BUCKETS):
    """Top-``k`` pages by in-degree with out-degree attached.

    One bounded-bucket exchange: per-edge (src → out tally) and (tgt → in
    tally) rows union with the node universe; each bucket counts both
    tallies with one lexsort + ``reduceat``.  The final sort sees one row
    per node (skinny), not per edge.
    """
    import pandas as pd

    UNION = pa.schema(
        [
            ("bucket", pa.int32()),
            ("node", pa.int64()),
            ("is_out", pa.int64()),
            ("is_in", pa.int64()),
        ]
    )

    def tag_edges(batch: pa.Table) -> pa.Table:
        src = batch.column("src").combine_chunks()
        tgt = batch.column("tgt").combine_chunks()
        node = pa.chunked_array([src, tgt]).combine_chunks()
        m, tot = len(src), len(node)
        is_out = np.zeros(tot, np.int64)
        is_out[:m] = 1
        return pa.table(
            {
                "bucket": _cc_bucket_of(node, buckets),
                "node": node,
                "is_out": pa.array(is_out, pa.int64()),
                "is_in": pa.array(1 - is_out, pa.int64()),
            },
            schema=UNION,
        )

    def tag_nodes(batch: pa.Table) -> pa.Table:
        node = batch.column("doc_id").cast(pa.int64()).combine_chunks()
        z = np.zeros(len(node), np.int64)
        return pa.table(
            {
                "bucket": _cc_bucket_of(node, buckets),
                "node": node,
                "is_out": pa.array(z, pa.int64()),
                "is_in": pa.array(z, pa.int64()),
            },
            schema=UNION,
        )

    def count_bucket(group: pd.DataFrame) -> pa.Table:
        nodes = group["node"].to_numpy(np.int64)
        outs = group["is_out"].to_numpy(np.int64)
        ins = group["is_in"].to_numpy(np.int64)
        order = np.argsort(nodes, kind="stable")
        nodes, outs, ins = nodes[order], outs[order], ins[order]
        uniq, idx = np.unique(nodes, return_index=True)
        return pa.table(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "in_deg": pa.array(np.add.reduceat(ins, idx), pa.int64())
                if len(uniq)
                else pa.array([], pa.int64()),
                "out_deg": pa.array(np.add.reduceat(outs, idx), pa.int64())
                if len(uniq)
                else pa.array([], pa.int64()),
            }
        )

    union = edges_ds.map_batches(
        tag_edges, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        nodes_ds.map_batches(tag_nodes, batch_format="pyarrow", zero_copy_batch=True)
    )
    stats = union.groupby("bucket").map_groups(count_bucket, batch_format="pandas")
    return stats.sort(["in_deg", "doc_id"], descending=[True, False]).limit(k)


def q_link_stats(sf_dir: str):
    import ray.data as rd

    nodes = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    return link_stats_ds(nodes, link_edges_ds(sf_dir), k=20)


# --------------------------------------------------------------- pagerank
RANK_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("node", pa.int64()),
        ("r", pa.int64()),
        ("dang", pa.bool_()),
    ]
)


def _build_adjacency(edges_ds, buckets: int):
    """edges → (bucket(src), src, tgt, od) with outdegree attached — one
    bounded-bucket exchange, reused by every PageRank iteration."""
    import pandas as pd

    def tag(batch: pa.Table) -> pa.Table:
        src = batch.column("src").combine_chunks()
        return pa.table(
            {
                "bucket": _cc_bucket_of(src, buckets),
                "src": src,
                "tgt": batch.column("tgt"),
            }
        )

    def attach_od(group: pd.DataFrame) -> pa.Table:
        src = group["src"].to_numpy(np.int64)
        tgt = group["tgt"].to_numpy(np.int64)
        order = np.argsort(src, kind="stable")
        src, tgt = src[order], tgt[order]
        uniq, idx, counts = np.unique(src, return_index=True, return_counts=True)
        od = np.repeat(counts.astype(np.int64), counts)
        src_arr = pa.array(src, pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(src_arr, buckets),
                "src": src_arr,
                "tgt": pa.array(tgt, pa.int64()),
                "od": pa.array(od, pa.int64()),
            }
        )

    return (
        edges_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(attach_od, batch_format="pandas")
        .repartition(buckets)
        .materialize()
    )


def _init_ranks(nodes_ds, adj, n: int, buckets: int):
    """(node, r0, dangling) — dangling = node absent from adjacency srcs.
    One cogroup exchange; adjacency srcs are pre-deduped per batch."""
    import pandas as pd

    UNION = pa.schema(
        [("bucket", pa.int32()), ("node", pa.int64()), ("is_node", pa.bool_())]
    )

    def tag_nodes(batch: pa.Table) -> pa.Table:
        node = batch.column("doc_id").cast(pa.int64()).combine_chunks()
        return pa.table(
            {
                "bucket": _cc_bucket_of(node, buckets),
                "node": node,
                "is_node": pa.array(np.ones(len(node), bool)),
            },
            schema=UNION,
        )

    def tag_srcs(batch: pa.Table) -> pa.Table:
        uniq = np.unique(np.asarray(batch.column("src"), np.int64))
        node = pa.array(uniq, pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(node, buckets),
                "node": node,
                "is_node": pa.array(np.zeros(len(uniq), bool)),
            },
            schema=UNION,
        )

    r0 = FP_ONE // n

    def init_bucket(group: pd.DataFrame) -> pa.Table:
        nodes = group["node"].to_numpy(np.int64)
        is_node = group["is_node"].to_numpy(bool)
        universe = np.unique(nodes[is_node])
        srcs = np.unique(nodes[~is_node])
        dang = ~np.isin(universe, srcs)
        node_arr = pa.array(universe, pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(node_arr, buckets),
                "node": node_arr,
                "r": pa.array(np.full(len(universe), r0, np.int64), pa.int64()),
                "dang": pa.array(dang, pa.bool_()),
            },
            schema=RANK_SCHEMA,
        )

    union = nodes_ds.map_batches(
        tag_nodes, batch_format="pyarrow", zero_copy_batch=True
    ).union(adj.map_batches(tag_srcs, batch_format="pyarrow", zero_copy_batch=True))
    return (
        union.groupby("bucket")
        .map_groups(init_bucket, batch_format="pandas")
        .repartition(buckets)
        .materialize()
    )


def pagerank_ds(
    nodes_ds,
    edges_ds,
    n: int,
    iters: int = _PR_ITERS,
    buckets: int = _BUCKETS,
):
    """Fixed-point PageRank over (src, tgt) edges; returns (node, r) ranks.

    Exact int64 recurrence (mirrored in the SQL oracle):
        r_0(v)  = FP_ONE // n
        dm_i    = Σ r_{i-1}(v) over dangling v
        c_i(t)  = Σ_{(s,t)∈E} r_{i-1}(s) // od(s)
        r_i(v)  = (15·FP_ONE)//(100·n) + (85·(c_i(v) + dm_i//n))//100
    """
    import pandas as pd

    adj = _build_adjacency(edges_ds, buckets)
    ranks = _init_ranks(nodes_ds, adj, n, buckets)

    CONTRIB_UNION = pa.schema(
        [
            ("bucket", pa.int32()),
            ("node", pa.int64()),
            ("r", pa.int64()),  # null on adjacency rows
            ("tgt", pa.int64()),  # null on rank rows
            ("od", pa.int64()),  # null on rank rows
        ]
    )
    RANK_UNION = pa.schema(
        [
            ("bucket", pa.int32()),
            ("node", pa.int64()),
            ("c", pa.int64()),  # null on universe rows
            ("dang", pa.bool_()),  # null on contrib rows
        ]
    )

    def tag_rank_for_send(batch: pa.Table) -> pa.Table:
        # only non-dangling ranks serve src lookups (dangling nodes have no
        # adjacency rows by construction)
        live = batch.filter(pc.invert(batch.column("dang")))
        m = live.num_rows
        return pa.table(
            {
                "bucket": live.column("bucket"),
                "node": live.column("node"),
                "r": live.column("r"),
                "tgt": pa.nulls(m, pa.int64()),
                "od": pa.nulls(m, pa.int64()),
            },
            schema=CONTRIB_UNION,
        )

    def tag_adj(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "bucket": batch.column("bucket"),
                "node": batch.column("src"),
                "r": pa.nulls(m, pa.int64()),
                "tgt": batch.column("tgt"),
                "od": batch.column("od"),
            },
            schema=CONTRIB_UNION,
        )

    def send_contribs(group: pd.DataFrame) -> pa.Table:
        is_rank = group["tgt"].isna().to_numpy()
        rank_nodes = group["node"].to_numpy(np.int64)[is_rank]
        rank_vals = group["r"].to_numpy()[is_rank].astype(np.int64)
        order = np.argsort(rank_nodes, kind="stable")
        rank_nodes, rank_vals = rank_nodes[order], rank_vals[order]
        src = group["node"].to_numpy(np.int64)[~is_rank]
        tgt = group["tgt"].to_numpy()[~is_rank].astype(np.int64)
        od = group["od"].to_numpy()[~is_rank].astype(np.int64)
        if not len(src):
            return pa.table(
                {
                    "bucket": pa.array([], pa.int32()),
                    "node": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                    "dang": pa.array([], pa.bool_()),
                },
                schema=RANK_UNION,
            )
        pos = np.searchsorted(rank_nodes, src)
        if not ((pos < len(rank_nodes)).all() and (rank_nodes[pos] == src).all()):
            raise RuntimeError("pagerank: edge src missing rank row in bucket")
        contrib = rank_vals[pos] // od
        # pre-combine per target inside the bucket before the exchange
        t_order = np.argsort(tgt, kind="stable")
        tgt_s, contrib_s = tgt[t_order], contrib[t_order]
        uniq, idx = np.unique(tgt_s, return_index=True)
        sums = np.add.reduceat(contrib_s, idx)
        node_arr = pa.array(uniq, pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(node_arr, buckets),
                "node": node_arr,
                "c": pa.array(sums, pa.int64()),
                "dang": pa.nulls(len(uniq), pa.bool_()),
            },
            schema=RANK_UNION,
        )

    base = (15 * FP_ONE) // (100 * n)

    def make_reduce_ranks(dang_share: int):
        def reduce_ranks(group: pd.DataFrame) -> pa.Table:
            is_univ = group["dang"].notna().to_numpy()
            universe = group["node"].to_numpy(np.int64)[is_univ]
            dang = group["dang"].to_numpy()[is_univ].astype(bool)
            u_order = np.argsort(universe, kind="stable")
            universe, dang = universe[u_order], dang[u_order]
            cn = group["node"].to_numpy(np.int64)[~is_univ]
            cv = group["c"].to_numpy()[~is_univ].astype(np.int64)
            csum = np.zeros(len(universe), np.int64)
            if len(cn):
                c_order = np.argsort(cn, kind="stable")
                cn_s, cv_s = cn[c_order], cv[c_order]
                uniq, idx = np.unique(cn_s, return_index=True)
                sums = np.add.reduceat(cv_s, idx)
                pos = np.searchsorted(universe, uniq)
                if not (
                    (pos < len(universe)).all() and (universe[pos] == uniq).all()
                ):
                    raise RuntimeError(
                        "pagerank: contribution target outside node universe"
                    )
                csum[pos] = sums
            new_r = base + (_DAMP_NUM * (csum + dang_share)) // _DAMP_DEN
            node_arr = pa.array(universe, pa.int64())
            return pa.table(
                {
                    "bucket": _cc_bucket_of(node_arr, buckets),
                    "node": node_arr,
                    "r": pa.array(new_r, pa.int64()),
                    "dang": pa.array(dang, pa.bool_()),
                },
                schema=RANK_SCHEMA,
            )

        return reduce_ranks

    def dangling_partial(batch: pa.Table) -> pa.Table:
        mask = np.asarray(batch.column("dang"), bool)
        vals = np.asarray(batch.column("r"), np.int64)
        return pa.table({"s": pa.array([int(vals[mask].sum())], pa.int64())})

    for _ in range(iters):
        dm = ranks.map_batches(
            dangling_partial, batch_format="pyarrow", zero_copy_batch=True
        ).sum("s")
        dang_share = int(dm or 0) // n
        contribs = (
            ranks.map_batches(
                tag_rank_for_send, batch_format="pyarrow", zero_copy_batch=True
            )
            .union(
                adj.map_batches(tag_adj, batch_format="pyarrow", zero_copy_batch=True)
            )
            .groupby("bucket")
            .map_groups(send_contribs, batch_format="pandas")
        )

        def tag_rank_universe(batch: pa.Table) -> pa.Table:
            m = batch.num_rows
            return pa.table(
                {
                    "bucket": batch.column("bucket"),
                    "node": batch.column("node"),
                    "c": pa.nulls(m, pa.int64()),
                    "dang": batch.column("dang"),
                },
                schema=RANK_UNION,
            )

        ranks = (
            contribs.union(
                ranks.map_batches(
                    tag_rank_universe, batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .groupby("bucket")
            .map_groups(make_reduce_ranks(dang_share), batch_format="pandas")
            # bound the state's block count so the NEXT round's sort shuffle
            # is the same width as this one (see module docstring: unbounded,
            # it doubles per round and the sort metadata goes quadratic)
            .repartition(buckets)
            .materialize()
        )

    return ranks


def q_pagerank_top20(sf_dir: str, k: int = 20):
    import ray.data as rd

    n = _doc_count(sf_dir)
    nodes = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    ranks = pagerank_ds(nodes, link_edges_ds(sf_dir), n)
    out = ranks.select_columns(["node", "r"]).sort(
        ["r", "node"], descending=[True, False]
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("node"), "rank_fp": batch.column("r")}
        )

    return out.limit(k).map_batches(
        rename, batch_format="pyarrow", zero_copy_batch=True
    )


# ----------------------------------------------------------------- k-core
# K-core decomposition (Seidman 1983) by iterative peel over the UNDIRECTED
# simple link graph: drop nodes with degree < K, drop their edges, repeat to
# the fixpoint.  The surviving core is the densely-interlinked region — the
# webgraph primitive behind link-farm/spam filtering and crawl
# prioritization.  The peel is MONOTONE (edges only ever leave), so two
# states of equal size are identical — convergence is a free count()
# comparison on the materialized round state, and the loop raises if the
# fixpoint needs more than ``iters`` rounds (same contract as the CC
# kernel's non-convergence raise in extras/dedup.py).  The SQL oracle
# unrolls ``iters`` rounds unconditionally; the peel is idempotent at the
# fixpoint, so an early-converged Ray run matches it exactly.
_KCORE_K = 3
_KCORE_ITERS = 4  # measured fixpoint is 2 rounds at 500..2.4M nodes (2× margin)

HALF_SCHEMA = pa.schema(
    [("bucket", pa.int32()), ("v", pa.int64()), ("o", pa.int64())]
)
_PEEL_UNION = pa.schema(
    [("bucket", pa.int32()), ("key", pa.int64()), ("v", pa.int64())]
)


def _build_half_edges(edges_ds, buckets: int):
    """directed (src, tgt) → simple undirected half-edges (bucket(v), v, o):
    self-loops dropped, parallel + reciprocal duplicates collapsed to ONE
    undirected edge, then each edge emitted as two half-edges so every
    node's full degree is visible in its own bucket.  One bounded exchange
    (every copy of pair (lo, hi) lands in bucket(lo))."""
    import pandas as pd

    def tag(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("src"), np.int64)
        tgt = np.asarray(batch.column("tgt"), np.int64)
        m = src != tgt
        lo = np.minimum(src[m], tgt[m])
        hi = np.maximum(src[m], tgt[m])
        lo_arr = pa.array(lo, pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(lo_arr, buckets),
                "v": lo_arr,
                "o": pa.array(hi, pa.int64()),
            },
            schema=HALF_SCHEMA,
        )

    def dedup_emit(group: pd.DataFrame) -> pa.Table:
        lo = group["v"].to_numpy(np.int64)
        hi = group["o"].to_numpy(np.int64)
        order = np.lexsort((hi, lo))  # no packed composite — safe past 2^31
        lo, hi = lo[order], hi[order]
        first = np.concatenate(
            ([True], (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1]))
        )
        lo, hi = lo[first], hi[first]
        v = np.concatenate([lo, hi])
        o = np.concatenate([hi, lo])
        v_arr = pa.array(v, pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(v_arr, buckets),
                "v": v_arr,
                "o": pa.array(o, pa.int64()),
            },
            schema=HALF_SCHEMA,
        )

    return (
        edges_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(dedup_emit, batch_format="pandas")
        .repartition(buckets)
        .materialize()
    )


def _peel_round(half, k: int, buckets: int):
    """One peel round = two bounded-bucket exchanges.

    A (by bucket(v)): each node's full half-edge run is local, so degree is
    the run length (simple graph); drop runs with degree < k, re-key the
    survivors' half-edges by their OTHER endpoint and emit kept-node marker
    rows alongside.  B (by bucket(key)): a half-edge survives iff its other
    endpoint has a marker in the same bucket — the membership test is a
    ``searchsorted`` against the bucket's sorted marker set, never a
    broadcast.  Output is re-keyed by v for the next round."""
    import pandas as pd

    def degree_filter(group: pd.DataFrame) -> pa.Table:
        v = group["v"].to_numpy(np.int64)
        o = group["o"].to_numpy(np.int64)
        order = np.argsort(v, kind="stable")
        v, o = v[order], o[order]
        uniq, counts = np.unique(v, return_counts=True)
        keep_node = counts >= k
        keep_edge = np.repeat(keep_node, counts)
        v_k, o_k = v[keep_edge], o[keep_edge]
        kept = uniq[keep_node]
        key = np.concatenate([o_k, kept])
        vcol = np.concatenate([v_k, np.zeros(len(kept), np.int64)])
        null_mask = np.concatenate(
            [np.zeros(len(v_k), bool), np.ones(len(kept), bool)]
        )
        key_arr = pa.array(key, pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(key_arr, buckets),
                "key": key_arr,
                "v": pa.array(vcol, pa.int64(), mask=null_mask),
            },
            schema=_PEEL_UNION,
        )

    def membership_filter(group: pd.DataFrame) -> pa.Table:
        is_marker = group["v"].isna().to_numpy()
        kept = np.unique(group["key"].to_numpy(np.int64)[is_marker])
        hv = group["v"].to_numpy()[~is_marker].astype(np.int64)
        ho = group["key"].to_numpy(np.int64)[~is_marker]
        if len(kept):
            pos = np.searchsorted(kept, ho)
            m = (pos < len(kept)) & (
                kept[np.minimum(pos, len(kept) - 1)] == ho
            )
        else:
            m = np.zeros(len(ho), bool)
        v_arr = pa.array(hv[m], pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(v_arr, buckets),
                "v": v_arr,
                "o": pa.array(ho[m], pa.int64()),
            },
            schema=HALF_SCHEMA,
        )

    return (
        half.groupby("bucket")
        .map_groups(degree_filter, batch_format="pandas")
        .groupby("bucket")
        .map_groups(membership_filter, batch_format="pandas")
        .repartition(buckets)
        .materialize()
    )


def kcore_ds(edges_ds, k: int = _KCORE_K, iters: int = _KCORE_ITERS,
             buckets: int = _BUCKETS):
    """(src, tgt) edges → (doc_id, degree) of the k-core's nodes, degree
    measured within the core's own edge set."""
    import pandas as pd

    half = _build_half_edges(edges_ds, buckets)
    prev = half.count()
    for _ in range(iters):
        half = _peel_round(half, k, buckets)
        cnt = half.count()
        if cnt == prev:
            break  # monotone peel: equal size ⇒ identical state ⇒ fixpoint
        prev = cnt
    else:
        raise RuntimeError(
            f"kcore: no fixpoint after {iters} rounds — raise iters"
        )

    def degrees(group: pd.DataFrame) -> pa.Table:
        uniq, counts = np.unique(group["v"].to_numpy(np.int64), return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "degree": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return half.groupby("bucket").map_groups(degrees, batch_format="pandas")


def q_kcore_nodes(sf_dir: str):
    return kcore_ds(link_edges_ds(sf_dir))


# ------------------------------------------------------------ triangles
# Per-node triangle counts + simple undirected degree — the inputs of the
# local clustering coefficient (2·tri / d·(d−1)), kept as exact integers so
# the driver hash cannot diverge on FP division.  Algorithm: degree-ordered
# wedge counting (Suri & Vassilvitskii 2011, "Counting Triangles and the
# Curse of the Last Reducer"): orient every undirected edge from its
# lower-(degree, id) endpoint to the higher one, generate wedges only among
# each apex's OUT-neighbours (out-degree is O(√m) under this orientation, so
# wedge volume is bounded by m^{3/2} instead of Σd² — the hub-killer), and
# close a wedge iff its (v, w) pair is itself an oriented edge.  Each
# triangle is found exactly once, at its lowest-(degree, id) corner.  Five
# bounded-bucket exchanges end to end; every group kernel is numpy
# (lexsort / reduceat / maximum.accumulate), never per-row Python.


def _segment_local_arange(counts: np.ndarray) -> np.ndarray:
    """[3,2] → [0,1,2,0,1] — vectorized per-segment arange."""
    total = int(counts.sum())
    idx = np.arange(total, dtype=np.int64)
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    return idx - starts


_TRI_ORIENT = pa.schema(
    [
        ("bucket", pa.int32()),
        ("lo", pa.int64()),
        ("hi", pa.int64()),
        ("is_lo", pa.bool_()),
        ("deg", pa.int64()),
    ]
)
_TRI_EDGE = pa.schema(
    [
        ("bucket", pa.int32()),
        ("src", pa.int64()),
        ("dst", pa.int64()),
        ("deg_dst", pa.int64()),
    ]
)
_TRI_MATCH = pa.schema(
    [
        ("bucket", pa.int32()),
        ("v", pa.int64()),
        ("w", pa.int64()),
        ("apex", pa.int64()),  # null ⇒ oriented-edge marker row
    ]
)
_TRI_FINAL = pa.schema(
    [
        ("bucket", pa.int32()),
        ("node", pa.int64()),
        ("deg", pa.int64()),
        ("tri", pa.int64()),
    ]
)


def triangle_counts_ds(nodes_ds, edges_ds, buckets: int = _BUCKETS):
    """(src, tgt) edges + node universe → (doc_id, degree, n_triangles)."""
    import pandas as pd

    half = _build_half_edges(edges_ds, buckets)

    # A (bucket(v) → bucket(lo)): each node's run is local, so its simple
    # degree is the run length; re-emit every half-edge keyed by the edge's
    # LOW endpoint carrying this endpoint's degree — the two copies of each
    # undirected edge meet in bucket(lo), one degree each.
    def attach_degree(group: pd.DataFrame) -> pa.Table:
        v = group["v"].to_numpy(np.int64)
        o = group["o"].to_numpy(np.int64)
        order = np.argsort(v, kind="stable")
        v, o = v[order], o[order]
        uniq, counts = np.unique(v, return_counts=True)
        deg = np.repeat(counts.astype(np.int64), counts)
        lo = np.minimum(v, o)
        hi = np.maximum(v, o)
        lo_arr = pa.array(lo, pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(lo_arr, buckets),
                "lo": lo_arr,
                "hi": pa.array(hi, pa.int64()),
                "is_lo": pa.array(v == lo, pa.bool_()),
                "deg": pa.array(deg, pa.int64()),
            },
            schema=_TRI_ORIENT,
        )

    # B (bucket(lo) → bucket(src)): pair the two degree-carrying copies of
    # each edge and orient it low-(deg, id) → high-(deg, id).
    def orient(group: pd.DataFrame) -> pa.Table:
        lo = group["lo"].to_numpy(np.int64)
        hi = group["hi"].to_numpy(np.int64)
        is_lo = group["is_lo"].to_numpy(bool)
        deg = group["deg"].to_numpy(np.int64)
        # exactly two rows per (lo, hi): is_lo=True (deg of lo) and False
        order = np.lexsort((~is_lo, hi, lo))  # lo-copy first within pair
        lo, hi, deg = lo[order], hi[order], deg[order]
        d_lo, d_hi = deg[0::2], deg[1::2]
        lo, hi = lo[0::2], hi[0::2]
        fwd = (d_lo < d_hi) | ((d_lo == d_hi) & (lo < hi))
        src = np.where(fwd, lo, hi)
        dst = np.where(fwd, hi, lo)
        deg_dst = np.where(fwd, d_hi, d_lo)
        src_arr = pa.array(src, pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(src_arr, buckets),
                "src": src_arr,
                "dst": pa.array(dst, pa.int64()),
                "deg_dst": pa.array(deg_dst, pa.int64()),
            },
            schema=_TRI_EDGE,
        )

    # C (bucket(src) → bucket(v)): each apex's out-run is local; emit every
    # ordered out-neighbour pair as a wedge (closing key in orientation
    # order, which needs deg_dst) plus the oriented edges themselves as
    # marker rows.  Pair generation is the vectorized within-segment
    # all-pairs expansion — no per-apex Python loop.
    def wedges(group: pd.DataFrame) -> pa.Table:
        src = group["src"].to_numpy(np.int64)
        dst = group["dst"].to_numpy(np.int64)
        deg_dst = group["deg_dst"].to_numpy(np.int64)
        order = np.lexsort((dst, deg_dst, src))  # out-runs in (deg, id) order
        src, dst, deg_dst = src[order], dst[order], deg_dst[order]
        uniq, counts = np.unique(src, return_counts=True)
        local = _segment_local_arange(counts)
        run_len = np.repeat(counts, counts)
        n_after = run_len - local - 1  # wedge partners following each row
        first = np.repeat(np.arange(len(src), dtype=np.int64), n_after)
        second = first + _segment_local_arange(n_after) + 1
        wv, ww, apex = dst[first], dst[second], src[first]
        v_all = np.concatenate([wv, src])
        w_all = np.concatenate([ww, dst])
        apex_all = np.concatenate([apex, np.zeros(len(src), np.int64)])
        null_mask = np.concatenate(
            [np.zeros(len(wv), bool), np.ones(len(src), bool)]
        )
        v_arr = pa.array(v_all, pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(v_arr, buckets),
                "v": v_arr,
                "w": pa.array(w_all, pa.int64()),
                "apex": pa.array(apex_all, pa.int64(), mask=null_mask),
            },
            schema=_TRI_MATCH,
        )

    # D (bucket(v) → bucket(node)): a wedge closes iff its (v, w) key has an
    # edge-marker row in the same bucket.  Sort edges before wedges within
    # each (v, w) run; a wedge row is matched iff the latest edge position
    # precedes it inside its own run (maximum.accumulate — no hash sets).
    def close_wedges(group: pd.DataFrame) -> pa.Table:
        v = group["v"].to_numpy(np.int64)
        w = group["w"].to_numpy(np.int64)
        apex = group["apex"].to_numpy()
        is_edge = pd.isna(apex)
        order = np.lexsort((~is_edge, w, v))
        v, w, is_edge = v[order], w[order], is_edge[order]
        apex = apex[order]
        n = len(v)
        idx = np.arange(n, dtype=np.int64)
        run_start = np.concatenate(([True], (v[1:] != v[:-1]) | (w[1:] != w[:-1])))
        start_pos = np.maximum.accumulate(np.where(run_start, idx, -1))
        edge_pos = np.maximum.accumulate(np.where(is_edge, idx, -1))
        closed = ~is_edge & (edge_pos >= start_pos)
        a = apex[closed].astype(np.int64)
        tv, tw = v[closed], w[closed]
        node = np.concatenate([a, tv, tw])
        node_arr = pa.array(node, pa.int64())
        ones = np.ones(len(node), np.int64)
        return pa.table(
            {
                "bucket": _cc_bucket_of(node_arr, buckets),
                "node": node_arr,
                "deg": pa.array(np.zeros(len(node), np.int64), pa.int64()),
                "tri": pa.array(ones, pa.int64()),
            },
            schema=_TRI_FINAL,
        )

    tri_rows = (
        half.groupby("bucket")
        .map_groups(attach_degree, batch_format="pandas")
        .groupby("bucket")
        .map_groups(orient, batch_format="pandas")
        .groupby("bucket")
        .map_groups(wedges, batch_format="pandas")
        .groupby("bucket")
        .map_groups(close_wedges, batch_format="pandas")
    )

    # degree rows (one per node with ≥1 edge) + node-universe zero rows
    def degree_rows(group: pd.DataFrame) -> pa.Table:
        uniq, counts = np.unique(group["v"].to_numpy(np.int64), return_counts=True)
        node_arr = pa.array(uniq, pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(node_arr, buckets),
                "node": node_arr,
                "deg": pa.array(counts.astype(np.int64), pa.int64()),
                "tri": pa.array(np.zeros(len(uniq), np.int64), pa.int64()),
            },
            schema=_TRI_FINAL,
        )

    def universe_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        zero = pa.array(np.zeros(len(ids), np.int64), pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(ids, buckets),
                "node": ids.combine_chunks()
                if hasattr(ids, "combine_chunks")
                else ids,
                "deg": zero,
                "tri": zero,
            },
            schema=_TRI_FINAL,
        )

    deg_rows = half.groupby("bucket").map_groups(degree_rows, batch_format="pandas")
    uni_rows = nodes_ds.map_batches(
        universe_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    # E (bucket(node)): segmented-sum the three row kinds into the final
    # (doc_id, degree, n_triangles) table.
    def finalize(group: pd.DataFrame) -> pa.Table:
        node = group["node"].to_numpy(np.int64)
        deg = group["deg"].to_numpy(np.int64)
        tri = group["tri"].to_numpy(np.int64)
        order = np.argsort(node, kind="stable")
        node, deg, tri = node[order], deg[order], tri[order]
        starts = np.concatenate(([True], node[1:] != node[:-1]))
        pos = np.flatnonzero(starts)
        return pa.table(
            {
                "doc_id": pa.array(node[pos], pa.int64()),
                "degree": pa.array(np.add.reduceat(deg, pos), pa.int64()),
                "n_triangles": pa.array(np.add.reduceat(tri, pos), pa.int64()),
            }
        )

    return (
        tri_rows.union(deg_rows, uni_rows)
        .groupby("bucket")
        .map_groups(finalize, batch_format="pandas")
    )


# ------------------------------------------------------- anchor text
def anchor_text_top_ds(pages_ds, buckets: int = _BUCKETS):
    """In-link anchor-text aggregation: for every linked-to page, the
    in-link count and the most common anchor text pointing at it (ties →
    lexicographically smallest) — the classic web-corpus enrichment that
    attaches how OTHER pages describe a document (anchor text as document
    surrogate, Craswell et al. 2001).

    Scale shape: anchors are parsed from the html (the real kernel —
    ``extract_anchors``), a per-batch combiner collapses the stream to
    (tgt, anchor, count) partials, and ONE bounded-bucket exchange keyed by
    ``bucket(tgt)`` co-locates each target's partials; the per-bucket
    argmax is lexsort + ``reduceat``.  Anchor TEXT travels only as the
    combiner's distinct (tgt, anchor) pairs, never per occurrence."""
    import pandas as pd
    from collections import Counter

    def partials(batch: pa.Table) -> pa.Table:
        anchors = extract_anchors(batch)
        c: Counter = Counter(
            zip(
                np.asarray(anchors.column("tgt"), np.int64),
                anchors.column("anchor").to_pylist(),
            )
        )
        keys = sorted(c)
        tgt_arr = pa.array([k[0] for k in keys], pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(tgt_arr, buckets),
                "tgt": tgt_arr,
                "anchor": pa.array([k[1] for k in keys], pa.string()),
                "c": pa.array([c[k] for k in keys], pa.int64()),
            }
        )

    def top_per_target(group: pd.DataFrame) -> pa.Table:
        tgt = group["tgt"].to_numpy(np.int64)
        anchor = group["anchor"].to_numpy(object)
        c = group["c"].to_numpy(np.int64)
        # merge combiner partials per (tgt, anchor)
        order = np.lexsort((anchor, tgt))
        tgt, anchor, c = tgt[order], anchor[order], c[order]
        starts = np.concatenate(
            ([True], (tgt[1:] != tgt[:-1]) | (anchor[1:] != anchor[:-1]))
        )
        pos = np.flatnonzero(starts)
        tgt, anchor = tgt[pos], anchor[pos]
        c = np.add.reduceat(c, pos)
        # per-target argmax by (count desc, anchor asc): within each target
        # run (already anchor-ascending), take the first row of max count
        t_starts = np.concatenate(([True], tgt[1:] != tgt[:-1]))
        t_pos = np.flatnonzero(t_starts)
        n_in = np.add.reduceat(c, t_pos)
        seg = np.cumsum(t_starts) - 1
        maxc = np.maximum.reduceat(c, t_pos)
        is_max = c == maxc[seg]
        first_max = np.zeros(len(c), bool)
        # first anchor-ascending max per segment: mark positions where
        # is_max AND no earlier is_max in the same segment
        idx = np.arange(len(c))
        earlier = np.minimum.reduceat(np.where(is_max, idx, len(c)), t_pos)
        first_max[earlier[earlier < len(c)]] = True
        return pa.table(
            {
                "doc_id": pa.array(tgt[t_starts], pa.int64()),
                "n_inlinks": pa.array(n_in, pa.int64()),
                "top_anchor": pa.array(list(anchor[first_max]), pa.string()),
                "top_count": pa.array(c[first_max], pa.int64()),
            }
        )

    return (
        pages_ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(top_per_target, batch_format="pandas")
    )


def q_anchor_text_top(sf_dir: str):
    import ray.data as rd

    n = _doc_count(sf_dir)
    pages = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(
        lambda b: _synth_anchor_html(b, n),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return anchor_text_top_ds(pages)


SQL_ANCHOR_TEXT_TOP_TEMPLATE = """
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
{edges},
a AS (
  SELECT tgt, 'doc ' || tgt::VARCHAR || ' ref' || (src % 3)::VARCHAR AS anchor
  FROM edges
),
cnt AS (SELECT tgt, anchor, count(*)::BIGINT AS c FROM a GROUP BY tgt, anchor),
ranked AS (
  SELECT tgt, anchor, c,
         sum(c) OVER (PARTITION BY tgt) AS n_inlinks,
         row_number() OVER (PARTITION BY tgt ORDER BY c DESC, anchor) AS rk
  FROM cnt
)
SELECT tgt AS doc_id, n_inlinks::BIGINT AS n_inlinks,
       anchor AS top_anchor, c AS top_count
FROM ranked WHERE rk = 1
"""


# The multiplicative-hash link rule is triangle-free at every test scale
# (verified 500 → 240k docs), which would leave the wedge-closing kernel
# vacuously green — so the triangle query unions a deterministic TRIAD rule
# into its edge set: every doc_id ≡ 0 (mod 5) closes a 3-cycle with its two
# successors mod n.  Stated identically in the SQL oracle.
_TRIAD_MOD = 5


def _triad_edges(batch: pa.Table, n: int) -> pa.Table:
    ids = np.asarray(batch.column("doc_id"), np.int64)
    d = ids[ids % _TRIAD_MOD == 0]
    a, b, c = d, (d + 1) % n, (d + 2) % n
    return pa.table(
        {
            "src": pa.array(np.concatenate([a, b, a]), pa.int64()),
            "tgt": pa.array(np.concatenate([b, c, c]), pa.int64()),
        }
    )


def q_triangle_counts(sf_dir: str):
    import ray.data as rd

    n = _doc_count(sf_dir)
    nodes = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    triads = nodes.map_batches(
        lambda b: _triad_edges(b, n), batch_format="pyarrow", zero_copy_batch=True
    )
    return triangle_counts_ds(nodes, link_edges_ds(sf_dir).union(triads))


# ------------------------------------------------------------------ oracle
# the link rule as SQL (identical constants; `//` is DuckDB integer division)
_SQL_EDGES = f"""
edges AS (
  SELECT d.doc_id::BIGINT AS src,
         ((d.doc_id::BIGINT * {_MULT} + k.k * {_STEP} + {_OFF})
          % (SELECT n FROM nn)) AS tgt
  FROM documents d, generate_series(1, {_MAX_K}) k(k)
  WHERE d.doc_id % {_DANGLE_MOD} <> 0
    AND k.k <= 1 + (d.doc_id % {_MAX_K})
    AND ((d.doc_id::BIGINT * {_MULT} + k.k * {_STEP} + {_OFF})
         % (SELECT n FROM nn)) <> d.doc_id::BIGINT
)"""

SQL_LINK_EDGES = f"""
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
{_SQL_EDGES}
SELECT src, tgt FROM edges
"""

SQL_LINK_STATS = f"""
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
{_SQL_EDGES},
ind AS (SELECT tgt AS v, count(*)::BIGINT AS in_deg FROM edges GROUP BY tgt),
outd AS (SELECT src AS v, count(*)::BIGINT AS out_deg FROM edges GROUP BY src)
SELECT d.doc_id::BIGINT AS doc_id,
       COALESCE(i.in_deg, 0)::BIGINT AS in_deg,
       COALESCE(o.out_deg, 0)::BIGINT AS out_deg
FROM documents d
LEFT JOIN ind i ON d.doc_id = i.v
LEFT JOIN outd o ON d.doc_id = o.v
ORDER BY in_deg DESC, doc_id ASC
LIMIT 20
"""


def _sql_pagerank(iters: int = _PR_ITERS, k: int = 20) -> str:
    parts = [
        f"WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),\n{_SQL_EDGES},",
        "outdeg AS (SELECT src, count(*)::BIGINT AS od FROM edges GROUP BY src),",
        f"""r0 AS (
  SELECT d.doc_id::BIGINT AS v,
         ({FP_ONE}::BIGINT // (SELECT n FROM nn)) AS r,
         (o.src IS NULL) AS dang
  FROM documents d LEFT JOIN outdeg o ON d.doc_id = o.src)""",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f""",d{i} AS (
  SELECT COALESCE(SUM(r) FILTER (WHERE dang), 0)::BIGINT AS dm FROM r{p}),
c{i} AS (
  SELECT e.tgt AS v, SUM(p.r // o.od)::BIGINT AS c
  FROM edges e
  JOIN r{p} p ON e.src = p.v
  JOIN outdeg o ON e.src = o.src
  GROUP BY e.tgt),
r{i} AS (
  SELECT p.v,
         (({15 * FP_ONE}::BIGINT // (100 * (SELECT n FROM nn)))
          + ({_DAMP_NUM} * (COALESCE(c.c, 0)
                            + (SELECT dm FROM d{i}) // (SELECT n FROM nn)))
            // {_DAMP_DEN})::BIGINT AS r,
         p.dang
  FROM r{p} p LEFT JOIN c{i} c ON p.v = c.v)"""
        )
    parts.append(
        f"\nSELECT v AS doc_id, r AS rank_fp FROM r{iters}"
        f" ORDER BY r DESC, v ASC LIMIT {k}"
    )
    return "\n".join(parts)


def _sql_kcore(k: int = _KCORE_K, iters: int = _KCORE_ITERS) -> str:
    """The peel unrolled: h0 = simple undirected half-edges; round i keeps
    half-edges whose BOTH endpoints had degree ≥ k in h_{i-1}.  Idempotent
    at the fixpoint, so fixed unrolling matches an early-converged run."""
    parts = [
        f"WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),\n{_SQL_EDGES},",
        """u0 AS (
  SELECT DISTINCT least(src, tgt) AS lo, greatest(src, tgt) AS hi
  FROM edges WHERE src <> tgt),
h0 AS (SELECT lo AS v, hi AS o FROM u0 UNION ALL SELECT hi, lo FROM u0)""",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f""",k{i} AS (SELECT v FROM h{p} GROUP BY v HAVING count(*) >= {k}),
h{i} AS (
  SELECT h.v, h.o FROM h{p} h
  WHERE h.v IN (SELECT v FROM k{i}) AND h.o IN (SELECT v FROM k{i}))"""
        )
    parts.append(
        f"\nSELECT v AS doc_id, count(*)::BIGINT AS degree"
        f" FROM h{iters} GROUP BY v"
    )
    return "\n".join(parts)


SQL_TRIANGLE_COUNTS = f"""
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
{_SQL_EDGES},
triads AS (
  SELECT d.doc_id::BIGINT AS a,
         (d.doc_id + 1) % (SELECT n FROM nn) AS b,
         (d.doc_id + 2) % (SELECT n FROM nn) AS c
  FROM documents d WHERE d.doc_id % {_TRIAD_MOD} = 0
),
alledges AS (
  SELECT src, tgt FROM edges
  UNION ALL SELECT a, b FROM triads
  UNION ALL SELECT b, c FROM triads
  UNION ALL SELECT a, c FROM triads
),
und AS (
  SELECT DISTINCT least(src, tgt) AS lo, greatest(src, tgt) AS hi
  FROM alledges WHERE src <> tgt
),
deg AS (
  SELECT v, count(*)::BIGINT AS degree FROM (
    SELECT lo AS v FROM und UNION ALL SELECT hi AS v FROM und
  ) GROUP BY v
),
tri AS (
  SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
  FROM und e1
  JOIN und e2 ON e2.lo = e1.hi
  JOIN und e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
),
tcnt AS (
  SELECT v, count(*)::BIGINT AS n_triangles FROM (
    SELECT a AS v FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY v
)
SELECT d.doc_id::BIGINT AS doc_id,
       COALESCE(g.degree, 0)::BIGINT AS degree,
       COALESCE(t.n_triangles, 0)::BIGINT AS n_triangles
FROM documents d
LEFT JOIN deg g ON d.doc_id = g.v
LEFT JOIN tcnt t ON d.doc_id = t.v
"""


def queries() -> dict[str, Callable]:
    return {
        "link_edges": q_link_edges,
        "link_stats": q_link_stats,
        "pagerank_top20": q_pagerank_top20,
        "kcore_nodes": q_kcore_nodes,
        "triangle_counts": q_triangle_counts,
        "anchor_text_top": q_anchor_text_top,
        "hits_top20": q_hits_top20,
        "host_graph": q_host_graph,
        "link_components": q_link_components,
        "lpa_communities": q_lpa_communities,
        "ppr_top20": q_ppr_top20,
        "graph_hops": q_graph_hops,
        "random_walks": q_random_walks,
        "walk_skipgrams": q_walk_skipgrams,
        "walk_ppmi": q_walk_ppmi,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "link_edges": SQL_LINK_EDGES,
        "link_stats": SQL_LINK_STATS,
        "pagerank_top20": _sql_pagerank(),
        "kcore_nodes": _sql_kcore(),
        "triangle_counts": SQL_TRIANGLE_COUNTS,
        "anchor_text_top": SQL_ANCHOR_TEXT_TOP_TEMPLATE.format(
            edges=_SQL_EDGES.lstrip(",\n")
        ),
        "hits_top20": _sql_hits(),
        "host_graph": SQL_HOST_GRAPH,
        "link_components": SQL_LINK_COMPONENTS,
        "lpa_communities": _sql_lpa(),
        "ppr_top20": _sql_ppr(),
        "graph_hops": _sql_graph_hops(),
        "random_walks": _sql_random_walks(),
        "walk_skipgrams": _sql_walk_skipgrams(),
        "walk_ppmi": _sql_walk_ppmi(),
    }


# ------------------------------------------------------------------ HITS
# Hubs & authorities (Kleinberg 1999) in exact integer fixed-point.  The
# classic L2 normalization is replaced by an integer-exact one — divide by
# D = (Σ raw) // FP + 1, which rescales every round's mass to ≈ FP without
# a float ever existing — so Ray's block-parallel sums, a re-run and the
# unrolled-CTE oracle are bit-identical.  Two cogrouped bounded-bucket
# exchanges per half-step (hub-push then auth-push), adjacency built once
# per direction and reused, state repartitioned to the bucket count each
# round (same block-growth bound as pagerank_ds).

_HITS_FP = 10**6
_HITS_ITERS = 3

_HITS_SCORE = pa.schema(
    [("bucket", pa.int32()), ("node", pa.int64()), ("val", pa.int64())]
)
_HITS_ADJ = pa.schema(
    [("bucket", pa.int32()), ("key", pa.int64()), ("other", pa.int64())]
)
_HITS_UNION = pa.schema(
    [
        ("bucket", pa.int32()),
        ("node", pa.int64()),
        ("val", pa.int64()),  # null on adjacency rows
        ("other", pa.int64()),  # null on score rows
    ]
)


def _hits_adj(edges_ds, key: str, other: str, buckets: int):
    def tag(batch: pa.Table) -> pa.Table:
        k = batch.column(key)
        return pa.table(
            {
                "bucket": _cc_bucket_of(k, buckets),
                "key": k.combine_chunks() if hasattr(k, "combine_chunks") else k,
                "other": batch.column(other).combine_chunks()
                if hasattr(batch.column(other), "combine_chunks")
                else batch.column(other),
            },
            schema=_HITS_ADJ,
        )

    return (
        edges_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(buckets)
        .materialize()
    )


def hits_ds(nodes_ds, edges_ds, iters: int = _HITS_ITERS, buckets: int = _BUCKETS):
    """(src, tgt) edges + node universe → (node, auth, hub) fixed-point
    scores after ``iters`` rounds of the integer-normalized recurrence:

        h_0(v)     = FP
        ar_i(t)    = Σ_{(s,t)∈E} h_{i-1}(s);  a_i = ar_i // (Σar_i // FP + 1)
        hr_i(s)    = Σ_{(s,t)∈E} a_i(t);      h_i = hr_i // (Σhr_i // FP + 1)

    (nodes missing from a sum have score 0 — exactly the JOIN semantics the
    oracle states)."""
    import pandas as pd

    adj_fwd = _hits_adj(edges_ds, "src", "tgt", buckets)  # push hub → auth
    adj_rev = _hits_adj(edges_ds, "tgt", "src", buckets)  # push auth → hub

    def universe(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        return pa.table(
            {
                "bucket": _cc_bucket_of(ids, buckets),
                "node": ids.combine_chunks()
                if hasattr(ids, "combine_chunks")
                else ids,
                "val": pa.array(
                    np.full(len(ids), _HITS_FP, np.int64), pa.int64()
                ),
            },
            schema=_HITS_SCORE,
        )

    uni = (
        nodes_ds.map_batches(universe, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(buckets)
        .materialize()
    )
    hub = uni

    def tag_scores(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "bucket": batch.column("bucket"),
                "node": batch.column("node"),
                "val": batch.column("val"),
                "other": pa.nulls(m, pa.int64()),
            },
            schema=_HITS_UNION,
        )

    def tag_adj(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "bucket": batch.column("bucket"),
                "node": batch.column("key"),
                "val": pa.nulls(m, pa.int64()),
                "other": batch.column("other"),
            },
            schema=_HITS_UNION,
        )

    def push(group: pd.DataFrame) -> pa.Table:
        is_score = group["other"].isna().to_numpy()
        s_nodes = group["node"].to_numpy(np.int64)[is_score]
        s_vals = group["val"].to_numpy()[is_score].astype(np.int64)
        order = np.argsort(s_nodes, kind="stable")
        s_nodes, s_vals = s_nodes[order], s_vals[order]
        key = group["node"].to_numpy(np.int64)[~is_score]
        other = group["other"].to_numpy()[~is_score].astype(np.int64)
        if not len(key):
            return pa.table(
                {
                    "bucket": pa.array([], pa.int32()),
                    "node": pa.array([], pa.int64()),
                    "val": pa.array([], pa.int64()),
                },
                schema=_HITS_SCORE,
            )
        pos = np.searchsorted(s_nodes, key)
        if not ((pos < len(s_nodes)).all() and (s_nodes[pos] == key).all()):
            raise RuntimeError("hits: edge endpoint missing score row")
        contrib = s_vals[pos]
        o_order = np.argsort(other, kind="stable")
        other_s, contrib_s = other[o_order], contrib[o_order]
        uniq, idx = np.unique(other_s, return_index=True)
        sums = np.add.reduceat(contrib_s, idx)
        node_arr = pa.array(uniq, pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(node_arr, buckets),
                "node": node_arr,
                "val": pa.array(sums, pa.int64()),
            },
            schema=_HITS_SCORE,
        )

    def half_step(scores, adj):
        """scores pushed along adj → raw sums joined back onto the node
        universe (zeros elsewhere), integer-normalized."""
        raw = (
            scores.map_batches(
                tag_scores, batch_format="pyarrow", zero_copy_batch=True
            )
            .union(
                adj.map_batches(tag_adj, batch_format="pyarrow", zero_copy_batch=True)
            )
            .groupby("bucket")
            .map_groups(push, batch_format="pandas")
            .repartition(buckets)
            .materialize()
        )
        total = int(raw.sum("val") or 0)
        div = total // _HITS_FP + 1

        def tag_uni_zero(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "bucket": batch.column("bucket"),
                    "node": batch.column("node"),
                    "val": pa.array(np.zeros(batch.num_rows, np.int64), pa.int64()),
                },
                schema=_HITS_SCORE,
            )

        def norm_join(group: pd.DataFrame) -> pa.Table:
            node = group["node"].to_numpy(np.int64)
            val = group["val"].to_numpy(np.int64)
            order = np.argsort(node, kind="stable")
            node, val = node[order], val[order]
            starts = np.concatenate(([True], node[1:] != node[:-1]))
            pos = np.flatnonzero(starts)
            node_u = node[pos]
            summed = np.add.reduceat(val, pos)
            node_arr = pa.array(node_u, pa.int64())
            return pa.table(
                {
                    "bucket": _cc_bucket_of(node_arr, buckets),
                    "node": node_arr,
                    "val": pa.array(summed // div, pa.int64()),
                },
                schema=_HITS_SCORE,
            )

        return (
            raw.union(
                uni.map_batches(
                    tag_uni_zero, batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .groupby("bucket")
            .map_groups(norm_join, batch_format="pandas")
            .repartition(buckets)
            .materialize()
        )

    auth = None
    for _ in range(iters):
        auth = half_step(hub, adj_fwd)
        hub = half_step(auth, adj_rev)

    def tag_auth(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": batch.column("bucket"),
                "node": batch.column("node"),
                "auth": batch.column("val"),
                "hub": pa.nulls(batch.num_rows, pa.int64()),
            }
        )

    def tag_hub(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": batch.column("bucket"),
                "node": batch.column("node"),
                "auth": pa.nulls(batch.num_rows, pa.int64()),
                "hub": batch.column("val"),
            }
        )

    import pandas as pd

    def zip_scores(group: pd.DataFrame) -> pa.Table:
        node = group["node"].to_numpy(np.int64)
        a = group["auth"].to_numpy()
        h = group["hub"].to_numpy()
        order = np.argsort(node, kind="stable")
        node, a, h = node[order], a[order], h[order]
        # exactly two rows per node (auth row + hub row over the universe)
        return pa.table(
            {
                "node": pa.array(node[0::2], pa.int64()),
                "auth": pa.array(
                    np.where(pd.isna(a[0::2]), a[1::2], a[0::2]).astype(np.int64),
                    pa.int64(),
                ),
                "hub": pa.array(
                    np.where(pd.isna(h[0::2]), h[1::2], h[0::2]).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return (
        auth.map_batches(tag_auth, batch_format="pyarrow", zero_copy_batch=True)
        .union(hub.map_batches(tag_hub, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("bucket")
        .map_groups(zip_scores, batch_format="pandas")
    )


def q_hits_top20(sf_dir: str, k: int = 20):
    import ray.data as rd

    nodes = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    scores = hits_ds(nodes, link_edges_ds(sf_dir))

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["doc_id", "auth_fp", "hub_fp"])

    return (
        scores.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["auth_fp", "doc_id"], descending=[True, False])
        .limit(k)
    )


def _sql_hits(iters: int = _HITS_ITERS, k: int = 20) -> str:
    """The integer-normalized recurrence unrolled: h0 = FP everywhere;
    each half-step is a JOIN-push, a HUGEINT-safe total, and the exact
    divisor (total // FP + 1)."""
    fp = _HITS_FP
    parts = [
        f"WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),\n{_SQL_EDGES},",
        f"h0 AS (SELECT doc_id::BIGINT AS v, {fp}::BIGINT AS s FROM documents)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f""",ar{i} AS (
  SELECT e.tgt AS v, CAST(sum(h.s) AS BIGINT) AS raw
  FROM edges e JOIN h{p} h ON e.src = h.v GROUP BY e.tgt),
da{i} AS (SELECT CAST(sum(raw) AS BIGINT) // {fp} + 1 AS d FROM ar{i}),
a{i} AS (SELECT v, raw // (SELECT d FROM da{i}) AS s FROM ar{i}),
hr{i} AS (
  SELECT e.src AS v, CAST(sum(a.s) AS BIGINT) AS raw
  FROM edges e JOIN a{i} a ON e.tgt = a.v GROUP BY e.src),
dh{i} AS (SELECT CAST(sum(raw) AS BIGINT) // {fp} + 1 AS d FROM hr{i}),
h{i} AS (SELECT v, raw // (SELECT d FROM dh{i}) AS s FROM hr{i})"""
        )
    parts.append(
        f"""
SELECT d.doc_id::BIGINT AS doc_id,
       COALESCE(a.s, 0)::BIGINT AS auth_fp,
       COALESCE(h.s, 0)::BIGINT AS hub_fp
FROM documents d
LEFT JOIN a{iters} a ON d.doc_id = a.v
LEFT JOIN h{iters} h ON d.doc_id = h.v
ORDER BY auth_fp DESC, doc_id ASC LIMIT {k}"""
    )
    return "\n".join(parts)


# -------------------------------------------------------- host graph
def q_host_graph(sf_dir: str):
    """Host-level link-graph rollup: collapse the page graph onto the
    crawl's host space (host of doc d = ``site{d % 7}.example.com``, a
    self-contained synthetic rule — NOT webcrawl.py's host space, whose
    synthesizer emits the differently-cased ``Site{d%7}.Example.com``; the
    two operators' host strings do not join) and count
    links per (src_host, tgt_host) — the web-graph coarsening that turns
    10^9 page edges into a |hosts|² summary.  Per-batch pair-count
    combiner → one ≤|hosts|²-row groupby; the page edge stream never
    shuffles."""
    from collections import Counter

    import ray.data as rd
    from ray.data.aggregate import Sum

    def rollup(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("src"), np.int64) % 7
        tgt = np.asarray(batch.column("tgt"), np.int64) % 7
        c = Counter(zip(src.tolist(), tgt.tolist()))
        keys = sorted(c)
        return pa.table(
            {
                "src_host": pa.array(
                    [f"site{a}.example.com" for a, _ in keys], pa.string()
                ),
                "tgt_host": pa.array(
                    [f"site{b}.example.com" for _, b in keys], pa.string()
                ),
                "n_links": pa.array([c[k] for k in keys], pa.int64()),
            }
        )

    return (
        link_edges_ds(sf_dir)
        .map_batches(rollup, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src_host", "tgt_host"])
        .aggregate(Sum("n_links", alias_name="n_links"))
    )


SQL_HOST_GRAPH = f"""
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
{_SQL_EDGES}
SELECT 'site' || (src % 7)::VARCHAR || '.example.com' AS src_host,
       'site' || (tgt % 7)::VARCHAR || '.example.com' AS tgt_host,
       count(*)::BIGINT AS n_links
FROM edges GROUP BY 1, 2
"""


# ------------------------------------------------- connected components
def q_link_components(sf_dir: str, k: int = 20):
    """Weakly-connected components of the link graph: the top-``k``
    components by size (size desc, min-node cluster id asc) — the crawl
    "island" detector.  Reuses the bucketed min-label-propagation +
    pointer-doubling CC engine from extras/dedup.py (O(log diameter)
    rounds, raises on non-convergence); edges become undirected pairs via
    a vectorized min/max map, and component sizes are one |components|-row
    groupby over the (node, cluster) table."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from lightrag_ray.extras.dedup import connected_components

    def to_pairs(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("src"), np.int64)
        tgt = np.asarray(batch.column("tgt"), np.int64)
        m = src != tgt
        return pa.table(
            {
                "doc_a": pa.array(np.minimum(src[m], tgt[m]), pa.int64()),
                "doc_b": pa.array(np.maximum(src[m], tgt[m]), pa.int64()),
            }
        )

    pairs = link_edges_ds(sf_dir).map_batches(
        to_pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    labels = connected_components(pairs)  # (node, label)

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["node", "cluster_id"])

    return (
        labels.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cluster_id")
        .aggregate(Count(alias_name="size"))
        .sort(["size", "cluster_id"], descending=[True, False])
        .limit(k)
    )


SQL_LINK_COMPONENTS = f"""
WITH RECURSIVE nn AS (SELECT count(*)::BIGINT AS n FROM documents),
{_SQL_EDGES},
und AS (
  SELECT DISTINCT least(src, tgt) AS a, greatest(src, tgt) AS b FROM edges
),
adj AS (
  SELECT a AS node, b AS nbr FROM und UNION ALL SELECT b, a FROM und
),
cc(node, label) AS (
  SELECT node, node FROM (SELECT DISTINCT node FROM adj)
  UNION
  SELECT adj.node, cc.label FROM cc JOIN adj ON adj.nbr = cc.node
),
clusters AS (
  SELECT node, min(label) AS cluster_id FROM cc GROUP BY node
)
SELECT cluster_id, count(*)::BIGINT AS size
FROM clusters GROUP BY cluster_id
ORDER BY size DESC, cluster_id ASC LIMIT 20
"""


# --------------------------------------------- label propagation (LPA)
# Community detection by synchronous label propagation (Raghavan et al.
# 2007, "Near linear time algorithm to detect community structures in
# large-scale networks"): every node starts in its own community and each
# round adopts the label most frequent among its neighbors.  Unlike the
# min-label rule of weakly-connected components (q_link_components), the
# MODE rule splits a connected graph into densely-linked regions — the
# webgraph primitive behind template/mirror-site grouping and topic-island
# discovery.
#
# Determinism (the whole design problem for LPA, which is classically
# order-dependent): updates are SYNCHRONOUS (round i reads only round
# i-1's labels), run a FIXED _LPA_ITERS rounds, ties broken by the
# SMALLEST label, isolated nodes keep their label — so Ray's
# block-parallel execution, a re-run, and the unrolled-CTE oracle compute
# the identical label sequence (counts are integers; no float ever
# exists).  Synchronous LPA can oscillate on bipartite structures rather
# than converge; a fixed round count makes that irrelevant for parity —
# both engines emit round _LPA_ITERS exactly.
#
# Scale shape (the pagerank_ds discipline): the undirected simple
# adjacency is built ONCE (_build_half_edges, one bounded exchange) and
# reused every round; per round exactly TWO bounded-bucket exchanges —
# labels cogrouped with half-edges on bucket(v) send each neighbor
# (o, label_v) messages PRE-COMBINED per (o, label) inside the bucket,
# then message partials cogrouped with the label table on bucket(o)
# elect each node's mode label.  All group kernels are lexsort +
# searchsorted + reduceat; the state table is repartitioned to the bucket
# count each round (the block-growth bound from the module docstring).

_LPA_ITERS = 4

_LPA_LABELS = pa.schema(
    [("bucket", pa.int32()), ("node", pa.int64()), ("label", pa.int64())]
)
_LPA_SEND_UNION = pa.schema(
    [
        ("bucket", pa.int32()),
        ("node", pa.int64()),
        ("label", pa.int64()),  # null on half-edge rows
        ("o", pa.int64()),  # null on label rows
    ]
)
_LPA_ELECT_UNION = pa.schema(
    [
        ("bucket", pa.int32()),
        ("node", pa.int64()),
        ("label", pa.int64()),
        ("c", pa.int64()),  # null on label-state (universe) rows
    ]
)


def lpa_labels_ds(nodes_ds, edges_ds, iters: int = _LPA_ITERS,
                  buckets: int = _BUCKETS):
    """Synchronous label propagation over (src, tgt) edges; returns the
    (node, label) table after ``iters`` rounds (schema _LPA_LABELS minus
    the bucket column is the caller's concern)."""
    import pandas as pd

    half = _build_half_edges(edges_ds, buckets)

    def init_labels(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        return pa.table(
            {"bucket": _cc_bucket_of(ids, buckets), "node": ids, "label": ids},
            schema=_LPA_LABELS,
        )

    labels = (
        nodes_ds.map_batches(
            init_labels, batch_format="pyarrow", zero_copy_batch=True
        )
        .repartition(buckets)
        .materialize()
    )

    def tag_labels_for_send(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "bucket": batch.column("bucket"),
                "node": batch.column("node"),
                "label": batch.column("label"),
                "o": pa.nulls(m, pa.int64()),
            },
            schema=_LPA_SEND_UNION,
        )

    def tag_half(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "bucket": batch.column("bucket"),
                "node": batch.column("v"),
                "label": pa.nulls(m, pa.int64()),
                "o": batch.column("o"),
            },
            schema=_LPA_SEND_UNION,
        )

    def send_counts(group: pd.DataFrame) -> pa.Table:
        """bucket(v)-local: attach label(v) to every half-edge (v, o) and
        pre-combine the (o, label_v) messages per pair before the
        exchange."""
        is_lab = group["o"].isna().to_numpy()
        lab_nodes = group["node"].to_numpy(np.int64)[is_lab]
        lab_vals = group["label"].to_numpy()[is_lab].astype(np.int64)
        order = np.argsort(lab_nodes, kind="stable")
        lab_nodes, lab_vals = lab_nodes[order], lab_vals[order]
        v = group["node"].to_numpy(np.int64)[~is_lab]
        o = group["o"].to_numpy()[~is_lab].astype(np.int64)
        if not len(v):
            return pa.table(
                {
                    "bucket": pa.array([], pa.int32()),
                    "node": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                },
                schema=_LPA_ELECT_UNION,
            )
        pos = np.searchsorted(lab_nodes, v)
        if not ((pos < len(lab_nodes)).all() and (lab_nodes[pos] == v).all()):
            raise RuntimeError("lpa: half-edge node missing label row in bucket")
        lab = lab_vals[pos]
        # pre-combine per (o, label) inside the bucket
        order = np.lexsort((lab, o))
        o_s, lab_s = o[order], lab[order]
        first = np.concatenate(
            ([True], (o_s[1:] != o_s[:-1]) | (lab_s[1:] != lab_s[:-1]))
        )
        idx = np.flatnonzero(first)
        cnt = np.diff(np.append(idx, len(o_s)))
        node_arr = pa.array(o_s[idx], pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(node_arr, buckets),
                "node": node_arr,
                "label": pa.array(lab_s[idx], pa.int64()),
                "c": pa.array(cnt, pa.int64()),
            },
            schema=_LPA_ELECT_UNION,
        )

    def tag_label_universe(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "bucket": batch.column("bucket"),
                "node": batch.column("node"),
                "label": batch.column("label"),
                "c": pa.nulls(m, pa.int64()),
            },
            schema=_LPA_ELECT_UNION,
        )

    def elect_labels(group: pd.DataFrame) -> pa.Table:
        """bucket(o)-local: sum message partials per (node, label), elect
        the mode (count desc, label asc), keep the previous label for
        message-less (isolated / dangling-only) nodes."""
        is_univ = group["c"].isna().to_numpy()
        universe = group["node"].to_numpy(np.int64)[is_univ]
        prev = group["label"].to_numpy()[is_univ].astype(np.int64)
        u_order = np.argsort(universe, kind="stable")
        universe, prev = universe[u_order], prev[u_order]
        new_label = prev.copy()
        mn = group["node"].to_numpy(np.int64)[~is_univ]
        if len(mn):
            ml = group["label"].to_numpy()[~is_univ].astype(np.int64)
            mc = group["c"].to_numpy()[~is_univ].astype(np.int64)
            order = np.lexsort((ml, mn))
            mn, ml, mc = mn[order], ml[order], mc[order]
            first = np.concatenate(
                ([True], (mn[1:] != mn[:-1]) | (ml[1:] != ml[:-1]))
            )
            idx = np.flatnonzero(first)
            sums = np.add.reduceat(mc, idx)
            n_u, l_u = mn[idx], ml[idx]
            # mode election: node asc, count desc, label asc → first per node
            order = np.lexsort((l_u, -sums, n_u))
            n_u, l_u = n_u[order], l_u[order]
            keep = np.concatenate(([True], n_u[1:] != n_u[:-1]))
            win_n, win_l = n_u[keep], l_u[keep]
            pos = np.searchsorted(universe, win_n)
            if not (
                (pos < len(universe)).all() and (universe[pos] == win_n).all()
            ):
                raise RuntimeError("lpa: message target outside node universe")
            new_label[pos] = win_l
        node_arr = pa.array(universe, pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(node_arr, buckets),
                "node": node_arr,
                "label": pa.array(new_label, pa.int64()),
            },
            schema=_LPA_LABELS,
        )

    for _ in range(iters):
        msgs = (
            labels.map_batches(
                tag_labels_for_send, batch_format="pyarrow", zero_copy_batch=True
            )
            .union(
                half.map_batches(
                    tag_half, batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .groupby("bucket")
            .map_groups(send_counts, batch_format="pandas")
        )
        labels = (
            msgs.union(
                labels.map_batches(
                    tag_label_universe,
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            )
            .groupby("bucket")
            .map_groups(elect_labels, batch_format="pandas")
            .repartition(buckets)
            .materialize()
        )
    return labels


def q_lpa_communities(sf_dir: str):
    """Per-node community assignment after _LPA_ITERS synchronous label
    propagation rounds over the undirected simple link graph — the full
    (doc_id, community) table (strongest possible hash target; rollups
    are derivable downstream)."""
    import ray.data as rd

    nodes = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    labels = lpa_labels_ds(nodes, link_edges_ds(sf_dir))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("node"), "community": batch.column("label")}
        )

    return labels.select_columns(["node", "label"]).map_batches(
        rename, batch_format="pyarrow", zero_copy_batch=True
    )


def _sql_lpa(iters: int = _LPA_ITERS) -> str:
    """The synchronous recurrence unrolled: h0 = simple undirected
    half-edges (the kcore CTE verbatim); round i counts each node's
    incoming neighbor labels from round i-1 and takes the mode (count
    desc, label asc), keeping the previous label when no messages
    arrive."""
    parts = [
        f"WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),\n{_SQL_EDGES},",
        """u0 AS (
  SELECT DISTINCT least(src, tgt) AS lo, greatest(src, tgt) AS hi
  FROM edges WHERE src <> tgt),
h0 AS (SELECT lo AS v, hi AS o FROM u0 UNION ALL SELECT hi, lo FROM u0),
l0 AS (SELECT doc_id::BIGINT AS node, doc_id::BIGINT AS label FROM documents)""",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f""",c{i} AS (
  SELECT h.o AS node, l.label, count(*)::BIGINT AS c
  FROM h0 h JOIN l{p} l ON h.v = l.node
  GROUP BY h.o, l.label),
w{i} AS (
  SELECT node, label,
         row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
  FROM c{i}),
l{i} AS (
  SELECT p.node, COALESCE(w.label, p.label) AS label
  FROM l{p} p
  LEFT JOIN (SELECT node, label FROM w{i} WHERE rn = 1) w ON p.node = w.node)"""
        )
    parts.append(
        f"\nSELECT node AS doc_id, label AS community FROM l{iters}"
    )
    return "\n".join(parts)


# ----------------------------------------------------- personalized PageRank
# Random-walk-with-restart centrality from a SEED set (Haveliwala 2002;
# the multi-hop graph-retrieval primitive popularized for RAG by HippoRAG,
# Gutierrez et al. 2024).  Reference intent: LightRAG's query path expands
# 1 hop from the keyword/vector-matched entities and ranks neighbors by
# degree (lightrag/operate.py `_get_node_data`/`_get_edge_data`); PPR is
# the principled multi-hop generalization of that expansion — mass starts
# at the matched seeds and diffuses over the link graph, so the top-k by
# PPR score IS "the subgraph most relevant to this query's entities".
#
# Exact int64 recurrence (mirrored verbatim in the unrolled-CTE oracle),
# s = |seeds|, restart AND dangling mass both return to the seeds:
#     r_0(v)  = FP_ONE // s          if v in seeds else 0
#     dm_i    = sum r_{i-1}(v) over dangling v
#     c_i(t)  = sum_{(u,t) in E} r_{i-1}(u) // od(u)
#     r_i(v)  = (15*FP_ONE)//(100*s) + (85*(c_i(v) + dm_i//s))//100   seeds
#             = (85*c_i(v))//100                                  non-seeds
# Integer arithmetic keeps the result bit-identical across Ray's
# block-parallel sums, re-runs and the SQL oracle (same rationale as
# pagerank_ds above).  max contribution sums stay < ~2*FP_ONE, so the
# 85* products sit at ~1.7e14 — 4 orders under int64.
#
# Scale shape beyond pagerank_ds: seed membership is resolved ONCE at init
# (seed ids broadcast once via ray.put — query seed sets are the handful of
# entity matches, never corpus-sized) and carried as a bool column in the
# 18 B/row rank state, so iterations never re-ship or re-probe the seed
# set.  Senders with ZERO rank are pruned before the contribution exchange
# — PPR mass is concentrated near the seeds, so early rounds ship only the
# frontier's edges instead of the whole graph (the sparsity that makes
# push-style PPR cheap at 10^9 nodes); the oracle is unaffected because
# zero senders contribute zero.

_PPR_SEED_MOD = 101  # catalog seed rule: doc_id % 101 == 3 (mirrored in SQL)
_PPR_ITERS = _PR_ITERS

_PPR_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("node", pa.int64()),
        ("r", pa.int64()),
        ("dang", pa.bool_()),
        ("seed", pa.bool_()),
    ]
)


def _ppr_init_ranks(nodes_ds, adj, seeds: np.ndarray, buckets: int):
    """(node, r0, dangling, seed) — dangling = absent from adjacency srcs;
    seed membership probed once against the sorted broadcast seed array."""
    import pandas as pd
    import ray

    seeds_sorted = np.sort(np.asarray(seeds, np.int64))
    s = len(seeds_sorted)
    if s == 0:
        raise ValueError("ppr: empty seed set")
    seeds_ref = ray.put(seeds_sorted)

    UNION = pa.schema(
        [("bucket", pa.int32()), ("node", pa.int64()), ("is_node", pa.bool_())]
    )

    def tag_nodes(batch: pa.Table) -> pa.Table:
        node = batch.column("doc_id").cast(pa.int64()).combine_chunks()
        return pa.table(
            {
                "bucket": _cc_bucket_of(node, buckets),
                "node": node,
                "is_node": pa.array(np.ones(len(node), bool)),
            },
            schema=UNION,
        )

    def tag_srcs(batch: pa.Table) -> pa.Table:
        uniq = np.unique(np.asarray(batch.column("src"), np.int64))
        node = pa.array(uniq, pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(node, buckets),
                "node": node,
                "is_node": pa.array(np.zeros(len(uniq), bool)),
            },
            schema=UNION,
        )

    r0 = FP_ONE // s

    def init_bucket(group: pd.DataFrame) -> pa.Table:
        import ray as _ray

        sd = _ray.get(seeds_ref)
        nodes = group["node"].to_numpy(np.int64)
        is_node = group["is_node"].to_numpy(bool)
        universe = np.unique(nodes[is_node])
        srcs = np.unique(nodes[~is_node])
        dang = ~np.isin(universe, srcs)
        pos = np.searchsorted(sd, universe)
        pos[pos >= len(sd)] = 0
        seed = sd[pos] == universe
        node_arr = pa.array(universe, pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(node_arr, buckets),
                "node": node_arr,
                "r": pa.array(np.where(seed, r0, 0).astype(np.int64), pa.int64()),
                "dang": pa.array(dang, pa.bool_()),
                "seed": pa.array(seed, pa.bool_()),
            },
            schema=_PPR_SCHEMA,
        )

    union = nodes_ds.map_batches(
        tag_nodes, batch_format="pyarrow", zero_copy_batch=True
    ).union(adj.map_batches(tag_srcs, batch_format="pyarrow", zero_copy_batch=True))
    return (
        union.groupby("bucket")
        .map_groups(init_bucket, batch_format="pandas")
        .repartition(buckets)
        .materialize()
    )


def ppr_ds(
    nodes_ds,
    edges_ds,
    seeds: np.ndarray,
    iters: int = _PPR_ITERS,
    buckets: int = _BUCKETS,
):
    """Personalized PageRank over (src, tgt) edges from a seed set;
    returns (node, r, dang, seed) with exact int64 fixed-point scores.
    Same two-bounded-exchanges-per-round shape (and per-round block-count
    bound) as pagerank_ds; see the section comment for the recurrence."""
    import pandas as pd

    s = len(seeds)
    adj = _build_adjacency(edges_ds, buckets)
    ranks = _ppr_init_ranks(nodes_ds, adj, seeds, buckets)

    CONTRIB_UNION = pa.schema(
        [
            ("bucket", pa.int32()),
            ("node", pa.int64()),
            ("r", pa.int64()),  # null on adjacency rows
            ("tgt", pa.int64()),  # null on rank rows
            ("od", pa.int64()),  # null on rank rows
        ]
    )
    RANK_UNION = pa.schema(
        [
            ("bucket", pa.int32()),
            ("node", pa.int64()),
            ("c", pa.int64()),  # null on universe rows
            ("dang", pa.bool_()),  # null on contrib rows
            ("seed", pa.bool_()),  # null on contrib rows
        ]
    )

    def tag_rank_for_send(batch: pa.Table) -> pa.Table:
        # only POSITIVE-rank non-dangling nodes push mass (frontier pruning)
        live = batch.filter(
            pc.and_(pc.invert(batch.column("dang")), pc.not_equal(batch.column("r"), 0))
        )
        m = live.num_rows
        return pa.table(
            {
                "bucket": live.column("bucket"),
                "node": live.column("node"),
                "r": live.column("r"),
                "tgt": pa.nulls(m, pa.int64()),
                "od": pa.nulls(m, pa.int64()),
            },
            schema=CONTRIB_UNION,
        )

    def tag_adj(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "bucket": batch.column("bucket"),
                "node": batch.column("src"),
                "r": pa.nulls(m, pa.int64()),
                "tgt": batch.column("tgt"),
                "od": batch.column("od"),
            },
            schema=CONTRIB_UNION,
        )

    def send_contribs(group: pd.DataFrame) -> pa.Table:
        is_rank = group["tgt"].isna().to_numpy()
        rank_nodes = group["node"].to_numpy(np.int64)[is_rank]
        rank_vals = group["r"].to_numpy()[is_rank].astype(np.int64)
        order = np.argsort(rank_nodes, kind="stable")
        rank_nodes, rank_vals = rank_nodes[order], rank_vals[order]
        src = group["node"].to_numpy(np.int64)[~is_rank]
        tgt = group["tgt"].to_numpy()[~is_rank].astype(np.int64)
        od = group["od"].to_numpy()[~is_rank].astype(np.int64)
        empty = pa.table(
            {
                "bucket": pa.array([], pa.int32()),
                "node": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
                "dang": pa.array([], pa.bool_()),
                "seed": pa.array([], pa.bool_()),
            },
            schema=RANK_UNION,
        )
        if not len(src) or not len(rank_nodes):
            return empty
        # zero-rank senders were pruned upstream, so an unmatched src is
        # EXPECTED here (unlike pagerank_ds's integrity raise): mask it out
        pos = np.searchsorted(rank_nodes, src)
        pos_c = np.minimum(pos, len(rank_nodes) - 1)
        hit = rank_nodes[pos_c] == src
        if not hit.any():
            return empty
        contrib = rank_vals[pos_c[hit]] // od[hit]
        tgt = tgt[hit]
        t_order = np.argsort(tgt, kind="stable")
        tgt_s, contrib_s = tgt[t_order], contrib[t_order]
        uniq, idx = np.unique(tgt_s, return_index=True)
        sums = np.add.reduceat(contrib_s, idx)
        node_arr = pa.array(uniq, pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(node_arr, buckets),
                "node": node_arr,
                "c": pa.array(sums, pa.int64()),
                "dang": pa.nulls(len(uniq), pa.bool_()),
                "seed": pa.nulls(len(uniq), pa.bool_()),
            },
            schema=RANK_UNION,
        )

    base = (15 * FP_ONE) // (100 * s)

    def make_reduce_ranks(dang_share: int):
        def reduce_ranks(group: pd.DataFrame) -> pa.Table:
            is_univ = group["dang"].notna().to_numpy()
            universe = group["node"].to_numpy(np.int64)[is_univ]
            dang = group["dang"].to_numpy()[is_univ].astype(bool)
            seed = group["seed"].to_numpy()[is_univ].astype(bool)
            u_order = np.argsort(universe, kind="stable")
            universe, dang, seed = universe[u_order], dang[u_order], seed[u_order]
            cn = group["node"].to_numpy(np.int64)[~is_univ]
            cv = group["c"].to_numpy()[~is_univ].astype(np.int64)
            csum = np.zeros(len(universe), np.int64)
            if len(cn):
                c_order = np.argsort(cn, kind="stable")
                cn_s, cv_s = cn[c_order], cv[c_order]
                uniq, idx = np.unique(cn_s, return_index=True)
                sums = np.add.reduceat(cv_s, idx)
                pos = np.searchsorted(universe, uniq)
                if not (
                    (pos < len(universe)).all() and (universe[pos] == uniq).all()
                ):
                    raise RuntimeError(
                        "ppr: contribution target outside node universe"
                    )
                csum[pos] = sums
            new_r = np.where(
                seed,
                base + (_DAMP_NUM * (csum + dang_share)) // _DAMP_DEN,
                (_DAMP_NUM * csum) // _DAMP_DEN,
            ).astype(np.int64)
            node_arr = pa.array(universe, pa.int64())
            return pa.table(
                {
                    "bucket": _cc_bucket_of(node_arr, buckets),
                    "node": node_arr,
                    "r": pa.array(new_r, pa.int64()),
                    "dang": pa.array(dang, pa.bool_()),
                    "seed": pa.array(seed, pa.bool_()),
                },
                schema=_PPR_SCHEMA,
            )

        return reduce_ranks

    def dangling_partial(batch: pa.Table) -> pa.Table:
        mask = np.asarray(batch.column("dang"), bool)
        vals = np.asarray(batch.column("r"), np.int64)
        return pa.table({"s": pa.array([int(vals[mask].sum())], pa.int64())})

    def tag_rank_universe(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        return pa.table(
            {
                "bucket": batch.column("bucket"),
                "node": batch.column("node"),
                "c": pa.nulls(m, pa.int64()),
                "dang": batch.column("dang"),
                "seed": batch.column("seed"),
            },
            schema=RANK_UNION,
        )

    for _ in range(iters):
        dm = ranks.map_batches(
            dangling_partial, batch_format="pyarrow", zero_copy_batch=True
        ).sum("s")
        dang_share = int(dm or 0) // s
        contribs = (
            ranks.map_batches(
                tag_rank_for_send, batch_format="pyarrow", zero_copy_batch=True
            )
            .union(
                adj.map_batches(tag_adj, batch_format="pyarrow", zero_copy_batch=True)
            )
            .groupby("bucket")
            .map_groups(send_contribs, batch_format="pandas")
        )
        ranks = (
            contribs.union(
                ranks.map_batches(
                    tag_rank_universe, batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .groupby("bucket")
            .map_groups(make_reduce_ranks(dang_share), batch_format="pandas")
            .repartition(buckets)
            .materialize()
        )

    return ranks


def q_ppr_top20(sf_dir: str, k: int = 20):
    """Top-k pages by personalized PageRank from the deterministic seed
    rule doc_id % 101 == 3 (a stand-in for a query's entity matches)."""
    import ray.data as rd

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    def pick_seeds(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        return pa.table(
            {"doc_id": pa.array(ids[ids % _PPR_SEED_MOD == 3], pa.int64())}
        )

    seed_tbl = docs.map_batches(
        pick_seeds, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # seed sets are tiny by construction (n/101 ids)
    seeds = seed_tbl["doc_id"].to_numpy(np.int64)
    ranks = ppr_ds(docs, link_edges_ds(sf_dir), seeds)
    out = (
        ranks.filter(expr="r > 0")
        .select_columns(["node", "r"])
        .sort(["r", "node"], descending=[True, False])
        .limit(k)
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("node"), "rank_fp": batch.column("r")}
        )

    return out.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def _sql_ppr(iters: int = _PPR_ITERS, k: int = 20) -> str:
    parts = [
        f"WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),\n{_SQL_EDGES},",
        "outdeg AS (SELECT src, count(*)::BIGINT AS od FROM edges GROUP BY src),",
        f"""ss AS (
  SELECT count(*)::BIGINT AS s FROM documents
  WHERE doc_id % {_PPR_SEED_MOD} = 3),
r0 AS (
  SELECT d.doc_id::BIGINT AS v,
         CASE WHEN d.doc_id % {_PPR_SEED_MOD} = 3
              THEN ({FP_ONE}::BIGINT // (SELECT s FROM ss)) ELSE 0 END AS r,
         (o.src IS NULL) AS dang,
         (d.doc_id % {_PPR_SEED_MOD} = 3) AS seed
  FROM documents d LEFT JOIN outdeg o ON d.doc_id = o.src)""",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f""",d{i} AS (
  SELECT COALESCE(SUM(r) FILTER (WHERE dang), 0)::BIGINT AS dm FROM r{p}),
c{i} AS (
  SELECT e.tgt AS v, SUM(p.r // o.od)::BIGINT AS c
  FROM edges e
  JOIN r{p} p ON e.src = p.v
  JOIN outdeg o ON e.src = o.src
  GROUP BY e.tgt),
r{i} AS (
  SELECT p.v,
         (CASE WHEN p.seed
               THEN ({15 * FP_ONE}::BIGINT // (100 * (SELECT s FROM ss)))
                    + ({_DAMP_NUM} * (COALESCE(c.c, 0)
                       + (SELECT dm FROM d{i}) // (SELECT s FROM ss)))
                      // {_DAMP_DEN}
               ELSE ({_DAMP_NUM} * COALESCE(c.c, 0)) // {_DAMP_DEN}
          END)::BIGINT AS r,
         p.dang, p.seed
  FROM r{p} p LEFT JOIN c{i} c ON p.v = c.v)"""
        )
    parts.append(
        f"\nSELECT v AS doc_id, r AS rank_fp FROM r{iters}"
        f" WHERE r > 0 ORDER BY r DESC, v ASC LIMIT {k}"
    )
    return "\n".join(parts)


# ------------------------------------------------------- multi-source BFS
# Exact k-hop neighborhood of a seed set: dist(v) = min #edges from any
# seed, computed level-synchronously (the other graph-retrieval primitive
# next to ppr_ds — LightRAG's query path IS a 1-hop special case of this,
# lightrag/operate.py `_get_node_data` one-hop expansion; Pregel-style
# frontier BFS per Malewicz et al. 2010).
#
# Scale shape: the state table carries ONLY the reached set (bucket, node,
# dist) — unreached nodes never enter any exchange, so round h costs two
# skinny bounded-bucket exchanges proportional to frontier out-edges +
# reached set, not to the graph.  The frontier is matched against the
# src-bucketed shared adjacency (built once, reused across rounds) with
# the same lexsort/searchsorted kernels as ppr_ds; candidate targets
# re-bucket by tgt and min-merge into the state.  Rounds stop early when
# a level adds no new nodes (sound: BFS levels are monotone).

_BFS_HOPS = 4

_BFS_SCHEMA = pa.schema(
    [("bucket", pa.int32()), ("node", pa.int64()), ("dist", pa.int32())]
)


def bfs_hops_ds(
    edges_ds,
    seeds: np.ndarray,
    max_hops: int = _BFS_HOPS,
    buckets: int = _BUCKETS,
):
    """(bucket, node, dist) for every node within ``max_hops`` edges of the
    seed set (seeds at dist 0; dist = exact minimum hop count)."""
    import pandas as pd
    import ray.data as rd

    seeds_u = np.unique(np.asarray(seeds, np.int64))
    if len(seeds_u) == 0:
        raise ValueError("bfs: empty seed set")
    seed_arr = pa.array(seeds_u, pa.int64())
    state = rd.from_arrow(
        pa.table(
            {
                "bucket": _cc_bucket_of(seed_arr, buckets),
                "node": seed_arr,
                "dist": pa.array(np.zeros(len(seeds_u), np.int32), pa.int32()),
            },
            schema=_BFS_SCHEMA,
        )
    ).materialize()

    adj = _build_adjacency(edges_ds, buckets)

    FRONTIER_UNION = pa.schema(
        [
            ("bucket", pa.int32()),
            ("node", pa.int64()),
            ("tgt", pa.int64()),  # null on frontier rows
        ]
    )

    def make_tag_frontier(h: int):
        def tag_frontier(batch: pa.Table) -> pa.Table:
            live = batch.filter(pc.equal(batch.column("dist"), h - 1))
            return pa.table(
                {
                    "bucket": live.column("bucket"),
                    "node": live.column("node"),
                    "tgt": pa.nulls(live.num_rows, pa.int64()),
                },
                schema=FRONTIER_UNION,
            )

        return tag_frontier

    def tag_adj(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": batch.column("bucket"),
                "node": batch.column("src"),
                "tgt": batch.column("tgt"),
            },
            schema=FRONTIER_UNION,
        )

    def expand(group: pd.DataFrame) -> pa.Table:
        is_f = group["tgt"].isna().to_numpy()
        fr = np.unique(group["node"].to_numpy(np.int64)[is_f])
        empty = pa.table(
            {"bucket": pa.array([], pa.int32()), "node": pa.array([], pa.int64())}
        )
        if not len(fr):
            return empty
        src = group["node"].to_numpy(np.int64)[~is_f]
        if not len(src):
            return empty
        tgt = group["tgt"].to_numpy()[~is_f].astype(np.int64)
        pos = np.searchsorted(fr, src)
        pos_c = np.minimum(pos, len(fr) - 1)
        hit = fr[pos_c] == src
        cand = np.unique(tgt[hit])
        node_arr = pa.array(cand, pa.int64())
        return pa.table({"bucket": _cc_bucket_of(node_arr, buckets), "node": node_arr})

    def make_tag_cand(h: int):
        def tag_cand(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "bucket": batch.column("bucket"),
                    "node": batch.column("node"),
                    "dist": pa.array(
                        np.full(batch.num_rows, h, np.int32), pa.int32()
                    ),
                },
                schema=_BFS_SCHEMA,
            )

        return tag_cand

    def min_merge(group: pd.DataFrame) -> pa.Table:
        node = group["node"].to_numpy(np.int64)
        dist = group["dist"].to_numpy(np.int32)
        order = np.lexsort((dist, node))
        node, dist = node[order], dist[order]
        uniq, idx = np.unique(node, return_index=True)
        node_arr = pa.array(uniq, pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(node_arr, buckets),
                "node": node_arr,
                "dist": pa.array(dist[idx], pa.int32()),
            },
            schema=_BFS_SCHEMA,
        )

    def count_at(state_ds, h: int) -> int:
        def partial(batch: pa.Table) -> pa.Table:
            m = pc.sum(pc.cast(pc.equal(batch.column("dist"), h), pa.int64()))
            return pa.table({"m": pa.array([m.as_py() or 0], pa.int64())})

        return int(
            state_ds.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ).sum("m")
            or 0
        )

    for h in range(1, max_hops + 1):
        cands = (
            state.map_batches(
                make_tag_frontier(h), batch_format="pyarrow", zero_copy_batch=True
            )
            .union(
                adj.map_batches(tag_adj, batch_format="pyarrow", zero_copy_batch=True)
            )
            .groupby("bucket")
            .map_groups(expand, batch_format="pandas")
        )
        state = (
            cands.map_batches(
                make_tag_cand(h), batch_format="pyarrow", zero_copy_batch=True
            )
            .union(state)
            .groupby("bucket")
            .map_groups(min_merge, batch_format="pandas")
            .repartition(buckets)
            .materialize()
        )
        if count_at(state, h) == 0:
            break  # empty level: every later level is empty too

    return state


def q_graph_hops(sf_dir: str, max_hops: int = _BFS_HOPS):
    """Hop-distance histogram of the link graph from the deterministic
    seed rule doc_id % 101 == 3 (same seeds as ppr_top20): one row per
    reached level (dist, n_nodes) plus dist = -1 for unreached pages.
    The per-level counts are a tiny bounded aggregate (≤ max_hops + 2
    rows); only they are driver-materialized."""
    import pandas as pd
    import ray.data as rd

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def pick_seeds(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        return pa.table(
            {"doc_id": pa.array(ids[ids % _PPR_SEED_MOD == 3], pa.int64())}
        )

    seeds = (
        docs.map_batches(pick_seeds, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()["doc_id"]
        .to_numpy(np.int64)
    )
    hops = bfs_hops_ds(link_edges_ds(sf_dir), seeds, max_hops=max_hops)

    def level_partial(batch: pa.Table) -> pa.Table:
        dist = np.asarray(batch.column("dist"), np.int64)
        uniq, counts = np.unique(dist, return_counts=True)
        return pa.table(
            {
                "dist": pa.array(uniq, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    levels = (
        hops.map_batches(level_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("dist")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n_nodes"})
        .sort_values("dist")
    )
    unreached = _doc_count(sf_dir) - int(levels["n_nodes"].sum())
    out = pd.concat(
        [pd.DataFrame({"dist": [-1], "n_nodes": [unreached]}), levels],
        ignore_index=True,
    )
    return out.astype({"dist": "int64", "n_nodes": "int64"})


def _sql_graph_hops(max_hops: int = _BFS_HOPS) -> str:
    parts = [
        f"WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),\n{_SQL_EDGES},",
        f"""r0 AS (
  SELECT DISTINCT doc_id::BIGINT AS v, 0 AS dist FROM documents
  WHERE doc_id % {_PPR_SEED_MOD} = 3)""",
    ]
    for i in range(1, max_hops + 1):
        p = i - 1
        parts.append(
            f""",c{i} AS (
  SELECT DISTINCT e.tgt AS v
  FROM edges e JOIN r{p} f ON e.src = f.v AND f.dist = {p}),
r{i} AS (
  SELECT v, dist FROM r{p}
  UNION ALL
  SELECT c.v, {i} AS dist
  FROM c{i} c LEFT JOIN r{p} r ON c.v = r.v
  WHERE r.v IS NULL)"""
        )
    parts.append(
        f"""
SELECT dist::BIGINT AS dist, count(*)::BIGINT AS n_nodes
FROM r{max_hops} GROUP BY dist
UNION ALL
SELECT -1::BIGINT AS dist,
       ((SELECT n FROM nn) - (SELECT count(*) FROM r{max_hops}))::BIGINT
ORDER BY dist"""
    )
    return "\n".join(parts)


# ------------------------------------------------------ random-walk corpus
# Deterministic truncated random walks over the link graph — the training-
# corpus generator for graph embeddings (DeepWalk, Perozzi et al. 2014;
# node2vec p=q=1 case, Grover & Leskovec 2016): one walk per seed node,
# each step picking an out-neighbor by a pseudo-random but REPRODUCIBLE
# rule shared verbatim with the SQL oracle,
#     pick(cur, walk_id, t) = ((cur % M)*C1 + (walk_id % M)*C2 + t*C3) % M
#     next = the (pick % od(cur))-th out-neighbor of cur in ascending tgt
#            order (duplicates kept)
# with M = 2^31 - 1 and small LCG constants, so every intermediate product
# stays under 2^62 — total int64 arithmetic on both engines, no float, no
# library RNG.  Walks stop early at dangling nodes.
#
# Scale shape: the walk frontier is one row per LIVE walk (walk_id, cur) —
# each of the fixed _WALK_LEN steps is one skinny bounded-bucket exchange
# (frontier re-bucketed by cur) + a cogroup against the src-bucketed shared
# adjacency; inside a group the pick resolves by lexsort(src, tgt) + a
# searchsorted offset (after the lexsort a node's out-edges are contiguous
# and idx-dense, so position = src_start + pick % od — no per-row Python).
# Emitted (walk_id, step, node) rows stream to the result per step and
# never re-enter an exchange.

_WALK_LEN = 6
_WALK_M = 2147483647
_WALK_C1, _WALK_C2, _WALK_C3 = 1103515245, 12345, 2654435761

_WALK_SCHEMA = pa.schema(
    [("walk_id", pa.int64()), ("step", pa.int64()), ("node", pa.int64())]
)


def random_walks_ds(
    edges_ds,
    seeds: np.ndarray,
    walk_len: int = _WALK_LEN,
    buckets: int = _BUCKETS,
):
    """(walk_id, step, node) walk corpus: one walk per seed (walk_id =
    seed id, step 0 = the seed), deterministic neighbor picks per the
    module-comment rule, early stop at dangling nodes."""
    import pandas as pd
    import ray.data as rd

    seeds_u = np.unique(np.asarray(seeds, np.int64))
    if len(seeds_u) == 0:
        raise ValueError("random_walks: empty seed set")

    adj = _build_adjacency(edges_ds, buckets)

    FRONTIER_UNION = pa.schema(
        [
            ("bucket", pa.int32()),
            ("walk_id", pa.int64()),  # null on adjacency rows
            ("cur", pa.int64()),  # frontier: current node; adj: src
            ("tgt", pa.int64()),  # null on frontier rows
        ]
    )

    seed_arr = pa.array(seeds_u, pa.int64())
    frontier = rd.from_arrow(
        pa.table(
            {
                "bucket": _cc_bucket_of(seed_arr, buckets),
                "walk_id": seed_arr,
                "cur": seed_arr,
                "tgt": pa.nulls(len(seeds_u), pa.int64()),
            },
            schema=FRONTIER_UNION,
        )
    ).materialize()

    out_parts = [
        rd.from_arrow(
            pa.table(
                {
                    "walk_id": seed_arr,
                    "step": pa.array(np.zeros(len(seeds_u), np.int64), pa.int64()),
                    "node": seed_arr,
                },
                schema=_WALK_SCHEMA,
            )
        )
    ]

    def tag_adj(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": batch.column("bucket"),
                "walk_id": pa.nulls(batch.num_rows, pa.int64()),
                "cur": batch.column("src"),
                "tgt": batch.column("tgt"),
            },
            schema=FRONTIER_UNION,
        )

    def make_step(t: int):
        def step(group: pd.DataFrame) -> pa.Table:
            is_walk = group["walk_id"].notna().to_numpy()
            wid = group["walk_id"].to_numpy()[is_walk].astype(np.int64)
            cur = group["cur"].to_numpy(np.int64)[is_walk]
            src = group["cur"].to_numpy(np.int64)[~is_walk]
            tgt = group["tgt"].to_numpy()[~is_walk].astype(np.int64)
            empty = pa.table(
                {
                    "bucket": pa.array([], pa.int32()),
                    "walk_id": pa.array([], pa.int64()),
                    "cur": pa.array([], pa.int64()),
                    "tgt": pa.array([], pa.int64()),
                },
                schema=FRONTIER_UNION,
            )
            if not len(wid) or not len(src):
                return empty
            order = np.lexsort((tgt, src))
            src_s, tgt_s = src[order], tgt[order]
            # walks at dangling nodes (src absent) stop here
            left = np.searchsorted(src_s, cur, side="left")
            right = np.searchsorted(src_s, cur, side="right")
            od = right - left
            live = od > 0
            if not live.any():
                return empty
            wid, cur, left, od = wid[live], cur[live], left[live], od[live]
            pick = (
                (cur % _WALK_M) * _WALK_C1
                + (wid % _WALK_M) * _WALK_C2
                + t * _WALK_C3
            ) % _WALK_M % od
            nxt = tgt_s[left + pick]
            nxt_arr = pa.array(nxt, pa.int64())
            return pa.table(
                {
                    "bucket": _cc_bucket_of(nxt_arr, buckets),
                    "walk_id": pa.array(wid, pa.int64()),
                    "cur": nxt_arr,
                    "tgt": pa.nulls(len(wid), pa.int64()),
                },
                schema=FRONTIER_UNION,
            )

        return step

    def to_rows(t: int):
        def conv(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "walk_id": batch.column("walk_id"),
                    "step": pa.array(
                        np.full(batch.num_rows, t, np.int64), pa.int64()
                    ),
                    "node": batch.column("cur"),
                },
                schema=_WALK_SCHEMA,
            )

        return conv

    for t in range(1, walk_len + 1):
        frontier = (
            frontier.union(
                adj.map_batches(tag_adj, batch_format="pyarrow", zero_copy_batch=True)
            )
            .groupby("bucket")
            .map_groups(make_step(t), batch_format="pandas")
            .repartition(buckets)
            .materialize()
        )
        if frontier.count() == 0:
            break
        out_parts.append(
            frontier.map_batches(
                to_rows(t), batch_format="pyarrow", zero_copy_batch=True
            )
        )

    out = out_parts[0]
    for part in out_parts[1:]:
        out = out.union(part)
    return out


def q_random_walks(sf_dir: str, walk_len: int = _WALK_LEN):
    """Walk corpus from the deterministic seed rule doc_id % 101 == 3
    (one walk per seed, length ≤ walk_len + 1 rows incl. the seed)."""
    import ray.data as rd

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def pick_seeds(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        return pa.table(
            {"doc_id": pa.array(ids[ids % _PPR_SEED_MOD == 3], pa.int64())}
        )

    seeds = (
        docs.map_batches(pick_seeds, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()["doc_id"]
        .to_numpy(np.int64)
    )
    return random_walks_ds(link_edges_ds(sf_dir), seeds, walk_len=walk_len)


def _sql_random_walks(walk_len: int = _WALK_LEN) -> str:
    pick = (
        "((w.node % {M}) * {C1} + (w.walk_id % {M}) * {C2} + {t} * {C3})"
        " % {M}"
    )
    parts = [
        f"WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),\n{_SQL_EDGES},",
        """adj AS (
  SELECT src, tgt,
         row_number() OVER (PARTITION BY src ORDER BY tgt) - 1 AS idx,
         count(*) OVER (PARTITION BY src) AS od
  FROM edges),""",
        f"""w0 AS (
  SELECT doc_id::BIGINT AS walk_id, 0::BIGINT AS step,
         doc_id::BIGINT AS node
  FROM documents WHERE doc_id % {_PPR_SEED_MOD} = 3)""",
    ]
    for t in range(1, walk_len + 1):
        p = t - 1
        expr = pick.format(
            M=_WALK_M, C1=_WALK_C1, C2=_WALK_C2, C3=_WALK_C3, t=t
        )
        parts.append(
            f""",w{t} AS (
  SELECT w.walk_id, {t}::BIGINT AS step, a.tgt AS node
  FROM w{p} w
  JOIN adj a ON a.src = w.node AND a.idx = {expr} % a.od
  WHERE w.step = {p})"""
        )
    selects = " UNION ALL ".join(
        f"SELECT walk_id, step, node FROM w{t}" for t in range(walk_len + 1)
    )
    parts.append(f"\n{selects}\nORDER BY walk_id, step")
    return "\n".join(parts)


# ----------------------------------------------------- skip-gram pairs
# (center, context) co-occurrence counts over the walk corpus — the
# training-pair generator that turns DeepWalk walks into word2vec input
# (Perozzi et al. 2014 §4.2: each node within _SKIPGRAM_WINDOW hops of a
# walk position is a context, both directions).  Composes random_walks_ds;
# the oracle splices the walk CTE chain and counts with a windowed
# self-join.
#
# Scale shape: walk rows cogroup ONCE by walk-id hash bucket (a walk's
# ≤ _WALK_LEN+1 rows land together; pairs are generated inside the group
# by offset-shifted vectorized compares, never a per-walk Python loop),
# and pair counts pre-aggregate inside the same group before ONE bounded
# pair-hash-bucket exchange + reduceat sum — the classic combiner shape:
# the exchange carries unique (center, context) partials, not raw pairs.

_SKIPGRAM_WINDOW = 2


def walk_skipgrams_ds(walks_ds, window: int = _SKIPGRAM_WINDOW, buckets: int = _BUCKETS):
    """(center, context, n_cooc) counts over a (walk_id, step, node)
    walk table; contexts are both directions within ``window`` steps."""
    import pandas as pd

    def tag_walks(batch: pa.Table) -> pa.Table:
        wid = batch.column("walk_id").combine_chunks()
        return pa.table(
            {
                "bucket": _cc_bucket_of(wid, buckets),
                "walk_id": wid,
                "step": batch.column("step"),
                "node": batch.column("node"),
            }
        )

    def gen_pairs(group: pd.DataFrame) -> pa.Table:
        wid = group["walk_id"].to_numpy(np.int64)
        step = group["step"].to_numpy(np.int64)
        node = group["node"].to_numpy(np.int64)
        order = np.lexsort((step, wid))
        wid, step, node = wid[order], step[order], node[order]
        centers, contexts = [], []
        for d in range(1, window + 1):
            if d >= len(wid):
                break
            same = (wid[d:] == wid[:-d]) & (step[d:] == step[:-d] + d)
            a, b = node[:-d][same], node[d:][same]
            centers.append(a)
            contexts.append(b)
            centers.append(b)  # symmetric window: both directions
            contexts.append(a)
        if not centers:
            return pa.table(
                {
                    "pbucket": pa.array([], pa.int32()),
                    "center": pa.array([], pa.int64()),
                    "context": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        center = np.concatenate(centers)
        context = np.concatenate(contexts)
        p_order = np.lexsort((context, center))
        center, context = center[p_order], context[p_order]
        key_change = np.empty(len(center), bool)
        key_change[0] = True
        key_change[1:] = (center[1:] != center[:-1]) | (context[1:] != context[:-1])
        idx = np.flatnonzero(key_change)
        counts = np.diff(np.append(idx, len(center))).astype(np.int64)
        center_arr = pa.array(center[idx], pa.int64())
        with np.errstate(over="ignore"):  # wrap is fine: partition hash only
            mixed = pa.array(
                (center[idx] * 1000003 + context[idx]) % (2**31 - 1), pa.int64()
            )
        return pa.table(
            {
                "pbucket": _cc_bucket_of(mixed, buckets),
                "center": center_arr,
                "context": pa.array(context[idx], pa.int64()),
                "c": pa.array(counts, pa.int64()),
            }
        )

    def sum_pairs(group: pd.DataFrame) -> pa.Table:
        center = group["center"].to_numpy(np.int64)
        context = group["context"].to_numpy(np.int64)
        c = group["c"].to_numpy(np.int64)
        order = np.lexsort((context, center))
        center, context, c = center[order], context[order], c[order]
        key_change = np.empty(len(center), bool)
        key_change[0] = True
        key_change[1:] = (center[1:] != center[:-1]) | (context[1:] != context[:-1])
        idx = np.flatnonzero(key_change)
        sums = np.add.reduceat(c, idx)
        return pa.table(
            {
                "center": pa.array(center[idx], pa.int64()),
                "context": pa.array(context[idx], pa.int64()),
                "n_cooc": pa.array(sums, pa.int64()),
            }
        )

    return (
        walks_ds.map_batches(tag_walks, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(gen_pairs, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(sum_pairs, batch_format="pandas")
    )


def q_walk_skipgrams(sf_dir: str, window: int = _SKIPGRAM_WINDOW):
    """Skip-gram pair counts over the q_random_walks corpus, every pair
    (small by construction: ≤ 2·window rows per walk position)."""
    walks = q_random_walks(sf_dir)
    return walk_skipgrams_ds(walks, window=window)


def _sql_walks_prefix(walk_len: int = _WALK_LEN) -> str:
    """The random-walk CTE chain re-wrapped as a ``walks`` CTE (shared by
    the skip-gram and PPMI oracles)."""
    walk_sql = _sql_random_walks(walk_len)
    # strip the trailing SELECT ... ORDER BY and re-wrap as a walks CTE
    body, _, selects = walk_sql.rpartition("\n\n")
    selects = selects.replace("\nORDER BY walk_id, step", "")
    return f"{body},\nwalks AS ({selects})"


def _sql_walk_skipgrams(window: int = _SKIPGRAM_WINDOW) -> str:
    return f"""{_sql_walks_prefix()}
SELECT a.node AS center, b.node AS context, count(*)::BIGINT AS n_cooc
FROM walks a
JOIN walks b
  ON a.walk_id = b.walk_id
 AND b.step <> a.step
 AND abs(b.step - a.step) <= {window}
GROUP BY a.node, b.node
ORDER BY center, context"""


# --------------------------------------------------------------- walk PPMI
# Positive pointwise mutual information over the skip-gram counts — the
# count-based association signal whose factorization skip-gram-with-
# negative-sampling implicitly computes (Levy & Goldberg 2014, "Neural
# Word Embedding as Implicit Matrix Factorization"): high-PPMI pairs are
# the node pairs a DeepWalk embedding would place together.  PMI is
# quantized to WHOLE BITS with the same integer idiom as the unigram LM
# (webquality.py): ``bits = bitlen(n_cooc) + bitlen(T) - bitlen(c_center)
# - bitlen(c_context)`` — a monotone integer proxy for
# ``log2(n·T/(ca·cb))`` that uses SUMS of bit lengths, never bit lengths
# of products, so nothing can overflow int64 at any corpus size; PPMI
# clamps at 0.  Mirrored exactly in the oracle via length(bin(x)).
#
# Scale shape: all pairs of a given center hash to ONE bucket, so the
# center marginal is computed inside the same group that tags it (no
# separate marginal table or broadcast); a second bucket exchange by
# context does the same for the context marginal; T is one skinny driver
# aggregate.  Two bounded exchanges total over the unique-pair table.

def walk_ppmi_ds(walks_ds, window: int = _SKIPGRAM_WINDOW, buckets: int = _BUCKETS):
    """(center, context, n_cooc, ppmi_bits) over a walk table."""
    import pandas as pd

    from lightrag_ray.extras.webquality import _bit_length_u64

    pairs = walk_skipgrams_ds(walks_ds, window=window, buckets=buckets).materialize()
    t_total = int(pairs.sum("n_cooc") or 0)
    bits_t = t_total.bit_length()

    def tag_center(batch: pa.Table) -> pa.Table:
        center = batch.column("center").combine_chunks()
        return pa.table(
            {
                "bucket": _cc_bucket_of(center, buckets),
                "center": center,
                "context": batch.column("context"),
                "n_cooc": batch.column("n_cooc"),
            }
        )

    def attach_ca(group: pd.DataFrame) -> pa.Table:
        center = group["center"].to_numpy(np.int64)
        context = group["context"].to_numpy(np.int64)
        n = group["n_cooc"].to_numpy(np.int64)
        order = np.argsort(center, kind="stable")
        center, context, n = center[order], context[order], n[order]
        uniq, idx = np.unique(center, return_index=True)
        sums = np.add.reduceat(n, idx)
        ca = sums[np.searchsorted(uniq, center)]
        ctx_arr = pa.array(context, pa.int64())
        return pa.table(
            {
                "bucket": _cc_bucket_of(ctx_arr, buckets),
                "center": pa.array(center, pa.int64()),
                "context": ctx_arr,
                "n_cooc": pa.array(n, pa.int64()),
                "ca": pa.array(ca, pa.int64()),
            }
        )

    def attach_cb_and_score(group: pd.DataFrame) -> pa.Table:
        center = group["center"].to_numpy(np.int64)
        context = group["context"].to_numpy(np.int64)
        n = group["n_cooc"].to_numpy(np.int64)
        ca = group["ca"].to_numpy(np.int64)
        order = np.argsort(context, kind="stable")
        center, context, n, ca = (
            center[order], context[order], n[order], ca[order],
        )
        uniq, idx = np.unique(context, return_index=True)
        sums = np.add.reduceat(n, idx)
        cb = sums[np.searchsorted(uniq, context)]
        bits = (
            _bit_length_u64(n).astype(np.int64)
            + bits_t
            - _bit_length_u64(ca).astype(np.int64)
            - _bit_length_u64(cb).astype(np.int64)
        )
        return pa.table(
            {
                "center": pa.array(center, pa.int64()),
                "context": pa.array(context, pa.int64()),
                "n_cooc": pa.array(n, pa.int64()),
                "ppmi_bits": pa.array(np.maximum(bits, 0), pa.int64()),
            }
        )

    return (
        pairs.map_batches(tag_center, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(attach_ca, batch_format="pandas")
        .groupby("bucket")
        .map_groups(attach_cb_and_score, batch_format="pandas")
    )


def q_walk_ppmi(sf_dir: str, window: int = _SKIPGRAM_WINDOW):
    """PPMI-scored skip-gram pairs over the q_random_walks corpus."""
    walks = q_random_walks(sf_dir)
    return walk_ppmi_ds(walks, window=window)


def _sql_walk_ppmi(window: int = _SKIPGRAM_WINDOW) -> str:
    return f"""{_sql_walks_prefix()},
sg AS (
  SELECT a.node AS center, b.node AS context, count(*)::BIGINT AS n_cooc
  FROM walks a
  JOIN walks b
    ON a.walk_id = b.walk_id
   AND b.step <> a.step
   AND abs(b.step - a.step) <= {window}
  GROUP BY a.node, b.node),
ca AS (SELECT center, CAST(sum(n_cooc) AS BIGINT) AS c FROM sg GROUP BY center),
cb AS (SELECT context, CAST(sum(n_cooc) AS BIGINT) AS c FROM sg GROUP BY context),
tot AS (SELECT CAST(sum(n_cooc) AS BIGINT) AS t FROM sg)
SELECT sg.center, sg.context, sg.n_cooc,
       greatest(0,
                length(bin(sg.n_cooc)) + length(bin((SELECT t FROM tot)))
                - length(bin(ca.c)) - length(bin(cb.c)))::BIGINT AS ppmi_bits
FROM sg
JOIN ca ON sg.center = ca.center
JOIN cb ON sg.context = cb.context
ORDER BY sg.center, sg.context"""
