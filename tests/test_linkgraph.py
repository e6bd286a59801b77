"""Link-graph operator kernels (extras/linkgraph.py).

DuckDB parity for link_edges / link_stats / pagerank_top20 runs via
tests/test_extras.py's parametrization over catalog.oracle_sql(); here we
pin the href-extraction regex on crafted html, the fixed-point PageRank
recurrence against a pure-Python reference on a hand-built graph (exact
integer equality, including dangling-mass redistribution), and the degree
kernel on a tiny edge list.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from lightrag_ray.extras import linkgraph as L


def test_extract_links_kernel():
    batch = pa.table(
        {
            "doc_id": pa.array([7, 8, 9, 10], pa.int64()),
            "html": pa.array(
                [
                    b'<html><body><ul>'
                    b'<li><a href="https://w.example.org/doc/0000000003">d3</a></li>'
                    b'<li><a href="https://w.example.org/doc/0000000005">d5</a></li>'
                    b"</ul></body></html>",
                    b"<html><body><ul></ul></body></html>",  # no links
                    # off-site / malformed anchors are not edges
                    b'<a href="https://other.example.com/doc/0000000001">x</a>'
                    b'<a href="https://w.example.org/doc/">empty</a>',
                    None,
                ],
                pa.binary(),
            ),
        }
    )
    out = L.extract_links(batch)
    assert out.column("src").to_pylist() == [7, 7]
    assert out.column("tgt").to_pylist() == [3, 5]


def test_synth_anchor_html_follows_rule():
    batch = pa.table({"doc_id": pa.array([0, 11, 13], pa.int64())})
    out = L._synth_anchor_html(batch, n=100)
    htmls = out.column("html").to_pylist()
    # 0 and 11 are dangling (d % 11 == 0): no anchors
    assert b"<a href" not in htmls[0] and b"<a href" not in htmls[1]
    # 13 → K = 1 + 13 % 4 = 2 targets
    edges = L.extract_links(out)
    assert edges.column("src").to_pylist() == [13, 13]
    expect = [
        (13 * L._MULT + k * L._STEP + L._OFF) % 100 for k in (1, 2)
    ]
    assert edges.column("tgt").to_pylist() == expect


def _py_pagerank(n, edges, iters=L._PR_ITERS):
    """The recurrence from the module docstring, scalar Python ints."""
    od: dict[int, int] = {}
    for s, _ in edges:
        od[s] = od.get(s, 0) + 1
    r = {v: L.FP_ONE // n for v in range(n)}
    base = (15 * L.FP_ONE) // (100 * n)
    for _ in range(iters):
        dm = sum(r[v] for v in range(n) if v not in od)
        share = dm // n
        c: dict[int, int] = {}
        for s, t in edges:
            c[t] = c.get(t, 0) + r[s] // od[s]
        r = {v: base + (85 * (c.get(v, 0) + share)) // 100 for v in range(n)}
    return r


def _ranks_df(nodes, edges, n, **kw):
    import ray.data as rd

    nodes_ds = rd.from_arrow(pa.table({"doc_id": pa.array(nodes, pa.int64())}))
    edges_ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "tgt": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    return (
        L.pagerank_ds(nodes_ds, edges_ds, n, **kw)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )


def test_pagerank_matches_python_reference(ray_session):
    # 6 nodes: a hub (0←1,2,3), a 2-cycle (4↔5), node 3 dangling,
    # a parallel duplicate edge 1→0 ×2 (must count twice in outdeg+contrib)
    n = 6
    edges = [(1, 0), (1, 0), (2, 0), (1, 4), (4, 5), (5, 4), (2, 5)]
    expect = _py_pagerank(n, edges)
    got = _ranks_df(list(range(n)), edges, n)
    assert got["node"].tolist() == list(range(n))
    assert got["r"].tolist() == [expect[v] for v in range(n)]
    # dangling flags: 0 and 3 have no outlinks
    assert got["dang"].tolist() == [True, False, False, True, False, False]


def test_pagerank_dangling_mass_and_determinism(ray_session):
    # all-dangling graph: every node keeps the uniform rank each round
    n = 4
    edges: list[tuple[int, int]] = []
    got = _ranks_df(list(range(n)), edges, n)
    expect = _py_pagerank(n, edges)
    assert got["r"].tolist() == [expect[v] for v in range(n)]
    # uniform by symmetry
    assert len(set(got["r"])) == 1
    # bit-identical across runs (the point of fixed-point arithmetic)
    again = _ranks_df(list(range(n)), edges, n)
    assert got["r"].tolist() == again["r"].tolist()


def test_pagerank_more_buckets_than_nodes(ray_session):
    # bucket count ≫ node count: empty/partial buckets must not break the
    # cogroup kernels
    n = 3
    edges = [(0, 1), (1, 2), (2, 0)]
    got = _ranks_df(list(range(n)), edges, n, buckets=64)
    expect = _py_pagerank(n, edges)
    assert got["r"].tolist() == [expect[v] for v in range(n)]
    # a pure cycle is symmetric → equal ranks
    assert len(set(got["r"])) == 1


def test_link_stats_degrees(ray_session):
    import ray.data as rd

    nodes = rd.from_arrow(pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64())}))
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 0, 1, 2, 2], pa.int64()),
                "tgt": pa.array([1, 2, 2, 1, 1], pa.int64()),
            }
        )
    )
    got = (
        L.link_stats_ds(nodes, edges, k=4)
        .to_pandas()
        .reset_index(drop=True)
    )
    # in_deg: node1←{0,2,2}=3, node2←{0,1}=2; order (in_deg desc, doc_id)
    assert got["doc_id"].tolist() == [1, 2, 0, 3]
    assert got["in_deg"].tolist() == [3, 2, 0, 0]
    assert got["out_deg"].tolist() == [1, 2, 2, 0]


def _edges_tbl(pairs):
    return pa.table(
        {
            "src": pa.array([p[0] for p in pairs], pa.int64()),
            "tgt": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )


def test_kcore_peel_cascade_and_edge_collapse(ray_session):
    import ray.data as rd

    # 4-clique {0,1,2,3} (undirected degree 3 each) + tail 3-10-11-12:
    # the tail peels over THREE rounds (12, then 11, then 10), exercising
    # the iterated fixpoint; duplicate / reciprocal / self edges collapse.
    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    tail = [(3, 10), (10, 11), (11, 12)]
    noise = [(1, 0), (0, 1), (2, 2)]  # reciprocal dup, parallel dup, self
    edges = rd.from_arrow(_edges_tbl(clique + tail + noise))
    res = (
        L.kcore_ds(edges, k=3, iters=5, buckets=8)
        .to_pandas()
        .set_index("doc_id")["degree"]
        .sort_index()
    )
    assert res.index.tolist() == [0, 1, 2, 3]
    assert res.tolist() == [3, 3, 3, 3]


def _layered_edges():
    # 4-layer cascade: root 500 — a0..a2; each a — 2 b's; each b — 2 leaves.
    # Round 1 peels the leaves, round 2 the b's, round 3 the a-root edges:
    # three strictly-shrinking edge sets before the empty fixpoint.
    edges = [(500, 0), (500, 1), (500, 2)]
    b = 100
    for a in (0, 1, 2):
        for _ in range(2):
            edges.append((a, b))
            edges += [(b, b * 10), (b, b * 10 + 1)]
            b += 1
    return edges


def test_kcore_raises_without_fixpoint(ray_session):
    import ray.data as rd

    edges = rd.from_arrow(_edges_tbl(_layered_edges()))
    with pytest.raises(RuntimeError, match="no fixpoint"):
        L.kcore_ds(edges, k=3, iters=3, buckets=8)


def test_kcore_peels_to_empty(ray_session):
    import ray.data as rd

    edges = rd.from_arrow(_edges_tbl(_layered_edges()))
    assert L.kcore_ds(edges, k=3, iters=5, buckets=8).count() == 0


def test_kcore_whole_graph_survives(ray_session):
    import ray.data as rd

    # triangle with k=2: nothing peels; converges on the first count check
    edges = rd.from_arrow(_edges_tbl([(0, 1), (1, 2), (2, 0)]))
    res = L.kcore_ds(edges, k=2, iters=3, buckets=4).to_pandas()
    assert sorted(res["doc_id"]) == [0, 1, 2]
    assert res["degree"].tolist() == [2, 2, 2]


def _nodes_ds(ids):
    import ray.data as rd

    return rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))


def test_triangle_counts_hand_graph(ray_session):
    import ray.data as rd

    # K4 on {0,1,2,3} → 4 triangles, 3 per node; pendant 3-10 joins no
    # triangle; 20-21-22-20 is one isolated 3-cycle; node 30 is isolated.
    # Duplicate / reciprocal / self edges must collapse before counting.
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    extra = [(3, 10), (20, 21), (21, 22), (22, 20)]
    noise = [(1, 0), (0, 1), (2, 2)]
    edges = rd.from_arrow(_edges_tbl(k4 + extra + noise))
    nodes = _nodes_ds([0, 1, 2, 3, 10, 20, 21, 22, 30])
    res = (
        L.triangle_counts_ds(nodes, edges, buckets=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert res.index.tolist() == [0, 1, 2, 3, 10, 20, 21, 22, 30]
    assert res["n_triangles"].tolist() == [3, 3, 3, 3, 0, 1, 1, 1, 0]
    assert res["degree"].tolist() == [3, 3, 3, 4, 1, 2, 2, 2, 0]


def test_triangle_counts_wedge_without_closure(ray_session):
    import ray.data as rd

    # open wedge 0-1, 1-2 only: no triangle anywhere, degrees still real.
    edges = rd.from_arrow(_edges_tbl([(0, 1), (1, 2)]))
    res = (
        L.triangle_counts_ds(_nodes_ds([0, 1, 2]), edges, buckets=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert res["n_triangles"].tolist() == [0, 0, 0]
    assert res["degree"].tolist() == [1, 2, 1]


def test_segment_local_arange():
    assert L._segment_local_arange(np.array([3, 2, 0, 1])).tolist() == [
        0, 1, 2, 0, 1, 0,
    ]
    assert L._segment_local_arange(np.array([], dtype=np.int64)).tolist() == []


def test_anchor_text_top_mode_and_tiebreak(ray_session, tmp_path):
    """Pin the per-target argmax through the full query on a corpus small
    enough to recompute in pure Python: mode wins, count ties break to the
    lexicographically smallest anchor, and combiner partials merge before
    the argmax."""
    import collections
    import os

    import pyarrow.parquet as pq

    n = 12
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    res = L.q_anchor_text_top(str(tmp_path)).to_pandas()

    truth: dict[int, collections.Counter] = {}
    for d in range(n):
        if d % L._DANGLE_MOD == 0:
            continue
        for k in range(1, 2 + d % L._MAX_K):
            t = (d * L._MULT + k * L._STEP + L._OFF) % n
            if t == d:
                continue
            truth.setdefault(t, collections.Counter())[f"doc {t} ref{d % 3}"] += 1
    assert len(res) == len(truth)
    for _, row in res.iterrows():
        c = truth[row["doc_id"]]
        assert row["n_inlinks"] == sum(c.values())
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        assert (row["top_anchor"], row["top_count"]) == best


def test_extract_anchors_inner_text():
    batch = pa.table(
        {
            "doc_id": pa.array([5], pa.int64()),
            "html": pa.array(
                [
                    b'<a href="https://w.example.org/doc/0000000003">doc 3 ref2</a>'
                    b'<a href="https://w.example.org/doc/0000000004"></a>'
                    b'<a href="https://other.org/doc/0000000009">off-site</a>'
                ],
                pa.binary(),
            ),
        }
    )
    out = L.extract_anchors(batch)
    assert out.column("tgt").to_pylist() == [3, 4]
    assert out.column("anchor").to_pylist() == ["doc 3 ref2", ""]


def test_hits_star_graph(ray_session):
    import ray.data as rd

    # star: node 0 links to 1..4; no other edges.  After any round the sole
    # hub is 0 and the four authorities tie; the integer normalizer spreads
    # FP across the mass sums: a_i(t) = FP//4-ish each, h_i(0) ≈ FP.
    edges = rd.from_arrow(_edges_tbl([(0, t) for t in (1, 2, 3, 4)]))
    res = (
        L.hits_ds(_nodes_ds([0, 1, 2, 3, 4]), edges, iters=2, buckets=4)
        .to_pandas()
        .set_index("node")
        .sort_index()
    )
    # hub mass concentrates on 0; authority mass on the leaves, equally
    assert res.loc[0, "hub"] > 0 and res.loc[0, "auth"] == 0
    leaves = res.loc[[1, 2, 3, 4]]
    assert (leaves["hub"] == 0).all()
    assert leaves["auth"].nunique() == 1 and (leaves["auth"] > 0).all()
    # integer recurrence, hand-checked: ar_1 = FP per leaf (from h0=FP),
    # sum=4FP → d=5 → a1 = FP//5; hr_1(0)=4*(FP//5), d=(4*FP//5)//FP+1=1
    # → h1 = 4*(FP//5); round 2: ar_2 = h1 per leaf, sum=4*h1,
    # d = 4*h1//FP + 1 = 4, a2 = h1//4 = FP//5 (exactly)
    FP = L._HITS_FP
    assert leaves["auth"].iloc[0] == FP // 5
    assert res.loc[0, "hub"] == 4 * (FP // 5)


# ----------------------------------------------------- label propagation
def _py_lpa(n: int, edges: list[tuple[int, int]], iters: int = 4) -> dict:
    """Pure-Python synchronous LPA with the engine's exact rules: simple
    undirected graph, mode of neighbor labels, ties → min label, isolated
    nodes keep theirs."""
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nbrs: dict[int, list[int]] = {v: [] for v in range(n)}
    for a, b in und:
        nbrs[a].append(b)
        nbrs[b].append(a)
    lab = {v: v for v in range(n)}
    for _ in range(iters):
        new = {}
        for v in range(n):
            if not nbrs[v]:
                new[v] = lab[v]
                continue
            cnt: dict[int, int] = {}
            for o in nbrs[v]:
                cnt[lab[o]] = cnt.get(lab[o], 0) + 1
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lab = new
    return lab


def _lpa_df(nodes: list[int], edges: list[tuple[int, int]], **kw):
    import ray.data as rd

    nodes_ds = rd.from_arrow(pa.table({"doc_id": pa.array(nodes, pa.int64())}))
    edges_ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "tgt": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    return (
        L.lpa_labels_ds(nodes_ds, edges_ds, **kw)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )


def test_lpa_matches_python_reference(ray_session):
    # two triangles bridged by one edge, plus an isolated node and a
    # parallel duplicate + self-loop that the simple-graph collapse must
    # drop; mode ≠ min-label here, so this separates LPA from CC
    n = 8
    edges = [
        (0, 1), (1, 2), (2, 0),          # triangle A
        (4, 5), (5, 6), (6, 4),          # triangle B
        (2, 4),                           # bridge
        (0, 1), (1, 1),                   # duplicate + self-loop (dropped)
        (3, 0),                           # pendant off triangle A
    ]  # node 7 isolated
    expect = _py_lpa(n, edges)
    got = _lpa_df(list(range(n)), edges)
    assert got["node"].tolist() == list(range(n))
    assert got["label"].tolist() == [expect[v] for v in range(n)]
    # isolated node keeps its own label
    assert expect[7] == 7
    # bit-identical across runs (synchronous + integer counts)
    again = _lpa_df(list(range(n)), edges)
    assert got["label"].tolist() == again["label"].tolist()


def test_lpa_mode_tie_breaks_to_min_label(ray_session):
    # node 2's neighbors 0 and 1 carry distinct labels with equal count in
    # round 1 → the tie must break to the smaller label on both engines
    n = 3
    edges = [(0, 2), (1, 2)]
    expect = _py_lpa(n, edges)
    got = _lpa_df(list(range(n)), edges)
    assert got["label"].tolist() == [expect[v] for v in range(n)]


def test_lpa_more_buckets_than_nodes(ray_session):
    n = 4
    edges = [(0, 1), (1, 2), (2, 3)]
    expect = _py_lpa(n, edges)
    got = _lpa_df(list(range(n)), edges, buckets=64)
    assert got["label"].tolist() == [expect[v] for v in range(n)]


# -------------------------------------------------- personalized PageRank
def _py_ppr(n, edges, seeds, iters=L._PPR_ITERS):
    """The PPR recurrence from the module comment, scalar Python ints:
    restart and dangling mass both return to the seeds."""
    od: dict[int, int] = {}
    for s, _ in edges:
        od[s] = od.get(s, 0) + 1
    sset = set(seeds)
    s_n = len(sset)
    r = {v: (L.FP_ONE // s_n if v in sset else 0) for v in range(n)}
    base = (15 * L.FP_ONE) // (100 * s_n)
    for _ in range(iters):
        dm = sum(r[v] for v in range(n) if v not in od)
        share = dm // s_n
        c: dict[int, int] = {}
        for s, t in edges:
            c[t] = c.get(t, 0) + r[s] // od[s]
        r = {
            v: (
                base + (85 * (c.get(v, 0) + share)) // 100
                if v in sset
                else (85 * c.get(v, 0)) // 100
            )
            for v in range(n)
        }
    return r


def _ppr_df(nodes, edges, seeds, **kw):
    import ray.data as rd

    nodes_ds = rd.from_arrow(pa.table({"doc_id": pa.array(nodes, pa.int64())}))
    edges_ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "tgt": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    return (
        L.ppr_ds(nodes_ds, edges_ds, np.asarray(seeds, np.int64), **kw)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )


def test_ppr_matches_python_reference(ray_session):
    # same hand graph as the pagerank test (hub, 2-cycle, dangling node,
    # parallel duplicate edge), seeded at {1, 4}
    n = 6
    edges = [(1, 0), (1, 0), (2, 0), (1, 4), (4, 5), (5, 4), (2, 5)]
    seeds = [1, 4]
    expect = _py_ppr(n, edges, seeds)
    got = _ppr_df(list(range(n)), edges, seeds)
    assert got["node"].tolist() == list(range(n))
    assert got["r"].tolist() == [expect[v] for v in range(n)]
    assert got["seed"].tolist() == [False, True, False, False, True, False]
    # node 3 is unreachable from the seeds → exactly zero mass
    assert got.loc[3, "r"] == 0
    # node 2 never receives (no in-edges) and is not a seed → zero
    assert got.loc[2, "r"] == 0


def test_ppr_mass_stays_near_seeds(ray_session):
    # chain 0→1→2→...→9 seeded at 0: rank must be strictly decreasing
    # along the chain (mass decays by the damping factor per hop)
    n = 10
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _ppr_df(list(range(n)), edges, [0])
    expect = _py_ppr(n, edges, [0])
    assert got["r"].tolist() == [expect[v] for v in range(n)]
    ranks = got["r"].tolist()
    assert ranks[0] > ranks[1] > ranks[2] > 0


def test_ppr_all_dangling_seeds(ray_session):
    # seeds with no outlinks: dangling mass recycles to the seeds only;
    # non-seeds stay at zero forever
    n = 5
    edges: list[tuple[int, int]] = []
    got = _ppr_df(list(range(n)), edges, [2])
    expect = _py_ppr(n, edges, [2])
    assert got["r"].tolist() == [expect[v] for v in range(n)]
    assert got.loc[2, "r"] > 0
    assert (got.drop(index=2)["r"] == 0).all()


def test_ppr_more_buckets_than_nodes(ray_session):
    n = 3
    edges = [(0, 1), (1, 2), (2, 0)]
    got = _ppr_df(list(range(n)), edges, [0], buckets=64)
    expect = _py_ppr(n, edges, [0])
    assert got["r"].tolist() == [expect[v] for v in range(n)]


def test_ppr_empty_seeds_raises(ray_session):
    import pytest

    with pytest.raises(ValueError, match="empty seed set"):
        _ppr_df([0, 1], [(0, 1)], [])


def test_ppr_oracle_parity_sf0001(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.001"
    ray_df = (
        L.q_ppr_top20(sf)
        .to_pandas()
        .sort_values(["rank_fp", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    sql_df = (
        con.execute(L._sql_ppr())
        .df()
        .astype({"doc_id": "int64", "rank_fp": "int64"})
        .reset_index(drop=True)
    )
    assert ray_df.equals(sql_df)
    assert len(ray_df) == 20


# ------------------------------------------------------- multi-source BFS
def _py_bfs(edges, seeds, max_hops=L._BFS_HOPS):
    """Level-synchronous BFS, plain Python sets."""
    out: dict[int, list[int]] = {}
    for s, t in edges:
        out.setdefault(s, []).append(t)
    dist = {v: 0 for v in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in out.get(u, ()):
                if v not in dist:
                    nxt.add(v)
        for v in nxt:
            dist[v] = h
        frontier = nxt
        if not frontier:
            break
    return dist


def _bfs_df(edges, seeds, **kw):
    import ray.data as rd

    edges_ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "tgt": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    return (
        L.bfs_hops_ds(edges_ds, np.asarray(seeds, np.int64), **kw)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )


def test_bfs_matches_python_reference(ray_session):
    # hand graph: diamond + chain + unreachable back-edge + parallel dup edge
    edges = [(0, 1), (0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (5, 0), (6, 5)]
    got = _bfs_df(edges, [0])
    expect = _py_bfs(edges, [0])
    assert dict(zip(got["node"], got["dist"])) == expect
    # 5 and 6 only point INTO the seed component — never reached
    assert 5 not in got["node"].tolist() and 6 not in got["node"].tolist()


def test_bfs_min_dist_wins(ray_session):
    # node 3 reachable in 1 hop (via 0→3) and 3 hops (0→1→2→3): dist = 1
    edges = [(0, 3), (0, 1), (1, 2), (2, 3)]
    got = _bfs_df(edges, [0])
    assert dict(zip(got["node"], got["dist"])) == {0: 0, 1: 1, 2: 2, 3: 1}


def test_bfs_multi_seed_and_early_exit(ray_session):
    # two seeds, frontier dies at hop 1 → early exit leaves state correct
    edges = [(0, 1), (7, 8)]
    got = _bfs_df(edges, [0, 7], max_hops=4)
    assert dict(zip(got["node"], got["dist"])) == {0: 0, 1: 1, 7: 0, 8: 1}


def test_bfs_hop_cap(ray_session):
    # chain longer than max_hops: nodes past the cap stay unreached
    edges = [(i, i + 1) for i in range(10)]
    got = _bfs_df(edges, [0], max_hops=3)
    assert dict(zip(got["node"], got["dist"])) == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_more_buckets_than_nodes(ray_session):
    edges = [(0, 1), (1, 2), (2, 0)]
    got = _bfs_df(edges, [1], buckets=64)
    assert dict(zip(got["node"], got["dist"])) == {0: 2, 1: 0, 2: 1}


def test_bfs_empty_seeds_raises(ray_session):
    import pytest

    with pytest.raises(ValueError, match="empty seed set"):
        _bfs_df([(0, 1)], [])


def test_graph_hops_oracle_parity_sf0001(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.001"
    ray_df = L.q_graph_hops(sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    sql_df = (
        con.execute(L._sql_graph_hops())
        .df()
        .astype({"dist": "int64", "n_nodes": "int64"})
        .reset_index(drop=True)
    )
    assert ray_df.equals(sql_df)
    # histogram is total: counts sum to the corpus size
    assert int(ray_df["n_nodes"].sum()) == 500


# ------------------------------------------------------ random-walk corpus
def _py_walks(edges, seeds, walk_len=L._WALK_LEN):
    """The module-comment pick rule, scalar Python ints."""
    adj: dict[int, list[int]] = {}
    for s, t in sorted(edges, key=lambda e: (e[0], e[1])):
        adj.setdefault(s, []).append(t)
    rows = []
    for wid in sorted(set(seeds)):
        cur = wid
        rows.append((wid, 0, cur))
        for t in range(1, walk_len + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            pick = (
                (cur % L._WALK_M) * L._WALK_C1
                + (wid % L._WALK_M) * L._WALK_C2
                + t * L._WALK_C3
            ) % L._WALK_M % len(nbrs)
            cur = nbrs[pick]
            rows.append((wid, t, cur))
    return sorted(rows)


def _walks_rows(edges, seeds, **kw):
    import ray.data as rd

    edges_ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "tgt": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    df = L.random_walks_ds(edges_ds, np.asarray(seeds, np.int64), **kw).to_pandas()
    return sorted(map(tuple, df[["walk_id", "step", "node"]].to_numpy()))


def test_walks_match_python_reference(ray_session):
    # hub with fan-out, a 2-cycle, a dangling sink, duplicate parallel edges
    edges = [(0, 1), (0, 2), (0, 2), (0, 5), (1, 2), (2, 1), (5, 6)]
    assert _walks_rows(edges, [0, 5]) == _py_walks(edges, [0, 5])


def test_walks_stop_at_dangling(ray_session):
    # 0 → 1 → sink: walk emits steps 0..2 then stops short of walk_len
    edges = [(0, 1), (1, 2)]
    got = _walks_rows(edges, [0], walk_len=6)
    assert got == [(0, 0, 0), (0, 1, 1), (0, 2, 2)]


def test_walks_isolated_seed(ray_session):
    # seed with no out-edges: corpus is just the step-0 row
    edges = [(1, 2)]
    assert _walks_rows(edges, [0]) == [(0, 0, 0)]


def test_walks_bucket_invariance(ray_session):
    edges = [(i, (i * 3 + 1) % 7) for i in range(7) if (i * 3 + 1) % 7 != i]
    a = _walks_rows(edges, [0, 3], buckets=4)
    b = _walks_rows(edges, [0, 3], buckets=64)
    assert a == b == _py_walks(edges, [0, 3])


def test_walks_empty_seeds_raises(ray_session):
    import pytest

    with pytest.raises(ValueError, match="empty seed set"):
        _walks_rows([(0, 1)], [])


def test_random_walks_oracle_parity_sf0001(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.001"
    ray_df = (
        L.q_random_walks(sf)
        .to_pandas()
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    sql_df = (
        con.execute(L._sql_random_walks())
        .df()
        .astype({"walk_id": "int64", "step": "int64", "node": "int64"})
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )
    assert ray_df.equals(sql_df)
    # every walk starts at its seed
    starts = ray_df[ray_df["step"] == 0]
    assert (starts["walk_id"] == starts["node"]).all()


# ----------------------------------------------------- skip-gram pairs
def _py_skipgrams(walk_rows, window=L._SKIPGRAM_WINDOW):
    """Ordered co-occurrence counts over (walk_id, step, node) rows."""
    by_walk: dict[int, dict[int, int]] = {}
    for wid, step, node in walk_rows:
        by_walk.setdefault(wid, {})[step] = node
    counts: dict[tuple[int, int], int] = {}
    for steps in by_walk.values():
        for i, a in steps.items():
            for d in range(1, window + 1):
                if i + d in steps:
                    b = steps[i + d]
                    counts[(a, b)] = counts.get((a, b), 0) + 1
                    counts[(b, a)] = counts.get((b, a), 0) + 1
    return counts


def _skipgram_counts(walk_rows, **kw):
    import ray.data as rd

    walks_ds = rd.from_arrow(
        pa.table(
            {
                "walk_id": pa.array([r[0] for r in walk_rows], pa.int64()),
                "step": pa.array([r[1] for r in walk_rows], pa.int64()),
                "node": pa.array([r[2] for r in walk_rows], pa.int64()),
            }
        )
    )
    df = L.walk_skipgrams_ds(walks_ds, **kw).to_pandas()
    return {
        (int(r.center), int(r.context)): int(r.n_cooc)
        for r in df.itertuples()
    }


def test_skipgrams_match_python_reference(ray_session):
    # two walks sharing nodes (repeat visits accumulate counts); window 2
    walks = [
        (0, 0, 10), (0, 1, 11), (0, 2, 12), (0, 3, 10),
        (7, 0, 11), (7, 1, 10),
    ]
    assert _skipgram_counts(walks) == _py_skipgrams(walks)


def test_skipgrams_window_one(ray_session):
    walks = [(0, 0, 1), (0, 1, 2), (0, 2, 3)]
    got = _skipgram_counts(walks, window=1)
    assert got == {(1, 2): 1, (2, 1): 1, (2, 3): 1, (3, 2): 1}


def test_skipgrams_short_walk_no_pairs(ray_session):
    # single-row walk emits nothing
    assert _skipgram_counts([(5, 0, 5)]) == {}


def test_skipgrams_bucket_invariance(ray_session):
    walks = [(w, s, (w * 7 + s * 3) % 5) for w in range(6) for s in range(4)]
    a = _skipgram_counts(walks, buckets=4)
    b = _skipgram_counts(walks, buckets=64)
    assert a == b == _py_skipgrams(walks)


def test_walk_skipgrams_oracle_parity_sf0001(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.001"
    ray_df = (
        L.q_walk_skipgrams(sf)
        .to_pandas()
        .sort_values(["center", "context"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    sql_df = (
        con.execute(L._sql_walk_skipgrams())
        .df()
        .astype({"center": "int64", "context": "int64", "n_cooc": "int64"})
        .sort_values(["center", "context"])
        .reset_index(drop=True)
    )
    assert ray_df.equals(sql_df)


# --------------------------------------------------------------- walk PPMI
def _py_ppmi(walk_rows, window=L._SKIPGRAM_WINDOW):
    counts = _py_skipgrams(walk_rows, window)
    T = sum(counts.values())
    ca: dict[int, int] = {}
    cb: dict[int, int] = {}
    for (a, b), n in counts.items():
        ca[a] = ca.get(a, 0) + n
        cb[b] = cb.get(b, 0) + n
    return {
        k: (
            n,
            max(
                0,
                n.bit_length()
                + T.bit_length()
                - ca[k[0]].bit_length()
                - cb[k[1]].bit_length(),
            ),
        )
        for k, n in counts.items()
    }


def _ppmi_rows(walk_rows, **kw):
    import ray.data as rd

    walks_ds = rd.from_arrow(
        pa.table(
            {
                "walk_id": pa.array([r[0] for r in walk_rows], pa.int64()),
                "step": pa.array([r[1] for r in walk_rows], pa.int64()),
                "node": pa.array([r[2] for r in walk_rows], pa.int64()),
            }
        )
    )
    df = L.walk_ppmi_ds(walks_ds, **kw).to_pandas()
    return {
        (int(r.center), int(r.context)): (int(r.n_cooc), int(r.ppmi_bits))
        for r in df.itertuples()
    }


def test_ppmi_matches_python_reference(ray_session):
    walks = [
        (0, 0, 10), (0, 1, 11), (0, 2, 12), (0, 3, 10),
        (7, 0, 11), (7, 1, 10), (9, 0, 12), (9, 1, 11),
    ]
    assert _ppmi_rows(walks) == _py_ppmi(walks)


def test_ppmi_clamps_at_zero(ray_session):
    # a hub context co-occurring with everything gets PMI ≤ 0 → clamped
    walks = [(w, s, 99 if s % 2 else w) for w in range(8) for s in range(4)]
    got = _ppmi_rows(walks)
    expect = _py_ppmi(walks)
    assert got == expect
    assert any(v[1] == 0 for v in got.values())  # the clamp actually fires


def test_ppmi_bucket_invariance(ray_session):
    walks = [(w, s, (w * 5 + s) % 6) for w in range(5) for s in range(5)]
    assert _ppmi_rows(walks, buckets=4) == _ppmi_rows(walks, buckets=64)


def test_walk_ppmi_oracle_parity_sf0001(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.001"
    ray_df = (
        L.q_walk_ppmi(sf)
        .to_pandas()
        .sort_values(["center", "context"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    sql_df = (
        con.execute(L._sql_walk_ppmi())
        .df()
        .astype(
            {
                "center": "int64",
                "context": "int64",
                "n_cooc": "int64",
                "ppmi_bits": "int64",
            }
        )
        .sort_values(["center", "context"])
        .reset_index(drop=True)
    )
    assert ray_df.equals(sql_df)
