"""Build-level edge cases: corpora that legitimately produce empty tables."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def test_build_with_zero_relation_mentions(ray_session, tmp_path):
    """Every chunk yields ≤1 entity ⇒ no relation mentions at all; the build
    must emit an empty edges table, not raise (round-1 ADVICE on
    kg_build._read_mentions)."""
    import ray.data as rd

    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.pipelines.kg_build import build_kg
    from lightrag_ray.sources.pages import PAGES_SCHEMA

    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    # single ≥5-char word per page → exactly one entity, zero relations
    words = [f"solitary{i:03d}" for i in range(20)]
    table = pa.table(
        {
            "url": [f"https://z.example.org/doc/{i}" for i in range(20)],
            "warc_ts": pa.array([1_000_000 + i for i in range(20)],
                                pa.timestamp("us")),
            "html": [f"<p>{w}</p>".encode() for w in words],
            "text": words,
            "lang": ["en"] * 20,
        },
        schema=PAGES_SCHEMA,
    )
    pq.write_table(table, pages_dir / "part-0.parquet")

    res = build_kg(
        [str(pages_dir / "part-0.parquet")],
        str(tmp_path / "build"),
        PipelineConfig(),
        num_partitions=1,
    )
    edges = rd.read_parquet(res.edges_dir)
    assert edges.count() == 0
    nodes = rd.read_parquet(res.nodes_dir).take_all()
    assert {r["entity_id"] for r in nodes} == set(words)


def test_build_with_zero_entity_mentions(ray_session, tmp_path):
    """A corpus whose pages sanitize to nothing (or yield no ≥5-char words)
    must produce EMPTY node/edge tables, not crash (code-review regression:
    empty_schema was only wired for the edges phase)."""
    import ray.data as rd

    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.pipelines.kg_build import build_kg
    from lightrag_ray.sources.pages import PAGES_SCHEMA

    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    texts = ["a b c", "xy z", "1 2 3"]  # all words < 5 chars → zero entities
    table = pa.table(
        {
            "url": [f"https://e.example.org/doc/{i}" for i in range(3)],
            "warc_ts": pa.array([1_000_000 + i for i in range(3)],
                                pa.timestamp("us")),
            "html": [f"<p>{t}</p>".encode() for t in texts],
            "text": texts,
            "lang": ["en"] * 3,
        },
        schema=PAGES_SCHEMA,
    )
    pq.write_table(table, pages_dir / "part-0.parquet")

    res = build_kg(
        [str(pages_dir / "part-0.parquet")],
        str(tmp_path / "build"),
        PipelineConfig(),
        num_partitions=1,
    )
    assert rd.read_parquet(res.nodes_dir).count() == 0
    assert rd.read_parquet(res.edges_dir).count() == 0


def test_sequential_reduces_match_concurrent(ray_session, tmp_path):
    """cfg.concurrent_reduces=False must produce the identical graph."""
    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.pipelines.kg_build import build_kg
    from lightrag_ray.sources.pages import synth_pages_from_documents

    files = synth_pages_from_documents(
        "/root/testdata/sf0.001", f"{tmp_path}/pages", num_files=2
    )

    def graph(out, **cfg_kw):
        import ray.data as rd

        res = build_kg(files, out, PipelineConfig(**cfg_kw), num_partitions=1)
        nodes = rd.read_parquet(res.nodes_dir).to_pandas()
        edges = rd.read_parquet(res.edges_dir).to_pandas()
        return (
            nodes.sort_values("entity_id").reset_index(drop=True),
            edges.sort_values(["src_id", "tgt_id"]).reset_index(drop=True),
        )

    n1, e1 = graph(f"{tmp_path}/conc", concurrent_reduces=True)
    n2, e2 = graph(f"{tmp_path}/seq", concurrent_reduces=False)
    assert n1.equals(n2)
    assert e1.equals(e2)


def test_fifo_mode_warns_unbounded_partials(ray_session, tmp_path):
    """Round-2 VERDICT #9: a per-partial FIFO tail-cap is provably unsafe
    (refutation in stages/merge.py), so FIFO keeps uncapped source lists —
    build_kg must warn loudly about the unbounded-memory trade; KEEP (the
    default) must stay silent."""
    import warnings

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.pipelines.kg_build import build_kg
    from lightrag_ray.sources.pages import PAGES_SCHEMA

    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    table = pa.table(
        {
            "url": ["https://z.example.org/doc/0"],
            "warc_ts": pa.array([1_000_000], pa.timestamp("us")),
            "html": [b"<p>alpha12345 beta67890</p>"],
            "text": ["alpha12345 beta67890"],
            "lang": ["en"],
        },
        schema=PAGES_SCHEMA,
    )
    pq.write_table(table, pages_dir / "part-0.parquet")
    files = [str(pages_dir / "part-0.parquet")]

    with pytest.warns(UserWarning, match="UNCAPPED per-key source"):
        build_kg(
            files,
            str(tmp_path / "build-fifo"),
            PipelineConfig(source_ids_limit_method="FIFO"),
            num_partitions=1,
        )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        build_kg(
            files,
            str(tmp_path / "build-keep"),
            PipelineConfig(),
            num_partitions=1,
        )


def test_reprobe_resizes_at_phase_boundaries(ray_session, tmp_path, monkeypatch):
    """Round-3 VERDICT next #2: cfg.reprobe re-measures sustained parallelism
    at the map→shuffle phase boundaries (a burstable host can deplete its CPU
    credits MID-build; a session-start probe can't see it) and re-derives the
    shuffle knobs from the fresh reading.  The re-sizing must be recorded in
    lineage, and — since only partitioning knobs change — the graph must be
    bit-identical to a non-adaptive build."""
    import pandas as pd
    import ray.data as rd

    from lightrag_ray import probe
    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.pipelines.kg_build import build_kg
    from lightrag_ray.sources.pages import synth_pages_from_documents

    files = synth_pages_from_documents(
        "/root/testdata/sf0.001", f"{tmp_path}/pages", num_files=2
    )
    calls: list = []

    def fake_probe(nominal=None, **kw):  # a throttled host: 2 of 4 sustained
        calls.append(nominal)
        return 2.0

    monkeypatch.setattr(probe, "measure_effective_cpus", fake_probe)

    def graph(out, **cfg_kw):
        res = build_kg(files, out, PipelineConfig(**cfg_kw), num_partitions=1)
        nodes = rd.read_parquet(res.nodes_dir).to_pandas()
        edges = rd.read_parquet(res.edges_dir).to_pandas()
        return (
            res,
            nodes.sort_values("entity_id").reset_index(drop=True),
            edges.sort_values(["src_id", "tgt_id"]).reset_index(drop=True),
        )

    res_a, n_a, e_a = graph(
        f"{tmp_path}/adaptive", reprobe=True, concurrent_reduces=True
    )
    assert len(calls) == 2  # B->C and C->endpoints boundaries, exactly once each
    lin = pd.read_parquet(res_a.lineage_path).set_index("phase")
    assert lin.loc["nodes_pre", "reprobe_boundary"] == "B->C"
    assert lin.loc["edges", "reprobe_effective_cpus"] == 2.0
    assert lin.loc["nodes", "reprobe_boundary"] == "C->endpoints"
    # eff < 0.7 × nominal flips concurrent_reduces off; width = max(8, ceil(eff))
    assert not lin.loc["nodes_pre", "reprobe_concurrent_reduces"]
    assert lin.loc["nodes_pre", "reprobe_shuffle_partitions"] == 8

    # a resumed build with everything done must NOT pay the probe again
    calls.clear()
    build_kg(files, f"{tmp_path}/adaptive", PipelineConfig(reprobe=True),
             num_partitions=1)
    assert calls == []

    _, n_b, e_b = graph(f"{tmp_path}/plain")
    assert n_a.equals(n_b)
    assert e_a.equals(e_b)
