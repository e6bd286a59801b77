"""The LLM-shaped extractor through the FULL pipeline (actor pickling,
prompt building, shared parse path, merge)."""

from __future__ import annotations

import pytest

from lightrag_ray.stages.llm_extractor import offline_stub_model_fn


def test_build_kg_with_llm_extractor(ray_session, tmp_path):
    import ray.data as rd

    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.pipelines.kg_build import build_kg
    from lightrag_ray.sources.pages import synth_pages_from_documents

    work = str(tmp_path)
    files = synth_pages_from_documents(
        "/root/testdata/sf0.001", f"{work}/pages", num_files=2
    )
    cfg = PipelineConfig(
        extractor="llm",
        extractor_options={"model_fn": offline_stub_model_fn},
        max_gleaning=0,
    )
    res = build_kg(files, f"{work}/build", cfg, num_partitions=1)
    nodes = rd.read_parquet(res.nodes_dir).to_pandas()
    edges = rd.read_parquet(res.edges_dir).to_pandas()
    assert len(nodes) > 0 and len(edges) > 0
    # ≥6-char words only (the stub's rule), descriptions from the stub
    assert (nodes["entity_id"].str.len() >= 6).all()
    assert nodes["description"].str.contains("stub model").all()
    # mentions flowed through the SHARED parser: types normalized lowercase
    assert (nodes["entity_type"] == "concept").sum() + (
        nodes["entity_type"] == "UNKNOWN"
    ).sum() == len(nodes)


def test_llm_extractor_requires_model_fn():
    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.stages.extract import build_extractor

    with pytest.raises(TypeError):
        build_extractor(PipelineConfig(extractor="llm"))
