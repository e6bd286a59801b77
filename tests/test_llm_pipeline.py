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


def test_build_kg_llm_arm_provider_protocol_e2e(ray_session, tmp_path):
    """Round-3 VERDICT next #3: the provider protocol composed END-TO-END
    through build_kg — LLMExtractor + gleaning + retry/stream adapter +
    response cache all inside the ExtractStage actor, no live network.

    The recorded transcript exhibits: one 429 retried with backoff, one
    streamed reply, one reply truncated by the token budget that must parse
    (partial payload) but never be cached, and a gleaning round that adds an
    entity.  Actor-side state is asserted via a side-channel call log and the
    cache parquet (flushed after every call).  Reference flow:
    lightrag/operate.py:3658-4146 + cache guard lightrag/utils.py:4602-4618.
    """
    import glob as _glob
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.constants import COMPLETION_DELIMITER as CD
    from lightrag_ray.constants import TUPLE_DELIMITER as TD
    from lightrag_ray.pipelines.kg_build import build_kg
    from lightrag_ray.sources.pages import PAGES_SCHEMA

    log_path = str(tmp_path / "calls.jsonl")
    cache_path = str(tmp_path / "llm_cache.parquet")

    reply_a = (
        f"entity{TD}AlphaCorp{TD}organization{TD}AlphaCorp builds graphs\n"
        f"entity{TD}BetaLabs{TD}organization{TD}BetaLabs ships data\n"
        f"relation{TD}AlphaCorp{TD}BetaLabs{TD}partnership{TD}"
        f"AlphaCorp works with BetaLabs\n{CD}"
    )
    reply_b = (
        f"entity{TD}BetaLabs{TD}organization{TD}BetaLabs ships data\n"
        f"entity{TD}GammaWorks{TD}organization{TD}GammaWorks runs pipelines\n"
        f"relation{TD}BetaLabs{TD}GammaWorks{TD}supply{TD}"
        f"BetaLabs supplies GammaWorks\n{CD}"
    )
    # truncated mid-record: the complete first line parses, the dangling
    # second line is dropped by the tolerant parser, DeltaInc never appears
    reply_c_partial = (
        f"entity{TD}GammaWorks{TD}organization{TD}GammaWorks runs pipelines\n"
        f"entity{TD}Delt"
    )
    glean_a = (
        f"entity{TD}EpsilonOrg{TD}organization{TD}EpsilonOrg found on review\n{CD}"
    )

    def _append(path, obj):
        with open(path, "a") as f:
            f.write(json.dumps(obj) + "\n")

    def _stream(text, finish):
        step = max(1, len(text) // 5)
        pieces = [text[i : i + step] for i in range(0, len(text), step)]
        return [
            {"delta": p, "finish_reason": finish if i == len(pieces) - 1 else None}
            for i, p in enumerate(pieces)
        ]

    class TranscriptProvider:
        """Raw provider call: behavior keyed on marker words in the fenced
        input text; every invocation appended to the side-channel log."""

        def __init__(self):
            self.raised = set()

        def __call__(self, user_prompt, system_prompt, history):
            import re

            from lightrag_ray.functions.provider import RetryableProviderError

            m = re.search(r"```\n(.*?)\n```", user_prompt, re.DOTALL)
            text = m.group(1) if m else None
            _append(log_path, {"kind": "call", "text": text})
            if text is None:  # gleaning continue-prompt: no fenced input
                doc = history[0]["content"] if history else ""
                if "alpharetry" in doc:
                    return _stream(glean_a, "stop")
                return CD
            if "alpharetry" in text:
                if text not in self.raised:
                    self.raised.add(text)
                    raise RetryableProviderError("rate limited", status=429)
                return _stream(reply_a, "stop")
            if "betastream" in text:
                return _stream(reply_b, "stop")
            if "gammatrunc" in text:
                return _stream(reply_c_partial, "length")
            raise AssertionError(f"unexpected input text: {text!r}")

    class E2EModelFn:
        """Provider -> retry/stream adapter -> cache, rebuilt inside the
        actor after pickling; cache parquet flushed after every call so the
        driver process can inspect it."""

        def __init__(self):
            self._inner = None

        def __getstate__(self):
            return {}

        def __setstate__(self, state):
            self._inner = None

        def __call__(self, user_prompt, system_prompt, history):
            if self._inner is None:
                from lightrag_ray.functions.provider import make_provider_model_fn
                from lightrag_ray.stages.llm_cache import LLMCache, cached_model_fn

                self._cache = LLMCache(cache_path)
                self._inner = cached_model_fn(
                    make_provider_model_fn(
                        TranscriptProvider(),
                        sleep=lambda s: _append(log_path, {"kind": "sleep", "s": s}),
                    ),
                    self._cache,
                )
            out = self._inner(user_prompt, system_prompt, history)
            self._cache.flush()
            return out

    texts = {
        "a": "alpharetry AlphaCorp works with BetaLabs on graphs",
        "b": "betastream BetaLabs and GammaWorks ship data",
        "c": "gammatrunc GammaWorks cooperates with DeltaInc",
    }
    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    keys = sorted(texts)
    pq.write_table(
        pa.table(
            {
                "url": [f"https://t.example.org/doc/{k}" for k in keys],
                "warc_ts": pa.array(
                    [1_000_000 * (i + 1) for i in range(len(keys))],
                    pa.timestamp("us"),
                ),
                "html": [f"<p>{texts[k]}</p>".encode() for k in keys],
                "text": [texts[k] for k in keys],
                "lang": ["en"] * len(keys),
            },
            schema=PAGES_SCHEMA,
        ),
        pages_dir / "part-0.parquet",
    )

    cfg = PipelineConfig(
        extractor="llm",
        extractor_options={"model_fn": E2EModelFn()},
        max_gleaning=1,
        llm_max_async=1,
        extractor_concurrency=1,
    )
    res = build_kg(
        [str(pages_dir / "part-0.parquet")],
        str(tmp_path / "build"),
        cfg,
        num_partitions=1,
    )

    nodes = rd.read_parquet(res.nodes_dir).to_pandas()
    edges = rd.read_parquet(res.edges_dir).to_pandas()
    # truncated reply contributed its COMPLETE first record only (no DeltaInc);
    # the gleaning round's EpsilonOrg made it through the merge
    assert set(nodes["entity_id"]) == {
        "AlphaCorp", "BetaLabs", "GammaWorks", "EpsilonOrg",
    }
    assert set(zip(edges["src_id"], edges["tgt_id"])) == {
        ("AlphaCorp", "BetaLabs"),
        ("BetaLabs", "GammaWorks"),
    }

    log = [json.loads(l) for l in open(log_path)]
    calls = [e for e in log if e["kind"] == "call"]
    # 7 raw calls: doc-a initial twice (429 + retry), b and c once each,
    # one gleaning round per doc; exactly one backoff sleep of 4 s
    assert len(calls) == 7
    assert sum("alpharetry" in (e["text"] or "") for e in calls) == 2
    assert [e["s"] for e in log if e["kind"] == "sleep"] == [4.0]

    # cache contents: every completed reply cached; the truncated one absent
    cache_tbl = pq.read_table(cache_path)
    cached = dict(
        zip(cache_tbl.column("key").to_pylist(),
            cache_tbl.column("response").to_pylist())
    )
    assert len(cached) == 5  # a, b initial + 3 gleaning rounds; NOT c initial
    from lightrag_ray.stages.llm_cache import extraction_cache_key
    from lightrag_ray.stages.llm_extractor import (
        build_system_prompt,
        build_user_prompt,
    )

    system_prompt = build_system_prompt()
    chunk_files = _glob.glob(f"{res.chunks_dir}/**/*.parquet", recursive=True)
    contents = pq.read_table(chunk_files).column("content").to_pylist()
    by_marker = {
        m: c
        for c in contents
        for m in ("alpharetry", "betastream", "gammatrunc")
        if m in c
    }
    key_of = lambda c: extraction_cache_key(
        build_user_prompt(c), system_prompt, []
    )
    assert key_of(by_marker["alpharetry"]) in cached
    assert key_of(by_marker["betastream"]) in cached
    assert key_of(by_marker["gammatrunc"]) not in cached  # truncation guard

    # ---- replay run: warm cache serves everything EXCEPT the truncated
    # reply, which must re-invoke the provider (and stay uncached)
    open(log_path, "w").close()
    cfg2 = PipelineConfig(
        extractor="llm",
        extractor_options={"model_fn": E2EModelFn()},
        max_gleaning=1,
        llm_max_async=1,
        extractor_concurrency=1,
    )
    res2 = build_kg(
        [str(pages_dir / "part-0.parquet")],
        str(tmp_path / "build2"),
        cfg2,
        num_partitions=1,
    )
    log2 = [json.loads(l) for l in open(log_path)]
    calls2 = [e for e in log2 if e["kind"] == "call"]
    assert len(calls2) == 1 and "gammatrunc" in calls2[0]["text"]
    nodes2 = rd.read_parquet(res2.nodes_dir).to_pandas()
    assert set(nodes2["entity_id"]) == set(nodes["entity_id"])
