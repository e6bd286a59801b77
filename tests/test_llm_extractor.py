"""LLM-shaped extractor: prompt wiring, think-tag stripping, gleaning."""

from __future__ import annotations

from lightrag_ray.functions.parse import parse_extraction_result
from lightrag_ray.stages.llm_extractor import (
    LLMExtractor,
    build_user_prompt,
    remove_think_tags,
)


def test_remove_think_tags():
    assert remove_think_tags("<think>reasoning</think>answer") == "answer"
    assert remove_think_tags("a<think>x</think>b<think>y</think>c") == "abc"
    assert remove_think_tags("plain") == "plain"


def _stub_model(responses: list[str]):
    calls = []

    def model(user_prompt, system_prompt, history):
        calls.append({"user": user_prompt, "system": system_prompt, "history": history})
        return responses[len(calls) - 1]

    return model, calls


def test_initial_round_prompts_and_parse():
    model, calls = _stub_model(
        ["<think>hmm</think>entity<|#|>Acme Corp<|#|>Organization<|#|>A company\n<|COMPLETE|>"]
    )
    ex = LLMExtractor(model)
    out = ex.extract("Acme Corp builds rockets.", "chunk-1", 0, "")
    assert out.startswith("entity<|#|>Acme Corp")
    assert "Acme Corp builds rockets." in calls[0]["user"]
    assert "Knowledge Graph Specialist" in calls[0]["system"]
    assert calls[0]["history"] == []
    entities, _ = parse_extraction_result(out, "chunk-1", 0, "fp")
    assert entities[0].entity_name == "Acme Corp"
    assert entities[0].entity_type == "organization"


def test_gleaning_round_replays_history():
    model, calls = _stub_model(
        [
            "entity<|#|>First<|#|>concept<|#|>initial\n<|COMPLETE|>",
            "entity<|#|>Second<|#|>concept<|#|>gleaned\n<|COMPLETE|>",
        ]
    )
    ex = LLMExtractor(model)
    first = ex.extract("text", "c1", 0, "")
    second = ex.extract("text", "c1", 1, first)
    assert "Second" in second
    history = calls[1]["history"]
    assert history[0]["role"] == "user"
    assert history[1]["role"] == "assistant"
    assert "First" in history[1]["content"]


def test_gleaning_skipped_over_token_budget():
    model, calls = _stub_model(["entity<|#|>A1<|#|>concept<|#|>d\n<|COMPLETE|>"])
    ex = LLMExtractor(model, max_extract_input_tokens=10)
    first = ex.extract("some text here", "c1", 0, "")
    second = ex.extract("some text here", "c1", 1, first)
    assert second == "<|COMPLETE|>"
    assert len(calls) == 1  # model NOT called for the skipped round


def test_extract_stage_with_llm_extractor_and_gleaning():
    import pyarrow as pa

    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.stages.extract import ExtractStage

    def model(user_prompt, system_prompt, history):
        if not history:
            return (
                "entity<|#|>Alpha Co<|#|>organization<|#|>short\n"
                "relation<|#|>Alpha Co<|#|>Beta Co<|#|>deal<|#|>a deal\n<|COMPLETE|>"
            )
        return (  # gleaning: longer description wins, new entity added
            "entity<|#|>Alpha Co<|#|>organization<|#|>a much longer description\n"
            "entity<|#|>Beta Co<|#|>organization<|#|>second company\n<|COMPLETE|>"
        )

    cfg = PipelineConfig(
        extractor="llm", extractor_options={"model_fn": model}, max_gleaning=1
    )
    stage = ExtractStage(cfg)
    batch = pa.table(
        {
            "chunk_id": ["d-chunk-000"],
            "url": ["https://x"],
            "chunk_order_index": pa.array([0], pa.int32()),
            "content": ["Alpha Co and Beta Co made a deal."],
            "timestamp": pa.array([1], pa.int64()),
        }
    )
    out = stage(batch).to_pylist()
    ents = {r["name"]: r for r in out if r["kind"] == "e"}
    assert set(ents) == {"Alpha Co", "Beta Co"}
    assert ents["Alpha Co"]["description"] == "a much longer description"
    rels = [r for r in out if r["kind"] == "r"]
    assert len(rels) == 1


def test_gleaning_rounds_ge2_accumulate_history():
    """Rounds ≥ 2 must replay the FULL accumulated conversation — round 0's
    exchange plus every prior gleaning exchange (lightrag/operate.py:3928-3965),
    not an emptied history."""
    model, calls = _stub_model(
        [
            "entity<|#|>First<|#|>concept<|#|>initial\n<|COMPLETE|>",
            "entity<|#|>Second<|#|>concept<|#|>gleaned\n<|COMPLETE|>",
            "entity<|#|>Third<|#|>concept<|#|>gleaned again\n<|COMPLETE|>",
        ]
    )
    ex = LLMExtractor(model)
    out0 = ex.extract("text", "c1", 0, "")
    out1 = ex.extract("text", "c1", 1, out0)
    ex.extract("text", "c1", 2, out1)
    h2 = calls[2]["history"]
    assert len(h2) == 4  # round-0 pair + round-1 pair
    assert "First" in h2[1]["content"]
    assert "Second" in h2[3]["content"]
    assert h2[2]["role"] == "user"  # the round-1 continue-prompt


def test_history_memory_bounded_across_chunks():
    """With max_gleaning=0 (round 0 only) the extractor must not retain one
    history entry per chunk ever seen — single-slot state, overwritten per
    chunk (round-1 VERDICT flag on llm_extractor.py)."""
    model, _ = _stub_model(
        ["entity<|#|>E<|#|>concept<|#|>d\n<|COMPLETE|>"] * 500
    )
    ex = LLMExtractor(model)
    for i in range(500):
        ex.extract(f"text {i}", f"chunk-{i}", 0, "")
    # state is one conversation (2 messages), not 500 dict entries
    assert ex._history_key == "chunk-499"
    assert len(ex._history) == 2


def test_extract_stage_concurrent_llm_calls():
    """llm_max_async model calls run in flight per actor with gleaning state
    isolated per thread; output identical to the serial run."""
    import threading
    import time

    import pyarrow as pa

    from lightrag_ray.config import PipelineConfig
    from lightrag_ray.stages.extract import ExtractStage

    threads_seen = set()
    lock = threading.Lock()

    def model(user_prompt, system_prompt, history):
        with lock:
            threads_seen.add(threading.current_thread().name)
        time.sleep(0.01)
        import re

        m = re.search(r"```\n(.*?)\n```", user_prompt, re.DOTALL)
        word = (m.group(1).split() if m else ["x"])[0]
        if history:  # gleaning round: continue-prompt has no fenced text —
            # recover THIS chunk's word from the replayed history (which
            # must belong to the same thread's chunk, not another thread's)
            hm = re.search(r"```\n(.*?)\n```", history[0]["content"], re.DOTALL)
            hword = hm.group(1).split()[0]
            return f"entity<|#|>{hword}_glean<|#|>concept<|#|>g\n<|COMPLETE|>"
        return f"entity<|#|>{word}<|#|>concept<|#|>d\n<|COMPLETE|>"

    batch = pa.table(
        {
            "chunk_id": [f"c{i}" for i in range(16)],
            "url": ["https://x"] * 16,
            "chunk_order_index": pa.array(range(16), pa.int32()),
            "content": [f"word{i:02d}xx filler" for i in range(16)],
            "timestamp": pa.array([1] * 16, pa.int64()),
        }
    )
    cfg = PipelineConfig(extractor="llm", max_gleaning=1,
                         extractor_options={"model_fn": model},
                         llm_max_async=4)
    parallel = ExtractStage(cfg)(batch).to_pylist()
    assert len(threads_seen) > 1  # calls actually overlapped threads

    cfg_serial = PipelineConfig(extractor="llm", max_gleaning=1,
                                extractor_options={"model_fn": model},
                                llm_max_async=1)
    serial = ExtractStage(cfg_serial)(batch).to_pylist()
    assert parallel == serial
    names = {r["name"] for r in parallel}
    assert "word00xx" in names and "word00xx_glean" in names
