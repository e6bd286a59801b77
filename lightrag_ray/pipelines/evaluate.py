"""Evaluation harness: offline retrieval metrics + LLM-judge answer battles.

Mirrors the reference's two evaluation surfaces:

  - ``retrieval_eval``: deterministic retrieval-quality metrics over an
    oracle set of (question, expected ids) — the reference's
    ``offline_retrieval_check.py`` (recall@k over an expected-document
    oracle; lightrag/evaluation/offline_retrieval_check.py:60-70) lifted
    onto this engine's query context: chunk- and entity-level recall@k plus
    MRR per question, and a macro summary.
  - ``batch_answer_eval``: pairwise answer comparison with an LLM judge on
    Comprehensiveness / Diversity / Empowerment — the prompt and JSON
    verdict shape of ``reproduce/batch_eval.py:29-72``, behind the same
    injectable ModelFn protocol as every other model call (deterministic
    offline judge by default; the reference requires a live OpenAI batch
    job).

Queries in an eval set are few (tens-hundreds); each engine call runs its
own distributed data-plane retrieval, so the driver-side loop over cases is
not a scale concern.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

from lightrag_ray.functions.parse_json import tolerant_load_json_dict
from lightrag_ray.stages.llm_extractor import ModelFn, remove_think_tags

# ---------------------------------------------------------------------------
# deterministic retrieval metrics


def recall_at(expected: list[str], ranked: list[str], k: int) -> float:
    """|expected ∩ ranked[:k]| / |expected| (offline_retrieval_check.py:68)."""
    if not expected:
        return 1.0
    return len(set(expected) & set(ranked[:k])) / len(expected)


def mrr(expected: list[str], ranked: list[str]) -> float:
    """Reciprocal rank of the first expected item (0.0 when absent)."""
    want = set(expected)
    for i, item in enumerate(ranked):
        if item in want:
            return 1.0 / (i + 1)
    return 0.0


def retrieval_eval(
    engine,
    oracle: list[dict],
    mode: str = "hybrid",
    k: int = 10,
    keywords_fn=None,
) -> pa.Table:
    """Per-question retrieval metrics over an oracle set.

    Each case is ``{"question": str, "expected_chunks": [chunk_id, ...]?,
    "expected_entities": [entity_id, ...]?}`` (either expectation list may
    be omitted).  Returns one row per question; feed the table to
    :func:`summarize_eval` for the macro numbers."""
    out = {
        "question": [],
        "n_retrieved_chunks": [],
        "n_retrieved_entities": [],
        "chunk_recall_at_k": [],
        "chunk_mrr": [],
        "entity_recall_at_k": [],
        "entity_mrr": [],
    }
    for case in oracle:
        q = case["question"]
        kwargs = {"mode": mode}
        if keywords_fn is not None:
            kwargs["keywords_fn"] = keywords_fn
        ctx = engine.query(q, **kwargs)
        # context key shape: entities carry "entity", chunks carry
        # "chunk_id" (query_path.QueryContext assembly)
        ranked_chunks = [c["chunk_id"] for c in ctx.chunks]
        ranked_entities = [e["entity"] for e in ctx.entities]
        exp_c = case.get("expected_chunks") or []
        exp_e = case.get("expected_entities") or []
        out["question"].append(q)
        out["n_retrieved_chunks"].append(len(ranked_chunks))
        out["n_retrieved_entities"].append(len(ranked_entities))
        out["chunk_recall_at_k"].append(
            recall_at(exp_c, ranked_chunks, k) if exp_c else None
        )
        out["chunk_mrr"].append(mrr(exp_c, ranked_chunks) if exp_c else None)
        out["entity_recall_at_k"].append(
            recall_at(exp_e, ranked_entities, k) if exp_e else None
        )
        out["entity_mrr"].append(mrr(exp_e, ranked_entities) if exp_e else None)
    return pa.table(
        {
            "question": pa.array(out["question"], pa.string()),
            "n_retrieved_chunks": pa.array(out["n_retrieved_chunks"], pa.int64()),
            "n_retrieved_entities": pa.array(
                out["n_retrieved_entities"], pa.int64()
            ),
            "chunk_recall_at_k": pa.array(out["chunk_recall_at_k"], pa.float64()),
            "chunk_mrr": pa.array(out["chunk_mrr"], pa.float64()),
            "entity_recall_at_k": pa.array(
                out["entity_recall_at_k"], pa.float64()
            ),
            "entity_mrr": pa.array(out["entity_mrr"], pa.float64()),
        }
    )


def summarize_eval(table: pa.Table) -> dict:
    """Macro means of the non-null metric columns + question count."""
    import pyarrow.compute as pc

    summary: dict = {"n_questions": table.num_rows}
    for col in (
        "chunk_recall_at_k",
        "chunk_mrr",
        "entity_recall_at_k",
        "entity_mrr",
    ):
        m = pc.mean(table.column(col)).as_py()
        summary[col] = None if m is None else round(m, 4)
    return summary


# ---------------------------------------------------------------------------
# LLM-judge answer battles (reproduce/batch_eval.py parity)

JUDGE_SYSTEM_PROMPT = """\
---Role---
You are an expert tasked with evaluating two answers to the same question
based on three criteria: **Comprehensiveness**, **Diversity**, and
**Empowerment**."""

CRITERIA = ("Comprehensiveness", "Diversity", "Empowerment")


def build_judge_prompt(query: str, answer1: str, answer2: str) -> str:
    """The reference's pairwise judge prompt (reproduce/batch_eval.py:29-72),
    including the JSON verdict template."""
    template = ",\n".join(
        f'    "{c}": {{\n        "Winner": "[Answer 1 or Answer 2]",\n'
        f'        "Explanation": "[Provide explanation here]"\n    }}'
        for c in (*CRITERIA, "Overall Winner")
    )
    return f"""You will evaluate two answers to the same question based on three criteria: **Comprehensiveness**, **Diversity**, and **Empowerment**.

- **Comprehensiveness**: How much detail does the answer provide to cover all aspects and details of the question?
- **Diversity**: How varied and rich is the answer in providing different perspectives and insights on the question?
- **Empowerment**: How well does the answer help the reader understand and make informed judgments about the topic?

For each criterion, choose the better answer (either Answer 1 or Answer 2) and explain why. Then, select an overall winner based on these three categories.

Here is the question:
{query}

Here are the two answers:

**Answer 1:**
{answer1}

**Answer 2:**
{answer2}

Evaluate both answers using the three criteria listed above and provide detailed explanations for each criterion.

Output your evaluation in the following JSON format:

{{
{template}
}}
"""


_WORD_RE = re.compile(r"\w+", re.UNICODE)


def offline_judge_model_fn(user_prompt: str, system_prompt, history) -> str:
    """Deterministic judge stand-in: scores each answer by how many distinct
    question terms it covers (ties → Answer 1, mirroring 'first listed wins
    ties' determinism) and emits the reference's JSON verdict shape."""
    q = re.search(r"Here is the question:\n(.*?)\n\nHere are the two answers:",
                  user_prompt, re.DOTALL)
    a1 = re.search(r"\*\*Answer 1:\*\*\n(.*?)\n\n\*\*Answer 2:\*\*",
                   user_prompt, re.DOTALL)
    a2 = re.search(r"\*\*Answer 2:\*\*\n(.*?)\n\nEvaluate both answers",
                   user_prompt, re.DOTALL)
    terms = {w.lower() for w in _WORD_RE.findall(q.group(1) if q else "")}

    def cover(ans: str) -> int:
        words = {w.lower() for w in _WORD_RE.findall(ans)}
        return len(terms & words)

    winner = "Answer 1" if cover(a1.group(1) if a1 else "") >= cover(
        a2.group(1) if a2 else ""
    ) else "Answer 2"
    verdict = {
        c: {"Winner": winner, "Explanation": "deterministic term coverage"}
        for c in (*CRITERIA, "Overall Winner")
    }
    return json.dumps(verdict)


def batch_answer_eval(
    queries: list[str],
    answers1: list[str],
    answers2: list[str],
    judge_model_fn: ModelFn = offline_judge_model_fn,
) -> pa.Table:
    """Pairwise judging of two answer sets; one row per question with the
    per-criterion and overall winners."""
    cols: dict[str, list] = {"question": []}
    for c in (*CRITERIA, "Overall Winner"):
        cols[c.lower().replace(" ", "_")] = []
    for q, a1, a2 in zip(queries, answers1, answers2):
        raw = remove_think_tags(
            judge_model_fn(build_judge_prompt(q, a1, a2), JUDGE_SYSTEM_PROMPT, [])
        )
        verdict = tolerant_load_json_dict(raw) or {}
        cols["question"].append(q)
        for c in (*CRITERIA, "Overall Winner"):
            entry = verdict.get(c) or {}
            cols[c.lower().replace(" ", "_")].append(entry.get("Winner"))
    return pa.table(
        {name: pa.array(vals, pa.string()) if name != "question"
         else pa.array(vals, pa.string()) for name, vals in cols.items()}
    )
