"""Description-merge summarization.

Control-flow parity with the reference's ``_handle_entity_relation_summary``
(lightrag/operate.py:368-611):

1. one fragment → sanitize and return (no model);
2. fewer than ``force_llm_summary_on_merge`` fragments AND under
   ``summary_max_tokens`` total → plain ``<SEP>``-join (no model);
3. otherwise iterative map-reduce: greedy-pack fragments into groups of at
   most ``summary_context_size`` tokens (min 2 per group, an oversize pair is
   force-packed), summarize each group, repeat until the survivor list fits,
   then summarize once more.

The "model" is quarantined behind ``summarize_fn(description_type, name,
descriptions) -> str``; the default is :func:`deterministic_summary_model`, a
pure function (an LLM-backed fn slots in for production use — at scale the
caller routes only the hot groups through an actor-pool stage, cold groups
never call ``summarize_fn`` at all thanks to gate 2).

The fragment list entering ``summarize_fn`` is truncated to
``summary_context_size`` tokens over its JSONL rendering, whole items only
(reference ``_summarize_descriptions`` → ``truncate_list_by_token_size``,
lightrag/utils.py:3395-3436; exact for monotonic tokenizers like ours).
"""

from __future__ import annotations

import json
from typing import Callable

from lightrag_ray.config import PipelineConfig
from lightrag_ray.constants import GRAPH_FIELD_SEP
from lightrag_ray.functions.text import sanitize_text_for_encoding
from lightrag_ray.functions.tokenizer import Tokenizer

SummarizeFn = Callable[[str, str, list[str]], str]


def make_deterministic_summary_model(
    tokenizer: Tokenizer, target_tokens: int
) -> SummarizeFn:
    """A pure, model-free summarizer: greedy token-budgeted prefix of the
    fragments joined with '; ', tagged with the subject name.  Deterministic on
    both sides of the parity harness (the reference's mocked LLM applies the
    same function to the prompt's JSONL payload)."""

    def summarize(description_type: str, name: str, descriptions: list[str]) -> str:
        kept: list[str] = []
        used = 0
        for d in descriptions:
            n = len(tokenizer.encode(d))
            if kept and used + n > target_tokens:
                break
            kept.append(d)
            used += n
        body = "; ".join(kept)
        return sanitize_text_for_encoding(f"Summary of {name}: {body}")

    return summarize


def build_summary_prompt(
    description_type: str,
    name: str,
    descriptions: list[str],
    summary_length: int,
    language: str = "English",
) -> str:
    """The reference's summarize prompt (lightrag/prompt.py:295-326): JSONL
    description list, subject header, length + language constraints."""
    description_list = "\n".join(
        json.dumps({"Description": d}, ensure_ascii=False) for d in descriptions
    )
    return f"""---Role---
You are a Knowledge Graph Specialist, proficient in data curation and synthesis.

---Task---
Synthesize the list of descriptions of the given entity or relation into a
single, comprehensive, cohesive summary.

---Instructions---
1. The description list is JSONL: one JSON object per line in the
   `Description List` block.
2. Return the merged description as plain text paragraphs — no extra
   formatting or commentary before or after.
3. Integrate all key information from EVERY provided description.
4. Write from an objective third-person perspective and explicitly mention
   the full name of the entity or relation at the beginning.
5. On conflicting descriptions: if they describe distinct entities sharing a
   name, summarize each separately; otherwise reconcile or present both
   viewpoints with noted uncertainty.
6. The summary must not exceed {summary_length} tokens.
7. Write in {language}; keep proper nouns in their original language.

---Input---
{description_type} Name: {name}

Description List:

```
{description_list}
```

---Output---
"""


def make_llm_summary_model(
    model_fn, target_tokens: int, language: str = "English"
) -> SummarizeFn:
    """LLM-backed SummarizeFn over the same ``ModelFn`` protocol as the
    extractor / query layers (X3's production arm; the deterministic model
    stays the default so parity and bench runs need no provider)."""
    from lightrag_ray.stages.llm_extractor import remove_think_tags

    def summarize(description_type: str, name: str, descriptions: list[str]) -> str:
        prompt = build_summary_prompt(
            description_type, name, descriptions, target_tokens, language
        )
        return sanitize_text_for_encoding(
            remove_think_tags(model_fn(prompt, None, []))
        )

    return summarize


def _truncate_jsonl(
    descriptions: list[str], tokenizer: Tokenizer, max_token_size: int
) -> list[str]:
    """Whole-item greedy prefix of the JSONL rendering under the budget."""
    if max_token_size <= 0 or not descriptions:
        return []
    rendered = [
        json.dumps({"Description": d}, ensure_ascii=False) for d in descriptions
    ]
    sep_tokens = len(tokenizer.encode("\n"))
    used = 0
    kept = 0
    for i, r in enumerate(rendered):
        n = len(tokenizer.encode(r)) + (sep_tokens if i else 0)
        if used + n > max_token_size:
            break
        used += n
        kept += 1
    return descriptions[:kept]


def summarize_descriptions(
    description_type: str,
    name: str,
    description_list: list[str],
    cfg: PipelineConfig,
    tokenizer: Tokenizer,
    summarize_fn: SummarizeFn,
) -> tuple[str, bool]:
    """Returns (final_description, model_was_used)."""
    if not description_list:
        return "", False
    if len(description_list) == 1:
        return sanitize_text_for_encoding(description_list[0]), False

    def call_model(descs: list[str]) -> str:
        truncated = _truncate_jsonl(descs, tokenizer, cfg.summary_context_size)
        return summarize_fn(description_type, name, truncated)

    current = list(description_list)
    model_used = False
    while True:
        counts = [len(tokenizer.encode(d)) for d in current]
        total = sum(counts)

        if total <= cfg.summary_context_size or len(current) <= 2:
            if (
                len(current) < cfg.force_llm_summary_on_merge
                and total < cfg.summary_max_tokens
            ):
                final = sanitize_text_for_encoding(GRAPH_FIELD_SEP.join(current))
                return (final if final else ""), model_used
            return call_model(current), True

        # Map phase: greedy-pack into ≤ context-size groups, min 2 per group.
        groups: list[list[str]] = []
        group: list[str] = []
        group_tokens = 0
        for desc, n in zip(current, counts):
            if group_tokens + n > cfg.summary_context_size and group:
                if len(group) == 1:
                    group.append(desc)  # force-pair an oversize fragment
                    groups.append(group)
                    group, group_tokens = [], 0
                else:
                    groups.append(group)
                    group, group_tokens = [desc], n
            else:
                group.append(desc)
                group_tokens += n
        if group:
            groups.append(group)

        # Reduce phase.
        reduced: list[str] = []
        for g in groups:
            if len(g) == 1:
                reduced.append(g[0])
            else:
                reduced.append(call_model(g))
                model_used = True
        current = reduced
