"""LLM-backed extractor: prompt construction + gleaning control flow.

Mirrors the reference's extraction prompting (structure and knobs from
lightrag/prompt.py:54-159 and lightrag/operate.py:3658-3965) behind the same
:class:`~lightrag_ray.stages.extract.Extractor` protocol the deterministic
rule extractor implements, so the pipeline wiring is identical:

  - system prompt: role, extraction instructions, record format
    (``entity<|#|>…`` / ``relation<|#|>…``), per-response caps
    (``max_total_records`` / ``max_entity_records``), language directive,
    entity-type guidance block;
  - user prompt: task + fenced input text;
  - gleaning round: continue-prompt with the prior round's conversation
    replayed as history, skipped when the projected input exceeds
    ``max_extract_input_tokens`` (lightrag/operate.py:3864-3892);
  - responses pass through ``remove_think_tags``
    (lightrag/utils.py:4454-4467) before the shared parser.

The model is an injected callable ``(user_prompt, system_prompt, history) ->
str`` — a provider client in production, a deterministic stub in tests.  No
network client ships in this environment.
"""

from __future__ import annotations

import re
from typing import Callable, Protocol

from lightrag_ray.constants import (
    COMPLETION_DELIMITER,
    MAX_EXTRACTION_ENTITIES,
    MAX_EXTRACTION_RECORDS,
    TUPLE_DELIMITER,
)

MAX_EXTRACT_INPUT_TOKENS = 20480  # lightrag/constants.py:38

DEFAULT_ENTITY_TYPES_GUIDANCE = """\
Classify each entity with one of: Person, Creature, Organization, Location,
Event, Concept, Method, Content, Data, Artifact, NaturalObject — or `Other`
when none fits."""

_THINK_RE = re.compile(r"<think>.*?</think>", re.DOTALL)


def remove_think_tags(text: str) -> str:
    """Strip reasoning-model ``<think>`` blocks (lightrag/utils.py:4454-4467)."""
    return _THINK_RE.sub("", text or "").strip()


class ModelFn(Protocol):
    """Injected model callable.  With ``PipelineConfig.llm_max_async > 1``
    (the default, matching the reference's semaphore) the extractor stage
    invokes it from several threads concurrently — implementations must be
    thread-safe (HTTP clients generally are; wrap non-thread-safe models in
    a lock or set ``llm_max_async=1``)."""

    def __call__(
        self, user_prompt: str, system_prompt: str | None, history: list[dict]
    ) -> str: ...


def build_system_prompt(
    language: str = "English",
    entity_types_guidance: str = DEFAULT_ENTITY_TYPES_GUIDANCE,
    max_total_records: int = MAX_EXTRACTION_RECORDS,
    max_entity_records: int = MAX_EXTRACTION_ENTITIES,
) -> str:
    td, cd = TUPLE_DELIMITER, COMPLETION_DELIMITER
    return f"""---Role---
You are a Knowledge Graph Specialist extracting entities and relationships
from the `---Input Text---` section of the user prompt.

---Instructions---
1. Extract clearly defined entities: name (title case where case-insensitive,
   consistent across the extraction), a type from the guidance below (`Other`
   if none fits), and a concise third-person description grounded solely in
   the input text.
2. Extract direct binary relationships between extracted entities: source,
   target, one or more comma-separated high-level keywords (never use
   `{td}` inside the keyword field), and a concise description.  Treat
   relationships as undirected; do not emit duplicates or reversed copies.
3. Output format — one record per line, entities first, then relationships:
   entity{td}entity_name{td}entity_type{td}entity_description
   relation{td}source_entity{td}target_entity{td}keywords{td}description
   `{td}` is an atomic field separator and must never contain content.
4. Emit at most {max_total_records} total rows and at most
   {max_entity_records} entity rows; only emit relationships whose endpoints
   are among the emitted entities; stop immediately with `{cd}` when the
   limit is reached.
5. Write every name, keyword and description in {language}; keep proper
   nouns in their original language; never use pronouns.
6. Output only the record lines and the final `{cd}` line — no commentary.

---Entity Types---
{entity_types_guidance}
"""


def build_user_prompt(input_text: str, language: str = "English") -> str:
    cd = COMPLETION_DELIMITER
    return f"""---Task---
Extract entities and relationships from the `---Input Text---` section below,
following the system instructions exactly.  Output only the record lines and
finish with `{cd}` on its own line.  Output language: {language}.

---Input Text---
```
{input_text}
```

---Output---
"""


def build_continue_prompt(language: str = "English") -> str:
    cd = COMPLETION_DELIMITER
    return f"""---Task---
Identify entities and relationships that were MISSED or incorrectly formatted
in the previous extraction of the same input text.  Do not re-output records
that were already correct.  Follow the system record format exactly; finish
with `{cd}`.  Output language: {language}.

---Output---
"""


def offline_stub_model_fn(
    user_prompt: str, system_prompt: str | None, history: list
) -> str:
    """Deterministic offline 'model': extracts ≥6-char words from the
    prompt's fenced input text and emits the reference record format.
    Module-level so Ray actors can unpickle it by reference — use this to
    exercise the LLM-shaped path without a provider."""
    m = re.search(r"```\n(.*?)\n```", user_prompt, re.DOTALL)
    text = m.group(1) if m else ""
    words = list(dict.fromkeys(re.findall(r"\w{6,}", text)))[:10]
    lines = [
        f"entity{TUPLE_DELIMITER}{w}{TUPLE_DELIMITER}concept{TUPLE_DELIMITER}"
        f"{w} found by the stub model"
        for w in words
    ]
    lines += [
        f"relation{TUPLE_DELIMITER}{a}{TUPLE_DELIMITER}{b}{TUPLE_DELIMITER}"
        f"stub{TUPLE_DELIMITER}{a} with {b}"
        for a, b in zip(words, words[1:])
    ]
    lines.append(COMPLETION_DELIMITER)
    return "\n".join(lines)


class LLMExtractor:
    """Extractor-protocol implementation over an injected model callable."""

    def __init__(
        self,
        model_fn: ModelFn,
        tokenizer=None,
        language: str = "English",
        entity_types_guidance: str = DEFAULT_ENTITY_TYPES_GUIDANCE,
        max_total_records: int = MAX_EXTRACTION_RECORDS,
        max_entity_records: int = MAX_EXTRACTION_ENTITIES,
        max_extract_input_tokens: int = MAX_EXTRACT_INPUT_TOKENS,
    ):
        self.model_fn = model_fn
        if tokenizer is None:
            from lightrag_ray.functions.tokenizer import default_tokenizer

            tokenizer = default_tokenizer()
        self.tokenizer = tokenizer
        self.language = language
        self.system_prompt = build_system_prompt(
            language, entity_types_guidance, max_total_records, max_entity_records
        )
        self.max_extract_input_tokens = max_extract_input_tokens
        # Single-slot conversation state for gleaning, THREAD-LOCAL: the
        # pipeline driver (stages/extract.py ExtractStage.__call__) runs
        # every round of one chunk consecutively on ONE worker thread before
        # that thread takes another chunk (llm_max_async threads in flight,
        # matching the reference's semaphore — lightrag/constants.py:91), so
        # one slot per thread is sufficient and bounded: with max_gleaning=0
        # the slot is simply overwritten by the thread's next chunk.
        import threading

        self._tls = threading.local()
        # SegmentTokenizer interning is not thread-safe; budget estimates
        # from concurrent worker threads serialize on this lock (cheap —
        # only the gleaning-skip projection encodes here)
        self._tok_lock = threading.Lock()

    @property
    def _history_key(self):
        return getattr(self._tls, "key", None)

    @_history_key.setter
    def _history_key(self, value):
        self._tls.key = value

    @property
    def _history(self):
        if not hasattr(self._tls, "history"):
            self._tls.history = []
        return self._tls.history

    @_history.setter
    def _history(self, value):
        self._tls.history = value

    def extract(
        self, content: str, chunk_key: str, round_index: int, prior_output: str
    ) -> str:
        if round_index == 0:
            user = build_user_prompt(content, self.language)
            result = remove_think_tags(
                self.model_fn(user, self.system_prompt, [])
            )
            self._history_key = chunk_key
            self._history = [
                {"role": "user", "content": user},
                {"role": "assistant", "content": result},
            ]
            return result

        # gleaning round: skip when projected input exceeds the token budget
        # (lightrag/operate.py:3864-3892).  The reference replays the FULL
        # accumulated conversation each gleaning round, appending each
        # continue-prompt/response pair to it (lightrag/operate.py:3928-3965),
        # so rounds ≥ 2 must see rounds 0..k-1, not an emptied history.
        history = list(self._history) if self._history_key == chunk_key else []
        continue_prompt = build_continue_prompt(self.language)
        with self._tok_lock:
            projected = (
                len(self.tokenizer.encode(self.system_prompt))
                + sum(len(self.tokenizer.encode(m["content"])) for m in history)
                + len(self.tokenizer.encode(continue_prompt))
            )
        if projected > self.max_extract_input_tokens:
            return COMPLETION_DELIMITER
        result = remove_think_tags(
            self.model_fn(continue_prompt, self.system_prompt, history)
        )
        if self._history_key == chunk_key:
            self._history.extend(
                [
                    {"role": "user", "content": continue_prompt},
                    {"role": "assistant", "content": result},
                ]
            )
        return result
