"""Query-side pluggable LLM: keyword extraction (X5) + answer synthesis.

The reference's query path runs two LLM calls around the data plane
(lightrag/operate.py:4426-4562 keyword extraction, :4191-4425 answer
synthesis with the ``rag_response`` prompt, lightrag/prompt.py:332-427 /
482-521).  Here both sit behind the SAME ``ModelFn`` protocol as the build
side's :class:`~lightrag_ray.stages.llm_extractor.LLMExtractor` — an
injected ``(user_prompt, system_prompt, history) -> str`` callable — with
the deterministic stand-ins as defaults, so the data plane stays testable
without a provider and a real client plugs into production unchanged.

Caching reuses the build side's cache-key scheme
(:mod:`lightrag_ray.stages.llm_cache`): ``mode:cache_type:md5`` exactly as
lightrag/utils.py:869.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from lightrag_ray.functions.parse_json import tolerant_load_json_dict
from lightrag_ray.stages.llm_extractor import ModelFn, remove_think_tags

# ---------------------------------------------------------------------------
# keyword extraction (reference prompt.py:482-521)

KEYWORDS_EXAMPLE = """{
  "high_level_keywords": ["<high_level_keyword>"],
  "low_level_keywords": ["<low_level_keyword>"]
}"""


def build_keywords_prompt(query: str, language: str = "English") -> str:
    return f"""---Role---
You are an expert keyword extractor for a Retrieval-Augmented Generation
(RAG) system: identify the high-level and low-level keywords in the user's
query that will drive document retrieval.

---Goal---
Extract two distinct keyword types from the query:
1. **high_level_keywords**: overarching concepts or themes — the core
   intent, subject area, or question type.
2. **low_level_keywords**: specific entities or details — proper nouns,
   technical jargon, product names, concrete items.

---Instructions & Constraints---
1. Output MUST be a valid JSON object and nothing else — no prose, no
   markdown fences; first character `{{`, last character `}}`.
2. Exactly two keys: "high_level_keywords" and "low_level_keywords", each an
   array of strings.
3. Derive keywords ONLY from the User Query below; invent nothing.
4. Prefer concise meaningful phrases over split-up words; no duplicates.
5. For vague or nonsensical queries return
   {{"high_level_keywords": [], "low_level_keywords": []}}.
6. Keywords MUST be in {language}; keep proper nouns in their original
   language.
7. The template below is an output SHAPE only — never copy its placeholder
   tokens.

---Output Format Template---
{KEYWORDS_EXAMPLE}

---Real Data---
User Query: {query}

---Output---
Output:"""


def make_llm_keywords_fn(model_fn: ModelFn, language: str = "English"):
    """keywords_fn-protocol callable (see query_path.KGQueryEngine) backed by
    an injected model; tolerant-JSON parse with an empty-list fallback
    (reference lightrag/operate.py:4516-4560 failure handling)."""

    def keywords_fn(query: str) -> dict[str, list[str]]:
        raw = remove_think_tags(
            model_fn(build_keywords_prompt(query, language), None, [])
        )
        try:
            data = tolerant_load_json_dict(raw)
        except (ValueError, TypeError):
            return {"high_level_keywords": [], "low_level_keywords": []}
        return {
            "high_level_keywords": [
                str(k) for k in data.get("high_level_keywords") or [] if str(k).strip()
            ],
            "low_level_keywords": [
                str(k) for k in data.get("low_level_keywords") or [] if str(k).strip()
            ],
        }

    return keywords_fn


_WORD_RE = re.compile(r"\w{5,}", re.UNICODE)


def offline_keywords_model_fn(user_prompt: str, system_prompt, history) -> str:
    """Deterministic stand-in 'model' for the keyword prompt: ≥5-char words
    of the query, long words as high-level.  Module-level for picklability."""
    m = re.search(r"User Query: (.*?)\n\n---Output---", user_prompt, re.DOTALL)
    query = m.group(1) if m else ""
    words = list(dict.fromkeys(_WORD_RE.findall(query)))
    import json

    return json.dumps(
        {
            "high_level_keywords": [w for w in words if len(w) >= 8],
            "low_level_keywords": words,
        }
    )


# ---------------------------------------------------------------------------
# answer synthesis (reference prompt.py:332-427, operate.py:4191-4425)


def build_context_payload(context) -> str:
    """The reference's kg_query_context assembly (prompt.py:440-465): entity,
    relation and chunk sections as fenced JSON blocks."""
    import json

    return f"""
Knowledge Graph Data (Entity):

```json
{json.dumps(context.entities, ensure_ascii=False, indent=2)}
```

Knowledge Graph Data (Relationship):

```json
{json.dumps(context.relations, ensure_ascii=False, indent=2)}
```

Document Chunks:

```json
{json.dumps(context.chunks, ensure_ascii=False, indent=2)}
```
"""


def build_answer_system_prompt(
    context_payload: str,
    response_type: str = "Multiple Paragraphs",
    user_prompt: str = "",
) -> str:
    return f"""---Role---

You are an expert AI assistant synthesizing information from a provided
knowledge base.  Answer the user query accurately using ONLY the
information in the **Context**.

---Instructions---

1. Extract every fact relevant to the query from the Knowledge Graph Data
   and Document Chunks; weave them into a coherent answer.  Use your own
   knowledge only to phrase fluent sentences, never to add information.
2. If the answer is not in the **Context**, say you do not have enough
   information; do not guess.
3. Respond in the user query's language, in Markdown, presented as
   {response_type}.
4. Additional instructions: {user_prompt}

---Context---

{context_payload}
"""


def offline_answer_model_fn(user_prompt: str, system_prompt, history) -> str:
    """Deterministic stand-in answerer: lists the entity names present in the
    context it was given (proof the context reached the model)."""
    names = re.findall(r'"entity": "([^"]+)"', system_prompt or "")
    if not names:
        return "I do not have enough information to answer."
    return "Entities in context: " + ", ".join(names)


@dataclass
class QueryResult:
    answer: str
    context: object
    keywords: dict = field(default_factory=dict)


class LLMQueryEngine:
    """KGQueryEngine + pluggable keyword/answer models + query cache.

    ``keyword_model_fn`` / ``answer_model_fn`` default to the deterministic
    offline stand-ins; swap in provider clients for production.  Responses
    are cached per (mode, prompt) with the reference's key scheme."""

    def __init__(
        self,
        engine,
        keyword_model_fn: ModelFn = offline_keywords_model_fn,
        answer_model_fn: ModelFn = offline_answer_model_fn,
        language: str = "English",
        response_type: str = "Multiple Paragraphs",
        cache=None,
    ):
        from lightrag_ray.stages.llm_cache import LLMCache

        self.engine = engine
        # held locally, passed per call — never mutate the (shared) engine
        self.keywords_fn = make_llm_keywords_fn(keyword_model_fn, language)
        self.answer_model_fn = answer_model_fn
        self.response_type = response_type
        self.cache = cache if cache is not None else LLMCache()

    def query_data(self, query: str, mode: str = "hybrid") -> dict:
        """Structured retrieval (``aquery_data``) through the engine, with
        THIS engine's (LLM-backed) keyword extractor — no answer LLM call."""
        return self.engine.query_data(query, mode=mode,
                                      keywords_fn=self.keywords_fn)

    def query(self, query: str, mode: str = "hybrid",
              user_prompt: str = "") -> QueryResult:
        context = self.engine.query(query, mode=mode,
                                    keywords_fn=self.keywords_fn)
        if mode == "bypass":
            answer = remove_think_tags(self.answer_model_fn(query, None, []))
            return QueryResult(answer=answer, context=context)
        system_prompt = build_answer_system_prompt(
            build_context_payload(context), self.response_type, user_prompt
        )
        from lightrag_ray.stages.llm_cache import extraction_cache_key

        key = extraction_cache_key(
            query, system_prompt, [], mode=mode, cache_type="query"
        )
        cached = self.cache.get(key)
        if cached is not None:
            return QueryResult(answer=cached, context=context)
        # capture the truncation marker BEFORE remove_think_tags rebuilds a
        # plain str and drops it (reference lightrag/utils.py:4600-4604)
        from lightrag_ray.functions.provider import is_truncated_response

        raw = self.answer_model_fn(query, system_prompt, [])
        answer = remove_think_tags(raw)
        self.cache.put(key, answer, truncated=is_truncated_response(raw))
        return QueryResult(answer=answer, context=context)
