"""Provider-protocol adapter: streaming assembly, retry, truncation marker.

No live provider client ships in this environment, but the PROTOCOL edges a
real deployment hits are pinned here, behavior-parity with the reference's
bindings:

  - ``TruncatedResponse`` / ``is_truncated_response``: a ``str`` subclass
    marking a reply cut off by the provider's max-token budget
    (lightrag/utils.py:4428-4451).  It flows through the ``ModelFn -> str``
    protocol unchanged; the cache layer checks the marker and skips the
    write (lightrag/utils.py:4602-4618 — a cached partial payload would be
    replayed on every later run even when a larger budget would complete).
  - ``RetryableProviderError``: the 429/5xx/timeout class of failures the
    reference retries with exponential backoff (tenacity decorator,
    lightrag/llm/openai.py:229-243: stop_after_attempt(3),
    wait_exponential(multiplier=1, min=4, max=10)).
  - ``assemble_stream``: concatenates streaming delta events into one reply,
    taking the truncation verdict from the final event's ``finish_reason``
    (the reference's streaming inner() loop accumulates chunk deltas and
    inspects the last chunk's finish_reason the same way).

``make_provider_model_fn`` composes the three behind the standard
``(user_prompt, system_prompt, history) -> str`` ModelFn protocol, so it
plugs into :class:`~lightrag_ray.stages.llm_extractor.LLMExtractor`,
``cached_model_fn`` and the query engines unchanged.  Tests drive it with a
recorded transcript (tests/test_llm_provider_fixture.py); production passes
a thin closure over a real HTTP client.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Iterable, Iterator


class TruncatedResponse(str):
    """A model reply cut off by the provider's token budget.  Still a str —
    downstream parsing proceeds on the partial payload — but cache layers
    must not persist it (lightrag/utils.py:4428-4441)."""

    __slots__ = ()


def is_truncated_response(value: Any) -> bool:
    """lightrag/utils.py:4444-4451."""
    return isinstance(value, TruncatedResponse)


class RetryableProviderError(Exception):
    """Transient provider failure (HTTP 429 rate limit, 5xx, timeout,
    connection reset).  ``make_provider_model_fn`` retries these with
    exponential backoff; anything else propagates immediately."""

    def __init__(self, message: str = "", status: int | None = None):
        super().__init__(message)
        self.status = status


def assemble_stream(events: Iterable[dict]) -> str:
    """Streaming events → one reply string.

    Each event is ``{"delta": str, "finish_reason": None | "stop" |
    "length"}`` (the provider-agnostic shape of an SSE chunk stream).  Deltas
    concatenate in order; a final ``finish_reason="length"`` marks the reply
    :class:`TruncatedResponse`."""
    parts: list[str] = []
    finish = None
    for ev in events:
        delta = ev.get("delta")
        if delta:
            parts.append(delta)
        if ev.get("finish_reason") is not None:
            finish = ev["finish_reason"]
    text = "".join(parts)
    return TruncatedResponse(text) if finish == "length" else text


# exponential backoff, reference-shaped: wait = clamp(multiplier * 2^n, min, max)
# (tenacity wait_exponential(multiplier=1, min=4, max=10))
def _backoff_s(attempt: int, multiplier: float = 1.0,
               min_s: float = 4.0, max_s: float = 10.0) -> float:
    return max(min_s, min(max_s, multiplier * (2.0 ** attempt)))


def make_provider_model_fn(
    call: Callable[[str, str | None, list[dict]], Any],
    max_attempts: int = 3,
    sleep: Callable[[float], None] = time.sleep,
):
    """Wrap a raw provider ``call`` as a ModelFn.

    ``call(user, system, history)`` may return a plain ``str``, a
    :class:`TruncatedResponse`, or an ITERATOR/ITERABLE of streaming events
    (see :func:`assemble_stream`) — and may raise
    :class:`RetryableProviderError`, which is retried up to ``max_attempts``
    total attempts with the reference's exponential backoff.  ``sleep`` is
    injectable so tests record the schedule instead of waiting."""

    def model_fn(
        user_prompt: str, system_prompt: str | None, history: list[dict]
    ) -> str:
        last: RetryableProviderError | None = None
        for attempt in range(max_attempts):
            try:
                reply = call(user_prompt, system_prompt, history)
            except RetryableProviderError as exc:
                last = exc
                if attempt + 1 < max_attempts:
                    sleep(_backoff_s(attempt))
                continue
            if isinstance(reply, str):
                return reply
            if isinstance(reply, (Iterator, Iterable)):
                return assemble_stream(reply)
            raise TypeError(
                f"provider call returned {type(reply).__name__}; expected "
                "str, TruncatedResponse, or an event stream"
            )
        raise last if last is not None else RuntimeError("unreachable")

    return model_fn
