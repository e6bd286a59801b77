"""Repair of LLM-mangled tuple delimiters.

Behavior parity with the reference's ``fix_tuple_delimiter_corruption``
(lightrag/utils.py:5967-6087): each rule rewrites one observed corruption shape
of the ``<|#|>`` field separator back to its canonical form.  The rules are
order-sensitive; keep them in this sequence.
"""

from __future__ import annotations

import re
from functools import lru_cache


@lru_cache(maxsize=8)
def _compiled_rules(core: str, delim: str) -> list[tuple[re.Pattern, str]]:
    c = re.escape(core)
    return [
        # <|##|>, <|#||#|> ... -> <|#|>
        (re.compile(rf"<\|{c}\|*?{c}\|>"), delim),
        # <|\#|> -> <|#|>
        (re.compile(rf"<\|\\{c}\|>"), delim),
        # glued <|> / <||> between non-space chars -> <|#|>
        (re.compile(r"(?<=\S)<\|+>(?=\S)"), delim),
        # one stray char outside the pipes: <X|#|>, <|#|Y>, <X|#|Y>, <||#||>
        (re.compile(rf"<.?\|{c}\|.?>"), delim),
        # missing pipes: <#>, <#|>, <|#>
        (re.compile(rf"<\|?{c}\|?>"), delim),
        # one pipe replaced by another char: <X#|>, <|#X>
        (re.compile(rf"<[^|]{c}\|>|<\|{c}[^|]>"), delim),
        # missing closing '>': <|#| , <|#||
        (re.compile(rf"<\|{c}\|+(?!>)"), delim),
        # <|#: (missing closing)
        (re.compile(rf"<\|{c}:(?!>)"), delim),
        # <||#> / <|#> variants with doubled opening pipes
        (re.compile(rf"<\|+{c}>"), delim),
        # glued unterminated '<||' -> <|#|>
        (re.compile(r"(?<=\S)<\|\|(?!>)"), delim),
        # missing opening '<': |#|>
        (re.compile(rf"(?<!<)\|{c}\|>"), delim),
        # <|#|>| -> <|#|>
        (re.compile(rf"<\|{c}\|>\|"), delim),
        # ||#|| (no angle brackets)
        (re.compile(rf"\|\|{c}\|\|"), delim),
    ]


def fix_tuple_delimiter_corruption(
    record: str, delimiter_core: str, tuple_delimiter: str
) -> str:
    if not record or not delimiter_core or not tuple_delimiter:
        return record
    # fast path: every repair rule's match contains '<' or '|'; a record whose
    # non-canonical text has neither is already clean
    stripped = record.replace(tuple_delimiter, "\x00")
    if "<" not in stripped and "|" not in stripped:
        return record
    for pattern, repl in _compiled_rules(delimiter_core, tuple_delimiter):
        record = pattern.sub(repl, record)
    return record
