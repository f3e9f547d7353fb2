"""Token counting (SURVEY.md engine-additions: whitespace + BPE-ish regex).

Patterns are ASCII-explicit (no \\w / \\s shorthand) so Python ``re``, Go RE2
and DuckDB RE2 agree exactly — these counts are cross-checked against a
DuckDB oracle by the driver.
"""

from __future__ import annotations

import re

# whitespace tokenization: runs of non-space
RE_WS_TOKEN = re.compile(r"[^ \t\n\r\f\v]+")

# BPE-ish pre-tokenizer: letter runs | digit runs | single other non-space
# (a simplified GPT-2-style pretoken split, ASCII classes only)
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\v]"
RE_BPE_TOKEN = re.compile(BPE_TOKEN_PATTERN)


def ws_token_count(text: str) -> int:
    return len(RE_WS_TOKEN.findall(text))


def bpe_token_count(text: str) -> int:
    return len(RE_BPE_TOKEN.findall(text))
