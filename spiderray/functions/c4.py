"""C4-style cleaning rules — the published heuristics of Raffel et al. 2020
("Exploring the Limits of Transfer Learning...", §2.2, the C4 corpus), as
reproduced in the public tensorflow-datasets c4 pipeline.

Engine addition on the quality-filter axis, sibling of functions/gopher.py:
line-level retention (terminal punctuation, ≥3 words, no "javascript"),
page-level discards (<5 sentences, "lorem ipsum", "{", a parameterized
badword list), and the span-hash helpers for C4's signature global
three-sentence-span deduplication (stages/c4.py).  Pure per-document
functions shared verbatim by the distributed stages and the serial fixture
oracle.
"""

from __future__ import annotations

import hashlib
import re

# a line is retained only when it ends in terminal punctuation
TERMINAL_PUNCT = ('.', '!', '?', '"')
MIN_LINE_WORDS = 3
MIN_SENTENCES = 5
SPAN_SENTENCES = 3

# sentence boundary: terminal punct followed by whitespace (deterministic,
# regex-standard; the public C4 code splits about as naively)
_SENT_SPLIT = re.compile(r"(?<=[.!?])[ \t\n\r\f\v]+")


def split_sentences(text: str) -> list[str]:
    return [s for s in _SENT_SPLIT.split(text or "") if s.strip()]


def clean_lines(text: str) -> str:
    """C4 line filter: keep lines that end in terminal punctuation, contain
    at least three words, and do not mention "javascript" (case folded)."""
    kept = []
    for ln in (text or "").split("\n"):
        s = ln.strip()
        if not s.endswith(TERMINAL_PUNCT):
            continue
        if len(s.split()) < MIN_LINE_WORDS:
            continue
        if "javascript" in s.lower():
            continue
        kept.append(s)
    return "\n".join(kept)


def page_keep(cleaned: str, badwords: tuple[str, ...] = ()) -> tuple[bool, str]:
    """C4 page filter over the line-cleaned text: (keep, first-failing
    reason).  Rules in the paper's order: sentence count, "lorem ipsum",
    curly brace (code), badword list."""
    low = cleaned.lower()
    if len(split_sentences(cleaned)) < MIN_SENTENCES:
        return False, "min_sentences"
    if "lorem ipsum" in low:
        return False, "lorem_ipsum"
    if "{" in cleaned:
        return False, "curly_brace"
    for w in badwords:
        if w.lower() in low:
            return False, "badword"
    return True, ""


def span_hash(sentences: list[str]) -> int:
    """uint64 hash of a normalized (case-folded, whitespace-collapsed)
    sentence span."""
    norm = " ".join(" ".join(s.split()).lower() for s in sentences)
    return int.from_bytes(
        hashlib.blake2b(norm.encode(), digest_size=8).digest(), "big")


def doc_span_hashes(text: str, n: int = SPAN_SENTENCES) -> list[tuple[int, int]]:
    """All sliding n-sentence span (hash, start_index) pairs of a document
    (empty when the document has fewer than n sentences)."""
    sents = split_sentences(text)
    return [(span_hash(sents[i : i + n]), i)
            for i in range(len(sents) - n + 1)]


def remove_spans(text: str, starts: list[int], n: int = SPAN_SENTENCES) -> str:
    """Rebuild a document with every sentence covered by a duplicate span
    (each span covers [start, start+n)) removed — C4's dedup action."""
    sents = split_sentences(text)
    drop = set()
    for s in starts:
        drop.update(range(s, min(s + n, len(sents))))
    return " ".join(s for i, s in enumerate(sents) if i not in drop)
