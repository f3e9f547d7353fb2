"""Per-transcript quality metrics + CEPF-style density score.

The reference's CEPF body-extraction scorer works bottom-up over DOM nodes
(/root/reference/extract/content.go:1020-1104):

    score = ln(sqrt(var(leafList) + 1)) * DensitySum
            * ln(TextCount - LinkTextCount + 1) * log10(PCount + 1)

with variance special cases (empty → 0, single leaf → leaf/2,
content.go:1079-1104) and Density = pure_text / pure_tags
(content.go:1042-1048).

For a transcript there is no DOM; the engine analog (SURVEY.md §2.8) treats
*lines* as leaves:
  * leafList   = per-line rune counts
  * TextCount  = total runes, LinkTextCount = runes inside URL-ish matches
  * TagCount   = line count, LinkTagCount = lines that are purely URL-ish
  * Density    = (TextCount-LinkTextCount)/(TagCount-LinkTagCount), 0 on
                 zero denominators (content.go:1044-1048)
  * DensitySum = sum over lines of each line's own density
                 (line_pure_runes / 1 — a line is one "tag")
  * PCount     = lines ending in sentence-final punctuation 。．.!?！？…
                 (the "paragraph" analog of content.go:1038-1040)

Auxiliary ratio metrics mirror the classes the reference strips/thresholds
(punct+symbol class [\\pP\\pS] lang.go:109; brace guard lang.go:372-374;
repeated-line boilerplate = the intra-record dedup analog of SURVEY §2.7).
"""

from __future__ import annotations

import math
import re
from collections import Counter
from dataclasses import dataclass

import regex as _re

_RE_PS = _re.compile(r"[\p{P}\p{S}]")
_RE_P = _re.compile(r"\p{P}")
_RE_S = _re.compile(r"\p{S}")
_RE_HAN = _re.compile(r"\p{Han}")
_RE_DIGIT = re.compile(r"[0-9]")
_RE_SPACE = re.compile(r"\s")
_RE_URLISH = re.compile(r"(?:https?://|www\.)\S+", re.IGNORECASE)
_SENTENCE_END = ("。", "．", ".", "!", "?", "！", "？", "…")

METRIC_FIELDS = (
    "text_len", "n_lines", "punct_ratio", "symbol_ratio", "digit_ratio",
    "space_ratio", "max_line_dup", "line_len_var", "linkish_ratio",
    "brace_pairs", "word_count", "han_count", "quality_score",
)


@dataclass
class QualityMetrics:
    text_len: int
    n_lines: int
    punct_ratio: float
    symbol_ratio: float
    digit_ratio: float
    space_ratio: float
    max_line_dup: float      # most-frequent non-empty line count / n_lines
    line_len_var: float
    linkish_ratio: float     # runes inside URL-ish matches / runes
    brace_pairs: int         # min(count "{", count "}")  (lang.go:372-374)
    word_count: int
    han_count: int
    quality_score: float


def leaf_var(leaf_list: list[int]) -> float:
    """computeVar clone (/root/reference/extract/content.go:1079-1104)."""
    n = len(leaf_list)
    if n == 0:
        return 0.0
    if n == 1:
        return leaf_list[0] / 2.0
    ave = sum(leaf_list) / n
    return sum((x - ave) ** 2 for x in leaf_list) / n


def cepf_score(
    leaf_list: list[int],
    density_sum: float,
    text_count: int,
    link_text_count: int,
    p_count: int,
) -> float:
    """computeScore clone (/root/reference/extract/content.go:1067-1077)."""
    value = math.sqrt(leaf_var(leaf_list) + 1.0)
    score_log10 = math.log10(p_count + 1.0)
    pure = float(text_count - link_text_count)
    score_log = math.log(pure + 1.0) if pure + 1.0 > 0 else 0.0
    return math.log(value) * density_sum * score_log * score_log10


def line_metrics(text: str) -> dict:
    """The per-row line/structure metrics (shared by the oracle
    ``compute_metrics`` and the batch kernel in stages/quality_stage.py —
    single implementation, so the two paths agree by construction).

    Single-line fast path: most transcripts contain no newline, where the
    general path's per-line regex work collapses to one URL scan (URL
    matches cannot span the stripped whitespace, so findall(text) ==
    findall(line)).  Equality with the general path is property-tested."""
    n = len(text)
    if "\n" not in text:
        t = text.strip()
        if not t:
            return {
                "n_lines": 0, "max_line_dup": 0.0, "line_len_var": 0.0,
                "linkish_ratio": 0.0, "word_count": len(text.split()),
                "quality_score": cepf_score([], 0.0, n, 0, 0),
            }
        link_runes = sum(len(m) for m in _RE_URLISH.findall(text))
        leaf = len(t)
        density_sum = float(max(leaf - link_runes, 0))
        p_count = 1 if t.endswith(_SENTENCE_END) else 0
        return {
            "n_lines": 1,
            "max_line_dup": 1.0,
            "line_len_var": leaf_var([leaf]),
            "linkish_ratio": link_runes / n if n else 0.0,
            "word_count": len(text.split()),
            "quality_score": cepf_score([leaf], density_sum, n, link_runes, p_count),
        }
    nonempty = [ln for ln in (l.strip() for l in text.split("\n")) if ln]
    n_lines = len(nonempty)

    link_runes = sum(len(m) for m in _RE_URLISH.findall(text))
    leaf_list = [len(ln) for ln in nonempty]
    p_count = sum(1 for ln in nonempty if ln.endswith(_SENTENCE_END))

    density_sum = 0.0
    for ln in nonempty:
        pure = len(ln) - sum(len(m) for m in _RE_URLISH.findall(ln))
        density_sum += float(max(pure, 0))

    score = cepf_score(leaf_list, density_sum, n, link_runes, p_count)

    dup_ratio = 0.0
    if n_lines:
        most = Counter(nonempty).most_common(1)[0][1]
        dup_ratio = most / n_lines

    return {
        "n_lines": n_lines,
        "max_line_dup": dup_ratio,
        "line_len_var": leaf_var(leaf_list),
        "linkish_ratio": link_runes / n if n else 0.0,
        "word_count": len(text.split()),
        "quality_score": score,
    }


def compute_metrics(text: str) -> QualityMetrics:
    """Row-at-a-time metrics (oracle path). The vectorized batch version in
    stages/quality_stage.py must agree exactly (class counts are
    property-tested against these same regexes in tests/test_vectext.py)."""
    n = len(text)
    punct = len(_RE_P.findall(text))
    symbol = len(_RE_S.findall(text))
    digits = len(_RE_DIGIT.findall(text))
    spaces = len(_RE_SPACE.findall(text))
    han = len(_RE_HAN.findall(text))
    lm = line_metrics(text)

    return QualityMetrics(
        text_len=n,
        n_lines=lm["n_lines"],
        punct_ratio=punct / n if n else 0.0,
        symbol_ratio=symbol / n if n else 0.0,
        digit_ratio=digits / n if n else 0.0,
        space_ratio=spaces / n if n else 0.0,
        max_line_dup=lm["max_line_dup"],
        line_len_var=lm["line_len_var"],
        linkish_ratio=lm["linkish_ratio"],
        brace_pairs=min(text.count("{"), text.count("}")),
        word_count=lm["word_count"],
        han_count=han,
        quality_score=lm["quality_score"],
    )


def compression_signals(text: str, level: int = 6) -> dict:
    """Compressibility + codepoint-entropy quality signals (the
    RedPajama/Dolma-style gibberish-and-boilerplate catchers a rule bank
    can't see): ``comp_ratio`` = len(zlib(text)) / len(utf8(text)) — near 0
    for pathological repetition, near/above 1 for random noise — and
    ``char_entropy`` = Shannon entropy in bits over codepoints (English
    prose ~4.0-4.5; single-char spam → ~0; uniform-random alphanumerics →
    ~6).  zlib with a fixed level is bit-deterministic across platforms, so
    the signals are reproducible corpus-wide."""
    data = (text or "").encode("utf-8")
    if not data:
        return {"n_bytes": 0, "comp_len": 0, "comp_ratio": 0.0,
                "char_entropy": 0.0}
    import zlib

    import numpy as np

    comp_len = len(zlib.compress(data, level))
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    _, counts = np.unique(cps, return_counts=True)
    p = counts / len(cps)
    ent = float(-(p * np.log2(p)).sum())
    return {"n_bytes": len(data), "comp_len": comp_len,
            "comp_ratio": comp_len / len(data), "char_entropy": ent}


RE_SENT_BREAK = re.compile(r"[.!?]+")
RE_VOWEL_RUN = re.compile(r"[aeiouy]+")


def readability_stats(text: str) -> tuple[int, int, int, int]:
    """Flesch–Kincaid grade-level inputs for one document (Kincaid et
    al. 1975, public formula): whitespace words, sentence-break runs
    ([.!?]+, min 1), and syllables approximated as lowercase vowel-group
    runs per word (min 1 per word — the standard cheap heuristic).
    Returns ``(n_words, n_sents, n_syll, fk_milli)`` with
    fk = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59,
    reported as round-half-up milli-units — every input is an exact
    integer, so the fixed-order double expression (and therefore the
    literal SQL restatement) is bit-exact.  Empty/wordless text → all
    zeros."""
    words = (text or "").split()
    n_words = len(words)
    if n_words == 0:
        return 0, 0, 0, 0
    n_sents = max(len(RE_SENT_BREAK.findall(text)), 1)
    n_syll = 0
    for w in words:
        n_syll += max(len(RE_VOWEL_RUN.findall(w.lower())), 1)
    fk = (0.39 * (n_words / n_sents) + 11.8 * (n_syll / n_words) - 15.59)
    import math

    return n_words, n_sents, n_syll, int(math.floor(fk * 1000.0 + 0.5))
