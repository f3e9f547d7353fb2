"""Gopher-style repetition and quality signals — the published rule set of
Rae et al. 2021 ("Scaling Language Models: ... Gopher", appendix A1.1), as
adopted by the public Dolma / RedPajama-v2 / DataTrove cleaning pipelines.

Engine addition on the quality-filter axis (SURVEY engine-additions): the
reference's keep/drop heuristics (punct/symbol density, repeated-line
boilerplate — functions/quality.py) cover the spider's decision semantics;
this module adds the corpus-curation bank a 100-TB training-data pipeline
expects alongside them.  Pure per-document functions (shared verbatim by the
distributed stage and the serial fixture oracle); thresholds are the paper's
published numbers.
"""

from __future__ import annotations

from collections import Counter

# Gopher's stopword test: a document must contain at least two of these
STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_BULLETS = ("•", "‣", "▪", "▫", "⁃", "-", "*")
_ELLIPSIS = ("...", "…")


def _dup_fracs(units: list[str]) -> tuple[float, float]:
    """(duplicate-unit fraction, chars-in-duplicate-units fraction) for a
    list of lines or paragraphs: a unit is 'duplicate' if its exact text
    occurs more than once; the char fraction counts every occurrence."""
    if not units:
        return 0.0, 0.0
    counts = Counter(units)
    total_chars = sum(len(u) for u in units)
    dup_units = sum(c - 1 for c in counts.values())
    dup_chars = sum(len(u) * c for u, c in counts.items() if c > 1)
    return (dup_units / len(units),
            dup_chars / total_chars if total_chars else 0.0)


def _top_ngram_frac(words: list[str], n: int, text_len: int) -> float:
    """Fraction of characters inside the single most frequent word n-gram
    (count × gram character length / document length)."""
    if len(words) < n or text_len == 0:
        return 0.0
    grams = Counter(tuple(words[i : i + n]) for i in range(len(words) - n + 1))
    gram, cnt = grams.most_common(1)[0]
    return cnt * sum(len(w) for w in gram) / text_len


def _dup_ngram_frac(words: list[str], n: int, text_len: int) -> float:
    """Fraction of characters covered by any occurrence of a word n-gram
    that appears more than once (overlapping coverage counted once per
    word, the DataTrove convention)."""
    if len(words) < n or text_len == 0:
        return 0.0
    grams = Counter(tuple(words[i : i + n]) for i in range(len(words) - n + 1))
    dup = {g for g, c in grams.items() if c > 1}
    if not dup:
        return 0.0
    covered = [False] * len(words)
    for i in range(len(words) - n + 1):
        if tuple(words[i : i + n]) in dup:
            for j in range(i, i + n):
                covered[j] = True
    chars = sum(len(w) for w, c in zip(words, covered) if c)
    return chars / text_len


def repetition_signals(text: str) -> dict:
    """The 12 Gopher repetition signals (A1.1 table A1)."""
    text = text or ""
    n_chars = len(text)
    lines = [ln for ln in text.split("\n") if ln.strip()]
    paras = [p for p in text.split("\n\n") if p.strip()]
    words = text.split()
    dup_line_frac, dup_line_char_frac = _dup_fracs(lines)
    dup_para_frac, dup_para_char_frac = _dup_fracs(paras)
    out = {
        "dup_line_frac": dup_line_frac,
        "dup_line_char_frac": dup_line_char_frac,
        "dup_para_frac": dup_para_frac,
        "dup_para_char_frac": dup_para_char_frac,
    }
    for n in (2, 3, 4):
        out[f"top_{n}gram_char_frac"] = _top_ngram_frac(words, n, n_chars)
    for n in (5, 6, 7, 8, 9, 10):
        out[f"dup_{n}gram_char_frac"] = _dup_ngram_frac(words, n, n_chars)
    return out


def quality_signals(text: str) -> dict:
    """The Gopher quality signals (word count / mean word length / symbol
    ratio / bullet & ellipsis lines / alpha words / stopwords)."""
    text = text or ""
    words = text.split()
    n_words = len(words)
    lines = [ln for ln in text.split("\n") if ln.strip()]
    mean_wl = (sum(len(w) for w in words) / n_words) if n_words else 0.0
    n_sym = text.count("#") + sum(text.count(e) for e in _ELLIPSIS)
    bullet = sum(1 for ln in lines if ln.lstrip().startswith(_BULLETS))
    ellip = sum(1 for ln in lines if ln.rstrip().endswith(_ELLIPSIS))
    alpha = sum(1 for w in words if any(c.isalpha() for c in w))
    wl = [w.lower().strip(".,;:!?\"'()[]") for w in words]
    stop = sum(1 for s in STOPWORDS if s in wl)
    return {
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "symbol_word_ratio": (n_sym / n_words) if n_words else 0.0,
        "bullet_line_frac": (bullet / len(lines)) if lines else 0.0,
        "ellipsis_line_frac": (ellip / len(lines)) if lines else 0.0,
        "alpha_word_frac": (alpha / n_words) if n_words else 0.0,
        "n_stopwords": stop,
    }


# (signal, threshold, keep-if-below?) — the paper's published cut points
REPETITION_RULES = (
    ("dup_line_frac", 0.30),
    ("dup_para_frac", 0.30),
    ("dup_line_char_frac", 0.20),
    ("dup_para_char_frac", 0.20),
    ("top_2gram_char_frac", 0.20),
    ("top_3gram_char_frac", 0.18),
    ("top_4gram_char_frac", 0.16),
    ("dup_5gram_char_frac", 0.15),
    ("dup_6gram_char_frac", 0.14),
    ("dup_7gram_char_frac", 0.13),
    ("dup_8gram_char_frac", 0.12),
    ("dup_9gram_char_frac", 0.11),
    ("dup_10gram_char_frac", 0.10),
)

MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WL, MAX_MEAN_WL = 3.0, 10.0
MAX_SYMBOL_WORD_RATIO = 0.1
MAX_BULLET_LINE_FRAC = 0.90
MAX_ELLIPSIS_LINE_FRAC = 0.30
MIN_ALPHA_WORD_FRAC = 0.80
MIN_STOPWORDS = 2


def gopher_decide(rep: dict, qual: dict) -> tuple[bool, str]:
    """(keep, reason) per the published thresholds; reason names the FIRST
    failing rule in the paper's order (repetition rules, then quality)."""
    for sig, thr in REPETITION_RULES:
        if rep[sig] > thr:
            return False, sig
    if not (MIN_WORDS <= qual["n_words"] <= MAX_WORDS):
        return False, "n_words"
    if not (MIN_MEAN_WL <= qual["mean_word_len"] <= MAX_MEAN_WL):
        return False, "mean_word_len"
    if qual["symbol_word_ratio"] > MAX_SYMBOL_WORD_RATIO:
        return False, "symbol_word_ratio"
    if qual["bullet_line_frac"] > MAX_BULLET_LINE_FRAC:
        return False, "bullet_line_frac"
    if qual["ellipsis_line_frac"] > MAX_ELLIPSIS_LINE_FRAC:
        return False, "ellipsis_line_frac"
    if qual["alpha_word_frac"] < MIN_ALPHA_WORD_FRAC:
        return False, "alpha_word_frac"
    if qual["n_stopwords"] < MIN_STOPWORDS:
        return False, "n_stopwords"
    return True, ""


def gopher_doc(text: str) -> dict:
    """All signals + the decision for one document (the unit the stage and
    the serial oracle share)."""
    rep = repetition_signals(text)
    qual = quality_signals(text)
    keep, reason = gopher_decide(rep, qual)
    return {**rep, **qual, "gopher_keep": keep, "gopher_reason": reason}
