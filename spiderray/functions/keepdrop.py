"""Keep/drop classification — the link-vs-content heuristics of
/root/reference/extract/link.go re-targeted at transcripts.

Two layers:

1. ``classify_text(text, lang)`` — a faithful clone of the title-only part of
   ``LinkIsContentByTitle`` (link.go:276-364): the zh Han-count rules, the
   word-language >= 5-words rule, the other-language >= 8-runes rule.  The
   URL-shape gates of the original (255-rune cap, /index.* path) live in
   urlfilter.py / linkstats.py where URLs actually exist.

2. ``decide(...)`` — the clip-level keep/drop policy composing the class
   label with the quality metrics and the zh licence blacklist
   (link.go:23, 139-153), producing (keep, drop_reason, label).

Label values mirror LinkType (link.go:14-17): content / list / unknown / none.
"""

from __future__ import annotations

import regex as _re

from . import textnorm
from .maps import WORD_LANGS, ZH_EN_TITLES, ZH_PUNCS
from .quality import QualityMetrics

LABEL_NONE = "none"
LABEL_CONTENT = "content"
LABEL_LIST = "list"
LABEL_UNKNOWN = "unknown"

# (经营|制作|信息服务|出版|出版服务|演出|视听节目|新闻|视听|新网)许可证  (link.go:23)
RE_TITLE_ZH_BLACK = _re.compile(
    "(经营|制作|信息服务|出版|出版服务|演出|视听节目|新闻|视听|新网)许可证"
)

_RE_HAN = _re.compile(r"\p{Han}")
_RE_EN = _re.compile(r"[a-zA-Z]")

# Default thresholds for the metric-driven drops; tuned to the FIXTURES.md
# strata, overridable via PipelineConfig.
PUNCT_NOISE_RATIO = 0.4     # [\pP\pS] share that marks symbol noise
DUP_LINE_RATIO = 0.5        # most-frequent-line share that marks boilerplate
DUP_LINE_MIN_LINES = 5
BRACE_GUARD = 5             # lang.go:372-374 dynamic-render guard
MIN_QUALITY_SCORE = 0.0     # unknown-label rescue threshold


def classify_text(text: str, lang: str) -> str:
    """LinkIsContentByTitle title-rules clone (link.go:289-363)."""
    if lang == "zh":
        han_count = len(_RE_HAN.findall(text))
        if han_count > 0:
            if han_count > 5:
                despaced = text.replace(textnorm.SPACE, "")
                if len(despaced) >= 8:
                    return LABEL_CONTENT
                # < 8 runes: zh punctuation rescue (link.go:308-314)
                if textnorm.contains_any(despaced, ZH_PUNCS):
                    return LABEL_CONTENT
                return LABEL_UNKNOWN
            return LABEL_LIST
        # no Han: short English whitelist (link.go:319-326)
        if text.lower() in ZH_EN_TITLES:
            return LABEL_LIST
        return LABEL_NONE

    if lang in WORD_LANGS:
        # strip \pP, require a letter, >= 5 space-split words (link.go:328-349)
        stripped = textnorm.remove_punc(text)
        if _RE_EN.search(stripped):
            words = textnorm.split_trim(stripped, textnorm.SPACE)
            if len(words) >= 5:
                return LABEL_CONTENT
            return LABEL_LIST
        return LABEL_NONE

    # other languages: strip \pP, >= 8 runes → content (link.go:350-361)
    stripped = textnorm.remove_punc(text)
    if len(stripped) >= 8:
        return LABEL_CONTENT
    return LABEL_LIST


def is_blacklisted_zh(text: str, lang: str) -> bool:
    """linkClean licence-blacklist demotion (link.go:139-153)."""
    return lang == "zh" and bool(RE_TITLE_ZH_BLACK.search(text))


def decide(
    text: str,
    lang: str,
    metrics: QualityMetrics,
    *,
    codec_ok: bool = True,
    charset_ok: bool = True,
    min_quality_score: float = MIN_QUALITY_SCORE,
) -> tuple[bool, str, str]:
    """Clip keep/drop policy → (keep, drop_reason, label).

    Order mirrors the reference pipeline: transport gates first (content-type
    allowlist http.go:20-29, transcode failure http.go:157-170), then the
    dynamic-render and boilerplate guards, then language decidability
    (lang.go:292-295), then classification + blacklist + noise metrics.
    """
    if not codec_ok:
        return False, "bad_codec", LABEL_NONE
    if not charset_ok:
        return False, "charset_error", LABEL_NONE
    if metrics.brace_pairs >= BRACE_GUARD:
        return False, "dynamic_render", LABEL_NONE
    if metrics.n_lines >= DUP_LINE_MIN_LINES and metrics.max_line_dup >= DUP_LINE_RATIO:
        return False, "boilerplate", LABEL_NONE
    if lang == "":
        return False, "too_short", LABEL_NONE

    label = classify_text(text, lang)
    if label == LABEL_CONTENT and is_blacklisted_zh(text, lang):
        return False, "blacklist", LABEL_NONE
    if metrics.punct_ratio + metrics.symbol_ratio > PUNCT_NOISE_RATIO:
        return False, "punct_noise", label
    if label == LABEL_CONTENT:
        return True, "", label
    if label == LABEL_UNKNOWN and metrics.quality_score > min_quality_score:
        return True, "", label
    reason = {LABEL_LIST: "short", LABEL_UNKNOWN: "low_quality", LABEL_NONE: "no_lang_chars"}[label]
    return False, reason, label
