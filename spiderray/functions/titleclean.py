"""Title extraction / cleaning (M7–M9, /root/reference/extract/web.go:39-162).

``web_title`` caps at 128 runes; ``web_title_clean`` implements the zh
loop-delete-from-last-split-mark algorithm and the non-zh cut-at-last-split
rule; ``web_content_title_clean`` is the content-page variant with the
reduced split set.
"""

from __future__ import annotations

import regex as _re

from . import textnorm

# /root/reference/extract/web.go:29-33
TITLE_ZH_SPLITS = ["_", "|", "-", "－", "｜", "—", "＊", "：", ",", "，", ":", "·", ">>", "="]
TITLE_ZH_CONTENT_SPLITS = ["_", "|", "-", "－", "｜", "—"]
TITLE_EN_SPLITS = [" - ", " | ", ":"]

_RE_SHOUYE = _re.compile("首页([ |\\-_－—｜])*")


def web_title(title: str, max_length: int = 0) -> str:
    """WebTitle normalization (web.go:39-57): strip newlines, trim, cap at
    128 runes (or ``max_length`` when 0 < max_length < 128)."""
    title = textnorm.remove_lines(title).strip()
    if 0 < max_length < 128:
        return textnorm.sub_string(title, 0, max_length)
    return textnorm.sub_string(title, 0, 128)


def _zh_loop_clean(title: str, splits: list[str]) -> str:
    """The loop-delete core shared by WebTitleClean / WebContentTitleClean
    (web.go:76-93, 128-146): find the first split mark present (in split-list
    order), repeatedly cut the string at its last occurrence."""
    title_clean = title
    for split in splits:
        end = title_clean.rfind(split)
        if end != -1:
            while True:
                title_clean = title_clean[:end].strip()
                end = title_clean.rfind(split)
                if end == -1:
                    break
            break
    return title_clean


def web_title_clean(title: str, lang: str) -> str:
    """WebTitleClean clone (web.go:60-116)."""
    if lang == "zh":
        for split in TITLE_ZH_SPLITS:
            if textnorm.has_prefix_case(title, split):
                title = textnorm.remove_prefix(title, split)
        if textnorm.has_prefix_case(title, "首页"):
            title = _RE_SHOUYE.sub("", title)
        title_clean = _zh_loop_clean(title, TITLE_ZH_SPLITS)
        if title_clean != "首页":
            title_clean = textnorm.remove_suffix(title_clean, "首页")
        return textnorm.remove_sign(title_clean)
    for split in TITLE_EN_SPLITS:
        end = title.rfind(split)
        if end != -1:
            return title[:end].strip()
    return title


def web_content_title_clean(title: str, lang: str) -> str:
    """WebContentTitleClean clone (web.go:119-162)."""
    if lang == "zh":
        for split in TITLE_ZH_CONTENT_SPLITS:
            if textnorm.has_prefix_case(title, split):
                title = textnorm.remove_prefix(title, split)
        return _zh_loop_clean(title, TITLE_ZH_CONTENT_SPLITS)
    for split in TITLE_EN_SPLITS:
        end = title.rfind(split)
        if end != -1:
            return title[:end].strip()
    return title
