"""Publish-date extraction — the date/time regex bank + candidate-selection
semantics of /root/reference/extract/content.go:22-68, 235-254, 310-373,
440-592 (M18 + T2-T4), adapted to record fields instead of a DOM.

Priority cascade (getTime, content.go:310-373):
    meta → meta-En (non-zh) → <time datetime> → <script> → body → lang → URL

Candidate selection (pickPublishDates, content.go:477-592): prefer
candidates WITH a clock time; if the longest is first return it, else pick
the one closest to the title in the body text; for date-only candidates,
en-format picks title-proximity / first, zh picks the most recent date not
more than a day in the future.  ``now`` is always injected (deterministic
tests; no wall-clock reads inside workers).
"""

from __future__ import annotations

import re
import time as _time

import regex as _re

from . import textnorm

# --- regex bank (content.go:22-68), Go syntax ported 1:1 ------------------
_D = r"(0[1-9]|[1-2][0-9]|3[0-1]|[1-9])"
_MO = r"(0[1-9]|1[0-2]|[1-9])"
_CLOCK = r"(([0-9]|[0-1][0-9]|2[0-3]|[1-9])[:点时]([0-5][0-9]|[0-9])[:分]?(([0-5][0-9]|[0-9])[秒]?)?((\.\d{3})?)(z|Z|[\+-]\d{2}[:]?\d{2})?)?"

RE_PUBLISH_DATE = re.compile(
    r"(((20[1-3]\d)[-/年.])" + _MO + r"[-/月.]" + _D + r"[日Tt]?[ ]{0,3}" + _CLOCK + r")"
)
RE_PUBLISH_SHORT_DATE = re.compile(
    r"(((20[1-3]\d|[1-3]\d)[-/年.])" + _MO + r"[-/月.]" + _D + r"[日Tt]?[ ]{0,3}" + _CLOCK + r")"
)
RE_PUBLISH_DATE_NO_YEAR = re.compile(
    r"(" + _MO + r"[-/月.]" + _D + r"[日Tt]?[ ]{0,3}"
    r"(([0-9]|[0-1][0-9]|2[0-3]|[1-9])[:点时]([0-5][0-9]|[0-9])[:分]?(([0-5][0-9]|[0-9])[秒]?)?)?)"
)
_MONTHS = (
    "january|february|march|april|may|june|july|august|september|october|"
    "november|december|jan|feb|mar|apr|may|jun|jul|aug|sept?|oct|nov|dec"
)
RE_EN_PUBLISH_DATE1 = re.compile(
    r"(?i)((?:(0[1-9]|[1-2][0-9]|3[0-1]|[1-9])(?:st|nd|rd|th)?)[, ]{0,4}(" + _MONTHS + r")[, ]{0,4}(20[1-3]\d)"
    r"([, ]{0,4}([0-9]|[0-1][0-9]|2[0-3]|[1-9])[:]([0-5][0-9]|[0-9])([:]([0-5][0-9]|[0-9]))?([, ]{0,4}(am|pm))?)?)"
)
RE_EN_PUBLISH_DATE2 = re.compile(
    r"(?i)((" + _MONTHS + r")[, ]{0,4}(?:(0[1-9]|[1-2][0-9]|3[0-1]|[1-9])(?:st|nd|rd|th)?)[, ]{0,4}(20[1-3]\d)"
    r"([, ]{0,4}([0-9]|[0-1][0-9]|2[0-3]|[1-9])[:]([0-5][0-9]|[0-9])([:]([0-5][0-9]|[0-9]))?([, ]{0,4}(am|pm))?)?)"
)
RE_EN_US_PUBLISH_DATE = re.compile(
    r"(" + _MO + r"[-/.]" + _D + r"[-/.](20[1-3]\d|[1-3]\d)[ ]{0,3}"
    r"(([0-9]|[0-1][0-9]|2[0-3]|[1-9])[:]([0-5][0-9]|[0-9])[:]?(([0-5][0-9]|[0-9]))?)?)"
)
RE_TIME = re.compile(
    r"([0-9]|[0-1][0-9]|2[0-3]|[1-9])[:点时]([0-5][0-9]|[0-9])[:分]?(([0-5][0-9]|[0-9])[秒]?)?"
)
RE_ZH_PUBLISH_PREFIX = "(?i)(发布|创建|出版|发表|编辑)?(时间|日期)"
RE_ZH_PUBLISH_DATE = _re.compile(
    RE_ZH_PUBLISH_PREFIX + r"[\p{P} ]{1,8}" + RE_PUBLISH_SHORT_DATE.pattern
)
RE_SCRIPT_TITLE = re.compile(r'(?i)"title"[\t ]{0,4}:[\t ]{0,4}"(.*)"')
RE_SCRIPT_TIME = re.compile(
    r'(?i)"[\w_\-]*pub.*"[\t ]{0,4}:[\t ]{0,4}"((((20[1-3]\d)[-/年.])(0[1-9]|1[0-2]|[1-9])[-/月.](0[1-9]|[1-2][0-9]|3[0-1]|[1-9])[日Tt]?[ ]{0,3}(([0-9]|[0-1][0-9]|2[0-3]|[1-9])[:点时]([0-5][0-9]|[0-9])[:分]?(([0-5][0-9]|[0-9])[秒]?)?((\.\d{3})?)(z|Z|[\+-]\d{2}[:]?\d{2})?)))"'
)
RE_WX_SCRIPT_TIME = re.compile(r'(?i)ct[\t ]{0,4}=[\t ]{0,4}"(1[2-9]\d{8})"')
RE_CONTENT_URL_PUBLISH_DATE = re.compile(r"(20[2-3]\d[/]?(0[1-9]|1[0-2])[/]?(0[1-9]|[1-2][0-9]|3[0-1]))")
RE_FORMAT_TIME3 = re.compile(r"[:分]\d{3}$")
RE_FORMAT_TIME4 = re.compile(r"[:分]\d{4}$")
RE_ZONE = re.compile(r"(([\+-]\d{2})[:]?\d{2})$")

META_DATETIME_DICTS = ("publish", "pubdate", "pubtime", "release", "dctermsdate")


def str_to_time(s: str, now: float | None = None) -> float:
    """fun.StrToTime analog: parse the bank's accepted shapes to an epoch
    (local naive). 0 on failure."""
    t = s.strip()
    t = (
        t.replace("年", "-").replace("月", "-").replace("日", "")
        .replace("点", ":").replace("时", ":").replace("分", ":").replace("秒", "")
        .replace("/", "-").replace(".", "-")
    )
    t = re.sub(r"[Tt]", " ", t)
    t = re.sub(r"(z|Z|[\+-]\d{2}[:]?\d{2})$", "", t).strip()
    t = re.sub(r"\s+", " ", t).rstrip(":")
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M", "%Y-%m-%d", "%y-%m-%d %H:%M:%S",
                "%y-%m-%d %H:%M", "%y-%m-%d"):
        try:
            return _time.mktime(_time.strptime(t, fmt))
        except ValueError:
            continue
    return 0.0


def format_time(time_str: str, en_format: bool = False) -> str:
    """formatTime clone (content.go:235-254)."""
    t = time_str
    if not en_format:
        if textnorm.contains_any(t, ("T", "t", "Z", "z")):
            t = t.replace(" ", "")
        if "T" in t and "z" not in t.lower():
            if not RE_ZONE.search(t):
                t = t.replace("T", " ")
    if ":" in t and not textnorm.contains_any(t, ("时", "点")):
        t = textnorm.remove_suffix(t, "分")
    return t


def _trim_bad_tail(date_str: str) -> str:
    if RE_FORMAT_TIME3.search(date_str):
        return date_str[:-1]
    if RE_FORMAT_TIME4.search(date_str):
        return date_str[:-2]
    return date_str


def pick_publish_dates(
    body_text: str,
    dates: list[str],
    require_time: bool,
    title: str = "",
    title_pos: str = "",
    en_format: bool = False,
    now: float | None = None,
) -> str:
    """pickPublishDates clone (content.go:477-592)."""
    has_times: list[str] = []
    no_times: list[str] = []
    for date in dates:
        d = date.strip()
        if RE_TIME.search(d):
            has_times.append(_trim_bad_tail(d))
        else:
            no_times.append(d)

    if has_times:
        if len(has_times) == 1:
            return has_times[0]
        max_len = max_idx = 0
        for i, d in enumerate(has_times):
            if len(d) > max_len:
                max_len, max_idx = len(d), i
        if max_idx == 0:
            return has_times[0]
        if title and title_pos in ("selector", "headline", "content"):
            title_idx = body_text.find(title)
            best_i, best_d = 0, float("inf")
            for i, d in enumerate(has_times):
                dist = abs(body_text.find(d) - title_idx)
                if dist < best_d:
                    best_i, best_d = i, dist
            return has_times[best_i]
        return has_times[0]

    if not require_time and no_times:
        if len(no_times) == 1:
            return no_times[0]
        if en_format:
            if title and title_pos in ("selector", "headline"):
                title_idx = body_text.find(title)
                best_i, best_d = 0, float("inf")
                for i, d in enumerate(no_times):
                    dist = abs(body_text.find(d) - title_idx)
                    if dist < best_d:
                        best_i, best_d = i, dist
                return no_times[best_i]
            return no_times[0]
        # zh: most recent date not beyond now+86400; note the reference
        # compares but never updates maxTimestamp (content.go:574-585) —
        # replicated faithfully: last in-limit candidate wins
        now = now if now is not None else _time.time()
        limit = now + 86400
        max_ts, max_idx = 0, 0
        for i, d in enumerate(no_times):
            ts = str_to_time(d, now)
            if ts < limit and ts > max_ts:
                max_idx = i
        return no_times[max_idx]

    return ""


def time_from_body(body_text: str, lang: str, title: str = "", title_pos: str = "",
                   now: float | None = None) -> str:
    """getTimeByBody clone (content.go:440-475): full short-date matches
    first; zh-only no-year dates (requiring a clock time) get the current
    year prefixed."""
    dates = [m[0] for m in RE_PUBLISH_SHORT_DATE.findall(body_text)]
    if dates:
        return pick_publish_dates(body_text, dates, False, title, title_pos, now=now)
    if lang == "zh":
        no_year = [m[0] for m in RE_PUBLISH_DATE_NO_YEAR.findall(body_text)]
        if no_year:
            picked = pick_publish_dates(body_text, no_year, True, title, title_pos, now=now)
            if picked:
                now_t = _time.localtime(now if now is not None else _time.time())
                if "月" in picked:
                    return f"{now_t.tm_year}年{picked}"
                picked = picked.replace("/", "-").replace(".", "-")
                return f"{now_t.tm_year}-{picked}"
            return picked
    return ""


def time_from_lang(body_text: str, lang: str, title: str = "", title_pos: str = "",
                   now: float | None = None) -> tuple[str, bool]:
    """getTimeByLang clone (content.go:374-440) → (time, en_format)."""
    if lang == "zh":
        hits = [m[0] for m in RE_ZH_PUBLISH_DATE.findall(body_text)]
        dates = []
        for hit in hits:
            m = RE_PUBLISH_SHORT_DATE.search(hit)
            if m:
                dates.append(m.group(0))
        if dates:
            return pick_publish_dates(body_text, dates, False, title, title_pos, now=now), False
        return "", False
    for pat, en in ((RE_EN_PUBLISH_DATE1, True), (RE_EN_PUBLISH_DATE2, True), (RE_EN_US_PUBLISH_DATE, False)):
        hits = [m[0] for m in pat.findall(body_text)]
        if hits:
            if en:
                dates = [textnorm.normalise_space(h.strip()).replace(",", " ") for h in hits]
            else:
                dates = [h.strip() for h in hits]
            return (
                pick_publish_dates(body_text, dates, False, title, title_pos, en_format=en, now=now),
                en,
            )
    return "", False


def time_from_meta(metas: list[tuple[str, str, str]], lang: str) -> str:
    """getTimeByMeta clone (content.go:600-690): ``metas`` = (name, property,
    content) triples; only publish-ish keys count; longest with-time wins,
    longest date-only accepted for non-zh."""
    meta_dates: list[str] = []
    for name, prop, content in metas:
        m = RE_PUBLISH_DATE.search(content or "")
        if not m:
            continue
        norm = str.maketrans("", "", "_-.")
        name_n = (name or "").translate(norm)
        prop_n = (prop or "").translate(norm)
        if any(k in prop_n for k in META_DATETIME_DICTS):
            meta_dates.append(m.group(0).strip())
        if any(k in name_n for k in META_DATETIME_DICTS):
            meta_dates.append(m.group(0).strip())
    if not meta_dates:
        return ""
    has_times = [d for d in meta_dates if RE_TIME.search(d)]
    no_times = [d for d in meta_dates if not RE_TIME.search(d)]
    if has_times:
        return max(has_times, key=len) if len(has_times) > 1 else has_times[0]
    if lang != "zh" and no_times:
        return max(no_times, key=len) if len(no_times) > 1 else no_times[0]
    return ""


def time_from_meta_en(metas: list[tuple[str, str, str]], lang: str) -> str:
    """getTimeByMetaEn analog (content.go:318-331 call site): same
    publish-key filter and longest-with-time selection as getTimeByMeta but
    over the English date patterns; matches are space-normalized with commas
    stripped (content.go:397-400)."""
    meta_dates: list[str] = []
    norm = str.maketrans("", "", "_-.")
    for name, prop, content in metas:
        for pat in (RE_EN_PUBLISH_DATE1, RE_EN_PUBLISH_DATE2):
            m = pat.search(content or "")
            if not m:
                continue
            name_n = (name or "").translate(norm)
            prop_n = (prop or "").translate(norm)
            if any(k in prop_n for k in META_DATETIME_DICTS) or any(
                k in name_n for k in META_DATETIME_DICTS
            ):
                d = textnorm.normalise_space(m.group(0).strip()).replace(",", " ")
                meta_dates.append(d)
            break
    if not meta_dates:
        return ""
    has_times = [d for d in meta_dates if RE_TIME.search(d)]
    no_times = [d for d in meta_dates if not RE_TIME.search(d)]
    if has_times:
        return max(has_times, key=len) if len(has_times) > 1 else has_times[0]
    if lang != "zh" and no_times:
        return max(no_times, key=len) if len(no_times) > 1 else no_times[0]
    return ""


def time_from_script(script_texts: list[str]) -> str:
    """getTimeByScript clone (content.go:1167-1195): JSON pub* key first,
    then the WeChat epoch ct="..." per script.  Keeps the reference's
    quirk: the ``return`` inside the goquery ``Each`` closure only ends
    that iteration, so a LATER matching script overwrites an earlier one
    — last match wins (round-5 independent-transcription finding; this
    returned the first match through round 4, same quirk as
    titlecascade.title_by_script)."""
    winner = ""
    for text in script_texts:
        flat = textnorm.remove_lines(text or "")
        m = RE_SCRIPT_TIME.search(flat)
        if m:
            winner = m.group(1).strip()
            continue
        m = RE_WX_SCRIPT_TIME.search(flat)
        if m:
            ts = int(m.group(1))
            winner = _time.strftime("%Y-%m-%d %H:%M:%S", _time.localtime(ts))
    return winner


def time_from_url(url: str) -> str:
    """getTimeByUrl analog: the strict URL-path date 20221003-style
    (content.go:59)."""
    m = RE_CONTENT_URL_PUBLISH_DATE.search(url or "")
    if not m:
        return ""
    raw = m.group(1).replace("/", "")
    return f"{raw[0:4]}-{raw[4:6]}-{raw[6:8]}"


def extract_time(
    *,
    lang: str,
    body_text: str = "",
    metas: list[tuple[str, str, str]] | None = None,
    time_attr: str = "",
    script_texts: list[str] | None = None,
    url: str = "",
    title: str = "",
    title_pos: str = "",
    now: float | None = None,
) -> tuple[str, str, str]:
    """Full getTime cascade (content.go:310-373) over record fields →
    (raw_time, time_pos, formatted_time)."""
    en_format = False

    # the standard-pattern meta pass gates its date-only acceptance on the
    # PAGE language (getTimeByMeta checks c.Lang != "zh" inside,
    # content.go:694-706) — this passed a literal "zh" through round 4,
    # silently dropping date-only metas on non-zh pages (round-5
    # independent-transcription finding)
    t = time_from_meta(metas or [], lang)
    pos = "meta" if t else ""
    if not t and lang != "zh":
        t = time_from_meta_en(metas or [], lang)
        if t:
            en_format = True
            pos = "meta"
    if not t and time_attr:
        m = RE_PUBLISH_DATE.search(time_attr)
        if m:
            t, pos = m.group(0), "tag"
        elif lang != "zh":
            for pat in (RE_EN_PUBLISH_DATE1, RE_EN_PUBLISH_DATE2):
                m = pat.search(time_attr)
                if m:
                    t = textnorm.normalise_space(m.group(0)).replace(",", " ")
                    en_format = True
                    pos = "tag"
                    break
    if not t and script_texts:
        t = time_from_script(script_texts)
        pos = "script" if t else ""
    if not t:
        body = textnorm.normalise_space(body_text)
        t = time_from_body(body, lang, title, title_pos, now)
        pos = "body" if t else ""
        if not t:
            t, en_format = time_from_lang(body, lang, title, title_pos, now)
            pos = "lang" if t else ""
    if not t and url:
        t = time_from_url(url)
        pos = "url" if t else ""

    return t, pos, (format_time(t, en_format) if t else "")
