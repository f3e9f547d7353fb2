"""Independent title-cascade + publish-time-pick oracle — a SECOND
transcription of the reference semantics, written directly from the Go
source and importing NOTHING from spiderray.functions (the
test_independent_oracle.py precedent, extended per the round-4 verdict's
item #6).

Transcribed here, from the reference files themselves:

  * getTitle cascade ................ /root/reference/extract/content.go:844-949
  * getTitleByOrigin ................ content.go:812-842 (maxScore never
    updated -> LAST above-threshold h1/h2 wins)
  * getTitleByMeta .................. content.go:987-1018 (rune-length compare)
  * getTitleByScript ................ content.go:1142-1165 (the Each closure's
    ``return`` only ends one iteration -> LAST matching script wins; this
    transcription CAUGHT the engine returning the first match — fixed in
    functions/titlecascade.py round 5)
  * getTitleByEditDistance .......... content.go:952-985 (NOTE: the traverse
    guards on n.FirstChild != nil before testing n.Type == TextNode; text
    nodes never have children, so pos=content is DEAD CODE in the reference.
    The engine's record-fields API keeps a live equivalent for callers that
    supply body_texts explicitly; from parsed HTML the list is empty and the
    branch never fires — parity preserved where the reference is exercised.)
  * title-clean helpers ............. /root/reference/extract/web.go:39-57,
    119-162 (WebTitle cap, WebContentTitleClean loop-delete)
  * pickPublishDates ................ content.go:477-592 (incl. the quirk at
    :574-585 — maxTimestamp compared but never updated -> last in-limit
    date wins the zh no-times branch)
  * fun.SimilarityText .............. not in the checkout; the engine's
    published contract (functions/similarity.py docstring: difflib-family
    ratio 2M/(la+lb), autojunk off) re-implemented below with an
    independent recursive Ratcliff/Obershelp matcher.
"""

from __future__ import annotations

import re

import pytest
import regex as rx

# --------------------------------------------------------------------------
# go-fun text helpers — transcribed from call-site behavior, not imported
# --------------------------------------------------------------------------

_RE_SPACES = re.compile(r"\s+")
_RE_PUNC_SYM = rx.compile(r"[\p{P}\p{S}]")


def _remove_lines(s: str) -> str:
    return s.replace("\r\n", "").replace("\r", "").replace("\n", "")


def _normalise_space(s: str) -> str:
    return _RE_SPACES.sub(" ", s).strip()


def _sub_string(s: str, start: int, length: int) -> str:
    return "" if length <= 0 else s[start:start + length]


# --------------------------------------------------------------------------
# fun.SimilarityText — independent Ratcliff/Obershelp: recursive longest
# matching block (earliest-a then earliest-b on ties), total matched M,
# ratio = 2M / (len_a + len_b); empty-vs-empty pinned to 0.0 per the
# engine contract.
# --------------------------------------------------------------------------

def _longest_match(a, alo, ahi, b, blo, bhi):
    b2j: dict = {}
    for j in range(blo, bhi):
        b2j.setdefault(b[j], []).append(j)
    besti, bestj, bestsize = alo, blo, 0
    j2len: dict = {}
    for i in range(alo, ahi):
        newj2len: dict = {}
        for j in b2j.get(a[i], ()):
            if j < blo:
                continue
            if j >= bhi:
                break
            k = newj2len[j] = j2len.get(j - 1, 0) + 1
            if k > bestsize:
                besti, bestj, bestsize = i - k + 1, j - k + 1, k
        j2len = newj2len
    return besti, bestj, bestsize


def _matched_total(a, alo, ahi, b, blo, bhi):
    i, j, k = _longest_match(a, alo, ahi, b, blo, bhi)
    if k == 0:
        return 0
    return (k
            + _matched_total(a, alo, i, b, blo, j)
            + _matched_total(a, i + k, ahi, b, j + k, bhi))


def ind_similarity(a: str, b: str) -> float:
    if not a and not b:
        return 0.0
    m = _matched_total(a, 0, len(a), b, 0, len(b))
    return 2.0 * m / (len(a) + len(b))


def _sim_threshold(lang: str) -> float:
    return 0.3 if lang == "zh" else 0.5  # content.go:71-74


# --------------------------------------------------------------------------
# web.go title cleaning
# --------------------------------------------------------------------------

_ZH_CONTENT_SPLITS = ["_", "|", "-", "－", "｜", "—"]  # web.go:31
_EN_SPLITS = [" - ", " | ", ":"]                       # web.go:33


def ind_web_title(raw_title: str, max_length: int) -> str:
    t = _remove_lines(raw_title).strip()
    if 0 < max_length < 128:
        return _sub_string(t, 0, max_length)
    return _sub_string(t, 0, 128)


def ind_content_title_clean(title: str, lang: str) -> str:
    if lang == "zh":
        for split in _ZH_CONTENT_SPLITS:
            if title.lower().startswith(split.lower()):
                title = title[len(split):]
        clean = title
        for split in _ZH_CONTENT_SPLITS:
            end = clean.rfind(split)
            if end != -1:
                while end != -1:
                    clean = clean[:end].strip()
                    end = clean.rfind(split)
                break
        return clean
    for split in _EN_SPLITS:
        end = title.rfind(split)
        if end != -1:
            return title[:end].strip()
    return title


# --------------------------------------------------------------------------
# getTitle cascade (content.go:844-949)
# --------------------------------------------------------------------------

_RE_SCRIPT_TITLE = re.compile(r'(?i)"title"[\t ]{0,4}:[\t ]{0,4}"(.*)"')


def ind_get_title(lang, origin_title, raw_title, headlines, meta_titles,
                  script_texts, selector_title, body_texts):
    thr = _sim_threshold(lang)

    # 1. getTitleByOrigin (content.go:812-842): candidates above threshold
    #    collected, then the argmax loop never updates maxScore -> the LAST
    #    collected candidate is returned
    if origin_title.strip():
        picked = ""
        for h in headlines:
            text = _normalise_space(h)
            if ind_similarity(origin_title, text) > thr:
                picked = text
        if picked:
            return picked, "headline"

    origin_meta_title = ind_web_title(raw_title, 255)
    meta_title = ind_content_title_clean(origin_meta_title, lang)

    # 2. getTitleByMeta (content.go:987-1018)
    titles = [t.strip() for t in meta_titles if t.strip()]
    if titles:
        if meta_title != "":
            for t in titles:
                if ind_similarity(t, meta_title) > thr:
                    return ((t, "meta") if len(t) < len(meta_title)
                            else (meta_title, "meta"))
            # no similar meta: fall through
        else:
            return titles[0], "meta"

    # 3. getTitleByScript (content.go:1142-1165): last matching script wins
    script_pick = ""
    for text in script_texts:
        flat = _remove_lines(text or "")
        m = _RE_SCRIPT_TITLE.search(flat)
        if m:
            cand = m.group(1).strip()
            if ind_similarity(meta_title, cand) > thr:
                script_pick = cand
    if script_pick:
        return script_pick, "script"

    # 4. h1/h2 max-similarity walk (content.go:874-925): strict-greater
    #    argmax (first of equals), must beat the threshold
    if origin_meta_title.strip():
        best, best_s = "", 0.0
        for h in headlines:
            text = _normalise_space(h)
            s = ind_similarity(text, meta_title)
            if s > best_s:
                best, best_s = text, s
        if best and best_s > thr:
            return best, "headline"

    # 5. first id/class ^=title|$=title selector (content.go:928-937)
    if selector_title:
        sel = _normalise_space(selector_title)
        if ind_similarity(meta_title, sel) > thr:
            return sel, "selector"

    # 6. getTitleByEditDistance (content.go:952-985) — dead code in the
    #    reference (see module docstring); live here only when the caller
    #    supplies body_texts, mirroring the engine's record-fields API
    best, best_s = "", thr
    for text in body_texts:
        t = _normalise_space(text)
        s = ind_similarity(t, meta_title)
        if s > thr and s > best_s:
            best, best_s = t, s
    if best:
        return best, "content"

    # 7. fallback (content.go:946-948)
    return meta_title, "title"


# --------------------------------------------------------------------------
# pickPublishDates (content.go:477-592)
# --------------------------------------------------------------------------

# regexTimePattern / regexFormatTime3 / regexFormatTime4 transcribed from
# /root/reference/extract/content.go:41, 62, 65 — the DATA is the model,
# the selection loops below are rewritten
_RE_TIME = re.compile(
    "([0-9]|[0-1][0-9]|2[0-3]|[1-9])[:点时]([0-5][0-9]|[0-9])[:分]?"
    "(([0-5][0-9]|[0-9])[秒]?)?")
_RE_FMT3 = re.compile(r"[:分]\d{3}$")
_RE_FMT4 = re.compile(r"[:分]\d{4}$")


def _check_time_regexes():
    """The twin's trim patterns must agree with the engine's published
    bank before any diff below means anything."""
    from spiderray.functions import newsdate as nd  # comparison only

    return (nd.RE_TIME.pattern, nd.RE_FORMAT_TIME3.pattern,
            nd.RE_FORMAT_TIME4.pattern)


def ind_pick_publish_dates(body_text, dates, require_time, title="",
                           title_pos="", en_format=False, now=0.0,
                           str_to_time=None):
    has_times, no_times = [], []
    for d in dates:
        ds = d.strip()
        if _RE_TIME.search(ds):
            if _RE_FMT3.search(ds):
                ds = ds[:-1]
            if _RE_FMT4.search(ds):
                ds = ds[:-2]
            has_times.append(ds)
        else:
            no_times.append(ds)

    if has_times:
        if len(has_times) == 1:
            return has_times[0]
        max_len, max_idx = 0, 0
        for i, d in enumerate(has_times):
            if len(d) > max_len:
                max_len, max_idx = len(d), i
        if max_idx == 0:
            return has_times[0]
        if title != "" and title_pos in ("selector", "headline", "content"):
            title_idx = body_text.find(title)
            min_dist, min_idx = float("inf"), 0
            for i, d in enumerate(has_times):
                dist = abs(body_text.find(d) - title_idx)
                if dist < min_dist:
                    min_dist, min_idx = dist, i
            return has_times[min_idx]
        return has_times[0]

    if not require_time and no_times:
        if len(no_times) == 1:
            return no_times[0]
        if en_format:
            if title != "" and title_pos in ("selector", "headline"):
                title_idx = body_text.find(title)
                min_dist, min_idx = float("inf"), 0
                for i, d in enumerate(no_times):
                    dist = abs(body_text.find(d) - title_idx)
                    if dist < min_dist:
                        min_dist, min_idx = dist, i
                return no_times[min_idx]
            return no_times[0]
        # zh branch (content.go:574-585): maxTimestamp is compared but
        # NEVER updated, so every in-limit positive timestamp overwrites
        # maxIndex -> last valid date wins
        max_idx = 0
        limit = now + 86400
        for i, d in enumerate(no_times):
            ts = str_to_time(d) if str_to_time else 0
            if ts < limit and ts > 0:
                max_idx = i
        return no_times[max_idx]

    return ""


# --------------------------------------------------------------------------
# Diff harness: engine vs independent transcription
# --------------------------------------------------------------------------

SF_SMALL = "/root/testdata/sf0.001"


def _html_pages(limit=200):
    """The q_news_from_html corpus shape, built serially from documents."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_SMALL}/documents.parquet",
                      columns=["doc_id", "text"])
    pages = []
    for i, text in zip(t.column("doc_id").to_pylist()[:limit],
                       t.column("text").to_pylist()[:limit]):
        words = (text or "").split()
        title = " ".join(words[:6]) or f"Document {i}"
        paras = "".join(
            f"<p>{' '.join(words[k:k + 12])}.</p>"
            for k in range(0, max(len(words), 1), 12))
        day, minute = i % 27 + 1, i % 60
        pages.append(
            f'<html lang="en"><head><title>{title} | Site{i % 9}</title>'
            f'<meta property="og:title" content="{title}">'
            f'<meta name="publishdate" content="2022-09-{day:02d} '
            f'10:{minute:02d}:00"></head><body>'
            f'<div><a href="/">Home</a> <a href="/news">News</a></div>'
            f'<div><h1>{title}</h1>{paras}</div>'
            f'<div><a href="/about">About</a></div></body></html>')
    return pages


class TestTitleCascadeVsIndependent:
    def test_similarity_matches_engine_contract(self):
        from spiderray.functions.similarity import similarity_text

        cases = [
            ("", ""), ("a", ""), ("", "b"), ("abc", "abc"),
            ("headline news today", "today news headline"),
            ("中文标题测试", "中文标题"), ("aaaa", "aa"),
            ("The Quick Brown Fox", "the quick brown fox"),
            ("x" * 100, "x" * 40 + "y" * 60),
            ("abcabcabc", "cbacbacba"),
        ]
        import random
        rng = random.Random(5)
        alphabet = "abcde 中文"
        for _ in range(200):
            a = "".join(rng.choice(alphabet)
                        for _ in range(rng.randrange(0, 30)))
            b = "".join(rng.choice(alphabet)
                        for _ in range(rng.randrange(0, 30)))
            cases.append((a, b))
        for a, b in cases:
            assert ind_similarity(a, b) == pytest.approx(
                similarity_text(a, b), abs=0.0), (a, b)

    def test_cascade_on_html_corpus(self):
        from spiderray.functions.titlecascade import choose_title
        from spiderray.stages.htmlparse import parse_page_fields

        mism = []
        for page in _html_pages():
            f = parse_page_fields(page)
            got = choose_title(
                lang="en", origin_title="", raw_title=f["title"],
                headlines=f["headlines"], meta_titles=f["meta_titles"],
                script_texts=f["script_texts"], selector_title="",
                body_texts=[])
            exp = ind_get_title(
                "en", "", f["title"], f["headlines"], f["meta_titles"],
                f["script_texts"], "", [])
            if got != exp:
                mism.append((f["title"][:50], got, exp))
        assert not mism, mism[:5]

    def test_cascade_adversarial_records(self):
        """Hand-built records hitting every cascade arm, including the
        last-match-wins quirks."""
        from spiderray.functions.titlecascade import choose_title

        records = [
            # origin-title: LAST above-threshold headline wins
            dict(lang="en", origin_title="breaking news tonight",
                 raw_title="ignored | Site",
                 headlines=["breaking news tonight", "breaking news tonite"],
                 meta_titles=[], script_texts=[], selector_title="",
                 body_texts=[]),
            # meta: similar -> shorter of (candidate, cleaned title)
            dict(lang="en", origin_title="",
                 raw_title="A Long Headline About Things | Site",
                 headlines=[], meta_titles=["A Long Headline About Thing"],
                 script_texts=[], selector_title="", body_texts=[]),
            # script: LAST matching script wins
            dict(lang="en", origin_title="",
                 raw_title="Quarterly results beat estimates - MegaCorp",
                 headlines=[],
                 meta_titles=[],
                 script_texts=[
                     'var a = {"title": "Quarterly results beat estimate"};',
                     'var b = {"title": "Quarterly results beat estimates"};',
                 ],
                 selector_title="", body_texts=[]),
            # headline similarity walk: first of equals
            dict(lang="en", origin_title="",
                 raw_title="City council approves the budget : News",
                 headlines=["City council approves the budget",
                            "City council approves the budget"],
                 meta_titles=[], script_texts=[], selector_title="",
                 body_texts=[]),
            # selector arm
            dict(lang="en", origin_title="",
                 raw_title="Weather alert issued for region : Site",
                 headlines=["totally different"], meta_titles=[],
                 script_texts=[],
                 selector_title="Weather alert issued for region",
                 body_texts=[]),
            # fallback arm
            dict(lang="en", origin_title="", raw_title="Standalone Title",
                 headlines=[], meta_titles=[], script_texts=[],
                 selector_title="", body_texts=[]),
            # zh cleaning + threshold
            dict(lang="zh", origin_title="",
                 raw_title="重大新闻发布会今日召开_新闻网",
                 headlines=["重大新闻发布会今日召开"], meta_titles=[],
                 script_texts=[], selector_title="", body_texts=[]),
        ]
        for i, r in enumerate(records):
            got = choose_title(**r)
            exp = ind_get_title(
                r["lang"], r["origin_title"], r["raw_title"],
                r["headlines"], r["meta_titles"], r["script_texts"],
                r["selector_title"], r["body_texts"])
            assert got == exp, (i, got, exp)


class TestPublishPickVsIndependent:
    NOW = 1663725600.0  # fixed 'now' so both sides see one clock

    def test_trim_regexes_agree_with_engine_bank(self):
        time_p, fmt3_p, fmt4_p = _check_time_regexes()
        assert _RE_TIME.pattern == time_p
        assert _RE_FMT3.pattern == fmt3_p
        assert _RE_FMT4.pattern == fmt4_p

    def _diff(self, body, dates, require_time, title="", title_pos="",
              en_format=False):
        from spiderray.functions.newsdate import (
            pick_publish_dates,
            str_to_time,
        )

        got = pick_publish_dates(body, dates, require_time, title,
                                 title_pos, en_format, now=self.NOW)
        exp = ind_pick_publish_dates(
            body, dates, require_time, title, title_pos, en_format,
            now=self.NOW, str_to_time=lambda d: str_to_time(d, self.NOW))
        assert got == exp, (dates, got, exp)

    def test_branches(self):
        # single with-time
        self._diff("x 2022-09-01 10:00 y", ["2022-09-01 10:00"], False)
        # first-is-longest wins
        self._diff("a 2022-09-01 10:00:00 b 09-02 11:00 c",
                   ["2022-09-01 10:00:00", "09-02 11:00"], False)
        # closest-to-title when a later one is longest
        body = ("Headline Words Here 09-02 11:00 more text "
                "2022-09-01 10:00:00 tail")
        self._diff(body, ["09-02 11:00", "2022-09-01 10:00:00"], False,
                   title="Headline Words Here", title_pos="headline")
        # title not in content zone -> first
        self._diff(body, ["09-02 11:00", "2022-09-01 10:00:00"], False,
                   title="Headline Words Here", title_pos="title")
        # bad-tail trim (regexFormatTime3/4)
        self._diff("x", ["2022-09-01 10:00:001"], False)
        # no-times en: closest to title / first
        self._diff("T a Jan 3 2022 b Jan 5 2022",
                   ["Jan 3 2022", "Jan 5 2022"], False,
                   title="T", title_pos="headline", en_format=True)
        self._diff("T a Jan 3 2022 b Jan 5 2022",
                   ["Jan 3 2022", "Jan 5 2022"], False, en_format=True)
        # no-times zh: the maxTimestamp quirk -> LAST in-limit wins
        self._diff("x", ["2022-09-01", "2022-08-15", "2022-07-01"], False)
        # require_time suppresses date-only picks
        self._diff("x", ["2022-09-01"], True)
        # future dates beyond now+86400 are skipped by the quirk loop
        self._diff("x", ["2031-01-01", "2022-08-15"], False)
