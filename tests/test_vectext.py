"""Property tests: the vectorized codepoint kernel must agree with regex /
unicodedata row-at-a-time counting (the oracle path)."""

import unicodedata

import numpy as np
import regex as _re
from hypothesis import given, settings
from hypothesis import strategies as st

from spiderray.functions import vectext

SAMPLES = [
    "",
    "hello world",
    "你好，世界！",
    "政府は今日、新しい政策を発表しました",
    "정부는 오늘 정책을 발표했습니다",
    "Правительство объявило сегодня",
    "أعلنت الحكومة اليوم",
    "सरकार ने आज घोषणा की",
    "mixed 中文 and English ásçii ñ",
    "symbols +=$€ £¥ {x} [y]",
    "\t\n  whitespace  \r\n",
]

_PATS = {
    "han": _re.compile(r"\p{Han}"),
    "hiragana": _re.compile(r"\p{Hiragana}"),
    "katakana": _re.compile(r"\p{Katakana}"),
    "hangul": _re.compile(r"\p{Hangul}"),
    "arabic": _re.compile(r"\p{Arabic}"),
    "cyrillic": _re.compile(r"\p{Cyrillic}"),
    "devanagari": _re.compile(r"\p{Devanagari}"),
    "ascii_alpha": _re.compile(r"[a-zA-Z]"),
    "latin1_supp": _re.compile("[-ÿ]"),
    "digit": _re.compile(r"[0-9]"),
}


def test_counts_match_regex_on_samples():
    names = list(_PATS)
    got = vectext.counts(SAMPLES, names)
    for name, pat in _PATS.items():
        expected = [len(pat.findall(s)) for s in SAMPLES]
        assert got[name].tolist() == expected, name
    assert got["_len"].tolist() == [len(s) for s in SAMPLES]


def test_punct_symbol_matches_regex():
    pat_ps = _re.compile(r"[\p{P}\p{S}]")
    pat_p = _re.compile(r"\p{P}")
    got = vectext.counts(SAMPLES, ["punct_symbol", "punct"])
    for i, s in enumerate(SAMPLES):
        assert got["punct_symbol"][i] == len(pat_ps.findall(s))
        assert got["punct"][i] == len(pat_p.findall(s))


def test_empty_rows_and_nones():
    got = vectext.counts(["", None, "abc", "", None], ["ascii_alpha"])
    assert got["ascii_alpha"].tolist() == [0, 0, 3, 0, 0]
    assert got["_len"].tolist() == [0, 0, 3, 0, 0]


def test_empty_batch():
    got = vectext.counts([], ["han"])
    assert got["han"].tolist() == []


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=40), max_size=12))
def test_property_random_texts(texts):
    got = vectext.counts(texts, ["han", "ascii_alpha", "punct_symbol", "digit"])
    han = _PATS["han"]
    for i, s in enumerate(texts):
        assert got["_len"][i] == len(s)
        assert got["han"][i] == len(han.findall(s))
        assert got["ascii_alpha"][i] == len(_PATS["ascii_alpha"].findall(s))
        assert got["digit"][i] == len(_PATS["digit"].findall(s))
        ps = len(_re.compile(r"[\p{P}\p{S}]").findall(s))
        assert got["punct_symbol"][i] == ps


def _clean_counts_oracle(texts, names, chunk=2048):
    from spiderray.functions import textnorm

    out = {"_len": [], **{n: [] for n in names}}
    for t in texts:
        cleaned = textnorm.clean_for_lang(t or "", chunk)
        out["_len"].append(len(cleaned))
        for n in names:
            if n == "punct_symbol":
                out[n].append(len(_re.compile(r"[\p{P}\p{S}]").findall(cleaned)))
            else:
                out[n].append(len(_PATS[n].findall(cleaned)))
    return out


def test_clean_for_lang_counts_samples():
    names = ["han", "ascii_alpha", "hiragana", "digit"]
    texts = SAMPLES + [
        "  leading and trailing  ",
        "a  b   c    d",
        "行首  行尾\t\ttab\n\n换行  ",
        "x" * 5000,
        "汉" * 3000 + "a" * 100,
    ]
    got = vectext.clean_for_lang_counts(texts, names)
    exp = _clean_counts_oracle(texts, names)
    for k in ["_len"] + names:
        assert got[k].tolist() == exp[k], k


@settings(max_examples=80, deadline=None)
@given(st.lists(st.text(max_size=60), max_size=8))
def test_clean_for_lang_counts_property(texts):
    names = ["han", "ascii_alpha", "digit"]
    got = vectext.clean_for_lang_counts(texts, names, chunk=30)
    exp = _clean_counts_oracle(texts, names, chunk=30)
    for k in ["_len"] + names:
        assert got[k].tolist() == exp[k], (k, texts)
