"""Language-ID cascade (SURVEY.md §2.8) — row-at-a-time spec functions.

Clones the decision structure of /root/reference/lang.go:
  1. charset → lang map short-circuit                      lang.go:133-139
  2. title Han check with ja/ko body verification          lang.go:200-263
  3. html-lang metadata hint (trusted iff != "" and != en) lang.go:150-155
  4. UTF body analysis with exact thresholds               lang.go:274-358
     hanRate >= 0.3 → ja if ja/han > 0.1 else zh
     englishRate > 0.618 → latin classifier if latin1-supp > 5 else en
     else → non-latin classifier over {ar, ru, hi, ko}

The lingua-go n-gram detector (lang.go:335, 349) is replaced by two
deterministic classifiers:
  * non-Latin branch: script-range argmax (ar/ru/hi/ko are script-disjoint,
    so this matches lingua on any text that is actually in one of the four).
  * Latin branch: stopword + diacritic profile scoring over {fr,de,es,pt,en}
    (seed profiles embedded below; the stateful model-actor variant lives in
    stages/langid_stage.py and must agree with this function — property
    tested).

Thresholds are constants, never re-derived: 0.3, 0.1, 0.618, 5, 64, 2048, 0.2.
"""

from __future__ import annotations

import re

import regex as _re

from . import textnorm
from .maps import CHARSET_LANG_MAP

BODY_CHUNK_SIZE = 2048  # lang.go:20
BODY_MIN_SIZE = 64      # lang.go:21

LANG_POS_CHARSET = "charset"
LANG_POS_HTML = "html"
LANG_POS_BODY = "body"
LANG_POS_LINGUA = "lingua"
LANG_POS_TITLE_ZH = "title"

# ^(?i)([a-z]{2}|[a-z]{2}-[a-z]+)$  (lang.go:23)
_RE_LANG_HTML = re.compile(r"^(?i:[a-z]{2}|[a-z]{2}\-[a-z]+)$")

_RE_HAN = _re.compile(r"\p{Han}")
_RE_JA = _re.compile(r"[\p{Hiragana}\p{Katakana}]")
_RE_KO = _re.compile(r"\p{Hangul}")
_RE_EN = re.compile(r"[a-zA-Z]")
_RE_LATIN1 = re.compile("[-ÿ]")

# ---------------------------------------------------------------------------
# Latin-language profiles: per-language stopword sets + characteristic
# diacritics.  Scoring: 2 points per stopword occurrence + 1 per distinctive
# diacritic char; deterministic tie-break by fixed order.
# ---------------------------------------------------------------------------
LATIN_STOPWORDS: dict[str, frozenset[str]] = {
    "fr": frozenset("le la les des une dans est sont pour avec qui que ne pas plus cette mais nous vous leur aux ces être fait était très où donc ainsi entre deux après sans sous peut tout comme aussi".split()),
    "de": frozenset("der die das und ist nicht ein eine mit von für auf dem den des sich auch wird sind oder aber wie bei nach aus wenn nur noch werden über kann mehr durch schon beim einer einem zum zur".split()),
    "es": frozenset("el la los las una del que en es por con para como más pero sus este esta son fue entre cuando muy sin sobre también hasta donde quien desde todo durante puede había están".split()),
    "pt": frozenset("o os uma do da dos das em que não com para por mais como mas foi são tem seu sua ou quando muito nos já está eu também pelo pela até isso ela entre depois sem mesmo aos ser".split()),
    "en": frozenset("the of and to in is was for that with his her they this have from are which were been has had not but what when there will would their more about other into".split()),
}
LATIN_DIACRITICS: dict[str, str] = {
    "fr": "éèêëàâçîïôûùœ",
    "de": "äöüß",
    "es": "ñáíóúü¿¡",
    "pt": "ãõçáéêóôí",
    "en": "",
}
_LATIN_ORDER = ("en", "fr", "de", "es", "pt")
_LATIN_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)

# non-Latin branch scripts (lingua over {ar, ru, hi, ko}, lang.go:81-86)
_NONLATIN_SCRIPTS = (
    ("ar", _re.compile(r"\p{Arabic}")),
    ("ru", _re.compile(r"\p{Cyrillic}")),
    ("hi", _re.compile(r"\p{Devanagari}")),
    ("ko", _re.compile(r"\p{Hangul}")),
)


def classify_latin(text: str) -> str:
    """Deterministic {fr,de,es,pt,en} classifier (lingua replacement for
    lang.go:335-341). Returns the argmax-scoring language; ties break in
    _LATIN_ORDER."""
    lowered = text.lower()
    words = _LATIN_WORD_RE.findall(lowered)
    best_lang, best_score = "en", -1.0
    for lang in _LATIN_ORDER:
        score = 0.0
        stop = LATIN_STOPWORDS[lang]
        for w in words:
            if w in stop:
                score += 2.0
        for ch in LATIN_DIACRITICS[lang]:
            score += lowered.count(ch)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def classify_nonlatin(text: str) -> str:
    """Deterministic {ar,ru,hi,ko} classifier (lingua replacement for
    lang.go:349-355): script-count argmax; all-zero → ''."""
    best_lang, best_count = "", 0
    for lang, pat in _NONLATIN_SCRIPTS:
        n = len(pat.findall(text))
        if n > best_count:
            best_lang, best_count = lang, n
    return best_lang


def lang_from_text(text: str) -> tuple[str, str]:
    """langFromText (/root/reference/lang.go:274-358)."""
    text = textnorm.clean_for_lang(text, BODY_CHUNK_SIZE)
    n = len(text)
    if n < BODY_MIN_SIZE:
        return "", ""

    han = _RE_HAN.findall(text)
    if han:
        han_count = len(han)
        if han_count / n >= 0.3:
            ja = _RE_JA.findall(text)
            if ja and len(ja) / han_count > 0.1:
                return "ja", LANG_POS_BODY
            return "zh", LANG_POS_BODY

    english = _RE_EN.findall(text)
    if english and len(english) / n > 0.618:
        latin = _RE_LATIN1.findall(text)
        if latin and len(latin) > 5:
            return classify_latin(text), LANG_POS_LINGUA
        return "en", LANG_POS_BODY

    lang = classify_nonlatin(text)
    if lang:
        return lang, LANG_POS_LINGUA
    return "", ""


def lang_from_title(title: str, body_text: str) -> tuple[str, str]:
    """LangFromTitle (/root/reference/lang.go:200-263): a title with >= 2 Han
    chars decides zh, unless the (sign-stripped, 2048-capped) body shows
    > 20% kana (→ ja) or > 20% hangul (→ ko)."""
    text = textnorm.remove_sign(title).strip()
    if not text:
        return "", ""
    han = _RE_HAN.findall(text)
    if len(han) >= 2:
        body = textnorm.remove_sign(body_text)
        body = textnorm.sub_string(body, 0, BODY_CHUNK_SIZE).strip()
        n = len(body)
        if n:
            ja = _RE_JA.findall(body)
            if ja and len(ja) / n > 0.2:
                return "ja", LANG_POS_TITLE_ZH
            ko = _RE_KO.findall(body)
            if ko and len(ko) / n > 0.2:
                return "ko", LANG_POS_TITLE_ZH
        return "zh", LANG_POS_TITLE_ZH
    return "", ""


def lang_from_meta(meta_lang: str | None) -> str:
    """LangFromHtml validation (/root/reference/lang.go:169-199): accept only
    ^[a-z]{2}(-[a-z]+)?$ (case-insensitive), truncate to 2 chars."""
    if not meta_lang:
        return ""
    lang = meta_lang.strip()
    if _RE_LANG_HTML.match(lang):
        return textnorm.sub_string(lang, 0, 2)
    return ""


def detect_lang(
    transcript: str,
    charset: str = "UTF-8",
    title: str | None = None,
    meta_lang: str | None = None,
) -> tuple[str, str]:
    """Full Lang cascade (/root/reference/lang.go:128-167) adapted to clip
    rows: ``transcript`` plays the role of the body text, ``title``/
    ``meta_lang`` are optional metadata hints (absent in the clip schema but
    kept for HTML-shaped inputs and reference-parity fixtures)."""
    if charset and charset in CHARSET_LANG_MAP:
        return CHARSET_LANG_MAP[charset], LANG_POS_CHARSET

    if title is not None:
        lang, pos = lang_from_title(title, transcript)
        if lang:
            return lang, pos

    hint = lang_from_meta(meta_lang)
    if hint and hint != "en":
        return hint, LANG_POS_HTML

    if charset.startswith("UTF") and hint in ("", "en"):
        lang, pos = lang_from_text(transcript)
        if lang:
            return lang, pos

    return "", ""
