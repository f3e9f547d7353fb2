"""Charset identification + normalization (M1–M5, SURVEY.md §2.2).

Clones /root/reference/charset.go semantics:
  * UTF-8 validity short-circuit → ("UTF-8", "valid")       charset.go:38-48
  * header / html-meta regex extraction + conflict rules    charset.go:67-180
  * statistical guess fallback                              charset.go:183-193
  * alias canonicalization (GB*→GBK, BIG5*→Big5, SHIFT*→SHIFT_JIS)
                                                            charset.go:196-222
  * transcode to UTF-8, failure → charset_error             http.go:157-170

The statistical guess replaces the Go chardet dependency with a deterministic
byte-distribution heuristic covering the encodings the reference's
CharsetLangMap cares about (GBK / Big5 / SHIFT_JIS / EUC-KR / EUC-JP /
UTF-16 / Latin-1); it is pinned by fixtures, not bit-compatible with chardet.
"""

from __future__ import annotations

import re

CHARSET_POS_HEADER = "header"
CHARSET_POS_HTML = "html"
CHARSET_POS_GUESS = "guess"
CHARSET_POS_VALID = "valid"

# /root/reference/charset.go:21-23
_RE_CHARSET = re.compile(r"(?i)charset=\s*([a-z][_\-0-9a-z]*)")
_RE_HTML4 = re.compile(r"(?i)<meta\s+([^>]*http-equiv=(\"|')?content-type(\"|')?[^>]*)>")
_RE_HTML5 = re.compile(r"(?i)<meta\s+charset\s*=\s*[\"']?([a-z][_\-0-9a-z]*)[^>]*>")


def convert_charset(charset: str) -> str:
    """Alias canonicalization (/root/reference/charset.go:196-222)."""
    c = charset.strip().upper()
    if c:
        if c in ("UTF8", "UTF_8"):
            return "UTF-8"
        if c.startswith("GB"):
            return "GBK"
        if c.startswith("BIG5"):
            return "Big5"
        if c.startswith("SHIFT"):
            return "SHIFT_JIS"
    return c


def charset_from_header(content_type: str | None) -> str:
    """(/root/reference/charset.go:112-125)"""
    if not content_type or not content_type.strip():
        return ""
    m = _RE_CHARSET.search(content_type)
    return convert_charset(m.group(1)) if m else ""


def charset_from_html(body: bytes | str) -> str:
    """HTML4 http-equiv vs HTML5 meta-charset; both present and different →
    earliest occurrence in the document wins (/root/reference/charset.go:128-180)."""
    html = body.decode("latin-1") if isinstance(body, bytes) else body
    charset4 = ""
    m = _RE_HTML4.search(html)
    if m:
        m2 = _RE_CHARSET.search(m.group(1))
        if m2:
            charset4 = m2.group(1)
    charset5 = ""
    m = _RE_HTML5.search(html)
    if m:
        charset5 = m.group(1)

    if charset4 and not charset5:
        charset = charset4
    elif charset5 and not charset4:
        charset = charset5
    elif charset4 and charset5:
        if charset4 == charset5:
            charset = charset5
        elif html.index(charset4) < html.index(charset5):
            charset = charset4
        else:
            charset = charset5
    else:
        charset = ""
    return convert_charset(charset)


def charset_from_header_html(body: bytes | str, content_type: str | None) -> tuple[str, str]:
    """Conflict rules (/root/reference/charset.go:67-109): equal → header;
    header ISO*/WINDOWS* → html wins; else header wins."""
    c_header = charset_from_header(content_type)
    c_html = charset_from_html(body)
    if c_header and not c_html:
        return c_header, CHARSET_POS_HEADER
    if c_html and not c_header:
        return c_html, CHARSET_POS_HTML
    if c_header and c_html:
        if c_header == c_html:
            return c_header, CHARSET_POS_HEADER
        if c_header.startswith("ISO") or c_header.startswith("WINDOWS"):
            return c_html, CHARSET_POS_HTML
        return c_header, CHARSET_POS_HEADER
    return "", ""


# frequency evidence for the statistical guess: the most common simplified +
# traditional Chinese characters.  A correct CJK decode is dominated by these
# (plus kana/hangul/ASCII); a wrong-codec "successful" decode (e.g. Big5
# bytes through gb18030) yields valid-but-garbled rare Han characters that
# miss this set.
_COMMON_ZH = frozenset(
    "的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得就那要下"
    "以生会自着去之过家学对可她里后小么心多天而能好都然没日于起还发成事只作"
    "当想看文无开手十用主行方又如前所本见经头面公同三已老从动两长知民样现分"
    "将外但身些与高意进把法此实回二理美点月明其种声全工己话儿者向情部正名定"
    "這來國個們為時學對後說會麼經頭發現點樣內關門見長話兒東馬車氣質專決歡應"
    "機構萬藝處臺灣響預辦觀歷權頗讓議員絕讀變體雖聽寫難護產僅鮮"
)


# most frequent hangul syllables (particles / endings dominate natural text)
_COMMON_KO = frozenset(
    "이다의에는은하을가고를서지한로것으도기되사아니스트인만같습었니까부터그"
    "러나저우리들지금오늘새로운정책발표했정부시민교통환경영결주위해조치전문"
    "를과와함께년월일대중소상명수많작략적인제보다때문것입니면서요세게날내말"
)
# hiragana particles / endings — coherent Japanese is hiragana-heavy
_COMMON_JA = frozenset("のにはをとがでしたますんだよりかられもこそあいうえおつてなねさしすせその")


# frequency classes for the statistical guess: strong = characters common
# in real text of some language; weak = valid letter blocks that a wrong-
# codec garble also lands in; C1 controls are negative evidence (no real
# text contains U+0080-U+009F — the ISO-8859-1-decodes-anything trap)
_COMMON_RU = set("оеаинтсрвлкмдпуяыьгзбчйжхшюцщэфё")
_COMMON_LATIN_EXT = set("éèêëàâäùûüîïôöçñíóáúãõåøæßœ")

def _decode_score(s: str) -> float:
    """Frequency-weighted naturalness of a candidate decode: characters with
    strong evidence (common zh/ko/ja/ru characters, common accented Latin,
    ASCII, CJK punctuation) count 1.0; other CJK/kana/hangul/Cyrillic (valid
    blocks but uncommon text — the signature of a wrong-codec garble) count
    0.1; C1 control characters count -1."""
    if not s:
        return 0.0
    strong = 0
    weak = 0
    bad = 0
    for ch in s:
        cp = ord(ch)
        if (
            ch in _COMMON_ZH
            or ch in _COMMON_KO
            or ch in _COMMON_JA
            or 0x20 <= cp <= 0x7E            # printable ASCII
            or ch in "，。、；：？！（）“”《》　‘’—…·"
            or ch in "\t\n\r"
            or ch in _COMMON_RU
            or ch in _COMMON_LATIN_EXT
        ):
            strong += 1
        elif 0x80 <= cp <= 0x9F:             # C1 controls: impossible text
            bad += 1
        elif (
            0x3040 <= cp <= 0x30FF           # kana
            or 0xAC00 <= cp <= 0xD7A3        # hangul syllables
            or 0x4E00 <= cp <= 0x9FFF        # han
            or 0x0400 <= cp <= 0x04FF        # other Cyrillic
        ):
            weak += 1
    return (strong + 0.1 * weak - 1.0 * bad) / len(s)


def charset_guess(body: bytes) -> str:
    """Deterministic statistical guess (replaces the Go chardet dependency,
    /root/reference/charset.go:183-193): strict-decode under each candidate
    codec, score the decodes by common-character frequency, best wins (ties
    break in candidate order).  Falls back to Latin-1."""
    if not body:
        return ""
    if body[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "UTF-16"
    best_name, best_score = "", -1.0
    # single-byte codecs decode ANY bytes into letters, so their score is
    # additionally gated on word structure: real alphabetic text is ~10-20%
    # spaces, a wrong-codec garble has almost none.  Multi-byte codecs
    # reject garble via strict decode instead.  Order encodes the prior for
    # ties (web prevalence: utf-8, CJK, then Latin before Cyrillic).
    for codec, name, single_byte in (
        ("utf-8", "UTF-8", False),
        ("gb18030", "GBK", False),
        ("big5", "Big5", False),
        ("shift_jis", "SHIFT_JIS", False),
        ("euc_jp", "EUC-JP", False),
        ("euc_kr", "EUC-KR", False),
        ("windows-1252", "WINDOWS-1252", True),
        ("latin-1", "ISO-8859-1", True),
        ("windows-1251", "WINDOWS-1251", True),
        ("koi8-r", "KOI8-R", True),
    ):
        try:
            s = body.decode(codec)
        except (UnicodeDecodeError, LookupError):
            continue
        window = s[:2048]
        score = _decode_score(window)
        if single_byte and window:
            space_ratio = sum(1 for ch in window if ch in " \t\n\r") / len(window)
            score *= min(1.0, space_ratio / 0.05)
        if score > best_score:
            best_name, best_score = name, score
    return best_name if best_name else "ISO-8859-1"


# charset_normalizer (the maintained chardet successor, present in this
# container) → this module's charset vocabulary.  The real-library analog of
# the reference's chardet dependency (charset.go:183-193), selectable per
# pipeline via PipelineConfig.extra["charset_guesser"] = "normalizer".
_NORMALIZER_NAME = {
    "utf_8": "UTF-8", "gb18030": "GBK", "gbk": "GBK", "big5": "Big5",
    "shift_jis": "SHIFT_JIS", "cp932": "SHIFT_JIS", "euc_jp": "EUC-JP",
    "euc_kr": "EUC-KR", "cp949": "EUC-KR", "cp1251": "WINDOWS-1251",
    "cp1252": "WINDOWS-1252", "latin_1": "ISO-8859-1", "koi8_r": "KOI8-R",
    "utf_16": "UTF-16",
}


def charset_guess_normalizer(body: bytes) -> str:
    """REAL statistical detector path: charset_normalizer's coherence +
    chaos model instead of the embedded frequency guesser.  Returns '' when
    the library is undecided (caller falls through to the embedded guess).
    Hard import — a configured real-detector path must never silently fall
    back (same contract as the fastText/KenLM hooks)."""
    from charset_normalizer import from_bytes

    best = from_bytes(bytes(body)).best()
    if best is None:
        return ""
    enc = (best.encoding or "").lower()
    return _NORMALIZER_NAME.get(enc, enc.upper().replace("_", "-"))


def detect_charset(
    body: bytes, content_type: str | None = None, guesser: str = "",
) -> tuple[str, str]:
    """Full cascade (/root/reference/charset.go:38-64).  ``guesser``:
    '' → the embedded deterministic statistical guess; 'normalizer' →
    charset_normalizer first, embedded guess as the undecided fallback."""
    try:
        body.decode("utf-8")
        return "UTF-8", CHARSET_POS_VALID
    except UnicodeDecodeError:
        pass
    charset, pos = charset_from_header_html(body, content_type)
    if not charset:
        guess = charset_guess_normalizer(body) if guesser == "normalizer" else ""
        if not guess:
            guess = charset_guess(body)
        if guess:
            return guess, CHARSET_POS_GUESS
    return charset, pos


_PY_CODEC = {
    "UTF-8": "utf-8",
    "GBK": "gb18030",
    "Big5": "big5",
    "SHIFT_JIS": "shift_jis",
    "EUC-JP": "euc_jp",
    "EUC-KR": "euc_kr",
    "EUC-CN": "gb18030",
    "ISO-2022-CN": "iso2022_jp_2",
    "ISO-2022-JP": "iso2022_jp",
    "ISO-2022-KR": "iso2022_kr",
    "KOI8-R": "koi8_r",
    "UTF-16": "utf-16",
    "ISO-8859-1": "latin-1",
    "WINDOWS-1251": "cp1251",
    "WINDOWS-1252": "cp1252",
}


def to_utf8(body: bytes, charset: str) -> str | None:
    """fun.ToUtf8 analog (/root/reference/http.go:157-170): decode with the
    detected charset; None on failure (caller sets drop_reason='charset_error')."""
    codec = _PY_CODEC.get(charset, charset.lower() or "utf-8")
    try:
        return body.decode(codec, errors="strict")
    except (UnicodeDecodeError, LookupError):
        return None


# ---------------------------------------------------------------------------
# Mojibake (double-encoding) detection and repair — the ftfy problem
# ---------------------------------------------------------------------------

# UTF-8 lead bytes 0xC0-0xEF decoded as latin-1/cp1252 land on À..ï;
# their trail bytes 0x80-0xBF land on the C1 block (which cp1252 maps to the
# punctuation/letter set spelled out below) or on U+00A0..U+00BF.  A lead
# character followed by a trail character is the signature bigram of
# UTF-8-read-as-single-byte text ("Ã©" for é,
# "â€™" for ’).
_MOJI_TRAIL = ("-¿"
               "€‚ƒ„…†‡ˆ‰"
               "Š‹ŒŽ‘’“”•"
               "–—˜™š›œžŸ")
RE_MOJIBAKE = re.compile(f"[À-ï][{_MOJI_TRAIL}]")
RE_C1 = re.compile("[-]")


def mojibake_badness(s: str) -> int:
    """Mojibake evidence count: C1 control characters (no real text
    contains U+0080-U+009F) plus lead+trail bigrams of UTF-8 bytes
    misdecoded as latin-1/cp1252.  0 for clean text of any language;
    legitimate accented words ("Île", "à la") don't match —
    their following character is not in the trail class."""
    if not s:
        return 0
    return len(RE_C1.findall(s)) + len(RE_MOJIBAKE.findall(s))


def fix_mojibake(s: str, max_passes: int = 3) -> tuple[str, int]:
    """Repair UTF-8-decoded-as-latin-1/cp1252 text (the ftfy recipe,
    public method: re-encode under the suspected intermediate codec and
    re-decode as UTF-8, accepting a candidate only when it strictly
    REDUCES the badness score — so clean text, including legitimately
    accented text, is always returned untouched).  cp1252 is tried
    before latin-1 (its 0x80-0x9F mappings are what real mojibake went
    through); iterates up to ``max_passes`` to unwind double/triple
    mojibake.  Returns ``(text, n_passes_applied)``."""
    n = 0
    for _ in range(max_passes):
        b = mojibake_badness(s)
        if b == 0:
            break
        best, best_b = s, b
        for enc in ("cp1252", "latin-1"):
            try:
                cand = s.encode(enc).decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                continue
            cb = mojibake_badness(cand)
            if cb < best_b:
                best, best_b = cand, cb
        if best == s:
            break
        s = best
        n += 1
    return s, n
