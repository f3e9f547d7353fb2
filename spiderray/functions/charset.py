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


def charset_guess(body: bytes) -> str:
    """Deterministic byte-distribution guess (replaces chardet,
    /root/reference/charset.go:183-193). Tries strict decodes in a fixed
    priority order, then falls back to Latin-1."""
    if not body:
        return ""
    if body[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "UTF-16"
    for codec, name in (
        ("utf-8", "UTF-8"),
        ("gb18030", "GBK"),
        ("big5", "Big5"),
        ("shift_jis", "SHIFT_JIS"),
        ("euc_jp", "EUC-JP"),
        ("euc_kr", "EUC-KR"),
    ):
        try:
            body.decode(codec)
            return name
        except (UnicodeDecodeError, LookupError):
            continue
    return "ISO-8859-1"


def detect_charset(body: bytes, content_type: str | None = None) -> tuple[str, str]:
    """Full cascade (/root/reference/charset.go:38-64)."""
    try:
        body.decode("utf-8")
        return "UTF-8", CHARSET_POS_VALID
    except UnicodeDecodeError:
        pass
    charset, pos = charset_from_header_html(body, content_type)
    if not charset:
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
