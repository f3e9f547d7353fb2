"""Text normalization primitives with x-funs/go-fun semantics.

The reference library leans on the ``go-fun`` helpers ``RemoveLines``,
``NormaliseSpace``, ``RemoveSign``, ``SubString``, ``SplitTrim``,
``ContainsAny`` at e.g. /root/reference/lang.go:206-226, 277-287 and
/root/reference/extract/web.go:205-210.  The dependency source is not in the
checkout, so these are reimplemented from call-site behavior and pinned by
fixtures (interpretation risk flagged in SURVEY.md §7).

All functions are codepoint-safe by construction (Python ``str``).
"""

from __future__ import annotations

import regex as _re

# [\pP\pS] — the punctuation+symbol class the reference strips before
# language analysis (/root/reference/lang.go:109) and keep/drop
# classification (/root/reference/extract/link.go:39 uses \pP only).
_RE_PUNC_SYM = _re.compile(r"[\p{P}\p{S}]")
_RE_PUNC = _re.compile(r"\p{P}")
_RE_SPACES = _re.compile(r"\s+")

TAB = "\t"
SPACE = " "
SLASH = "/"
DOT = "."
DASH = "-"
UNDERSCORE = "_"


def remove_lines(s: str) -> str:
    """go-fun RemoveLines: delete CR/LF characters outright."""
    return s.replace("\r\n", "").replace("\r", "").replace("\n", "")


def normalise_space(s: str) -> str:
    """go-fun NormaliseSpace: collapse all whitespace runs to single spaces."""
    return _RE_SPACES.sub(" ", s).strip()


def remove_sign(s: str) -> str:
    """go-fun RemoveSign: drop newlines then all punctuation+symbol chars."""
    return _RE_PUNC_SYM.sub("", remove_lines(s))


def remove_punc(s: str) -> str:
    """Strip ``\\pP`` only (link.go:331, 352)."""
    return _RE_PUNC.sub("", s)


def sub_string(s: str, start: int, length: int) -> str:
    """go-fun SubString: rune-safe substring of at most ``length`` runes."""
    if length <= 0:
        return ""
    return s[start : start + length]


def split_trim(s: str, sep: str) -> list[str]:
    """go-fun SplitTrim: split, strip each part, drop empties."""
    return [p.strip() for p in s.split(sep) if p.strip()]


def contains_any(s: str, subs) -> bool:
    """go-fun ContainsAny: true if any of ``subs`` occurs in ``s``."""
    return any(sub in s for sub in subs)


def has_prefix_case(s: str, prefix: str) -> bool:
    """go-fun HasPrefixCase: case-insensitive prefix test."""
    return s.lower().startswith(prefix.lower())


def remove_prefix(s: str, prefix: str) -> str:
    return s[len(prefix) :] if s.startswith(prefix) else s


def remove_suffix(s: str, suffix: str) -> str:
    return s[: -len(suffix)] if suffix and s.endswith(suffix) else s


def format_content(text: str) -> str:
    """formatContent analog (/root/reference/extract/content.go:257-279):
    split into lines, NormaliseSpace each, drop empties, re-join with
    single newlines — the scrubbed-transcript formatting stage (M17)."""
    lines = [normalise_space(ln) for ln in text.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def clean_for_lang(text: str, chunk: int = 2048) -> str:
    """The pre-analysis normalization of langFromText
    (/root/reference/lang.go:277-287): drop newlines and tabs, delete
    double-space runs, strip punctuation+symbols, cap at ``chunk`` runes."""
    text = remove_lines(text)
    text = text.replace(TAB, "")
    text = text.replace("  ", "")
    text = _RE_PUNC_SYM.sub("", text)
    text = sub_string(text, 0, chunk)
    return text.strip()
