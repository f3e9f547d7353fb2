"""ICP extraction + PII scrub bank (M14 generalized; SURVEY.md §2.2).

The reference's ICP-licence cascade (/root/reference/extract/icp.go:55-110) is
the prototype: a priority-ordered bank of precompiled regexes with
first-match-wins extraction.  The engine generalizes it to a scrubber:
every pattern kind is found, recorded in ``pii_found`` and replaced with a
``<KIND>`` token, in a fixed deterministic order so scrubbed output is
byte-stable.

Go's RE2 is leftmost-longest for alternations while Python ``re``/``regex``
are leftmost-first; the ICP patterns below order alternatives longest-first
(``备案|备|证``) so both engines agree (SURVEY.md §7 hard-point 1), pinned by
the icp_test.go fixtures in tests/test_scrub.py.
"""

from __future__ import annotations

import re

import regex as _re

from .maps import PROVINCE_SHORT_MAP

_PROV = "京|津|冀|晋|蒙|辽|吉|黑|沪|苏|浙|皖|闽|赣|鲁|豫|鄂|湘|粤|桂|琼|川|蜀|贵|黔|云|滇|渝|藏|陇|甘|陕|秦|青|宁|新"

# /root/reference/extract/icp.go:56-58 (alternation reordered longest-first
# to reproduce RE2 leftmost-longest: 备案 before 备)
RE_ICP = _re.compile(rf"(?i)({_PROV})ICP(备案|备|证)?[0-9]+")
RE_ICP_GA = _re.compile(rf"(?i)({_PROV})公网安备[0-9]+")
RE_ICP_DX = _re.compile(rf"(?i)({_PROV})B2-[0-9]+")


def icp_from_text(text: str) -> tuple[str, str]:
    """IcpFromText clone (/root/reference/extract/icp.go:81-110): ICP →
    公网安备 → B2, first match wins; returns (matched, province short char)."""
    for pat in (RE_ICP, RE_ICP_GA, RE_ICP_DX):
        m = pat.search(text)
        if m:
            return m.group(0), m.group(1)
    return "", ""


def icp_province(short: str) -> str:
    """Province char → full name via ProvinceShortMap (icp.go:12-53)."""
    return PROVINCE_SHORT_MAP.get(short, "")


# ---------------------------------------------------------------------------
# PII scrub bank.  Order is semantic priority AND determinism contract:
# url before email would eat mailto-ish text, so email runs first; phones
# after IDs so an 18-digit ID is not half-eaten as a phone.
# ---------------------------------------------------------------------------
PII_PATTERNS: list[tuple[str, "re.Pattern | _re.Pattern"]] = [
    ("email", re.compile(r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}")),
    ("url", re.compile(r"(?:https?://|www\.)[^\s<>\"']+", re.IGNORECASE)),
    ("icp", _re.compile(rf"(?i)({_PROV})(?:ICP(?:备案|备|证)?|公网安备|B2-)[0-9]+(?:-[0-9]+)?号?")),
    ("id_cn", re.compile(r"(?<![0-9])[1-9][0-9]{16}[0-9Xx](?![0-9])")),
    ("ssn", re.compile(r"(?<![0-9\-])[0-9]{3}-[0-9]{2}-[0-9]{4}(?![0-9\-])")),
    ("phone_cn", re.compile(r"(?<![0-9])(?:\+?86[\- ]?)?1[3-9][0-9]{9}(?![0-9])")),
    ("phone_intl", re.compile(r"(?<![0-9\-])(?:\+[0-9]{1,3}[\- ])?(?:\([0-9]{2,4}\)[\- ]?)?[0-9]{3,4}-[0-9]{3,4}-?[0-9]{0,4}(?![0-9])")),
    ("ipv4", re.compile(r"(?<![0-9.])(?:[0-9]{1,3}\.){3}[0-9]{1,3}(?![0-9.])")),
]

_TOKENS = {kind: f"<{kind.upper()}>" for kind, _ in PII_PATTERNS}


# ---------------------------------------------------------------------------
# Toxicity flagging (north_rule "PII/toxicity scrubbing"): a deterministic
# embedded lexicon scored as hit-ratio over whitespace tokens.  At production
# scale the lexicon is a broadcast file; the scoring path is identical.
# ---------------------------------------------------------------------------
TOXIC_LEXICON = frozenset({
    "hate", "hateful", "kill", "killing", "murder", "stupid", "idiot",
    "idiots", "moron", "dumb", "trash", "garbage", "scum", "loser", "losers",
    "damn", "ugly", "disgusting", "worthless", "pathetic",
    "racist", "sexist", "violent", "violence", "destroy",
    "废物", "蠢货", "白痴", "垃圾", "滚蛋", "去死", "混蛋", "笨蛋",
})

_TOX_STRIP = ".,;:!?()[]\"'“”！？。，；：（）"


def toxicity_score(text: str) -> float:
    """Share of whitespace tokens found in the toxic lexicon (plus any CJK
    lexicon entry found as a substring, since zh does not space-tokenize)."""
    words = text.lower().split()
    if not words:
        return 0.0
    hits = sum(1 for w in words if w.strip(_TOX_STRIP) in TOXIC_LEXICON)
    for entry in TOXIC_LEXICON:
        if not entry.isascii() and entry in text:
            hits += text.count(entry)
    return min(hits / len(words), 1.0)


# Every bank pattern requires a digit, '@', 'www.' or 'http' somewhere —
# one cheap trigger scan skips the 8-pattern pass on clean text (the common
# case); behavior-identical because a text without any trigger cannot match
# any pattern.
_RE_TRIG_NUM = re.compile(r"[0-9@]")
_RE_TRIG_URL = re.compile(r"(?i)www\.|http")


def scrub_text(text: str) -> tuple[str, list[dict[str, str]]]:
    """Apply the full bank in order; returns (scrubbed, pii_found) where
    pii_found is a list of {kind, value} in match order (byte-stable)."""
    if _RE_TRIG_NUM.search(text) is None and _RE_TRIG_URL.search(text) is None:
        return text, []
    found: list[dict[str, str]] = []
    for kind, pat in PII_PATTERNS:
        token = _TOKENS[kind]

        def _cap(m, kind=kind, token=token):
            found.append({"kind": kind, "value": m.group(0)})
            return token

        text = pat.sub(_cap, text)
    return text, found


def pseudonymize_batch(batch, cols, key: str, prefix_len: int = 16):
    """Keyed pseudonymization (the GDPR-grade id-tokenization recipe):
    each value in ``cols`` is replaced by the first ``prefix_len`` hex
    chars of ``md5(key || ':' || value)`` — deterministic under one key,
    so referential integrity holds ACROSS tables and runs, while the
    raw identifier never leaves the pipeline.  Nulls stay null.
    The hashed string is ``str(value)`` of the column's ARROW type —
    matching SQL's CAST(col AS VARCHAR) — so referential integrity
    requires the SAME type on both sides of a join (int64 1 and
    float64 1.0 tokenize differently, exactly as they CAST
    differently).  The
    companion of apply_deletions on the governance shelf: deletions
    remove rows, pseudonymization keeps the joinable shape without the
    identity.  SQL-exact: DuckDB md5(concat(...)) restates it
    literally."""
    import hashlib

    import pyarrow as pa

    for c in cols:
        vals = batch.column(c).to_pylist()
        out = [None if v is None else
               hashlib.md5(f"{key}:{v}".encode()).hexdigest()[:prefix_len]
               for v in vals]
        batch = batch.set_column(batch.column_names.index(c), c,
                                 pa.array(out, pa.string()))
    return batch


def pseudonymize(ds, cols, key: str, prefix_len: int = 16):
    """Stateless fused map over ``pseudonymize_batch`` — no shuffle."""
    if not cols:
        raise ValueError("pseudonymize: cols must be non-empty")
    if not key:
        raise ValueError("pseudonymize: key must be non-empty")
    return ds.map_batches(
        lambda b: pseudonymize_batch(b, cols, key, prefix_len),
        batch_format="pyarrow", zero_copy_batch=True)
