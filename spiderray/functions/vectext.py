"""Vectorized codepoint kernels for per-batch text statistics.

The reference computes script-character ratios with per-string regex scans
(``\\p{Han}`` etc., /root/reference/lang.go:111-114).  At batch granularity we
instead decode every transcript once to a single contiguous ``uint32``
codepoint array (UTF-32LE reinterpret — zero Python-level per-char work) and
compute all script/class counts with numpy range masks + ``add.reduceat``.
One pass serves every downstream ratio (han/kana/hangul/latin/digit/punct...),
so the per-batch cost is O(total_chars) in C regardless of how many metrics a
stage needs.

Class membership for the Unicode categories P (punctuation) and S (symbol) is
range-inexpressible, so a 0x110000-entry boolean lookup table is built lazily
once per worker process from ``unicodedata`` and cached at module level
(mirrors the reference's process-global compiled regexes).
"""

from __future__ import annotations

import sys
import unicodedata

import numpy as np

MAX_CP = 0x110000

# Script / class codepoint ranges (inclusive), mirroring the regex classes at
# /root/reference/lang.go:110-114.  Han includes the ext-A and compat blocks
# covered by \p{Han}.
RANGES: dict[str, list[tuple[int, int]]] = {
    "han": [
        (0x3400, 0x4DBF),
        (0x4E00, 0x9FFF),
        (0xF900, 0xFAFF),
        (0x20000, 0x2A6DF),
        (0x2A700, 0x2EBEF),
    ],
    "hiragana": [(0x3041, 0x3096), (0x309D, 0x309F)],
    "katakana": [(0x30A1, 0x30FA), (0x30FD, 0x30FF), (0x31F0, 0x31FF), (0xFF66, 0xFF9D)],
    "hangul": [(0xAC00, 0xD7A3), (0x1100, 0x11FF), (0x3130, 0x318F), (0xA960, 0xA97F)],
    "arabic": [(0x0600, 0x06FF), (0x0750, 0x077F), (0x08A0, 0x08FF), (0xFB50, 0xFDFF), (0xFE70, 0xFEFF)],
    "cyrillic": [(0x0400, 0x04FF), (0x0500, 0x052F)],
    "devanagari": [(0x0900, 0x097F), (0xA8E0, 0xA8FF)],
    "ascii_alpha": [(0x41, 0x5A), (0x61, 0x7A)],
    # regexLatinPattern "[-ÿ]" (/root/reference/lang.go:111)
    "latin1_supp": [(0x80, 0xFF)],
    "digit": [(0x30, 0x39)],
    "space": [(0x09, 0x0D), (0x20, 0x20)],
    "brace_open": [(0x7B, 0x7B)],
    "brace_close": [(0x7D, 0x7D)],
}

_PS_TABLE: np.ndarray | None = None  # \p{P}|\p{S} membership
_P_TABLE: np.ndarray | None = None   # \p{P} membership


def _build_tables() -> None:
    global _PS_TABLE, _P_TABLE
    if _PS_TABLE is not None:
        return
    p = np.zeros(MAX_CP, dtype=bool)
    s = np.zeros(MAX_CP, dtype=bool)
    for cp in range(MAX_CP):
        try:
            cat = unicodedata.category(chr(cp))
        except ValueError:  # pragma: no cover
            continue
        if cat[0] == "P":
            p[cp] = True
        elif cat[0] == "S":
            s[cp] = True
    _P_TABLE = p
    _PS_TABLE = p | s


def punct_symbol_table() -> np.ndarray:
    _build_tables()
    return _PS_TABLE


def punct_table() -> np.ndarray:
    _build_tables()
    return _P_TABLE


def codepoints(texts) -> tuple[np.ndarray, np.ndarray]:
    """Decode a sequence of strings into one contiguous uint32 codepoint array
    plus row offsets (len = n+1).  ``texts`` may be a list / numpy object
    array / pyarrow StringArray (anything yielding str or None)."""
    bufs = []
    lens = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if t is None:
            lens[i] = 0
            continue
        b = t.encode("utf-32-le", "surrogatepass")
        lens[i] = len(b) >> 2
        bufs.append(b)
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    if bufs:
        codes = np.frombuffer(b"".join(bufs), dtype=np.uint32)
    else:
        codes = np.empty(0, dtype=np.uint32)
    return codes, offsets


def _reduceat(mask: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row sums of a boolean mask given row offsets (cumsum-diff: exact
    for empty rows, unlike np.add.reduceat's segment semantics)."""
    n = len(offsets) - 1
    if len(mask) == 0:
        return np.zeros(n, dtype=np.int64)
    csum = np.zeros(len(mask) + 1, dtype=np.int64)
    np.cumsum(mask, out=csum[1:])
    return csum[offsets[1:]] - csum[offsets[:-1]]


def range_mask(codes: np.ndarray, ranges: list[tuple[int, int]]) -> np.ndarray:
    mask = np.zeros(len(codes), dtype=bool)
    for lo, hi in ranges:
        mask |= (codes >= lo) & (codes <= hi)
    return mask


def count_class(codes: np.ndarray, offsets: np.ndarray, name: str) -> np.ndarray:
    """Per-row counts of a named script/class over pre-decoded codepoints."""
    if name == "punct_symbol":
        mask = punct_symbol_table()[codes]
    elif name == "punct":
        mask = punct_table()[codes]
    else:
        mask = range_mask(codes, RANGES[name])
    return _reduceat(mask, offsets)


def counts(texts, names: list[str]) -> dict[str, np.ndarray]:
    """Convenience: decode once, count every requested class."""
    codes, offsets = codepoints(texts)
    out = {"_len": offsets[1:] - offsets[:-1]}
    for name in names:
        out[name] = count_class(codes, offsets, name)
    return out


if __name__ == "__main__":  # tiny self-check
    c = counts(["hello 世界！", "", "ありがとう"], ["han", "hiragana", "punct_symbol"])
    print({k: v.tolist() for k, v in c.items()}, file=sys.stderr)
