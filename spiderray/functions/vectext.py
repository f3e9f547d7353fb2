"""Vectorized codepoint kernels for per-batch text statistics.

The reference computes script-character ratios with per-string regex scans
(``\\p{Han}`` etc., /root/reference/lang.go:111-114).  At batch granularity we
instead decode every transcript once to a single contiguous ``uint32``
codepoint array (UTF-32LE reinterpret — zero Python-level per-char work) and
compute all script/class counts with numpy masks + cumsum-diff segment sums.
One decode pass serves every downstream ratio (han/kana/hangul/latin/digit/
punct...), so the per-batch cost is O(total_chars) in C regardless of how many
metrics a stage needs.

Script / category class membership tables are built lazily once per worker
process by scanning the full codepoint space with the SAME ``regex``-module
patterns the row-at-a-time oracle functions use — so the vectorized path and
the oracle agree by construction, across Unicode versions.
"""

from __future__ import annotations

import sys

import numpy as np
import regex as _re

MAX_CP = 0x110000

# Simple codepoint ranges (inclusive) for ASCII-ish classes.
RANGES: dict[str, list[tuple[int, int]]] = {
    "ascii_alpha": [(0x41, 0x5A), (0x61, 0x7A)],
    # regexLatinPattern "[\x80-\xff]" (/root/reference/lang.go:111)
    "latin1_supp": [(0x80, 0xFF)],
    "digit": [(0x30, 0x39)],
    "space": [(0x09, 0x0D), (0x20, 0x20)],
    "brace_open": [(0x7B, 0x7B)],
    "brace_close": [(0x7D, 0x7D)],
}

# Classes backed by regex-module membership tables, mirroring
# /root/reference/lang.go:109-114 and extract/link.go:35-39.  (The reference's
# ja class "[\p{Hiragana}|\p{Katakana}]" also matches a literal '|'; the pipe
# is \p{Sm} and every call site strips \pS first, so dropping it is
# behavior-preserving.)
CLASS_PATTERNS: dict[str, str] = {
    "han": r"\p{Han}",
    "hiragana": r"\p{Hiragana}",
    "katakana": r"\p{Katakana}",
    "ja_kana": r"[\p{Hiragana}\p{Katakana}]",
    "hangul": r"\p{Hangul}",
    "arabic": r"\p{Arabic}",
    "cyrillic": r"\p{Cyrillic}",
    "devanagari": r"\p{Devanagari}",
    "punct": r"\p{P}",
    "symbol": r"\p{S}",
    "punct_symbol": r"[\p{P}\p{S}]",
}

# codepoints Python str.strip() removes (whitespace class for step 5 of
# clean_for_lang_counts)
_STRIP_WS = np.array(
    [0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20, 0x85, 0xA0,
     0x1680, 0x2000, 0x2001, 0x2002, 0x2003, 0x2004, 0x2005, 0x2006, 0x2007,
     0x2008, 0x2009, 0x200A, 0x2028, 0x2029, 0x202F, 0x205F, 0x3000],
    dtype=np.uint32,
)

_TABLES: dict[str, np.ndarray] = {}
_ALL_CP: str | None = None


_CACHE_DIR = "/tmp/spiderray_cache"


def class_table(name: str) -> np.ndarray:
    """Boolean membership table (len 0x110000) for a CLASS_PATTERNS class.
    Built once per MACHINE: the first worker to need a class scans all
    codepoints with the regex-module pattern (single-char class → match
    position == codepoint) and writes the table to a shared /tmp cache
    (atomic rename); every other worker memory-maps it — the page cache
    makes the per-worker cost one mmap, not one Unicode scan."""
    tab = _TABLES.get(name)
    if tab is not None:
        return tab
    import os

    path = os.path.join(_CACHE_DIR, f"classtab_{name}.npy")
    try:
        # full load, not mmap: the table is 1 MiB and fancy-indexed with
        # ~1e5 random positions per batch — mmap page-fault dispatch is far
        # slower than one contiguous read
        tab = np.load(path)
        _TABLES[name] = tab
        return tab
    except (FileNotFoundError, ValueError):
        pass
    global _ALL_CP
    if _ALL_CP is None:
        _ALL_CP = "".join(map(chr, range(MAX_CP)))
    pat = _re.compile(CLASS_PATTERNS[name])
    starts = np.fromiter((m.start() for m in pat.finditer(_ALL_CP)), dtype=np.int64)
    tab = np.zeros(MAX_CP, dtype=bool)
    if len(starts):
        tab[starts] = True
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        tmp = f"{path}.{os.getpid()}.tmp"
        np.save(tmp, tab)
        os.replace(tmp + (".npy" if not tmp.endswith(".npy") else ""), path)
    except OSError:
        pass
    _TABLES[name] = tab
    return tab


def punct_symbol_table() -> np.ndarray:
    return class_table("punct_symbol")


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


def class_mask(codes: np.ndarray, name: str) -> np.ndarray:
    if name == "ws":  # stdlib-re \s class (== str whitespace set)
        return np.isin(codes, _STRIP_WS)
    if name in RANGES:
        return range_mask(codes, RANGES[name])
    return class_table(name)[codes]


def count_class(codes: np.ndarray, offsets: np.ndarray, name: str) -> np.ndarray:
    """Per-row counts of a named script/class over pre-decoded codepoints."""
    return _reduceat(class_mask(codes, name), offsets)


def counts(texts, names: list[str]) -> dict[str, np.ndarray]:
    """Convenience: decode once, count every requested class."""
    codes, offsets = codepoints(texts)
    out = {"_len": offsets[1:] - offsets[:-1]}
    for name in names:
        out[name] = count_class(codes, offsets, name)
    return out


def clean_for_lang_counts(
    texts, class_names: list[str], chunk: int = 2048
) -> dict[str, np.ndarray]:
    """Vectorized equivalent of counting classes over
    ``textnorm.clean_for_lang(text)`` (the langFromText pre-normalization,
    /root/reference/lang.go:277-295) WITHOUT building the cleaned strings:

      1. delete CR / LF / TAB codepoints
      2. reduce each space run of length k to k % 2 spaces
         (strings.ReplaceAll(text, "  ", "") semantics)
      3. delete punctuation+symbol ([\\pP\\pS]) codepoints
      4. cap each row at the first ``chunk`` surviving codepoints
      5. strip leading/trailing whitespace (affects only the reported length)

    Returns per-row arrays: ``_len`` (rune count of the cleaned, capped,
    stripped text) plus one count per requested class.  Class counts are
    computed over the capped-but-unstripped prefix; whitespace belongs to no
    counted class, so stripping only adjusts ``_len``.  Property-tested
    against the row-at-a-time implementation in tests/test_vectext.py.
    """
    codes, offsets = codepoints(texts)
    n_rows = len(offsets) - 1
    if len(codes) == 0:
        z = np.zeros(n_rows, dtype=np.int64)
        return {"_len": z.copy(), **{c: z.copy() for c in class_names}}

    row_id = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(offsets))

    # 1. delete CR/LF/TAB
    keep = (codes != 0x0A) & (codes != 0x0D) & (codes != 0x09)

    # 2. space-run reduction to k % 2 within each row (on the filtered stream)
    idx1 = np.nonzero(keep)[0]
    c1 = codes[idx1]
    r1 = row_id[idx1]
    sp1 = c1 == 0x20
    prev_sp = np.concatenate(([False], sp1[:-1]))
    prev_row = np.concatenate(([-1], r1[:-1]))
    run_start = sp1 & (~prev_sp | (prev_row != r1))
    run_id = np.cumsum(run_start)
    run_id[~sp1] = 0
    pos_in_run = np.arange(len(c1)) - np.maximum.accumulate(
        np.where(run_start, np.arange(len(c1)), -1)
    )
    run_len = np.zeros((int(run_id.max()) + 1) if len(run_id) else 1, dtype=np.int64)
    np.add.at(run_len, run_id[sp1], 1)
    keep_space = np.ones(len(c1), dtype=bool)
    if sp1.any():
        k = run_len[run_id[sp1]]
        keep_space[sp1] = pos_in_run[sp1] >= (k - (k % 2))

    # 3. delete punctuation+symbols
    keep2 = keep_space & ~punct_symbol_table()[c1]
    idx2 = np.nonzero(keep2)[0]
    c2 = c1[idx2]
    r2 = r1[idx2]

    # 4. cap at `chunk` surviving codepoints per row
    row_counts = np.bincount(r2, minlength=n_rows)
    new_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(row_counts, out=new_offsets[1:])
    within = np.arange(len(c2)) - new_offsets[r2]
    capped = within < chunk
    c3 = c2[capped]
    r3 = r2[capped]
    cap_counts = np.bincount(r3, minlength=n_rows)
    off3 = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(cap_counts, out=off3[1:])

    # 5. strip: subtract leading/trailing whitespace from the reported length
    lead = np.zeros(n_rows, dtype=np.int64)
    trail = np.zeros(n_rows, dtype=np.int64)
    if len(c3):
        ws3 = np.isin(c3, _STRIP_WS)
        pos = np.arange(len(c3)) - off3[r3]
        nonws = ~ws3
        first_non = np.full(n_rows, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first_non, r3[nonws], pos[nonws])
        last_non = np.full(n_rows, -1, dtype=np.int64)
        np.maximum.at(last_non, r3[nonws], pos[nonws])
        has_non = last_non >= 0
        lead = np.where(has_non, np.minimum(first_non, cap_counts), cap_counts)
        trail = np.where(has_non, cap_counts - 1 - last_non, 0)

    out = {"_len": cap_counts - lead - trail}
    for name in class_names:
        out[name] = count_class(c3, off3, name)
    return out


if __name__ == "__main__":  # tiny self-check
    c = counts(["hello 世界！", "", "ありがとう"], ["han", "hiragana", "punct_symbol"])
    print({k: v.tolist() for k, v in c.items()}, file=sys.stderr)
