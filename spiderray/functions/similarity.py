"""fun.SimilarityText reimplementation (SURVEY.md §2.8).

The go-fun dependency is not in the checkout; call sites
(/root/reference/extract/content.go:812-842, 874-925) use it as a
0..1 text-similarity with thresholds 0.3 (zh) / 0.5 (word langs).
Reimplemented as the difflib-style ratio 2*M/(len_a+len_b) where M is the
total length of matching blocks (longest-common-substring family), with
autojunk disabled for determinism; pinned by fixtures (interpretation risk
flagged per SURVEY.md §7 hard-point 2).
"""

from __future__ import annotations

from difflib import SequenceMatcher


def similarity_text(a: str, b: str) -> float:
    if not a and not b:
        return 0.0
    return SequenceMatcher(None, a, b, autojunk=False).ratio()


# thresholds from /root/reference/extract/content.go:71-74, 184-187
TITLE_SIM_ZH = 0.3
TITLE_SIM_WORD = 0.5


def title_sim_threshold(lang: str) -> float:
    return TITLE_SIM_ZH if lang == "zh" else TITLE_SIM_WORD


def max_similarity(target: str, candidates: list[str]) -> tuple[int, float]:
    """Top-1 similarity walk (content.go:874-925): returns (index, score) of
    the best candidate, first-wins on ties (document order)."""
    best_i, best_s = -1, -1.0
    for i, cand in enumerate(candidates):
        s = similarity_text(target, cand)
        if s > best_s:
            best_i, best_s = i, s
    return best_i, best_s


def banded_levenshtein(a: str, b: str, max_d: int) -> int:
    """Levenshtein distance with an Ukkonen band: exact when the true
    distance is <= ``max_d``, else returns ``max_d + 1`` (the caller's
    "too far" sentinel).  O(len * max_d) time / O(max_d) memory — the
    verify kernel of the fuzzy-pair dedup family (stages/dedup.
    levenshtein_pairs)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > max_d:
        return max_d + 1
    if a == b:
        return 0
    if la > lb:  # keep the band centered: iterate over the shorter string
        a, b, la, lb = b, a, lb, la
    big = max_d + 1
    # prev[j] = distance for prefix a[:i], b[:j], j within the band
    prev = [j if j <= max_d else big for j in range(lb + 1)]
    for i in range(1, la + 1):
        lo = max(1, i - max_d)
        hi = min(lb, i + max_d)
        cur = [big] * (lb + 1)
        cur[0] = i if i <= max_d else big
        ca = a[i - 1]
        row_min = cur[0] if lo == 1 else big
        for j in range(lo, hi + 1):
            cost = 0 if ca == b[j - 1] else 1
            d = prev[j - 1] + cost
            if prev[j] + 1 < d:
                d = prev[j] + 1
            if cur[j - 1] + 1 < d:
                d = cur[j - 1] + 1
            if d > big:
                d = big
            cur[j] = d
            if d < row_min:
                row_min = d
        if row_min > max_d:
            return big
        prev = cur
    return prev[lb] if prev[lb] <= max_d else big
