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
