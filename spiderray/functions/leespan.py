"""Token-window duplicate-substring primitives — the ExactSubstr method
of Lee et al. 2021, "Deduplicating Training Data Makes Language Models
Better" (arXiv:2107.06499): any window of ``W`` consecutive tokens that
occurs more than once in the CORPUS is removed from every occurrence but
one.  The paper builds a corpus suffix array; the distributed
re-expression (stages/substring_dedup.py) ships one 20-byte
(hash, id, start) row per token position instead — same detection set
for fixed W, shuffle-friendly at 10^12 docs.

Tokens are whitespace runs (split()) — the paper operates on byte/token
streams; whitespace tokens keep the rebuilt text's join convention
well-defined.  Window hashes are order-sensitive 64-bit polynomial
combinations of per-token md5-derived hashes, vectorized via a
sliding-window matmul (wrapping uint64 arithmetic is the modulus).
"""

from __future__ import annotations

import hashlib

import numpy as np

_B = np.uint64(1099511628211)  # FNV-ish odd multiplier


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """Per-token 64-bit hashes (first 8 md5 bytes, big-endian)."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
         for t in tokens),
        dtype=np.uint64, count=len(tokens))


def doc_window_hashes(text: str, w: int) -> tuple[np.ndarray, np.ndarray]:
    """(hashes, starts) for every w-token window of ``text`` — empty when
    the document has fewer than w tokens."""
    tokens = (text or "").split()
    n = len(tokens)
    if n < w:
        return np.empty(0, np.uint64), np.empty(0, np.int32)
    h = _token_hashes(tokens)
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    with np.errstate(over="ignore"):
        weights = np.empty(w, dtype=np.uint64)
        weights[-1] = np.uint64(1)
        for j in range(w - 2, -1, -1):
            weights[j] = weights[j + 1] * _B
        hashes = (win * weights[None, :]).sum(axis=1, dtype=np.uint64)
    return hashes, np.arange(n - w + 1, dtype=np.int32)


def remove_token_spans(text: str, starts: list[int], w: int) -> str:
    """Rebuild a document with every token covered by a losing window
    (each spans [start, start+w)) removed, single-space joined."""
    tokens = (text or "").split()
    drop = np.zeros(len(tokens), dtype=bool)
    for s in starts:
        drop[s : s + w] = True
    return " ".join(t for t, d in zip(tokens, drop) if not d)
