"""Transcript hallucination-loop detection (the Whisper-loop gate).

ASR models in repetition collapse emit a phrase loop at the END of the
transcript ("thanks for watching thanks for watching …") — the classic
failure mode large speech corpora filter before training (the OpenAI
Whisper paper's decoding heuristics fight the same collapse at inference
time).  The detector is model-free: for each candidate period p, the
longest suffix of the word sequence satisfying w[i] == w[i−p] measures the
periodic tail; a tail that repeats the period ≥4 times over ≥8 words is a
loop no natural transcript produces.  A whole-text duplicate-trigram ratio
rides along as the global-repetition monitoring signal (Gopher A1.1's
dup-n-gram family) without joining the flag decision.

Per-row cost is O(max_period · words) numpy comparisons over a crc32 word
hash (collisions at 2^-32 per pair are far below the gate's signal);
words cap at the LAST ``max_words`` — loops live at the tail, and the cap
bounds worst-case work at 10^12-clip scale.
"""

from __future__ import annotations

from zlib import crc32

import numpy as np
import pyarrow as pa

LOOP_MAX_PERIOD = 16
LOOP_MAX_WORDS = 512
LOOP_MIN_REPEATS = 4
LOOP_MIN_WORDS = 8


def loop_stats(text: str | None) -> dict:
    """Periodic-tail and duplicate-trigram statistics for one transcript.

    Returns n_words (post-cap), loop_period / loop_len (the longest
    qualifying periodic suffix, 0/0 when none reaches 3 repeats),
    loop_ratio (loop_len / n_words), dup3_ratio (1 − unique/total word
    trigrams), and the ``halluc`` flag (≥LOOP_MIN_REPEATS repeats over
    ≥LOOP_MIN_WORDS words)."""
    words = (text or "").split()
    if len(words) > LOOP_MAX_WORDS:
        words = words[-LOOP_MAX_WORDS:]
    n = len(words)
    out = {"n_words": n, "loop_period": 0, "loop_len": 0,
           "loop_ratio": 0.0, "dup3_ratio": 0.0, "halluc": False}
    if n < 6:
        return out
    h = np.array([crc32(w.encode("utf-8")) for w in words], dtype=np.int64)
    best_len, best_p = 0, 0
    for p in range(1, min(LOOP_MAX_PERIOD, n // 3) + 1):
        eq = h[p:] == h[:-p]
        rev = eq[::-1]
        run = len(rev) if rev.all() else int(rev.argmin())
        # tail length = matched run + the seed period itself; require the
        # pattern to complete >= 3 cycles so a chance double-word never counts
        if run >= 2 * p and run + p > best_len:
            best_len, best_p = run + p, p
    tri = np.lib.stride_tricks.sliding_window_view(h, 3)
    n_tri = len(tri)
    uniq = len(np.unique(tri, axis=0))
    out["dup3_ratio"] = float(1.0 - uniq / n_tri) if n_tri else 0.0
    if best_p:
        out["loop_period"] = best_p
        out["loop_len"] = best_len
        out["loop_ratio"] = best_len / n
        out["halluc"] = (best_len // best_p >= LOOP_MIN_REPEATS
                         and best_len >= LOOP_MIN_WORDS)
    return out


def loop_stats_batch(batch: pa.Table, text_col: str = "text",
                     id_cols: tuple = ("doc_id",)) -> pa.Table:
    """Stateless per-batch wrapper: one row in → one decided row out."""
    texts = batch.column(text_col).to_pylist()
    stats = [loop_stats(t) for t in texts]
    cols: dict = {c: batch.column(c) for c in id_cols}
    for k, typ in (("n_words", pa.int64()), ("loop_period", pa.int64()),
                   ("loop_len", pa.int64())):
        cols[k] = pa.array([s[k] for s in stats], typ)
    for k in ("loop_ratio", "dup3_ratio"):
        cols[f"{k}_milli"] = pa.array(
            [int(np.floor(s[k] * 1000 + 0.5)) for s in stats], pa.int64())
    cols["halluc"] = pa.array([s["halluc"] for s in stats], pa.bool_())
    return pa.table(cols)
