"""Quality-metrics stage — the CEPF-analog scorer (SURVEY.md §2.8).

Char-class counts (punct/symbol/digit/space/han/braces) come from the shared
vectorized codepoint kernel (one decode per batch); line/structure metrics
(leaf variance, dup-line ratio, URL-ish density, CEPF log-product score)
reuse the SAME per-row helper as the oracle (functions.quality.line_metrics),
so engine and oracle agree by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig
from ..functions import vectext
from ..functions.quality import line_metrics

_CLASSES = ["punct", "symbol", "digit", "ws", "han", "brace_open", "brace_close"]


def batch_metrics(texts: list) -> dict[str, np.ndarray]:
    cc = vectext.counts(texts, _CLASSES)
    n = cc["_len"].astype(np.float64)
    safe_n = np.where(n > 0, n, 1.0)

    m = len(texts)
    lm = {
        "n_lines": np.empty(m, dtype=np.int32),
        "max_line_dup": np.empty(m, dtype=np.float64),
        "line_len_var": np.empty(m, dtype=np.float64),
        "linkish_ratio": np.empty(m, dtype=np.float64),
        "word_count": np.empty(m, dtype=np.int32),
        "quality_score": np.empty(m, dtype=np.float64),
    }
    for i, t in enumerate(texts):
        row = line_metrics(t or "")
        for k in lm:
            lm[k][i] = row[k]

    return {
        "text_len": cc["_len"].astype(np.int32),
        "n_lines": lm["n_lines"],
        "punct_ratio": cc["punct"] / safe_n,
        "symbol_ratio": cc["symbol"] / safe_n,
        "digit_ratio": cc["digit"] / safe_n,
        "space_ratio": cc["ws"] / safe_n,
        "max_line_dup": lm["max_line_dup"],
        "line_len_var": lm["line_len_var"],
        "linkish_ratio": lm["linkish_ratio"],
        "brace_pairs": np.minimum(cc["brace_open"], cc["brace_close"]).astype(np.int32),
        "word_count": lm["word_count"],
        "han_count": cc["han"].astype(np.int32),
        "quality_score": lm["quality_score"],
    }


def _quality_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    texts = batch.column(cfg.text_col).to_pylist()
    metrics = batch_metrics(texts)
    for name, arr in metrics.items():
        batch = batch.append_column(name, pa.array(arr))
    return batch


def quality_stage(ds, cfg: PipelineConfig):
    return ds.map_batches(
        lambda b: _quality_batch(b, cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
    )


def gopher_stage(ds, text_col: str = "text", mode: str = "flag"):
    """Gopher repetition + quality signal stage (functions/gopher.py — the
    published Rae et al. A1.1 rule bank): appends every signal column plus
    (gopher_keep, gopher_reason); ``mode="filter"`` drops failing rows.
    Pure stateless map_batches — fuses with neighbors, no shuffle; the
    per-doc Counter work is the same order as the n-gram dedup kernels."""
    from ..functions import gopher

    if mode not in ("flag", "filter"):
        raise ValueError(f"mode must be 'flag' or 'filter', got {mode!r}")

    _FLOATS = [s for s, _ in gopher.REPETITION_RULES] + [
        "mean_word_len", "symbol_word_ratio", "bullet_line_frac",
        "ellipsis_line_frac", "alpha_word_frac"]

    def fn(batch: pa.Table) -> pa.Table:
        rows = [gopher.gopher_doc(t) for t in batch.column(text_col).to_pylist()]
        for col in _FLOATS:
            batch = batch.append_column(
                col, pa.array([r[col] for r in rows], pa.float64()))
        for col, typ in (("n_words", pa.int64()), ("n_stopwords", pa.int64()),
                         ("gopher_keep", pa.bool_()),
                         ("gopher_reason", pa.string())):
            batch = batch.append_column(
                col, pa.array([r[col] for r in rows], typ))
        if mode == "filter":
            batch = batch.filter(batch.column("gopher_keep").combine_chunks())
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# Compressibility / entropy signals (repetition + gibberish catchers)
# --------------------------------------------------------------------------

# a doc ≥200 B compressing below 10% is pathological repetition (templated
# boilerplate, spam); codepoint entropy above 5.5 bits on ≥64 B is
# random-noise territory (prose sits ~4-4.5 even multilingual)
MAX_REPETITIVE_RATIO = 0.1
MIN_SIGNAL_BYTES = 200
MAX_CHAR_ENTROPY = 5.5
MIN_ENTROPY_BYTES = 64


def degraded_docs_batch(batch: pa.Table, id_col: str = "doc_id",
                        text_col: str = "text") -> pa.Table:
    """Derive a degradation test corpus: per doc id N, N%7==0 → the text's
    first word repeated to ~1 KiB (templated spam), N%11==0 (and not %7) →
    deterministic pseudo-random printable noise from an md5 chain keyed on
    the id (gibberish), else untouched.  Pure per-row function shared by
    q_compression_quality and its serial oracle."""
    import hashlib

    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    out = []
    for i, t in zip(ids, texts):
        n = int(i)
        if n % 7 == 0:
            word = ((t or "spam").split() or ["spam"])[0]
            reps = max(1, 1024 // (len(word) + 1))
            out.append(" ".join([word] * reps))
        elif n % 11 == 0:
            chunks, seed = [], str(i).encode()
            for k in range(64):
                seed = hashlib.md5(seed + bytes([k])).digest()
                chunks.append(bytes(33 + b % 94 for b in seed))
            out.append(b"".join(chunks).decode("ascii"))
        else:
            out.append(t)
    return batch.set_column(batch.schema.get_field_index(text_col), text_col,
                            pa.array(out, pa.string()))


def compression_signals_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append compressibility/entropy columns + the too_repetitive /
    too_random gate flags (kernel: functions/quality.compression_signals).
    Stateless map — no actor pool needed; zlib is released-GIL C."""
    from ..functions.quality import compression_signals

    texts = batch.column(text_col).to_pylist()
    rows = [compression_signals(t) for t in texts]
    for col, typ in (("n_bytes", pa.int64()), ("comp_len", pa.int64())):
        batch = batch.append_column(col, pa.array([r[col] for r in rows], typ))
    for col in ("comp_ratio", "char_entropy"):
        batch = batch.append_column(
            col, pa.array([r[col] for r in rows], pa.float64()))
    rep = [r["n_bytes"] >= MIN_SIGNAL_BYTES
           and r["comp_ratio"] < MAX_REPETITIVE_RATIO for r in rows]
    rnd = [r["n_bytes"] >= MIN_ENTROPY_BYTES
           and r["char_entropy"] > MAX_CHAR_ENTROPY for r in rows]
    batch = batch.append_column("too_repetitive", pa.array(rep, pa.bool_()))
    return batch.append_column("too_random", pa.array(rnd, pa.bool_()))


def compression_stage(ds, text_col: str = "text"):
    return ds.map_batches(
        lambda t: compression_signals_batch(t, text_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def readability_stage(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Flesch–Kincaid grade-level scoring (functions/quality.
    readability_stats): stateless fused map appending (n_words, n_sents,
    n_syll, fk_milli) per row — the classic cheap fluency/complexity
    signal quality filters bucket on (C4 kept 3 ≤ grade ≤ 16-ish bands
    in several reproductions)."""
    import pyarrow as pa

    from ..functions.quality import readability_stats

    def fn(batch: pa.Table) -> pa.Table:
        stats = [readability_stats(t)
                 for t in batch.column(text_col).to_pylist()]
        batch = batch.append_column(
            "n_words", pa.array([s[0] for s in stats], pa.int64()))
        batch = batch.append_column(
            "n_sents", pa.array([s[1] for s in stats], pa.int64()))
        batch = batch.append_column(
            "n_syll", pa.array([s[2] for s in stats], pa.int64()))
        return batch.append_column(
            "fk_milli", pa.array([s[3] for s in stats], pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def lang_consistency_stats(ds, text_col: str = "text",
                           window_chars: int = 256,
                           switch_ppm_threshold: int = 200_000):
    """Mixed-language / code-switching detector (the CLD-style chunk-vote
    recipe): classify the document AND each fixed ``window_chars`` slice
    with the SAME heuristic cascade the keep/drop path uses
    (functions/langid.lang_from_text — reference semantics,
    lang.go:274-358), then report how many windows disagree with the
    MAJORITY window vote (ties break to the lexicographically smallest
    lang).  The doc-level cascade call is emitted as ``doc_lang`` for
    reference, but a genuinely mixed document confuses its ratios into
    '' (measured) — anchoring on it would hide exactly the rows this
    detector exists to find.  A template page with an English boilerplate
    frame around Chinese content, or a scraped forum mixing languages
    mid-thread, scores high; clean monolingual prose scores 0.  Windows
    shorter than the reference's 64-char floor return '' and are counted
    as undetermined, not disagreement.

    Pure stateless map, no shuffle.  Appends doc_lang, n_windows,
    n_classified, n_disagree, switch_ppm (round-half-down integer ppm of
    CLASSIFIED windows) and the ``code_switched`` flag (ppm over
    threshold with ≥2 classified windows)."""
    from ..functions.langid import lang_from_text

    if window_chars < 64:
        raise ValueError("window_chars must be >= 64 (the reference's "
                         "BODY_MIN_SIZE floor)")

    def fn(batch: pa.Table) -> pa.Table:
        from collections import Counter

        texts = batch.column(text_col).to_pylist()
        doc_lang, n_win, n_cls, n_dis, ppm, flag = [], [], [], [], [], []
        for t in texts:
            t = t or ""
            dl = lang_from_text(t)[0]
            wins = [t[i:i + window_chars]
                    for i in range(0, len(t), window_chars)]
            langs = [lang_from_text(w)[0] for w in wins]
            cls = [x for x in langs if x]
            if cls:
                counts = Counter(cls)
                best = max(counts.values())
                anchor = min(k for k, v in counts.items() if v == best)
                dis = [x for x in cls if x != anchor]
            else:
                dis = []
            p = (len(dis) * 1_000_000 // len(cls)) if cls else 0
            doc_lang.append(dl)
            n_win.append(len(wins))
            n_cls.append(len(cls))
            n_dis.append(len(dis))
            ppm.append(p)
            flag.append(p > switch_ppm_threshold and len(cls) >= 2)
        batch = batch.append_column("doc_lang",
                                    pa.array(doc_lang, pa.string()))
        batch = batch.append_column("n_windows",
                                    pa.array(n_win, pa.int64()))
        batch = batch.append_column("n_classified",
                                    pa.array(n_cls, pa.int64()))
        batch = batch.append_column("n_disagree",
                                    pa.array(n_dis, pa.int64()))
        batch = batch.append_column("switch_ppm",
                                    pa.array(ppm, pa.int64()))
        return batch.append_column("code_switched",
                                   pa.array(flag, pa.bool_()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
