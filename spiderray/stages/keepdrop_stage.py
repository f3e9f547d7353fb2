"""Keep/drop decision stage — composes codec gate + metric guards + the
link.go-derived classification into (label, keep, drop_reason).

The guard order and thresholds live in functions/keepdrop.py (single source);
this stage evaluates the guards vectorized over the metric columns produced
by quality_stage and calls the per-row classifier only for rows that survive
the guards (the minority of work on dirty corpora).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from ..functions import keepdrop


def batch_decide(
    texts: list,
    langs: list,
    metrics: dict,
    *,
    codec_ok: np.ndarray | None = None,
    charset_ok: np.ndarray | None = None,
    min_quality_score: float = keepdrop.MIN_QUALITY_SCORE,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized ``keepdrop.decide`` over a batch → (keeps, reasons, labels).

    ``metrics`` maps metric name → numpy array (the shape produced by
    quality_stage.batch_metrics, or equivalently the metric columns of a
    decided batch).  Guard order and thresholds are keepdrop.decide's; only
    the per-row classifier tail (the minority that survives the guards)
    stays Python.  Shared by the flagship decide_stage and the composed
    prepare_corpus pipeline — a divergence between the two would silently
    split keep/drop semantics."""
    m = len(texts)
    if codec_ok is None:
        codec_ok = np.ones(m, dtype=bool)
    if charset_ok is None:
        charset_ok = np.ones(m, dtype=bool)

    brace = np.asarray(metrics["brace_pairs"])
    n_lines = np.asarray(metrics["n_lines"])
    dup = np.asarray(metrics["max_line_dup"])
    punct = np.asarray(metrics["punct_ratio"])
    symbol = np.asarray(metrics["symbol_ratio"])
    score = np.asarray(metrics["quality_score"])

    keeps = np.zeros(m, dtype=bool)
    reasons = np.full(m, "", dtype=object)
    labels = np.full(m, keepdrop.LABEL_NONE, dtype=object)

    # vectorized guard cascade (same order as keepdrop.decide)
    undecided = np.ones(m, dtype=bool)

    def _mark(mask, reason):
        nonlocal undecided
        mask = mask & undecided
        reasons[mask] = reason
        undecided &= ~mask

    _mark(~codec_ok, "bad_codec")
    _mark(~charset_ok, "charset_error")
    _mark(brace >= keepdrop.BRACE_GUARD, "dynamic_render")
    _mark((n_lines >= keepdrop.DUP_LINE_MIN_LINES) & (dup >= keepdrop.DUP_LINE_RATIO), "boilerplate")
    _mark(np.array([lang == "" for lang in langs], dtype=bool), "too_short")

    noise = punct + symbol > keepdrop.PUNCT_NOISE_RATIO
    for i in np.nonzero(undecided)[0]:
        label = keepdrop.classify_text(texts[i], langs[i])
        if label == keepdrop.LABEL_CONTENT and keepdrop.is_blacklisted_zh(texts[i], langs[i]):
            labels[i] = keepdrop.LABEL_NONE
            reasons[i] = "blacklist"
            continue
        labels[i] = label
        if noise[i]:
            reasons[i] = "punct_noise"
        elif label == keepdrop.LABEL_CONTENT:
            keeps[i] = True
        elif label == keepdrop.LABEL_UNKNOWN and score[i] > min_quality_score:
            keeps[i] = True
        else:
            reasons[i] = {
                keepdrop.LABEL_LIST: "short",
                keepdrop.LABEL_UNKNOWN: "low_quality",
                keepdrop.LABEL_NONE: "no_lang_chars",
            }[label]

    return keeps, reasons, labels


def _decide_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    m = len(batch)
    texts = batch.column(cfg.text_col).to_pylist()
    langs = batch.column("lang").to_pylist()

    codec_ok = (
        pc.is_in(batch.column(cfg.codec_col), value_set=pa.array(cfg.codec_allowlist))
        .to_numpy(zero_copy_only=False)
        if cfg.codec_col in batch.column_names
        else None
    )
    charset_ok = (
        batch.column("charset_ok").to_numpy(zero_copy_only=False)
        if "charset_ok" in batch.column_names
        else None
    )
    metrics = {
        name: batch.column(name).to_numpy(zero_copy_only=False)
        for name in ("brace_pairs", "n_lines", "max_line_dup",
                     "punct_ratio", "symbol_ratio", "quality_score")
    }
    keeps, reasons, labels = batch_decide(
        texts, langs, metrics,
        codec_ok=codec_ok, charset_ok=charset_ok,
        min_quality_score=cfg.min_quality_score,
    )
    batch = batch.append_column("label", pa.array(labels, pa.string()))
    batch = batch.append_column("keep", pa.array(keeps, pa.bool_()))
    return batch.append_column("drop_reason", pa.array(reasons, pa.string()))


def decide_stage(ds, cfg: PipelineConfig):
    return ds.map_batches(
        lambda b: _decide_batch(b, cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
    )
