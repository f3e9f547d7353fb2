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


def _decide_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    m = len(batch)
    texts = batch.column(cfg.text_col).to_pylist()
    langs = batch.column("lang").to_pylist()

    codec_ok = (
        pc.is_in(batch.column(cfg.codec_col), value_set=pa.array(cfg.codec_allowlist))
        .to_numpy(zero_copy_only=False)
        if cfg.codec_col in batch.column_names
        else np.ones(m, dtype=bool)
    )
    charset_ok = (
        batch.column("charset_ok").to_numpy(zero_copy_only=False)
        if "charset_ok" in batch.column_names
        else np.ones(m, dtype=bool)
    )

    brace = batch.column("brace_pairs").to_numpy(zero_copy_only=False)
    n_lines = batch.column("n_lines").to_numpy(zero_copy_only=False)
    dup = batch.column("max_line_dup").to_numpy(zero_copy_only=False)
    punct = batch.column("punct_ratio").to_numpy(zero_copy_only=False)
    symbol = batch.column("symbol_ratio").to_numpy(zero_copy_only=False)
    score = batch.column("quality_score").to_numpy(zero_copy_only=False)

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
        elif label == keepdrop.LABEL_UNKNOWN and score[i] > cfg.min_quality_score:
            keeps[i] = True
        else:
            reasons[i] = {
                keepdrop.LABEL_LIST: "short",
                keepdrop.LABEL_UNKNOWN: "low_quality",
                keepdrop.LABEL_NONE: "no_lang_chars",
            }[label]

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
