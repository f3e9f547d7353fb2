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
