"""PII scrub stage (M14 generalized).

Applies the compiled-regex bank (compiled once at module import — regexes
pickle to workers as pattern objects, never recompiled per batch) to the kept
rows only by default (``cfg.scrub_dropped`` scrubs everything).  Emits
``scrubbed_transcript`` plus ``pii_found: list<struct<kind,value>>``.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import PipelineConfig
from ..functions.scrub import scrub_text, toxicity_score

_PII_TYPE = pa.list_(pa.struct([("kind", pa.string()), ("value", pa.string())]))


def _scrub_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    texts = batch.column(cfg.text_col).to_pylist()
    keeps = (
        batch.column("keep").to_pylist()
        if "keep" in batch.column_names and not cfg.scrub_dropped
        else [True] * len(texts)
    )
    scrubbed, founds, tox = [], [], []
    for text, keep in zip(texts, keeps):
        if keep and text:
            s, f = scrub_text(text)
            t = toxicity_score(text)
        else:
            s, f, t = "", [], 0.0
        scrubbed.append(s)
        founds.append(f)
        tox.append(t)
    batch = batch.append_column("scrubbed_transcript", pa.array(scrubbed, pa.string()))
    batch = batch.append_column("toxicity", pa.array(tox, pa.float32()))
    return batch.append_column("pii_found", pa.array(founds, _PII_TYPE))


def scrub_stage(ds, cfg: PipelineConfig):
    return ds.map_batches(
        lambda b: _scrub_batch(b, cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
    )
