"""End-to-end training-corpus preparation over a documents table — the
composed "what a user of this engine actually runs" pipeline for text:

    read → language-ID → quality metrics + keep/drop → exact dedup
    (winner join) → token counts → deterministic split assignment → write

Shuffle budget: exactly ONE all-to-all (the exact-dedup fingerprint
groupby).  Everything else is a stateless map (langid, metrics, tokens,
split) or a broadcast (the winner-id set rides back into a map as a
semi-join filter — at 10^12 docs swap it for the incremental anti-join
in stages/dedup; same split point, documented there).  The decided rows
are materialized once (object-store resident, spillable) because two
passes consume them; the alternative is recomputing the langid+metrics
map twice.

Output schema: (doc_id, lang, keep, drop_reason, quality_score,
ws_tokens, split, text) — the columns a downstream trainer consumes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import keepdrop, langid, quality
from ..functions.tokenize import ws_token_count
from ..stages import dedup
from ..stages.stats import train_test_split


def _decide_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    langs, keeps, reasons, scores, toks = [], [], [], [], []
    for t in texts:
        t = t or ""
        lang, _ = langid.detect_lang(t)
        metrics = quality.compute_metrics(t)
        keep, reason, _label = keepdrop.decide(t, lang, metrics)
        langs.append(lang)
        keeps.append(keep)
        reasons.append(reason)
        scores.append(metrics.quality_score)
        toks.append(ws_token_count(t))
    batch = batch.append_column("lang", pa.array(langs, pa.string()))
    batch = batch.append_column("keep", pa.array(keeps, pa.bool_()))
    batch = batch.append_column("drop_reason", pa.array(reasons, pa.string()))
    batch = batch.append_column("quality_score", pa.array(scores, pa.float64()))
    return batch.append_column("ws_tokens", pa.array(toks, pa.int64()))


def prepare_corpus(ds, id_col: str = "doc_id", text_col: str = "text",
                   ratios: dict[str, float] | None = None):
    """documents Dataset → decided/deduped/split corpus Dataset (lazy)."""
    import ray

    # materialized: the decided rows feed BOTH the winners pass and the
    # final mark/split pass — without this the langid+metrics map (the
    # dominant CPU cost) executes twice end-to-end
    decided = ds.map_batches(
        lambda b: _decide_batch(b, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    # ONE shuffle: exact-dedup winners (min id per distinct text) of the
    # KEPT rows only — dropped rows never pay the shuffle
    import pyarrow.compute as pc

    kept = decided.map_batches(
        lambda t: t.filter(pc.equal(t["keep"], True)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    winners = dedup.exact_dedup(kept, text_col=text_col, id_col=id_col)
    winner_ids = set()
    for b in winners.select_columns([id_col]).iter_batches(batch_format="pyarrow"):
        winner_ids.update(b.column(id_col).to_pylist())
    # winner-id broadcast semi-join: fine to ~1e7 winners; beyond that use
    # stages/dedup.incremental_exact_dedup's bucketed anti-join shape
    ids_ref = ray.put(winner_ids)

    def mark_dups(batch: pa.Table) -> pa.Table:
        wids = ray.get(ids_ref)
        ids = batch.column(id_col).to_pylist()
        keeps = batch.column("keep").to_pylist()
        reasons = batch.column("drop_reason").to_pylist()
        new_keep, new_reason = [], []
        for i, k, r in zip(ids, keeps, reasons):
            if k and i not in wids:
                new_keep.append(False)
                new_reason.append("duplicate")
            else:
                new_keep.append(k)
                new_reason.append(r)
        names = batch.column_names
        batch = batch.set_column(names.index("keep"), "keep", pa.array(new_keep, pa.bool_()))
        return batch.set_column(
            names.index("drop_reason"), "drop_reason", pa.array(new_reason, pa.string())
        )

    marked = decided.map_batches(mark_dups, batch_format="pyarrow", zero_copy_batch=True)
    return train_test_split(marked, id_col=id_col, ratios=ratios)


def corpus_summary(ds):
    """Tiny driver-side summary of a prepared corpus: per (split, keep)
    row/token counts."""
    from ray.data.aggregate import Count, Sum

    out = (
        ds.groupby(["split", "keep"])
        .aggregate(Count(alias_name="n_docs"), Sum("ws_tokens", alias_name="n_tokens"))
    )
    return out.to_pandas().sort_values(["split", "keep"]).reset_index(drop=True)


def write_split_corpus(ds, out_dir: str, overwrite: bool = False):
    """Write a prepared corpus as split-partitioned parquet
    (out_dir/split=train/..., split=val/..., split=test/...) — the layout a
    trainer consumes split-by-split without reading the others (partition
    pruning at the read).

    Ray's write_parquet APPENDS into an existing directory — a rerun would
    silently double the corpus.  A non-empty ``out_dir`` therefore raises
    unless ``overwrite=True`` (which clears it first).  For incremental /
    restartable output use state/manifest.run_resumable instead."""
    import os
    import shutil

    if os.path.isdir(out_dir) and os.listdir(out_dir):
        if not overwrite:
            raise FileExistsError(
                f"{out_dir} is non-empty; pass overwrite=True to replace it "
                "(write_parquet appends, which would duplicate the corpus)"
            )
        shutil.rmtree(out_dir)
    ds.write_parquet(out_dir, partition_cols=["split"])
    return out_dir
