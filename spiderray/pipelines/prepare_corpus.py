"""End-to-end training-corpus preparation over a documents table — the
composed "what a user of this engine actually runs" pipeline for text:

    read → language-ID → quality metrics + keep/drop → exact dedup
    (winner marking) → token counts → deterministic split assignment → write

Shuffle budget: exactly ONE all-to-all on (id, fingerprint) pairs (the
dedup-loser computation).  Everything else is a stateless map (langid,
metrics, tokens, split).  The decide pass reuses the flagship's vectorized
kernels (stages/langid_stage.batch_detect_lang,
stages/quality_stage.batch_metrics, stages/keepdrop_stage.batch_decide) —
one UTF-32 decode per batch, never a per-row Python cascade.

Duplicate marking is LOSER-shaped, not winner-shaped: the ids that ride
back into the mark pass are the rows that LOST the min-id-per-fingerprint
race (≈ duplicate volume), not the winners (≈ the whole corpus).  Below
``broadcast_max_losers`` the loser ids broadcast once via ray.put (an
Arrow array, zero-copy through plasma); beyond, an explicit bucketed
Arrow-native mark join runs — nothing corpus-sized ever materializes on
the driver at any dup rate (the round-2 verdict's prepare_corpus finding).

Output schema: (doc_id, lang, keep, drop_reason, quality_score,
ws_tokens, split, text) — the columns a downstream trainer consumes.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.fingerprint import md5_fingerprint
from ..functions.tokenize import ws_token_count
from ..stages.keepdrop_stage import batch_decide
from ..stages.langid_stage import batch_detect_lang
from ..stages.quality_stage import batch_metrics
from ..stages.stats import train_test_split

BROADCAST_MAX_LOSERS = 1_000_000   # loser-id broadcast ceiling (~50 MB)
LOSER_BUCKETS = 64                 # coarse fp-hash partitions for the shuffle


def _decide_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized langid + metrics + keep/drop over one batch — the same
    kernels the flagship stages use (one UTF-32 decode per batch), so the
    composed pipeline and the staged pipeline agree by construction."""
    texts = [t or "" for t in batch.column(text_col).to_pylist()]
    langs, _poss = batch_detect_lang(texts)
    metrics = batch_metrics(texts)
    keeps, reasons, _labels = batch_decide(list(texts), list(langs), metrics)
    toks = np.fromiter((ws_token_count(t) for t in texts), dtype=np.int64,
                       count=len(texts))
    batch = batch.append_column("lang", pa.array(langs, pa.string()))
    batch = batch.append_column("keep", pa.array(keeps, pa.bool_()))
    batch = batch.append_column("drop_reason", pa.array(reasons, pa.string()))
    batch = batch.append_column(
        "quality_score", pa.array(metrics["quality_score"], pa.float64())
    )
    return batch.append_column("ws_tokens", pa.array(toks, pa.int64()))


def _loser_ids(kept, text_col: str, id_col: str, n_buckets: int = LOSER_BUCKETS):
    """Distributed dedup LOSERS (kept rows that are not the min-id winner of
    their fingerprint group): one (id, fingerprint) shuffle keyed by a
    coarse crc32(fp) bucket; per bucket a vectorized pandas transform picks
    every row above its group min.  Only id+fp pairs move — never text —
    and the result size is the duplicate volume, not the corpus."""

    def add_fp(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        fps = [md5_fingerprint(t or "") for t in texts]
        buckets = np.fromiter(
            (zlib.crc32(f.encode()) % n_buckets for f in fps),
            dtype=np.int64, count=len(fps),
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                "fingerprint": pa.array(fps, pa.string()),
                "__bucket": pa.array(buckets),
            }
        )

    def losers_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        mins = g.groupby("fingerprint")[id_col].transform("min")
        return g.loc[g[id_col] != mins, [id_col]]

    return (
        kept.map_batches(add_fp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(losers_in_bucket, batch_format="pandas")
    )


def _mark_losers_broadcast(decided, losers, id_col: str,
                           reason: str = "duplicate", invert: bool = False):
    """Small-set path: ship the id set ONCE as an Arrow array via ray.put;
    the mark pass is a stateless vectorized map (pc.is_in).  ``invert=True``
    demotes kept rows NOT in the set (winner-shaped marking, e.g. the
    per-domain cap's survivors)."""
    import ray

    chunks = [
        b.column(id_col) for b in losers.iter_batches(batch_format="pyarrow")
    ]
    id_type = decided.schema(fetch_if_missing=True).base_schema.field(id_col).type
    loser_arr = (
        pa.concat_arrays([c.combine_chunks() for c in chunks])
        if chunks
        else pa.array([], id_type)
    )
    ref = ray.put(loser_arr)

    def mark(batch: pa.Table) -> pa.Table:
        import ray as _ray

        arr = _ray.get(ref)
        in_set = pc.is_in(batch.column(id_col), value_set=arr)
        return _apply_dup_mark(batch, in_set, reason=reason, invert=invert)

    return decided.map_batches(mark, batch_format="pyarrow", zero_copy_batch=True)


def _apply_dup_mark(batch: pa.Table, in_set, reason: str = "duplicate",
                    invert: bool = False) -> pa.Table:
    in_set = pc.fill_null(in_set, False)
    is_loser = pc.invert(in_set) if invert else in_set
    # only currently-kept rows demote: an already-dropped row keeps its
    # original reason (matters for invert marking, where every non-winner
    # id — including long-dropped rows — tests "not in set")
    is_loser = pc.and_(batch.column("keep"), is_loser)
    names = batch.column_names
    new_keep = pc.and_(batch.column("keep"), pc.invert(is_loser))
    new_reason = pc.if_else(
        is_loser, pa.scalar(reason, pa.string()), batch.column("drop_reason")
    )
    batch = batch.set_column(names.index("keep"), "keep", new_keep)
    return batch.set_column(names.index("drop_reason"), "drop_reason", new_reason)


def _mark_losers_join(decided, losers, id_col: str, n_buckets: int = LOSER_BUCKETS,
                      reason: str = "duplicate", invert: bool = False):
    """Large-set path: explicit bucketed mark join by hash(id) — the
    payload shuffles ONCE, the id set shuffles alongside, and each bucket
    marks Arrow-natively (no pandas: typed nulls must not float-corrupt
    int ids).  Used when the set volume exceeds the broadcast ceiling —
    nothing driver-side at any scale.  Bucketing by the SAME id hash on
    both sides makes the in-bucket membership test globally correct for
    ``invert`` marking too (an id's set row can only land in its own
    bucket)."""
    schema = decided.schema(fetch_if_missing=True).base_schema

    def _id_buckets(col) -> pa.Array:
        vals = col.to_pylist()
        return pa.array(
            np.fromiter(
                (
                    v % n_buckets
                    if isinstance(v, int)
                    else zlib.crc32(str(v).encode()) % n_buckets
                    for v in vals
                ),
                dtype=np.int64,
                count=len(vals),
            )
        )

    def tag_decided(batch: pa.Table) -> pa.Table:
        batch = batch.append_column("__bucket", _id_buckets(batch.column(id_col)))
        return batch.append_column("__side", pa.array(np.zeros(len(batch), dtype=np.int8)))

    def tag_losers(batch: pa.Table) -> pa.Table:
        # identical schema to the decided side: null-pad every non-id column
        cols = {}
        for field in schema:
            if field.name == id_col:
                cols[field.name] = batch.column(id_col)
            else:
                cols[field.name] = pa.nulls(len(batch), field.type)
        t = pa.table(cols)
        t = t.append_column("__bucket", _id_buckets(batch.column(id_col)))
        return t.append_column("__side", pa.array(np.ones(len(batch), dtype=np.int8)))

    tagged = decided.map_batches(
        tag_decided, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        losers.map_batches(tag_losers, batch_format="pyarrow", zero_copy_batch=True)
    )

    out_names = schema.names

    def mark_in_bucket(g: pa.Table) -> pa.Table:
        side = g.column("__side")
        set_ids = g.filter(pc.equal(side, 1)).column(id_col)
        lhs = g.filter(pc.equal(side, 0)).select(out_names)
        if len(set_ids) == 0 and not invert:
            return lhs
        return _apply_dup_mark(
            lhs, pc.is_in(lhs.column(id_col), value_set=set_ids.combine_chunks()),
            reason=reason, invert=invert,
        )

    return tagged.groupby("__bucket").map_groups(mark_in_bucket, batch_format="pyarrow")


def _apply_gopher(ds, text_col: str):
    """Fold the Gopher rule bank (functions/gopher.py) into the keep/drop
    decision: a row that passed the spider decide but fails a Gopher rule
    demotes to keep=False, drop_reason='gopher:<rule>'.  Schema unchanged
    (pure stateless map; fuses with the decide chain)."""
    from ..functions.gopher import gopher_decide, quality_signals, repetition_signals

    def fn(batch: pa.Table) -> pa.Table:
        keeps = batch.column("keep").to_numpy(zero_copy_only=False).copy()
        reasons = batch.column("drop_reason").to_pylist()
        texts = batch.column(text_col).to_pylist()
        for i, (k, t) in enumerate(zip(keeps, texts)):
            if not k:
                continue
            ok, why = gopher_decide(repetition_signals(t or ""),
                                    quality_signals(t or ""))
            if not ok:
                keeps[i] = False
                reasons[i] = f"gopher:{why}"
        names = batch.column_names
        batch = batch.set_column(names.index("keep"), "keep",
                                 pa.array(keeps, pa.bool_()))
        return batch.set_column(names.index("drop_reason"), "drop_reason",
                                pa.array(reasons, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _apply_decontam(ds, bench_ds, text_col: str, id_col: str, n: int):
    """Fold benchmark decontamination (stages/dedup.decontaminate, flag
    mode — bench grams broadcast once, no corpus shuffle) into keep/drop:
    contaminated rows demote with drop_reason='contaminated'."""
    from ..stages.dedup import decontaminate

    flagged = decontaminate(ds, bench_ds, text_col=text_col, id_col=id_col,
                            n=n, mode="flag", only_col="keep")

    def fold(batch: pa.Table) -> pa.Table:
        contaminated = batch.column("contaminated").to_numpy(zero_copy_only=False)
        keeps = batch.column("keep").to_numpy(zero_copy_only=False)
        reasons = np.asarray(batch.column("drop_reason").to_pylist(), dtype=object)
        demote = contaminated & keeps
        reasons[demote] = "contaminated"
        names = batch.column_names
        batch = batch.set_column(names.index("keep"), "keep",
                                 pa.array(keeps & ~contaminated, pa.bool_()))
        batch = batch.set_column(names.index("drop_reason"), "drop_reason",
                                 pa.array(list(reasons), pa.string()))
        return batch.drop_columns(["overlap_grams", "contaminated"])

    return flagged.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True)


def _apply_compression_gate(ds, text_col: str):
    """Fold the compressibility/entropy gates (stages/quality_stage
    .compression_signals_batch) into keep/drop: kept rows flagged
    too_repetitive / too_random demote with
    drop_reason='compression:<which>'.  Stateless map, schema unchanged."""
    from ..stages.quality_stage import compression_signals_batch

    def fn(batch: pa.Table) -> pa.Table:
        sig = compression_signals_batch(batch.select([text_col]), text_col)
        rep = sig.column("too_repetitive").to_numpy(zero_copy_only=False)
        rnd = sig.column("too_random").to_numpy(zero_copy_only=False)
        keeps = batch.column("keep").to_numpy(zero_copy_only=False)
        reasons = np.asarray(batch.column("drop_reason").to_pylist(), dtype=object)
        reasons[keeps & rep] = "compression:repetitive"
        reasons[keeps & ~rep & rnd] = "compression:random"
        names = batch.column_names
        batch = batch.set_column(names.index("keep"), "keep",
                                 pa.array(keeps & ~(rep | rnd), pa.bool_()))
        return batch.set_column(names.index("drop_reason"), "drop_reason",
                                pa.array(list(reasons), pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _apply_domain_cap(marked, id_col: str, domain_col: str, cap: int,
                      broadcast_max: int):
    """Per-domain cap over the KEPT rows (the RefinedWeb anti-spam rule):
    at most ``cap`` survivors per domain, selected by md5(id) order so the
    sample is crawl-order-unbiased and deterministic.  WINNER-shaped: the
    survivor set is built by stages/stats.top_k_per_group (per-batch
    partial head — ≤ cap rows per (domain, block) cross the keyed
    shuffle), then kept rows NOT in it demote via the inverted mark
    (broadcast below ``broadcast_max`` winners, bucketed join beyond).
    Winner volume is cap × #domains — at 10^8 domains route the join."""
    import hashlib

    from ..stages.stats import top_k_per_group

    def slim(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("keep").combine_chunks())
        ids = t.column(id_col).to_pylist()
        pick = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        return pa.table({id_col: t.column(id_col),
                         domain_col: t.column(domain_col),
                         "pick": pa.array(pick, pa.string())})

    winners = top_k_per_group(
        marked.map_batches(slim, batch_format="pyarrow", zero_copy_batch=True),
        [domain_col], "pick", k=cap, descending=False, tie_col=id_col,
    ).materialize()

    if winners.count() <= broadcast_max:
        return _mark_losers_broadcast(marked, winners, id_col,
                                      reason="domain_cap", invert=True)
    return _mark_losers_join(marked, winners, id_col,
                             reason="domain_cap", invert=True)


def _apply_temperature(marked, id_col: str, key_col: str, alpha: float):
    """Temperature resampling of the KEPT rows (stages/stats
    .temperature_resample semantics, folded as a demotion instead of a
    filter): keep rate per key = (n_min/n_key)^(1-alpha) over the
    post-dedup kept histogram, membership = deterministic md5 bucket of
    the id; unsampled rows demote with drop_reason='resampled'.  One
    #keys-sized histogram + a stateless map — no data shuffle."""
    import math

    import ray
    from ray.data.aggregate import Count

    from ..stages.stats import split_bucket

    def slim(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("keep").combine_chunks())
        return t.select([key_col])

    counts = (
        marked.map_batches(slim, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    if counts.empty:
        return marked
    n_min = int(counts["n"].min())
    thr = {}
    for k, n in zip(counts[key_col], counts["n"]):
        rate = math.sqrt(n_min / int(n)) if alpha == 0.5 \
            else (n_min / int(n)) ** (1.0 - alpha)
        thr[k] = int(math.floor(rate * 10_000 + 0.5))
    thr_ref = ray.put(thr)

    def fn(batch: pa.Table) -> pa.Table:
        import ray as _ray

        t = _ray.get(thr_ref)
        keeps = batch.column("keep").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_pylist()
        keys = batch.column(key_col).to_pylist()
        sampled = np.fromiter(
            (split_bucket(str(i), 10_000) < t.get(k, 10_000)
             for i, k in zip(ids, keys)),
            dtype=bool, count=len(ids),
        )
        demote = keeps & ~sampled
        reasons = np.asarray(batch.column("drop_reason").to_pylist(), dtype=object)
        reasons[demote] = "resampled"
        names = batch.column_names
        batch = batch.set_column(names.index("keep"), "keep",
                                 pa.array(keeps & sampled, pa.bool_()))
        return batch.set_column(names.index("drop_reason"), "drop_reason",
                                pa.array(list(reasons), pa.string()))

    return marked.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def prepare_corpus(ds, id_col: str = "doc_id", text_col: str = "text",
                   ratios: dict[str, float] | None = None,
                   broadcast_max_losers: int = BROADCAST_MAX_LOSERS,
                   gopher: bool = False,
                   decontaminate_bench=None,
                   decontam_ngram: int = 13,
                   compression_gate: bool = False,
                   domain_cap: int | None = None,
                   domain_col: str = "source",
                   temperature: float | None = None,
                   temperature_key: str = "lang"):
    """documents Dataset → decided/deduped/split corpus Dataset (lazy).

    Opt-in composition points (both default OFF; output schema unchanged):
    ``gopher=True`` applies the published Gopher repetition/quality bank
    after the spider decide (drop_reason='gopher:<rule>');
    ``decontaminate_bench=<Dataset>`` drops docs sharing any
    ``decontam_ngram``-gram with the benchmark set
    (drop_reason='contaminated'); ``compression_gate=True`` adds the
    zlib-ratio/entropy gates (drop_reason='compression:<which>');
    ``domain_cap=K`` caps survivors per ``domain_col`` after dedup
    (drop_reason='domain_cap'); ``temperature=alpha`` resamples survivors
    by ``temperature_key`` after every other step
    (drop_reason='resampled').  Order: decide → gopher → compression →
    decontam → dedup → domain_cap → temperature → split, so each later
    step sees only what survived the earlier ones.

    TEXT-REWRITING dedup (ExactSubstr — stages/substring_dedup) composes
    UPSTREAM, not as a flag: it returns the same (id, text) schema, so
    ``prepare_corpus(substring_dedup(ds), ...)`` runs the span cuts
    before the decide pass ever reads the text (verified in
    tests/test_substring_dedup.py::test_composes_with_prepare_corpus)."""
    # materialized: the decided rows feed BOTH the loser pass and the final
    # mark/split pass — without this the langid+metrics map (the dominant
    # CPU cost) executes twice end-to-end
    decided_ds = ds.map_batches(
        lambda b: _decide_batch(b, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if gopher:
        decided_ds = _apply_gopher(decided_ds, text_col)
    if compression_gate:
        decided_ds = _apply_compression_gate(decided_ds, text_col)
    if decontaminate_bench is not None:
        decided_ds = _apply_decontam(decided_ds, decontaminate_bench,
                                     text_col, id_col, decontam_ngram)
    decided = decided_ds.materialize()

    # ONE shuffle: (id, fp) of the KEPT rows only — dropped rows never pay
    # it, text never rides it
    kept = decided.map_batches(
        lambda t: t.filter(pc.equal(t["keep"], True)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    losers = _loser_ids(kept, text_col, id_col).materialize()
    n_losers = losers.count()

    if n_losers == 0:
        marked = decided
    elif n_losers <= broadcast_max_losers:
        marked = _mark_losers_broadcast(decided, losers, id_col)
    else:
        marked = _mark_losers_join(decided, losers, id_col)
    if domain_cap is not None:
        # marked re-derives cheaply from the materialized `decided` (the
        # mark pass is a broadcast is_in map), so consuming it twice here
        # does not re-run the decide kernels
        marked = _apply_domain_cap(marked, id_col, domain_col, domain_cap,
                                   broadcast_max_losers)
    if temperature is not None:
        marked = _apply_temperature(marked, id_col, temperature_key,
                                    temperature)
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
