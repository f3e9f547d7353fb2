"""prepare_audio_corpus — the composed AUDIO corpus-preparation pipeline:
the audio analog of pipelines/prepare_corpus.py, chaining the flagship
quality-filter decision with the acoustic preprocessing/dedup/sharding
operators a training-data team runs end-to-end:

    clips → quality_filter (charset/langid/quality/decide + audio gates
    + scrub) → [silence trim] → [loudness normalize] → [acoustic
    fingerprint dedup] → [augment epochs] → kept rows → [WebDataset
    shards]

Every step is opt-in with defaults OFF and the output schema unchanged
when disabled (the prepare_corpus composition contract).  All steps are
per-row deterministic except the fingerprint dedup, whose loser SET is
partition-independent (same guarantees as the text dedup loser pass).

Scale notes: trim/normalize/augment are pure actor-pool maps (no
shuffle); fp dedup adds the audiodedup pair exchange + a broadcast or
bucketed loser mark (reusing prepare_corpus's dup-mark machinery
threshold); sharding is one keyed exchange into single-writer tars.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from .quality_filter import quality_filter


def prepare_audio_corpus(ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                         trim: bool = False,
                         normalize_lufs: float | None = None,
                         fp_dedup: bool = False,
                         augment_salts: tuple[str, ...] = (),
                         shards_dir: str | None = None,
                         n_shards: int = 64):
    """Compose the audio corpus-prep chain.  Returns the kept-rows
    Dataset (plus shard manifest rows appended as a second return when
    ``shards_dir`` is set)."""
    import pyarrow.compute as pc

    out = quality_filter(ds, cfg)
    out = out.map_batches(
        lambda t: t.filter(pc.equal(t["keep"], True)),
        batch_format="pyarrow", zero_copy_batch=True)
    if trim:
        from ..stages.audioquality import silence_trim_stage

        out = silence_trim_stage(out, cfg)
    if normalize_lufs is not None:
        from ..stages.audioquality import loudness_normalize_stage

        out = loudness_normalize_stage(out, cfg, target_lufs=normalize_lufs)
    if fp_dedup:
        # two consumers follow (the pair search, then the mark/shard
        # chain): materialize the preprocessed table once so the decode
        # chain never re-executes and the low-CPU actor-pool stack stays
        # shallow (same precedent as semantic_dedup's augmented input);
        # kept-corpus-sized, object-store-spillable
        out = out.materialize()
        out = _fp_dedup_mark(out, cfg)
        out = out.map_batches(
            lambda t: t.filter(pc.equal(t["audio_dup"], False)),
            batch_format="pyarrow", zero_copy_batch=True)
    if augment_salts:
        from ..stages.multimodal import audio_augment_stage

        if len(augment_salts) > 1 and not fp_dedup:
            # each epoch branch consumes `out` independently — without a
            # materialize the decode/filter chain re-executes per salt
            # (fp_dedup already materialized above)
            out = out.materialize()

        def _suffix_ids(salt: str):
            def fn(batch: pa.Table) -> pa.Table:
                ids = [f"{i}@{salt}"
                       for i in batch.column(cfg.id_col).to_pylist()]
                names = batch.column_names
                return batch.set_column(names.index(cfg.id_col), cfg.id_col,
                                        pa.array(ids, pa.string()))
            return fn

        # each epoch's rows get a distinct id (clip@salt) so downstream
        # keys (dedup, WDS sample names) never collide across epochs
        epochs = [
            audio_augment_stage(out, cfg, salt=s).map_batches(
                _suffix_ids(s), batch_format="pyarrow", zero_copy_batch=True)
            for s in augment_salts
        ]
        base = epochs[0]
        for e in epochs[1:]:
            base = base.union(e)
        out = base
    if shards_dir is not None:
        from ..sources.wds import write_tar_shards

        manifest = write_tar_shards(
            out, shards_dir, key_col=cfg.id_col, bytes_col=cfg.bytes_col,
            meta_cols=[cfg.codec_col, "sr_hz"], n_shards=n_shards)
        return out, manifest
    return out


def _fp_dedup_mark(ds, cfg: PipelineConfig):
    """Append ``audio_dup`` via acoustic-fingerprint pairs: losers are the
    max-id side of each near-dup pair (min-id canonical keeps — the
    text-dedup winner rule).  Loser ids broadcast via ray.put (the pair
    set is near-dup-sized, not corpus-sized; the bucketed-mark fallback of
    prepare_corpus applies verbatim if that assumption ever breaks)."""
    import ray

    from ..stages.audiodedup import audio_fingerprint_pairs

    pairs = audio_fingerprint_pairs(
        ds, id_col=cfg.id_col, bytes_col=cfg.bytes_col,
        codec_col=cfg.codec_col).to_pandas()
    losers = set(pairs["id_b"].tolist()) if len(pairs) else set()
    losers_ref = ray.put(losers)

    def mark(batch: pa.Table) -> pa.Table:
        bad = ray.get(losers_ref)
        ids = batch.column(cfg.id_col).to_pylist()
        return batch.append_column(
            "audio_dup", pa.array([i in bad for i in ids], pa.bool_()))

    return ds.map_batches(mark, batch_format="pyarrow", zero_copy_batch=True)
