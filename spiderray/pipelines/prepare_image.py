"""Image corpus preparation composite: the end-to-end chain a multimodal
training-data pipeline runs over raw image bytes —

    decode gate (corrupt / tiny / blank strata marked and dropped)
    → perceptual-hash near-dedup (dHash + pigeonhole hamming LSH →
      connected components → min-id representative)
    → optional resize to the training resolution
    → optional WebDataset tar shards

The image sibling of ``prepare_corpus`` (text) and ``prepare_audio_corpus``
(audio).  Each stage is an actor-pool ``map_batches`` over Arrow batches;
payload bytes cross the object store once per stage, and the dedup
exchange moves only (bucket, id, hash64) rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig


def prepare_image_corpus(ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                         min_w: int = 8, min_h: int = 8,
                         min_std_lum: float = 0.0,
                         near_dedup_images: bool = True,
                         max_hamming: int = 3,
                         resize_to: tuple[int, int] | None = None,
                         shards_dir: str | None = None,
                         n_shards: int = 16):
    """Compose the image corpus-prep chain.  Returns the kept-rows Dataset
    (with decode stats; resized bytes when ``resize_to`` is set), plus the
    shard-manifest Dataset as a second return when ``shards_dir`` is set.

    Gate rules: undecodable bytes (``decode_ok=False``), images smaller
    than ``min_w`` x ``min_h``, and near-blank images
    (``std_lum < min_std_lum`` — a flat canvas carries no training signal)
    are dropped.  Near-dedup keeps the min-id representative per connected
    component of hamming<=``max_hamming`` perceptual-hash pairs."""
    from ..stages.image import image_features_stage, image_near_dup_pairs

    feats = image_features_stage(ds, cfg)

    def gate(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(batch.column("decode_ok"),
                    pc.greater_equal(batch.column("width"), min_w)),
            pc.and_(pc.greater_equal(batch.column("height"), min_h),
                    pc.greater_equal(batch.column("std_lum"),
                                     float(min_std_lum))))
        return batch.filter(keep)

    kept = feats.map_batches(gate, batch_format="pyarrow",
                             zero_copy_batch=True)

    if near_dedup_images:
        from ..stages.dedup import near_dedup

        # two consumers (pair search, then the winner filter): materialize
        # the gated table once so the decode chain never re-executes —
        # same precedent as prepare_audio_corpus's fp_dedup branch
        kept = kept.materialize()
        pairs = image_near_dup_pairs(kept, cfg, max_hamming=max_hamming)
        kept = near_dedup(kept, pairs, id_col=cfg.id_col)

    if resize_to is not None:
        # re-enter the feature actor for the resize: select the base
        # columns first so the appended stat columns don't collide
        base = kept.select_columns([cfg.id_col, cfg.bytes_col, "format"])
        kept = image_features_stage(base, cfg, resize_to=resize_to)

    if shards_dir is not None:
        from ..sources.wds import write_tar_shards

        manifest = write_tar_shards(
            kept, shards_dir, key_col=cfg.id_col, bytes_col=cfg.bytes_col,
            meta_cols=["format"], n_shards=n_shards, resume=False)
        return kept, manifest
    return kept
