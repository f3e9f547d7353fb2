"""prepare_speech — the speech-corpus preparation composite.

One STREAMING payload chain with zero shuffles:

    fused QC battery (decode-once defect flags → keep)      AudioQcActor
      → spectral-subtraction denoise                      AudioDenoiseActor
      → loudness normalize to target LUFS             LoudnessNormalizeActor
      → VAD utterance explode (one row per segment)        VadSegmentActor

This is the audio sibling of pipelines/prepare_corpus (text) and
pipelines/prepare_image: the clip table goes in, training-ready
utterance rows come out.  At 10^12 clips the chain is embarrassingly
parallel — Ray's streaming executor pipelines the stages with
backpressure and the payload crosses the object store once per stage,
never the wire (no groupby/sort anywhere).

Execution shape: the four transforms run as TASK maps, not actor
pools.  All four are stateless (their __init__ stores thresholds, not
models), and four fixed actor pools would each reserve CPUs and
together pin the whole session, starving the generator/gate task
stages between them — a measured deadlock at num_cpus≤8.  Task maps
let Ray fuse adjacent stages and schedule into whatever slots exist at
ANY session size; a stage that someday loads real model state should
graduate back to its standalone actor-pool form.

Reference parity note: this composes the engine's own gate bank the way
go-pkg-spider composes charset → lang → extract → clean for pages
(spider.go:166-229) — the same decide-then-transform shape over clips.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import PipelineConfig
from ..stages.audioquality import (AudioDenoiseActor, AudioQcActor,
                                   LoudnessNormalizeActor)
from ..stages.multimodal import VadSegmentActor


def prepare_speech(ds, cfg: PipelineConfig | None = None,
                   target_lufs: float = -16.0,
                   vad_threshold: float = 0.01,
                   min_seg_ms: int = 100):
    """Clip table → QC-gated, denoised, loudness-normalized utterance
    rows (clip_id, seg_idx, start_ms, end_ms, dur_ms, seg_rms, bytes,
    sr_hz, codec).  Dropped clips simply vanish (their reasons live in
    the QC battery's own query); undecodable rows never reach the
    transform stages."""
    cfg = cfg or PipelineConfig()

    def qc_gate(batch: pa.Table) -> pa.Table:
        out = AudioQcActor(cfg)(batch)
        return out.filter(out.column("keep")).select(
            [cfg.id_col, cfg.bytes_col, cfg.codec_col, "sr_hz"])

    def denoise(batch: pa.Table) -> pa.Table:
        return AudioDenoiseActor(cfg)(batch)

    def normalize(batch: pa.Table) -> pa.Table:
        return LoudnessNormalizeActor(cfg, target_lufs=target_lufs)(batch)

    def segment(batch: pa.Table) -> pa.Table:
        return VadSegmentActor(cfg, threshold=vad_threshold,
                               min_seg_ms=min_seg_ms,
                               emit_audio=True)(batch)

    out = ds
    for fn in (qc_gate, denoise, normalize, segment):
        out = out.map_batches(fn, batch_format="pyarrow",
                              zero_copy_batch=True,
                              batch_size=min(cfg.batch_size or 256, 256))
    return out
