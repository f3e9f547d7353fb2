"""Pipeline configuration (the functional-options analog of
/root/reference/spider_news.go:77-99 WithRetryTime/WithTimeOut/... and the
HttpReq overrides at http.go:31-40)."""

from __future__ import annotations

from dataclasses import dataclass, field

from .functions.maps import CODEC_ALLOWLIST


@dataclass
class PipelineConfig:
    # schema
    id_col: str = "clip_id"
    text_col: str = "transcript"
    bytes_col: str = "bytes"
    codec_col: str = "codec"
    raw_text_col: str | None = None  # binary column of undecoded text, if any

    # transport gates (content-type allowlist analog, http.go:20-29)
    codec_allowlist: tuple[str, ...] = CODEC_ALLOWLIST

    # language analysis (lang.go:20-21)
    body_chunk_size: int = 2048
    body_min_size: int = 64

    # keep/drop thresholds (see functions/keepdrop.py)
    min_quality_score: float = 0.0
    scrub_dropped: bool = False  # scrub only kept rows by default (saves ~40%)
    with_perplexity: bool = True  # append the char-LM perplexity scorer
    # False → fused task stage, model bank cached once per worker process
    # (same amortization, no extra payload hop through plasma); True → strict
    # ActorPoolStrategy stage for models too large to replicate per worker
    perplexity_actor_pool: bool = False

    # execution knobs.  1024 measured most stable across {8, 32} cpus and
    # {781, 4096}-row blocks in the round-3 matrix (blocks × batch_size ×
    # cpus, interleaved trials): kernels stay cache-sized and Ray's batch
    # coalescer keeps ~1 task per ~1024-row block.  Two failure modes to
    # avoid when retuning: (a) blocks much SMALLER than batch_size → the
    # coalescer bundles several blocks per task and task count collapses
    # (starves wide hosts); (b) batch_size=None with FAT blocks → whole
    # multi-MB blocks become single batches (UTF-32 temporaries blow the
    # cache; 4-10x slower).  Match source block size ≈ batch_size.  Stages
    # with wide payload rows (audio/image/video) cap their own batch size
    # bytes-wise via min(batch_size or cap, cap).
    batch_size: int | None = 1024
    langid_concurrency: int | tuple[int, int] = (1, 8)
    perplexity_concurrency: int | tuple[int, int] = 8  # fixed pool: actor creation mid-run costs more than idle actors

    # output
    n_output_partitions: int = 16
    debug_columns: bool = False  # keep intermediate metric columns (Content.Debug analog)

    # audio signal gates (engine addition; applied after the transcript
    # decision when enabled — see stages/multimodal.audio_gate_decision)
    audio_gates: bool = False
    min_audio_rms: float = 1e-3
    min_wps: float = 0.5
    max_wps: float = 6.0

    extra: dict = field(default_factory=dict)


DEFAULT_CONFIG = PipelineConfig()


def configure_context(cfg: PipelineConfig | None = None, *, wide_rows: bool = False):
    """Tune the session DataContext for this engine's workloads.  Called by
    bench.py / the CLI — never by library code or the driver entry (the
    driver owns its session).

    ``wide_rows=True`` raises target_max_block_size so multi-hundred-KB
    audio rows don't split blocks absurdly small (SURVEY.md §4.2)."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    if wide_rows:
        ctx.target_max_block_size = 256 * 1024 * 1024
    return ctx
