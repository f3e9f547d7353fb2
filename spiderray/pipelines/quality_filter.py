"""The flagship quality-filter pipeline (SURVEY.md §3.1 engine shape):

    read → charset → langid → quality metrics → keep/drop → scrub → write

One clip row in ≙ one decided row out (the GetNews per-record path,
/root/reference/spider.go:207-263, re-expressed as a streaming Dataset).
Audio ``bytes`` pass through every stage untouched inside the same Arrow
blocks (zero-copy: no stage materializes or rewrites the binary column).
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..stages import charset_stage, decide_stage, langid_stage, quality_stage, scrub_stage

# intermediate metric columns dropped from the output unless cfg.debug_columns
_DEBUG_COLS = (
    "text_len", "n_lines", "punct_ratio", "symbol_ratio", "digit_ratio",
    "space_ratio", "max_line_dup", "line_len_var", "linkish_ratio",
    "brace_pairs", "word_count", "han_count", "charset_ok",
)


def quality_filter(ds, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Compose the full decision pipeline over a clips Dataset.  Lazy: the
    caller consumes (write_parquet / iter_batches / take).

    The stateless stages fuse into one task chain; the perplexity scorer is
    an actor-pool stage (models built once per actor) appended last so the
    payload blocks cross a task→actor boundary exactly once."""
    ds = charset_stage(ds, cfg)
    ds = langid_stage(ds, cfg)
    ds = quality_stage(ds, cfg)
    ds = decide_stage(ds, cfg)
    if cfg.audio_gates:
        from ..stages.multimodal import audio_gate_stage

        ds = audio_gate_stage(ds, cfg)
    ds = scrub_stage(ds, cfg)
    if cfg.with_perplexity:
        from ..stages.perplexity_stage import perplexity_stage

        ds = perplexity_stage(ds, cfg)
    if not cfg.debug_columns:
        # drop per-batch (ds.schema() would trigger execution; stay lazy)
        def _drop(t):
            return t.drop_columns([c for c in _DEBUG_COLS if c in t.column_names])

        ds = ds.map_batches(_drop, batch_format="pyarrow", zero_copy_batch=True)
    return ds


def kept_only(ds, cfg: PipelineConfig = DEFAULT_CONFIG):
    """The filtered corpus: quality_filter + keep==True predicate."""
    import pyarrow.compute as pc

    return quality_filter(ds, cfg).map_batches(
        lambda t: t.filter(pc.equal(t["keep"], True)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
