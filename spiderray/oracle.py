"""Pure-Python row-at-a-time oracle of the full clip decision.

This module IS the spec (SURVEY.md §7): it composes the pure functions in
``spiderray.functions`` exactly once per row, with no Ray and no
vectorization.  The Ray pipeline's output must match it field-for-field
(keep/drop F1 target ≥ 0.99 per BASELINE.json — the engine is held to 1.0
here because both sides share the same function bank).
"""

from __future__ import annotations

from dataclasses import asdict, dataclass

from .config import DEFAULT_CONFIG, PipelineConfig
from .functions import charset as charsetf
from .functions import keepdrop, langid, quality, scrub


@dataclass
class OracleResult:
    clip_id: str
    charset: str
    charset_pos: str
    lang: str
    lang_pos: str
    label: str
    keep: bool
    drop_reason: str
    quality_score: float
    scrubbed_transcript: str
    toxicity: float
    pii_kinds: list[str]


def oracle_row(
    row: dict,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> OracleResult:
    """Decide one clip row ``{clip_id, codec, transcript[, transcript_raw]}``."""
    transcript = row.get(cfg.text_col) or ""
    codec_ok = (row.get(cfg.codec_col) or "") in cfg.codec_allowlist

    raw = row.get(cfg.raw_text_col) if cfg.raw_text_col else None
    if raw is not None:
        cs, cs_pos = charsetf.detect_charset(
            raw, row.get("content_type"),
            guesser=(cfg.extra or {}).get("charset_guesser", ""),
        )
        decoded = charsetf.to_utf8(raw, cs)
        charset_ok = decoded is not None
        transcript = decoded if decoded is not None else ""
    else:
        cs, cs_pos = "UTF-8", charsetf.CHARSET_POS_VALID
        charset_ok = True

    lang, lang_pos = langid.detect_lang(transcript, charset=cs)
    metrics = quality.compute_metrics(transcript)
    keep, drop_reason, label = keepdrop.decide(
        transcript,
        lang,
        metrics,
        codec_ok=codec_ok,
        charset_ok=charset_ok,
        min_quality_score=cfg.min_quality_score,
    )

    if keep and cfg.audio_gates:
        from .stages.multimodal import audio_gate_decision

        ok, reason = audio_gate_decision(
            row.get(cfg.bytes_col), row.get(cfg.codec_col) or "",
            row.get("sr_hz") or 0, row.get("dur_ms") or 0, transcript,
            min_rms=cfg.min_audio_rms, min_wps=cfg.min_wps, max_wps=cfg.max_wps,
        )
        if not ok:
            keep, drop_reason = False, reason

    if keep or cfg.scrub_dropped:
        scrubbed, found = scrub.scrub_text(transcript)
        toxicity = scrub.toxicity_score(transcript)
    else:
        scrubbed, found, toxicity = "", [], 0.0

    return OracleResult(
        clip_id=row.get(cfg.id_col, ""),
        charset=cs,
        charset_pos=cs_pos,
        lang=lang,
        lang_pos=lang_pos,
        label=label,
        keep=keep,
        drop_reason=drop_reason,
        quality_score=metrics.quality_score,
        scrubbed_transcript=scrubbed,
        toxicity=toxicity,
        pii_kinds=[f["kind"] for f in found],
    )


def oracle_rows(rows, cfg: PipelineConfig = DEFAULT_CONFIG) -> list[dict]:
    return [asdict(oracle_row(r, cfg)) for r in rows]
