"""Charset detection / normalization stage (M1–M5).

For the standard clip schema the transcript is already a UTF-8 Arrow string —
the stage appends constant ``charset='UTF-8', charset_pos='valid'`` columns
(the utf8.Valid(body) short-circuit of /root/reference/charset.go:43-48,
vectorized to a no-op).  When ``cfg.raw_text_col`` names a binary column of
undecoded text the full cascade runs per row: detect (header/html/guess) →
transcode → ``transcript`` + ``charset_ok``.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import PipelineConfig
from ..functions import charset as charsetf


def _decode_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    guesser = (cfg.extra or {}).get("charset_guesser", "")
    raws = batch.column(cfg.raw_text_col).to_pylist()
    ctypes = (
        batch.column("content_type").to_pylist()
        if "content_type" in batch.column_names
        else [None] * len(raws)
    )
    charsets, poss, texts, oks = [], [], [], []
    for raw, ctype in zip(raws, ctypes):
        if raw is None:
            charsets.append("")
            poss.append("")
            texts.append("")
            oks.append(False)
            continue
        cs, pos = charsetf.detect_charset(raw, ctype, guesser=guesser)
        decoded = charsetf.to_utf8(raw, cs)
        charsets.append(cs)
        poss.append(pos)
        texts.append(decoded if decoded is not None else "")
        oks.append(decoded is not None)
    out = batch.append_column("charset", pa.array(charsets, pa.string()))
    out = out.append_column("charset_pos", pa.array(poss, pa.string()))
    out = out.append_column("charset_ok", pa.array(oks, pa.bool_()))
    if cfg.text_col in out.column_names:
        out = out.set_column(
            out.column_names.index(cfg.text_col), cfg.text_col, pa.array(texts, pa.string())
        )
    else:
        out = out.append_column(cfg.text_col, pa.array(texts, pa.string()))
    return out


def _mark_utf8(batch: pa.Table) -> pa.Table:
    n = len(batch)
    batch = batch.append_column("charset", pa.array(["UTF-8"] * n, pa.string()))
    batch = batch.append_column(
        "charset_pos", pa.array([charsetf.CHARSET_POS_VALID] * n, pa.string())
    )
    return batch.append_column("charset_ok", pa.array([True] * n, pa.bool_()))


def charset_stage(ds, cfg: PipelineConfig):
    if cfg.raw_text_col:
        return ds.map_batches(
            lambda b: _decode_batch(b, cfg),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.batch_size,
        )
    return ds.map_batches(
        _mark_utf8, batch_format="pyarrow", zero_copy_batch=True, batch_size=cfg.batch_size
    )
