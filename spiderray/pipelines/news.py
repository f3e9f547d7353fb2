"""GetNews as a per-record composite (SURVEY.md §3.1, the reference's
marquee path /root/reference/spider.go:207-263 → extract/content.go
ExtractNews): title cascade + publish-time cascade + language + quality
score for one page-shaped record, vectorized over batches.

Input records are DOM-free page rows (the fields a parse stage would have
extracted): title/raw body text, headline candidates, meta tuples, script
texts, URL.  Output mirrors the ``News`` struct (content.go:117-136):
(title, title_pos, time, time_pos, time_local, lang, lang_pos,
content, quality_score).
"""

from __future__ import annotations

import pyarrow as pa

from ..config import PipelineConfig
from ..functions import langid, newsdate, quality, textnorm, titlecascade


def extract_news_row(
    row: dict,
    now: float | None = None,
) -> dict:
    """One page record → News-shaped dict.  Recognized optional fields:
    origin_title, title, body_text, headlines (list), meta_titles (list),
    metas (list of (name, property, content)), script_texts (list),
    time_attr, url, charset, meta_lang."""
    body = row.get("body_text") or ""
    charset = row.get("charset") or "UTF-8"

    # metas may arrive as Arrow structs (dicts) from the htmlparse stage or
    # as (name, property, content) tuples from field-shaped input
    metas = row.get("metas") or []
    if metas and isinstance(metas[0], dict):
        metas = [
            (m.get("name", ""), m.get("property", ""), m.get("content", ""))
            for m in metas
        ]

    lang, lang_pos = langid.detect_lang(
        body,
        charset=charset,
        title=row.get("title"),
        meta_lang=row.get("meta_lang"),
    )

    title, title_pos = titlecascade.choose_title(
        lang=lang,
        origin_title=row.get("origin_title") or "",
        raw_title=row.get("title") or "",
        headlines=row.get("headlines") or [],
        meta_titles=row.get("meta_titles") or [],
        script_texts=row.get("script_texts") or [],
        selector_title=row.get("selector_title") or "",
        body_texts=row.get("body_texts") or [],
    )

    raw_time, time_pos, time_fmt = newsdate.extract_time(
        lang=lang,
        body_text=body,
        metas=metas,
        time_attr=row.get("time_attr") or "",
        script_texts=row.get("script_texts"),
        url=row.get("url") or "",
        title=title,
        title_pos=title_pos,
        now=now,
    )
    ts = newsdate.str_to_time(time_fmt, now) if time_fmt else 0.0
    import time as _t

    time_local = _t.strftime("%Y-%m-%d %H:%M:%S", _t.localtime(ts)) if ts > 0 else ""

    # prefer the CEPF-extracted content node text (htmlparse stage) over
    # the whole body — the reference formats the content node only
    # (content.go:205-209)
    content = textnorm.format_content(row.get("content") or body)
    metrics = quality.compute_metrics(content)

    return {
        "title": title,
        "title_pos": title_pos,
        "time": raw_time,
        "time_pos": time_pos,
        "time_local": time_local,
        "lang": lang,
        "lang_pos": lang_pos,
        "content": content,
        "quality_score": metrics.quality_score,
    }


def extract_news(pages_ds, cfg: PipelineConfig | None = None, now: float | None = None):
    """Batch stage over page records → News rows (one in ≙ one out)."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out = [extract_news_row(r, now) for r in rows]
        result = {"page_id": [r.get("page_id", "") for r in rows]}
        for key in ("title", "title_pos", "time", "time_pos", "time_local",
                    "lang", "lang_pos", "content"):
            result[key] = [o[key] for o in out]
        result["quality_score"] = [o["quality_score"] for o in out]
        return pa.table(
            {
                **{k: pa.array(v, pa.string()) for k, v in result.items() if k != "quality_score"},
                "quality_score": pa.array(result["quality_score"], pa.float64()),
            }
        )

    return pages_ds.map_batches(batch_fn, batch_format="pyarrow", zero_copy_batch=True)


def get_news_from_html(ds, cfg: PipelineConfig | None = None, now: float | None = None,
                       html_col: str = "html", id_col: str = "page_id"):
    """GetNews end-to-end from RAW HTML rows (the reference flagship,
    /root/reference/spider.go:207-263): parse stage (DOM build + CEPF
    content-node scoring, stages/htmlparse.py) → news cascade.  Both stages
    are stateless map_batches and fuse into one chain."""
    from ..stages.htmlparse import parse_html_stage

    return extract_news(parse_html_stage(ds, html_col=html_col, id_col=id_col), cfg, now)
