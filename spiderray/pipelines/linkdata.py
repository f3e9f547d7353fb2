"""GetLinkData as a Ray pipeline (SURVEY.md §3.2) — the reference's only
map→aggregate→map-again dataflow (/root/reference/spider.go:115-159,
extract/link.go:62-253).

Shape: the per-page statistics feedback (G1-G3) is page-local, so the
pipeline co-locates each page's links with ``groupby(page_id).map_groups``
(shuffle key = page_id; pages are small and numerous → uniform).  The pure
per-page function lives in functions/linkclassify.py and doubles as the test
oracle.  A second, separate aggregate produces the per-page summary counts
(G4: len(Content), len(List) into DomainRes, detect.go:236-237) by combining
tiny per-batch partials — only counters shuffle there.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.arrowutil import pa_from_pandas

from ..functions import linkclassify


def harvest_links(ds, strict_domain: bool = True):
    """WebLinkTitles harvest+filter (M11/M12, /root/reference/extract/
    web.go:187-239): resolve each link against its page's base URL, apply
    the filterUrl rejection cascade, and emit accepted rows (with the
    resolved absolute URL) plus a ``filter_reason`` column for rejects —
    the Filters map analog.  Input rows: (page_id = base url, url, title
    [, lang])."""
    import pyarrow as pa

    from ..functions.urlfilter import filter_url

    def per_batch(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out = {k: [] for k in ("page_id", "url", "title", "lang", "filter_reason")}
        for r in rows:
            resolved, reason = filter_url(r["url"], r["page_id"], strict_domain)
            out["page_id"].append(r["page_id"])
            out["url"].append(resolved)
            out["title"].append(r.get("title", ""))
            out["lang"].append(r.get("lang", "") or "")
            out["filter_reason"].append(reason)
        return pa.table({k: pa.array(v, pa.string()) for k, v in out.items()})

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def accepted_links(harvested_ds):
    """The accepted side of the harvest (filter_reason == '')."""
    import pyarrow.compute as pc

    return harvested_ds.map_batches(
        lambda t: t.filter(pc.equal(t["filter_reason"], "")),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def classify_pages(ds, rules: dict[str, list[str]] | None = None):
    """links Dataset (page_id, url, title, lang) → one row per link with the
    final label after per-page relabel + blacklist clean."""

    def per_page(g: pd.DataFrame) -> pd.DataFrame:
        link_titles = linkclassify.dedup_longest_title(
            list(zip(g["url"].tolist(), g["title"].tolist()))
        )
        lang = g["lang"].iloc[0] if "lang" in g.columns else ""
        if not lang:
            # listMode auto-detection from the anchor texts (lang.go:360-376)
            lang, _ = linkclassify.page_lang_from_links(list(link_titles.values()))
        labels, subs = linkclassify.page_link_types(link_titles, lang, rules)
        return pd.DataFrame(
            {
                "page_id": g["page_id"].iloc[0],
                "url": list(labels.keys()),
                "title": [link_titles[u] for u in labels],
                "label": list(labels.values()),
                "is_subdomain": [
                    (pd.NA if not u else (urlhost(u) in subs)) for u in labels
                ],
            }
        )

    return ds.groupby("page_id").map_groups(per_page, batch_format="pandas")


def urlhost(url: str) -> str:
    from urllib.parse import urlparse

    return urlparse(url).hostname or ""


def page_summaries(classified_ds):
    """Per-page label counts (the LinkData/DomainRes summary, G4): partial
    per-batch combine → small groupby; only counters move."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        pv = (
            df.pivot_table(
                index="page_id", columns="label", values="url", aggfunc="count", fill_value=0
            )
            .reset_index()
        )
        for lbl in ("content", "list", "unknown", "none"):
            if lbl not in pv.columns:
                pv[lbl] = 0
        pv = pv[["page_id", "content", "list", "unknown", "none"]]
        pv.columns = ["page_id", "n_content", "n_list", "n_unknown", "n_none"]
        return pa_from_pandas(pv)

    return (
        classified_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("page_id")
        .aggregate(
            Sum("n_content", alias_name="n_content"),
            Sum("n_list", alias_name="n_list"),
            Sum("n_unknown", alias_name="n_unknown"),
            Sum("n_none", alias_name="n_none"),
        )
    )
