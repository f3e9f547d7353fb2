"""DetectDomain as a Ray pipeline (SURVEY.md §3.3) — the fan-in enrichment
path (/root/reference/detect.go:101-254): one wide metadata record per
domain from a pages table, plus link-classification counts.

Input pages schema: (host:string, title:string, description:string,
body_text:string, meta_lang:string, charset:string).  Links counts come from
pipelines.linkdata.page_summaries keyed by page_id == host, broadcast into
the enrichment stage (small side → ray.put dict, J4 pattern).
"""

from __future__ import annotations

import pyarrow as pa

import ray

from ..config import PipelineConfig
from ..functions import langid, scrub, titleclean
from ..functions.domains import domain_parse, meta_from_host
from ..functions.textnorm import remove_lines


def enrich_domains(pages_ds, link_counts: dict | None = None, cfg: PipelineConfig | None = None):
    """pages → DomainRes-shaped rows.  ``link_counts``: host → (n_content,
    n_list) dict (broadcast once; None → zeros)."""
    counts_ref = ray.put(link_counts or {})

    def enrich(batch: pa.Table) -> pa.Table:
        counts = ray.get(counts_ref)
        hosts = batch.column("host").to_pylist()
        titles = (
            batch.column("title").to_pylist()
            if "title" in batch.column_names
            else [""] * len(hosts)
        )
        descs = (
            batch.column("description").to_pylist()
            if "description" in batch.column_names
            else [""] * len(hosts)
        )
        bodies = (
            batch.column("body_text").to_pylist()
            if "body_text" in batch.column_names
            else [""] * len(hosts)
        )
        metas = (
            batch.column("meta_lang").to_pylist()
            if "meta_lang" in batch.column_names
            else [None] * len(hosts)
        )
        charsets = (
            batch.column("charset").to_pylist()
            if "charset" in batch.column_names
            else ["UTF-8"] * len(hosts)
        )

        cols: dict[str, list] = {k: [] for k in (
            "host", "domain_top", "subdomain", "tld", "charset", "lang", "lang_pos",
            "country", "province", "category", "title", "title_clean", "description",
            "icp", "icp_province", "n_content", "n_list",
        )}
        for host, title, desc, body, meta, cs in zip(hosts, titles, descs, bodies, metas, charsets):
            d = domain_parse(host or "")
            # ICP from body text with lines/tabs/spaces stripped (icp.go:68-77)
            body_flat = remove_lines(body or "").replace("\t", "").replace(" ", "")
            icp, loc = scrub.icp_from_text(body_flat)
            lang, lang_pos = langid.detect_lang(body or "", charset=cs or "UTF-8",
                                                title=title, meta_lang=meta)
            country, province, category = meta_from_host(host or "", lang)
            if icp:  # ICP implies 中国 (detect.go:205-211 enrichment order)
                country, province = "中国", scrub.icp_province(loc) or province
            nc, nl = (counts.get(host) or (0, 0))
            cols["host"].append(host or "")
            cols["domain_top"].append(d.top() if d else "")
            cols["subdomain"].append(d.subdomain if d else "")
            cols["tld"].append(d.tld if d else "")
            cols["charset"].append(cs or "")
            cols["lang"].append(lang)
            cols["lang_pos"].append(lang_pos)
            cols["country"].append(country)
            cols["province"].append(province)
            cols["category"].append(category)
            cols["title"].append(titleclean.web_title(title or ""))
            cols["title_clean"].append(titleclean.web_title_clean(title or "", lang))
            cols["description"].append((desc or "")[:384])
            cols["icp"].append(icp)
            cols["icp_province"].append(scrub.icp_province(loc))
            cols["n_content"].append(int(nc))
            cols["n_list"].append(int(nl))
        return pa.table({k: pa.array(v) for k, v in cols.items()})

    return pages_ds.map_batches(enrich, batch_format="pyarrow", zero_copy_batch=True)
