"""Reference-shaped convenience API — the entry points a go-pkg-spider user
would look for, mapped onto the engine (SURVEY.md §3 top-3 entry points):

    GetNews        (/root/reference/spider.go:162-179)  → get_news
    GetLinkData    (/root/reference/spider.go:35-52)    → get_link_data
    DetectDomain   (/root/reference/detect.go:55-74)    → detect_domain
    NewNewsSpider  (/root/reference/spider_news.go:53)  → news_spider

Single-record calls take the page-shaped dict a parse stage produces (no
HTTP layer: rows are immutable table records, SURVEY §2.1 S1/S4); the
``*_ds`` variants run the same semantics as Ray pipelines.
"""

from __future__ import annotations

from .functions import linkclassify
from .pipelines.crawl import CrawlResult, crawl
from .pipelines.detect_domain import enrich_domains
from .pipelines.linkdata import classify_pages, harvest_links, page_summaries
from .pipelines.news import extract_news, extract_news_row


def get_news(page: dict, now: float | None = None) -> dict:
    """One page record → News-shaped dict (title/time/lang/content/score)."""
    return extract_news_row(page, now=now)


def get_news_ds(pages_ds, now: float | None = None):
    return extract_news(pages_ds, now=now)


def get_link_data(
    links: list[tuple[str, str]],
    lang: str = "",
    rules: dict[str, list[str]] | None = None,
) -> dict:
    """One page's (url, title) pairs → LinkData-shaped dict: the 4-way
    partition (content/list/unknown/none maps) + subdomains."""
    link_titles = linkclassify.dedup_longest_title(links)
    if not lang:
        lang, _ = linkclassify.page_lang_from_links(list(link_titles.values()))
    labels, subs = linkclassify.page_link_types(link_titles, lang, rules)
    out: dict = {"content": {}, "list": {}, "unknown": {}, "none": {},
                 "sub_domains": sorted(subs), "lang": lang}
    for url, label in labels.items():
        out[label][url] = link_titles[url]
    return out


def get_link_data_ds(links_ds, rules: dict[str, list[str]] | None = None):
    """links Dataset (page_id, url, title[, lang]) → per-link labels +
    per-page summary counts."""
    classified = classify_pages(links_ds, rules)
    return classified, page_summaries(classified)


def detect_domain(page: dict, link_counts: dict | None = None) -> dict:
    """One domain-page record → DomainRes-shaped dict."""
    import ray.data as rd

    out = enrich_domains(rd.from_items([page]), link_counts).take(1)
    return out[0]


def detect_domain_ds(pages_ds, link_counts: dict | None = None):
    return enrich_domains(pages_ds, link_counts)


def news_spider(pages_ds, seed_urls: list[str], depth: int = 2) -> CrawlResult:
    """BFS crawl over a pages table (the NewsSpider waves, race-free)."""
    return crawl(pages_ds, seed_urls, depth)


__all__ = [
    "get_news", "get_news_ds", "get_link_data", "get_link_data_ds",
    "detect_domain", "detect_domain_ds", "news_spider", "harvest_links",
]
