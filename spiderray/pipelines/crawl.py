"""NewsSpider BFS crawl as an iterative frontier loop (SURVEY.md §3.4;
/root/reference/spider_news.go:140-292).

The reference spawns a goroutine per page and shares an UNSYNCHRONIZED
``seen`` map across all of them (spider_news.go:15, 163-166 — a latent data
race).  Here each depth wave is one Ray Data pass:

    frontier(urls) → semi-join against the pages table (broadcast frontier)
    → per-page link classification (groupby(page_id).map_groups, the
    linkdata pipeline) → content links accumulate as results, list links
    minus ``seen`` become the next frontier.

``seen`` is driver-side state between waves (frontiers are small relative to
the corpus); at cluster scale the anti-join runs as a broadcast set / Bloom
filter inside map_batches — which is exactly how it is expressed here, so
the scale-out change is only WHERE the set lives.  No fetches exist: the
"web" is a pages table (url, lang, links list), the table-scan analog of the
crawler's HTTP layer (SURVEY.md §2.1 S1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

import ray

from ..functions import keepdrop


@dataclass
class CrawlResult:
    content: dict[str, str] = field(default_factory=dict)  # url → title
    pages_visited: list[str] = field(default_factory=list)
    waves: int = 0


def crawl(pages_ds, seed_urls: list[str], depth: int = 2, strict_host: str | None = None) -> CrawlResult:
    """BFS over the pages table.  ``pages_ds`` schema: (url:string,
    lang:string, links:list<struct<url:string,title:string>>)."""
    from .linkdata import classify_pages

    seen: set[str] = set(seed_urls)
    frontier: list[str] = list(seed_urls)
    result = CrawlResult()

    for _ in range(depth):
        if not frontier:
            break
        result.waves += 1
        frontier_ref = ray.put(set(frontier))

        def in_frontier(batch: pa.Table) -> pa.Table:
            want = ray.get(frontier_ref)
            mask = [u in want for u in batch.column("url").to_pylist()]
            return batch.filter(pa.array(mask))

        wave_pages = pages_ds.map_batches(
            in_frontier, batch_format="pyarrow", zero_copy_batch=True
        )

        # explode links → (page_id, url, title, lang) rows for classification
        def explode(batch: pa.Table) -> pa.Table:
            pids, urls, titles, langs = [], [], [], []
            for row in batch.to_pylist():
                for link in row["links"] or []:
                    pids.append(row["url"])
                    urls.append(link["url"])
                    titles.append(link["title"])
                    langs.append(row["lang"])
            return pa.table(
                {
                    "page_id": pa.array(pids, pa.string()),
                    "url": pa.array(urls, pa.string()),
                    "title": pa.array(titles, pa.string()),
                    "lang": pa.array(langs, pa.string()),
                }
            )

        links = wave_pages.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        classified = classify_pages(links).to_pandas()
        if classified.empty:
            # frontier matched no pages (or pages had no links): Ray's
            # to_pandas drops columns on 0-row datasets, so bail before
            # touching them
            frontier = []
            break

        result.pages_visited.extend(sorted(set(classified["page_id"])))

        # vectorized label partition + seen-dedup (spider_news.go:163-166,
        # race-free): isin masks instead of per-row Python
        content = classified[classified["label"] == keepdrop.LABEL_CONTENT]
        content = content.drop_duplicates("url", keep="first")
        new_content = content[~content["url"].isin(result.content.keys())]
        result.content.update(dict(zip(new_content["url"], new_content["title"])))

        list_urls = classified.loc[
            classified["label"] == keepdrop.LABEL_LIST, "url"
        ].drop_duplicates()
        fresh = list_urls[~list_urls.isin(seen)]
        seen.update(fresh)
        frontier = sorted(fresh)

    return result
