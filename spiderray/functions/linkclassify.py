"""Link classification + per-page corpus-statistics relabel — the pure spec
of /root/reference/extract/link.go (LinkTypes / linkTypePathProcess /
linkClean), shared by the Ray pipeline (groupby(page_id).map_groups) and the
test oracle.

Label strings: content / list / unknown / none (LinkType, link.go:14-17).
"""

from __future__ import annotations

from urllib.parse import urlparse

from . import keepdrop, langid, textnorm, urlfilter
from .domains import domain_top

LABELS = (keepdrop.LABEL_NONE, keepdrop.LABEL_CONTENT, keepdrop.LABEL_LIST, keepdrop.LABEL_UNKNOWN)


def page_lang_from_links(titles: list[str]) -> tuple[str, str]:
    """bodyTextForLang listMode clone (/root/reference/lang.go:360-376):
    concatenate the first <=64 anchor texts (goquery .Text() joins with no
    separator), require >= 16 anchors, abort on the {{...}} dynamic-render
    guard, then run the language cascade on the joined text."""
    if len(titles) < 16:
        return "", ""
    text = "".join(titles[:64])
    if text.count("{") >= 5 and text.count("}") >= 5:
        return "", ""
    return langid.lang_from_text(text)


def dedup_longest_title(links: list[tuple[str, str]]) -> dict[str, str]:
    """WebLinkTitles tmpLinks dedup: same URL keeps the LONGEST title —
    byte length, matching Go len() (extract/web.go:213-220)."""
    out: dict[str, str] = {}
    for url, title in links:
        url = textnorm.remove_lines(url).strip()
        title = textnorm.normalise_space(title).strip()
        if not url or not title:
            continue
        old = out.get(url)
        if old is None or len(old.encode("utf-8")) < len(title.encode("utf-8")):
            out[url] = title
    return out


def classify_link(url: str, title: str, lang: str) -> str:
    """LinkIsContentByTitle clone (link.go:276-364): URL gates then the
    title-rules (shared with keepdrop.classify_text)."""
    if len(url) > 255:
        return keepdrop.LABEL_NONE
    path = urlparse(url).path
    if urlfilter.is_default_path(path):
        return keepdrop.LABEL_NONE
    return keepdrop.classify_text(title, lang)


def match_rules(url: str, rules: dict[str, list[str]] | None) -> bool:
    """LinkIsContentByRegex clone (link.go:255-274): hostname rules first,
    eTLD+1 fallback, first regex match wins."""
    import re

    if not rules:
        return False
    host = urlparse(url).hostname or ""
    key = host if host in rules else domain_top(host)
    for pattern in rules.get(key, []):
        if re.search(pattern, url):
            return True
    return False


def page_link_types(
    link_titles: dict[str, str],
    lang: str,
    rules: dict[str, list[str]] | None = None,
) -> tuple[dict[str, str], set[str]]:
    """LinkTypes clone (link.go:62-137): classify every link of ONE page
    while accumulating the page's content-path statistics, run the
    path-feature relabel (G1-G3) and the zh blacklist clean.  Returns
    (url → label, subdomains)."""
    labels: dict[str, str] = {}
    sub_domains: set[str] = set()
    content_publish_count = 0
    content_top_paths: dict[str, int] = {}

    for url, title in link_titles.items():
        parsed = urlparse(url)
        host = parsed.hostname or ""
        top = domain_top(host)
        if host and host != top:
            sub_domains.add(host)

        if rules is None:
            label = classify_link(url, title, lang)
            labels[url] = label
            if label == keepdrop.LABEL_CONTENT:
                if urlfilter.has_publish_date_path(parsed.path):
                    content_publish_count += 1
                seg = urlfilter.first_path_segment(parsed.path)
                if seg:
                    content_top_paths[seg] = content_top_paths.get(seg, 0) + 1
        else:
            if match_rules(url, rules):
                labels[url] = keepdrop.LABEL_CONTENT
            elif urlfilter.is_default_path(parsed.path):
                labels[url] = keepdrop.LABEL_NONE
            else:
                labels[url] = keepdrop.LABEL_LIST

    if rules is None:
        labels = _path_process(labels, link_titles, content_top_paths, content_publish_count)
    labels = _clean(labels, link_titles, lang)
    return labels, sub_domains


def _path_process(
    labels: dict[str, str],
    titles: dict[str, str],
    content_top_paths: dict[str, int],
    content_publish_count: int,
) -> dict[str, str]:
    """linkTypePathProcess clone (link.go:155-253)."""
    content = [u for u, l in labels.items() if l == keepdrop.LABEL_CONTENT]
    content_count = len(content)
    publish_prob = content_publish_count / content_count if content_count else 0.0

    top_paths: list[str] = []
    if content_count >= 8:
        for seg, stat in content_top_paths.items():
            if stat > 1 and stat / content_count > 0.4:
                top_paths.append(seg)

    if publish_prob > 0.7:
        for url, label in list(labels.items()):
            if label == keepdrop.LABEL_LIST:
                if urlfilter.has_publish_date_path(urlparse(url).path):
                    if len(titles[url]) >= 2:
                        labels[url] = keepdrop.LABEL_CONTENT
            elif label == keepdrop.LABEL_UNKNOWN:
                if urlfilter.has_publish_date_path(urlparse(url).path):
                    labels[url] = (
                        keepdrop.LABEL_CONTENT if len(titles[url]) >= 2 else keepdrop.LABEL_LIST
                    )
                else:
                    labels[url] = keepdrop.LABEL_LIST
    elif top_paths:
        for url, label in list(labels.items()):
            if label == keepdrop.LABEL_UNKNOWN:
                seg_list = textnorm.split_trim(urlfilter.path_dir(urlparse(url).path), "/")
                if seg_list:
                    seg = seg_list[0]
                    if seg in top_paths:
                        labels[url] = (
                            keepdrop.LABEL_CONTENT if len(titles[url]) >= 2 else keepdrop.LABEL_LIST
                        )
                    else:
                        labels[url] = keepdrop.LABEL_LIST

    # demote path-less Content → Unknown (link.go:239-250)
    if content_count and (publish_prob > 0.7 or top_paths):
        for url, label in list(labels.items()):
            if label == keepdrop.LABEL_CONTENT:
                p = urlparse(url).path.strip()
                segs = textnorm.split_trim(urlfilter.path_dir(p), "/")
                if p in ("", "/") or not segs:
                    labels[url] = keepdrop.LABEL_UNKNOWN
    return labels


def _clean(labels: dict[str, str], titles: dict[str, str], lang: str) -> dict[str, str]:
    """linkClean clone (link.go:139-153): zh licence blacklist demotes
    Content → None."""
    if lang == "zh":
        for url, label in list(labels.items()):
            if label == keepdrop.LABEL_CONTENT and keepdrop.RE_TITLE_ZH_BLACK.search(titles[url]):
                labels[url] = keepdrop.LABEL_NONE
    return labels
