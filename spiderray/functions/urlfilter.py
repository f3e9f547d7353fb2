"""URL harvesting filter (M11/M12, /root/reference/extract/web.go:187-302).

``filter_url`` clones the rejection cascade: illegal characters → relative
resolution against the base URL → absolute check → non-default port → IP
hostname → banned extension → off-domain under strictDomain.  Returns
(resolved_url, reason) where reason == "" means accepted — the reason strings
match the reference's error messages so the Filters map is comparable.
"""

from __future__ import annotations

import posixpath
import re
from urllib.parse import urljoin, urlparse

from . import textnorm
from .domains import domain_top

# /root/reference/extract/web.go:19-27
FILTER_URL_SUFFIX = frozenset({
    ".jpg", ".jpeg", ".png", ".gif", ".bmp", ".txt", ".xml",
    ".pdf", ".doc", ".docx", ".ppt", ".pptx", ".xls", ".xlsx",
    ".zip", ".rar", ".7z", ".gz", ".apk", ".cgi", ".exe", ".bz2", ".play",
    ".rss", ".sig", ".sgf",
    ".mp3", ".mp4", ".rm", ".rmvb", ".mov", ".ogv", ".flv",
})
INVALID_URL_CHARS = ("{", "}", "[", "]", "@", "$", "<", ">", '"')

RE_HOSTNAME_IP = re.compile(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}")  # web.go:15
RE_INDEX_SUFFIX = re.compile(r"^/index\.(html|shtml|htm|php|asp|aspx|jsp)$")  # link.go:21
RE_URL_PUBLISH_DATE = re.compile(
    r"(20[2-3]\d[/]?(0[1-9]|1[0-2]|[1-9])[/]?(0[1-9]|[1-2][0-9]|3[0-1]|[1-9])?)"
)  # link.go:19


def filter_url(link: str, base_url: str, strict_domain: bool) -> tuple[str, str]:
    """filterUrl clone (web.go:242-302)."""
    if textnorm.contains_any(link, INVALID_URL_CHARS):
        return link, "invalid url with illegal characters"

    if not (textnorm.has_prefix_case(link, "http") or textnorm.has_prefix_case(link, "https")):
        try:
            url_str = urljoin(base_url, link)
        except ValueError:
            return link, "invalid url with baseUrl parse error"
    else:
        url_str = link

    try:
        u = urlparse(url_str)
    except ValueError:
        return url_str, "invalid url with parse error"

    if not u.scheme or not u.netloc:
        return url_str, "invalid url with not absolute url"
    if u.port is not None:
        return url_str, "invalid url with not 80 port"
    host = u.hostname or ""
    if RE_HOSTNAME_IP.search(host):
        return url_str, "invalid url with ip hostname"

    ext = posixpath.splitext(u.path)[1]
    if "." in ext and ext.lower() in FILTER_URL_SUFFIX:
        return url_str, "invalid url with suffix"

    if strict_domain:
        base_host = urlparse(base_url).hostname or ""
        if domain_top(host) != domain_top(base_host):
            return url_str, "invalid url with strict domain"

    return url_str, ""


def path_dir(url_path: str) -> str:
    """path.Dir(strings.TrimSpace(path)) analog (link.go:92)."""
    p = url_path.strip()
    d = posixpath.dirname(p) if p else "."
    return d if d else "."


def path_dir_clean(p: str) -> str:
    """pathDirClean clone (link.go:366-372): strip . - _ so date separators
    collapse before the publish-date regex runs."""
    return p.replace(".", "").replace("-", "").replace("_", "")


def has_publish_date_path(url_path: str) -> bool:
    """Publish-date feature of a link's path dir (link.go:92-95)."""
    return bool(RE_URL_PUBLISH_DATE.search(path_dir_clean(path_dir(url_path))))


def first_path_segment(url_path: str) -> str:
    """First segment of the path dir (link.go:98-102); '' when none."""
    parts = textnorm.split_trim(path_dir(url_path), "/")
    return parts[0] if parts else ""


def is_default_path(url_path: str) -> bool:
    """Empty path / '/' / index.* → should be handled at domain level
    (link.go:283-286)."""
    p = url_path.strip()
    return p == "" or p == "/" or bool(RE_INDEX_SUFFIX.match(p))


# --- canonical-URL normalization (crawl-frontier / corpus URL dedup) ------

# click/campaign identifiers that never change the resource (any utm_*
# prefix is stripped too)
TRACKING_PARAMS = frozenset({
    "gclid", "fbclid", "msclkid", "igshid", "yclid", "dclid",
    "mc_cid", "mc_eid", "ref", "spm",
})

_RE_MULTI_SLASH = re.compile(r"/{2,}")


def canonicalize_url(url: str) -> str:
    """RFC 3986 §6 syntax-based normalization plus the conventions a
    crawl frontier / web-corpus dedup applies before keying: lowercase
    scheme and host, drop the fragment, drop default ports (http:80 /
    https:443), drop tracking parameters (``utm_*`` prefix +
    TRACKING_PARAMS), sort the surviving query pairs, collapse duplicate
    path slashes, strip one trailing slash (non-root), empty path → '/'.
    Unparseable input returns stripped as-is (callers key on the string
    either way).  Path CASE is preserved — paths are case-sensitive per
    RFC; only scheme/host fold."""
    from urllib.parse import parse_qsl, urlencode

    s = url.strip()
    try:
        u = urlparse(s)
    except ValueError:
        return s
    if not u.scheme or not u.netloc:
        return s
    scheme = u.scheme.lower()
    host = (u.hostname or "").lower()
    try:
        port = u.port
    except ValueError:
        port = None
    if port and not ((scheme == "http" and port == 80)
                     or (scheme == "https" and port == 443)):
        host = f"{host}:{port}"
    path = _RE_MULTI_SLASH.sub("/", u.path) or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    pairs = sorted(
        (k, v) for k, v in parse_qsl(u.query, keep_blank_values=True)
        if not k.lower().startswith("utm_")
        and k.lower() not in TRACKING_PARAMS
    )
    query = urlencode(pairs)
    return f"{scheme}://{host}{path}" + (f"?{query}" if query else "")
