"""eTLD+1 parsing + host metadata (M15/M16,
/root/reference/extract/domain.go, /root/reference/extract/meta.go).

The reference uses golang.org/x/net/publicsuffix; no network access is
available here, so a curated public-suffix snapshot is embedded (derived from
the public PSL, trimmed to ICANN suffixes covering the reference fixtures and
common TLDs).  Longest-matching-suffix semantics, like the PSL algorithm.
``DomainParse`` returns (subdomain, domain, tld) where tld is the full public
suffix (e.g. ``gov.mo`` for legismac.safp.gov.mo → safp? no:
eTLD+1 = safp.gov.mo, domain=safp, tld=gov.mo, sub=legismac).
"""

from __future__ import annotations

from dataclasses import dataclass

from .maps import HOST_GOV_COUNTRY_MAP

# ICANN public-suffix snapshot (subset).  Two-level entries override the
# one-level fallback; the PSL wildcard/exception machinery is not needed for
# this subset.
_SUFFIXES_2: frozenset[str] = frozenset({
    # cn
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "ah.cn", "bj.cn", "cq.cn", "fj.cn", "gd.cn", "gs.cn", "gz.cn", "gx.cn",
    "ha.cn", "hb.cn", "he.cn", "hi.cn", "hl.cn", "hn.cn", "jl.cn", "js.cn",
    "jx.cn", "ln.cn", "nm.cn", "nx.cn", "qh.cn", "sc.cn", "sd.cn", "sh.cn",
    "sn.cn", "sx.cn", "tj.cn", "xj.cn", "xz.cn", "yn.cn", "zj.cn",
    # uk
    "co.uk", "org.uk", "gov.uk", "ac.uk", "net.uk", "me.uk",
    # jp
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp", "gr.jp",
    # kr
    "co.kr", "or.kr", "go.kr", "ac.kr", "ne.kr", "re.kr",
    # sg / th / mo / hk / tw
    "com.sg", "gov.sg", "edu.sg", "org.sg", "net.sg", "per.sg",
    "co.th", "go.th", "or.th", "ac.th", "in.th", "net.th",
    "com.mo", "gov.mo", "org.mo", "edu.mo", "net.mo",
    "com.hk", "gov.hk", "org.hk", "edu.hk", "net.hk", "idv.hk",
    "com.tw", "gov.tw", "org.tw", "edu.tw", "net.tw", "idv.tw",
    # au / br / in / mx / nz / za
    "com.au", "gov.au", "org.au", "net.au", "edu.au", "id.au",
    "com.br", "gov.br", "org.br", "net.br", "edu.br",
    "co.in", "gov.in", "org.in", "net.in", "ac.in", "edu.in", "res.in",
    "com.mx", "gob.mx", "org.mx",
    "co.nz", "govt.nz", "org.nz", "net.nz", "ac.nz",
    "co.za", "gov.za", "org.za", "net.za", "ac.za",
    # misc seen in fixtures / common
    "or.at", "co.at", "ac.at", "gv.at",
    "com.ar", "gob.ar", "com.tr", "gov.tr", "com.ua", "gov.ua",
    "com.my", "gov.my", "com.ph", "gov.ph", "com.vn", "gov.vn",
    "com.eg", "gov.eg", "com.sa", "gov.sa", "com.pk", "gov.pk",
    "com.bd", "gov.bd", "com.np", "gov.np", "com.lk", "gov.lk",
    "co.id", "go.id", "or.id", "ac.id", "co.il", "gov.il", "org.il",
    "co.ke", "go.ke", "com.ng", "gov.ng",
})
_SUFFIXES_1: frozenset[str] = frozenset({
    "com", "net", "org", "gov", "edu", "mil", "int", "info", "biz", "name",
    "io", "ai", "co", "me", "tv", "cc", "app", "dev", "xyz", "site", "top",
    "online", "news", "pro", "mobi", "asia", "cloud", "shop", "store",
    "cn", "jp", "kr", "uk", "us", "in", "es", "ru", "de", "fr", "th", "vn",
    "sg", "au", "ca", "il", "mm", "dz", "pl", "az", "ng", "kp", "lb", "ua",
    "tr", "se", "lk", "si", "sk", "ro", "pt", "ph", "pk", "py", "np", "ma",
    "my", "lt", "ie", "iq", "ir", "id", "hu", "gr", "eg", "cz", "hr", "cl",
    "br", "bg", "be", "bd", "aw", "am", "ao", "al", "af", "sa", "nl", "it",
    "mo", "hk", "tw", "mx", "nz", "za", "ke", "ch", "at", "dk", "fi", "no",
    "eu", "is", "ee", "lv", "by", "kz", "uz", "ge", "rs", "ba", "mk", "md",
})


@dataclass
class Domain:
    subdomain: str
    domain: str
    tld: str
    icann: bool

    def top(self) -> str:
        return f"{self.domain}.{self.tld}"


def public_suffix(host: str) -> tuple[str, bool]:
    """Longest matching suffix from the snapshot; unknown last label behaves
    like the PSL's ``*`` default rule (the last label is the suffix,
    icann=False)."""
    labels = host.lower().split(".")
    if len(labels) >= 2 and ".".join(labels[-2:]) in _SUFFIXES_2:
        return ".".join(labels[-2:]), True
    if labels[-1] in _SUFFIXES_1:
        return labels[-1], True
    return labels[-1], False


def domain_parse(host: str) -> Domain | None:
    """DomainParse clone (/root/reference/extract/domain.go:35-63).  None
    when the host is blank or *is* a bare public suffix (the Go
    EffectiveTLDPlusOne errors there)."""
    host = host.strip().strip(".").lower()
    if not host:
        return None
    suffix, icann = public_suffix(host)
    if host == suffix:
        return None
    prefix = host[: -(len(suffix) + 1)]
    parts = prefix.split(".")
    dom = parts[-1]
    sub = ".".join(parts[:-1])
    return Domain(subdomain=sub, domain=dom, tld=suffix, icann=icann)


def domain_top(host: str) -> str:
    """DomainTop clone (domain.go:17-23): eTLD+1 or ''. """
    d = domain_parse(host)
    return d.top() if d else ""


def meta_from_host(host: str, lang: str) -> tuple[str, str, str]:
    """MetaFromHost clone (/root/reference/extract/meta.go:75-185) →
    (country, province, category)."""
    host = host.lower()
    d = domain_parse(host)
    if d is None:
        return "", "", ""
    tld = d.tld

    if tld == "gov":
        return "美国", "", "政务"

    for cc, zh in HOST_GOV_COUNTRY_MAP.items():
        if tld == "gov." + cc:
            province = ""
            if host.endswith(".hk") and lang == "zh":
                province = "中国香港"
            if host.endswith(".tw") and lang == "zh":
                province = "中国台湾"
            if host.endswith(".mo") and lang == "zh":
                province = "中国澳门"
            return zh, province, "政务"

    for suffix, country, province, need_lang in (
        (".hk", "中国", "中国香港", "zh"),
        (".tw", "中国", "中国台湾", "zh"),
        (".mo", "中国", "中国澳门", "zh"),
        (".cn", "中国", "", "zh"),
        (".jp", "日本", "", "ja"),
        (".kr", "韩国", "", "ko"),
        (".uk", "英国", "", "en"),
        (".us", "美国", "", "en"),
        (".in", "印度", "", "hi"),
        (".es", "西班牙", "", "es"),
        (".ru", "俄罗斯", "", "ru"),
        (".de", "德国", "", "de"),
        (".fr", "法国", "", "fr"),
    ):
        if host.endswith(suffix) and lang == need_lang:
            return country, province, ""

    return "", "", ""


def domain_top_from_url(url_str: str) -> str:
    """DomainTopFromUrl clone (/root/reference/extract/domain.go:26-32)."""
    from urllib.parse import urlparse

    try:
        host = urlparse(url_str).hostname or ""
    except ValueError:
        return ""
    return domain_top(host)
