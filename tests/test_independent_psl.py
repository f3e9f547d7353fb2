"""Independent public-suffix matcher — a second implementation of the PSL
algorithm (publicsuffix.org/list/ spec wording), with its own parser of the
same embedded list, diffed against functions/domains.public_suffix /
domain_top.  The engine walks candidate suffixes of the host against rule
dicts; this twin walks the RULES against the host (right-to-left label
match with '*'), collects every match, and applies the spec's prevailing
rule: an exception rule wins outright, else the rule with the most labels,
else the implicit '*' default.  Hosts are constructed from the list itself
(every k-th rule, exact/wildcard/exception/private alike), so list updates
keep the diff honest."""

import os

import pytest

DAT = os.path.join(os.path.dirname(__file__), os.pardir,
                   "spiderray", "data", "public_suffix_list.dat")


def _parse_rules():
    """Own parser: comments/blank stripped, ICANN/private tracked, rules
    kept as (labels_tuple, is_exception, icann); unicode rules also stored
    in IDNA form (the list mixes both; hosts arrive in either)."""
    rules = []
    in_icann = False
    with open(DAT, encoding="utf-8") as f:
        for line in f:
            s = line.strip()
            if not s:
                continue
            if s.startswith("//"):
                if "===BEGIN ICANN DOMAINS===" in s:
                    in_icann = True
                elif "===END ICANN DOMAINS===" in s:
                    in_icann = False
                continue
            s = s.split()[0]
            forms = {s}
            if not s.isascii():
                try:
                    forms.add(s.encode("idna").decode("ascii"))
                except (UnicodeError, UnicodeDecodeError):
                    pass
            for r in forms:
                exc = r.startswith("!")
                if exc:
                    r = r[1:]
                rules.append((tuple(r.split(".")), exc, in_icann))
    return rules


_RULES = _parse_rules()


def _rule_matches(rule_labels, host_labels):
    if len(rule_labels) > len(host_labels):
        return False
    for rl, hl in zip(reversed(rule_labels), reversed(host_labels)):
        if rl != "*" and rl != hl:
            return False
    return True


def ind_public_suffix(host):
    """-> (suffix, icann) per the spec's prevailing-rule wording."""
    labels = host.lower().split(".")
    matches = [(r, exc, icann) for r, exc, icann in _RULES
               if _rule_matches(r, labels)]
    exceptions = [m for m in matches if m[1]]
    if exceptions:
        r, _, icann = exceptions[0]
        take = len(r) - 1  # exception: suffix = rule minus leftmost label
        return ".".join(labels[len(labels) - take:]), icann
    if not matches:
        return labels[-1], False  # implicit '*' default
    r, _, icann = max(matches, key=lambda m: len(m[0]))
    take = len(r)
    return ".".join(labels[len(labels) - take:]), icann


def ind_domain_top(host):
    host = host.strip().strip(".").lower()
    if not host:
        return ""
    suffix, _ = ind_public_suffix(host)
    if host == suffix:
        return ""
    prefix = host[: -(len(suffix) + 1)]
    return f"{prefix.split('.')[-1]}.{suffix}"


def _constructed_hosts():
    hosts = []
    for i, (r, exc, _ic) in enumerate(_RULES):
        if i % 97 and not exc:  # all exceptions + every 97th other rule
            continue
        concrete = [lb if lb != "*" else "foolabel" for lb in r]
        base = ".".join(concrete)
        hosts.append(base)                      # bare suffix (or exc host)
        hosts.append("example." + base)
        hosts.append("www.example." + base)
    hosts += [
        "example.com", "www.example.co.uk", "a.b.ide.kyoto.jp",
        "city.kawasaki.jp", "example.city.kawasaki.jp",  # jp exception
        "foo.bar.nosuchtld", "singlelabel", "x.github.io",
        "deep.sub.s3.amazonaws.com",
    ]
    return hosts


class TestPslVsIndependent:
    def test_rule_count_sane(self):
        assert len(_RULES) > 5000  # the full published list, not a stub

    def test_public_suffix_matches_engine(self):
        from spiderray.functions.domains import public_suffix

        mism = []
        for h in _constructed_hosts():
            got = public_suffix(h.lower())
            exp = ind_public_suffix(h)
            if got != exp:
                mism.append((h, got, exp))
        assert not mism, (len(mism), mism[:10])

    def test_domain_top_matches_engine(self):
        from spiderray.functions.domains import domain_top

        mism = []
        for h in _constructed_hosts():
            got = domain_top(h)
            exp = ind_domain_top(h)
            if got != exp:
                mism.append((h, got, exp))
        assert not mism, (len(mism), mism[:10])
