"""HTML → page-fields parse stage (SURVEY.md §3.1 completion).

The reference's GetNews walks a real DOM: goquery parse → remove
script/noscript/style/iframe/br/link/svg/textarea → bottom-up CEPF node
scoring → max-score node is the body (/root/reference/extract/content.go:
178-181, 281-308, 1020-1104).  Round 1 required callers to pre-extract
title/headlines/metas/script_texts; this stage closes the gap so raw-HTML
rows run end-to-end.

Implementation is a from-scratch lightweight DOM on stdlib ``html.parser``
(lxml/selectolax are absent in this environment) driving an exact
transcription of the CEPF *semantics*:

  computeInfo  (content.go:1020-1065): per-element (TextCount,
      LinkTextCount, TagCount, LinkTagCount, Density, DensitySum, PCount,
      LeafList); text leaves are space-normalised rune counts; an <a>
      element converts its whole subtree text to link text.
  computeScore (content.go:1067-1077):
      ln(sqrt(var(leaves)+1)) * DensitySum * ln(pure_text+1) * log10(P+1)
  computeVar   (content.go:1079-1104): 0 / leaf/2 / population variance.
  getContentNode (content.go:281-308): max score over all elements except
      <a> and the body node itself.
  formatContent (content.go:257-279): newline after every </p>, then
      per-line space normalisation, blank lines dropped.

The stage is a stateless ``map_batches`` chain member: parsing is pure
per-row CPU, fuses with the downstream news cascade, and the HTML payload
crosses the object store once.  At 100 TB the only knob is batch size
(HTML rows are KB–MB; keep batches small enough that batch × concurrency
fits the worker heap).
"""

from __future__ import annotations

import math
from html.parser import HTMLParser

import pyarrow as pa

from ..functions.textnorm import normalise_space

# content.go:20 ContentRemoveTags; br is removed from SCORING like the
# reference (it would inflate TagCount and deflate density ~(1+n_br)x on
# br-formatted bodies) but kept as a line separator in text rendering
REMOVE_TAGS = frozenset(
    {"script", "noscript", "style", "iframe", "link", "svg", "textarea"}
)
SCORING_REMOVE_TAGS = REMOVE_TAGS | {"br"}

_VOID_TAGS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input", "link",
     "meta", "param", "source", "track", "wbr"}
)

# block-level elements terminate a visual line in the body_text rendering
_BLOCK_TAGS = frozenset(
    {"p", "div", "section", "article", "header", "footer", "aside", "nav",
     "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol", "table", "tr",
     "blockquote", "pre", "figure", "figcaption", "main", "br", "hr"}
)


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs=None, parent=None):
        self.tag = tag
        self.attrs = dict(attrs or {})
        self.children: list = []  # _Node | str
        self.parent = parent


_MAX_DEPTH = 200  # caps every later recursive walk (Python default
# recursion limit is 1000; real pages nest < 50 deep — beyond the cap new
# elements become SIBLINGS at the cap depth instead of children, which
# degrades layout fidelity but never crashes a task)


class _TreeBuilder(HTMLParser):
    """Tolerant tree builder: mis-nested close tags pop to the nearest
    matching open element (browsers' adoption-agency lite); nesting is
    capped at _MAX_DEPTH."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root")
        self.stack = [self.root]

    # HTML5 implied end tags (subset): an opening tag auto-closes these
    # still-open elements, as the reference's net/html parser does — without
    # this, unclosed <p>/<li>/<tr> chains NEST and reshape the CEPF tree
    _SIBLING_CLOSERS = {
        "p": {"p"}, "li": {"li"}, "tr": {"tr", "td", "th"},
        "td": {"td", "th"}, "th": {"td", "th"}, "option": {"option"},
        "dd": {"dd", "dt"}, "dt": {"dd", "dt"},
    }
    _CLOSES_P = frozenset(
        {"address", "article", "aside", "blockquote", "div", "dl",
         "fieldset", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
         "header", "hr", "li", "dd", "dt", "main", "nav", "ol", "p", "pre",
         "section", "table", "ul"}
    )
    # "button scope" boundaries: an open <p> beyond one of these is not
    # closed by a p-closing start tag (HTML5 in-body insertion rules)
    _P_SCOPE_STOP = frozenset({"#root", "html", "body", "table", "td", "th",
                               "caption", "button"})

    def handle_starttag(self, tag, attrs):
        closes = self._SIBLING_CLOSERS.get(tag, set())
        while len(self.stack) > 1 and self.stack[-1].tag in closes:
            self.stack.pop()
        if tag in self._CLOSES_P:
            # close an open p even across unclosed INLINE elements (the
            # HTML5 'close a p element' algorithm pops until the p is
            # popped): search down to the nearest scope boundary
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag
                if t == "p":
                    del self.stack[i:]
                    break
                if t in self._P_SCOPE_STOP or t in self._CLOSES_P:
                    break
        node = _Node(tag, attrs, parent=self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID_TAGS and len(self.stack) < _MAX_DEPTH:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag, attrs, parent=self.stack[-1]))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html: str) -> _Node:
    b = _TreeBuilder()
    try:
        b.feed(html or "")
        b.close()
    except Exception:
        pass  # salvage whatever tree was built from malformed input
    return b.root


# ---------------------------------------------------------------------------
# CEPF scoring (content.go:1020-1104 semantics on the lightweight DOM)
# ---------------------------------------------------------------------------


class _CountInfo:
    __slots__ = ("text", "link_text", "tags", "link_tags", "density",
                 "density_sum", "p_count", "leaves")

    def __init__(self):
        self.text = 0
        self.link_text = 0
        self.tags = 0
        self.link_tags = 0
        self.density = 0.0
        self.density_sum = 0.0
        self.p_count = 0
        self.leaves: list[int] = []


def _compute_info(node: _Node, info_map: dict) -> _CountInfo:
    ci = _CountInfo()
    for child in node.children:
        if isinstance(child, str):
            n = len(normalise_space(child))
            ci.text += n
            ci.leaves.append(n)
        elif child.tag in SCORING_REMOVE_TAGS:
            continue  # ContentRemoveTags (incl. br) removed before scoring
        else:
            cci = _compute_info(child, info_map)
            ci.text += cci.text
            ci.link_text += cci.link_text
            ci.tags += cci.tags
            ci.link_tags += cci.link_tags
            ci.density_sum += cci.density
            ci.p_count += cci.p_count
            ci.leaves.extend(cci.leaves)
    ci.tags += 1
    if node.tag == "a":
        ci.link_text = ci.text
        ci.link_tags += 1
    elif node.tag == "p":
        ci.p_count += 1
    pure_len = ci.text - ci.link_text
    tag_len = ci.tags - ci.link_tags
    ci.density = (pure_len / tag_len) if pure_len and tag_len else 0.0
    info_map[id(node)] = (node, ci)
    return ci


def _leaf_var(leaves: list[int]) -> float:
    n = len(leaves)
    if n == 0:
        return 0.0
    if n == 1:
        return leaves[0] / 2.0
    ave = sum(leaves) / n
    return sum((x - ave) ** 2 for x in leaves) / n


def _score(ci: _CountInfo) -> float:
    value = math.sqrt(_leaf_var(ci.leaves) + 1)
    return (
        math.log(value)
        * ci.density_sum
        * math.log(ci.text - ci.link_text + 1)
        * math.log10(ci.p_count + 1)
    )


def _find_first(node: _Node, tag: str) -> _Node | None:
    for child in node.children:
        if isinstance(child, _Node):
            if child.tag == tag:
                return child
            found = _find_first(child, tag)
            if found is not None:
                return found
    return None


def content_node(root: _Node) -> tuple[_Node | None, float]:
    """Max-CEPF-score element under <body> (content.go:281-308); skips <a>
    and the body node itself.  Falls back to the whole tree when no <body>
    exists (fragment input)."""
    body = _find_first(root, "body") or root
    info_map: dict = {}
    _compute_info(body, info_map)
    best, best_score = None, 0.0
    for node, ci in info_map.values():
        if node is body or node.tag == "a":
            continue
        s = _score(ci)
        if s > best_score:
            best, best_score = node, s
    return best, best_score


def _render_text(node: _Node, parts: list[str], p_breaks: bool) -> None:
    """Collect visible text; block-level close emits a newline (the
    formatContent '</p>\\n' analog generalised to block tags for
    body_text)."""
    for child in node.children:
        if isinstance(child, str):
            parts.append(child)
        elif child.tag in REMOVE_TAGS:
            continue
        else:
            _render_text(child, parts, p_breaks)
            if (child.tag == "p") if p_breaks else (child.tag in _BLOCK_TAGS):
                parts.append("\n")


def node_text(node: _Node, p_breaks: bool = False) -> str:
    """formatContent (content.go:257-279): text with newlines at block
    boundaries, each line space-normalised, blanks dropped."""
    parts: list[str] = []
    _render_text(node, parts, p_breaks)
    lines = [normalise_space(ln) for ln in "".join(parts).split("\n")]
    return "\n".join(ln for ln in lines if ln)


# ---------------------------------------------------------------------------
# Field extraction (the inputs pipelines/news.extract_news_row expects)
# ---------------------------------------------------------------------------


def _walk(node: _Node):
    for child in node.children:
        if isinstance(child, _Node):
            yield child
            yield from _walk(child)


def parse_page_fields(html: str) -> dict:
    """One raw-HTML string → the page-field dict the news cascade consumes
    (title, headlines, metas, meta_titles, script_texts, meta_lang, charset,
    time_attr, body_text, content, content_score)."""
    root = parse_html(html)

    title = ""
    headlines: list[str] = []
    metas: list[tuple[str, str, str]] = []
    meta_titles: list[str] = []
    script_texts: list[str] = []
    html_lang = ""
    meta_http_lang = ""
    charset = ""
    time_attr = ""
    saw_time_tag = False

    for node in _walk(root):
        tag = node.tag
        if tag == "title" and not title:
            title = normalise_space(
                "".join(c for c in node.children if isinstance(c, str))
            )
        elif tag in ("h1", "h2", "h3"):
            t = node_text(node)
            if t:
                headlines.append(normalise_space(t))
        elif tag == "meta":
            name = (node.attrs.get("name") or "").strip()
            prop = (node.attrs.get("property") or "").strip()
            content = (node.attrs.get("content") or "").strip()
            if node.attrs.get("charset"):
                charset = node.attrs["charset"].strip()
            if (node.attrs.get("http-equiv") or "").lower() == "content-language":
                meta_http_lang = meta_http_lang or content
            if name or prop or content:
                metas.append((name, prop, content))
            key = (name or prop).lower()
            if key in ("og:title", "twitter:title") and content:
                meta_titles.append(content)
        elif tag == "script":
            text = "".join(c for c in node.children if isinstance(c, str))
            if text.strip():
                script_texts.append(text)
        elif tag == "html" and not html_lang:
            html_lang = (node.attrs.get("lang") or "").strip()
        elif tag == "time" and not saw_time_tag:
            # reference getTimeByTag inspects only the FIRST time tag and
            # gives up if its datetime is empty (content.go:593-600)
            saw_time_tag = True
            time_attr = (node.attrs.get("datetime") or "").strip()

    body = _find_first(root, "body") or root
    body_text = node_text(body)
    cnode, score = content_node(root)
    content = node_text(cnode, p_breaks=True) if cnode is not None else ""

    return {
        "title": title,
        "headlines": headlines,
        "metas": metas,
        "meta_titles": meta_titles,
        "script_texts": script_texts,
        "meta_lang": html_lang or meta_http_lang,
        "charset": _canon_charset(charset),
        "time_attr": time_attr,
        "body_text": body_text,
        "content": content,
        "content_score": score,
    }


def _canon_charset(cs: str) -> str:
    """The reference's charset detection emits canonical upper-case names
    (charset.go); the lang cascade string-matches on them (lang.go UTF
    prefix check), so normalise here."""
    return (cs or "UTF-8").strip().upper()


def parse_html_stage(ds, html_col: str = "html", id_col: str = "page_id"):
    """Dataset[{id_col, html_col, ...}] → Dataset of parsed page-field rows
    (id passthrough + url when present).  Stateless; fuses with the
    downstream extract_news chain."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        urls = (
            batch.column("url").to_pylist()
            if "url" in batch.schema.names
            else [""] * len(ids)
        )
        parsed = [parse_page_fields(h or "") for h in batch.column(html_col).to_pylist()]
        return pa.table(
            {
                id_col: pa.array(ids, pa.string()),
                "url": pa.array(urls, pa.string()),
                "title": pa.array([p["title"] for p in parsed], pa.string()),
                "headlines": pa.array([p["headlines"] for p in parsed], pa.list_(pa.string())),
                "metas": pa.array(
                    [[{"name": n, "property": pr, "content": c} for n, pr, c in p["metas"]]
                     for p in parsed],
                    pa.list_(pa.struct([("name", pa.string()), ("property", pa.string()),
                                        ("content", pa.string())])),
                ),
                "meta_titles": pa.array([p["meta_titles"] for p in parsed], pa.list_(pa.string())),
                "script_texts": pa.array([p["script_texts"] for p in parsed], pa.list_(pa.string())),
                "meta_lang": pa.array([p["meta_lang"] for p in parsed], pa.string()),
                "charset": pa.array([p["charset"] for p in parsed], pa.string()),
                "time_attr": pa.array([p["time_attr"] for p in parsed], pa.string()),
                "body_text": pa.array([p["body_text"] for p in parsed], pa.string()),
                "content": pa.array([p["content"] for p in parsed], pa.string()),
                "content_score": pa.array([p["content_score"] for p in parsed], pa.float64()),
            }
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow", zero_copy_batch=True)
