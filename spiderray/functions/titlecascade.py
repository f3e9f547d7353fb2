"""Title extraction cascade — getTitle semantics
(/root/reference/extract/content.go:844-1018, 1142-1165) adapted from DOM
traversal to record fields: the caller supplies the candidate lists a DOM
walk would produce (h1/h2 texts in document order, og:/twitter: meta titles,
script texts, the first id/class^=title selector text, body text-node
candidates).

Order (getTitle, content.go:844-949):
  1. origin-title vs h1/h2 similarity          → pos=headline
  2. og:/twitter: meta vs cleaned <title>      → pos=meta (shorter wins)
  3. script "title" JSON field                 → pos=script
  4. h1/h2 max-similarity vs cleaned <title>   → pos=headline
  5. first id/class ^=title|$=title selector   → pos=selector
  6. best-similarity body text node            → pos=content
  7. cleaned <title> fallback                  → pos=title
Thresholds: zh 0.3 / word-langs 0.5 (content.go:71-74).
"""

from __future__ import annotations

from . import textnorm
from .newsdate import RE_SCRIPT_TITLE
from .similarity import similarity_text, title_sim_threshold
from .titleclean import web_content_title_clean, web_title


def title_by_origin(origin_title: str, headlines: list[str], lang: str) -> str:
    """getTitleByOrigin clone (content.go:812-842).  Keeps the reference's
    quirk: among candidates above threshold, the LAST one wins (the Go loop
    never updates maxScore, content.go:829-835)."""
    if not origin_title.strip():
        return ""
    sim_t = title_sim_threshold(lang)
    winner = ""
    for h in headlines:
        text = textnorm.normalise_space(h)
        if similarity_text(origin_title, text) > sim_t:
            winner = text
    return winner


def title_by_meta(meta_titles: list[str], meta_title: str, lang: str) -> str:
    """getTitleByMeta clone (content.go:987-1018): og:/twitter: titles vs the
    cleaned <title>; similar → shorter wins; no cleaned title → first."""
    titles = [t.strip() for t in meta_titles if t.strip()]
    if not titles:
        return ""
    if meta_title:
        sim_t = title_sim_threshold(lang)
        for title in titles:
            if similarity_text(title, meta_title) > sim_t:
                return title if len(title) < len(meta_title) else meta_title
        return ""
    return titles[0]


def title_by_script(script_texts: list[str], meta_title: str, lang: str) -> str:
    """getTitleByScript clone (content.go:1142-1165).  Keeps the
    reference's quirk: the ``return`` inside the goquery ``Each`` closure
    only ends that iteration, so a LATER matching script overwrites an
    earlier one — last match wins (round-5 independent-transcription
    finding; this returned the first match through round 4)."""
    sim_t = title_sim_threshold(lang)
    winner = ""
    for text in script_texts:
        flat = textnorm.remove_lines(text or "")
        m = RE_SCRIPT_TITLE.search(flat)
        if m:
            cand = m.group(1).strip()
            if similarity_text(meta_title, cand) > sim_t:
                winner = cand
    return winner


def title_by_headline_sim(headlines: list[str], meta_title: str, lang: str) -> str:
    """The h1/h2 max-similarity walk (content.go:874-925): strict-greater
    argmax → first of equals wins; must beat the threshold."""
    if not meta_title or not headlines:
        return ""
    sim_t = title_sim_threshold(lang)
    best, best_s = "", 0.0
    for h in headlines:
        text = textnorm.normalise_space(h)
        s = similarity_text(text, meta_title)
        if s > best_s:
            best, best_s = text, s
    return best if best_s > sim_t else ""


def title_by_content(body_texts: list[str], meta_title: str, lang: str) -> str:
    """getTitleByEditDistance clone (content.go:952-985): best
    above-threshold body text node, strict-greater → first of equals."""
    sim_t = title_sim_threshold(lang)
    best, best_s = "", sim_t
    for text in body_texts:
        t = textnorm.normalise_space(text)
        s = similarity_text(t, meta_title)
        if s > sim_t and s > best_s:
            best, best_s = t, s
    return best


def choose_title(
    *,
    lang: str,
    origin_title: str = "",
    raw_title: str = "",
    headlines: list[str] | None = None,
    meta_titles: list[str] | None = None,
    script_texts: list[str] | None = None,
    selector_title: str = "",
    body_texts: list[str] | None = None,
) -> tuple[str, str]:
    """Full getTitle cascade → (title, title_pos)."""
    headlines = headlines or []
    t = title_by_origin(origin_title, headlines, lang)
    if t:
        return t, "headline"

    origin_meta_title = web_title(raw_title, 255)
    meta_title = web_content_title_clean(origin_meta_title, lang)

    t = title_by_meta(meta_titles or [], meta_title, lang)
    if t:
        return t, "meta"

    t = title_by_script(script_texts or [], meta_title, lang)
    if t:
        return t, "script"

    if origin_meta_title.strip():
        t = title_by_headline_sim(headlines, meta_title, lang)
        if t:
            return t, "headline"

    if selector_title:
        sel = textnorm.normalise_space(selector_title)
        if similarity_text(meta_title, sel) > title_sim_threshold(lang):
            return sel, "selector"

    t = title_by_content(body_texts or [], meta_title, lang)
    if t:
        return t, "content"

    return meta_title, "title"
