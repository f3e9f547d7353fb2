"""HTML→fields parse stage + CEPF content-node scoring (stages/htmlparse.py;
reference semantics /root/reference/extract/content.go:1020-1104, 281-308)."""

import math

import pytest

from spiderray.stages import htmlparse as hp

ARTICLE_HTML = """<!DOCTYPE html>
<html lang="en"><head>
<meta charset="utf-8">
<title>Mayor Opens New Bridge Across The River | City News</title>
<meta property="og:title" content="Mayor Opens New Bridge Across The River">
<meta name="publishdate" content="2022-09-14 10:35:00">
<script>var x = {"publish_time": "2022-09-14 10:35:00"};</script>
<style>.nav { color: red }</style>
</head><body>
<div class="nav"><a href="/">Home</a> <a href="/news">News</a> <a href="/sport">Sport</a></div>
<div class="article">
<h1>Mayor Opens New Bridge Across The River</h1>
<time datetime="2022-09-14T10:35:00">Sep 14</time>
<p>The mayor officially opened the new bridge across the river on Wednesday morning, calling it a milestone for the city.</p>
<p>Construction took three years and cost forty million dollars, funded jointly by the city and the regional government.</p>
<p>Thousands of residents attended the ceremony, which ended with a fireworks display over the water.</p>
</div>
<div class="footer"><a href="/about">About</a> <a href="/contact">Contact</a> <a href="/terms">Terms</a></div>
</body></html>"""


class TestParseFields:
    def test_head_fields(self):
        f = hp.parse_page_fields(ARTICLE_HTML)
        assert f["title"] == "Mayor Opens New Bridge Across The River | City News"
        assert f["meta_titles"] == ["Mayor Opens New Bridge Across The River"]
        assert f["meta_lang"] == "en"
        assert f["charset"] == "UTF-8"
        assert f["time_attr"] == "2022-09-14T10:35:00"
        assert ("publishdate", "", "2022-09-14 10:35:00") in f["metas"]
        assert any("publish_time" in s for s in f["script_texts"])

    def test_content_node_excludes_nav_footer(self):
        f = hp.parse_page_fields(ARTICLE_HTML)
        assert "mayor officially opened" in f["content"]
        assert "Home" not in f["content"]
        assert "About" not in f["content"]
        assert f["content_score"] > 0

    def test_script_style_stripped_from_body(self):
        f = hp.parse_page_fields(ARTICLE_HTML)
        assert "publish_time" not in f["body_text"]
        assert ".nav" not in f["body_text"]

    def test_malformed_html_salvaged(self):
        f = hp.parse_page_fields("<html><body><div><p>unclosed para<p>another</div>")
        assert "unclosed para" in f["body_text"]
        assert f["charset"] == "UTF-8"

    def test_empty_and_none(self):
        assert hp.parse_page_fields("")["content"] == ""
        assert hp.parse_page_fields("plain text only")["body_text"] == "plain text only"

    def test_a_subtree_is_link_text(self):
        # an <a> converts its whole subtree to link text (content.go:1034-1037)
        root = hp.parse_html("<div><a href='/'><span>linked words here</span></a>visible</div>")
        info = {}
        div = hp._find_first(root, "div")
        ci = hp._compute_info(div, info)
        assert ci.link_text == len("linked words here")
        assert ci.text == len("linked words here") + len("visible")

    def test_leaf_var_special_cases(self):
        # content.go:1079-1104: empty → 0, single leaf → leaf/2, else pop var
        assert hp._leaf_var([]) == 0.0
        assert hp._leaf_var([8]) == 4.0
        assert hp._leaf_var([2, 4]) == pytest.approx(1.0)

    def test_score_formula(self):
        ci = hp._CountInfo()
        ci.text, ci.link_text, ci.density_sum, ci.p_count = 100, 10, 5.0, 3
        ci.leaves = [30, 30, 30]
        expected = (
            math.log(math.sqrt(0 + 1) + 0)  # var([30,30,30]) = 0 → ln(sqrt(1))=0
        )
        assert hp._score(ci) == pytest.approx(
            math.log(math.sqrt(1)) * 5.0 * math.log(91) * math.log10(4)
        )


class TestNewsFromHtmlRay:
    def test_end_to_end(self, ray_session):
        import ray.data as rd

        from spiderray.pipelines.news import get_news_from_html

        rows = [{"page_id": "p1", "html": ARTICLE_HTML}]
        out = get_news_from_html(rd.from_items(rows)).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        assert r["title"] == "Mayor Opens New Bridge Across The River"
        assert r["time"] == "2022-09-14 10:35:00"
        assert r["time_pos"] == "meta"
        assert r["lang"] == "en"
        assert "mayor officially opened" in r["content"]
        assert "Home" not in r["content"]

    def test_query_entry(self, ray_session):
        from spiderray.pipelines.queries import q_news_from_html

        df = q_news_from_html("/root/testdata/sf0.001").to_pandas()
        assert len(df) == 500
        assert (df["lang"] == "en").all()
        assert (df["time_pos"] == "meta").all()


class TestDeepNesting:
    def test_3000_deep_survives(self):
        deep = ("<html><body>" + "<div>" * 3000
                + "<p>deep text survives here with several words.</p>"
                + "</div>" * 3000 + "</body></html>")
        f = hp.parse_page_fields(deep)
        assert "deep text survives" in (f["content"] + f["body_text"])

    def test_10k_deep_unterminated(self):
        f = hp.parse_page_fields("<body>" + "<div>" * 10_000 + "visible x")
        assert "visible x" in f["body_text"]


class TestImpliedEndTagsScope:
    def test_p_closes_across_inline(self):
        root = hp.parse_html("<div><p>one<em>x<p>two<p>three</div>")
        div = root.children[0]
        ps = [c for c in div.children if not isinstance(c, str) and c.tag == "p"]
        assert len(ps) == 3  # HTML5: each new p pops the open p (and the em)

    def test_li_closes_p(self):
        root = hp.parse_html("<ul><p>intro<li>item one<li>item two</ul>")
        ul = root.children[0]
        lis = [c for c in ul.children if not isinstance(c, str) and c.tag == "li"]
        assert len(lis) == 2

    def test_p_inside_table_cell_not_closed_from_outside(self):
        # scope boundary: a p inside a td is untouched by a div after the table
        root = hp.parse_html("<table><tr><td><p>cell")
        # no crash + p stays nested under td
        f = hp.parse_page_fields("<body><table><tr><td><p>cell text</p></td></tr></table><div>after</div></body>")
        assert "cell text" in f["body_text"]
