"""Link classification + per-page corpus-stats relabel (F7 fixtures):
pure-function unit checks plus the Ray groupby(page_id) pipeline vs the pure
oracle on every page."""

import pandas as pd
import pytest

from spiderray.functions import linkclassify
from spiderray.pipelines.linkdata import classify_pages, page_summaries

ZH_TITLE = "市政府召开专题会议讨论城市交通治理的方案"  # content-grade zh title
EN_TITLE = "Mayor announces new public transportation plan today"


def make_pages() -> pd.DataFrame:
    rows = []

    # page 0 (en): publishProb > 0.7 — 9 date-path content links + list/unknown
    for i in range(9):
        rows.append(("p0", f"http://site0.com/2024/01/{10+i:02d}/story-{i}.html", EN_TITLE, "en"))
    rows.append(("p0", "http://site0.com/2024/02/01/x.html", "Short title", "en"))  # list→promote (date path, len>=2)
    rows.append(("p0", "http://site0.com/about.html", "About us team", "en"))       # list, no date path
    rows.append(("p0", "http://news.site0.com/2024/03/01/y.html", EN_TITLE, "en"))  # subdomain

    # page 1 (en): topPaths promotion — >= 8 content links under /news/
    for i in range(8):
        rows.append(("p1", f"http://site1.com/news/article-{i}.html", EN_TITLE, "en"))
    rows.append(("p1", "http://site1.com/", EN_TITLE, "en"))  # default path → none

    # page 2 (zh): blacklist demotion + zh classification branches
    rows.append(("p2", "http://site2.cn/a/1.html", ZH_TITLE, "zh"))
    rows.append(("p2", "http://site2.cn/a/2.html", "增值电信业务经营许可证B2-123", "zh"))
    rows.append(("p2", "http://site2.cn/a/3.html", "新闻中心", "zh"))
    rows.append(("p2", "http://site2.cn/a/4.html", "NBA", "zh"))
    rows.append(("p2", "http://site2.cn/a/5.html", "latest news", "zh"))
    rows.append(("p2", "http://site2.cn/index.html", ZH_TITLE, "zh"))  # default path

    # page 3 (en): dup URL, longest title wins
    rows.append(("p3", "http://site3.com/x/1.html", "Short one", "en"))
    rows.append(("p3", "http://site3.com/x/1.html", EN_TITLE, "en"))
    rows.append(("p3", "http://site3.com/" + "a" * 260 + "/p.html", EN_TITLE, "en"))  # >255 runes

    return pd.DataFrame(rows, columns=["page_id", "url", "title", "lang"])


class TestPure:
    def test_dedup_longest_title(self):
        lt = linkclassify.dedup_longest_title(
            [("u", "short"), ("u", "a much longer title"), ("v", "x")]
        )
        assert lt == {"u": "a much longer title", "v": "x"}

    def test_publish_prob_promotion(self):
        df = make_pages()
        g = df[df.page_id == "p0"]
        lt = linkclassify.dedup_longest_title(list(zip(g.url, g.title)))
        labels, subs = linkclassify.page_link_types(lt, "en")
        assert labels["http://site0.com/2024/02/01/x.html"] == "content"  # promoted
        assert labels["http://site0.com/about.html"] == "list"
        assert subs == {"news.site0.com"}

    def test_top_paths_promotion_applies_only_with_unknown(self):
        # unknown links only exist in zh flows; English list links stay list
        df = make_pages()
        g = df[df.page_id == "p1"]
        lt = linkclassify.dedup_longest_title(list(zip(g.url, g.title)))
        labels, _ = linkclassify.page_link_types(lt, "en")
        assert labels["http://site1.com/"] == "none"
        assert sum(1 for v in labels.values() if v == "content") == 8

    def test_zh_branches_and_blacklist(self):
        df = make_pages()
        g = df[df.page_id == "p2"]
        lt = linkclassify.dedup_longest_title(list(zip(g.url, g.title)))
        labels, _ = linkclassify.page_link_types(lt, "zh")
        assert labels["http://site2.cn/a/1.html"] == "content"
        assert labels["http://site2.cn/a/2.html"] == "none"  # blacklist demoted
        assert labels["http://site2.cn/a/3.html"] == "list"
        assert labels["http://site2.cn/a/4.html"] == "list"  # zhEnTitles whitelist
        assert labels["http://site2.cn/a/5.html"] == "none"
        assert labels["http://site2.cn/index.html"] == "none"

    def test_url_gates(self):
        assert linkclassify.classify_link("http://x.com/" + "a" * 260, EN_TITLE, "en") == "none"
        assert linkclassify.classify_link("http://x.com/", EN_TITLE, "en") == "none"
        assert linkclassify.classify_link("http://x.com/index.php", EN_TITLE, "en") == "none"

    def test_rules_mode(self):
        rules = {"site9.com": [r"/article/\d+"]}
        lt = {"http://www.site9.com/article/123": "t", "http://www.site9.com/other/x": "t"}
        labels, _ = linkclassify.page_link_types(lt, "en", rules)
        assert labels["http://www.site9.com/article/123"] == "content"
        assert labels["http://www.site9.com/other/x"] == "list"


class TestRayPipeline:
    @pytest.fixture(scope="class")
    def classified(self, ray_session):
        import ray.data as rd

        ds = rd.from_pandas(make_pages())
        return classify_pages(ds).to_pandas()

    def test_matches_oracle_per_page(self, classified):
        df = make_pages()
        for pid, g in df.groupby("page_id"):
            lt = linkclassify.dedup_longest_title(list(zip(g.url, g.title)))
            labels, _ = linkclassify.page_link_types(lt, g.lang.iloc[0])
            got = classified[classified.page_id == pid].set_index("url")["label"].to_dict()
            assert got == labels, pid

    def test_page_summaries(self, ray_session, classified):
        import ray.data as rd

        summary = page_summaries(rd.from_pandas(classified)).to_pandas()
        p0 = summary[summary.page_id == "p0"].iloc[0]
        assert p0["n_content"] == 11  # 9 + promoted + subdomain link
        assert p0["n_list"] == 1


class TestPageLang:
    def test_listmode_lang_from_anchors(self):
        titles = [ZH_TITLE + str(i) for i in range(20)]
        lang, pos = linkclassify.page_lang_from_links(titles)
        assert (lang, pos) == ("zh", "body")

    def test_too_few_anchors(self):
        assert linkclassify.page_lang_from_links(["短标题"] * 10) == ("", "")

    def test_dynamic_render_guard(self):
        titles = ["{item.title}"] * 20
        assert linkclassify.page_lang_from_links(titles) == ("", "")

    def test_classify_pages_auto_lang(self, ray_session):
        import ray.data as rd

        rows = [
            ("pz", f"http://z.cn/a/{i}.html", ZH_TITLE + str(i)) for i in range(20)
        ]
        df = pd.DataFrame(rows, columns=["page_id", "url", "title"])  # no lang col
        out = classify_pages(rd.from_pandas(df)).to_pandas()
        assert (out["label"] == "content").all()


class TestHarvest:
    def test_filter_and_resolve(self, ray_session):
        import ray.data as rd

        from spiderray.pipelines.linkdata import accepted_links, classify_pages, harvest_links

        base = "http://www.163.com/a/b/"
        rows = [
            {"page_id": base, "url": "./c/123.html", "title": EN_TITLE, "lang": "en"},
            {"page_id": base, "url": "/x/9.pdf", "title": EN_TITLE, "lang": "en"},
            {"page_id": base, "url": "http://other.com/y/1.html", "title": EN_TITLE, "lang": "en"},
            {"page_id": base, "url": "http://news.163.com/z/2.html", "title": EN_TITLE, "lang": "en"},
        ]
        harvested = harvest_links(rd.from_items(rows), strict_domain=True).to_pandas()
        by_url = harvested.set_index("url")["filter_reason"].to_dict()
        assert by_url["http://www.163.com/a/b/c/123.html"] == ""
        assert by_url["http://www.163.com/x/9.pdf"] == "invalid url with suffix"
        assert by_url["http://other.com/y/1.html"] == "invalid url with strict domain"
        assert by_url["http://news.163.com/z/2.html"] == ""

        accepted = accepted_links(harvest_links(rd.from_items(rows)))
        labels = classify_pages(accepted).to_pandas()
        assert set(labels["label"]) == {"content"}

    def test_domain_top_from_url(self):
        from spiderray.functions.domains import domain_top_from_url

        assert domain_top_from_url("https://www.baidu.com/news") == "baidu.com"
        assert domain_top_from_url("http://szb.xnnews.com.cn/a/b.htm") == "xnnews.com.cn"
