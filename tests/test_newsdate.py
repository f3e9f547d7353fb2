"""Publish-date extraction fixtures (the content.go:22-68 regex bank +
pickPublishDates selection semantics). Fixed `now` for determinism."""

import time

import pytest

from spiderray.functions import newsdate as nd

NOW = time.mktime((2024, 6, 1, 12, 0, 0, 0, 0, -1))


class TestRegexBank:
    @pytest.mark.parametrize(
        "text,expected",
        [
            ("发布于 2022-09-02 11:40:53 的新闻", "2022-09-02 11:40:53"),
            ("2022年9月2日 11时40分", "2022年9月2日 11时40分"),
            # greedy [ ]{0,3} + empty optional clock keeps the trailing
            # space, exactly like Go (TrimSpace happens in pickPublishDates)
            ("date 2022/09/02 end", "2022/09/02 "),
            ("t 2022.9.2 x", "2022.9.2 "),
        ],
    )
    def test_publish_date(self, text, expected):
        assert nd.RE_PUBLISH_DATE.search(text).group(0) == expected

    def test_short_year(self):
        assert nd.RE_PUBLISH_SHORT_DATE.search("posted 22-09-02 11:11:11").group(0) == "22-09-02 11:11:11"

    def test_en_formats(self):
        assert nd.RE_EN_PUBLISH_DATE1.search("on 02 Sep 2022 11:40:53 pm end").group(0) == "02 Sep 2022 11:40:53 pm"
        assert nd.RE_EN_PUBLISH_DATE2.search("Sep 02, 2022 11:40 here").group(0) == "Sep 02, 2022 11:40"
        assert nd.RE_EN_US_PUBLISH_DATE.search("at 8/30/2022 11:11:11 end").group(0) == "8/30/2022 11:11:11"

    def test_zh_prefix_composite(self):
        m = nd.RE_ZH_PUBLISH_DATE.search("发布时间: 2022-09-02 11:40")
        assert m is not None

    def test_script_patterns(self):
        assert nd.RE_SCRIPT_TIME.search('"pubDate" : "2022-09-02 11:40:53"').group(1) == "2022-09-02 11:40:53"
        assert nd.RE_WX_SCRIPT_TIME.search('var ct = "1662087653";').group(1) == "1662087653"

    def test_url_date(self):
        assert nd.time_from_url("https://x.com/a/20221003/s.html") == "2022-10-03"
        assert nd.time_from_url("https://x.com/2022/10/03/s.html") == "2022-10-03"
        assert nd.time_from_url("https://x.com/a/b.html") == ""


class TestPick:
    def test_with_time_single(self):
        assert nd.pick_publish_dates("x", ["2022-09-02 11:40"], False, now=NOW) == "2022-09-02 11:40"

    def test_longest_first_wins(self):
        dates = ["2022-09-02 11:40:53", "2022-09-03 11:40"]
        assert nd.pick_publish_dates("b", dates, False, now=NOW) == "2022-09-02 11:40:53"

    def test_title_proximity(self):
        body = "aaa 2022-09-02 11:40 TITLE 2022-09-03 11:40:53 bbb"
        got = nd.pick_publish_dates(
            body, ["2022-09-02 11:40", "2022-09-03 11:40:53"], False,
            title="TITLE", title_pos="headline", now=NOW,
        )
        assert got == "2022-09-03 11:40:53"

    def test_bad_tail_trimmed(self):
        got = nd.pick_publish_dates("x", ["2022-09-02 11:401"], False, now=NOW)
        assert got == "2022-09-02 11:40"

    def test_no_time_zh_recency_limit(self):
        dates = ["2031-01-01", "2023-05-05"]  # first is beyond now+1d
        got = nd.pick_publish_dates("x", dates, False, now=NOW)
        assert got == "2023-05-05"


class TestCascade:
    def test_meta_first(self):
        t, pos, f = nd.extract_time(
            lang="zh",
            metas=[("pubdate", "", "2022-09-02 11:40:53")],
            body_text="正文 2021-01-01 11:00 内容",
            now=NOW,
        )
        assert (t, pos) == ("2022-09-02 11:40:53", "meta")

    def test_meta_requires_publish_key(self):
        t, pos, _ = nd.extract_time(
            lang="zh",
            metas=[("viewport", "", "2022-09-02 11:40:53")],
            body_text="正文 2021-01-01 11:00 内容",
            now=NOW,
        )
        assert pos == "body" and t == "2021-01-01 11:00"

    def test_tag_datetime(self):
        t, pos, f = nd.extract_time(
            lang="en", time_attr="2022-09-02T11:40:53Z", body_text="", now=NOW
        )
        assert pos == "tag"
        assert f == "2022-09-02T11:40:53Z".replace(" ", "")  # zone kept, spaces stripped

    def test_script(self):
        t, pos, _ = nd.extract_time(
            lang="zh",
            script_texts=["var a=1;", '{"pubTime":"2022-09-02 11:40:53"}'],
            now=NOW,
        )
        assert (t, pos) == ("2022-09-02 11:40:53", "script")

    def test_lang_en(self):
        t, pos, f = nd.extract_time(
            lang="en",
            body_text="Published on 02 Sep 2022 by staff",
            now=NOW,
        )
        assert pos == "lang"
        assert t == "02 Sep 2022"

    def test_url_fallback(self):
        t, pos, _ = nd.extract_time(lang="en", url="https://x.com/20221003/a.html", now=NOW)
        assert (t, pos) == ("2022-10-03", "url")

    def test_zh_no_year_gets_current_year(self):
        t, pos, _ = nd.extract_time(lang="zh", body_text="发布 09-02 11:40 次", now=NOW)
        assert pos == "body"
        assert t == "2024-09-02 11:40"

    def test_format_time(self):
        assert nd.format_time("2022-09-02T11:40:53") == "2022-09-02 11:40:53"
        assert nd.format_time("2022-09-02 11:40分") == "2022-09-02 11:40"
        assert nd.format_time("2022年9月2日 11时40分") == "2022年9月2日 11时40分"

    def test_str_to_time(self):
        assert nd.str_to_time("2022-09-02 11:40:53") > 0
        assert nd.str_to_time("2022年9月2日 11时40分") > 0
        assert nd.str_to_time("garbage") == 0.0


class TestMetaEn:
    def test_en_meta_needs_publish_key(self):
        t, pos, _ = nd.extract_time(
            lang="en",
            metas=[("viewport", "", "02 Sep 2022 11:40")],
            body_text="",
            now=NOW,
        )
        assert t == ""  # non-publish key rejected

    def test_en_meta_longest_with_time_wins(self):
        t, pos, _ = nd.extract_time(
            lang="en",
            metas=[("pubdate", "", "02 Sep 2022 11:40"),
                   ("article:published", "og:pubtime", "03 Sep 2022 11:40:53 pm")],
            now=NOW,
        )
        assert (t, pos) == ("03 Sep 2022 11:40:53 pm", "meta")
