"""Title cascade fixtures + BFS crawl over a synthetic page graph."""

import pytest

from spiderray.functions import titlecascade as tc
from spiderray.functions.textnorm import format_content

EN_TITLE = "Mayor Announces New Public Transportation Plan"


class TestTitleCascade:
    def test_origin_headline(self):
        title, pos = tc.choose_title(
            lang="en",
            origin_title=EN_TITLE,
            raw_title=EN_TITLE + " | Some Site",
            headlines=["Unrelated heading", EN_TITLE],
        )
        assert (title, pos) == (EN_TITLE, "headline")

    def test_origin_last_above_threshold_wins(self):
        # reference quirk: maxScore never updated → last candidate wins
        got = tc.title_by_origin("abcdef", ["abcdef", "abcdxx"], "en")
        assert got == "abcdxx"

    def test_meta_shorter_wins(self):
        title, pos = tc.choose_title(
            lang="en",
            raw_title=EN_TITLE + " extended with suffix",
            meta_titles=[EN_TITLE],
        )
        assert (title, pos) == (EN_TITLE, "meta")

    def test_script(self):
        title, pos = tc.choose_title(
            lang="en",
            raw_title=EN_TITLE,
            script_texts=['{"title": "' + EN_TITLE + '"}'],
        )
        assert (title, pos) == (EN_TITLE, "script")

    def test_headline_sim(self):
        title, pos = tc.choose_title(
            lang="en",
            raw_title=EN_TITLE + " - Site",
            headlines=["Totally different", EN_TITLE + "!"],
        )
        assert pos == "headline"
        assert title == EN_TITLE + "!"

    def test_selector(self):
        title, pos = tc.choose_title(
            lang="en",
            raw_title=EN_TITLE + " - Site",
            selector_title=EN_TITLE,
        )
        assert (title, pos) == (EN_TITLE, "selector")

    def test_content_fallback(self):
        title, pos = tc.choose_title(
            lang="en",
            raw_title=EN_TITLE + " - Site",
            body_texts=["other text", EN_TITLE + " today"],
        )
        assert pos == "content"

    def test_title_fallback(self):
        title, pos = tc.choose_title(lang="en", raw_title="Completely Alone Title")
        assert (title, pos) == ("Completely Alone Title", "title")

    def test_zh_threshold(self):
        assert tc.title_by_headline_sim(["市长宣布新交通计划"], "市长宣布新交通计划要点", "zh")


class TestFormatContent:
    def test_normalizes_lines(self):
        assert format_content("  a   b \n\n\n c\td ") == "a b\nc d"


PAGES = [
    # seed: a list page with list + content links
    {
        "url": "http://s.com/",
        "lang": "en",
        "links": [
            {"url": "http://s.com/news/", "title": "News section index"},
            {"url": "http://s.com/2024/01/01/a.html", "title": "Mayor announces new transportation plan today"},
        ],
    },
    {
        "url": "http://s.com/news/",
        "lang": "en",
        "links": [
            {"url": "http://s.com/2024/01/02/b.html", "title": "Council votes on the new budget proposal"},
            {"url": "http://s.com/sports/", "title": "Sports section page"},
            {"url": "http://s.com/2024/01/01/a.html", "title": "Mayor announces new transportation plan today"},
        ],
    },
    {
        "url": "http://s.com/sports/",
        "lang": "en",
        "links": [
            {"url": "http://s.com/2024/01/03/c.html", "title": "Local team wins the championship game again"},
        ],
    },
]


class TestCrawl:
    def test_bfs_waves(self, ray_session):
        import ray.data as rd

        from spiderray.pipelines.crawl import crawl

        res = crawl(rd.from_items(PAGES), ["http://s.com/"], depth=3)
        assert res.waves == 3
        assert "http://s.com/2024/01/01/a.html" in res.content
        assert "http://s.com/2024/01/02/b.html" in res.content
        assert "http://s.com/2024/01/03/c.html" in res.content
        # pages were visited wave by wave, each exactly once
        assert res.pages_visited == ["http://s.com/", "http://s.com/news/", "http://s.com/sports/"]

    def test_depth_limit(self, ray_session):
        import ray.data as rd

        from spiderray.pipelines.crawl import crawl

        res = crawl(rd.from_items(PAGES), ["http://s.com/"], depth=1)
        assert res.waves == 1
        assert "http://s.com/2024/01/03/c.html" not in res.content


class TestNewsComposite:
    def test_extract_news(self, ray_session):
        import time as _t

        import ray.data as rd

        from spiderray.pipelines.news import extract_news

        now = _t.mktime((2024, 6, 1, 12, 0, 0, 0, 0, -1))
        pages = rd.from_items([
            {
                "page_id": "p1",
                "title": EN_TITLE + " | The Daily",
                "body_text": "Published on 2024-01-15 09:30 by staff.\n"
                + EN_TITLE
                + ". The plan includes new bus lines and expanded rail service for the city region. "
                * 4,
                "headlines": [EN_TITLE],
                "url": "http://d.com/2024/01/15/plan.html",
            },
            {
                "page_id": "p2",
                "title": "市长宣布新交通计划_日报",
                "body_text": "发布时间: 2023-05-06 10:00  市长宣布新交通计划。" + "会议讨论了具体方案。" * 20,
                "headlines": ["市长宣布新交通计划"],
                "url": "http://z.cn/a/b.html",
            },
        ])
        out = extract_news(pages, now=now).to_pandas().set_index("page_id")
        p1 = out.loc["p1"]
        assert p1["title"] == EN_TITLE
        assert p1["time"].startswith("2024-01-15 09:30")
        assert p1["lang"] == "en"
        assert p1["time_local"].startswith("2024-01-15")
        p2 = out.loc["p2"]
        assert p2["lang"] == "zh"
        assert p2["title"] == "市长宣布新交通计划"
        assert "2023-05-06" in p2["time"]
        assert p2["quality_score"] != 0.0


class TestSessions:
    def test_sessionize(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from spiderray.stages.windows import sessionize

        base = pd.Timestamp("2024-01-01 00:00:00")
        rows = []
        for m in (0, 5, 10, 120, 125, 300):  # 3 sessions for user 1
            rows.append({"user_id": 1, "ts": base + pd.Timedelta(minutes=m)})
        rows.append({"user_id": 2, "ts": base})
        out = sessionize(rd.from_items(rows)).to_pandas()
        u1 = out[out.user_id == 1].sort_values("session_id")
        assert len(u1) == 3
        assert u1["n_events"].tolist() == [3, 2, 1]
        assert len(out[out.user_id == 2]) == 1

    def test_tumbling(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from spiderray.stages.windows import tumbling

        base = pd.Timestamp("2024-01-01 00:00:00")
        rows = [{"k": "a", "ts": base + pd.Timedelta(minutes=m)} for m in (0, 10, 59, 60, 61, 125)]
        out = tumbling(rd.from_items(rows), key_col="k").to_pandas().sort_values("window_start")
        assert out["n_events"].tolist() == [3, 2, 1]
        assert out["window_start"].iloc[0] == base

    def test_sliding_counts_overlap(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from spiderray.stages.windows import sliding

        base = pd.Timestamp("2024-01-01 00:00:00")
        # one event at t=40min: covered by windows starting at 00:30 and 00:00
        rows = [{"k": "a", "ts": base + pd.Timedelta(minutes=40)}]
        out = sliding(rd.from_items(rows), key_col="k", width_minutes=60,
                      slide_minutes=30).to_pandas().sort_values("window_start")
        starts = pd.to_datetime(out["window_start"]).tolist()
        assert starts == [base, base + pd.Timedelta(minutes=30)]
        assert out["n_events"].tolist() == [1, 1]

    def test_sliding_width_validation(self, ray_session):
        import pytest
        import ray.data as rd

        from spiderray.stages.windows import sliding

        with pytest.raises(ValueError):
            sliding(rd.from_items([{"ts": None}]), width_minutes=45, slide_minutes=30)


class TestWindowFunctions:
    def _frame(self):
        import pandas as pd

        # two keys, deliberate value ties inside key 1 (rank vs dense_rank)
        return pd.DataFrame({
            "k": [1, 1, 1, 1, 2, 2, 2],
            "seq": [1, 2, 3, 4, 1, 2, 3],
            "v": [10, 30, 30, 20, 5, 5, 7],
        })

    def test_against_duckdb_window_sql(self, ray_session):
        import duckdb
        import ray.data as rd

        from spiderray.stages.windows import window_functions

        df = self._frame()
        out = window_functions(
            rd.from_pandas(df), ["k"], ["seq"],
            [
                {"fn": "row_number", "out": "rn"},
                {"fn": "lag", "col": "v", "offset": 1, "default": -1, "out": "prev_v"},
                {"fn": "lead", "col": "v", "offset": 1, "default": -1, "out": "next_v"},
                {"fn": "cumsum", "col": "v", "out": "run_v"},
                {"fn": "cummax", "col": "v", "out": "max_v"},
                {"fn": "rank", "col": "v", "ascending": False, "out": "rk"},
                {"fn": "dense_rank", "col": "v", "ascending": False, "out": "drk"},
                {"fn": "rolling_sum", "col": "v", "window": 2, "out": "roll2_v"},
                {"fn": "rolling_mean", "col": "v", "window": 2, "out": "roll2_mean"},
            ],
        ).to_pandas().sort_values(["k", "seq"]).reset_index(drop=True)

        con = duckdb.connect()
        con.register("t", df)
        exp = con.execute("""
            SELECT k, seq, v,
                   CAST(row_number() OVER w AS BIGINT) AS rn,
                   CAST(COALESCE(lag(v) OVER w, -1) AS BIGINT) AS prev_v,
                   CAST(COALESCE(lead(v) OVER w, -1) AS BIGINT) AS next_v,
                   CAST(sum(v) OVER w AS BIGINT) AS run_v,
                   CAST(max(v) OVER w AS BIGINT) AS max_v,
                   CAST(rank() OVER (PARTITION BY k ORDER BY v DESC) AS BIGINT) AS rk,
                   CAST(dense_rank() OVER (PARTITION BY k ORDER BY v DESC) AS BIGINT) AS drk,
                   CAST(sum(v) OVER (PARTITION BY k ORDER BY seq
                        ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll2_v,
                   avg(v) OVER (PARTITION BY k ORDER BY seq
                        ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS roll2_mean
            FROM t WINDOW w AS (PARTITION BY k ORDER BY seq)
            ORDER BY k, seq
        """).fetchdf()
        con.close()
        for c in exp.columns:
            assert out[c].tolist() == exp[c].tolist(), c
        for c in ("rn", "prev_v", "next_v", "run_v", "rk", "drk", "roll2_v"):
            assert str(out[c].dtype) == "int64", c

    def test_unknown_fn_raises(self, ray_session):
        import pytest
        import ray.data as rd

        from spiderray.stages.windows import window_functions

        with pytest.raises(Exception):
            window_functions(
                rd.from_pandas(self._frame()), ["k"], ["seq"],
                [{"fn": "ntile", "out": "x"}],
            ).materialize()


class TestReferenceApi:
    def test_get_news(self):
        from spiderray.api import get_news

        import time as _t
        now = _t.mktime((2024, 6, 1, 12, 0, 0, 0, 0, -1))
        news = get_news(
            {
                "title": EN_TITLE + " | Daily",
                "body_text": "Published on 2024-01-15 09:30. " + EN_TITLE + ". Details follow here today. " * 6,
                "headlines": [EN_TITLE],
                "url": "http://d.com/2024/01/15/p.html",
            },
            now=now,
        )
        assert news["title"] == EN_TITLE
        assert news["time"].startswith("2024-01-15")
        assert news["lang"] == "en"

    def test_get_link_data(self):
        from spiderray.api import get_link_data

        links = [(f"http://s.cn/a/{i}.html", "市政府召开专题会议讨论城市交通治理方案" + str(i)) for i in range(20)]
        links.append(("http://s.cn/", "首页"))
        res = get_link_data(links)
        assert res["lang"] == "zh"
        assert len(res["content"]) == 20
        assert "http://s.cn/" in res["none"]

    def test_detect_domain(self, ray_session):
        from spiderray.api import detect_domain

        res = detect_domain(
            {
                "host": "news.sohu.com",
                "title": "新闻中心_搜狐",
                "description": "d",
                "body_text": "今日要闻内容。" * 20 + " 京ICP备05000001号",
                "meta_lang": "",
                "charset": "UTF-8",
            },
            {"news.sohu.com": (7, 2)},
        )
        assert res["domain_top"] == "sohu.com"
        assert res["icp_province"] == "北京"
        assert res["n_content"] == 7

    def test_news_spider(self, ray_session):
        import ray.data as rd

        from spiderray.api import news_spider

        res = news_spider(rd.from_items(PAGES), ["http://s.com/"], depth=2)
        assert len(res.content) >= 2


class TestCrawlShuffleSeen:
    def test_shuffle_mode_identical_to_driver(self, ray_session):
        """seen_mode='shuffle' (distributed anti-join seen set) must produce
        the identical crawl result as the driver-set mode."""
        import ray.data as rd

        from spiderray.pipelines.crawl import crawl

        a = crawl(rd.from_items(PAGES), ["http://s.com/"], depth=3)
        b = crawl(rd.from_items(PAGES), ["http://s.com/"], depth=3,
                  seen_mode="shuffle")
        assert a.content == b.content
        assert a.pages_visited == b.pages_visited
        assert a.waves == b.waves

    def test_revisit_suppressed_across_waves(self, ray_session):
        """A list link pointing BACK at an already-visited page must not
        re-enter the frontier in shuffle mode (the seen-set contract)."""
        import ray.data as rd

        from spiderray.pipelines.crawl import crawl

        title = "News Section"  # <5 words -> LIST label -> frontier
        pages = [
            {"url": "http://x.com/", "lang": "en",
             "links": [{"url": "http://x.com/a/", "title": title}]},
            {"url": "http://x.com/a/", "lang": "en",
             "links": [{"url": "http://x.com/", "title": title},
                        {"url": "http://x.com/b/", "title": title}]},
            {"url": "http://x.com/b/", "lang": "en",
             "links": [{"url": "http://x.com/a/", "title": title}]},
        ]
        res = crawl(rd.from_items(pages), ["http://x.com/"], depth=5,
                    seen_mode="shuffle")
        assert res.pages_visited == ["http://x.com/", "http://x.com/a/", "http://x.com/b/"]
        assert res.waves <= 4


class TestGlobalScan:
    """stages/windows.global_scan / pack_chunks — the single-logical-
    partition distributed prefix sum."""

    def test_offsets_match_serial_cumsum(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from spiderray.stages.windows import global_scan

        rng = np.random.default_rng(5)
        ids = rng.permutation(3000)
        sizes = rng.integers(1, 900, size=3000)
        df = pd.DataFrame({"doc_id": ids, "tok": sizes, "payload": ids * 2})
        out = global_scan(
            rd.from_pandas(df).repartition(7), "doc_id", "tok", n_buckets=11
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        ser = df.sort_values("doc_id").reset_index(drop=True)
        expect = np.concatenate([[0], np.cumsum(ser["tok"].to_numpy())[:-1]])
        assert (out["offset"].to_numpy() == expect).all()
        # payload columns ride through untouched
        assert (out["payload"].to_numpy() == ser["payload"].to_numpy()).all()

    def test_string_order_keys(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from spiderray.stages.windows import global_scan

        df = pd.DataFrame({"k": [f"d{i:04d}" for i in range(200)],
                           "s": np.arange(200) % 7 + 1})
        shuf = df.sample(frac=1, random_state=3).reset_index(drop=True)
        out = global_scan(rd.from_pandas(shuf).repartition(4), "k", "s",
                          n_buckets=5).to_pandas().sort_values("k")
        expect = np.concatenate([[0], np.cumsum(df["s"].to_numpy())[:-1]])
        assert (out["offset"].to_numpy() == expect).all()

    def test_skewed_keys_stay_balanced(self, ray_session):
        # keys concentrated in a narrow range: sampled boundaries adapt
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from spiderray.stages.windows import global_scan

        rng = np.random.default_rng(9)
        ids = np.concatenate([rng.permutation(100) + 1_000_000,
                              np.arange(2000)])
        df = pd.DataFrame({"doc_id": ids, "tok": np.ones(len(ids), dtype=np.int64)})
        out = global_scan(rd.from_pandas(df).repartition(5), "doc_id", "tok",
                          n_buckets=8).to_pandas().sort_values("doc_id")
        assert (out["offset"].to_numpy() == np.arange(len(ids))).all()

    def test_pack_chunks_chunk_math(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from spiderray.stages.windows import pack_chunks

        df = pd.DataFrame({"doc_id": np.arange(50),
                           "tok": np.full(50, 300, dtype=np.int64)})
        out = pack_chunks(rd.from_pandas(df).repartition(3), "doc_id", "tok",
                          chunk_size=512, n_buckets=4
                          ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        off = np.arange(50) * 300
        assert (out["tok_offset"].to_numpy() == off).all()
        assert (out["chunk_id"].to_numpy() == off // 512).all()
        assert (out["chunk_pos"].to_numpy() == off % 512).all()
