"""Canonical-URL normalization (functions/urlfilter.canonicalize_url)
and the crawl-frontier dedup stage (stages/dedup.url_canonical_dedup)."""

import pyarrow as pa

from spiderray.functions.urlfilter import canonicalize_url


class TestCanonicalize:
    def test_rfc3986_folds(self):
        assert (canonicalize_url("HTTP://WWW.Ex.COM/A/b") ==
                "http://www.ex.com/A/b")  # path case preserved
        assert canonicalize_url("https://ex.com") == "https://ex.com/"
        assert canonicalize_url("http://ex.com:80/x") == "http://ex.com/x"
        assert (canonicalize_url("https://ex.com:443/x") ==
                "https://ex.com/x")
        assert (canonicalize_url("https://ex.com:8443/x") ==
                "https://ex.com:8443/x")  # non-default port kept

    def test_slashes_fragment(self):
        assert canonicalize_url("http://e.com/a//b///c/") == "http://e.com/a/b/c"
        assert canonicalize_url("http://e.com/a#frag") == "http://e.com/a"
        assert canonicalize_url("http://e.com/") == "http://e.com/"

    def test_query_normalization(self):
        assert (canonicalize_url("http://e.com/p?b=2&a=1") ==
                "http://e.com/p?a=1&b=2")
        assert (canonicalize_url(
            "http://e.com/p?a=1&utm_source=x&UTM_campaign=y&gclid=z&ref=tw")
            == "http://e.com/p?a=1")
        # blank values survive; tracking-only query drops entirely
        assert canonicalize_url("http://e.com/p?a=") == "http://e.com/p?a="
        assert canonicalize_url("http://e.com/p?utm_x=1") == "http://e.com/p"

    def test_unparseable_passthrough(self):
        assert canonicalize_url("  not a url ") == "not a url"
        assert canonicalize_url("/relative/only") == "/relative/only"


class TestUrlDedup:
    def test_planted_variants_collapse(self, ray_session):
        import ray.data as rd

        from spiderray.pipelines.queries import _url_variants_batch
        from spiderray.stages.dedup import url_canonical_dedup

        docs = pa.table({"doc_id": pa.array(range(100), pa.int64())})
        links = _url_variants_batch(docs)
        out = url_canonical_dedup(rd.from_arrow(links)).to_pandas()
        # 100 ids / 5 variants -> 20 canonical articles
        assert len(out) == 20
        assert (out.n_variants == 5).all()
        out = out.sort_values("winner_id").reset_index(drop=True)
        assert out.winner_id.tolist() == [a * 5 for a in range(20)]
        for _, r in out.iterrows():
            art = r.winner_id // 5
            assert r.canon_url == (
                f"http://www.site{art % 37}.example.com/news/{art}/item"
                f"?id={art}&lang=en")
