"""Fixture tests for the pure function bank, transcribed from the reference's
hermetic tests (SURVEY.md §5.1 style 2) plus FIXTURES.md strata."""

import math

import pytest

from spiderray.functions import (
    charset,
    domains,
    keepdrop,
    langid,
    quality,
    scrub,
    similarity,
    textnorm,
    titleclean,
    urlfilter,
)


class TestTextnorm:
    def test_remove_lines(self):
        assert textnorm.remove_lines("a\r\nb\nc\rd") == "abcd"

    def test_normalise_space(self):
        assert textnorm.normalise_space("  a \t b\n\nc ") == "a b c"

    def test_remove_sign(self):
        assert textnorm.remove_sign("你好，世界！hello.") == "你好世界hello"
        assert textnorm.remove_sign("a+b=c $5 €") == "abc 5 "

    def test_sub_string(self):
        assert textnorm.sub_string("abcdef", 0, 3) == "abc"
        assert textnorm.sub_string("汉字测试", 0, 2) == "汉字"
        assert textnorm.sub_string("ab", 0, 10) == "ab"

    def test_split_trim(self):
        assert textnorm.split_trim(" /a/b//c/ ", "/") == ["a", "b", "c"]

    def test_clean_for_lang_double_space(self):
        # strings.ReplaceAll(text, "  ", "") removes two-space runs outright
        assert "  " not in textnorm.clean_for_lang("word  word word")


class TestCharset:
    def test_valid_utf8(self):
        assert charset.detect_charset("你好".encode()) == ("UTF-8", "valid")

    def test_header(self):
        body = "abc".encode("gbk") + b"\xd6\xd0"
        cs, pos = charset.detect_charset(body, "text/html; charset=gbk")
        assert (cs, pos) == ("GBK", "header")

    def test_html5_meta(self):
        body = b'<html><head><meta charset="gb2312"></head>\xd6\xd0</html>'
        cs, pos = charset.detect_charset(body, None)
        assert (cs, pos) == ("GBK", "html")

    def test_html4_meta(self):
        body = (
            b'<meta http-equiv="Content-Type" content="text/html; charset=big5">\xa4\xa4'
        )
        cs, pos = charset.detect_charset(body, None)
        assert (cs, pos) == ("Big5", "html")

    def test_conflict_iso_header_loses(self):
        body = b'<meta charset="utf8">\xff\xfe invalid'
        cs, pos = charset.detect_charset(body, "text/html; charset=ISO-8859-1")
        assert (cs, pos) == ("UTF-8", "html")

    def test_conflict_header_wins(self):
        body = b'<meta charset="big5">\xd6\xd0'
        cs, pos = charset.detect_charset(body, "text/html; charset=gbk")
        assert (cs, pos) == ("GBK", "header")

    def test_both_html_tags_earliest_wins(self):
        body = (
            b'<meta charset="big5"><meta http-equiv="content-type" '
            b'content="text/html; charset=gbk">\xd6\xd0'
        )
        cs, pos = charset.detect_charset(body, None)
        assert (cs, pos) == ("Big5", "html")

    def test_alias_normalization(self):
        assert charset.convert_charset("utf8") == "UTF-8"
        assert charset.convert_charset("GB2312") == "GBK"
        assert charset.convert_charset("gb18030") == "GBK"
        assert charset.convert_charset("BIG5-HKSCS") == "Big5"
        assert charset.convert_charset("Shift-JIS") == "SHIFT_JIS"

    def test_guess(self):
        body = "中文内容没有任何标签提示编码信息".encode("gbk")
        cs, pos = charset.detect_charset(body, None)
        assert pos == "guess"
        assert cs == "GBK"

    def test_to_utf8_roundtrip(self):
        s = "中文转码测试"
        assert charset.to_utf8(s.encode("gbk"), "GBK") == s
        assert charset.to_utf8(b"\xff\xff\xff", "UTF-8") is None


ZH_GOOD = "今天上午，市政府召开了关于城市交通治理的专题会议，与会代表就公共交通优化方案进行了深入讨论。" * 3
EN_GOOD = (
    "The committee met this morning to discuss the proposed changes to the "
    "public transportation system and the members agreed that more work was needed."
)
FR_GOOD = (
    "Le gouvernement a annoncé une série de mesures pour améliorer la qualité "
    "de l'air dans les grandes villes et les représentants des associations ont "
    "salué cette décision très attendue après des années de débats."
)
JA_MIXED = "政府は今日、新しい交通政策を発表しました。これにより、市民の生活はより便利になるでしょう。" * 3
KO_TEXT = "정부는 오늘 새로운 교통 정책을 발표했습니다 시민들은 이번 결정을 환영했습니다 교통 체증이 줄어들 것으로 기대됩니다"
RU_TEXT = (
    "Правительство объявило сегодня о новых мерах по улучшению качества "
    "воздуха в крупных городах страны и эксперты поддержали это решение"
)
AR_TEXT = "أعلنت الحكومة اليوم عن مجموعة من الإجراءات الجديدة لتحسين جودة الهواء في المدن الكبرى ورحب الخبراء بهذا القرار المهم"
HI_TEXT = "सरकार ने आज बड़े शहरों में वायु गुणवत्ता में सुधार के लिए नए उपायों की घोषणा की और विशेषज्ञों ने इस निर्णय का स्वागत किया है"


class TestLangid:
    def test_charset_shortcut(self):
        assert langid.detect_lang("anything", charset="GBK") == ("zh", "charset")
        assert langid.detect_lang("anything", charset="EUC-KR") == ("ko", "charset")

    def test_title_zh(self):
        lang, pos = langid.detect_lang(ZH_GOOD, title="中国新闻网_新闻中心")
        assert (lang, pos) == ("zh", "title")

    def test_title_ja_override(self):
        lang, pos = langid.detect_lang(JA_MIXED, title="日本語新聞")
        assert (lang, pos) == ("ja", "title")

    def test_meta_hint(self):
        assert langid.detect_lang("x", meta_lang="fr-FR") == ("fr", "html")
        # en meta hint is NOT trusted → falls through to body analysis
        lang, pos = langid.detect_lang(EN_GOOD, meta_lang="en")
        assert (lang, pos) == ("en", "body")

    def test_body_zh(self):
        assert langid.lang_from_text(ZH_GOOD) == ("zh", "body")

    def test_body_ja(self):
        assert langid.lang_from_text(JA_MIXED) == ("ja", "body")

    def test_body_en(self):
        assert langid.lang_from_text(EN_GOOD) == ("en", "body")

    def test_body_fr_lingua_branch(self):
        lang, pos = langid.lang_from_text(FR_GOOD)
        assert (lang, pos) == ("fr", "lingua")

    def test_body_nonlatin(self):
        assert langid.lang_from_text(RU_TEXT) == ("ru", "lingua")
        assert langid.lang_from_text(AR_TEXT) == ("ar", "lingua")
        assert langid.lang_from_text(HI_TEXT) == ("hi", "lingua")
        assert langid.lang_from_text(KO_TEXT) == ("ko", "lingua")

    def test_too_short(self):
        assert langid.lang_from_text("short text") == ("", "")

    def test_chunk_cap(self):
        # only the first 2048 sign-stripped runes are analyzed
        text = EN_GOOD * 100 + ZH_GOOD * 100
        assert langid.lang_from_text(text) == ("en", "body")


class TestKeepDrop:
    def test_zh_content(self):
        assert keepdrop.classify_text("市政府召开专题会议讨论交通治理方案", "zh") == "content"

    def test_zh_short_punct_rescue(self):
        assert keepdrop.classify_text("你好，世界啊真好", "zh") == "content"
        # >5 han, <8 runes, with zh punctuation → content
        assert keepdrop.classify_text("快讯：股市大涨", "zh") == "content"

    def test_zh_list(self):
        assert keepdrop.classify_text("新闻中心", "zh") == "list"

    def test_zh_none_and_whitelist(self):
        assert keepdrop.classify_text("latest news", "zh") == "none"
        assert keepdrop.classify_text("NBA", "zh") == "list"

    def test_word_lang(self):
        assert keepdrop.classify_text("Mayor survives assassination attempt in January", "en") == "content"
        assert keepdrop.classify_text("Home page", "en") == "list"
        assert keepdrop.classify_text("123 456", "en") == "none"

    def test_other_lang(self):
        assert keepdrop.classify_text("こんにちは世界、今日はいい天気", "ja") == "content"
        assert keepdrop.classify_text("こんにちは", "ja") == "list"

    def test_blacklist(self):
        assert keepdrop.is_blacklisted_zh("增值电信业务经营许可证 B2-123", "zh")
        assert not keepdrop.is_blacklisted_zh("正常的新闻标题内容", "zh")

    def test_decide_keep(self):
        m = quality.compute_metrics(ZH_GOOD)
        keep, reason, label = keepdrop.decide(ZH_GOOD, "zh", m)
        assert keep and reason == "" and label == "content"

    def test_decide_drop_codec(self):
        m = quality.compute_metrics(ZH_GOOD)
        assert keepdrop.decide(ZH_GOOD, "zh", m, codec_ok=False) == (False, "bad_codec", "none")

    def test_decide_drop_too_short(self):
        m = quality.compute_metrics("hi")
        assert keepdrop.decide("hi", "", m)[1] == "too_short"

    def test_decide_drop_boilerplate(self):
        text = "\n".join(["same line here"] * 10)
        m = quality.compute_metrics(text)
        keep, reason, _ = keepdrop.decide(text, "en", m)
        assert not keep and reason == "boilerplate"

    def test_decide_drop_dynamic(self):
        text = "{a} {b} {c} {d} {e} " + EN_GOOD
        m = quality.compute_metrics(text)
        keep, reason, _ = keepdrop.decide(text, "en", m)
        assert not keep and reason == "dynamic_render"


class TestQuality:
    def test_leaf_var_special_cases(self):
        assert quality.leaf_var([]) == 0.0
        assert quality.leaf_var([10]) == 5.0
        assert quality.leaf_var([2, 4]) == 1.0

    def test_cepf_score_shape(self):
        s = quality.cepf_score([40, 42, 38], 120.0, 120, 0, 3)
        assert s > 0
        assert math.isfinite(s)

    def test_metrics_basic(self):
        m = quality.compute_metrics("Hello, world!\nSecond line.\n")
        assert m.n_lines == 2
        assert m.text_len == len("Hello, world!\nSecond line.\n")
        assert 0 < m.punct_ratio < 0.3
        assert m.max_line_dup == 0.5

    def test_metrics_dup(self):
        m = quality.compute_metrics("\n".join(["x"] * 8))
        assert m.max_line_dup == 1.0


class TestScrub:
    # /root/reference/extract/icp_test.go:6-14
    @pytest.mark.parametrize(
        "text,icp,loc",
        [
            ("粤ICP备17055554号", "粤ICP备17055554", "粤"),
            ("粤ICP备17055554-34号", "粤ICP备17055554", "粤"),
            ("沪ICP备05018492", "沪ICP备05018492", "沪"),
            ("粤B2-20090059", "粤B2-20090059", "粤"),
            ("京公网安备31010402001073号", "京公网安备31010402001073", "京"),
            ("京公网安备-31010-4020010-73号", "", ""),
            ("鲁ICP备05002386鲁公网安备37070502000027号", "鲁ICP备05002386", "鲁"),
        ],
    )
    def test_icp_from_text(self, text, icp, loc):
        assert scrub.icp_from_text(text) == (icp, loc)

    def test_icp_province(self):
        assert scrub.icp_province("粤") == "广东"
        assert scrub.icp_province("京") == "北京"
        assert scrub.icp_province("?") == ""

    def test_scrub_email_url(self):
        s, found = scrub.scrub_text("contact me at a.b@example.com or https://example.com/x?q=1 now")
        assert s == "contact me at <EMAIL> or <URL> now"
        assert [f["kind"] for f in found] == ["email", "url"]
        assert found[0]["value"] == "a.b@example.com"

    def test_scrub_phone_id(self):
        s, found = scrub.scrub_text("call 13812345678 id 110101199003071234 ssn 123-45-6789")
        kinds = {f["kind"] for f in found}
        assert "phone_cn" in kinds and "id_cn" in kinds and "ssn" in kinds
        assert "13812345678" not in s and "110101199003071234" not in s

    def test_scrub_deterministic(self):
        text = "粤ICP备17055554号 and foo@bar.com twice foo@bar.com"
        s1, f1 = scrub.scrub_text(text)
        s2, f2 = scrub.scrub_text(text)
        assert s1 == s2 and f1 == f2
        assert s1.count("<EMAIL>") == 2


class TestTitleClean:
    # /root/reference/extract/web_test.go:14-20 shapes
    def test_zh_underscore(self):
        out = titleclean.web_title_clean(
            "“暴徒试图杀死他！”阿拉木图市长在1月5日的暗杀企图中幸存_网易订阅", "zh"
        )
        assert out == textnorm.remove_sign("“暴徒试图杀死他！”阿拉木图市长在1月5日的暗杀企图中幸存")

    def test_zh_multi(self):
        out = titleclean.web_title_clean("北极圈内最高温达到38℃ 北极熊还好吗？南极情况怎么样？_科技频道_中国青年网", "zh")
        assert out == textnorm.remove_sign("北极圈内最高温达到38℃ 北极熊还好吗？南极情况怎么样？")

    def test_en_pipe(self):
        out = titleclean.web_title_clean(
            "About the Project on Nuclear Issues | Center for Strategic and International Studies", "en"
        )
        assert out == "About the Project on Nuclear Issues"

    def test_zh_shouye(self):
        assert titleclean.web_title_clean("首页 - 某某新闻网", "zh") == textnorm.remove_sign("某某新闻网")

    def test_web_title_cap(self):
        assert len(titleclean.web_title("x" * 300)) == 128
        assert titleclean.web_title("a\nb  ", 0) == "ab"

    def test_content_title_clean(self):
        assert titleclean.web_content_title_clean("标题内容_站点名", "zh") == "标题内容"
        assert titleclean.web_content_title_clean("Title: subtitle here", "en") == "Title"


class TestDomains:
    # /root/reference/extract/domain_test.go:8-63
    @pytest.mark.parametrize(
        "host,top",
        [
            ("www.net.cn", "www.net.cn"),
            ("hi.chinanews.com", "chinanews.com"),
            ("a.wh.cn", "wh.cn"),
            ("siat.ac.cn", "siat.ac.cn"),
            ("abc.spring.io", "spring.io"),
            ("abc.spring.ai", "spring.ai"),
            ("www.china-embassy.or.jp", "china-embassy.or.jp"),
            ("legismac.safp.gov.mo", "safp.gov.mo"),
            ("www.gov.cn", "www.gov.cn"),
            ("scopsr.gov.cn", "scopsr.gov.cn"),
            ("usa.gov", "usa.gov"),
            ("bbc.co.uk", "bbc.co.uk"),
            ("dealer.auto.sohu.com", "sohu.com"),
            ("bbs.sohu.com", "sohu.com"),
        ],
    )
    def test_domain_top(self, host, top):
        assert domains.domain_top(host) == top

    # round-3 snapshot widening: multi-label ccTLD suffixes the round-2
    # verdict named as silently mis-split (com.pe, co.ve, com.co) plus the
    # PSL wildcard (*.ck, *.np, *.kh, ...) and exception (!www.ck) rules
    @pytest.mark.parametrize(
        "host,top",
        [
            ("www.elcomercio.com.pe", "elcomercio.com.pe"),
            ("noticias.eluniversal.co.ve", "eluniversal.co.ve"),
            ("www.eltiempo.com.co", "eltiempo.com.co"),
            ("portal.gob.pe", "portal.gob.pe"),
            ("a.b.com.uy", "b.com.uy"),
            ("site.com.np", "site.com.np"),      # *.np wildcard
            ("x.y.anything.np", "y.anything.np"),  # wildcard: any 2nd label
            ("news.com.kh", "news.com.kh"),      # *.kh wildcard
            ("www.ck", "www.ck"),                # !www.ck: registrable
            ("shop.www.ck", "www.ck"),           # eTLD+1 under the exception
            ("foo.other.ck", "foo.other.ck"),
        ],
    )
    def test_widened_psl(self, host, top):
        assert domains.domain_top(host) == top

    # round-4 full-list embed: suffixes the curated snapshot lacked — rare
    # ccTLD second/third levels, US locality four-label rules, jp geo rules
    # (aichi.jp exact, *.kawasaki.jp wildcard with !city.kawasaki.jp), the
    # PSL private section (icann=False), and a unicode (punycode) rule
    @pytest.mark.parametrize(
        "host,top,icann",
        [
            ("www.canberra.act.edu.au", "canberra.act.edu.au", True),
            ("x.dhaka.gov.bd", "dhaka.gov.bd", True),      # *.bd wildcard
            ("school.pvt.k12.ma.us", "school.pvt.k12.ma.us", True),
            ("news.daily.co.zm", "daily.co.zm", True),
            ("www.uni.edu.mv", "uni.edu.mv", True),
            ("portal.health.org.mw", "health.org.mw", True),
            ("www.minsal.gob.cl", "minsal.gob.cl", True),
            ("x.president.gov.mn", "president.gov.mn", True),
            ("fon.ac.rs", "fon.ac.rs", True),
            ("kaznu.edu.kz", "kaznu.edu.kz", True),
            ("www.times.com.fj", "times.com.fj", True),
            ("maps.web.tr", "maps.web.tr", True),
            ("jornal.co.ao", "jornal.co.ao", True),
            ("ecole.ed.ci", "ecole.ed.ci", True),
            ("shop.com.gu", "shop.com.gu", True),
            ("min.gov.kg", "min.gov.kg", True),
            ("bank.com.mt", "bank.com.mt", True),
            ("lib.org.tj", "lib.org.tj", True),
            ("a.b.pref.aichi.jp", "pref.aichi.jp", True),  # aichi.jp exact
            ("w.x.kawasaki.jp", "w.x.kawasaki.jp", True),  # *.kawasaki.jp
            ("www.city.kawasaki.jp", "city.kawasaki.jp", True),  # !city.
            ("myblog.blogspot.com", "myblog.blogspot.com", False),  # private
            ("proj.github.io", "proj.github.io", False),            # private
        ],
    )
    def test_full_psl_embed(self, host, top, icann):
        d = domains.domain_parse(host)
        assert d is not None and d.top() == top
        assert d.icann is icann

    def test_full_psl_unicode_and_punycode_forms(self):
        # a unicode PSL rule must match in both forms ("中国" TLD)
        assert domains.public_suffix("example.中国")[0] == "中国"
        assert domains.public_suffix("example.xn--fiqs8s")[0] == "xn--fiqs8s"

    def test_wildcard_exception_www_ck(self):
        # !www.ck: www.ck is registrable (suffix is plain "ck"), while any
        # other x.ck is itself a public suffix
        d = domains.domain_parse("www.ck")
        assert d is not None and (d.domain, d.tld) == ("www", "ck")
        assert domains.domain_parse("other.ck") is None

    def test_domain_parse_parts(self):
        d = domains.domain_parse("dealer.auto.sohu.com")
        assert (d.subdomain, d.domain, d.tld) == ("dealer.auto", "sohu", "com")
        assert domains.domain_parse("com") is None
        assert domains.domain_parse("") is None

    # /root/reference/extract/meta_test.go:5-17 (lang="")
    @pytest.mark.parametrize(
        "host,expected",
        [
            ("matichon.co.th", ("", "", "")),
            ("wanbao.com.sg", ("", "", "")),
            ("archives.gov.mo", ("中国", "", "政务")),
            ("mfa.gov.sg", ("新加坡", "", "政务")),
            ("nasa.gov", ("美国", "", "政务")),
        ],
    )
    def test_meta_from_host(self, host, expected):
        assert domains.meta_from_host(host, "") == expected

    def test_meta_from_host_lang(self):
        assert domains.meta_from_host("news.sina.com.cn", "zh") == ("中国", "", "")
        assert domains.meta_from_host("example.co.jp", "ja") == ("日本", "", "")
        assert domains.meta_from_host("archives.gov.mo", "zh") == ("中国", "中国澳门", "政务")


class TestUrlFilter:
    BASE = "http://www.163.com/a/b/"

    def test_relative_resolution(self):
        u, reason = urlfilter.filter_url("./c/123.html", self.BASE, True)
        assert reason == "" and u == "http://www.163.com/a/b/c/123.html"
        u, reason = urlfilter.filter_url("../c/123.html", self.BASE, True)
        assert reason == "" and u == "http://www.163.com/a/c/123.html"
        u, reason = urlfilter.filter_url("/c/123.html", self.BASE, True)
        assert reason == "" and u == "http://www.163.com/c/123.html"

    def test_protocol_relative(self):
        u, reason = urlfilter.filter_url("//www.163.com/c/123.html", self.BASE, True)
        assert reason == "" and u == "http://www.163.com/c/123.html"

    def test_suffix_reject(self):
        _, reason = urlfilter.filter_url("//www.163.com/c/123.pdf?abc=1123", self.BASE, True)
        assert reason == "invalid url with suffix"

    def test_illegal_chars(self):
        _, reason = urlfilter.filter_url("http://a.com/x{y}", self.BASE, False)
        assert reason == "invalid url with illegal characters"

    def test_port_and_ip(self):
        _, reason = urlfilter.filter_url("http://a.163.com:8080/x/1.html", self.BASE, False)
        assert reason == "invalid url with not 80 port"
        _, reason = urlfilter.filter_url("http://1.2.3.4/x/1.html", self.BASE, False)
        assert reason == "invalid url with ip hostname"

    def test_strict_domain(self):
        _, reason = urlfilter.filter_url("http://www.sohu.com/x/1.html", self.BASE, True)
        assert reason == "invalid url with strict domain"
        _, reason = urlfilter.filter_url("http://news.163.com/x/1.html", self.BASE, True)
        assert reason == ""

    def test_publish_date_path(self):
        assert urlfilter.has_publish_date_path("/2024/01/15/slug.html")
        assert urlfilter.has_publish_date_path("/news/2024-01-15/slug.html")
        assert not urlfilter.has_publish_date_path("/about/team.html")

    def test_default_path(self):
        assert urlfilter.is_default_path("/")
        assert urlfilter.is_default_path("")
        assert urlfilter.is_default_path("/index.html")
        assert not urlfilter.is_default_path("/news/index.html")


class TestSimilarity:
    def test_identity(self):
        assert similarity.similarity_text("abc", "abc") == 1.0

    def test_disjoint(self):
        assert similarity.similarity_text("abc", "xyz") == 0.0

    def test_max_similarity_first_wins(self):
        i, s = similarity.max_similarity("abcd", ["abcd", "abcd", "zzzz"])
        assert i == 0 and s == 1.0

    def test_threshold(self):
        assert similarity.title_sim_threshold("zh") == 0.3
        assert similarity.title_sim_threshold("en") == 0.5


class TestGopher:
    """Hand-computed cases for the published Gopher rule bank (independent
    of the shared-function fixture oracle, which pins plumbing not math)."""

    def test_dup_fracs(self):
        from spiderray.functions.gopher import _dup_fracs

        # "aa" ×3 + "b": 2 duplicate units of 4, dup chars 6 of 7
        frac, cfrac = _dup_fracs(["aa", "aa", "aa", "b"])
        assert frac == 2 / 4 and cfrac == 6 / 7
        assert _dup_fracs([]) == (0.0, 0.0)
        assert _dup_fracs(["x", "y"]) == (0.0, 0.0)

    def test_top_ngram_frac(self):
        from spiderray.functions.gopher import _top_ngram_frac

        words = "a b a b a b c".split()
        text_len = len("a b a b a b c")
        # top 2-gram ("a","b") occurs 3×, 2 chars per occurrence
        assert _top_ngram_frac(words, 2, text_len) == 3 * 2 / text_len
        # the paper's signal has no repetition requirement: a single
        # occurrence still contributes its characters
        assert _top_ngram_frac("x y z".split(), 2, 5) == 2 / 5

    def test_dup_ngram_coverage_counts_each_word_once(self):
        from spiderray.functions.gopher import _dup_ngram_frac

        # "p q r p q r p q r": the 2-gram coverage marks every word once
        # even though occurrences overlap
        words = "p q r p q r p q r".split()
        text_len = len("p q r p q r p q r")
        assert _dup_ngram_frac(words, 2, text_len) == 9 / text_len
        assert _dup_ngram_frac("a b c d".split(), 2, 7) == 0.0

    def test_quality_signals(self):
        from spiderray.functions.gopher import quality_signals

        q = quality_signals("• one\n• two\nplain line...\n")
        assert q["bullet_line_frac"] == 2 / 3
        assert q["ellipsis_line_frac"] == 1 / 3
        q2 = quality_signals("The cat, with a hat, must have been of note.")
        # the, with, have, of  (punctuation stripped before matching)
        assert q2["n_stopwords"] == 4
        assert quality_signals("12 34 x1")["alpha_word_frac"] == 1 / 3
        assert quality_signals("")["n_words"] == 0

    def test_decide_first_failing_rule_order(self):
        from spiderray.functions.gopher import gopher_doc

        # line-dup fires before the quality rules even though both fail
        d = gopher_doc("\n".join(["same line here"] * 10))
        assert not d["gopher_keep"] and d["gopher_reason"] == "dup_line_frac"
        # a clean long document with stopwords keeps
        good = ("the be to of and that have with " +
                "word " * 60).strip()
        d2 = gopher_doc(good)
        # repeated "word word" bigram dominates -> repetition catches it
        assert d2["gopher_reason"] == "top_2gram_char_frac"
        varied = ("the be to of and that have with " + " ".join(
            f"w{i}x" for i in range(60)))
        d3 = gopher_doc(varied)
        assert d3["gopher_keep"] and d3["gopher_reason"] == ""

    def test_stage_flag_and_filter(self, ray_session):
        import ray.data as rd

        from spiderray.stages.quality_stage import gopher_stage

        varied = ("the be to of and that have with " + " ".join(
            f"w{i}x" for i in range(60)))
        ds = rd.from_items([
            {"doc_id": 1, "text": varied},
            {"doc_id": 2, "text": "too short"},
        ])
        out = gopher_stage(ds).to_pandas().set_index("doc_id")
        assert bool(out.loc[1, "gopher_keep"]) and not bool(out.loc[2, "gopher_keep"])
        kept = gopher_stage(ds, mode="filter").to_pandas()
        assert kept.doc_id.tolist() == [1]

    def test_stage_bad_mode(self, ray_session):
        import pytest
        import ray.data as rd

        from spiderray.stages.quality_stage import gopher_stage

        with pytest.raises(ValueError, match="mode"):
            gopher_stage(rd.from_items([{"text": "x"}]), mode="nope")


class TestC4:
    """Published C4 rules (Raffel et al. §2.2): line filter, page filter,
    and the global three-sentence-span dedup operator."""

    def test_clean_lines(self):
        from spiderray.functions.c4 import clean_lines

        text = ("Good line with words here.\n"
                "no terminal punctuation\n"
                "two words.\n"
                "please enable JavaScript to view.\n"
                'Quoted line ends with quote."')
        out = clean_lines(text).split("\n")
        assert out == ["Good line with words here.",
                       'Quoted line ends with quote."']

    def test_page_keep_rules_in_order(self):
        from spiderray.functions.c4 import page_keep

        five = "One sentence here now. " * 5
        assert page_keep(five.strip()) == (True, "")
        assert page_keep("One. Two.")[1] == "min_sentences"
        assert page_keep(five + "lorem ipsum text.")[1] == "lorem_ipsum"
        assert page_keep(five + "code { brace.")[1] == "curly_brace"
        assert page_keep(five + "verboten word.", ("verboten",))[1] == "badword"

    def test_span_hash_normalizes(self):
        from spiderray.functions.c4 import span_hash

        a = span_hash(["Hello   World.", "Second one."])
        b = span_hash(["hello world.", "second ONE."])
        assert a == b

    def test_remove_spans_overlapping(self):
        from spiderray.functions.c4 import remove_spans

        text = "S0 a. S1 b. S2 c. S3 d. S4 e."
        # spans at 0 and 2 cover sentences 0-4 entirely
        assert remove_spans(text, [0, 2]) == ""
        assert remove_spans(text, [1]) == "S0 a. S4 e."
        assert remove_spans(text, []) == text

    def test_span_dedup_stage(self, ray_session):
        import ray.data as rd

        from spiderray.stages.c4 import c4_span_dedup

        shared = "One two three alpha. Four five six beta. Seven eight nine gamma."
        docs = [
            {"doc_id": 1, "text": shared + " Unique tail here one."},
            {"doc_id": 2, "text": shared + " Different ending words two."},
            {"doc_id": 3, "text": "No duplicates in here at all. Second sentence. Third sentence."},
        ]
        out = c4_span_dedup(rd.from_items(docs)).to_pandas().set_index("doc_id")
        assert out.loc[1, "text"] == docs[0]["text"]  # min-id winner untouched
        assert out.loc[2, "text"] == "Different ending words two."
        assert out.loc[3, "text"] == docs[2]["text"]

    def test_intra_doc_duplicate_span(self, ray_session):
        import ray.data as rd

        from spiderray.stages.c4 import c4_span_dedup

        # the same 3-sentence span twice within ONE doc: second occurrence
        # (higher start) is removed
        span = "Aa bb cc. Dd ee ff. Gg hh ii."
        doc = {"doc_id": 7, "text": span + " Middle unique. " + span}
        out = c4_span_dedup(rd.from_items([doc])).to_pandas()
        assert out.iloc[0]["text"] == span + " Middle unique."

    def test_paragraph_dedup_stage(self, ray_session):
        import ray.data as rd

        from spiderray.stages.c4 import paragraph_dedup

        docs = [
            {"doc_id": 1, "text": "shared header\nunique one\nshared footer"},
            {"doc_id": 2, "text": "shared header\nunique two\nshared footer"},
            {"doc_id": 3, "text": "all mine\n\nstill mine"},
        ]
        out = paragraph_dedup(rd.from_items(docs)).to_pandas().set_index("doc_id")
        assert out.loc[1, "text"] == docs[0]["text"]  # min-id winner untouched
        assert out.loc[2, "text"] == "unique two"
        assert out.loc[3, "text"] == docs[2]["text"]  # empty para preserved

    def test_paragraph_dedup_intra_doc_and_empty(self, ray_session):
        import ray.data as rd

        from spiderray.stages.c4 import paragraph_dedup

        doc = {"doc_id": 9, "text": "dup\n\ndup\nkeep\ndup"}
        out = paragraph_dedup(rd.from_items([doc])).to_pandas()
        # first occurrence wins; empty line is structure, never a candidate
        assert out.iloc[0]["text"] == "dup\n\nkeep"

    def test_paragraph_dedup_string_ids(self, ray_session):
        import ray.data as rd

        from spiderray.stages.c4 import paragraph_dedup

        docs = [{"doc_id": "b", "text": "x\ny"}, {"doc_id": "a", "text": "x\nz"}]
        out = paragraph_dedup(rd.from_items(docs)).to_pandas().set_index("doc_id")
        assert out.loc["a", "text"] == "x\nz"  # 'a' < 'b' wins the dup
        assert out.loc["b", "text"] == "y"

    def test_filter_stage_modes(self, ray_session):
        import pytest
        import ray.data as rd

        from spiderray.stages.c4 import c4_filter_stage

        good = "\n".join(["A full sentence line here."] * 6)
        ds = rd.from_items([{"doc_id": 1, "text": good},
                            {"doc_id": 2, "text": "short."}])
        out = c4_filter_stage(ds).to_pandas().set_index("doc_id")
        assert bool(out.loc[1, "c4_keep"]) and not bool(out.loc[2, "c4_keep"])
        kept = c4_filter_stage(ds, mode="filter").to_pandas()
        assert kept.doc_id.tolist() == [1]
        with pytest.raises(ValueError, match="mode"):
            c4_filter_stage(ds, mode="x")

    def test_span_dedup_string_ids(self, ray_session):
        # review regression: the id→bucket tagging must accept non-integer
        # ids (urls) like the span exchange already did
        import ray.data as rd

        from spiderray.stages.c4 import c4_span_dedup

        shared = "One two three alpha. Four five six beta. Seven eight nine gamma."
        docs = [{"url": "a.com/1", "text": shared + " Unique tail here one."},
                {"url": "b.com/2", "text": shared + " Different ending words two."}]
        out = c4_span_dedup(
            rd.from_items(docs), id_col="url").to_pandas().set_index("url")
        assert out.loc["a.com/1", "text"] == docs[0]["text"]
        assert out.loc["b.com/2", "text"] == "Different ending words two."

    def test_badwords_case_folded(self):
        # review regression: mixed-case blocklist entries must still match
        from spiderray.functions.c4 import page_keep

        five = "One sentence here now. " * 5
        assert page_keep(five + "verboten word.", ("Verboten",))[1] == "badword"


class TestCompressionSignals:
    def test_repetition_vs_prose_vs_noise(self):
        import hashlib

        from spiderray.functions.quality import compression_signals

        spam = compression_signals("spam " * 300)
        assert spam["comp_ratio"] < 0.05
        prose = compression_signals(
            "A different sentence with varied words appears here. " * 10)
        assert 0.05 < prose["comp_ratio"] < 0.8
        noise = "".join(
            bytes(33 + b % 94 for b in hashlib.md5(bytes([k])).digest()).decode()
            for k in range(64))
        rnd = compression_signals(noise)
        assert rnd["char_entropy"] > 5.5
        assert rnd["comp_ratio"] > 0.7
        assert compression_signals("")["n_bytes"] == 0

    def test_batch_flags_and_degraded_corpus(self):
        import pyarrow as pa

        from spiderray.stages.quality_stage import (compression_signals_batch,
                                                    degraded_docs_batch)

        ids = list(range(30))
        batch = pa.table({"doc_id": ids,
                          "text": ["plain words here mixed evenly"] * 30})
        out = compression_signals_batch(degraded_docs_batch(batch)).to_pandas()
        for _, r in out.iterrows():
            n = int(r["doc_id"])
            if n % 7 == 0:
                assert r["too_repetitive"] and not r["too_random"], n
            elif n % 11 == 0:
                assert r["too_random"] and not r["too_repetitive"], n
            else:
                assert not r["too_repetitive"] and not r["too_random"], n


class TestUnicodeNormalizeStage:
    def test_forms_and_flag(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.textnorm_stage import unicode_normalize_stage

        rows = pa.table({
            "doc_id": [1, 2, 3, 4],
            "text": ["Café", "plain ascii", "ﬁne ｗｉｄｅ", "Caf\xe9"],
        })
        nfc = unicode_normalize_stage(rd.from_arrow(rows), "text", "NFC") \
            .to_pandas().sort_values("doc_id")
        assert list(nfc["text"]) == ["Caf\xe9", "plain ascii", "ﬁne ｗｉｄｅ", "Caf\xe9"]
        assert list(nfc["was_denormalized"]) == [True, False, False, False]
        nfkc = unicode_normalize_stage(rd.from_arrow(rows), "text", "NFKC") \
            .to_pandas().sort_values("doc_id")
        assert list(nfkc["text"]) == ["Caf\xe9", "plain ascii", "fine wide", "Caf\xe9"]

    def test_bad_form_raises(self):
        import pyarrow as pa
        import pytest

        from spiderray.stages.textnorm_stage import unicode_normalize_batch

        with pytest.raises(ValueError):
            unicode_normalize_batch(pa.table({"text": ["x"]}), "text", "NFX")


class TestParagraphDedupBloom:
    def test_cuts_prior_paragraphs(self, ray_session):
        import ray.data as rd

        from spiderray.stages.c4 import paragraph_dedup_bloom

        prior = rd.from_items([
            {"doc_id": 1, "text": "shipped para one\nshipped para two"}])
        new = rd.from_items([
            {"doc_id": 10, "text": "shipped para one\nfresh content here"},
            {"doc_id": 11, "text": "all fresh\nnothing shipped"},
        ])
        out = paragraph_dedup_bloom(new, prior).to_pandas().set_index("doc_id")
        assert out.loc[10, "text"] == "fresh content here"
        assert out.loc[10, "n_cut_paras"] == 1
        assert bool(out.loc[10, "had_prior_para"])
        assert out.loc[11, "text"] == "all fresh\nnothing shipped"
        assert out.loc[11, "n_cut_paras"] == 0

    def test_empty_lines_survive(self, ray_session):
        import ray.data as rd

        from spiderray.stages.c4 import paragraph_dedup_bloom

        prior = rd.from_items([{"doc_id": 1, "text": "dup"}])
        new = rd.from_items([{"doc_id": 2, "text": "dup\n\nkeep"}])
        out = paragraph_dedup_bloom(new, prior).to_pandas()
        assert out.iloc[0]["text"] == "\nkeep"

    def test_distributed_build_matches_serial(self, ray_session):
        import ray.data as rd

        from spiderray.functions.bloom import BloomFilter, build_bloom_distributed

        paras = [f"para number {i}" for i in range(5000)]
        ds = rd.from_items([{"para": p} for p in paras]).repartition(8)
        dist = build_bloom_distributed(ds, "para", len(paras), bits_per_key=12)
        ser = BloomFilter(len(paras), bits_per_key=12)
        ser.add_many(paras)
        assert (dist.bits == ser.bits).all()  # OR-merge is order-insensitive

    def test_fp_rate_bounded(self, ray_session):
        import ray.data as rd

        from spiderray.stages.c4 import paragraph_dedup_bloom

        prior = rd.from_items(
            [{"doc_id": i, "text": f"prior {i}"} for i in range(2000)])
        new = rd.from_items(
            [{"doc_id": 10_000 + i, "text": f"novel {i}"} for i in range(2000)])
        out = paragraph_dedup_bloom(new, prior).to_pandas()
        # 12 bits/key, 7 hashes → FP ~3e-4; 2000 novel paras → expect ~0-3
        assert out.had_prior_para.sum() <= 10


class TestReadability:
    def test_known_values(self):
        from spiderray.functions.quality import readability_stats

        # 6 words, 2 sentence runs, syllables: the(1) cat(1) sat(1)
        # it(1) was(1) happy(2) = 7 → fk = .39*3 + 11.8*(7/6) − 15.59
        n_w, n_s, n_y, fk = readability_stats("The cat sat. It was happy!")
        assert (n_w, n_s, n_y) == (6, 2, 7)
        import math
        want = math.floor((0.39 * 3.0 + 11.8 * (7 / 6) - 15.59) * 1000 + 0.5)
        assert fk == want

    def test_vowelless_word_counts_one_syllable(self):
        from spiderray.functions.quality import readability_stats

        assert readability_stats("xyz qrs")[2] == 2

    def test_no_sentence_breaks_floors_at_one(self):
        from spiderray.functions.quality import readability_stats

        assert readability_stats("plain words no punctuation")[1] == 1

    def test_empty(self):
        from spiderray.functions.quality import readability_stats

        assert readability_stats("") == (0, 0, 0, 0)
        assert readability_stats(None) == (0, 0, 0, 0)
