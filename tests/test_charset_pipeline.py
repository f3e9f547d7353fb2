"""End-to-end charset path (F5): clips whose transcript arrives as undecoded
bytes in a sibling binary column — detect → transcode → language cascade —
vs the oracle."""

import pyarrow as pa
import pytest

from spiderray.config import PipelineConfig
from spiderray.oracle import oracle_rows
from spiderray.pipelines.quality_filter import quality_filter

ZH = "今天上午市政府召开了关于城市交通治理的专题会议，与会代表就公共交通优化方案进行了深入讨论。" * 2
ZH_TRAD = "政府今日宣布一系列改善空氣品質的措施，專家對這項決定表示歡迎，市民也給予正面回應。" * 2
JA = "政府は今日、新しい交通政策を発表しました。これにより市民の生活は便利になるでしょう。" * 3
KO = "정부는 오늘 새로운 교통 정책을 발표했습니다 시민들은 이번 결정을 환영했습니다 " * 2
EN = "The committee met this morning to discuss the proposed changes in detail. " * 2


def _rows():
    cases = [
        ("c0", ZH.encode("gbk"), "text/html; charset=gbk"),            # header
        ("c1", ZH_TRAD.encode("big5"), None),                          # guess → Big5
        ("c2", JA.encode("shift_jis"), "text/html; charset=shift-jis"),
        ("c3", KO.encode("euc-kr"), "text/html; charset=euc-kr"),
        ("c4", EN.encode("utf-8"), None),                              # valid utf-8
        ("c5", b"\xff\xfe\xfd\xfc invalid bytes \x81\x82", "text/html; charset=utf-8"),  # decode error
        ("c6", ('<meta charset="gb2312">' + ZH).encode("gbk"), None),  # html meta
    ]
    return [
        {
            "clip_id": cid,
            "bytes": b"",
            "sr_hz": 16000,
            "dur_ms": 100,
            "codec": "pcm_s16le",
            "transcript": "",
            "transcript_raw": raw,
            "content_type": ctype,
        }
        for cid, raw, ctype in cases
    ]


@pytest.fixture(scope="module")
def out(ray_session):
    import ray.data as rd

    cfg = PipelineConfig(raw_text_col="transcript_raw")
    ds = rd.from_items(_rows())
    return cfg, quality_filter(ds, cfg).to_pandas().sort_values("clip_id").reset_index(drop=True)


def test_charset_detection_and_lang(out):
    cfg, df = out
    by_id = df.set_index("clip_id")
    # GBK via header → charset→lang shortcut (lang.go:133-139)
    assert by_id.loc["c0", "charset"] == "GBK"
    assert by_id.loc["c0", "charset_pos"] == "header"
    assert (by_id.loc["c0", "lang"], by_id.loc["c0", "lang_pos"]) == ("zh", "charset")
    # Big5 by statistical guess
    assert by_id.loc["c1", "charset"] == "Big5"
    assert by_id.loc["c1", "charset_pos"] == "guess"
    assert by_id.loc["c1", "lang"] == "zh"
    # SHIFT_JIS → ja, EUC-KR → ko
    assert (by_id.loc["c2", "charset"], by_id.loc["c2", "lang"]) == ("SHIFT_JIS", "ja")
    assert (by_id.loc["c3", "charset"], by_id.loc["c3", "lang"]) == ("EUC-KR", "ko")
    # valid UTF-8 goes through body analysis
    assert by_id.loc["c4", "charset_pos"] == "valid"
    assert by_id.loc["c4", "lang"] == "en"
    # transcode failure → charset_error drop
    assert not by_id.loc["c5", "keep"]
    assert by_id.loc["c5", "drop_reason"] == "charset_error"
    # html meta tag detection
    assert by_id.loc["c6", "charset"] == "GBK"
    assert by_id.loc["c6", "charset_pos"] == "html"


def test_matches_oracle(out):
    cfg, df = out
    expected = oracle_rows(_rows(), cfg)
    expected.sort(key=lambda r: r["clip_id"])
    for i, exp in enumerate(expected):
        for field in ("charset", "charset_pos", "lang", "lang_pos", "keep", "drop_reason"):
            assert df[field].iloc[i] == exp[field], (exp["clip_id"], field)


def test_decoded_transcript_replaces_raw(out):
    cfg, df = out
    zh_row = df[df.clip_id == "c0"].iloc[0]
    assert zh_row["transcript"] == ZH


class TestCharsetGuessRoundtrip:
    """Statistical guess correctness matrix: text in language L encoded with
    codec C must be guessed back as C (the chardet-replacement contract;
    round-2 additions: Cyrillic codecs, accented-Latin evidence, C1-control
    penalty, word-structure gate for single-byte codecs)."""

    SAMPLES = {
        "zh": ("今天的新闻发布会上政府宣布了一系列改善空气质量的措施，专家对此表示欢迎。" * 3,
               [("gb18030", "GBK"), ("utf-8", "UTF-8")]),
        "zht": ("今天的新聞發布會上政府宣布了一系列改善空氣質量的措施，專家對此表示歡迎。" * 3,
                [("big5", "Big5"), ("utf-8", "UTF-8")]),
        "ja": ("政府は本日、大都市の大気質を改善するための一連の対策を発表しました。" * 3,
               [("shift_jis", "SHIFT_JIS"), ("euc_jp", "EUC-JP"), ("utf-8", "UTF-8")]),
        "ko": ("정부는 오늘 대도시의 공기 질을 개선하기 위한 새로운 조치를 발표했다." * 3,
               [("euc_kr", "EUC-KR"), ("utf-8", "UTF-8")]),
        "ru": ("Правительство объявило сегодня о новых мерах по улучшению качества воздуха." * 3,
               [("windows-1251", "WINDOWS-1251"), ("koi8-r", "KOI8-R"), ("utf-8", "UTF-8")]),
        "fr": ("Le gouvernement a annoncé une série de mesures pour améliorer la qualité. Où ça?" * 3,
               [("latin-1", "ISO-8859-1"), ("utf-8", "UTF-8")]),
    }

    def test_roundtrip_matrix(self):
        from spiderray.functions.charset import charset_guess

        fails = []
        for lang, (text, pairs) in self.SAMPLES.items():
            for codec, name in pairs:
                got = charset_guess(text.encode(codec))
                ok = got == name or (
                    name in ("ISO-8859-1", "WINDOWS-1252")
                    and got in ("ISO-8859-1", "WINDOWS-1252")
                )
                if not ok:
                    fails.append((lang, name, got))
        assert not fails, fails

    def test_ascii_is_utf8(self):
        from spiderray.functions.charset import charset_guess

        assert charset_guess(b"plain ascii text with words") == "UTF-8"

    def test_garble_not_labeled_cyrillic(self):
        # GBK bytes must not be claimed by an anything-decodes Cyrillic codec
        from spiderray.functions.charset import charset_guess

        body = ("今天的新闻发布会上政府宣布了一系列措施。" * 5).encode("gb18030")
        assert charset_guess(body) == "GBK"


class TestRealDetectorPath:
    """Round-4: the charset_normalizer swap-in — the REAL statistical
    detector analog of the reference's chardet dependency
    (charset.go:183-193) — exercised end-to-end, opt-out (the library is
    present in this container)."""

    def test_normalizer_guesses_real_codecs(self):
        from spiderray.functions.charset import charset_guess_normalizer

        assert charset_guess_normalizer(ZH.encode("gbk")) == "GBK"
        assert charset_guess_normalizer(KO.encode("euc_kr")) == "EUC-KR"
        assert charset_guess_normalizer(JA.encode("shift_jis")) == "SHIFT_JIS"

    def test_full_pipeline_with_normalizer_guesser(self, ray_session):
        import ray.data as rd

        cfg = PipelineConfig(raw_text_col="transcript_raw",
                             extra={"charset_guesser": "normalizer"})
        df = (quality_filter(rd.from_items(_rows()), cfg)
              .to_pandas().sort_values("clip_id").reset_index(drop=True))
        by_id = df.set_index("clip_id")
        # the guess rows now come from the real detector; header/meta/valid
        # rows are untouched by the guesser choice
        assert by_id.loc["c1", "charset"] == "Big5"
        assert by_id.loc["c1", "charset_pos"] == "guess"
        assert by_id.loc["c0", "charset_pos"] == "header"
        assert by_id.loc["c4", "charset_pos"] == "valid"
        # engine ≡ oracle under the same guesser config
        expected = oracle_rows(_rows(), cfg)
        expected.sort(key=lambda r: r["clip_id"])
        for i, exp in enumerate(expected):
            for field in ("charset", "charset_pos", "lang", "keep"):
                assert df[field].iloc[i] == exp[field], (exp["clip_id"], field)


class TestMojibake:
    """fix_mojibake kernel + stage (the ftfy problem)."""

    def test_single_and_double_roundtrip(self):
        from spiderray.functions.charset import fix_mojibake

        for t in ("Der Bär — süß! ’q’",
                  "Привет мир",
                  "中文测试文本",
                  "café naïve œuvre"):
            m1 = t.encode("utf-8").decode("latin-1")
            m2 = m1.encode("utf-8").decode("latin-1")
            assert fix_mojibake(m1) == (t, 1)
            assert fix_mojibake(m2) == (t, 2)

    def test_cp1252_path(self):
        from spiderray.functions.charset import fix_mojibake

        t = "quote ’ dash — end"
        m = t.encode("utf-8").decode("cp1252")
        assert fix_mojibake(m) == (t, 1)

    def test_clean_text_untouched(self):
        from spiderray.functions.charset import fix_mojibake

        for t in ("plain ascii",
                  "Île flottante à la crème",
                  "", "日本語の文"):
            assert fix_mojibake(t) == (t, 0)

    def test_badness_scores(self):
        from spiderray.functions.charset import mojibake_badness

        assert mojibake_badness("café normal") == 0
        assert mojibake_badness("cafÃ©") > 0   # A-tilde bigram
        assert mojibake_badness("x\x80y") == 1           # raw C1

    def test_stage_columns_and_ascii_fast_path(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from spiderray.stages.textnorm_stage import fix_mojibake_stage

        t = "süß — end"
        m = t.encode("utf-8").decode("latin-1")
        df = pd.DataFrame({"doc_id": [1, 2, 3],
                           "text": ["pure ascii", m, None]})
        out = (fix_mojibake_stage(rd.from_pandas(df))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert list(out["text"]) == ["pure ascii", t, None]
        assert list(out["moji_passes"]) == [0, 1, 0]
        assert list(out["was_mojibake"]) == [False, True, False]
