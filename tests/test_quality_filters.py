"""Mixed-language consistency detector (stages/quality_stage.
lang_consistency_stats)."""

import pandas as pd
import pytest

from spiderray.stages.quality_stage import lang_consistency_stats


class TestLangConsistency:
    def test_monolingual_clean_mixed_flagged(self, ray_session):
        import ray.data as rd

        en = ("The quick brown fox jumps over the lazy dog and keeps "
              "going through the open field. " * 8)
        zh = "这是一个中文段落，用来测试语言一致性检测器的窗口投票机制。" * 10
        df = pd.DataFrame({"doc_id": [1, 2, 3],
                           "text": [en, en + zh, ""]})
        out = (lang_consistency_stats(rd.from_pandas(df))
               .to_pandas().set_index("doc_id"))
        assert not bool(out.loc[1, "code_switched"])
        assert out.loc[1, "switch_ppm"] == 0
        assert bool(out.loc[2, "code_switched"])
        assert out.loc[2, "n_disagree"] > 0
        assert out.loc[3, "n_windows"] == 0
        assert not bool(out.loc[3, "code_switched"])

    def test_short_windows_undetermined_not_disagreement(self, ray_session):
        import ray.data as rd

        # 300 chars of English: one full 256-char window classifies, the
        # 44-char tail is under the 64-char floor -> undetermined
        en = ("The quick brown fox jumps over the lazy dog again. " * 6)[:300]
        df = pd.DataFrame({"doc_id": [1], "text": [en]})
        out = lang_consistency_stats(rd.from_pandas(df)).to_pandas()
        assert int(out.loc[0, "n_windows"]) == 2
        assert int(out.loc[0, "n_classified"]) == 1
        assert int(out.loc[0, "n_disagree"]) == 0

    def test_window_floor_guard(self, ray_session):
        import ray.data as rd

        ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
        with pytest.raises(ValueError):
            lang_consistency_stats(ds, window_chars=32)
