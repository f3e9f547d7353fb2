"""Parity tests: vectorized batch kernels vs the row-at-a-time oracle
functions (no Ray needed — these exercise the batch fns directly)."""

import numpy as np
import pyarrow as pa

from spiderray.functions import langid, quality
from spiderray.sources.clips import synth_clips_table
from spiderray.stages.langid_stage import LangIdModelActor, batch_detect_lang
from spiderray.stages.quality_stage import batch_metrics

TEXTS = [r["transcript"] for r in synth_clips_table(140, with_audio=False).to_pylist()]
EXTRA = [
    "", "   ", "\n\n\n", "a", "中", "{}" * 10,
    "mixed 中文 English text with ümlauts and ñ characters repeated " * 4,
    "ひらがなとカタカナが混ざった日本語のテキストです。" * 5,
]


def test_batch_detect_lang_parity():
    texts = TEXTS + EXTRA
    langs, poss = batch_detect_lang(texts)
    for i, t in enumerate(texts):
        exp_lang, exp_pos = langid.lang_from_text(t)
        assert (langs[i], poss[i]) == (exp_lang, exp_pos), (i, t[:40])


def test_batch_detect_lang_charset_shortcut():
    texts = ["whatever", "short"]
    langs, poss = batch_detect_lang(texts, charsets=["GBK", "EUC-KR"])
    assert langs.tolist() == ["zh", "ko"]
    assert poss.tolist() == ["charset", "charset"]
    # non-UTF charset with no map entry → no body analysis
    langs, poss = batch_detect_lang([TEXTS[0]], charsets=["ISO-8859-1"])
    assert langs.tolist() == [""]


def test_batch_metrics_parity():
    texts = TEXTS + EXTRA
    got = batch_metrics(texts)
    for i, t in enumerate(texts):
        exp = quality.compute_metrics(t)
        assert got["text_len"][i] == exp.text_len
        assert got["n_lines"][i] == exp.n_lines
        np.testing.assert_allclose(got["punct_ratio"][i], exp.punct_ratio)
        np.testing.assert_allclose(got["symbol_ratio"][i], exp.symbol_ratio)
        np.testing.assert_allclose(got["digit_ratio"][i], exp.digit_ratio)
        np.testing.assert_allclose(got["space_ratio"][i], exp.space_ratio)
        np.testing.assert_allclose(got["max_line_dup"][i], exp.max_line_dup)
        np.testing.assert_allclose(got["line_len_var"][i], exp.line_len_var)
        np.testing.assert_allclose(got["quality_score"][i], exp.quality_score)
        assert got["brace_pairs"][i] == exp.brace_pairs
        assert got["han_count"][i] == exp.han_count
        assert got["word_count"][i] == exp.word_count


def test_langid_model_actor_smoke():
    actor = LangIdModelActor()
    batch = pa.table({"transcript": [
        "le gouvernement a annoncé une série de mesures pour la qualité",
        "die regierung hat eine reihe von maßnahmen angekündigt",
        "el gobierno anunció medidas para mejorar la calidad",
    ], "lang_pos": ["lingua", "lingua", "lingua"]})
    out = actor(batch)
    assert out.column("lang_model").to_pylist() == ["fr", "de", "es"]
    assert all(c > 0 for c in out.column("lang_conf").to_pylist())


class TestRealModelSwapIn:
    """Opt-in real-model hooks (north_rule names fastText lid.176 + KenLM).
    The real-file tests skip unless model files are provided via env vars;
    the negative tests always run: a CONFIGURED path with the package
    missing must fail loudly, never fall back to the toy model."""

    def test_fasttext_path_without_package_fails_loudly(self):
        import importlib.util

        import pytest

        from spiderray.config import PipelineConfig
        from spiderray.stages.langid_stage import LangIdModelActor

        if importlib.util.find_spec("fasttext") is not None:
            pytest.skip("fasttext installed; negative test not applicable")
        cfg = PipelineConfig(extra={"fasttext_model_path": "/nonexistent/lid.176.bin"})
        with pytest.raises(ImportError):
            LangIdModelActor(cfg)

    def test_kenlm_paths_without_package_fails_loudly(self):
        import importlib.util

        import pytest

        from spiderray.config import PipelineConfig
        from spiderray.stages.perplexity_stage import PerplexityActor

        if importlib.util.find_spec("kenlm") is not None:
            pytest.skip("kenlm installed; negative test not applicable")
        cfg = PipelineConfig(extra={"kenlm_model_paths": {"en": "/nonexistent/en.bin"}})
        with pytest.raises(ImportError):
            PerplexityActor(cfg)

    def test_real_fasttext_model(self):
        import os

        import pyarrow as pa
        import pytest

        path = os.environ.get("SPIDERRAY_FASTTEXT_MODEL")
        if not path or not os.path.exists(path):
            pytest.skip("set SPIDERRAY_FASTTEXT_MODEL to a lid.176 file to run")
        from spiderray.config import PipelineConfig
        from spiderray.stages.langid_stage import LangIdModelActor

        actor = LangIdModelActor(PipelineConfig(extra={"fasttext_model_path": path}))
        out = actor(pa.table({"transcript": ["the quick brown fox jumps over the lazy dog"],
                              "lang_pos": [""]}))
        assert out.column("lang_model").to_pylist() == ["en"]
        assert out.column("lang_conf").to_pylist()[0] > 0.5

    def test_real_kenlm_model(self):
        import os

        import pyarrow as pa
        import pytest

        path = os.environ.get("SPIDERRAY_KENLM_MODEL_EN")
        if not path or not os.path.exists(path):
            pytest.skip("set SPIDERRAY_KENLM_MODEL_EN to a kenlm binary to run")
        from spiderray.config import PipelineConfig
        from spiderray.stages.perplexity_stage import PerplexityActor

        actor = PerplexityActor(PipelineConfig(extra={"kenlm_model_paths": {"en": path}}))
        out = actor(pa.table({"transcript": ["a perfectly normal english sentence"],
                              "lang": ["en"]}))
        assert out.column("ppl").to_pylist()[0] > 0
