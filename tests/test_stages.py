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
