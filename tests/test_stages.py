"""Parity tests: vectorized batch kernels vs the row-at-a-time oracle
functions (no Ray needed — these exercise the batch fns directly)."""

import pytest
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

    def test_fasttext_bad_path_fails_loudly(self):
        """A configured model path must never fall back silently: without
        the fasttext package the from-scratch .bin reader
        (functions/fasttext_io.py) loads the file, and a missing path is a
        loud FileNotFoundError either way (round 5: the hook path is now
        TRAVELED — see tests/test_fasttext_io.py for the positive side)."""
        import pytest

        from spiderray.config import PipelineConfig
        from spiderray.stages.langid_stage import LangIdModelActor

        cfg = PipelineConfig(extra={"fasttext_model_path": "/nonexistent/lid.176.bin"})
        with pytest.raises((ImportError, FileNotFoundError)):
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


class TestAudioSpectral:
    def _sine_clip(self, freq=440.0, sr=16000, sec=1.0, amp=0.5):
        import numpy as np

        t = np.arange(int(sr * sec)) / sr
        pcm = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
        return pcm.tobytes()

    def test_sine_dominant_frequency(self):
        from spiderray.stages.multimodal import _decode_one, spectral_features

        pcm = _decode_one(self._sine_clip(freq=440.0), "pcm_s16le")
        f = spectral_features(pcm, 16000)
        assert abs(f["dominant_hz"] - 440.0) < 2.0
        assert abs(f["centroid_hz"] - 440.0) < 30.0  # centroid pulled by leakage
        assert f["zcr"] == pytest.approx(2 * 440 / 16000, rel=0.05)

    def test_rolloff_orders_by_frequency(self):
        from spiderray.stages.multimodal import _decode_one, spectral_features

        lo = spectral_features(_decode_one(self._sine_clip(200.0), "pcm_s16le"), 16000)
        hi = spectral_features(_decode_one(self._sine_clip(3000.0), "pcm_s16le"), 16000)
        assert hi["rolloff_hz"] > lo["rolloff_hz"]
        assert hi["dominant_hz"] > lo["dominant_hz"]

    def test_silence_is_all_zero(self):
        import numpy as np

        from spiderray.stages.multimodal import spectral_features

        f = spectral_features(np.zeros(16000, dtype=np.float32), 16000)
        assert f == {"centroid_hz": 0.0, "bandwidth_hz": 0.0, "rolloff_hz": 0.0,
                     "dominant_hz": 0.0, "zcr": 0.0}

    def test_spectral_stage_ray(self, ray_session):
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.stages.multimodal import audio_spectral_stage

        rows = [
            {"clip_id": "tone", "bytes": self._sine_clip(1000.0), "sr_hz": 16000,
             "codec": "pcm_s16le"},
            {"clip_id": "flac", "bytes": b"\x00" * 64, "sr_hz": 16000, "codec": "flac"},
        ]
        out = audio_spectral_stage(rd.from_items(rows), PipelineConfig(),
                                   concurrency=1).to_pandas().set_index("clip_id")
        assert abs(out.loc["tone", "dominant_hz"] - 1000.0) < 2.0
        assert bool(out.loc["tone", "decode_ok"])
        assert not bool(out.loc["flac", "decode_ok"])
        assert out.loc["flac", "centroid_hz"] == 0.0


class TestVadStats:
    def test_half_silence(self):
        from spiderray.stages.multimodal import vad_stats_from_frames

        # 50 silent frames then 50 speech frames (20 ms each)
        frames = [0.0] * 50 + [0.1] * 50
        ratio, lead, trail, segs = vad_stats_from_frames(frames, 20, 1e-3)
        assert ratio == pytest.approx(0.5)
        assert lead == 1000 and trail == 0 and segs == 1

    def test_two_segments(self):
        from spiderray.stages.multimodal import vad_stats_from_frames

        frames = [0.1] * 10 + [0.0] * 10 + [0.1] * 10
        ratio, lead, trail, segs = vad_stats_from_frames(frames, 20, 1e-3)
        assert segs == 2 and lead == 0 and trail == 0
        assert ratio == pytest.approx(1 / 3)

    def test_all_silent(self):
        from spiderray.stages.multimodal import vad_stats_from_frames

        ratio, lead, trail, segs = vad_stats_from_frames([0.0] * 5, 20, 1e-3)
        assert ratio == 1.0 and segs == 0 and lead == 100 and trail == 100

    def test_empty(self):
        from spiderray.stages.multimodal import vad_stats_from_frames

        assert vad_stats_from_frames([], 20, 1e-3) == (1.0, 0, 0, 0)


class TestSpeechRate:
    def test_rate_flags(self, ray_session):
        import ray.data as rd

        from spiderray.stages.multimodal import speech_rate_stage

        rows = [
            {"clip_id": "ok", "transcript": "four words right here", "dur_ms": 2000},
            {"clip_id": "fast", "transcript": " ".join(["w"] * 100), "dur_ms": 1000},
            {"clip_id": "slow", "transcript": "one", "dur_ms": 60000},
            {"clip_id": "empty", "transcript": "", "dur_ms": 1000},
        ]
        out = speech_rate_stage(rd.from_items(rows)).to_pandas().set_index("clip_id")
        assert bool(out.loc["ok", "rate_ok"]) and out.loc["ok", "wps_milli"] == 2000
        assert not bool(out.loc["fast", "rate_ok"])   # 100 wps
        assert not bool(out.loc["slow", "rate_ok"])   # 0.017 wps
        assert not bool(out.loc["empty", "rate_ok"]) and out.loc["empty", "n_words"] == 0


class TestCorpusLmTraining:
    def test_single_doc_parity_with_constructor(self, ray_session):
        import ray.data as rd

        from spiderray.stages.lm_train import train_char_lm
        from spiderray.stages.perplexity_stage import CharLM

        doc = "the quick brown fox jumps over the lazy dog again and again"
        lm_d = train_char_lm(rd.from_items([{"text": doc}]))
        lm_c = CharLM(doc)
        for probe in ("the quick fox", "völlig anderes zeug", ""):
            assert lm_d.perplexity(probe) == pytest.approx(
                lm_c.perplexity(probe), rel=1e-12
            )

    def test_in_domain_scores_lower(self, ray_session):
        import ray.data as rd

        docs = [{"text": f"the committee discussed the new transit plan in meeting {i}"}
                for i in range(50)]
        from spiderray.stages.lm_train import train_char_lm

        lm = train_char_lm(rd.from_items(docs))
        in_dom = lm.perplexity("the committee discussed the plan")
        out_dom = lm.perplexity("zxqj vvkw pffr gzzt qqwx")
        assert in_dom < out_dom / 3

    def test_max_grams_cap_degrades_smoothly(self, ray_session):
        import ray.data as rd

        from spiderray.stages.lm_train import train_char_lm

        docs = [{"text": "abcdefg hijklmn opqrstu vwxyz"}]
        full = train_char_lm(rd.from_items(docs))
        capped = train_char_lm(rd.from_items(docs), max_grams=5)
        # capped model still scores (falls back through bigrams), just worse
        p_full = full.perplexity("abcdefg hij")
        p_capped = capped.perplexity("abcdefg hij")
        assert p_capped >= p_full > 0

    def test_empty_corpus(self, ray_session):
        import ray.data as rd
        import pandas as pd

        from spiderray.stages.lm_train import train_char_lm

        lm = train_char_lm(rd.from_pandas(pd.DataFrame({"text": pd.array([], dtype="string")})))
        assert lm.perplexity("anything") > 0


class TestAudioTransforms:
    def _sine(self, freq=440.0, sr=16000, sec=0.5, amp=0.3):
        import numpy as np

        t = np.arange(int(sr * sec)) / sr
        return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)

    def test_resample_preserves_tone(self):
        import numpy as np

        from spiderray.stages.multimodal import resample_linear, spectral_features

        pcm8k = self._sine(freq=440.0, sr=8000)
        pcm16k = resample_linear(pcm8k, 8000, 16000)
        assert len(pcm16k) == 2 * len(pcm8k)
        f = spectral_features(pcm16k, 16000)
        assert abs(f["dominant_hz"] - 440.0) < 4.0

    def test_resample_identity_and_empty(self):
        import numpy as np

        from spiderray.stages.multimodal import resample_linear

        x = self._sine()
        assert resample_linear(x, 16000, 16000) is x
        assert len(resample_linear(np.zeros(0, dtype=np.float32), 8000, 16000)) == 0

    def test_normalize_hits_target_and_caps_gain(self):
        import numpy as np

        from spiderray.stages.multimodal import normalize_loudness

        quiet = self._sine(amp=0.01)
        n = normalize_loudness(quiet, target_rms=0.1)
        assert abs(float(np.sqrt(np.mean(n.astype(np.float64) ** 2))) - 0.1) < 0.01
        # near-silent clip: gain capped, not exploded
        tiny = self._sine(amp=1e-6)
        capped = normalize_loudness(tiny, target_rms=0.1, max_gain=30.0)
        assert float(np.abs(capped).max()) <= 1e-6 * 30 * 1.01
        # silence untouched
        z = np.zeros(100, dtype=np.float32)
        assert (normalize_loudness(z) == 0).all()

    def test_transform_stage_ray(self, ray_session):
        import numpy as np
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.stages.multimodal import audio_transform_stage, _decode_one

        pcm8 = (self._sine(freq=440, sr=8000, amp=0.01) * 32767).astype("<i2").tobytes()
        rows = [
            {"clip_id": "a", "bytes": pcm8, "sr_hz": 8000, "codec": "pcm_s16le"},
            {"clip_id": "flac", "bytes": b"\x00" * 32, "sr_hz": 16000, "codec": "flac"},
        ]
        out = audio_transform_stage(rd.from_items(rows), PipelineConfig(),
                                    concurrency=1).to_pandas().set_index("clip_id")
        assert bool(out.loc["a", "transform_ok"])
        assert out.loc["a", "sr_hz"] == 16000 and out.loc["a", "codec"] == "pcm_s16le"
        dec = _decode_one(out.loc["a", "bytes"], "pcm_s16le")
        rms = float(np.sqrt(np.mean(dec.astype(np.float64) ** 2)))
        assert abs(rms - 0.1) < 0.01  # normalized
        # stubbed codec passes through untouched
        assert not bool(out.loc["flac", "transform_ok"])
        assert out.loc["flac", "bytes"] == b"\x00" * 32
        assert out.loc["flac", "codec"] == "flac"


class TestCorpusLangidTraining:
    def test_trained_profiles_classify(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.stages.langid_stage import LangIdModelActor
        from spiderray.stages.lm_train import train_langid_profiles

        rows = (
            [{"text": "the government announced new measures for the city today number %d" % i,
              "lang": "en"} for i in range(30)]
            + [{"text": "le gouvernement a annoncé de nouvelles mesures pour la ville %d" % i,
                "lang": "fr"} for i in range(30)]
        )
        profiles = train_langid_profiles(rd.from_items(rows))
        assert set(profiles) == {"en", "fr"}
        actor = LangIdModelActor(PipelineConfig(extra={"langid_profiles": profiles}))
        out = actor(pa.table({
            "transcript": ["the city announced more measures",
                           "la ville a annoncé de nouvelles mesures"],
            "lang_pos": ["", ""],
        }))
        assert out.column("lang_model").to_pylist() == ["en", "fr"]

    def test_empty_corpus_profiles(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from spiderray.stages.lm_train import train_langid_profiles

        p = train_langid_profiles(rd.from_pandas(
            pd.DataFrame({"text": pd.array([], dtype="string"),
                          "lang": pd.array([], dtype="string")})))
        assert p == {}


class TestGroupedHll:
    def test_estimate_within_4pct_of_exact(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.functions.sketch import grouped_count_distinct_approx

        rng = np.random.default_rng(6)
        n = 30_000
        groups = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
        # distinct cardinalities differ per group
        users = np.where(groups == "a", rng.integers(0, 5000, n),
                         np.where(groups == "b", rng.integers(0, 500, n),
                                  rng.integers(0, 50, n)))
        t = pa.table({"g": groups, "u": users})
        out = (grouped_count_distinct_approx(rd.from_arrow(t).repartition(6),
                                             "g", "u")
               .to_pandas().set_index("g")["est_distinct"])
        import pandas as pd
        exact = pd.DataFrame({"g": groups, "u": users}).groupby("g")["u"].nunique()
        for g in ("a", "b", "c"):
            assert abs(out[g] - exact[g]) / exact[g] < 0.04, (g, out[g], exact[g])

    def test_partitioning_invariant(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.functions.sketch import grouped_count_distinct_approx

        rng = np.random.default_rng(7)
        t = pa.table({"g": ["x"] * 5000,
                      "u": rng.integers(0, 900, 5000)})
        r1 = (grouped_count_distinct_approx(rd.from_arrow(t).repartition(2),
                                            "g", "u").to_pandas())
        r2 = (grouped_count_distinct_approx(rd.from_arrow(t).repartition(11),
                                            "g", "u").to_pandas())
        assert r1["est_distinct"].tolist() == r2["est_distinct"].tolist()


class TestSlidingChunks:
    def test_window_rule(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.textindex import sliding_chunks

        text = " ".join(f"t{k}" for k in range(10))
        t = pa.table({"doc_id": np.array([1], np.int64), "text": [text]})
        out = (sliding_chunks(rd.from_arrow(t), size=4, stride=3)
               .to_pandas().sort_values("chunk_idx"))
        # starts 0,3,6,9 → windows [0:4],[3:7],[6:10]; start 9 adds no new token
        assert out["chunk_start"].tolist() == [0, 3, 6]
        assert out["chunk_text"].iloc[0] == "t0 t1 t2 t3"
        assert out["chunk_text"].iloc[2] == "t6 t7 t8 t9"
        # adjacent chunks overlap by size-stride tokens
        assert out["chunk_text"].iloc[0].split()[-1] == "t3"
        assert out["chunk_text"].iloc[1].split()[0] == "t3"

    def test_short_and_empty_docs(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.textindex import sliding_chunks

        t = pa.table({"doc_id": np.array([1, 2], np.int64),
                      "text": ["just two", ""]})
        out = sliding_chunks(rd.from_arrow(t), size=64, stride=48).to_pandas()
        assert len(out) == 1  # short doc = one chunk; empty doc = none
        assert out["chunk_text"].iloc[0] == "just two"

    def test_invalid_params_refused(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.textindex import sliding_chunks

        t = pa.table({"doc_id": np.array([1], np.int64), "text": ["x"]})
        with pytest.raises(ValueError):
            sliding_chunks(rd.from_arrow(t), size=4, stride=5)


class TestInvertedIndex:
    def test_build_lookup_and_pruning(self, ray_session, tmp_path):
        import os
        import zlib

        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.textindex import (build_inverted_index,
                                                lookup_postings)

        t = pa.table({
            "doc_id": np.array([1, 2, 3], np.int64),
            "text": ["cat dog cat", "dog fish", "bird bird bird cat"],
        })
        man = build_inverted_index(rd.from_arrow(t).repartition(2),
                                   str(tmp_path), n_buckets=8).to_pandas()
        assert man["n_postings"].sum() == 6  # distinct (term, doc) pairs
        post = lookup_postings(str(tmp_path), ["cat", "bird"],
                               n_buckets=8).to_pandas()
        got = {(r["term"], r["doc_id"]): r["tf"] for _, r in post.iterrows()}
        assert got == {("cat", 1): 2, ("cat", 3): 1, ("bird", 3): 3}
        # pruning: lookup touches only the terms' buckets
        want_buckets = {zlib.crc32(w.encode()) % 8 for w in ("cat", "bird")}
        all_files = {int(f.split("-")[1].split(".")[0])
                     for f in os.listdir(tmp_path) if f.endswith(".parquet")}
        assert want_buckets <= all_files

    def test_absent_term_empty(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.textindex import (build_inverted_index,
                                                lookup_postings)

        t = pa.table({"doc_id": np.array([1], np.int64), "text": ["a b"]})
        build_inverted_index(rd.from_arrow(t), str(tmp_path),
                             n_buckets=4).materialize()
        out = lookup_postings(str(tmp_path), ["zzz"], n_buckets=4)
        assert out.num_rows == 0


class TestVocabCoverage:
    def _corpus(self):
        import pyarrow as pa

        return pa.table({
            "doc_id": np.array([1, 2, 3, 4, 5], np.int64),
            "text": ["cat dog cat", "dog\tfish\ncat", None, "",
                     "  bird bird zebra  "],
        })

    def test_build_vocab_order_and_ties(self, ray_session):
        import ray.data as rd

        from spiderray.stages.textindex import build_vocab

        # counts: cat 3, dog 2, bird 2, fish 1, zebra 1 — ties break
        # by term ASC (bird < dog, fish < zebra)
        v = build_vocab(rd.from_arrow(self._corpus()), vocab_size=3)
        assert v == ["cat", "bird", "dog"]
        assert build_vocab(rd.from_arrow(self._corpus()), vocab_size=99) == \
            ["cat", "bird", "dog", "fish", "zebra"]

    def test_coverage_counts_and_edges(self, ray_session):
        import ray.data as rd

        from spiderray.stages.textindex import vocab_coverage

        out = (vocab_coverage(rd.from_arrow(self._corpus()).repartition(3),
                              vocab=["cat", "dog"])
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # null/empty text → 0 tokens; whitespace runs and edge whitespace
        # never produce tokens
        assert out["n_tokens"].tolist() == [3, 3, 0, 0, 3]
        assert out["n_oov"].tolist() == [0, 1, 0, 0, 3]

    def test_self_vocab_covers_everything(self, ray_session):
        import ray.data as rd

        from spiderray.stages.textindex import vocab_coverage

        out = (vocab_coverage(rd.from_arrow(self._corpus()), vocab_size=5)
               .to_pandas())
        assert out["n_oov"].sum() == 0
        assert out["n_tokens"].sum() == 9


class TestNgramNovelty:
    def test_hand_computed_bigrams(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.textindex import ngram_novelty

        t = pa.table({
            "doc_id": np.array([1, 2, 3, 4], np.int64),
            # bigrams: d1 {a b, b c}; d2 {a b, b d}; d3 {x y}; d4 none
            "text": ["a b c", "a b d", "x y", "solo"],
        })
        out = (ngram_novelty(rd.from_arrow(t).repartition(3), n=2)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out["n_grams"].tolist() == [2, 2, 1, 0]
        # 'a b' occurs twice (not novel); 'b c','b d','x y' once each
        assert out["n_novel"].tolist() == [1, 1, 1, 0]
        assert out["novelty_ppm"].tolist() == [500_000, 500_000,
                                               1_000_000, 0]

    def test_intra_doc_repeat_not_novel(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.textindex import ngram_novelty

        t = pa.table({"doc_id": np.array([1], np.int64),
                      "text": ["a b a b"]})  # 'a b' twice IN ONE doc
        out = ngram_novelty(rd.from_arrow(t), n=2).to_pandas()
        assert out["n_grams"][0] == 3
        assert out["n_novel"][0] == 1  # only 'b a'; 'a b' occurs twice

    def test_string_ids_supported(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.textindex import ngram_novelty

        t = pa.table({"clip_id": pa.array(["a", "b"], pa.string()),
                      "text": ["x y z", "x y w"]})
        out = (ngram_novelty(rd.from_arrow(t), id_col="clip_id", n=2)
               .to_pandas().sort_values("clip_id").reset_index(drop=True))
        assert out["clip_id"].tolist() == ["a", "b"]
        assert out["n_novel"].tolist() == [1, 1]  # 'y z' / 'y w'

    def test_partition_invariant(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from spiderray.stages.textindex import ngram_novelty

        rng = np.random.default_rng(4)
        words = ["w%d" % i for i in range(40)]
        df = pd.DataFrame({
            "doc_id": np.arange(300, dtype=np.int64),
            "text": [" ".join(rng.choice(words, size=12))
                     for _ in range(300)]})
        a = (ngram_novelty(rd.from_pandas(df).repartition(2))
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (ngram_novelty(rd.from_pandas(df).repartition(9))
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert a.values.tolist() == b.values.tolist()


class TestPackBins:
    def _pack(self, sizes, capacity=100, reps=1, parts=2):
        import pandas as pd
        import ray.data as rd

        from spiderray.stages.windows import pack_bins

        df = pd.DataFrame({"doc_id": np.arange(len(sizes), dtype=np.int64),
                           "n": np.array(sizes, np.int64)})
        return (pack_bins(rd.from_pandas(df).repartition(parts), "doc_id",
                          "n", capacity=capacity, n_buckets=reps)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    def test_capacity_respected_and_fill_accounting(self, ray_session):
        out = self._pack([60, 50, 40, 30, 20, 10], capacity=100, reps=1)
        fills = out.groupby(["bucket", "bin"])["n"].sum()
        assert (fills <= 100).all()
        assert not out["oversize"].any()
        # bin_fill repeats the bin total on every member
        for _, row in out.iterrows():
            assert row["bin_fill"] == fills[(row["bucket"], row["bin"])]
        # FFD with these sizes packs into ceil(210/100)=3 bins exactly:
        # [60+40], [50+30+20], [10] → wait, FFD: 60,50,40,30,20,10 →
        # b0=60+40, b1=50+30+20, b2=10 — 3 bins, 2 full
        assert fills.sort_values(ascending=False).tolist() == [100, 100, 10]

    def test_oversize_gets_own_flagged_bin(self, ray_session):
        out = self._pack([150, 10], capacity=100, reps=1)
        big = out[out["n"] == 150].iloc[0]
        assert big["oversize"] and big["bin_fill"] == 150
        small = out[out["n"] == 10].iloc[0]
        assert not small["oversize"] and small["bin"] != big["bin"]

    def test_partition_invariant(self, ray_session):
        rng = np.random.default_rng(9)
        sizes = rng.integers(1, 120, size=400).tolist()
        a = self._pack(sizes, capacity=256, reps=8, parts=3)
        b = self._pack(sizes, capacity=256, reps=8, parts=11)
        cols = ["doc_id", "bucket", "bin", "bin_fill", "oversize"]
        assert a[cols].values.tolist() == b[cols].values.tolist()

    def test_bad_capacity_refused(self, ray_session):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            self._pack([1], capacity=0)


class TestDurationBatches:
    def test_buckets_and_packing(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.windows import duration_bucket_batches

        t = pa.table({
            "clip_id": [f"c{i:03d}" for i in range(9)],
            "dur_ms": pa.array([100, 900, 2000, 2400, 5000, 800, 950,
                                2100, 9000], pa.int32()),
        })
        out = (duration_bucket_batches(rd.from_arrow(t), "dur_ms",
                                       "clip_id", [1000, 3000],
                                       max_batch_ms=2000)
               .to_pandas().set_index("clip_id"))
        # buckets: <=1000 → 0, <=3000 → 1, else 2
        assert out.loc["c000", "dur_bucket"] == 0
        assert out.loc["c002", "dur_bucket"] == 1
        assert out.loc["c008", "dur_bucket"] == 2
        # bucket 0 in id order: 100, 900, 800, 950 → cums 100/1000/1800/2750
        assert out.loc["c000", "batch_idx"] == 0
        assert out.loc["c001", "batch_idx"] == 0
        assert out.loc["c005", "batch_idx"] == 0
        assert out.loc["c006", "batch_idx"] == 0  # (2750-950)//2000 = 0
        # bucket 1: 2000, 2400, 2100 → batch cut after each ~2000ms
        b1 = out[out["dur_bucket"] == 1].sort_index()["batch_idx"].tolist()
        assert b1 == [0, 1, 2]
