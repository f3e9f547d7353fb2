"""End-to-end pipeline tests: engine output vs the pure-Python oracle on the
deterministic synthetic clip corpus (FIXTURES.md F2 strata), plus the
input_hint invariants (audio passthrough SNR, transcript equality)."""

import numpy as np
import pyarrow as pa
import pytest

from spiderray.config import PipelineConfig
from spiderray.oracle import oracle_rows
from spiderray.pipelines.quality_filter import kept_only, quality_filter
from spiderray.sources import clips as clipsrc

N = 420  # 28 full strata cycles


@pytest.fixture(scope="module")
def clip_table():
    return clipsrc.synth_clips_table(N)


@pytest.fixture(scope="module")
def pipeline_out(ray_session, clip_table):
    import ray.data as rd

    cfg = PipelineConfig()
    ds = rd.from_arrow(clip_table)
    out = quality_filter(ds, cfg).to_pandas()
    return out.sort_values("clip_id").reset_index(drop=True)


def test_row_count_and_schema(pipeline_out):
    assert len(pipeline_out) == N
    for col in ("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript",
                "charset", "charset_pos", "lang", "lang_pos", "label", "keep",
                "drop_reason", "quality_score", "scrubbed_transcript", "pii_found"):
        assert col in pipeline_out.columns, col


def test_matches_oracle_exactly(pipeline_out, clip_table):
    rows = clip_table.to_pylist()
    expected = oracle_rows(rows)
    expected.sort(key=lambda r: r["clip_id"])
    got = pipeline_out

    mism = []
    for i, exp in enumerate(expected):
        for field in ("charset", "charset_pos", "lang", "lang_pos", "label",
                      "keep", "drop_reason", "scrubbed_transcript"):
            # toxicity compared separately below (float32 vs float64)
            g = got[field].iloc[i]
            if g != exp[field]:
                mism.append((exp["clip_id"], field, g, exp[field]))
    assert not mism, mism[:10]
    # quality_score numeric equality
    np.testing.assert_allclose(
        got["quality_score"].to_numpy(),
        np.array([e["quality_score"] for e in expected]),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        got["toxicity"].to_numpy(dtype=float),
        np.array([e["toxicity"] for e in expected], dtype=float),
        rtol=1e-6,
    )
    # keep/drop F1 == 1.0 by construction (target >= 0.99)
    exp_keep = np.array([e["keep"] for e in expected])
    got_keep = got["keep"].to_numpy()
    assert (exp_keep == got_keep).all()


def test_every_stratum_present_and_decided(pipeline_out, clip_table):
    # each drop reason family appears in the corpus
    reasons = set(pipeline_out["drop_reason"].unique())
    for expected_reason in ("", "bad_codec", "too_short", "boilerplate",
                            "dynamic_render", "blacklist", "short"):
        assert expected_reason in reasons, expected_reason
    langs = set(pipeline_out[pipeline_out["lang"] != ""]["lang"].unique())
    assert {"zh", "ja", "ko", "en", "ru", "ar", "hi"} <= langs
    assert langs & {"fr", "de", "es", "pt"}


def test_audio_passthrough_snr(pipeline_out, clip_table):
    """input_hint invariant: decoded-PCM allclose (SNR >= 30 dB) + transcript
    equality on passthrough rows."""
    orig = {r["clip_id"]: r for r in clip_table.to_pylist()}
    for _, row in pipeline_out.head(50).iterrows():
        src = orig[row["clip_id"]]
        assert row["bytes"] == src["bytes"]
        if row["codec"] != "opus":  # opus rows carry an Ogg container, not raw PCM
            ref = clipsrc.decode_pcm16(src["bytes"])
            out = clipsrc.decode_pcm16(row["bytes"])
            assert clipsrc.snr_db(ref, out) >= 30.0
        assert row["transcript"] == src["transcript"]


def test_toxicity_scored(pipeline_out):
    kept = pipeline_out[pipeline_out["keep"]]
    toxic = kept[kept["transcript"].str.contains("stupid idiot", regex=False)]
    assert len(toxic) > 0
    assert (toxic["toxicity"] > 0.05).all()
    clean = kept[~kept["transcript"].str.contains("stupid|hate|trash", regex=True)]
    assert (clean["toxicity"] == 0).all()


def test_pii_scrubbed(pipeline_out):
    kept = pipeline_out[pipeline_out["keep"]]
    pii_rows = kept[kept["transcript"].str.contains("example.com", regex=False)]
    assert len(pii_rows) > 0
    for _, row in pii_rows.iterrows():
        assert "<EMAIL>" in row["scrubbed_transcript"]
        assert "example.com" not in row["scrubbed_transcript"]
        kinds = {p["kind"] for p in row["pii_found"]}
        assert "email" in kinds and "icp" in kinds


def test_kept_only_filter(ray_session, clip_table):
    import ray.data as rd

    n_kept = kept_only(rd.from_arrow(clip_table)).count()
    full = quality_filter(rd.from_arrow(clip_table)).to_pandas()
    assert n_kept == int(full["keep"].sum())
    assert 0 < n_kept < N


def test_distributed_synth_source(ray_session):
    ds = clipsrc.synth_clips_dataset(200, override_num_blocks=4)
    t = pa.Table.from_pandas(ds.to_pandas())
    assert len(t) == 200
    local = clipsrc.synth_clips_table(200)
    got = {r["clip_id"]: r for r in t.to_pylist()}
    for r in local.to_pylist():
        g = got[r["clip_id"]]
        assert g["transcript"] == r["transcript"]
        assert g["bytes"] == r["bytes"]


def test_null_robustness(ray_session):
    """Rows with null transcript / codec / bytes flow through the pipeline
    without raising; null transcript behaves like empty (too_short drop)."""
    import ray.data as rd

    tbl = pa.table(
        {
            "clip_id": pa.array(["n0", "n1", "n2"], pa.string()),
            "bytes": pa.array([None, b"", b"\x00\x01"], pa.binary()),
            "sr_hz": pa.array([16000, None, 8000], pa.int32()),
            "dur_ms": pa.array([0, 0, None], pa.int32()),
            "codec": pa.array([None, "pcm_s16le", "pcm_s16le"], pa.string()),
            "transcript": pa.array([None, "", "short"], pa.string()),
        }
    )
    out = quality_filter(rd.from_arrow(tbl)).to_pandas().sort_values("clip_id")
    assert len(out) == 3
    assert not out["keep"].any()
    assert out[out.clip_id == "n0"]["drop_reason"].iloc[0] == "bad_codec"
    assert out[out.clip_id == "n1"]["drop_reason"].iloc[0] == "too_short"


def test_wide_rows_stream(ray_session):
    """Clips with ~0.5 MB audio payloads stream through the full pipeline
    with a bytes-conscious batch size (SURVEY.md §4.2 block-splitting row):
    batch bytes ≈ batch_size × clip size must fit the worker heap."""
    import ray.data as rd

    big = np.zeros(250_000, dtype="<i2").tobytes()  # ~0.5 MB/clip
    n = 120
    tbl = pa.table(
        {
            "clip_id": pa.array([f"w{i:04d}" for i in range(n)], pa.string()),
            "bytes": pa.array([big] * n, pa.binary()),
            "sr_hz": pa.array([16000] * n, pa.int32()),
            "dur_ms": pa.array([15625] * n, pa.int32()),
            "codec": pa.array(["pcm_s16le"] * n, pa.string()),
            "transcript": pa.array(
                ["The committee met this morning to discuss the proposed changes in detail. " * 2] * n,
                pa.string(),
            ),
        }
    )
    cfg = PipelineConfig(batch_size=16)  # 16 × 0.5 MB ≈ 8 MB per batch
    out = quality_filter(rd.from_arrow(tbl).repartition(8), cfg).to_pandas()
    assert len(out) == n
    assert (out["keep"]).all()
    assert all(len(b) == len(big) for b in out["bytes"])


def test_fuzz_random_unicode_matches_oracle(ray_session):
    """Random multilingual/garbage transcripts: vectorized pipeline must
    equal the row oracle on every decision field (catches divergence of the
    codepoint kernels on unusual codepoints)."""
    import random

    import ray.data as rd

    from spiderray.oracle import oracle_rows

    rng = random.Random(1234)
    pools = [
        "abcdefghij klmnop qrstu vwxyz",
        "的一是不了人我在有他这中大来上国",
        "あいうえおかきくけこアイウエオ",
        "가나다라마바사아자차",
        "абвгдежзийклмноп",
        "ابتثجحخدذرزسشصض",
        "!@#$%^&*()[]{}<>~`|\\\"'",
        "0123456789 \t\n",
        "éèêëàâçñáíóúäöüß",
        "   　​﻿",
        "𐍈𝄞😀🎵𠀀",
    ]
    texts = []
    for _ in range(96):
        parts = []
        for _ in range(rng.randint(0, 30)):
            pool = rng.choice(pools)
            a = rng.randint(0, len(pool) - 1)
            b = min(len(pool), a + rng.randint(1, 8))
            parts.append(pool[a:b])
        texts.append("".join(parts))

    tbl = pa.table(
        {
            "clip_id": pa.array([f"f{i:04d}" for i in range(len(texts))], pa.string()),
            "bytes": pa.array([b""] * len(texts), pa.binary()),
            "sr_hz": pa.array([16000] * len(texts), pa.int32()),
            "dur_ms": pa.array([0] * len(texts), pa.int32()),
            "codec": pa.array(["pcm_s16le"] * len(texts), pa.string()),
            "transcript": pa.array(texts, pa.string()),
        }
    )
    got = (
        quality_filter(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    exp = oracle_rows(tbl.to_pylist())
    exp.sort(key=lambda r: r["clip_id"])
    for i, e in enumerate(exp):
        for field in ("lang", "lang_pos", "label", "keep", "drop_reason", "scrubbed_transcript"):
            assert got[field].iloc[i] == e[field], (e["clip_id"], field, repr(texts[i][:60]))


class TestAudioGatedFlagship:
    def _rows(self):
        import numpy as np

        sr = 16000
        def tone(sec, amp=0.5):
            t = np.arange(int(sr * sec)) / sr
            return (amp * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2").tobytes()

        words20 = " ".join(["word"] * 20)
        return [
            # 20 words over 10s = 2 wps → passes
            {"clip_id": "ok", "bytes": tone(10.0), "sr_hz": sr, "dur_ms": 10000,
             "codec": "pcm_s16le", "transcript": words20 + " quality transcript here"},
            # silent audio → silent_audio
            {"clip_id": "silent", "bytes": b"\x00\x00" * sr, "sr_hz": sr, "dur_ms": 1000,
             "codec": "pcm_s16le", "transcript": words20},
            # 20 words over 1s = 20 wps → speech_rate
            {"clip_id": "fast", "bytes": tone(1.0), "sr_hz": sr, "dur_ms": 1000,
             "codec": "pcm_s16le", "transcript": words20},
            # undecodable codec: gate does not apply (codec allowlist governs)
            {"clip_id": "flacrow", "bytes": b"\x00" * 64, "sr_hz": sr, "dur_ms": 5000,
             "codec": "flac", "transcript": words20 + " more words to pass checks"},
        ]

    def test_engine_matches_oracle_with_gates(self, ray_session):
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.oracle import oracle_rows
        from spiderray.pipelines.quality_filter import quality_filter

        cfg = PipelineConfig(audio_gates=True, with_perplexity=False)
        rows = self._rows()
        out = quality_filter(rd.from_items(rows), cfg).to_pandas().set_index("clip_id")
        orc = {r["clip_id"]: r for r in oracle_rows(rows, cfg)}
        for cid in out.index:
            assert bool(out.loc[cid, "keep"]) == orc[cid]["keep"], cid
            assert out.loc[cid, "drop_reason"] == orc[cid]["drop_reason"], cid

    def test_gate_reasons(self, ray_session):
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.pipelines.quality_filter import quality_filter

        cfg = PipelineConfig(audio_gates=True, with_perplexity=False)
        out = quality_filter(rd.from_items(self._rows()), cfg).to_pandas().set_index("clip_id")
        assert bool(out.loc["ok", "keep"])
        assert out.loc["silent", "drop_reason"] == "silent_audio"
        assert out.loc["fast", "drop_reason"] == "speech_rate"
        # transcript-drop reasons are preserved, not overwritten by the gate
        assert not bool(out.loc["silent", "keep"])

    def test_gates_off_by_default(self, ray_session):
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.pipelines.quality_filter import quality_filter

        cfg = PipelineConfig(with_perplexity=False)
        out = quality_filter(rd.from_items(self._rows()), cfg).to_pandas().set_index("clip_id")
        # silent/fast clips survive on transcript quality alone
        assert bool(out.loc["silent", "keep"])
        assert bool(out.loc["fast", "keep"])


class TestPrepareCorpus:
    def test_dedup_and_split(self, ray_session):
        import ray.data as rd

        from spiderray.pipelines.prepare_corpus import corpus_summary, prepare_corpus

        long_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
        rows = [
            {"doc_id": 1, "text": long_a},
            {"doc_id": 2, "text": long_a},        # duplicate → dropped
            {"doc_id": 3, "text": "short"},        # undecidable → too_short
            {"doc_id": 4, "text": "totally different words forming another document body here today " * 2},
        ]
        df = prepare_corpus(rd.from_items(rows)).to_pandas().set_index("doc_id")
        assert bool(df.loc[1, "keep"]) and not bool(df.loc[2, "keep"])
        assert df.loc[2, "drop_reason"] == "duplicate"
        assert df.loc[3, "drop_reason"] == "too_short"
        assert bool(df.loc[4, "keep"])
        assert set(df["split"]) <= {"train", "val", "test"}
        assert (df["ws_tokens"] > 0).all()

        summary = corpus_summary(rd.from_pandas(df.reset_index()))
        assert summary["n_docs"].sum() == 4

    def test_join_path_matches_broadcast_path(self, ray_session):
        """broadcast_max_losers=0 forces the bucketed Arrow mark join (the
        >1e6-loser scale path); it must agree row-for-row with the
        loser-broadcast path on duplicates, keeps and splits."""
        import ray.data as rd

        from spiderray.pipelines.prepare_corpus import prepare_corpus

        rows = []
        for i in range(120):
            body = f"document body with enough words to pass number {i % 40} " * 2
            rows.append({"doc_id": i, "text": body})  # 3 copies of each of 40
        cols = ["doc_id", "lang", "keep", "drop_reason", "split", "ws_tokens"]
        a = (prepare_corpus(rd.from_items(rows))
             .to_pandas().sort_values("doc_id")[cols].reset_index(drop=True))
        b = (prepare_corpus(rd.from_items(rows), broadcast_max_losers=0)
             .to_pandas().sort_values("doc_id")[cols].reset_index(drop=True))
        assert a.equals(b)
        # winners = min doc_id per distinct text → ids 0..39 keep, rest dup
        kept = a[a.keep]
        assert set(kept.doc_id) == set(range(40))
        assert (a.loc[~a.keep, "drop_reason"] == "duplicate").all()

    def test_vectorized_decide_matches_row_oracle(self, ray_session):
        """The composed pipeline's batch decide (langid+metrics+keepdrop
        kernels) must agree with the per-row oracle functions on a
        stratified corpus — the round-3 vectorization must not drift."""
        import ray.data as rd

        from spiderray.functions import keepdrop, langid, quality
        from spiderray.pipelines.prepare_corpus import prepare_corpus

        texts = [
            "alpha beta gamma delta epsilon zeta eta theta " * 4,
            "short",
            "",
            "这是一个包含足够多汉字的中文句子用于测试流程。" * 3,
            "{ } { } { } { } { } dynamic render guard trips here",
            "line\nline\nline\nline\nline\nline",
            "https://example.com/x " * 20,
            "правительство объявило сегодня о новых мерах по улучшению качества " * 2,
        ]
        rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        df = prepare_corpus(rd.from_items(rows)).to_pandas().set_index("doc_id")
        for i, t in enumerate(texts):
            lang, _ = langid.detect_lang(t)
            m = quality.compute_metrics(t)
            keep, reason, _lbl = keepdrop.decide(t, lang, m)
            assert df.loc[i, "lang"] == lang, t[:40]
            # dedup may overwrite keep/reason only with "duplicate"
            if df.loc[i, "drop_reason"] != "duplicate":
                assert bool(df.loc[i, "keep"]) == keep, t[:40]
                assert df.loc[i, "drop_reason"] == reason, t[:40]
                assert df.loc[i, "quality_score"] == m.quality_score, t[:40]

    def test_deterministic_across_runs(self, ray_session):
        import ray.data as rd

        from spiderray.pipelines.prepare_corpus import prepare_corpus

        rows = [{"doc_id": i, "text": f"document body with enough words to pass the gates number {i} " * 2}
                for i in range(50)]
        a = prepare_corpus(rd.from_items(rows)).to_pandas().sort_values("doc_id")
        b = prepare_corpus(rd.from_items(rows)).to_pandas().sort_values("doc_id")
        assert a[["doc_id", "keep", "split"]].reset_index(drop=True).equals(
            b[["doc_id", "keep", "split"]].reset_index(drop=True)
        )


class TestWriteSplitCorpus:
    def test_partitioned_layout_and_pruned_read(self, ray_session, tmp_path):
        import os

        import ray.data as rd

        from spiderray.pipelines.prepare_corpus import prepare_corpus, write_split_corpus

        rows = [{"doc_id": i, "text": f"document body with plenty of words to pass number {i} " * 2}
                for i in range(100)]
        out_dir = str(tmp_path / "corpus")
        write_split_corpus(prepare_corpus(rd.from_items(rows)), out_dir)
        parts = sorted(os.listdir(out_dir))
        assert parts == ["split=test", "split=train", "split=val"] or set(parts) <= {
            "split=test", "split=train", "split=val"}
        train = rd.read_parquet(os.path.join(out_dir, "split=train")).to_pandas()
        full = rd.read_parquet(out_dir).to_pandas()
        assert 0 < len(train) < len(full) == 100
