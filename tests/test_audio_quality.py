"""Audio quality + acoustic-fingerprint operators: BS.1770 loudness
calibration physics, MFCC determinism, constellation-landmark invariances,
and the distributed fingerprint-pair search vs its independent serial
oracle."""

import numpy as np
import pyarrow as pa
import pytest

from spiderray.functions.audiofp import (
    kweight_mag2,
    loudness_stats,
    mfcc_mean,
    spectral_landmarks,
)


def _sine(freq, sr, secs=2.0, amp=1.0):
    t = np.arange(int(sr * secs), dtype=np.float64) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestLoudness:
    def test_bs1770_sine_calibration(self):
        # the spec's calibration point: a 0 dBFS 997 Hz sine reads
        # −3.01 LKFS — at every sample rate, since K-weighting is a
        # function of physical Hz
        for sr in (48000, 44100, 16000, 8000):
            s = loudness_stats(_sine(997.0, sr), sr)
            assert abs(s["lufs_integrated"] - (-3.01)) < 0.05, sr

    def test_gain_shifts_lufs_linearly(self):
        a = loudness_stats(_sine(997.0, 48000, amp=1.0), 48000)
        b = loudness_stats(_sine(997.0, 48000, amp=0.1), 48000)
        assert abs((a["lufs_integrated"] - b["lufs_integrated"]) - 20.0) < 0.05

    def test_kweight_unity_near_1khz(self):
        # −0.691 dB offset exists to cancel |H(997)| ≈ +0.691 dB
        h2 = kweight_mag2(np.array([997.0]))[0]
        assert abs(10 * np.log10(h2) - 0.691) < 0.02
        # RLB high-pass attenuates low frequencies (spec: ~−13 dB at 20 Hz;
        # it is a gentle 2nd-order roll-off, not a brick wall)
        assert kweight_mag2(np.array([20.0]))[0] < 0.1
        assert kweight_mag2(np.array([20.0]))[0] < kweight_mag2(np.array([100.0]))[0]

    def test_silence_floors_not_inf(self):
        s = loudness_stats(np.zeros(48000, np.float32), 48000)
        assert s["lufs_integrated"] == -99.0
        assert np.isfinite(s["lufs_range"])

    def test_clipping_and_dc(self):
        sq = np.sign(_sine(200.0, 48000)).astype(np.float32)
        s = loudness_stats(sq, 48000)
        assert s["clip_ratio"] > 0.99
        s2 = loudness_stats(np.full(48000, 0.25, np.float32) , 48000)
        assert abs(s2["dc_offset"] - 0.25) < 1e-6

    def test_actor_marks_undecodable(self):
        from spiderray.config import PipelineConfig
        from spiderray.stages.audioquality import AudioLoudnessActor

        batch = pa.table({
            "bytes": pa.array([b"\x00\x00" * 100, b"xx"], pa.binary()),
            "codec": pa.array(["pcm_s16le", "opus"], pa.string()),
            "sr_hz": pa.array([8000, 8000], pa.int32()),
        })
        out = AudioLoudnessActor(PipelineConfig())(batch)
        assert out.column("decode_ok").to_pylist() == [True, False]
        # silence is too quiet, not clipped
        assert out.column("too_quiet").to_pylist() == [True, False]
        assert out.column("clipped").to_pylist() == [False, False]


class TestMfcc:
    def test_deterministic_and_discriminative(self):
        tone = _sine(440.0, 16000)
        noise = (0.1 * np.random.default_rng(0).standard_normal(16000)).astype(np.float32)
        a, a2 = mfcc_mean(tone, 16000), mfcc_mean(tone, 16000)
        b = mfcc_mean(noise, 16000)
        assert np.array_equal(a, a2)
        assert np.linalg.norm(a - b) > 1.0

    def test_short_clip_zeros(self):
        assert not mfcc_mean(np.zeros(10, np.float32), 16000).any()
        assert not mfcc_mean(np.zeros(0, np.float32), 0).any()


class TestLandmarks:
    def test_gain_invariant(self):
        from spiderray.sources.clips import synth_note_audio

        def pcm(b):
            return np.frombuffer(b, dtype="<i2").astype(np.float32) / 32767.0

        loud = spectral_landmarks(pcm(synth_note_audio(7, 16000, 8000)), 16000)
        # same key+noise, 12 dB quieter: identical constellation
        quiet = spectral_landmarks(
            pcm(synth_note_audio(7, 16000, 8000, gain=0.15)), 16000)
        assert len(loud) > 5
        assert np.array_equal(loud, quiet)

    def test_stationary_tone_yields_nothing(self):
        # held tone → every frame the same peak → all pairs are self-pairs,
        # which carry no melodic information and are excluded
        assert len(spectral_landmarks(_sine(440.0, 16000), 16000)) == 0

    def test_silence_and_short_clips(self):
        assert len(spectral_landmarks(np.zeros(16000, np.float32), 16000)) == 0
        assert len(spectral_landmarks(np.zeros(100, np.float32), 16000)) == 0


class TestFingerprintPairs:
    def test_planted_twins_distributed_matches_serial(self, ray_session):
        import ray.data as rd

        from spiderray.sources.clips import note_clips_batch
        from spiderray.stages.audiodedup import (
            audio_fingerprint_pairs,
            serial_audio_fingerprint_pairs,
        )

        clips = note_clips_batch(np.arange(200), twin_mod=40)
        got = (
            audio_fingerprint_pairs(rd.from_arrow(clips))
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        exp = serial_audio_fingerprint_pairs(clips).to_pandas()
        assert got[["id_a", "id_b", "n_matches"]].values.tolist() == \
            exp[["id_a", "id_b", "n_matches"]].values.tolist()
        # every planted twin recovered
        found = set(map(tuple, got[["id_a", "id_b"]].values.tolist()))
        for i in range(0, 200, 40):
            assert (i, i + 10_000_000) in found
        # and nothing else at these parameters
        assert len(found) == 5


class TestClippingStats:
    def test_clean_sine_not_clipped(self):
        from spiderray.functions.audiofp import clipping_stats

        sr = 16000
        t = np.arange(sr) / sr
        x = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        s = clipping_stats(x, sr)
        assert s["clip_ratio"] == 0.0
        assert s["max_clip_run_ms"] == 0.0
        assert 0.49 < s["peak"] < 0.51

    def test_saturated_runs_measured(self):
        from spiderray.functions.audiofp import clipping_stats

        sr = 8000
        x = np.full(sr, 0.3, dtype=np.float32)
        x[1000:1080] = 1.0      # 10 ms positive saturation
        x[4000:4040] = -1.0     # 5 ms negative saturation
        s = clipping_stats(x, sr)
        assert abs(s["max_clip_run_ms"] - 10.0) < 1e-9
        assert abs(s["clip_ratio"] - 120 / sr) < 1e-12

    def test_zero_run_is_dropout_not_silence(self):
        from spiderray.functions.audiofp import clipping_stats

        sr = 16000
        x = (0.4 * np.sin(2 * np.pi * 180 * np.arange(sr) / sr)).astype(np.float32)
        x[6400:7680] = 0.0  # 80 ms hole
        s = clipping_stats(x, sr)
        assert abs(s["max_zero_run_ms"] - 80.0) < 1.0

    def test_empty_and_bad_sr(self):
        from spiderray.functions.audiofp import clipping_stats

        assert clipping_stats(np.array([]), 16000)["peak"] == 0.0
        assert clipping_stats(np.ones(100), 0)["clip_ratio"] == 0.0

    def test_actor_gate_flags(self):
        from spiderray.config import PipelineConfig
        from spiderray.stages.audioquality import AudioDefectActor
        from spiderray.stages.multimodal import _encode_pcm16

        sr = 16000
        t = np.arange(sr) / sr
        clean = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        sat = np.clip(clean * 4.0, -1.0, 1.0)
        holed = clean.copy(); holed[3200:4800] = 0.0  # 100 ms dropout
        silent = np.zeros(sr, dtype=np.float32)
        batch = pa.table({
            "clip_id": ["c0", "c1", "c2", "c3", "c4"],
            "bytes": [_encode_pcm16(clean), _encode_pcm16(sat),
                      _encode_pcm16(holed), _encode_pcm16(silent), b"xx"],
            "codec": ["pcm_s16le"] * 4 + ["opus"],
            "sr_hz": [sr] * 5,
        })
        out = AudioDefectActor(PipelineConfig())(batch).to_pandas()
        assert list(out["clipped"]) == [False, True, False, False, False]
        # all-zero clip is silence, not a dropout; undecodable is neither
        assert list(out["dropout"]) == [False, False, True, False, False]
        assert list(out["decode_ok"]) == [True, True, True, True, False]


class TestAudioSemanticDedup:
    def test_planted_twins_drop_bitwise_vs_serial(self, ray_session):
        from spiderray.pipelines.queries import q_audio_semantic_dedup
        from spiderray.pipelines.serial_oracles import so_audio_semantic_dedup

        sf = "/root/testdata/sf0.001"
        got = q_audio_semantic_dedup(sf)
        exp = so_audio_semantic_dedup(sf).to_pandas()
        assert got[["n_total", "n_kept", "n_dropped", "kept_id_sum"]] \
            .values.tolist() == \
            exp[["n_total", "n_kept", "n_dropped", "kept_id_sum"]] \
            .values.tolist()
        # at least every planted twin pair collapsed (dropped ≥ #twins)
        assert int(got["n_dropped"].iloc[0]) >= 13
        assert int(got["n_kept"].iloc[0]) > 0


class TestHighpass:
    def test_rumble_removed_speech_band_kept(self):
        import pyarrow as pa

        from spiderray.config import PipelineConfig
        from spiderray.stages.multimodal import (AudioTransformActor,
                                                 _decode_one)

        sr = 16000
        t = np.arange(sr) / sr
        x = (0.4 * np.sin(2 * np.pi * 40 * t)
             + 0.3 * np.sin(2 * np.pi * 1000 * t))
        buf = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
        actor = AudioTransformActor(PipelineConfig(), target_sr_hz=None,
                                    target_rms=None, highpass_hz=80.0)
        out = actor(pa.table({
            "clip_id": ["a"], "bytes": [buf],
            "codec": ["pcm_s16le"], "sr_hz": [sr],
        }))
        y = _decode_one(out.column("bytes").to_pylist()[0],
                        "pcm_s16le").astype(np.float64)
        spec = np.abs(np.fft.rfft(y))
        assert spec[40] < 0.01 * spec[1000]   # 40 Hz gone
        assert spec[1000] > 0.25 * len(y) * 0.3 / 2  # 1 kHz intact


class TestAudioCorpusReport:
    def test_metadata_report(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.multimodal import audio_corpus_report

        t = pa.table({
            "codec": ["flac", "opus", "banned_codec", "flac"],
            "sr_hz": [16000, 8000, 16000, 44100],
            "dur_ms": [250, 300, 100, 400],
        })
        df = audio_corpus_report(rd.from_arrow(t).repartition(3)) \
            .set_index("metric")["value"]
        assert df["n_clips"] == 4
        assert df["dur_total_ms"] == 1050
        assert df["dur_mean_ms"] == 262  # floor
        assert df["dur_min_ms"] == 100 and df["dur_max_ms"] == 400
        assert df["n_allowlisted"] == 3
        assert df["codec:flac"] == 2 and df["codec:banned_codec"] == 1
        assert df["sr:16000"] == 2 and df["sr:44100"] == 1


class TestDeclip:
    def test_isolated_crests_fully_restored(self):
        from spiderray.functions.audiofp import declip, flat_clip_ppm

        t = np.arange(16000) / 16000.0
        clean = 0.8 * np.sin(2 * np.pi * 220.0 * t)
        for amp in (1.3, 2.5):
            hard = np.clip(clean * amp, -1.0, 1.0)
            assert flat_clip_ppm(hard) > 100_000
            rep, n_clip, n_runs = declip(hard)
            assert n_clip > 0 and n_runs > 0
            assert flat_clip_ppm(rep) == 0
            assert np.abs(rep).max() <= 1.0

    def test_clean_identity_and_edges(self):
        from spiderray.functions.audiofp import declip

        t = np.arange(8000) / 16000.0
        clean = 0.5 * np.sin(2 * np.pi * 330.0 * t)
        rep, n, r = declip(clean)
        assert n == 0 and r == 0 and np.array_equal(rep, clean)
        # run touching the start holds the boundary, no crash
        edge = clean.copy()
        edge[:50] = 1.0
        rep, n, r = declip(edge)
        assert n == 50 and np.isfinite(rep).all()
        assert declip(np.ones(3))[1] == 0  # too short: untouched

    def test_stage_repairs_only_clipped_stratum(self, ray_session):
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.pipelines.queries import _clipmix_clips_batch
        from spiderray.stages.audioquality import declip_stage

        docs = pa.table({"doc_id": pa.array(np.arange(90), pa.int64())})
        clips = _clipmix_clips_batch(docs)
        out = declip_stage(rd.from_arrow(clips), PipelineConfig(),
                           concurrency=2).to_pandas()
        out["i"] = out.clip_id.str[3:].astype(int)
        dec = out[out.decode_ok]
        clipped = dec[dec.i % 3 == 0]
        assert (clipped.flat_before_ppm > 0).all()
        assert (clipped.flat_after_ppm < clipped.flat_before_ppm).all()
        assert (clipped.n_runs_repaired > 0).all()
        melody = dec[dec.i % 3 == 1]
        assert (melody.n_runs_repaired == 0).all()
        clean = dec[dec.i % 3 != 0]
        # the heavy-tailed noise stratum has rare loud SINGLE samples the
        # threshold flags, but no flat rails before or after
        assert (clean.flat_before_ppm == 0).all()
        assert (clean.flat_after_ppm == 0).all()
