"""Looped-audio gate (stages/audioquality.audio_loop_stage): kernel
periodicity detection, the stationarity and tail-coincidence guards, and
the distributed stage vs the planted strata."""

import numpy as np
import pyarrow as pa

from spiderray.functions.audiofp import audio_loop_stats


def _tone(freq, sr, n, amp=0.55):
    t = np.arange(n, dtype=np.float64) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float64)


def _notes(bins_hz, sr, note_len):
    segs = [_tone(f, sr, note_len) for f in bins_hz]
    return np.concatenate(segs)


class TestLoopKernel:
    def test_tiled_segment_perfect_score_at_fundamental(self):
        sr = 16000
        seg = _notes([300.0, 700.0, 1100.0, 1500.0], sr, 1024)  # 4096 samples
        pcm = np.tile(seg, 4)
        s = audio_loop_stats(pcm, sr)
        assert s["loop_score_ppm"] == 1_000_000
        # fundamental period: 4096 samples / 256 hop = 16 frames (its
        # multiples score the same; the SMALLEST argmax wins)
        assert s["loop_period_frames"] == 16
        assert s["n_unique_peaks"] == 4

    def test_held_tone_matches_everywhere_but_is_stationary(self):
        s = audio_loop_stats(_tone(440.0, 16000, 16384), 16000)
        assert s["loop_score_ppm"] == 1_000_000
        assert s["n_unique_peaks"] == 1  # the variety guard's job

    def test_noise_scores_low(self):
        rng = np.random.RandomState(7)
        s = audio_loop_stats(rng.randn(16384) * 0.3, 16000)
        assert s["loop_score_ppm"] < 500_000

    def test_min_cycles_excludes_tail_coincidence(self):
        # a melody whose LAST note equals its first: without the
        # p ≤ n_frames//min_cycles cap, the extreme lag compares only the
        # min_overlap tail against the head and scores ~7/8
        sr = 16000
        pcm = _notes([300, 700, 1100, 1500, 1900, 2300, 2700, 300], sr, 2048)
        s = audio_loop_stats(pcm, sr)
        assert s["loop_score_ppm"] < 800_000

    def test_short_and_silent(self):
        assert audio_loop_stats(np.zeros(100), 16000)["n_frames"] == 0
        s = audio_loop_stats(np.zeros(16384), 16000)
        assert s["n_voiced"] == 0 and s["loop_score_ppm"] == 0

    def test_integer_types(self):
        s = audio_loop_stats(_tone(500.0, 16000, 8192), 16000)
        assert all(isinstance(v, int) for v in s.values())


class TestLoopStage:
    def test_strata_map_exactly(self, ray_session):
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.pipelines.queries import _loopmix_clips_batch
        from spiderray.stages.audioquality import audio_loop_stage

        docs = pa.table({"doc_id": pa.array(np.arange(120), pa.int64())})
        clips = _loopmix_clips_batch(docs)
        out = audio_loop_stage(rd.from_arrow(clips), PipelineConfig(),
                               concurrency=2).to_pandas()
        out["i"] = out.clip_id.str[3:].astype(int)
        undec = out[~out.decode_ok]
        assert set(undec.i % 17) == {5}
        assert not undec.is_looped.any()
        dec = out[out.decode_ok]
        looped = dec[dec.i % 4 == 0]
        assert looped.is_looped.all()
        assert (looped.loop_period_frames == 16).all()
        assert (looped.loop_score_ppm == 1_000_000).all()
        assert not dec[dec.i % 4 != 0].is_looped.any()
        # held tones self-match everywhere yet never flag
        tones = dec[dec.i % 4 == 3]
        assert (tones.loop_score_ppm == 1_000_000).all()
        assert (tones.n_unique_peaks == 1).all()

    def test_matches_serial_twin(self, ray_session):
        from spiderray.pipelines.queries import q_audio_loops
        from spiderray.pipelines.serial_oracles import so_audio_loops

        sf = "/root/testdata/sf0.001"
        import pandas as pd

        got = q_audio_loops(sf)
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        exp = so_audio_loops(sf).to_pandas()
        cols = sorted(exp.columns)
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = exp[cols].sort_values(cols).reset_index(drop=True)
        assert a.astype(str).equals(b.astype(str))


class TestTempo:
    def test_click_tracks_within_one_bpm(self):
        from spiderray.functions.audiofp import tempo_stats

        sr = 16000
        click = (np.exp(-np.arange(600) / 80.0)
                 * np.sin(2 * np.pi * 1000.0 * np.arange(600) / sr))
        for bpm in (70, 95, 120, 144, 170):
            wave = np.zeros(64000)
            period = int(round(sr * 60.0 / bpm))
            for s in range(0, 64000 - 600, period):
                wave[s:s + 600] += click
            st = tempo_stats(wave, sr)
            # lag quantization on the 62.5 fps grid: the estimate is
            # round(60*fps / round(period_frames)), exact by arithmetic
            exp = round(3750.0 / round(period / 256.0))
            assert st["bpm"] == exp, (bpm, exp, st)
            assert st["tempo_conf_ppm"] >= 450_000
            assert st["onset_ppm"] >= 10_000

    def test_steady_tone_guarded_by_onset_energy(self):
        from spiderray.functions.audiofp import tempo_stats

        t = np.arange(64000) / 16000.0
        st = tempo_stats(0.5 * np.sin(2 * np.pi * 440.0 * t), 16000)
        # jitter autocorrelates, but there is no onset energy
        assert st["onset_ppm"] < 10_000

    def test_silence_and_short(self):
        from spiderray.functions.audiofp import tempo_stats

        assert tempo_stats(np.zeros(100), 16000)["bpm"] == 0
        st = tempo_stats(np.zeros(64000), 16000)
        assert st["bpm"] == 0 and st["tempo_conf_ppm"] == 0

    def test_stage_strata_flags(self, ray_session):
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.pipelines.queries import _tempomix_clips_batch
        from spiderray.stages.audioquality import tempo_stage

        docs = pa.table({"doc_id": pa.array(np.arange(120), pa.int64())})
        clips = _tempomix_clips_batch(docs)
        out = tempo_stage(rd.from_arrow(clips), PipelineConfig(),
                          concurrency=2).to_pandas()
        out["i"] = out.clip_id.str[3:].astype(int)
        dec = out[out.decode_ok]
        clicks = dec[dec.i % 4 == 0]
        assert clicks.has_beat.all()
        planted = clips.to_pandas().set_index("clip_id").planted_bpm
        for _, r in clicks.iterrows():
            # corpus plants on the lag grid -> the estimate is exact
            assert r.bpm == planted[r.clip_id], r.clip_id
        assert not dec[dec.i % 4 != 0].has_beat.any()
        assert not out[~out.decode_ok].has_beat.any()


class TestSpeakerTurns:
    def test_alternating_voices_counted(self):
        from spiderray.functions.audiofp import speaker_turn_stats

        sr = 16000

        def voice(f1, f2, length, phase=0.0):
            t = np.arange(length, dtype=np.float64) / sr
            car = np.sin(2 * np.pi * f1 * t) + 0.6 * np.sin(2 * np.pi * f2 * t)
            env = 0.3 + 0.7 * (0.5 + 0.5 * np.sin(2 * np.pi * 4.0 * t + phase)) ** 2
            return 0.5 * car * env

        segs = [voice(300, 2200, sr) if j % 2 == 0 else voice(550, 1400, sr, 1.0)
                for j in range(6)]
        multi = np.concatenate(segs)
        st = speaker_turn_stats(multi, sr)
        assert st["turn_count"] == 5
        single = voice(300, 2200, 6 * sr)
        assert speaker_turn_stats(single, sr)["turn_count"] <= 1
        assert speaker_turn_stats(np.zeros(6 * sr), sr)["turn_count"] == 0
        assert speaker_turn_stats(np.zeros(100), sr)["n_windows"] == 0

    def test_stage_strata(self, ray_session):
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.pipelines.queries import _turnmix_clips_batch
        from spiderray.stages.audioquality import speaker_turn_stage

        docs = pa.table({"doc_id": pa.array(np.arange(90), pa.int64())})
        clips = _turnmix_clips_batch(docs)
        out = speaker_turn_stage(rd.from_arrow(clips), PipelineConfig(),
                                 concurrency=2).to_pandas()
        out["i"] = out.clip_id.str[3:].astype(int)
        dec = out[out.decode_ok]
        conv = dec[dec.i % 3 == 0]
        assert conv.multi_speaker.all()
        assert (conv.turn_count == 3).all()
        assert not dec[dec.i % 3 != 0].multi_speaker.any()
        assert not out[~out.decode_ok].multi_speaker.any()
