"""DTMF dialed-digit PII gate (functions/audiofp.dtmf_digits +
stages/audioquality.dtmf_stage): grid decode across sample rates, the
total-energy ratio gate vs harmonic impostors, debouncing, and the
distributed stage vs the planted strata."""

import numpy as np
import pyarrow as pa

from spiderray.functions.audiofp import dtmf_digits, synth_dtmf


class TestDtmfKernel:
    def test_decodes_all_sixteen_keys_any_rate(self):
        seq = "123A456B789C*0#D"
        for sr in (8000, 16000, 44100):
            assert dtmf_digits(synth_dtmf(seq, sr), sr) == seq

    def test_noise_robust(self):
        rng = np.random.RandomState(3)
        pcm = synth_dtmf("8675309", 8000)
        pcm = pcm + 0.03 * rng.randn(len(pcm))
        assert dtmf_digits(pcm, 8000) == "8675309"

    def test_repeated_digit_needs_gap(self):
        # "55" with a gap between presses decodes twice; one long press
        # decodes ONCE (the re-arm happens only on a non-digit frame)
        assert dtmf_digits(synth_dtmf("55", 8000), 8000) == "55"
        long_press = synth_dtmf("5", 8000, tone_ms=400.0)
        assert dtmf_digits(long_press, 8000) == "5"

    def test_too_short_press_ignored(self):
        blip = synth_dtmf("7", 8000, tone_ms=20.0)  # < the 40 ms minimum
        assert dtmf_digits(blip, 8000) == ""

    def test_harmonic_triad_rejected_by_energy_ratio(self):
        # 2f/3f of a 415 Hz triad graze the grid (830 ~ row 852,
        # 1245 ~ col 1209) but the off-grid fundamental keeps the pair's
        # share of TOTAL energy low — the tones-only ratio this gate
        # replaced decoded these as digits
        sr = 16000
        t = np.arange(sr, dtype=np.float64) / sr
        for f in (330.0, 415.0, 426.0):
            tri = (0.8 * np.sin(2 * np.pi * f * t)
                   + 0.5 * np.sin(2 * np.pi * 2 * f * t)
                   + 0.33 * np.sin(2 * np.pi * 3 * f * t))
            assert dtmf_digits(tri, sr) == "", f

    def test_single_tone_and_silence(self):
        sr = 8000
        t = np.arange(sr, dtype=np.float64) / sr
        assert dtmf_digits(np.sin(2 * np.pi * 770.0 * t), sr) == ""
        assert dtmf_digits(np.zeros(sr), sr) == ""
        assert dtmf_digits(np.zeros(10), sr) == ""


class TestDtmfStage:
    def test_strata_map_exactly(self, ray_session):
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.pipelines.queries import (
            _dtmf_planted_seq,
            _dtmfmix_clips_batch,
        )
        from spiderray.stages.audioquality import dtmf_stage

        docs = pa.table({"doc_id": pa.array(np.arange(120), pa.int64())})
        clips = _dtmfmix_clips_batch(docs)
        out = dtmf_stage(rd.from_arrow(clips), PipelineConfig(),
                         concurrency=2).to_pandas()
        out["i"] = out.clip_id.str[3:].astype(int)
        undec = out[~out.decode_ok]
        assert set(undec.i % 17) == {5}
        assert not undec.has_dtmf.any()
        dec = out[out.decode_ok]
        planted = dec[dec.i % 4 == 0]
        assert planted.has_dtmf.all()
        for _, r in planted.iterrows():
            assert r.dtmf_digits == _dtmf_planted_seq(r.i)
        others = dec[dec.i % 4 != 0]
        assert (others.n_digits == 0).all()
        assert not others.has_dtmf.any()
