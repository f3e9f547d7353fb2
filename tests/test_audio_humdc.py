"""Mains-hum / DC-offset gate: narrowband tone + bias detection."""

import numpy as np
import pyarrow as pa

from spiderray.config import PipelineConfig
from spiderray.functions.audiofp import MAX_DC_RATIO, MAX_HUM_RATIO, hum_stats
from spiderray.stages.audioquality import AudioHumActor, audio_hum_stage


def _sine(freq: float, sr: int, n: int) -> np.ndarray:
    return 0.6 * np.sin(2 * np.pi * freq * np.arange(n) / sr)


class TestHumDcKernel:
    def test_clean_signal_near_zero(self):
        sr, n = 16000, 8000
        s = hum_stats(_sine(400.0, sr, n) + 0.5 * _sine(1750.0, sr, n), sr)
        assert s["dc_ratio"] < 1e-9
        assert s["hum_ratio"] < 1e-9

    def test_mains_tone_detected_at_50_and_60(self):
        sr, n = 16000, 8000
        base = _sine(400.0, sr, n)
        for f in (50.0, 60.0, 120.0):
            s = hum_stats(base + 0.4 * _sine(f, sr, n), sr)
            assert s["hum_ratio"] > MAX_HUM_RATIO, f
        # a tone OFF the mains grid is not hum
        s = hum_stats(base + 0.4 * _sine(75.0, sr, n), sr)
        assert s["hum_ratio"] < MAX_HUM_RATIO

    def test_dc_bias_detected(self):
        sr, n = 16000, 8000
        x = _sine(400.0, sr, n)
        assert hum_stats(x + 0.1, sr)["dc_ratio"] > MAX_DC_RATIO
        assert hum_stats(x, sr)["dc_ratio"] < MAX_DC_RATIO
        # pure DC never divides by zero and is fully biased
        assert hum_stats(np.full(1000, 0.3), sr)["dc_ratio"] > 0.999

    def test_dc_does_not_leak_into_hum(self):
        # the DC-removal before the FFT keeps a biased-but-clean clip from
        # flagging hum via bin-0 leakage into the 50 Hz band
        sr, n = 16000, 8000
        s = hum_stats(_sine(400.0, sr, n) + 0.2, sr)
        assert s["hum_ratio"] < MAX_HUM_RATIO

    def test_degenerate_inputs(self):
        assert hum_stats(np.zeros(100), 16000) == {"dc_ratio": 0.0, "hum_ratio": 0.0}
        assert hum_stats(np.array([]), 16000)["hum_ratio"] == 0.0
        assert hum_stats(_sine(100, 16000, 100), 0)["hum_ratio"] == 0.0

    def test_low_sr_skips_freqs_above_nyquist(self):
        # sr=300 → only 50/60/100/120 Hz lie below Nyquist; no crash
        sr, n = 300, 3000
        s = hum_stats(_sine(60.0, sr, n), sr)
        assert s["hum_ratio"] > MAX_HUM_RATIO


class TestHumActor:
    def _batch(self):
        sr, n = 16000, 8000
        clean = (_sine(900.0, sr, n) * 20000).astype("<i2").tobytes()
        hummy = ((_sine(900.0, sr, n) + 0.4 * _sine(50.0, sr, n)) * 20000)
        hummy = hummy.astype("<i2").tobytes()
        biased = (_sine(900.0, sr, n) * 20000 + 3000).astype("<i2").tobytes()
        return pa.table({
            "clip_id": pa.array(["clean", "hum", "dc", "bad"], pa.string()),
            "bytes": pa.array([clean, hummy, biased, b"xx"], pa.binary()),
            "codec": pa.array(["pcm_s16le"] * 3 + ["opus"], pa.string()),
            "sr_hz": pa.array([sr] * 4, pa.int32()),
        })

    def test_flags_and_marks(self):
        out = AudioHumActor(PipelineConfig())(self._batch())
        rows = {c: out.column(c).to_pylist() for c in out.column_names}
        assert rows["decode_ok"] == [True, True, True, False]
        assert rows["hum"] == [False, True, False, False]
        assert rows["dc_offset"] == [False, False, True, False]
        assert rows["hum_ratio"][3] == 0.0

    def test_threshold_override(self):
        out = AudioHumActor(PipelineConfig(), max_dc_ratio=10.0,
                            max_hum_ratio=10.0)(self._batch())
        assert out.column("hum").to_pylist() == [False] * 4
        assert out.column("dc_offset").to_pylist() == [False] * 4

    def test_stage_runs_distributed(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(self._batch())
        out = audio_hum_stage(ds, PipelineConfig(), concurrency=2).to_pandas()
        assert len(out) == 4
        assert out.set_index("clip_id").loc["hum", "hum"]
        assert out.set_index("clip_id").loc["dc", "dc_offset"]
