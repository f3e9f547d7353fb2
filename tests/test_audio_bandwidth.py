"""Effective-bandwidth gate: spectral rolloff + upsample detection."""

import numpy as np
import pyarrow as pa

from spiderray.config import PipelineConfig
from spiderray.functions.audiofp import MIN_BW_RATIO, bandwidth_stats
from spiderray.stages.audioquality import AudioBandwidthActor, audio_bandwidth_stage


def _sine(freq: float, sr: int, n: int) -> np.ndarray:
    return 0.6 * np.sin(2 * np.pi * freq * np.arange(n) / sr)


class TestBandwidthKernel:
    def test_pure_tone_rolloff(self):
        sr, n = 16000, 8000
        s = bandwidth_stats(_sine(1000.0, sr, n), sr)
        assert abs(s["bw_hz"] - 1000.0) < 20.0
        assert s["bw_ratio"] < 0.2

    def test_wideband_noise_rolloff_near_nyquist(self):
        sr, n = 16000, 8000
        rng = np.random.default_rng(0)
        s = bandwidth_stats(rng.standard_normal(n), sr)
        assert s["bw_ratio"] > 0.9

    def test_bandlimited_vs_fullband_separation(self):
        sr, n = 16000, 8000
        low = _sine(900.0, sr, n) + 0.5 * _sine(1700.0, sr, n)
        full = low + 0.4 * _sine(5200.0, sr, n) + 0.3 * _sine(7300.0, sr, n)
        r_low = bandwidth_stats(low, sr)["bw_ratio"]
        r_full = bandwidth_stats(full, sr)["bw_ratio"]
        assert r_low < MIN_BW_RATIO < r_full

    def test_degenerate_inputs(self):
        assert bandwidth_stats(np.zeros(100), 16000) == {"bw_hz": 0.0, "bw_ratio": 0.0}
        assert bandwidth_stats(np.array([]), 16000)["bw_hz"] == 0.0
        assert bandwidth_stats(_sine(100, 16000, 100), 0)["bw_hz"] == 0.0

    def test_analysis_cap(self):
        # a huge clip is analyzed over the capped prefix, not all samples
        from spiderray.functions.audiofp import BANDWIDTH_MAX_SAMPLES

        sr = 16000
        x = _sine(3000.0, sr, BANDWIDTH_MAX_SAMPLES + 5000)
        s = bandwidth_stats(x, sr)
        assert abs(s["bw_hz"] - 3000.0) < 20.0


class TestBandwidthActor:
    def _batch(self):
        sr, n = 16000, 8000
        low = (_sine(900.0, sr, n) * 20000).astype("<i2").tobytes()
        full = ((_sine(900.0, sr, n) + 0.5 * _sine(7000.0, sr, n)) * 15000)
        full = full.astype("<i2").tobytes()
        return pa.table({
            "clip_id": pa.array(["low", "full", "bad"], pa.string()),
            "bytes": pa.array([low, full, b"xx"], pa.binary()),
            "codec": pa.array(["pcm_s16le", "pcm_s16le", "opus"], pa.string()),
            "sr_hz": pa.array([sr, sr, sr], pa.int32()),
        })

    def test_flags_and_marks(self):
        out = AudioBandwidthActor(PipelineConfig())(self._batch())
        rows = {c: out.column(c).to_pylist() for c in out.column_names}
        assert rows["decode_ok"] == [True, True, False]
        assert rows["upsampled"] == [True, False, False]
        assert rows["bw_ratio"][2] == 0.0

    def test_threshold_override(self):
        out = AudioBandwidthActor(PipelineConfig(), min_bw_ratio=0.01)(self._batch())
        assert out.column("upsampled").to_pylist() == [False, False, False]

    def test_stage_runs_distributed(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(self._batch())
        out = audio_bandwidth_stage(ds, PipelineConfig(), concurrency=2).to_pandas()
        assert len(out) == 3
        assert out.set_index("clip_id").loc["low", "upsampled"]
