"""Spectral-subtraction denoiser: noise drops, speech survives."""

import numpy as np
import pyarrow as pa

from spiderray.config import PipelineConfig
from spiderray.functions.audiofp import denoise_spectral
from spiderray.stages.audioquality import (AudioDenoiseActor,
                                           audio_denoise_stage)


def _bursty(noise_rms: float, sr: int = 16000) -> np.ndarray:
    t = np.arange(sr) / sr
    burst = np.where((t >= 0.3) & (t < 0.7),
                     0.4 * np.sin(2 * np.pi * 700.0 * t), 0.0)
    rng = np.random.default_rng(3)
    return (burst + noise_rms * rng.normal(0, 1, sr)).astype(np.float32)


def _seg_rms(x: np.ndarray, a: float, b: float, sr: int = 16000) -> float:
    s = x[int(a * sr):int(b * sr)].astype(np.float64)
    return float(np.sqrt((s ** 2).mean()))


class TestDenoiseKernel:
    def test_noise_drops_speech_survives(self):
        noisy = _bursty(0.03)
        den, floor = denoise_spectral(noisy, 16000)
        # pause-region noise at least halves; speech region within 2%
        assert _seg_rms(den, 0.05, 0.25) < 0.55 * _seg_rms(noisy, 0.05, 0.25)
        assert abs(_seg_rms(den, 0.35, 0.65)
                   - _seg_rms(noisy, 0.35, 0.65)) < 0.01
        assert floor > -60.0  # a real (not silent) noise estimate

    def test_edges_do_not_amplify(self):
        # regression: the OLA normalizer used to divide by ~0 at the clip
        # edges and blow the first frame up to full scale
        noisy = _bursty(0.03)
        den, _ = denoise_spectral(noisy, 16000)
        assert np.abs(den[:512].astype(np.float64)).max() < 0.1

    def test_degenerate_inputs(self):
        y, fdb = denoise_spectral(np.zeros(100, np.float32), 16000)
        assert len(y) == 100 and fdb == -200.0
        y2, _ = denoise_spectral(np.zeros(16000, np.float32), 16000)
        assert float(np.abs(y2).max()) == 0.0
        y3, fdb3 = denoise_spectral(np.ones(500, np.float32) * 0.1, 0)
        assert fdb3 == -200.0

    def test_deterministic(self):
        noisy = _bursty(0.05)
        a, fa = denoise_spectral(noisy, 16000)
        b, fb = denoise_spectral(noisy, 16000)
        assert np.array_equal(a, b) and fa == fb


class TestDenoiseStage:
    def _batch(self):
        pcm = (np.clip(_bursty(0.03), -1, 1) * 32767).astype("<i2").tobytes()
        return pa.table({
            "clip_id": pa.array(["n", "bad"], pa.string()),
            "bytes": pa.array([pcm, b"xx"], pa.binary()),
            "codec": pa.array(["pcm_s16le", "opus"], pa.string()),
            "sr_hz": pa.array([16000, 16000], pa.int32()),
        })

    def test_actor_and_stage(self, ray_session):
        import ray.data as rd

        out = AudioDenoiseActor(PipelineConfig())(self._batch())
        rows = {c: out.column(c).to_pylist() for c in out.column_names}
        assert rows["denoise_ok"] == [True, False]
        assert rows["codec"] == ["pcm_s16le", "opus"]
        dist = audio_denoise_stage(rd.from_arrow(self._batch()),
                                   PipelineConfig(),
                                   concurrency=2).to_pandas()
        d = dist.set_index("clip_id")
        assert d.loc["n", "denoise_ok"] and not d.loc["bad", "denoise_ok"]
        assert abs(d.loc["n", "noise_floor_db"] - rows["noise_floor_db"][0]) \
            < 1e-5


class TestCompressDynamics:
    """compress_dynamics kernel + actor (Giannoulis et al. 2012)."""

    def _tone(self, amp, sec=1.0, sr=16000):
        import numpy as np

        t = np.arange(int(sr * sec)) / sr
        return (amp * np.sin(2 * np.pi * 440 * t)).astype(np.float32)

    def test_static_curve_on_loud_tone(self):
        import numpy as np

        from spiderray.functions.audiofp import compress_dynamics

        x = self._tone(0.9)
        y, gr = compress_dynamics(x, 16000, threshold_db=-24, ratio=4)
        lvl_in = 20 * np.log10(np.sqrt(np.mean(x.astype(np.float64) ** 2)))
        lvl_out = 20 * np.log10(
            np.sqrt(np.mean(y[8000:].astype(np.float64) ** 2)))
        expect = -24 + (lvl_in + 24) / 4
        assert abs(lvl_out - expect) < 0.5
        assert gr > 10

    def test_quiet_signal_untouched(self):
        import numpy as np

        from spiderray.functions.audiofp import compress_dynamics

        x = self._tone(0.01)
        y, gr = compress_dynamics(x, 16000, threshold_db=-24, ratio=4)
        assert gr < 0.01
        assert np.allclose(y, np.clip(x.astype(np.float64), -1, 1),
                           atol=1e-6)

    def test_attack_faster_than_release(self):
        import numpy as np

        from spiderray.functions.audiofp import compress_dynamics

        sr = 16000
        x = np.concatenate([self._tone(0.01, 0.5), self._tone(0.9, 0.5),
                            self._tone(0.01, 0.5)])
        y, _ = compress_dynamics(x, sr, threshold_db=-24, ratio=4,
                                 attack_ms=10, release_ms=200)
        # 100ms into the burst the gain is mostly applied...
        mid = 20 * np.log10(np.sqrt(np.mean(
            y[int(sr * 0.6):int(sr * 0.7)].astype(np.float64) ** 2)))
        assert mid < -15
        # ...but 100ms after it ends, release is still recovering: the
        # quiet tail is MORE attenuated than its steady-state
        tail = np.sqrt(np.mean(
            y[int(sr * 1.0):int(sr * 1.1)].astype(np.float64) ** 2))
        steady = np.sqrt(np.mean(
            y[int(sr * 1.4):].astype(np.float64) ** 2))
        assert tail < steady

    def test_degenerate_inputs(self):
        import numpy as np

        import pytest

        from spiderray.functions.audiofp import compress_dynamics

        y, gr = compress_dynamics(np.zeros(0, np.float32), 16000)
        assert len(y) == 0 and gr == 0.0
        with pytest.raises(ValueError):
            compress_dynamics(self._tone(0.5), 16000, ratio=0.5)

    def test_actor_roundtrip_and_corrupt(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.stages.audioquality import audio_compress_stage
        from spiderray.stages.multimodal import _decode_one, _encode_pcm16

        x = self._tone(0.9)
        df = pd.DataFrame({
            "clip_id": ["a", "bad"],
            "bytes": [_encode_pcm16(x), b"\x00\x01garbage"],
            "codec": ["pcm_s16le", "flac"],
            "sr_hz": [16000, 16000],
            "dur_ms": [1000, 1000],
            "transcript": ["", ""],
        })
        out = (audio_compress_stage(rd.from_pandas(df), PipelineConfig(),
                                    concurrency=1)
               .to_pandas().set_index("clip_id"))
        assert bool(out.loc["a", "compress_ok"])
        assert not bool(out.loc["bad", "compress_ok"])
        y = _decode_one(out.loc["a", "bytes"], out.loc["a", "codec"])
        assert len(y) == len(x)
        assert float(out.loc["a", "gain_reduction_db"]) > 10
