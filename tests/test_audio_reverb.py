"""Blind-reverberation gate: decay-slope RT60 proxy after the last burst."""

import numpy as np
import pyarrow as pa

from spiderray.config import PipelineConfig
from spiderray.functions.audiofp import (MAX_REVERB_RT60_MS, MAX_RT60_MS,
                                         reverb_stats)
from spiderray.stages.audioquality import AudioReverbActor, audio_reverb_stage


def _burst_with_tail(rt60_s: float | None, sr: int = 16000,
                     dur_s: float = 1.0, burst_s: float = 0.2) -> np.ndarray:
    t = np.arange(int(sr * dur_s)) / sr
    env = np.where(t < burst_s, 1.0,
                   0.0 if rt60_s is None
                   else 10.0 ** (-3.0 * (t - burst_s) / rt60_s))
    return 0.4 * np.sin(2 * np.pi * 800.0 * t) * env


class TestReverbKernel:
    def test_recovers_planted_rt60(self):
        for rt in (0.25, 0.6, 1.0, 1.5):
            s = reverb_stats(_burst_with_tail(rt), 16000)
            assert abs(s["rt60_ms"] - rt * 1000.0) < 0.05 * rt * 1000.0, rt
            assert s["decay_db_s"] < 0

    def test_dry_burst_and_sustained_are_zero(self):
        assert reverb_stats(_burst_with_tail(None), 16000)["rt60_ms"] == 0.0
        sustained = 0.4 * np.sin(2 * np.pi * 800.0 * np.arange(16000) / 16000)
        assert reverb_stats(sustained, 16000)["rt60_ms"] == 0.0

    def test_flat_tail_is_floor_not_reverb(self):
        # burst then a sustained -10 dB tail: indistinguishable from the
        # clip's own noise floor → no measurable decay → 0, never flagged
        # (pre-fix this measured a fake near-zero slope → rt60 ≈ 34 s)
        t = np.arange(16000) / 16000.0
        x = 0.4 * np.sin(2 * np.pi * 800.0 * t)
        x[t >= 0.2] *= 10.0 ** (-10.0 / 20.0)
        assert reverb_stats(x, 16000)["rt60_ms"] == 0.0

    def test_noise_floor_does_not_fake_reverb(self):
        # review finding: a DRY clip over a steady -20 dB noise bed must
        # not flag — the tail measurement stops at the floor
        rng = np.random.default_rng(1)
        t = np.arange(16000) / 16000.0
        burst = 0.4 * np.sin(2 * np.pi * 800.0 * t) * (t < 0.2)
        bed = 0.04 * rng.normal(0, 1, 16000)
        assert reverb_stats(burst + bed, 16000)["rt60_ms"] == 0.0
        # ...while genuine reverb OVER a -28 dB bed is still detected
        amp = np.where(t < 0.2, 1.0, 10.0 ** (-3.0 * (t - 0.2) / 1.2))
        wet = 0.4 * np.sin(2 * np.pi * 800.0 * t) * amp
        s = reverb_stats(wet + 0.016 * rng.normal(0, 1, 16000), 16000)
        assert MAX_REVERB_RT60_MS < s["rt60_ms"] <= MAX_RT60_MS

    def test_trailing_silence_does_not_flatten_fit(self):
        # 0.3 s RT60 tail followed by hard silence: the tail measurement
        # stops at the floor, so the silence cannot inflate rt60
        x = _burst_with_tail(0.3)
        x[8000:] = 0.0
        s = reverb_stats(x, 16000)
        assert abs(s["rt60_ms"] - 300.0) < 30.0

    def test_degenerate_inputs(self):
        z = {"rt60_ms": 0.0, "decay_db_s": 0.0}
        assert reverb_stats(np.zeros(16000), 16000) == z
        assert reverb_stats(np.array([]), 16000) == z
        assert reverb_stats(np.ones(100) * 0.1, 0) == z
        assert reverb_stats(np.ones(10) * 0.1, 16000) == z  # <3 frames


class TestReverbActor:
    def _batch(self):
        enc = lambda x: (x * 32000).astype("<i2").tobytes()  # noqa: E731
        return pa.table({
            "clip_id": pa.array(["dry", "wet", "room", "bad"], pa.string()),
            "bytes": pa.array([enc(_burst_with_tail(None)),
                               enc(_burst_with_tail(1.2)),
                               enc(_burst_with_tail(0.25)), b"xx"],
                              pa.binary()),
            "codec": pa.array(["pcm_s16le"] * 3 + ["opus"], pa.string()),
            "sr_hz": pa.array([16000] * 4, pa.int32()),
        })

    def test_flags_and_marks(self):
        out = AudioReverbActor(PipelineConfig())(self._batch())
        rows = {c: out.column(c).to_pylist() for c in out.column_names}
        assert rows["decode_ok"] == [True, True, True, False]
        assert rows["reverberant"] == [False, True, False, False]
        assert rows["rt60_ms"][3] == 0.0
        assert rows["rt60_ms"][1] > MAX_REVERB_RT60_MS

    def test_threshold_override(self):
        out = AudioReverbActor(PipelineConfig(),
                               max_rt60_ms=10_000.0)(self._batch())
        assert out.column("reverberant").to_pylist() == [False] * 4

    def test_stage_runs_distributed(self, ray_session):
        import ray.data as rd

        out = audio_reverb_stage(rd.from_arrow(self._batch()),
                                 PipelineConfig(), concurrency=2).to_pandas()
        assert len(out) == 4
        assert out.set_index("clip_id").loc["wet", "reverberant"]
        assert not out.set_index("clip_id").loc["room", "reverberant"]
