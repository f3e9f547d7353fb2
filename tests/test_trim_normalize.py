"""Loudness normalization + silence trim (stages/audioquality.py)."""

import numpy as np
import pyarrow as pa

from spiderray.config import PipelineConfig
from spiderray.functions.audiofp import loudness_stats
from spiderray.stages.audioquality import (LoudnessNormalizeActor,
                                           SilenceTrimActor)
from spiderray.stages.multimodal import _decode_one


def _tone_pcm(secs=1.0, sr=16000, amp=0.05):
    t = np.arange(int(sr * secs)) / sr
    return (amp * np.sin(2 * np.pi * 220 * t)).astype(np.float32)


def _as_row(pcm, cid="a", sr=16000):
    return pa.table({
        "clip_id": [cid],
        "bytes": [(np.clip(pcm, -1, 1) * 32767).astype("<i2").tobytes()],
        "codec": ["pcm_s16le"],
        "sr_hz": [sr],
    })


class TestLoudnessNormalize:
    def test_quiet_clip_lands_on_target(self):
        actor = LoudnessNormalizeActor(PipelineConfig(), target_lufs=-16.0)
        out = actor(_as_row(_tone_pcm(amp=0.02)))
        df = out.to_pandas()
        assert df.loc[0, "norm_ok"]
        assert abs(df.loc[0, "lufs_out"] - (-16.0)) < 1.0  # pcm16 rounding
        assert df.loc[0, "gain_db_milli"] > 0

    def test_gain_capped(self):
        actor = LoudnessNormalizeActor(PipelineConfig(), target_lufs=-16.0,
                                       max_gain_db=5.0)
        out = actor(_as_row(_tone_pcm(amp=0.001))).to_pandas()
        assert out.loc[0, "gain_db_milli"] == 5000

    def test_undecodable_passthrough(self):
        actor = LoudnessNormalizeActor(PipelineConfig())
        batch = pa.table({"clip_id": ["x"], "bytes": [b"junk"],
                          "codec": ["opus"], "sr_hz": [16000]})
        assert not actor(batch).to_pandas().loc[0, "norm_ok"]


class TestSilenceTrim:
    def test_trims_leading_and_trailing_silence(self):
        sr = 16000
        sig = _tone_pcm(0.5, amp=0.3)
        pcm = np.concatenate([np.zeros(sr // 2, np.float32), sig,
                              np.zeros(sr // 4, np.float32)])
        actor = SilenceTrimActor(PipelineConfig(), pad_ms=40)
        out_t = actor(_as_row(pcm))
        df = out_t.to_pandas()
        assert df.loc[0, "trim_ok"]
        # removed ~750ms minus 2×40ms pad
        assert 600 <= df.loc[0, "trimmed_ms"] <= 700
        y = _decode_one(out_t.column("bytes").to_pylist()[0], "pcm_s16le")
        assert abs(len(y) - (len(sig) + 2 * int(sr * 0.04))) <= 2 * 320

    def test_all_silent_passthrough(self):
        pcm = np.zeros(8000, np.float32)
        out = SilenceTrimActor(PipelineConfig())(_as_row(pcm)).to_pandas()
        assert not out.loc[0, "trim_ok"]
        assert out.loc[0, "trimmed_ms"] == 0

    def test_active_everywhere_trims_nothing(self):
        pcm = _tone_pcm(0.5, amp=0.3)
        out = SilenceTrimActor(PipelineConfig())(_as_row(pcm)).to_pandas()
        assert out.loc[0, "trim_ok"]
        assert out.loc[0, "trimmed_ms"] == 0
