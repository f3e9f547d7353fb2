"""Lossless FLAC transcode (stages/multimodal.FlacTranscodeActor)."""

import numpy as np
import pandas as pd
import pytest


def _clip_df():
    from spiderray.functions.flacdec import encode_flac
    from spiderray.stages.multimodal import _encode_pcm16

    sr = 16000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    q = np.round(x.astype(np.float64) * 32767.0).astype(np.int64)
    return pd.DataFrame({
        "clip_id": ["pcm", "flacin", "bad"],
        "bytes": [_encode_pcm16(x), encode_flac(q, sr), b"junk"],
        "codec": ["pcm_s16le", "flac", "flac"],
        "sr_hz": [sr, sr, sr],
        "dur_ms": [1000, 1000, 1000],
        "transcript": ["", "", ""],
    })


class TestFlacTranscode:
    def test_lossless_and_smaller(self, ray_session):
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.stages.multimodal import flac_transcode_stage

        out = (flac_transcode_stage(rd.from_pandas(_clip_df()),
                                    PipelineConfig(), concurrency=1)
               .to_pandas().set_index("clip_id"))
        for cid in ("pcm", "flacin"):
            assert bool(out.loc[cid, "flac_ok"])
            assert bool(out.loc[cid, "lossless"])
            assert out.loc[cid, "codec"] == "flac"
        assert out.loc["pcm", "n_bytes_flac"] < out.loc["pcm", "n_bytes_in"]
        assert not bool(out.loc["bad", "flac_ok"])
        assert out.loc["bad", "bytes"] == b"junk"   # pass-through

    def test_roundtrip_samples_exact(self, ray_session):
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.stages.multimodal import (_decode_one,
                                                 flac_transcode_stage)

        df = _clip_df()
        out = (flac_transcode_stage(rd.from_pandas(df), PipelineConfig(),
                                    concurrency=1)
               .to_pandas().set_index("clip_id"))
        src = _decode_one(df.set_index("clip_id").loc["pcm", "bytes"],
                          "pcm_s16le")
        back = _decode_one(out.loc["pcm", "bytes"], "flac")
        q = np.round(np.clip(src.astype(np.float64), -1, 1) * 32767.0)
        assert np.array_equal(
            np.round(back.astype(np.float64) * 32767.0), q)
