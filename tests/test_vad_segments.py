"""VAD utterance segmentation (stages/multimodal.speech_segments / actor)."""

import numpy as np
import pyarrow as pa

from spiderray.config import PipelineConfig
from spiderray.stages.multimodal import (
    VadSegmentActor,
    _encode_pcm16,
    gapped_clips_batch,
    speech_segments,
)


def test_speech_segments_merge_and_prune():
    # runs: [1,1,0,1,1] with gap 1 < min_gap 2 → merged [0,5)
    mask = np.array([1, 1, 0, 1, 1], dtype=bool)
    assert speech_segments(mask, min_gap_frames=2, min_seg_frames=1) == [(0, 5)]
    # gap of exactly min_gap is NOT merged
    mask = np.array([1, 1, 0, 0, 1, 1], dtype=bool)
    assert speech_segments(mask, 2, 1) == [(0, 2), (4, 6)]
    # short segments pruned after merging
    mask = np.array([1, 0, 0, 0, 1, 1, 1], dtype=bool)
    assert speech_segments(mask, 2, 2) == [(4, 7)]
    assert speech_segments(np.zeros(5, bool), 2, 1) == []
    assert speech_segments(np.zeros(0, bool), 2, 1) == []
    assert speech_segments(np.ones(4, bool), 2, 5) == []


def _clip_batch(pcm, sr=16000, cid="clip_000000000042"):
    return pa.table(
        {
            "clip_id": pa.array([cid], pa.string()),
            "bytes": pa.array([_encode_pcm16(pcm)], pa.binary()),
            "sr_hz": pa.array([sr], pa.int32()),
            "dur_ms": pa.array([int(1000 * len(pcm) / sr)], pa.int32()),
            "codec": pa.array(["pcm_s16le"], pa.string()),
            "transcript": pa.array(["x"], pa.string()),
        }
    )


def test_actor_splits_speech_silence_speech():
    sr = 16000
    tone = 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr // 2) / sr).astype(np.float32)
    silence = np.zeros(sr // 2, dtype=np.float32)  # 500 ms >> min_gap 200 ms
    pcm = np.concatenate([tone, silence, tone])
    out = VadSegmentActor(PipelineConfig())(_clip_batch(pcm, sr))
    assert out.num_rows == 2
    assert out.column("seg_idx").to_pylist() == [0, 1]
    s0, s1 = out.column("start_ms").to_pylist()
    e0, e1 = out.column("end_ms").to_pylist()
    assert s0 == 0 and abs(e0 - 500) <= 20
    assert abs(s1 - 1000) <= 20 and abs(e1 - 1500) <= 20
    # emitted segment audio decodes to roughly the tone's rms
    seg = np.frombuffer(out.column("bytes")[0].as_py(), "<i2") / 32767.0
    assert abs(float(np.sqrt(np.mean(seg**2))) - 0.5 / np.sqrt(2)) < 0.02


def test_actor_short_gap_is_bridged():
    sr = 16000
    tone = 0.5 * np.ones(sr // 4, dtype=np.float32)
    blip = np.zeros(int(sr * 0.1), dtype=np.float32)  # 100 ms < min_gap 200
    pcm = np.concatenate([tone, blip, tone])
    out = VadSegmentActor(PipelineConfig())(_clip_batch(pcm, sr))
    assert out.num_rows == 1
    assert out.column("dur_ms").to_pylist()[0] >= 500


def test_actor_skips_undecodable_and_silent():
    batch = pa.table(
        {
            "clip_id": pa.array(["a", "b"], pa.string()),
            "bytes": pa.array([b"\x00" * 64, b""], pa.binary()),
            "sr_hz": pa.array([16000, 16000], pa.int32()),
            "dur_ms": pa.array([4, 0], pa.int32()),
            "codec": pa.array(["opus", "pcm_s16le"], pa.string()),
            "transcript": pa.array(["x", "y"], pa.string()),
        }
    )
    out = VadSegmentActor(PipelineConfig())(batch)
    assert out.num_rows == 0
    assert "clip_id" in out.column_names  # stable schema even when empty


def test_gapped_clips_batch_structure():
    sr = 16000
    tone = 0.5 * np.ones(sr // 4, dtype=np.float32)
    g = gapped_clips_batch(_clip_batch(tone, sr))
    assert g.column("codec").to_pylist() == ["pcm_s16le"]
    pcm = np.frombuffer(g.column("bytes")[0].as_py(), "<i2") / 32767.0
    # id 42 → gap 300 ms; lead 100 ms; total = 100ms + 250ms + 300ms + 250ms
    assert abs(len(pcm) / sr - 0.9) < 0.01
    assert np.all(np.abs(pcm[: int(sr * 0.09)]) < 1e-6)  # lead silence


def test_stage_runs_distributed(ray_session):
    import ray.data as rd

    from spiderray.sources.clips import synth_clips_table
    from spiderray.stages.multimodal import vad_segment_stage

    t = gapped_clips_batch(synth_clips_table(60))
    ds = rd.from_arrow(t)
    out = vad_segment_stage(ds, PipelineConfig(), emit_audio=False).to_pandas()
    serial = VadSegmentActor(PipelineConfig(), emit_audio=False)(t).to_pandas()
    out = out.sort_values(["clip_id", "seg_idx"]).reset_index(drop=True)
    serial = serial.sort_values(["clip_id", "seg_idx"]).reset_index(drop=True)
    assert out.equals(serial)
    assert (out.groupby("clip_id").size() == 2).all()


class TestWindowChunks:
    def test_window_math_exact(self):
        from spiderray.config import PipelineConfig
        from spiderray.stages.multimodal import WindowChunkActor, _encode_pcm16

        sr = 16000
        pcm = np.full(sr, 0.25, dtype=np.float32)  # exactly 1000 ms
        batch = pa.table({"clip_id": ["c"], "bytes": [_encode_pcm16(pcm)],
                          "codec": ["pcm_s16le"], "sr_hz": [sr]})
        out = WindowChunkActor(PipelineConfig(), win_ms=300, hop_ms=200,
                               min_tail_ms=100, emit_audio=True)(batch).to_pandas()
        # windows at 0,200,400,600,800 ms; the 800 ms one is a 200 ms tail
        assert list(out["start_ms"]) == [0, 200, 400, 600, 800]
        assert list(out["dur_ms"]) == [300, 300, 300, 300, 200]
        assert (out["win_rms"].to_numpy() > 0.24).all()
        # emitted audio decodes back to the window lengths
        from spiderray.stages.multimodal import _decode_one
        lens = [len(_decode_one(b, "pcm_s16le")) for b in out["bytes"]]
        assert lens == [4800, 4800, 4800, 4800, 3200]

    def test_short_tail_dropped_and_undecodable_skipped(self):
        from spiderray.config import PipelineConfig
        from spiderray.stages.multimodal import WindowChunkActor, _encode_pcm16

        sr = 8000
        pcm = np.full(int(sr * 0.45), 0.2, dtype=np.float32)  # 450 ms
        batch = pa.table({
            "clip_id": ["a", "b"],
            "bytes": [_encode_pcm16(pcm), b"zz"],
            "codec": ["pcm_s16le", "opus"],
            "sr_hz": [sr, sr],
        })
        out = WindowChunkActor(PipelineConfig(), win_ms=200, hop_ms=200,
                               min_tail_ms=100, emit_audio=False)(batch).to_pandas()
        # 0-200, 200-400 kept; the 50 ms tail at 400 dropped; opus skipped
        assert list(out["clip_id"]) == ["a", "a"]
        assert list(out["dur_ms"]) == [200, 200]


class TestAudioAugment:
    def _batch(self, sr=16000):
        from spiderray.stages.multimodal import _encode_pcm16
        t = np.arange(sr) / sr
        pcm = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        return pa.table({"clip_id": ["c1", "c2"],
                         "bytes": [_encode_pcm16(pcm)] * 2,
                         "codec": ["pcm_s16le", "pcm_s16le"],
                         "sr_hz": [sr, sr]})

    def test_deterministic_per_salt(self):
        from spiderray.stages.multimodal import AudioAugmentActor

        a = AudioAugmentActor(PipelineConfig(), salt="s")(self._batch()).to_pandas()
        b = AudioAugmentActor(PipelineConfig(), salt="s")(self._batch()).to_pandas()
        assert a[["gain_milli", "n_masks", "masked_ms"]].values.tolist() == \
            b[["gain_milli", "n_masks", "masked_ms"]].values.tolist()
        # a different salt is a different epoch
        c = AudioAugmentActor(PipelineConfig(), salt="t")(self._batch()).to_pandas()
        assert a[["gain_milli", "masked_ms"]].values.tolist() != \
            c[["gain_milli", "masked_ms"]].values.tolist()
        # and different clips draw different params under one salt
        assert a.loc[0, "gain_milli"] != a.loc[1, "gain_milli"] or \
            a.loc[0, "masked_ms"] != a.loc[1, "masked_ms"]

    def test_masks_actually_zero_audio(self):
        from spiderray.stages.multimodal import AudioAugmentActor, _decode_one

        out = AudioAugmentActor(PipelineConfig(), salt="s")(self._batch())
        df = out.to_pandas()
        pcm = _decode_one(df.loc[0, "bytes"], "pcm_s16le")
        n_zero = int((pcm == 0).sum())
        sr = 16000
        assert n_zero >= int(df.loc[0, "masked_ms"] * sr / 1000) - 2
        assert bool(df.loc[0, "aug_ok"])

    def test_undecodable_passthrough(self):
        from spiderray.stages.multimodal import AudioAugmentActor

        batch = pa.table({"clip_id": ["x"], "bytes": [b"zz"],
                          "codec": ["opus"], "sr_hz": [16000]})
        df = AudioAugmentActor(PipelineConfig())(batch).to_pandas()
        assert not bool(df.loc[0, "aug_ok"])
        assert df.loc[0, "bytes"] == b"zz" and df.loc[0, "codec"] == "opus"
