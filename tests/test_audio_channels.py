"""Stereo channel-defect gate: dead channel, fake stereo, phase inversion."""

import numpy as np
import pyarrow as pa

from spiderray.config import PipelineConfig
from spiderray.functions.audiofp import channel_stats
from spiderray.stages.audioquality import (AudioChannelActor,
                                           audio_channel_stage)
from spiderray.stages.multimodal import _decode_one_multi
from spiderray.pipelines.queries import _pcm16_wav


def _tone(freq: float, n: int = 8000, sr: int = 16000) -> np.ndarray:
    return 0.5 * np.sin(2 * np.pi * freq * np.arange(n) / sr)


class TestChannelKernel:
    def test_true_stereo_low_corr(self):
        s = channel_stats(np.stack([_tone(440), _tone(910)], axis=1))
        assert s["n_channels"] == 2
        assert abs(s["lr_corr"]) < 0.5
        assert s["rms_ratio"] > 0.9

    def test_fake_stereo_corr_one(self):
        left = _tone(440)
        s = channel_stats(np.stack([left, left], axis=1))
        assert s["lr_corr"] > 0.999
        assert s["rms_ratio"] > 0.999

    def test_phase_inversion_corr_minus_one(self):
        left = _tone(440)
        s = channel_stats(np.stack([left, -left], axis=1))
        assert s["lr_corr"] < -0.999

    def test_dead_channel_ratio(self):
        s = channel_stats(np.stack([_tone(440), np.zeros(8000)], axis=1))
        assert s["rms_ratio"] == 0.0
        assert s["lr_corr"] == 0.0  # flat side → correlation undefined → 0

    def test_mono_and_degenerate(self):
        assert channel_stats(_tone(440)) == {
            "n_channels": 1, "lr_corr": 0.0, "rms_ratio": 1.0}
        assert channel_stats(np.zeros((0, 2)))["n_channels"] == 1
        silent = channel_stats(np.zeros((100, 2)))
        assert silent["rms_ratio"] == 1.0 and silent["lr_corr"] == 0.0


class TestChannelDecode:
    def test_wav_stereo_preserved_and_downmix_unchanged(self):
        from spiderray.stages.multimodal import _decode_one

        left, right = _tone(440), _tone(910)
        buf = _pcm16_wav(np.stack([left, right], axis=1), 16000)
        multi = _decode_one_multi(buf, "wav")
        assert multi.shape == (8000, 2)
        assert np.allclose(multi[:, 0], left, atol=1e-3)
        assert np.allclose(multi[:, 1], right, atol=1e-3)
        mono = _decode_one(buf, "wav")
        assert mono.ndim == 1
        assert np.allclose(mono, multi.mean(axis=1), atol=1e-6)

    def test_mono_codecs_become_column(self):
        pcm = (np.clip(_tone(500), -1, 1) * 32767).astype("<i2").tobytes()
        x = _decode_one_multi(pcm, "pcm_s16le")
        assert x.shape == (8000, 1)


class TestChannelActor:
    def _batch(self):
        left = _tone(440)
        mk = lambda r: _pcm16_wav(np.stack([left, r], axis=1), 16000)  # noqa: E731
        return pa.table({
            "clip_id": pa.array(["true", "fake", "dead", "inv", "mono",
                                 "bad"], pa.string()),
            "bytes": pa.array([mk(_tone(910)), mk(left), mk(np.zeros(8000)),
                               mk(-left),
                               _pcm16_wav(left.reshape(-1, 1), 16000), b"xx"],
                              pa.binary()),
            "codec": pa.array(["wav"] * 5 + ["opus"], pa.string()),
            "sr_hz": pa.array([16000] * 6, pa.int32()),
        })

    def test_flags(self):
        out = AudioChannelActor(PipelineConfig())(self._batch())
        rows = {c: out.column(c).to_pylist() for c in out.column_names}
        assert rows["decode_ok"] == [True] * 5 + [False]
        assert rows["dead_channel"] == [False, False, True, False, False,
                                        False]
        assert rows["fake_stereo"] == [False, True, False, False, False,
                                       False]
        assert rows["phase_inverted"] == [False, False, False, True, False,
                                          False]
        assert rows["n_channels"] == [2, 2, 2, 2, 1, 0]

    def test_stage_runs_distributed(self, ray_session):
        import ray.data as rd

        out = audio_channel_stage(rd.from_arrow(self._batch()),
                                  PipelineConfig(), concurrency=2).to_pandas()
        r = out.set_index("clip_id")
        assert r.loc["fake", "fake_stereo"]
        assert r.loc["inv", "phase_inverted"]
        assert not r.loc["true", ["dead_channel", "fake_stereo",
                                  "phase_inverted"]].any()


class TestCodecSniff:
    def test_sniff_signatures(self):
        import struct

        from spiderray.functions.audiofp import sniff_container

        wav = b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
        assert sniff_container(wav) == "riff"
        assert sniff_container(b"fLaC\x00\x00") == "flac"
        assert sniff_container(b"FORM\x00\x00\x00\x00AIFF") == "form"
        assert sniff_container(b"OggS" + bytes(8)) == "ogg"
        # bare / unsniffable ID3v2 tag → 'id3' (tag is not a codec);
        # a tag WRAPPING a recognizable payload sniffs the payload
        assert sniff_container(b"ID3\x04\x00\x00\x00\x00\x00\x00"
                               + bytes(4)) == "id3"
        wrapped = (b"ID3\x04\x00\x00\x00\x00\x00\x02" + bytes(2)
                   + b"\xff\xfb\x90\x00")
        assert sniff_container(wrapped) == "mp3"
        assert sniff_container(b"\xff\xfb\x90\x00") == "mp3"   # MPEG sync
        assert sniff_container(b"\xff\xf1\x00\x00") == "adts"  # AAC ADTS
        assert sniff_container(b"\xff\xe0\x00\x00") is None    # layer bits 00
        # review finding: raw-PCM-looking byte pairs must NOT sync —
        # bad bitrate index (0xF_), reserved version, reserved samplerate
        assert sniff_container(b"\xff\xff\xff\xff") is None
        assert sniff_container(b"\xff\xea\x90\x00") is None    # version 01
        assert sniff_container(b"\xff\xfb\x9c\x00") is None    # sr idx 3
        assert sniff_container(b"\x00\x01\x02\x03") is None
        assert sniff_container(b"") is None

    def test_mismatch_rules(self):
        import struct

        from spiderray.functions.audiofp import codec_mismatch

        wav = b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
        assert codec_mismatch(wav, "wav") == ("riff", False)
        assert codec_mismatch(wav, "pcm_s16le") == ("riff", True)
        assert codec_mismatch(b"fLaC\x00\x00", "wav") == ("flac", True)
        assert codec_mismatch(b"OggS" + bytes(8), "opus") == ("ogg", False)
        # unknown declared codec or raw bytes: conservative, never flag
        assert codec_mismatch(wav, "mystery")[1] is False
        assert codec_mismatch(b"\x00\x01", "wav") == (None, False)
        # an ID3v2 tag is legal on both mp3 and aac — never a mismatch
        tag = b"ID3\x04\x00\x00\x00\x00\x00\x00" + bytes(4)
        assert codec_mismatch(tag, "mp3") == ("id3", False)
        assert codec_mismatch(tag, "aac") == ("id3", False)
        assert codec_mismatch(tag, "flac") == ("id3", True)

    def test_stage_runs(self, ray_session):
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.stages.audioquality import codec_sniff_stage

        t = pa.table({
            "clip_id": pa.array(["ok", "bad"], pa.string()),
            "bytes": pa.array([b"fLaC\x00\x00", b"fLaC\x00\x00"], pa.binary()),
            "codec": pa.array(["flac", "mp3"], pa.string()),
        })
        out = codec_sniff_stage(rd.from_arrow(t),
                                PipelineConfig()).to_pandas()
        r = out.set_index("clip_id")
        assert not r.loc["ok", "codec_mismatch"]
        assert r.loc["bad", "codec_mismatch"]
        assert r.loc["bad", "sniffed"] == "flac"


class TestAudioQc:
    def test_strata_map_to_exact_flags(self, ray_session):
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.pipelines.queries import _qc_clips_batch
        from spiderray.stages.audioquality import audio_qc_stage

        clips = _qc_clips_batch(
            pa.table({"doc_id": pa.array(np.arange(66, dtype=np.int64))}))
        out = (audio_qc_stage(rd.from_arrow(clips).repartition(3),
                              PipelineConfig(), concurrency=2)
               .to_pandas())
        ids = out["clip_id"].str[3:].astype(int)
        out["stratum"] = np.where(ids % 17 == 5, -1, ids % 11)
        flag_cols = ["codec_mismatch", "dc_offset", "hum", "upsampled",
                     "reverberant", "clipped", "dropout", "dead_channel",
                     "fake_stereo", "phase_inverted"]
        want = {0: [], 1: ["dc_offset"], 2: ["hum"], 3: ["reverberant"],
                4: ["clipped"], 5: ["upsampled"], 6: ["dropout"],
                7: ["fake_stereo"], 8: ["phase_inverted"],
                9: ["codec_mismatch"], 10: []}
        for st, g in out.groupby("stratum"):
            if st == -1:
                assert not g["decode_ok"].any() and not g["keep"].any()
                continue
            got = [c for c in flag_cols if g[c].all()]
            assert got == want[st], (st, got)
            assert g["keep"].all() == (want[st] == [])

    def test_fused_equals_standalone_gates(self, ray_session):
        """The battery must reproduce each standalone gate's flags —
        decode-once fusion is an optimization, never a semantics change."""
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.pipelines.queries import _qc_clips_batch
        from spiderray.stages.audioquality import (AudioHumActor,
                                                   AudioQcActor)

        clips = _qc_clips_batch(
            pa.table({"doc_id": pa.array(np.arange(40, dtype=np.int64))}))
        fused = AudioQcActor(PipelineConfig())(clips).to_pandas()
        hum = AudioHumActor(PipelineConfig())(clips).to_pandas()
        assert fused["dc_offset"].tolist() == hum["dc_offset"].tolist()
        assert fused["hum"].tolist() == hum["hum"].tolist()


class TestPrepareSpeech:
    def test_composite_matches_serial_chain(self, ray_session):
        import hashlib

        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.pipelines.prepare_speech import prepare_speech
        from spiderray.pipelines.queries import _qc_clips_batch
        from spiderray.stages.audioquality import (AudioDenoiseActor,
                                                   AudioQcActor,
                                                   LoudnessNormalizeActor)
        from spiderray.stages.multimodal import VadSegmentActor

        cfg = PipelineConfig()
        clips = _qc_clips_batch(
            pa.table({"doc_id": pa.array(np.arange(44, dtype=np.int64))}))
        dist = (prepare_speech(rd.from_arrow(clips).repartition(3), cfg)
                .to_pandas())
        dist["md5"] = [hashlib.md5(b).hexdigest() for b in dist["bytes"]]
        dist = (dist[["clip_id", "seg_idx", "start_ms", "end_ms", "md5"]]
                .sort_values(["clip_id", "seg_idx"]).reset_index(drop=True))

        qc = AudioQcActor(cfg)(clips)
        kept = qc.filter(qc.column("keep")).select(
            ["clip_id", "bytes", "codec", "sr_hz"])
        segs = VadSegmentActor(cfg, threshold=0.01, min_seg_ms=100,
                               emit_audio=True)(
            LoudnessNormalizeActor(cfg)(AudioDenoiseActor(cfg)(kept)))
        ser = segs.to_pandas()
        ser["md5"] = [hashlib.md5(b).hexdigest() for b in ser["bytes"]]
        ser = (ser[["clip_id", "seg_idx", "start_ms", "end_ms", "md5"]]
               .sort_values(["clip_id", "seg_idx"]).reset_index(drop=True))
        assert len(dist) > 0
        assert dist.values.tolist() == ser.values.tolist()
        # only the clean strata (0 and 10, minus the undecodable slot)
        # survive the gate
        ids = dist["clip_id"].str[3:].astype(int)
        assert set(ids % 11) <= {0, 10}
