"""Manifest/resume, CLI, perplexity actor, audio feature stages,
detect_domain pipeline."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from spiderray.config import PipelineConfig
from spiderray.sources import clips as clipsrc
from spiderray.state import manifest as mf


class TestManifest:
    def test_partition_of_stable(self):
        assert mf.partition_of("clip_000000000001", 16) == mf.partition_of(
            "clip_000000000001", 16
        )
        parts = {mf.partition_of(f"clip_{i:012d}", 8) for i in range(100)}
        assert len(parts) == 8  # spreads

    def test_resumable_run_and_skip(self, ray_session, tmp_path):
        from spiderray.pipelines.quality_filter import quality_filter

        out_dir = str(tmp_path / "out")

        def shard_factory(part, n_parts):
            import ray.data as rd

            tbl = clipsrc.synth_clips_table(120)
            ids = tbl.column("clip_id").to_pylist()
            mask = [mf.partition_of(i, n_parts) == part for i in ids]
            return rd.from_arrow(tbl.filter(pa.array(mask)))

        s1 = mf.run_resumable(shard_factory, quality_filter, out_dir, 4, PipelineConfig())
        assert s1["skipped"] == 0 and len(s1["completed"]) == 4
        assert s1["rows"] == 120

        manifests = mf.read_manifests(out_dir)
        assert len(manifests) == 4
        assert sum(m["rows"] for m in manifests) == 120
        assert all("lang_hist" in m and "drop_reason_hist" in m for m in manifests)

        # resume: everything skipped
        s2 = mf.run_resumable(shard_factory, quality_filter, out_dir, 4, PipelineConfig())
        assert s2["skipped"] == 4 and s2["completed"] == [] and s2["rows"] == 0

        # delete one manifest → only that partition reruns
        os.remove(mf.manifest_path(out_dir, 2))
        s3 = mf.run_resumable(shard_factory, quality_filter, out_dir, 4, PipelineConfig())
        assert s3["completed"] == [2]

    def test_output_readable(self, ray_session, tmp_path):
        from spiderray.pipelines.quality_filter import quality_filter

        out_dir = str(tmp_path / "out2")

        def shard_factory(part, n_parts):
            import ray.data as rd

            tbl = clipsrc.synth_clips_table(60)
            ids = tbl.column("clip_id").to_pylist()
            mask = [mf.partition_of(i, n_parts) == part for i in ids]
            return rd.from_arrow(tbl.filter(pa.array(mask)))

        mf.run_resumable(shard_factory, quality_filter, out_dir, 2, PipelineConfig())
        import pyarrow.dataset as pads

        back = pa.concat_tables(
            [
                pads.dataset(mf.part_dir(out_dir, p), format="parquet").to_table()
                for p in (0, 1)
            ]
        )
        assert back.num_rows == 60
        assert "scrubbed_transcript" in back.column_names


class TestPerplexity:
    def test_actor_orders_languages(self):
        from spiderray.stages.perplexity_stage import PerplexityActor

        actor = PerplexityActor()
        batch = pa.table(
            {
                "transcript": [
                    "the government announced new measures to improve quality",
                    "qzx jkw vvq zzz xqj wkj qqq",  # gibberish
                ],
                "lang": ["en", "en"],
            }
        )
        out = actor(batch)
        ppl = out.column("ppl").to_pylist()
        assert ppl[0] < ppl[1]

    def test_stage_runs(self, ray_session):
        import ray.data as rd

        from spiderray.stages.perplexity_stage import perplexity_stage

        cfg = PipelineConfig(perplexity_concurrency=2)
        ds = rd.from_arrow(clipsrc.synth_clips_table(56, with_audio=False))
        ds = ds.map_batches(
            lambda t: t.append_column("lang", pa.array(["en"] * len(t))),
            batch_format="pyarrow",
        )
        out = perplexity_stage(ds, cfg).to_pandas()
        assert "ppl" in out.columns and len(out) == 56
        assert (out["ppl"] > 0).all()


class TestAudio:
    def test_feature_actor_pcm_and_stub(self):
        from spiderray.stages.multimodal import AudioFeatureActor

        actor = AudioFeatureActor()
        tbl = clipsrc.synth_clips_table(28)
        out = actor(tbl)
        df = out.to_pandas()
        pcm = df[df.codec == "pcm_s16le"]
        other = df[df.codec != "pcm_s16le"]
        assert pcm["decode_ok"].all()
        assert (pcm["audio_rms"] > 0.1).all()  # 0.6 amplitude sine
        assert (pcm["n_samples"] > 0).all()
        assert not other["decode_ok"].any()  # stubbed codecs marked, not raised
        assert (other["audio_rms"] == 0).all()
        # frame sampling: 20ms frames
        row = pcm.iloc[0]
        assert len(row["frame_rms"]) == int(row["n_samples"] // (row["sr_hz"] * 0.02))

    def test_audio_stage_and_silence_gate(self, ray_session):
        import ray.data as rd

        from spiderray.stages.multimodal import audio_features_stage, silence_gate_stage

        cfg = PipelineConfig()
        ds = rd.from_arrow(clipsrc.synth_clips_table(28))
        ds = audio_features_stage(ds, cfg, concurrency=2)
        out = silence_gate_stage(ds, cfg).to_pandas()
        assert "keep" in out.columns
        # sine clips aren't silent: every decoded row kept
        assert out[out.decode_ok]["keep"].all()


class TestDetectDomain:
    def test_enrich(self, ray_session):
        import ray.data as rd

        from spiderray.pipelines.detect_domain import enrich_domains

        pages = rd.from_items(
            [
                {
                    "host": "news.sina.com.cn",
                    "title": "新闻中心首页_新浪网",
                    "description": "desc",
                    "body_text": "今日新闻内容。" * 20 + " 京ICP备12345678号",
                    "meta_lang": "",
                    "charset": "UTF-8",
                },
                {
                    "host": "www.nasa.gov",
                    "title": "NASA | Home",
                    "description": "space",
                    "body_text": "the national aeronautics and space administration " * 10,
                    "meta_lang": "en",
                    "charset": "UTF-8",
                },
            ]
        )
        out = enrich_domains(pages, {"news.sina.com.cn": (5, 3)}).to_pandas()
        sina = out[out.host == "news.sina.com.cn"].iloc[0]
        assert sina["domain_top"] == "sina.com.cn"
        assert sina["icp"] == "京ICP备12345678"
        assert sina["icp_province"] == "北京"
        assert sina["country"] == "中国"
        assert sina["lang"] == "zh"
        assert sina["n_content"] == 5 and sina["n_list"] == 3
        nasa = out[out.host == "www.nasa.gov"].iloc[0]
        assert nasa["country"] == "美国" and nasa["category"] == "政务"
        assert nasa["title_clean"] == "NASA"


class TestCli:
    def test_run_cli_resumable(self, ray_session, tmp_path):
        from spiderray.run import main

        out_dir = str(tmp_path / "cli_out")
        rc = main(["--input", "synth:100", "--output", out_dir, "--partitions", "3"])
        assert rc == 0
        assert len(mf.completed_partitions(out_dir)) == 3


class TestAudioCodecs:
    def test_mulaw_roundtrip(self):
        from spiderray.stages.multimodal import _decode_one, _mulaw_expand

        # µ-law compress a sine in numpy (reference G.711 encoder), decode
        # with the stage's expander, require SNR typical of 8-bit companding
        t = np.arange(4000) / 8000.0
        x = 0.5 * np.sin(2 * np.pi * 220 * t)
        mag = np.abs(x * 32124.0).astype(np.int64) + 0x84
        exponent = np.floor(np.log2(mag >> 7)).astype(np.int64)
        mantissa = (mag >> (exponent + 3)) & 0x0F
        enc = (~((np.where(x < 0, 0x80, 0)) | (exponent << 4) | mantissa)).astype(np.uint8)
        dec = _mulaw_expand(enc)
        snr = 10 * np.log10(np.mean(x**2) / np.mean((x - dec) ** 2))
        assert snr > 25.0
        assert np.array_equal(dec, _decode_one(enc.tobytes(), "pcm_mulaw"))

    def test_wav_container(self):
        from spiderray.stages.multimodal import _decode_one

        pcm = (np.sin(np.arange(1000) / 10.0) * 20000).astype("<i2")
        data = pcm.tobytes()
        fmt = (
            b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + (16000).to_bytes(4, "little") + (32000).to_bytes(4, "little")
            + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        )
        chunks = fmt + b"data" + len(data).to_bytes(4, "little") + data
        wav = b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks
        out = _decode_one(wav, "wav")
        np.testing.assert_allclose(out, pcm.astype(np.float32) / 32767.0)

    def test_unsupported_still_stubbed(self):
        from spiderray.stages.multimodal import DecodeUnsupported, _decode_one

        with pytest.raises(DecodeUnsupported):
            _decode_one(b"xxxx", "opus")


class TestClipFormatContract:
    """Lance/Parquet branch selection (BASELINE input_hint names Lance; the
    package is absent in this container so only branch logic + the parquet
    path can execute)."""

    def test_auto_resolves_parquet_here(self):
        from spiderray.sources.clips import lance_available, resolve_clip_format

        assert not lance_available()  # container contract
        assert resolve_clip_format("auto") == "parquet"

    def test_explicit_lance_fails_loudly(self):
        import pytest

        from spiderray.sources.clips import resolve_clip_format

        with pytest.raises(ImportError, match="lance"):
            resolve_clip_format("lance")
        with pytest.raises(ValueError):
            resolve_clip_format("orc")

    def test_roundtrip_through_selected_branch(self, ray_session, tmp_path):
        import ray.data as rd

        from spiderray.sources.clips import read_clips, write_clips

        ds = rd.from_items([
            {"clip_id": "c1", "bytes": b"\x00\x01", "sr_hz": 16000,
             "dur_ms": 10, "codec": "pcm_s16le", "transcript": "hello"},
        ])
        fmt = write_clips(ds, str(tmp_path / "clips"))
        assert fmt == "parquet"
        back = read_clips(str(tmp_path / "clips")).to_pandas()
        assert back.iloc[0]["clip_id"] == "c1"
        assert back.iloc[0]["bytes"] == b"\x00\x01"


class TestConcurrentResumable:
    def test_concurrent_matches_serial(self, ray_session, tmp_path):
        import ray.data as rd

        from spiderray.state import manifest as mf

        def shard_factory(part, n_parts):
            rows = [
                {"clip_id": f"c{i}", "keep": i % 2 == 0,
                 "drop_reason": "" if i % 2 == 0 else "short_transcript",
                 "lang": "en" if i % 3 else "zh"}
                for i in range(40) if i % n_parts == part
            ]
            return rd.from_items(rows)

        ident = lambda ds: ds

        serial = str(tmp_path / "serial")
        conc = str(tmp_path / "conc")
        s = mf.run_resumable(shard_factory, ident, serial, n_parts=4)
        c = mf.run_resumable(shard_factory, ident, conc, n_parts=4, max_concurrent=4)
        assert s["rows"] == c["rows"] and s["kept"] == c["kept"]
        assert sorted(s["completed"]) == sorted(c["completed"]) == [0, 1, 2, 3]

        ms = {m["part"]: m for m in mf.read_manifests(serial)}
        mc = {m["part"]: m for m in mf.read_manifests(conc)}
        for part in range(4):
            for key in ("rows", "kept", "dropped", "lang_hist", "drop_reason_hist"):
                assert ms[part][key] == mc[part][key], (part, key)

        # rerun skips everything (both modes)
        again = mf.run_resumable(shard_factory, ident, conc, n_parts=4, max_concurrent=4)
        assert again["skipped"] == 4 and not again["completed"]


class TestAlawAiff:
    """G.711 A-law expander + AIFF container (public specs, pure numpy)."""

    def test_alaw_known_codes(self):
        from spiderray.stages.multimodal import _alaw_expand

        dec = _alaw_expand(np.arange(256, dtype=np.uint8)) * 32256.0
        # ITU reference points: 0x55 -> -8 (smallest negative), 0xD5 -> +8,
        # 0x2A -> -32256 (most negative), 0xAA -> +32256 (most positive)
        assert dec[0x55] == -8 and dec[0xD5] == 8
        assert dec[0x2A] == -32256 and dec[0xAA] == 32256
        # decoder must be odd-symmetric: flipping the sign bit negates
        assert np.array_equal(dec[:128], -dec[128:])

    def test_alaw_roundtrip_snr(self):
        from spiderray.stages.multimodal import _alaw_expand, _decode_one

        # reference G.711 linear2alaw (classic g711.c arithmetic)
        seg_end = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF])
        t = np.arange(4000) / 8000.0
        x = 0.5 * np.sin(2 * np.pi * 220 * t)
        pcm = (x * 32256.0).astype(np.int64) >> 3
        mask = np.where(pcm >= 0, 0xD5, 0x55)
        mag = np.where(pcm >= 0, pcm, -pcm - 1)
        seg = np.searchsorted(seg_end, mag, side="left")
        shift = np.where(seg < 2, 1, seg)
        aval = np.where(seg >= 8, 0x7F,
                        (np.minimum(seg, 7) << 4) | ((mag >> shift) & 0x0F))
        enc = (aval ^ mask).astype(np.uint8)
        dec = _alaw_expand(enc)
        snr = 10 * np.log10(np.mean(x**2) / np.mean((x - dec) ** 2))
        assert snr > 30.0  # A-law mid-level SNR ≈ 35 dB
        assert np.array_equal(dec, _decode_one(enc.tobytes(), "pcm_alaw"))

    def _aiff(self, data: bytes, n_ch: int, bits: int, rate: float = 8000.0) -> bytes:
        import struct

        m, e = np.frexp(rate)
        mant = int(m * (1 << 64))
        f80 = struct.pack(">HQ", e + 16382, mant)
        n_frames = len(data) // (n_ch * bits // 8)
        comm = (b"COMM" + (18).to_bytes(4, "big")
                + n_ch.to_bytes(2, "big") + n_frames.to_bytes(4, "big")
                + bits.to_bytes(2, "big") + f80)
        ssnd = (b"SSND" + (8 + len(data)).to_bytes(4, "big")
                + (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + data)
        body = b"AIFF" + comm + ssnd
        return b"FORM" + len(body).to_bytes(4, "big") + body

    def test_float80(self):
        from spiderray.stages.multimodal import _float80_be

        for rate in (8000.0, 16000.0, 22050.0, 44100.0):
            buf = self._aiff(b"\x00\x00", 1, 16, rate)
            # COMM rate field sits 8 bytes into the COMM body
            i = buf.index(b"COMM") + 8 + 8
            assert _float80_be(buf[i : i + 10]) == rate

    def test_aiff_pcm16_mono(self):
        from spiderray.stages.multimodal import _decode_one

        pcm = (np.sin(np.arange(500) / 7.0) * 20000).astype(">i2")
        out = _decode_one(self._aiff(pcm.tobytes(), 1, 16), "aiff")
        np.testing.assert_allclose(out, pcm.astype(np.float32) / 32767.0)

    def test_aiff_stereo_downmix_and_8bit(self):
        from spiderray.stages.multimodal import _decode_one

        left = (np.arange(100) * 100).astype(">i2")
        right = (np.arange(100) * -100).astype(">i2")
        inter = np.empty(200, dtype=">i2")
        inter[0::2], inter[1::2] = left, right
        out = _decode_one(self._aiff(inter.tobytes(), 2, 16), "aiff")
        np.testing.assert_allclose(out, 0.0, atol=1e-6)  # L+R cancel
        s8 = np.array([0, 127, -127, -64], dtype=np.int8)
        out8 = _decode_one(self._aiff(s8.tobytes(), 1, 8), "aiff")
        np.testing.assert_allclose(out8, s8.astype(np.float32) / 127.0)

    def test_aiff_corrupt(self):
        from spiderray.stages.multimodal import DecodeUnsupported, _decode_one

        import pytest

        good = self._aiff(b"\x00\x00" * 4, 1, 16)
        for bad in (b"FORMxxxxAIFC" + good[12:],     # wrong form type
                    good[: good.index(b"SSND")],      # no sound chunk
                    b""):
            with pytest.raises(DecodeUnsupported):
                _decode_one(bad, "aiff")

    def test_wav_fmt_variants(self):
        from spiderray.stages.multimodal import (DecodeUnsupported, _decode_one,
                                                 _mulaw_expand)

        import pytest

        def wav(fmt_tag, n_ch, bits, data):
            fmt = (b"fmt " + (16).to_bytes(4, "little")
                   + fmt_tag.to_bytes(2, "little") + n_ch.to_bytes(2, "little")
                   + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
                   + (1).to_bytes(2, "little") + bits.to_bytes(2, "little"))
            chunks = fmt + b"data" + len(data).to_bytes(4, "little") + data
            return (b"RIFF" + (4 + len(chunks)).to_bytes(4, "little")
                    + b"WAVE" + chunks)

        # 8-bit unsigned PCM
        u8 = np.array([128, 255, 0, 64], dtype=np.uint8)
        np.testing.assert_allclose(
            _decode_one(wav(1, 1, 8, u8.tobytes()), "wav"),
            (u8.astype(np.float32) - 128.0) / 127.0)
        # stereo PCM16 downmix: L = -R cancels
        inter = np.empty(20, dtype="<i2")
        inter[0::2], inter[1::2] = 1000, -1000
        np.testing.assert_allclose(
            _decode_one(wav(1, 2, 16, inter.tobytes()), "wav"), 0.0, atol=1e-6)
        # µ-law-in-WAV matches the raw expander
        mu = np.arange(0, 250, 13, dtype=np.uint8)
        np.testing.assert_allclose(
            _decode_one(wav(7, 1, 8, mu.tobytes()), "wav"), _mulaw_expand(mu))
        # IEEE float WAV (fmt 3) now decodes — fifth continuation
        f32 = np.array([0.5, -0.25], dtype="<f4")
        np.testing.assert_allclose(
            _decode_one(wav(3, 1, 32, f32.tobytes()), "wav"), f32)
        # unknown format tag marks, never guesses
        with pytest.raises(DecodeUnsupported):
            _decode_one(wav(0x55, 1, 16, b"\x00" * 8), "wav")

    def test_aiff_nonfinite_rate_marks(self):
        # review regression: inf/huge COMM rate exponents must raise
        # DecodeUnsupported, not OverflowError (which would kill the task)
        from spiderray.stages.multimodal import DecodeUnsupported, _decode_one

        import pytest

        base = self._aiff(b"\x00\x00" * 4, 1, 16)
        i = base.index(b"COMM") + 8 + 8
        for se in (b"\x7f\xff", b"\x44\x00"):
            bad = base[:i] + se + base[i + 2 :]
            with pytest.raises(DecodeUnsupported):
                _decode_one(bad, "aiff")
