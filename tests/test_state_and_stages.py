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
