"""WebDataset tar-shard sink/source (sources/wds.py)."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest


def _clips_table(n=40):
    return pa.table({
        "clip_id": [f"clip_{i:04d}" for i in range(n)],
        "bytes": [bytes([i % 256]) * (100 + i) for i in range(n)],
        "codec": ["pcm_s16le"] * n,
        "sr_hz": [16000] * n,
    })


class TestWdsRoundtrip:
    def test_write_read_roundtrip(self, ray_session, tmp_path):
        import ray.data as rd

        from spiderray.sources.wds import read_tar_shards, write_tar_shards

        t = _clips_table()
        man = write_tar_shards(
            rd.from_arrow(t).repartition(5), str(tmp_path), "clip_id",
            "bytes", ["codec", "sr_hz"], n_shards=4).to_pandas()
        assert man["n_samples"].sum() == 40
        assert len(man) <= 4
        back = read_tar_shards(str(tmp_path)).to_pandas()
        assert len(back) == 40
        orig = dict(zip(t.column("clip_id").to_pylist(),
                        t.column("bytes").to_pylist()))
        for _, r in back.iterrows():
            assert r["payload"] == orig[r["key"]]
            meta = json.loads(r["meta"])
            assert meta["codec"] == "pcm_s16le" and meta["sr_hz"] == 16000

    def test_shard_bytes_reproducible_across_partitionings(
            self, ray_session, tmp_path):
        import ray.data as rd

        from spiderray.sources.wds import write_tar_shards

        t = _clips_table()
        m1 = write_tar_shards(rd.from_arrow(t).repartition(2),
                              str(tmp_path / "a"), "clip_id", "bytes",
                              ["codec"], n_shards=4).to_pandas()
        m2 = write_tar_shards(rd.from_arrow(t).repartition(7),
                              str(tmp_path / "b"), "clip_id", "bytes",
                              ["codec"], n_shards=4).to_pandas()
        a = m1.sort_values("shard")[["shard", "tar_md5"]].reset_index(drop=True)
        b = m2.sort_values("shard")[["shard", "tar_md5"]].reset_index(drop=True)
        assert a.equals(b)

    def test_resume_skips_done_shards(self, ray_session, tmp_path):
        import ray.data as rd

        from spiderray.sources.wds import write_tar_shards

        t = _clips_table()
        m1 = (write_tar_shards(rd.from_arrow(t), str(tmp_path), "clip_id",
                               "bytes", [], n_shards=4)
              .to_pandas().sort_values("shard").reset_index(drop=True))
        # poison a tar AFTER its .done marker exists: resume must not rewrite
        victim = m1["path"].iloc[0]
        with open(victim, "wb") as f:
            f.write(b"poisoned")
        m2 = (write_tar_shards(rd.from_arrow(t), str(tmp_path), "clip_id",
                               "bytes", [], n_shards=4)
              .to_pandas().sort_values("shard").reset_index(drop=True))
        assert m2[["shard", "n_samples", "tar_md5"]].equals(
            m1[["shard", "n_samples", "tar_md5"]])
        with open(victim, "rb") as f:
            assert f.read() == b"poisoned"  # untouched: skipped, not rewritten

    def test_empty_dir_read_refused(self, ray_session, tmp_path):
        from spiderray.sources.wds import read_tar_shards

        os.makedirs(tmp_path / "empty", exist_ok=True)
        with pytest.raises(FileNotFoundError):
            read_tar_shards(str(tmp_path / "empty"))
