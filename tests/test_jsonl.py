"""JSONL shard sink/source: determinism, resume markers, binary transport."""

import json
import os

import pyarrow as pa
import pytest

from spiderray.sources.jsonl import read_jsonl_shards, write_jsonl_shards


def _docs_ds(n=40):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array([f"text {i} é{i % 3}" for i in range(n)], pa.string()),
    }))


class TestJsonlShards:
    def test_roundtrip_and_deterministic_md5(self, ray_session, tmp_path):
        d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
        m1 = write_jsonl_shards(_docs_ds(), d1, "doc_id", n_shards=4,
                                resume=False).to_pandas()
        m2 = write_jsonl_shards(_docs_ds(), d2, "doc_id", n_shards=4,
                                resume=False).to_pandas()
        assert sorted(m1.jsonl_md5) == sorted(m2.jsonl_md5)  # byte-stable
        back = read_jsonl_shards(d1).to_pandas().sort_values("doc_id")
        orig = _docs_ds().to_pandas().sort_values("doc_id")
        assert back.reset_index(drop=True).equals(orig.reset_index(drop=True))

    def test_resume_skips_done_shards(self, ray_session, tmp_path):
        d = str(tmp_path / "r")
        write_jsonl_shards(_docs_ds(), d, "doc_id", n_shards=2).materialize()
        # poison one shard file; the .done marker must shield it on resume
        victim = os.path.join(d, "shard-00000.jsonl")
        before = open(victim).read()
        with open(victim, "w") as f:
            f.write("poisoned\n")
        man = write_jsonl_shards(_docs_ds(), d, "doc_id", n_shards=2,
                                 resume=True).to_pandas()
        assert open(victim).read() == "poisoned\n"  # not rewritten
        # manifest row came from the marker, reflecting the original write
        with open(victim + ".done") as f:
            done = json.loads(f.read())
        row = man.set_index("shard").loc[0]
        assert row.jsonl_md5 == done["jsonl_md5"]
        assert before != "poisoned\n"

    def test_b64_binary_roundtrip(self, ray_session, tmp_path):
        import ray.data as rd

        d = str(tmp_path / "bin")
        payload = [b"\x00\xffraw" + bytes([i]) for i in range(6)]
        ds = rd.from_arrow(pa.table({
            "clip_id": pa.array([f"c{i}" for i in range(6)], pa.string()),
            "bytes": pa.array(payload, pa.binary()),
        }))
        write_jsonl_shards(ds, d, "clip_id", b64_cols=("bytes",),
                           n_shards=2, resume=False).materialize()
        back = read_jsonl_shards(d, b64_cols=("bytes",)).to_pandas()
        got = dict(zip(back.clip_id, back.bytes))
        assert got == {f"c{i}": payload[i] for i in range(6)}

    def test_missing_dir_raises(self, ray_session, tmp_path):
        empty = str(tmp_path / "nothing")
        os.makedirs(empty)
        with pytest.raises(FileNotFoundError):
            read_jsonl_shards(empty)

    def test_column_projection(self, ray_session, tmp_path):
        d = str(tmp_path / "proj")
        write_jsonl_shards(_docs_ds(), d, "doc_id", columns=["doc_id"],
                           n_shards=2, resume=False).materialize()
        back = read_jsonl_shards(d).to_pandas()
        assert list(back.columns) == ["doc_id"]


class TestReviewFixes:
    def test_fresh_write_cleans_stale_shards(self, ray_session, tmp_path):
        d = str(tmp_path / "stale")
        write_jsonl_shards(_docs_ds(40), d, "doc_id", n_shards=16,
                           resume=False).materialize()
        n_before = len([f for f in os.listdir(d) if f.endswith(".jsonl")])
        # rewrite with fewer shards: old shard files must not survive
        write_jsonl_shards(_docs_ds(10), d, "doc_id", n_shards=2,
                           resume=False).materialize()
        back = read_jsonl_shards(d).to_pandas()
        assert len(back) == 10 and n_before > 2

    def test_null_binary_stays_null(self, ray_session, tmp_path):
        import ray.data as rd

        d = str(tmp_path / "nullbin")
        ds = rd.from_arrow(pa.table({
            "clip_id": pa.array(["a", "b"], pa.string()),
            "bytes": pa.array([b"x", None], pa.binary()),
        }))
        write_jsonl_shards(ds, d, "clip_id", b64_cols=("bytes",),
                           n_shards=1, resume=False).materialize()
        back = read_jsonl_shards(d, b64_cols=("bytes",)).to_pandas()
        got = dict(zip(back.clip_id, back.bytes))
        assert got["a"] == b"x" and got["b"] is None

    def test_binary_without_b64_raises(self, ray_session, tmp_path):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({
            "clip_id": pa.array(["a"], pa.string()),
            "bytes": pa.array([b"x"], pa.binary()),
        }))
        man = write_jsonl_shards(ds, str(tmp_path / "no64"), "clip_id",
                                 n_shards=1, resume=False)
        with pytest.raises(Exception, match="b64_cols"):
            man.materialize()

    def test_duplicate_keys_byte_stable(self, ray_session, tmp_path):
        import ray.data as rd

        def mk():
            return rd.from_arrow(pa.table({
                "k": pa.array(["dup"] * 20, pa.string()),
                "v": pa.array(list(range(20)), pa.int64()),
            })).random_shuffle(seed=None)

        m1 = write_jsonl_shards(mk(), str(tmp_path / "d1"), "k", n_shards=1,
                                resume=False).to_pandas()
        m2 = write_jsonl_shards(mk(), str(tmp_path / "d2"), "k", n_shards=1,
                                resume=False).to_pandas()
        assert m1.jsonl_md5.tolist() == m2.jsonl_md5.tolist()
