"""Poison-row quarantine (stages/quarantine.py)."""

import numpy as np
import pyarrow as pa
import pytest


def _fn_crash_on(bad_ids):
    bad = set(bad_ids)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        if any(i in bad for i in ids):
            raise RuntimeError(f"poison in {sorted(set(ids) & bad)}")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "double": pa.array([i * 2 for i in ids], pa.int64())})
    return fn


class TestQuarantine:
    def test_isolates_exact_poison_rows(self, ray_session, tmp_path):
        import ray.data as rd

        from spiderray.stages.quarantine import (quarantine_map_batches,
                                                 read_quarantine)

        t = pa.table({"doc_id": np.arange(100, dtype=np.int64)})
        out = quarantine_map_batches(
            rd.from_arrow(t).repartition(4), _fn_crash_on({7, 42, 43, 99}),
            str(tmp_path / "q"), batch_size=16).to_pandas()
        assert sorted(out["doc_id"]) == sorted(set(range(100)) - {7, 42, 43, 99})
        assert (out["double"] == out["doc_id"] * 2).all()
        bad = read_quarantine(str(tmp_path / "q")).to_pandas()
        assert sorted(bad["doc_id"]) == [7, 42, 43, 99]
        assert bad["error"].str.contains("poison").all()

    def test_no_poison_no_quarantine_dir(self, ray_session, tmp_path):
        import ray.data as rd

        from spiderray.stages.quarantine import (quarantine_map_batches,
                                                 read_quarantine)

        t = pa.table({"doc_id": np.arange(20, dtype=np.int64)})
        out = quarantine_map_batches(
            rd.from_arrow(t), _fn_crash_on(set()),
            str(tmp_path / "q2")).to_pandas()
        assert len(out) == 20
        assert len(read_quarantine(str(tmp_path / "q2"))) == 0

    def test_entire_batch_poison_yields_empty_typed_block(
            self, ray_session, tmp_path):
        import ray.data as rd

        from spiderray.stages.quarantine import (quarantine_map_batches,
                                                 read_quarantine)

        t = pa.table({"doc_id": np.arange(8, dtype=np.int64)})
        out = quarantine_map_batches(
            rd.from_arrow(t), _fn_crash_on(set(range(8))),
            str(tmp_path / "q3")).to_pandas()
        assert len(out) == 0
        assert sorted(read_quarantine(
            str(tmp_path / "q3")).to_pandas()["doc_id"]) == list(range(8))


class TestCompaction:
    def test_compacts_and_promotes(self, ray_session, tmp_path):
        import os

        import pyarrow as pa
        import ray.data as rd

        from spiderray.sources.compact import compact_parquet

        src = tmp_path / "small"
        os.makedirs(src)
        rd.from_arrow(pa.table({"x": np.arange(1000, dtype=np.int64)})) \
            .repartition(25).write_parquet(str(src))
        assert len(list(src.glob("*.parquet"))) >= 20
        out = tmp_path / "out"
        stats = compact_parquet(str(src), str(out), rows_per_file=600)
        assert stats == {"n_rows": 1000, "n_files": 2, "skipped": False}
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        assert len(files) == 2
        back = rd.read_parquet(str(out)).to_pandas()
        assert sorted(back["x"]) == list(range(1000))
        # second run promotes from the marker without rewriting
        mtimes = {f: os.path.getmtime(out / f) for f in files}
        stats2 = compact_parquet(str(src), str(out), rows_per_file=600)
        assert stats2["skipped"]
        assert {f: os.path.getmtime(out / f) for f in files} == mtimes


class TestQuarantineEdgeCases:
    def test_all_poison_with_zero_row_raising_udf(self, ray_session, tmp_path):
        """A UDF that ALSO raises on 0-row input: after one success on the
        worker the cached schema covers the all-poison batch."""
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.quarantine import (quarantine_map_batches,
                                                 read_quarantine)

        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            if not ids:
                raise RuntimeError("cannot handle empty")
            if any(i >= 100 for i in ids):
                raise RuntimeError("poison")
            return pa.table({"doc_id": batch.column("doc_id")})

        # single block: good rows first, poison rows after → the same
        # worker sees a success before the all-poison bisection leaves
        t = pa.table({"doc_id": np.concatenate([
            np.arange(50, dtype=np.int64),
            np.arange(100, 150, dtype=np.int64)])})
        out = quarantine_map_batches(rd.from_arrow(t), fn,
                                     str(tmp_path / "q")).to_pandas()
        assert sorted(out["doc_id"]) == list(range(50))
        assert len(read_quarantine(str(tmp_path / "q"))) == 50

    def test_read_quarantine_empty_schema_has_id_col(self, tmp_path):
        from spiderray.stages.quarantine import read_quarantine

        t = read_quarantine(str(tmp_path / "nonexistent"))
        assert t.column_names == ["doc_id", "error"]


class TestEvolvedRead:
    def test_mixed_schemas_unify_with_nulls(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import numpy as np

        from spiderray.sources.compact import read_parquet_evolved

        pq.write_table(pa.table({"id": pa.array([1, 2], pa.int64())}),
                       str(tmp_path / "old.parquet"))
        pq.write_table(pa.table({"id": pa.array([3], pa.int64()),
                                 "extra": ["x"]}),
                       str(tmp_path / "new.parquet"))
        out = (read_parquet_evolved(str(tmp_path)).to_pandas()
               .sort_values("id").reset_index(drop=True))
        assert list(out.columns) == ["id", "extra"]
        assert out["extra"].tolist()[:2] == [None, None]
        assert out["extra"].tolist()[2] == "x"

    def test_column_projection(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from spiderray.sources.compact import read_parquet_evolved

        pq.write_table(pa.table({"a": [1], "b": [2]}),
                       str(tmp_path / "f.parquet"))
        out = read_parquet_evolved(str(tmp_path), columns=["b"]).to_pandas()
        assert list(out.columns) == ["b"]
