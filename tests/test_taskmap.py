"""stages/taskmap.py — process-cached task maps for stateless stages."""

import numpy as np
import pyarrow as pa
import pytest

from spiderray.config import PipelineConfig
from spiderray.stages import taskmap


class CountingActor:
    """Counts constructions per process via a class attribute."""

    constructions = 0

    def __init__(self, cfg, tag="x"):
        type(self).constructions += 1
        self.tag = tag

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "tag", pa.array([self.tag] * batch.num_rows, pa.string()))


class TestProcessCached:
    def test_constructs_once_per_key(self):
        CountingActor.constructions = 0
        fn = taskmap.process_cached(CountingActor, (PipelineConfig(),),
                                    {"tag": "a"})
        t = pa.table({"x": pa.array([1, 2], pa.int64())})
        out1 = fn(t)
        out2 = fn(t)
        assert CountingActor.constructions == 1
        assert out1.column("tag").to_pylist() == ["a", "a"]
        assert out2.column("tag").to_pylist() == ["a", "a"]

    def test_distinct_args_distinct_instances(self):
        taskmap._CACHE.clear()  # the cache is process-wide by design
        CountingActor.constructions = 0
        fa = taskmap.process_cached(CountingActor, (PipelineConfig(),),
                                    {"tag": "a"})
        fb = taskmap.process_cached(CountingActor, (PipelineConfig(),),
                                    {"tag": "b"})
        t = pa.table({"x": pa.array([1], pa.int64())})
        assert fa(t).column("tag").to_pylist() == ["a"]
        assert fb(t).column("tag").to_pylist() == ["b"]
        assert CountingActor.constructions == 2

    def test_picklable(self):
        from ray import cloudpickle

        fn = taskmap.process_cached(CountingActor, (PipelineConfig(),),
                                    {"tag": "p"})
        fn2 = cloudpickle.loads(cloudpickle.dumps(fn))
        t = pa.table({"x": pa.array([7], pa.int64())})
        assert fn2(t).column("tag").to_pylist() == ["p"]


class TestStatelessMap:
    def _ds(self, n=64):
        import ray.data as rd

        return rd.from_arrow(pa.table({"x": pa.array(range(n), pa.int64())}))

    @staticmethod
    def _local_actor():
        # defined inside the test so cloudpickle ships it BY VALUE — a
        # test-module class can't be imported inside Ray workers
        class TagActor:
            def __init__(self, cfg, tag="x"):
                self.tag = tag

            def __call__(self, batch: pa.Table) -> pa.Table:
                return batch.append_column(
                    "tag", pa.array([self.tag] * batch.num_rows,
                                    pa.string()))

        return TagActor

    def test_task_path_default(self, ray_session):
        out = taskmap.stateless_map(
            self._ds(), self._local_actor(), (PipelineConfig(),),
            ctor_kwargs={"tag": "t"}, batch_size=16, concurrency=4)
        df = out.to_pandas()
        assert len(df) == 64 and set(df["tag"]) == {"t"}

    def test_tuple_forces_actor_pool(self, ray_session):
        out = taskmap.stateless_map(
            self._ds(), self._local_actor(), (PipelineConfig(),),
            ctor_kwargs={"tag": "p"}, batch_size=16, concurrency=(1, 2))
        df = out.to_pandas()
        assert len(df) == 64 and set(df["tag"]) == {"p"}

    def test_outputs_identical_between_paths(self, ray_session):
        """The execution strategy must never leak into results."""
        from spiderray.stages.audioquality import declip_stage
        from spiderray.pipelines.queries import _clipmix_clips_batch
        import pyarrow.parquet as pq

        docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                             columns=["doc_id"]).slice(0, 40)
        clips = _clipmix_clips_batch(docs)
        import ray.data as rd

        a = declip_stage(rd.from_arrow(clips), PipelineConfig(),
                         concurrency=4).to_pandas()
        b = declip_stage(rd.from_arrow(clips), PipelineConfig(),
                         concurrency=(1, 2)).to_pandas()
        a = a.sort_values("clip_id").reset_index(drop=True)
        b = b.sort_values("clip_id").reset_index(drop=True)
        import pandas as pd

        pd.testing.assert_frame_equal(a, b)
