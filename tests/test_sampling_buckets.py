"""bottomk_sample + grouped_quantile_buckets (stages/stats.py)."""

import hashlib

import numpy as np
import pyarrow as pa


class TestBottomkSample:
    def test_exact_k_and_uniformity_determinism(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import bottomk_sample

        ids = np.arange(5000)
        t = pa.table({"doc_id": ids, "v": ids * 2})
        out1 = bottomk_sample(rd.from_arrow(t).repartition(7), 50,
                              id_col="doc_id").to_pandas()
        out2 = bottomk_sample(rd.from_arrow(t).repartition(3), 50,
                              id_col="doc_id").to_pandas()
        assert len(out1) == 50
        assert sorted(out1["doc_id"]) == sorted(out2["doc_id"])
        # matches the definition: 50 smallest md5(str(id))
        expect = sorted(ids, key=lambda i: hashlib.md5(
            str(i).encode()).hexdigest())[:50]
        assert sorted(out1["doc_id"]) == sorted(expect)

    def test_salted_rank_is_delimited(self, ray_session):
        """Round-3 ADVICE: the salted key is '<salt>:<id>' (matching
        epoch_order), unambiguous across (salt, id) splits and restatable
        as SQL md5(CONCAT(salt, ':', CAST(id AS VARCHAR)))."""
        import ray.data as rd

        from spiderray.stages.stats import bottomk_sample

        ids = np.arange(500)
        t = pa.table({"doc_id": ids})
        out = bottomk_sample(rd.from_arrow(t), 20, id_col="doc_id",
                             salt="s1").to_pandas()
        expect = sorted(ids, key=lambda i: hashlib.md5(
            f"s1:{i}".encode()).hexdigest())[:20]
        assert sorted(out["doc_id"]) == sorted(expect)

    def test_n_smaller_than_k(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import bottomk_sample

        t = pa.table({"doc_id": [1, 2, 3]})
        out = bottomk_sample(rd.from_arrow(t), 10).to_pandas()
        assert len(out) == 3


class TestGroupedQuantileBuckets:
    def test_terciles_per_group(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import grouped_quantile_buckets

        # group a: 1..90 → head ≤30, middle ≤60, tail >60
        # group b: 1000..1090 — its own scale
        va = np.arange(1, 91)
        vb = np.arange(1001, 1091)
        t = pa.table({"g": ["a"] * 90 + ["b"] * 90,
                      "x": np.concatenate([va, vb]).astype(np.int64)})
        out = grouped_quantile_buckets(rd.from_arrow(t).repartition(5),
                                       "g", "x").to_pandas()
        a = out[out.g == "a"].set_index("x")["bucket"]
        assert a[30] == "head" and a[31] == "middle"
        assert a[60] == "middle" and a[61] == "tail"
        b = out[out.g == "b"].set_index("x")["bucket"]
        assert b[1030] == "head" and b[1090] == "tail"

    def test_sentinel_labeled_na_and_excluded_from_cuts(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import grouped_quantile_buckets

        x = np.array([-1] * 50 + list(range(1, 10)), dtype=np.int64)
        t = pa.table({"g": ["a"] * len(x), "x": x})
        out = grouped_quantile_buckets(rd.from_arrow(t), "g", "x",
                                       sentinel=-1).to_pandas()
        assert (out[out.x == -1]["bucket"] == "na").all()
        # cuts from 1..9 only: 3 → head, 6 → middle, 9 → tail
        got = out[out.x > 0].set_index("x")["bucket"]
        assert got[3] == "head" and got[6] == "middle" and got[9] == "tail"


class TestWeightedSample:
    def test_exact_k_deterministic_and_weight_biased(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.stats import weighted_sample

        n = 2000
        # two strata: heavy rows (w=50) vs light rows (w=1)
        w = np.where(np.arange(n) % 2 == 0, 50, 1)
        t = pa.table({"doc_id": np.arange(n), "w": w})
        a = weighted_sample(rd.from_arrow(t).repartition(7), 100, "w").to_pandas()
        b = weighted_sample(rd.from_arrow(t).repartition(3), 100, "w").to_pandas()
        assert len(a) == 100
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # partition-invariant
        heavy = (a["doc_id"] % 2 == 0).sum()
        assert heavy > 80  # 50x weight dominates the sample

    def test_nonpositive_weights_excluded(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.stats import weighted_sample

        t = pa.table({"doc_id": [1, 2, 3, 4], "w": [0, -1, 5, 2]})
        out = weighted_sample(rd.from_arrow(t), 10, "w").to_pandas()
        assert sorted(out["doc_id"]) == [3, 4]


class TestGroupedBottomk:
    def test_exact_k_per_group_and_determinism(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.stats import grouped_bottomk_sample

        t = pa.table({
            "doc_id": pa.array(range(100), pa.int64()),
            "source": pa.array([f"s{i % 4}" for i in range(100)],
                               pa.string()),
        })
        outs = []
        for blocks in (1, 7):
            ds = rd.from_arrow(t).repartition(blocks)
            df = (grouped_bottomk_sample(ds, "source", k=5).to_pandas()
                  .sort_values(["source", "rank_hex"])
                  .reset_index(drop=True))
            outs.append(df)
        assert outs[0].equals(outs[1])
        assert (outs[0].groupby("source").size() == 5).all()
        # matches the serial md5 ranking exactly
        import hashlib
        for src in ("s0", "s1"):
            ids = [i for i in range(100) if f"s{i % 4}" == src]
            exp = sorted(ids, key=lambda i: hashlib.md5(
                str(i).encode()).hexdigest())[:5]
            got = outs[0][outs[0].source == src].doc_id.tolist()
            assert sorted(got) == sorted(exp)

    def test_small_group_keeps_all(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.stats import grouped_bottomk_sample

        t = pa.table({
            "doc_id": pa.array([1, 2, 50], pa.int64()),
            "source": pa.array(["a", "a", "b"], pa.string()),
        })
        out = grouped_bottomk_sample(rd.from_arrow(t), "source",
                                     k=5).to_pandas()
        assert len(out) == 3
