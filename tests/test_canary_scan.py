"""canary_scan (Secret Sharer governance audit) correctness."""

import pandas as pd
import pytest

from spiderray.stages.stats import canary_scan


class TestCanaryScan:
    def _df(self):
        return pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": ["a SECRET-X b SECRET-X", "clean", None, "SECRET-Y"],
        })

    def test_counts_docs_and_occurrences(self, ray_session):
        import ray.data as rd

        out = canary_scan(rd.from_pandas(self._df()),
                          ["SECRET-X", "SECRET-Y", "SECRET-GHOST"])
        got = {r.canary: (r.n_docs, r.n_occurrences)
               for r in out.itertuples()}
        assert got == {"SECRET-X": (1, 2), "SECRET-Y": (1, 1),
                       "SECRET-GHOST": (0, 0)}

    def test_duplicate_canaries_deduped(self, ray_session):
        import ray.data as rd

        out = canary_scan(rd.from_pandas(self._df()),
                          ["SECRET-X", "SECRET-X"])
        assert len(out) == 1

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({
            "doc_id": range(200),
            "text": [f"row {i} " + ("PLANT " * (i % 3)) for i in range(200)],
        })
        a = canary_scan(rd.from_pandas(df), ["PLANT"])
        b = canary_scan(rd.from_pandas(df).repartition(9), ["PLANT"])
        pd.testing.assert_frame_equal(a, b)

    def test_bad_args_raise(self, ray_session):
        import ray.data as rd

        ds = rd.from_pandas(self._df())
        with pytest.raises(ValueError):
            canary_scan(ds, [])
        with pytest.raises(ValueError):
            canary_scan(ds, ["ok", ""])
        with pytest.raises(ValueError):
            canary_scan(ds, ["a", "b", "c"], max_canaries=2)


class TestGroupedRollup:
    def test_levels_and_totals(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import grouped_rollup

        df = pd.DataFrame({"a": ["x", "x", "y"], "b": ["1", "2", "1"],
                           "v": [10, 20, 5]})
        out = grouped_rollup(rd.from_pandas(df), ["a", "b"], "v")
        rows = {(r.a, r.b): (r.n, r.total) for r in out.itertuples()}
        assert rows[("x", "1")] == (1, 10)
        assert rows[("x", "__ALL__")] == (2, 30)
        assert rows[("y", "__ALL__")] == (1, 5)
        assert rows[("__ALL__", "__ALL__")] == (3, 35)
        assert len(rows) == 6

    def test_single_key_and_guards(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import grouped_rollup

        df = pd.DataFrame({"a": ["x", "y", "y"], "v": [1, 2, 3]})
        out = grouped_rollup(rd.from_pandas(df), ["a"], "v")
        rows = {r.a: (r.n, r.total) for r in out.itertuples()}
        assert rows == {"x": (1, 1), "y": (2, 5), "__ALL__": (3, 6)}
        with pytest.raises(ValueError):
            grouped_rollup(rd.from_pandas(df), [], "v")

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import grouped_rollup

        df = pd.DataFrame({"a": [str(i % 5) for i in range(300)],
                           "b": [str(i % 3) for i in range(300)],
                           "v": list(range(300))})
        x = grouped_rollup(rd.from_pandas(df), ["a", "b"], "v")
        y = grouped_rollup(rd.from_pandas(df).repartition(11), ["a", "b"],
                           "v")
        pd.testing.assert_frame_equal(x, y)


class TestRankBlend:
    def test_ranks_and_blend_exact(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import rank_blend

        df = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                           "s1": [10, 20, 20, 40], "s2": [4, 3, 2, 1]})
        out = (rank_blend(rd.from_pandas(df), ["s1", "s2"])
               .to_pandas().set_index("doc_id"))
        # ties share count-below (rank()-1): s1=20 rows both rank 1/3
        assert list(out["rank_s1_ppm"]) == [0, 333333, 333333, 1000000]
        assert list(out["rank_s2_ppm"]) == [1000000, 666666, 333333, 0]
        assert list(out["blend_ppm"]) == [500000, 499999, 333333, 500000]

    def test_weights_and_guards(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import rank_blend

        df = pd.DataFrame({"doc_id": [1, 2], "s1": [1, 2], "s2": [2, 1]})
        out = (rank_blend(rd.from_pandas(df), ["s1", "s2"], weights=[3, 1])
               .to_pandas().set_index("doc_id"))
        # blend = (3*r1 + 1*r2) // 4
        assert list(out["blend_ppm"]) == [250000, 750000]
        ds = rd.from_pandas(df)
        with pytest.raises(ValueError):
            rank_blend(ds, [])
        with pytest.raises(ValueError):
            rank_blend(ds, ["s1"], weights=[0])

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import rank_blend

        df = pd.DataFrame({"doc_id": range(500),
                           "s1": [i % 37 for i in range(500)],
                           "s2": [(i * 7) % 101 for i in range(500)]})
        a = (rank_blend(rd.from_pandas(df), ["s1", "s2"])
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (rank_blend(rd.from_pandas(df).repartition(13), ["s1", "s2"])
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)


class TestPseudonymize:
    def test_deterministic_and_referential(self, ray_session):
        import ray.data as rd

        from spiderray.functions.scrub import pseudonymize

        import pyarrow as pa_mod
        import ray.data as _rd

        a = pa_mod.table({"uid": pa_mod.array([1, 2, 1, None],
                                              pa_mod.int64()),
                          "x": pa_mod.array([9, 8, 7, 6], pa_mod.int64())})
        b = pd.DataFrame({"uid": [2, 1]})
        pa_ = (pseudonymize(rd.from_arrow(a), ["uid"], key="k1")
               .to_pandas())
        pb = (pseudonymize(rd.from_pandas(b), ["uid"], key="k1")
              .to_pandas())
        # same value -> same token within and ACROSS tables
        assert pa_["uid"][0] == pa_["uid"][2]
        assert pa_["uid"][0] == pb["uid"][1]
        assert pa_["uid"][3] is None or pd.isna(pa_["uid"][3])
        # different key -> different tokens
        pc_ = (pseudonymize(rd.from_pandas(b), ["uid"], key="k2")
               .to_pandas())
        assert pc_["uid"][0] != pb["uid"][0]

    def test_guards(self, ray_session):
        import ray.data as rd

        from spiderray.functions.scrub import pseudonymize

        ds = rd.from_pandas(pd.DataFrame({"uid": [1]}))
        with pytest.raises(ValueError):
            pseudonymize(ds, [], key="k")
        with pytest.raises(ValueError):
            pseudonymize(ds, ["uid"], key="")


class TestCountMin:
    def test_one_sided_guarantee_and_merge_equals_serial(self, ray_session):
        import numpy as np
        import ray.data as rd

        from spiderray.functions.sketch import (cms_estimate,
                                                cms_from_values,
                                                count_min_build)

        vals = (["hot"] * 500 + ["warm"] * 50
                + [f"u{i}" for i in range(2000)])
        df = pd.DataFrame({"w": vals})
        cms_d = count_min_build(rd.from_pandas(df).repartition(7), "w")
        cms_s = cms_from_values(vals)
        assert np.array_equal(cms_d, cms_s)   # addition-merge == serial
        est = cms_estimate(cms_d, ["hot", "warm", "u0", "never-seen"])
        assert est[0] >= 500 and est[1] >= 50 and est[2] >= 1
        assert est[3] >= 0
        # width 8192 >> 2552 items: estimates are near-exact here
        assert est[0] <= 510 and est[3] <= 5

    def test_nulls_skipped(self, ray_session):
        import ray.data as rd

        from spiderray.functions.sketch import (cms_estimate,
                                                count_min_build)

        df = pd.DataFrame({"w": ["a", None, "a"]})
        cms = count_min_build(rd.from_pandas(df), "w")
        assert int(cms[0].sum()) == 2
        assert int(cms_estimate(cms, ["a"])[0]) == 2
