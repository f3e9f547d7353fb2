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
