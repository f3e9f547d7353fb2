"""Data-quality expectations (stages/expectations.py)."""

import numpy as np
import pyarrow as pa
import pytest


def _table():
    return pa.table({
        "id": pa.array([1, 2, 2, None], pa.int64()),
        "lang": ["en", "xx", "de", "en"],
        "score": pa.array([5, -1, 50, 200], pa.int64()),
        "name": ["alpha", "Beta!", None, "ok"],
    })


class TestExpectations:
    def test_all_kinds_count_violations(self, ray_session):
        import ray.data as rd

        from spiderray.stages.expectations import validate_expectations

        rules = [
            {"column": "id", "kind": "not_null"},
            {"column": "id", "kind": "unique"},
            {"column": "lang", "kind": "in_set", "values": ["en", "de"]},
            {"column": "score", "kind": "between", "lo": 0, "hi": 100},
            {"column": "name", "kind": "matches", "pattern": "[a-z]+"},
            {"column": "name", "kind": "min_length", "n": 3},
            {"column": "name", "kind": "max_length", "n": 4},
        ]
        out = (validate_expectations(rd.from_arrow(_table()).repartition(2),
                                     rules)
               .to_pandas().set_index("rule_id"))
        assert out.loc[0, "n_violations"] == 1       # one null id
        assert out.loc[1, "n_violations"] == 1       # 4 rows, 3 distinct
        assert out.loc[2, "n_violations"] == 1       # 'xx'
        assert out.loc[3, "n_violations"] == 2       # -1 and 200
        assert out.loc[4, "n_violations"] == 2       # 'Beta!' and None
        assert out.loc[5, "n_violations"] == 2       # 'ok' and None
        assert out.loc[6, "n_violations"] == 3       # 'alpha', 'Beta!', None
        assert not out["passed"].any()
        assert (out["n_rows"] == 4).all()

    def test_clean_table_passes(self, ray_session):
        import ray.data as rd

        from spiderray.stages.expectations import validate_expectations

        t = pa.table({"id": pa.array([1, 2, 3], pa.int64())})
        out = validate_expectations(
            rd.from_arrow(t),
            [{"column": "id", "kind": "not_null"},
             {"column": "id", "kind": "unique"}]).to_pandas()
        assert out["passed"].all()

    def test_unknown_kind_refused(self, ray_session):
        import ray.data as rd

        from spiderray.stages.expectations import validate_expectations

        t = pa.table({"id": pa.array([1], pa.int64())})
        with pytest.raises(Exception):
            validate_expectations(
                rd.from_arrow(t),
                [{"column": "id", "kind": "bogus"}]).to_pandas()


class TestCategoricalDrift:
    def test_planted_shift_detected(self, ray_session):
        import ray.data as rd

        from spiderray.stages.expectations import categorical_drift

        rng = np.random.default_rng(2)
        a = pa.table({"g": np.array(["x", "y", "z"])[
            rng.integers(0, 3, 9000)]})
        # b: z thinned by 80% → strong PSI on z
        gb = np.array(["x", "y", "z"])[rng.integers(0, 3, 9000)]
        keep = (gb != "z") | (np.arange(9000) % 5 == 0)
        b = pa.table({"g": gb[keep]})
        out = categorical_drift(rd.from_arrow(a), rd.from_arrow(b), "g")
        total = out["psi_micro"].sum() / 1e6
        assert total > 0.2  # the standard 'significant shift' bar
        assert out.set_index("category").loc["z", "psi_micro"] == \
            out["psi_micro"].max()

    def test_identical_snapshots_zero(self, ray_session):
        import ray.data as rd

        from spiderray.stages.expectations import categorical_drift

        t = pa.table({"g": ["a"] * 50 + ["b"] * 50})
        out = categorical_drift(rd.from_arrow(t), rd.from_arrow(t), "g")
        assert (out["psi_micro"] == 0).all()

    def test_category_absent_from_one_side(self, ray_session):
        import ray.data as rd

        from spiderray.stages.expectations import categorical_drift

        a = pa.table({"g": ["a"] * 10})
        b = pa.table({"g": ["a"] * 5 + ["new"] * 5})
        out = categorical_drift(rd.from_arrow(a), rd.from_arrow(b), "g")
        assert set(out["category"]) == {"a", "new"}
        assert out.set_index("category").loc["new", "n_a"] == 0
        assert out.set_index("category").loc["new", "psi_micro"] > 0


class TestWindowedDrift:
    def test_skewed_window_flagged(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from spiderray.stages.expectations import windowed_drift

        rng = np.random.default_rng(3)
        n = 6000
        ts = pd.to_datetime("2026-01-01") + pd.to_timedelta(
            rng.integers(0, 3 * 3600, n), unit="s")
        types = np.array(["a", "b"])[rng.integers(0, 2, n)]
        # hour 2 becomes all-'a' (planted skew)
        hour2 = np.asarray(ts.hour == 2)
        types[hour2] = "a"
        t = pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                      "event_type": types})
        out = windowed_drift(rd.from_arrow(t), "ts", "event_type",
                             width_minutes=60)
        assert len(out) == 3
        psi = out.set_index("window_start")["psi_micro"]
        skewed = psi.iloc[2]
        assert skewed > 5 * max(psi.iloc[0], psi.iloc[1], 1)

    def test_uniform_windows_near_zero(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from spiderray.stages.expectations import windowed_drift

        ts = pd.to_datetime("2026-01-01") + pd.to_timedelta(
            np.arange(4000) % 7200, unit="s")
        types = np.array(["a", "b"])[np.arange(4000) % 2]
        t = pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                      "event_type": types})
        out = windowed_drift(rd.from_arrow(t), "ts", "event_type",
                             width_minutes=60)
        assert (out["psi_micro"].abs() < 1000).all()  # PSI < 0.001
