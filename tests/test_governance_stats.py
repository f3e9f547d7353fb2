"""l-diversity audit, t-closeness, MAD robust outliers, pivot crosstab
(stages/stats)."""

import numpy as np
import pyarrow as pa
import pytest

from spiderray.stages.stats import (l_diversity, mad_outliers, pivot_counts,
                                    t_closeness)


def _ds(rows, parts=3):
    import ray

    return ray.data.from_items(rows).repartition(parts)


class TestLDiversity:
    def test_flags_homogeneous_group(self, ray_session):
        rows = (
            # k-large (6 rows) but every member shares one diagnosis → l-risk
            [{"zip": "94110", "dx": "flu"}] * 6
            # diverse group: 3 distinct sensitive values
            + [{"zip": "10001", "dx": d} for d in ("flu", "cold", "ok", "ok")]
        )
        df = (
            l_diversity(_ds(rows), ["zip"], "dx", l=2)
            .to_pandas().set_index("zip")
        )
        assert df.loc["94110", "group_n"] == 6
        assert df.loc["94110", "distinct_sensitive"] == 1
        assert bool(df.loc["94110", "at_risk"])
        assert df.loc["10001", "group_n"] == 4
        assert df.loc["10001", "distinct_sensitive"] == 3
        assert not bool(df.loc["10001", "at_risk"])

    def test_null_sensitive_is_a_class(self, ray_session):
        import ray

        t = pa.table({
            "g": pa.array(["a", "a", "a"]),
            "s": pa.array(["x", None, None], pa.string()),
        })
        df = l_diversity(ray.data.from_arrow(t).repartition(2),
                         ["g"], "s", l=2).to_pandas()
        assert int(df["distinct_sensitive"].iloc[0]) == 2  # 'x' and __NULL__
        assert not bool(df["at_risk"].iloc[0])

    def test_guards(self, ray_session):
        ds = _ds([{"a": "x", "s": "y"}], 1)
        with pytest.raises(ValueError, match="at least one column"):
            l_diversity(ds, [], "s", 2)
        with pytest.raises(ValueError, match="must not be a quasi"):
            l_diversity(ds, ["s"], "s", 2)
        with pytest.raises(ValueError, match="l must be"):
            l_diversity(ds, ["a"], "s", 0)


class TestTCloseness:
    def test_hand_computed_tvd(self, ray_session):
        # A: 8 en / 2 de; B: 2 en / 8 de → global 10/10 (N=20).
        # TVD(A) = ½(|.8−.5|+|.2−.5|) = 0.3 exactly → 300000 ppm.
        rows = ([{"g": "A", "lang": "en"}] * 8 + [{"g": "A", "lang": "de"}] * 2
                + [{"g": "B", "lang": "en"}] * 2 + [{"g": "B", "lang": "de"}] * 8)
        df = t_closeness(_ds(rows), ["g"], "lang", t_ppm=250_000).set_index("g")
        assert df.loc["A", "group_n"] == 10
        assert df.loc["A", "tvd_ppm"] == 300_000
        assert bool(df.loc["A", "at_risk"])
        assert df.loc["B", "tvd_ppm"] == 300_000

    def test_group_matching_global_is_zero(self, ray_session):
        rows = ([{"g": x, "lang": l} for x in ("A", "B")
                 for l in ("en", "en", "de")])
        df = t_closeness(_ds(rows), ["g"], "lang", t_ppm=100_000)
        assert (df["tvd_ppm"] == 0).all()
        assert not df["at_risk"].any()

    def test_missing_sensitive_value_counts(self, ray_session):
        # C holds only fr → contributes |0·N − N_i·n_g| for en/de
        rows = ([{"g": "A", "lang": "en"}] * 5 + [{"g": "A", "lang": "de"}] * 5
                + [{"g": "C", "lang": "fr"}] * 5)
        df = t_closeness(_ds(rows), ["g"], "lang", t_ppm=500_000).set_index("g")
        # C: p=(0,0,1), q=(1/3,1/3,1/3) → TVD=2/3 → 666667 ppm (half-up)
        assert df.loc["C", "tvd_ppm"] == 666_667
        assert bool(df.loc["C", "at_risk"])

    def test_null_and_partition_invariance(self, ray_session):
        rows = ([{"g": "A", "lang": None}] * 3 + [{"g": "A", "lang": "en"}] * 3
                + [{"g": "B", "lang": "en"}] * 6)
        outs = [t_closeness(_ds(rows, parts=p), ["g"], "lang", t_ppm=100_000)
                for p in (1, 4)]
        assert outs[0].equals(outs[1])
        a = outs[0].set_index("g")
        # A: p=(null .5, en .5) vs q=(null .25, en .75) → TVD .25
        assert a.loc["A", "tvd_ppm"] == 250_000

    def test_guards(self, ray_session):
        ds = _ds([{"a": "x", "s": "y"}], 1)
        with pytest.raises(ValueError, match="at least one column"):
            t_closeness(ds, [], "s", 100)
        with pytest.raises(ValueError, match="must not be a quasi"):
            t_closeness(ds, ["s"], "s", 100)
        with pytest.raises(ValueError, match="t_ppm must be"):
            t_closeness(ds, ["a"], "s", 0)


class TestMadOutliers:
    def test_flags_only_the_spike(self, ray_session):
        # 20 values near 10.0, one spike at 500 → median 10.0, MAD small;
        # classic mean/std masking scenario stays flagged under MAD
        rows = [{"id": i, "g": "a", "v": 10.0 + (i % 5) * 0.001}
                for i in range(20)]
        rows.append({"id": 99, "g": "a", "v": 500.0})
        df = mad_outliers(_ds(rows), "g", "v", ["id"], k=3.5).to_pandas()
        assert list(df["id"]) == [99]
        assert int(df["v_int"].iloc[0]) == 500_000

    def test_zero_mad_group_skipped(self, ray_session):
        # >half the group at one value → MAD 0 → modified z undefined
        rows = [{"id": i, "g": "c", "v": 7.0} for i in range(10)]
        rows.append({"id": 10, "g": "c", "v": 900.0})
        df = mad_outliers(_ds(rows), "g", "v", ["id"]).to_pandas()
        assert len(df) == 0

    def test_matches_serial_formula_and_sign(self, ray_session):
        rng = np.random.RandomState(7)
        vals = np.round(rng.normal(50, 5, 200), 3)
        vals[3], vals[17] = 500.0, -400.0
        rows = [{"id": i, "g": "g%d" % (i % 2), "v": float(v)}
                for i, v in enumerate(vals)]
        df = (mad_outliers(_ds(rows, 5), "g", "v", ["id"], k=3.5)
              .to_pandas().set_index("id"))
        # serial twin: same quantize / discrete-median / fixed-op-order
        for gname in ("g0", "g1"):
            vi = np.array([int(np.floor(v * 1000 + 0.5))
                           for i, v in enumerate(vals) if i % 2 == int(gname[1])])
            ids = np.array([i for i in range(len(vals)) if i % 2 == int(gname[1])])
            sv = np.sort(vi)
            med = int(sv[max(int(np.ceil(0.5 * len(sv))), 1) - 1])
            ad = np.sort(np.abs(vi - med))
            mad = int(ad[max(int(np.ceil(0.5 * len(ad))), 1) - 1])
            z = 0.6745 * (vi - med).astype(np.float64) / float(mad)
            flag = np.abs(z) > 3.5
            exp = {int(i): int(np.floor(zz * 1e6 + 0.5))
                   for i, zz, f in zip(ids, z, flag) if f}
            got = {int(i): int(r["zmad_micro"]) for i, r in df.iterrows()
                   if r["g"] == gname}
            assert got == exp
        assert df.loc[3, "zmad_micro"] > 0 and df.loc[17, "zmad_micro"] < 0


class TestPivotCounts:
    def test_wide_shape_and_zero_fill(self, ray_session):
        rows = (
            [{"r": "a", "c": "x"}] * 3
            + [{"r": "a", "c": "y"}] * 2
            + [{"r": "b", "c": "y"}] * 5
        )
        df = pivot_counts(_ds(rows), "r", "c")
        assert list(df.columns) == ["r", "cnt_x", "cnt_y"]
        assert df.set_index("r").loc["a"].tolist() == [3, 2]
        # missing cell (b, x) fills 0
        assert df.set_index("r").loc["b"].tolist() == [0, 5]
        assert str(df["cnt_x"].dtype) == "int64"

    def test_null_keys_bucketed(self, ray_session):
        import ray

        t = pa.table({"r": pa.array(["a", None]), "c": pa.array([None, "x"])})
        df = pivot_counts(ray.data.from_arrow(t).repartition(2), "r", "c")
        assert set(df["r"]) == {"a", "__NULL__"}
        assert "cnt___NULL__" in df.columns
