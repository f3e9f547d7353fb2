"""Grouped CMVN (stages/audioquality.grouped_cmvn) — integer-exact
per-group feature standardization."""

import math

import numpy as np
import pyarrow as pa


def _z_expected(x_milli: np.ndarray) -> np.ndarray:
    n = len(x_milli)
    s, ss = int(x_milli.sum()), int((x_milli.astype(object) ** 2).sum())
    mean = s // n
    std = max(math.isqrt(max((ss * n - s * s) // (n * n), 0)), 1)
    return ((x_milli - mean) * 1000) // std


class TestGroupedCmvn:
    def test_matches_integer_reference_per_group(self, ray_session):
        import ray.data as rd

        from spiderray.stages.audioquality import grouped_cmvn

        rng = np.random.default_rng(4)
        n = 4000
        groups = np.array([f"g{i % 3}" for i in range(n)])
        f0 = rng.normal(10, 5, n)
        f1 = rng.normal(-2, 0.5, n)
        t = pa.table({"id": np.arange(n), "grp": groups,
                      "f0": f0.astype(np.float32), "f1": f1.astype(np.float32)})
        out = grouped_cmvn(rd.from_arrow(t).repartition(7), "grp",
                           ["f0", "f1"]).to_pandas().sort_values("id")
        for g in ("g0", "g1", "g2"):
            sel = out["grp"] == g
            for c, raw in (("f0", f0), ("f1", f1)):
                xm = np.rint(raw.astype(np.float32).astype(np.float64)[
                    groups == g] * 1000).astype(np.int64)
                assert np.array_equal(out.loc[sel, f"z_{c}"].to_numpy(),
                                      _z_expected(xm)), (g, c)

    def test_z_scores_standardized(self, ray_session):
        import ray.data as rd

        from spiderray.stages.audioquality import grouped_cmvn

        rng = np.random.default_rng(8)
        x = rng.normal(50, 7, 10_000)
        t = pa.table({"grp": ["a"] * len(x), "f": x})
        out = grouped_cmvn(rd.from_arrow(t), "grp", ["f"]).to_pandas()
        z = out["z_f"].to_numpy() / 1000.0  # back to unit scale
        assert abs(z.mean()) < 0.01
        assert abs(z.std() - 1.0) < 0.01

    def test_constant_feature_degenerate_std(self, ray_session):
        import ray.data as rd

        from spiderray.stages.audioquality import grouped_cmvn

        t = pa.table({"grp": ["a"] * 5, "f": [3.0] * 5})
        out = grouped_cmvn(rd.from_arrow(t), "grp", ["f"]).to_pandas()
        assert (out["z_f"] == 0).all()  # std floors at 1, zero spread → 0
