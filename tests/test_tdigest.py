"""t-digest mergeable quantile sketch (functions/tdigest.py +
stages/stats.tdigest_quantiles[_keyed])."""

import numpy as np
import pytest

from spiderray.functions.tdigest import td_build, td_merge, td_quantile


def _rank_err(x: np.ndarray, est: float, q: float) -> float:
    return abs(float((x <= est).mean()) - q)


class TestTdigestFunctions:
    def test_build_accuracy_heavy_tail(self):
        rng = np.random.default_rng(7)
        x = rng.lognormal(3, 1.5, 200_000)
        m, w = td_build(x)
        assert int(w.sum()) == len(x)
        assert len(m) <= 200  # ≤ ~delta centroids
        for q in (0.01, 0.25, 0.5, 0.9, 0.99, 0.999):
            est = td_quantile(m, w, q, x.min(), x.max())
            assert _rank_err(x, est, q) < 0.005, q

    def test_merge_matches_single_build_error(self):
        rng = np.random.default_rng(11)
        x = rng.normal(0, 1, 100_000)
        soup_m, soup_w = [], []
        for c in np.array_split(x, 53):
            a, b = td_build(c)
            soup_m.append(a)
            soup_w.append(b)
        m, w = td_merge(np.concatenate(soup_m), np.concatenate(soup_w))
        assert int(w.sum()) == len(x)
        for q in (0.05, 0.5, 0.95):
            est = td_quantile(m, w, q, x.min(), x.max())
            assert _rank_err(x, est, q) < 0.005, q

    def test_merge_is_deterministic_under_soup_permutation(self):
        rng = np.random.default_rng(3)
        x = rng.uniform(0, 1, 50_000)
        soup_m, soup_w = [], []
        for c in np.array_split(x, 17):
            a, b = td_build(c)
            soup_m.append(a)
            soup_w.append(b)
        m = np.concatenate(soup_m)
        w = np.concatenate(soup_w)
        m1, w1 = td_merge(m, w)
        perm = rng.permutation(len(m))
        m2, w2 = td_merge(m[perm], w[perm])
        assert np.array_equal(m1, m2) and np.array_equal(w1, w2)

    def test_nonfinite_ignored_and_edges(self):
        x = np.array([1.0, np.nan, np.inf, -np.inf, 2.0, 3.0])
        m, w = td_build(x)
        assert int(w.sum()) == 3
        m0, w0 = td_build(np.array([], dtype=np.float64))
        assert len(m0) == 0 and len(w0) == 0
        m1, w1 = td_build(np.array([5.0]))
        assert td_quantile(m1, w1, 0.5, 5.0, 5.0) == 5.0

    def test_exact_on_tiny_inputs(self):
        # fewer values than centroid slots: every value is its own centroid
        x = np.array([3.0, 1.0, 2.0])
        m, w = td_build(x)
        assert list(m) == [1.0, 2.0, 3.0]
        assert list(w) == [1, 1, 1]


class TestTdigestStages:
    def test_scale_path_bounded_error_on_floats(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import tdigest_quantiles

        rng = np.random.default_rng(5)
        x = rng.lognormal(0, 2, 40_000)
        ds = rd.from_arrow(
            __import__("pyarrow").table({"v": x})).repartition(8)
        res = tdigest_quantiles(ds, "v", [0.1, 0.5, 0.9])
        for q, est in res:
            assert _rank_err(x, est, q) < 0.01, (q, est)

    def test_keyed_path_deterministic_across_partitionings(self, ray_session):
        import pyarrow as pa_
        import ray.data as rd

        from spiderray.stages.stats import tdigest_quantiles_keyed

        rng = np.random.default_rng(9)
        x = rng.normal(100, 15, 20_000)
        ids = np.arange(len(x))
        t = pa_.table({"id": ids, "v": x})
        r1 = tdigest_quantiles_keyed(rd.from_arrow(t).repartition(3),
                                     "id", "v", [0.25, 0.5, 0.75])
        r2 = tdigest_quantiles_keyed(rd.from_arrow(t).repartition(11),
                                     "id", "v", [0.25, 0.5, 0.75])
        assert r1 == r2  # bit-identical, not just close
        for q, est in r1:
            assert _rank_err(x, est, q) < 0.01

    def test_float_column_ok_where_exact_refuses(self, ray_session):
        import pyarrow as pa_
        import ray.data as rd

        from spiderray.stages.stats import quantiles_exact, tdigest_quantiles

        x = np.linspace(0.0, 1.0, 5_000)
        ds = rd.from_arrow(pa_.table({"v": x}))
        with pytest.raises(TypeError):
            quantiles_exact(ds, "v", [0.5])
        (q, est), = tdigest_quantiles(ds, "v", [0.5])
        assert abs(est - 0.5) < 0.01
