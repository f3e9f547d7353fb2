"""Classifier calibration sweep: distributed confusion counts per threshold."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from spiderray.stages.stats import threshold_sweep


def _ds(scores, labels):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "score": pa.array(np.asarray(scores, dtype=np.float64), pa.float64()),
        "label": pa.array(list(labels), pa.bool_()),
    }))


class TestThresholdSweep:
    def test_matches_naive(self, ray_session):
        rng = np.random.default_rng(3)
        scores = rng.uniform(size=500)
        labels = rng.uniform(size=500) < scores  # correlated labels
        thr = [0.25, 0.5, 0.75]
        out = threshold_sweep(_ds(scores, labels), "score", "label", thr)
        for _, row in out.iterrows():
            pred = scores >= row.thr
            assert row.tp == int((pred & labels).sum())
            assert row.fp == int((pred & ~labels).sum())
            assert row.fn == int((~pred & labels).sum())
            assert row.tn == int((~pred & ~labels).sum())
            p = row.tp / (row.tp + row.fp) if row.tp + row.fp else 0.0
            r = row.tp / (row.tp + row.fn) if row.tp + row.fn else 0.0
            assert row.precision == p and row.recall == r

    def test_tie_scores_count_as_positive(self, ray_session):
        out = threshold_sweep(_ds([0.5, 0.5, 0.4], [True, False, True]),
                              "score", "label", [0.5])
        row = out.iloc[0]
        assert (row.tp, row.fp, row.fn, row.tn) == (1, 1, 1, 0)

    def test_empty_denominators_zero(self, ray_session):
        # no positives at all → recall/precision/f1 defined as 0.0
        out = threshold_sweep(_ds([0.1, 0.2], [False, False]),
                              "score", "label", [0.9])
        row = out.iloc[0]
        assert row.tp == 0 and row.precision == 0.0
        assert row.recall == 0.0 and row.f1 == 0.0

    def test_unsorted_grid_sorted_output(self, ray_session):
        out = threshold_sweep(_ds([0.3], [True]), "score", "label",
                              [0.9, 0.1, 0.5])
        assert out.thr.tolist() == [0.1, 0.5, 0.9]

    def test_empty_grid_raises(self, ray_session):
        with pytest.raises(ValueError):
            threshold_sweep(_ds([0.3], [True]), "score", "label", [])


class TestUniMax:
    def test_waterfall_allocates_budget(self):
        from spiderray.stages.stats import _unimax_waterfall

        counts = {"en": 1000, "zh": 300, "yo": 10}
        q = _unimax_waterfall(counts, budget_rows=600, max_epochs=2.0)
        # the tiny language takes its full epoch cap
        assert q["yo"] == 20.0
        # every quota respects the epoch cap and the budget is exhausted
        for k, n in counts.items():
            assert q[k] <= n * 2.0 + 1e-9
        assert abs(sum(q.values()) - 600) < 1e-6

    def test_waterfall_all_capped_leaves_budget(self):
        from spiderray.stages.stats import _unimax_waterfall

        q = _unimax_waterfall({"a": 5, "b": 5}, budget_rows=1000,
                              max_epochs=1.0)
        assert q == {"a": 5.0, "b": 5.0}  # budget > corpus: keep everything

    def test_plan_table(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import unimax_plan

        rows = ([{"doc_id": i, "lang": "en"} for i in range(900)]
                + [{"doc_id": 1000 + i, "lang": "yo"} for i in range(100)])
        plan = unimax_plan(rd.from_items(rows), "lang", budget_rows=500,
                           max_epochs=2.0).set_index("lang")
        assert plan.loc["yo", "quota"] == 200.0       # epoch cap 100*2
        assert plan.loc["en", "quota"] == 300.0       # rest of the budget
        assert plan.loc["en", "keep_rate"] == 300.0 / 900.0
        assert plan.loc["yo", "epochs"] == 2.0

    def test_resample_deterministic_and_proportional(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import unimax_resample

        rows = ([{"doc_id": i, "lang": "en"} for i in range(2000)]
                + [{"doc_id": 10_000 + i, "lang": "yo"} for i in range(50)])
        a = unimax_resample(rd.from_items(rows), "lang", "doc_id",
                            budget_rows=800, max_epochs=1.0).to_pandas()
        b = unimax_resample(rd.from_items(rows), "lang", "doc_id",
                            budget_rows=800, max_epochs=1.0).to_pandas()
        assert sorted(a.doc_id) == sorted(b.doc_id)  # md5 membership: stable
        got = a.groupby("lang").size()
        assert got["yo"] == 50                       # under cap: all kept
        assert abs(got["en"] - 750) < 80             # ~quota of the big one
