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
