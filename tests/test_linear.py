"""Distributed logistic-regression distiller (stages/linear)."""

import numpy as np
import pyarrow as pa
import pytest

from spiderray.stages.dsir import _HashCache
from spiderray.stages.linear import (
    _QUANT,
    LinearModel,
    _grad_partial,
    _residual_nano,
    _unique_ids,
    linear_predict_stage,
    train_logistic,
)


def _rows(n=200):
    rows = []
    for i in range(n):
        good = i % 2 == 0
        base = ("excellent prose quality insight detailed narrative" if good
                else "spam click buy now cheap offer winner prize")
        rows.append({"doc_id": i, "text": f"{base} filler{i % 7} token{i % 11}",
                     "label": int(good)})
    return rows


def test_model_margin_and_prob():
    w = np.zeros(100)
    w[3], w[7] = 2.0, -1.0
    m = LinearModel(w, 0.5)
    ids = np.array([3, 7], dtype=np.int64)
    assert m.margin_ids(ids) == pytest.approx(1.5)
    assert m.prob_ids(ids) == pytest.approx(1 / (1 + np.exp(-1.5)))
    # empty doc scores the bias alone; extreme margins stay finite
    assert m.margin_ids(np.zeros(0, dtype=np.int64)) == 0.5
    assert LinearModel(w, -800).prob_ids(ids) == 0.0
    assert 0.0 < LinearModel(w, 800).prob_ids(ids) <= 1.0


def test_residual_quantization_bounds():
    m = LinearModel(np.zeros(10), 0.0)
    ids = np.zeros(0, dtype=np.int64)
    # sigma(0)=0.5 → residual vs y=1 is -0.5 exactly
    assert _residual_nano(m, ids, 1) == -_QUANT // 2
    assert _residual_nano(m, ids, 0) == _QUANT // 2


def test_grad_partial_rows():
    m = LinearModel(np.zeros(50), 0.0)
    batch = pa.table(
        {"text": pa.array(["a b", "a", None, "c"], pa.string()),
         "label": pa.array([1, 0, 1, None], pa.int64())}
    )
    out = _grad_partial(batch, m, "text", "label", 50).to_pandas()
    # count row excludes the null-label doc; null text still counts (y=1)
    assert out.set_index("bucket")["g"].loc[-2] == 3
    # bias row sums the three residuals: -0.5 + 0.5 - 0.5 quantized
    assert out.set_index("bucket")["g"].loc[-1] == -_QUANT // 2


def test_separability_and_probability_calibration(ray_session):
    import ray

    ds = ray.data.from_items(_rows()).repartition(6)
    model = train_logistic(ds, epochs=10)
    out = linear_predict_stage(ds, model).to_pandas()
    assert (out["lr_pred"].astype(int) == out["label"]).all()
    # kept-class probabilities clearly above dropped-class ones
    good = out[out["label"] == 1]["lr_prob_micro"].min()
    bad = out[out["label"] == 0]["lr_prob_micro"].max()
    assert good > 600_000 > 400_000 > bad


def test_bit_determinism_across_partitionings(ray_session):
    import ray

    rows = _rows(120)
    m1 = train_logistic(ray.data.from_items(rows).repartition(2), epochs=6)
    m2 = train_logistic(ray.data.from_items(rows).repartition(9), epochs=6)
    assert np.array_equal(m1.weights, m2.weights)
    assert m1.bias == m2.bias


def test_serial_twin_parity(ray_session):
    """The distributed trainer equals a serial accumulation of the same
    integer gradients — the q_linear_distill oracle contract."""
    import ray

    from spiderray.stages.dsir import N_BUCKETS

    rows = _rows(80)
    dist = train_logistic(ray.data.from_items(rows).repartition(5), epochs=5)

    hasher = _HashCache(N_BUCKETS)
    feats = [_unique_ids(r["text"], hasher, N_BUCKETS) for r in rows]
    model = LinearModel(np.zeros(N_BUCKETS), 0.0)
    lr, l2 = 2.0, 1e-4
    for _ in range(5):
        grad = np.zeros(N_BUCKETS, dtype=np.int64)
        bias_g = 0
        for f, r in zip(feats, rows):
            rn = _residual_nano(model, f, r["label"])
            bias_g += rn
            if len(f):
                grad[f] += rn
        scale = lr / (len(rows) * _QUANT)
        w = model.weights * (1.0 - lr * l2) - grad.astype(np.float64) * scale
        b = model.bias - bias_g * scale
        model = LinearModel(w, b)
    assert np.array_equal(dist.weights, model.weights)
    assert dist.bias == model.bias


def test_no_labeled_rows_raises(ray_session):
    import ray

    ds = ray.data.from_items(
        [{"doc_id": 0, "text": "x", "label": None}]
    )
    with pytest.raises(ValueError, match="no labeled rows"):
        train_logistic(ds, epochs=1)
