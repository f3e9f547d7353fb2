"""Distributed Naive Bayes classifier (stages/nbayes)."""

import numpy as np
import pyarrow as pa
import pytest

from spiderray.stages.dsir import _HashCache, doc_feature_ids
from spiderray.stages.nbayes import (
    NaiveBayesModel,
    _partial_class_counts,
    nb_predict_stage,
    train_naive_bayes,
)


def _rows(n_per_class=30):
    rows = []
    for i in range(n_per_class):
        rows.append({"doc_id": i, "text": "der hund läuft schnell im park", "lang": "de"})
        rows.append({"doc_id": 100 + i, "text": "the dog runs fast in the park", "lang": "en"})
        rows.append({"doc_id": 200 + i, "text": "le chien court vite dans le parc", "lang": "fr"})
    return rows


def test_model_assembly_and_tiebreak():
    classes = ["a", "b"]
    docs = np.array([5, 5], dtype=np.int64)
    feat = np.zeros((2, 100), dtype=np.int64)
    m = NaiveBayesModel(classes, docs, feat)
    # identical classes → argmax takes the first = lexicographically smallest
    label, _ = m.predict_ids(np.array([3, 7], dtype=np.int64))
    assert label == "a"
    # empty feature list scores the prior only
    label, logp = m.predict_ids(np.zeros(0, dtype=np.int64))
    assert label == "a" and logp == pytest.approx(np.log(0.5))


def test_partial_counts_carry_doc_counts_as_sentinel():
    batch = pa.table(
        {"text": pa.array(["a b", "a", None, "c"], pa.string()),
         "lang": pa.array(["x", "x", "y", None], pa.string())}
    )
    out = _partial_class_counts(batch, "text", "lang", 50)
    df = out.to_pandas()
    docs = df[df["bucket"] == -1].set_index("label")["n"].to_dict()
    assert docs == {"x": 2, "y": 1}  # null label dropped, null text counted


def test_train_and_predict_separable(ray_session):
    import ray.data as rd

    ds = rd.from_items(_rows())
    model = train_naive_bayes(ds, label_col="lang", n_buckets=2048)
    assert model.classes == ["de", "en", "fr"]
    out = nb_predict_stage(ds, model).to_pandas()
    assert (out["nb_label"] == out["lang"]).all()  # fully separable corpus


def test_training_is_partition_invariant(ray_session):
    import ray.data as rd

    rows = _rows(10)
    a = train_naive_bayes(rd.from_items(rows), n_buckets=512)
    b = train_naive_bayes(rd.from_items(rows).repartition(7), n_buckets=512)
    assert a.classes == b.classes
    assert np.array_equal(a.log_feat, b.log_feat)
    assert np.array_equal(a.log_prior, b.log_prior)


def test_scoring_matches_manual_formula():
    h = _HashCache(256)
    texts = ["x y", "x", "z z y"]
    labels = ["p", "p", "q"]
    feat = np.zeros((2, 256), dtype=np.int64)
    docs = np.zeros(2, dtype=np.int64)
    for t, l in zip(texts, labels):
        i = 0 if l == "p" else 1
        docs[i] += 1
        ids = doc_feature_ids(t, h, 256)
        feat[i] += np.bincount(ids, minlength=256)
    m = NaiveBayesModel(["p", "q"], docs, feat)
    ids = doc_feature_ids("x y", h, 256)
    want_p = np.log(2 / 3) + sum(
        np.log((feat[0, b] + 1.0) / (feat[0].sum() + 256.0)) for b in ids
    )
    assert m.score_ids(ids)[0] == pytest.approx(want_p, rel=1e-12)


def test_train_raises_on_unlabeled(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"text": "a", "lang": None}])
    with pytest.raises(ValueError):
        train_naive_bayes(ds)
