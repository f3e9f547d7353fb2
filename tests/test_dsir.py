"""DSIR importance resampling (stages/dsir)."""

import numpy as np
import pyarrow as pa
import pytest

from spiderray.stages.dsir import (
    _HashCache,
    _bucket_of,
    _gumbel_key,
    corpus_bucket_counts,
    doc_feature_ids,
    dsir_score_stage,
    dsir_select,
    log_ratio_vector,
)


def test_bucket_hash_deterministic_and_cached():
    h = _HashCache(1000)
    assert h("hello") == h("hello") == _bucket_of("hello", 1000)
    assert 0 <= h("hello") < 1000


def test_doc_features_unigrams_plus_bigrams_in_order():
    h = _HashCache(10_000)
    ids = doc_feature_ids("a b c", h)
    assert len(ids) == 3 + 2  # 3 unigrams + 2 bigrams
    want = [h("a"), h("b"), h("c"), h("a b"), h("b c")]
    assert ids.tolist() == want
    assert doc_feature_ids("", h).tolist() == []
    assert doc_feature_ids(None, h).tolist() == []


def test_log_ratio_prefers_target_tokens():
    n = 100
    tgt = np.zeros(n, dtype=np.int64)
    raw = np.zeros(n, dtype=np.int64)
    h = _HashCache(n)
    b_t, b_r = h("targetword"), h("rawword")
    tgt[b_t] = 50
    raw[b_t] = 50
    raw[b_r] = 50
    lr = log_ratio_vector(tgt, raw)
    assert lr[b_t] > 0 > lr[b_r]


def test_gumbel_key_deterministic():
    assert _gumbel_key(42, 0) == _gumbel_key(42, 0)
    assert _gumbel_key(42, 0) != _gumbel_key(42, 1)
    assert _gumbel_key(42, 0) != _gumbel_key(43, 0)


@pytest.fixture()
def corpora(ray_session):
    import ray.data as rd

    target_rows = [{"doc_id": i, "text": "science research method data"} for i in range(20)]
    raw_rows = (
        [{"doc_id": i, "text": "science research method data"} for i in range(10)]
        + [{"doc_id": 100 + i, "text": "spam casino deal offer"} for i in range(10)]
    )
    return rd.from_items(raw_rows), rd.from_items(target_rows)


def test_counts_match_serial(corpora):
    raw_ds, _ = corpora
    counts = corpus_bucket_counts(raw_ds, n_buckets=500)
    h = _HashCache(500)
    want = np.zeros(500, dtype=np.int64)
    for text in ["science research method data"] * 10 + ["spam casino deal offer"] * 10:
        want += np.bincount(doc_feature_ids(text, h, 500), minlength=500)
    assert (counts == want).all()


def test_score_separates_domains(corpora):
    raw_ds, target_ds = corpora
    tgt = corpus_bucket_counts(target_ds, n_buckets=500)
    raw = corpus_bucket_counts(raw_ds, n_buckets=500)
    lr = log_ratio_vector(tgt, raw)
    out = dsir_score_stage(raw_ds, lr).to_pandas()
    sci = out[out["doc_id"] < 100]["dsir_score"]
    spam = out[out["doc_id"] >= 100]["dsir_score"]
    assert sci.min() > spam.max()


def test_select_topk_picks_target_like(corpora):
    raw_ds, target_ds = corpora
    sel = dsir_select(raw_ds, target_ds, k=10, n_buckets=500)
    assert sorted(sel["doc_id"]) == list(range(10))  # all science docs
    # deterministic across runs
    sel2 = dsir_select(raw_ds, target_ds, k=10, n_buckets=500)
    assert sel.equals(sel2)


def test_select_gumbel_seeded(corpora):
    raw_ds, target_ds = corpora
    a = dsir_select(raw_ds, target_ds, k=5, n_buckets=500, mode="gumbel", seed=3)
    b = dsir_select(raw_ds, target_ds, k=5, n_buckets=500, mode="gumbel", seed=3)
    assert a.equals(b)
    with pytest.raises(ValueError):
        dsir_select(raw_ds, target_ds, k=5, mode="bogus")
