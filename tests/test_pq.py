"""Product quantization (stages/pq.py): bit-exact training invariance,
encode/ADC semantics, and recall on clustered data."""

import numpy as np
import pyarrow as pa
import pytest

from spiderray.stages.pq import pq_adc_topk, pq_encode, pq_train


def _tbl(V):
    return pa.table({
        "vec_id": pa.array(np.arange(len(V)), pa.int64()),
        "embedding": pa.array([row.tolist() for row in
                               np.asarray(V, dtype=np.float32)],
                              pa.list_(pa.float32())),
    })


def _clustered(n=200, centers=4, d=16, seed=9, spread=0.05):
    rng = np.random.RandomState(seed)
    C = rng.randn(centers, d) * 2.0
    labels = np.arange(n) % centers
    return C[labels] + spread * rng.randn(n, d), labels


class TestPqTrain:
    def test_partition_invariance_bit_exact(self, ray_session):
        import ray.data as rd

        V, _ = _clustered()
        t = _tbl(V)
        books = []
        for blocks in (1, 6):
            ds = rd.from_arrow(t).repartition(blocks)
            books.append(pq_train(ds, m=4, k=8, iters=3))
        assert np.array_equal(books[0], books[1])

    def test_dim_not_divisible_raises(self, ray_session):
        import ray.data as rd

        V = np.random.RandomState(0).randn(20, 10)
        with pytest.raises(ValueError, match="not divisible"):
            pq_train(rd.from_arrow(_tbl(V)), m=4, k=4, iters=1)


class TestPqEncodeSearch:
    def test_codes_shape_and_recall(self, ray_session):
        import ray.data as rd

        V, labels = _clustered()
        ds = rd.from_arrow(_tbl(V))
        C = pq_train(ds, m=4, k=8, iters=4)
        assert C.shape == (4, 8, 4)
        codes = pq_encode(ds, C).select_columns(["vec_id", "pq_code"])
        df = codes.to_pandas().sort_values("vec_id").reset_index(drop=True)
        assert all(len(c) == 4 for c in df.pq_code)
        # clusters never SHARE a code (same-cluster rows may split between
        # twin centroids — the smallest-id init seeds two members per
        # cluster — but codes stay within the cluster)
        code_of = {i: tuple(c) for i, c in zip(df.vec_id, df.pq_code)}
        per_label = [set(code_of[i] for i in range(200) if labels[i] == lab)
                     for lab in range(4)]
        for x in range(4):
            for y in range(x + 1, 4):
                assert not (per_label[x] & per_label[y])
        # ADC top-10 for a cluster-0 query returns cluster-0 members
        out = pq_adc_topk(codes, C, V[0], topk=10)
        assert len(out) == 10
        assert all(labels[int(i)] == 0 for i in out.vec_id)
        # distances ascend, ties broken by id
        d = out.adc_dist.tolist()
        assert d == sorted(d)

    def test_exact_centroid_vector_has_zero_self_distance(self, ray_session):
        import ray.data as rd

        from spiderray.stages.pq import PQ_SCALE

        V, _ = _clustered(n=40, centers=2, d=8)
        ds = rd.from_arrow(_tbl(V))
        C = pq_train(ds, m=2, k=4, iters=3)
        # a query placed EXACTLY on codebook centroids -> ADC distance 0
        # to any row encoding to those same centroids
        q = np.concatenate([C[0, 0], C[1, 0]]).astype(np.float64) / PQ_SCALE
        probe = _tbl(np.asarray([q]))
        codes = pq_encode(rd.from_arrow(probe), C)
        out = pq_adc_topk(codes.select_columns(["vec_id", "pq_code"]),
                          C, q, topk=1)
        assert out.adc_dist.tolist() == [0]


class TestSq8:
    def test_roundtrip_error_bounded_and_recall(self, ray_session):
        import ray.data as rd

        from spiderray.stages.pq import sq8_encode, sq8_fit, sq8_recall_card

        V, _ = _clustered(n=150, centers=3, d=8)
        t = _tbl(V)
        ds = rd.from_arrow(t)
        lo, hi = sq8_fit(ds)
        assert np.allclose(lo, V.min(axis=0)) and np.allclose(hi, V.max(axis=0))
        enc = sq8_encode(ds, lo, hi).to_pandas().sort_values("vec_id")
        codes = np.array(enc.sq8_code.tolist(), dtype=np.float64)
        span = hi - lo
        span[span == 0] = 1.0
        D = lo + codes * span / 255.0
        Vs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        # max dequantization error is half a quantization step
        assert (np.abs(D - Vs) <= span / 255.0 * 0.5 + 1e-9).all()
        card = sq8_recall_card(ds, Vs[0], k=10)
        assert card.k.tolist() == [10]
        assert card.recall_at_k.iloc[0] >= 9  # int8 barely moves top-10

    def test_fit_partition_invariant_and_empty(self, ray_session):
        import pytest as _pytest
        import ray.data as rd

        from spiderray.stages.pq import sq8_fit

        V, _ = _clustered(n=80, d=8)
        t = _tbl(V)
        fits = []
        for blocks in (1, 5):
            lo, hi = sq8_fit(rd.from_arrow(t).repartition(blocks))
            fits.append((lo, hi))
        assert np.array_equal(fits[0][0], fits[1][0])
        assert np.array_equal(fits[0][1], fits[1][1])
        empty = _tbl(np.zeros((0, 4)))
        with _pytest.raises(ValueError, match="empty input"):
            sq8_fit(rd.from_arrow(empty))


class TestMatryoshka:
    def test_monotone_ish_and_exact_full(self, ray_session):
        import ray.data as rd

        from spiderray.stages.pq import matryoshka_recall_card

        rng = np.random.RandomState(8)
        # energy concentrated in the leading dims: prefixes rank well
        V = rng.randn(200, 16) * np.linspace(3.0, 0.1, 16)[None, :]
        t = _tbl(V)
        out = matryoshka_recall_card(rd.from_arrow(t), V[0],
                                     dims=(4, 8, 16), k=10)
        assert out.dims.tolist() == [4, 8, 16]
        # ranking by ALL dims IS the ground truth -> recall 10
        assert out.recall_at_k.tolist()[-1] == 10
        assert (out.recall_at_k >= 5).all()

    def test_partition_invariant(self, ray_session):
        import ray.data as rd

        from spiderray.stages.pq import matryoshka_recall_card

        rng = np.random.RandomState(3)
        V = rng.randn(120, 8)
        t = _tbl(V)
        outs = []
        for blocks in (1, 6):
            ds = rd.from_arrow(t).repartition(blocks)
            outs.append(matryoshka_recall_card(ds, V[1], dims=(2, 4), k=5))
        assert outs[0].equals(outs[1])
