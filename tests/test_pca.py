"""Distributed PCA whitening (stages/pca.py): exact-moment partition
invariance, whitening semantics (unit variance, decorrelation), the sign
convention, guards, and the independent serial twin."""

import numpy as np
import pyarrow as pa
import pytest

from spiderray.stages.pca import PCA_SCALE, pca_fit_distributed, pca_whiten


def _corr_table(n=400, d=6, seed=3):
    """Correlated Gaussian: distinct variances along rotated axes."""
    rng = np.random.RandomState(seed)
    A = rng.randn(d, d)
    Q, _ = np.linalg.qr(A)
    scales = np.linspace(2.0, 0.2, d)
    V = rng.randn(n, d) @ (Q * scales).T + rng.randn(d)
    return pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([row.tolist() for row in
                               V.astype(np.float32)],
                              pa.list_(pa.float32())),
    })


class TestFit:
    def test_partition_invariance_bit_exact(self, ray_session):
        import ray.data as rd

        t = _corr_table()
        models = []
        for blocks in (1, 7):
            ds = rd.from_arrow(t).repartition(blocks)
            models.append(pca_fit_distributed(ds))
        a, b = models
        assert np.array_equal(a["mean_q"], b["mean_q"])
        assert np.array_equal(a["whiten_q"], b["whiten_q"])
        assert np.array_equal(a["eigvals"], b["eigvals"])

    def test_eigvals_descending_and_floored(self, ray_session):
        import ray.data as rd

        m = pca_fit_distributed(rd.from_arrow(_corr_table()))
        lam = m["eigvals"]
        assert (np.diff(lam) <= 1e-12).all()
        assert lam.min() >= lam.max() * 1e-6 * 0.999

    def test_sign_convention(self, ray_session):
        import ray.data as rd

        m = pca_fit_distributed(rd.from_arrow(_corr_table()))
        W = m["whiten_q"]
        for j in range(W.shape[1]):
            assert W[np.argmax(np.abs(W[:, j])), j] > 0

    def test_empty_raises(self, ray_session):
        import ray.data as rd

        empty = pa.table({"vec_id": pa.array([], pa.int64()),
                          "embedding": pa.array([], pa.list_(pa.float32()))})
        with pytest.raises(ValueError, match="empty input"):
            pca_fit_distributed(rd.from_arrow(empty))


class TestWhiten:
    def test_unit_variance_and_decorrelated(self, ray_session):
        import ray.data as rd

        t = _corr_table(n=600)
        ds = rd.from_arrow(t)
        m = pca_fit_distributed(ds)
        out = pca_whiten(ds, m, n_components=4).to_pandas()
        Y = out[[f"w{j}" for j in range(4)]].to_numpy(dtype=np.float64)
        Y /= PCA_SCALE  # micro-sigma -> sigma
        # whitened axes: ~zero mean, ~unit variance, ~decorrelated
        assert np.abs(Y.mean(axis=0)).max() < 0.05
        assert np.abs(Y.var(axis=0) - 1.0).max() < 0.05
        C = np.corrcoef(Y.T)
        off = C[~np.eye(4, dtype=bool)]
        assert np.abs(off).max() < 0.05

    def test_transform_partition_invariant(self, ray_session):
        import ray.data as rd

        t = _corr_table()
        m = pca_fit_distributed(rd.from_arrow(t))
        outs = []
        for blocks in (1, 5):
            ds = rd.from_arrow(t).repartition(blocks)
            df = pca_whiten(ds, m, n_components=3).to_pandas()
            outs.append(df.sort_values("vec_id").reset_index(drop=True))
        assert outs[0].equals(outs[1])

    def test_matches_serial_twin(self, ray_session):
        from spiderray.pipelines.queries import q_pca_whiten
        from spiderray.pipelines.serial_oracles import so_pca_whiten

        sf = "/root/testdata/sf0.001"
        got = q_pca_whiten(sf)
        exp = so_pca_whiten(sf).to_pandas()
        assert got.reset_index(drop=True).astype("int64").equals(
            exp.astype("int64"))
