"""Mutual-nearest-neighbor pair mining (stages/ann.mutual_nn_pairs):
hand-crafted mutuality semantics, hub non-reciprocation, determinism
under partitioning, and guards."""

import numpy as np
import pyarrow as pa
import pytest

from spiderray.stages.ann import mutual_nn_pairs


def _tbl(rows):
    return pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([list(map(float, r[1])) for r in rows],
                              pa.list_(pa.float32())),
    })


class TestMutualNN:
    def test_hand_crafted_hub_not_reciprocated(self, ray_session):
        import ray.data as rd

        # b=101 is BOTH a0's and a4's top-1, but reciprocates only a0
        # (higher cosine); a2 <-> b103 pair cleanly.
        a = _tbl([(0, [1.0, 0.02, 0.0]),
                  (2, [0.0, 0.0, 1.0]),
                  (4, [0.9, 0.30, 0.0])])
        b = _tbl([(101, [1.0, 0.0, 0.0]),
                  (103, [0.05, 0.0, 1.0])])
        out = (mutual_nn_pairs(rd.from_arrow(a), rd.from_arrow(b))
               .to_pandas().sort_values("id_a").reset_index(drop=True))
        assert out.id_a.tolist() == [0, 2]
        assert out.id_b.tolist() == [101, 103]
        assert (out.cos_ppm > 990_000).all()

    def test_identical_twins_all_mutual(self, ray_session):
        import ray.data as rd

        rng = np.random.RandomState(11)
        V = rng.randn(20, 8)
        a = _tbl([(2 * i, V[i]) for i in range(20)])
        b = _tbl([(2 * i + 1, V[i] * 0.7) for i in range(20)])  # scaled copies
        out = (mutual_nn_pairs(rd.from_arrow(a), rd.from_arrow(b))
               .to_pandas().sort_values("id_a").reset_index(drop=True))
        assert len(out) == 20
        assert (out.id_b == out.id_a + 1).all()
        assert (out.cos_ppm >= 999_000).all()  # cosine is gain-invariant

    def test_partition_invariant(self, ray_session):
        import ray.data as rd

        rng = np.random.RandomState(5)
        a = _tbl([(i, rng.randn(6)) for i in range(0, 60, 2)])
        b = _tbl([(i, rng.randn(6)) for i in range(1, 41, 2)])
        outs = []
        for blocks in (1, 7):
            ds_a = rd.from_arrow(a).repartition(blocks)
            outs.append(
                mutual_nn_pairs(ds_a, rd.from_arrow(b)).to_pandas()
                .sort_values("id_a").reset_index(drop=True))
        assert outs[0].equals(outs[1])

    def test_zero_vectors_never_win(self, ray_session):
        import ray.data as rd

        a = _tbl([(0, [0.0, 0.0]), (2, [1.0, 0.0])])
        b = _tbl([(1, [1.0, 0.0]), (3, [0.0, 0.0])])
        out = (mutual_nn_pairs(rd.from_arrow(a), rd.from_arrow(b))
               .to_pandas())
        assert out.id_a.tolist() == [2] and out.id_b.tolist() == [1]

    def test_broadcast_cap_and_empty_b(self, ray_session):
        import ray.data as rd

        a = _tbl([(0, [1.0])])
        b = _tbl([(1, [1.0]), (3, [0.5])])
        with pytest.raises(ValueError, match="IVF-bucket"):
            mutual_nn_pairs(rd.from_arrow(a), rd.from_arrow(b),
                            max_broadcast=1)
        empty_b = _tbl([])
        with pytest.raises(ValueError, match="empty B side"):
            mutual_nn_pairs(rd.from_arrow(a), rd.from_arrow(empty_b))
