"""prepare_embeddings composite (pipelines/prepare_embeddings.py):
schema, planted near-dup marking, and partition invariance."""

import numpy as np
import pyarrow as pa

from spiderray.pipelines.prepare_embeddings import prepare_embeddings


def _tbl(ids, V):
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([row.tolist() for row in
                               np.asarray(V, dtype=np.float32)],
                              pa.list_(pa.float32())),
    })


def _corpus(n=120, d=16, seed=4, plant_every=20):
    """Random vectors plus planted near-copies (id + 1_000_000, tiny
    perturbation -> cosine ~0.9999, far above 0.95)."""
    rng = np.random.RandomState(seed)
    V = rng.randn(n, d)
    ids = list(range(n))
    planted = []
    for i in range(0, n, plant_every):
        ids.append(i + 1_000_000)
        V = np.vstack([V, V[i] + 0.002 * rng.randn(d)])
        planted.append(i + 1_000_000)
    return _tbl(ids, V), planted


class TestPrepareEmbeddings:
    def test_schema_and_planted_dups(self, ray_session):
        import ray.data as rd

        t, planted = _corpus()
        out = (prepare_embeddings(rd.from_arrow(t), pq_m=4, pq_k=8,
                                  pq_iters=3)
               .to_pandas().sort_values("vec_id").reset_index(drop=True))
        assert list(out.columns) == (
            ["vec_id", "cluster"] + [f"pq{j}" for j in range(4)]
            + [f"w{j}" for j in range(4)] + ["is_dup"])
        assert len(out) == len(t)
        # every planted copy has the larger id -> marked as the loser
        marked = set(out[out.is_dup].vec_id)
        for p in planted:
            assert p in marked, p
        # originals of planted pairs survive
        assert not out[out.vec_id.isin([p - 1_000_000 for p in planted])
                       ].is_dup.any()
        assert out.cluster.between(0, 7).all()
        assert all(out[f"pq{j}"].between(0, 7).all() for j in range(4))

    def test_partition_invariant(self, ray_session):
        import ray.data as rd

        t, _ = _corpus(n=80)
        outs = []
        for blocks in (1, 5):
            ds = rd.from_arrow(t).repartition(blocks)
            outs.append(prepare_embeddings(ds, pq_m=4, pq_k=8, pq_iters=2)
                        .to_pandas().sort_values("vec_id")
                        .reset_index(drop=True))
        assert outs[0].equals(outs[1])
