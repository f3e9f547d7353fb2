"""prototype_prune (D4/SSL-prototypes) + mmr_topk correctness."""

import numpy as np
import pandas as pd
import pytest

from spiderray.stages import ann, dedup


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def _two_cluster_df(n_per: int = 40, dim: int = 8, seed: int = 7):
    """Two tight clusters around orthogonal prototypes plus per-cluster
    outliers: rows NEAR the prototype are the prototypical (redundant)
    ones D4 prunes first."""
    rng = np.random.default_rng(seed)
    a = np.zeros(dim); a[0] = 1.0
    b = np.zeros(dim); b[1] = 1.0
    rows, ids = [], []
    for i in range(n_per):
        # spread: the first rows sit almost on the prototype, later ones
        # drift further out (still nearest to their own prototype)
        drift = 0.02 + 0.6 * (i / n_per)
        rows.append(_unit(a + drift * rng.standard_normal(dim) * 0.3
                          + drift * np.eye(dim)[2]))
        ids.append(i)
        rows.append(_unit(b + drift * rng.standard_normal(dim) * 0.3
                          + drift * np.eye(dim)[3]))
        ids.append(1000 + i)
    return pd.DataFrame({"vec_id": np.array(ids, np.int64),
                         "embedding": [list(r) for r in rows]})


class TestPrototypePrune:
    def _run(self, df, **kw):
        import ray.data as rd

        ds = rd.from_pandas(df)
        init = ann.smallest_id_vectors(ds, kw.get("n_clusters", 2))
        out = dedup.prototype_prune(rd.from_pandas(df), init=init, **kw)
        return (out.to_pandas().sort_values("vec_id")
                .reset_index(drop=True))

    def test_prunes_most_prototypical_per_cluster(self, ray_session):
        df = _two_cluster_df()
        got = self._run(df, n_clusters=2, iters=3, drop_frac=0.25)
        assert got["pruned"].sum() > 0
        for c in got["cluster"].unique():
            g = got[got["cluster"] == c]
            n_drop = int(g["pruned"].sum())
            assert n_drop <= int(0.25 * len(g))
            # every pruned score strictly exceeds every kept score
            if n_drop:
                assert (g[g["pruned"]]["proto_milli"].min()
                        > g[~g["pruned"]]["proto_milli"].max())

    def test_drop_frac_zero_prunes_nothing(self, ray_session):
        got = self._run(_two_cluster_df(), n_clusters=2, iters=2,
                        drop_frac=0.0)
        assert not got["pruned"].any()

    def test_cutoff_ties_all_kept(self, ray_session):
        # every vector identical -> every score lands in one bin; the
        # bin exceeds the drop budget, so NOTHING is pruned (ties kept)
        df = pd.DataFrame({
            "vec_id": np.arange(30, dtype=np.int64),
            "embedding": [[1.0, 0.0, 0.0]] * 30,
        })
        got = self._run(df, n_clusters=2, iters=2, drop_frac=0.5)
        assert not got["pruned"].any()

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        df = _two_cluster_df()
        ds1 = rd.from_pandas(df)
        ds5 = rd.from_pandas(df).repartition(5)
        init = ann.smallest_id_vectors(ds1, 2)
        a = (dedup.prototype_prune(ds1, n_clusters=2, iters=3,
                                   drop_frac=0.25, init=init)
             .to_pandas().sort_values("vec_id").reset_index(drop=True))
        b = (dedup.prototype_prune(ds5, n_clusters=2, iters=3,
                                   drop_frac=0.25, init=init)
             .to_pandas().sort_values("vec_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_filter_mode_matches_flag(self, ray_session):
        import ray.data as rd

        df = _two_cluster_df()
        init = ann.smallest_id_vectors(rd.from_pandas(df), 2)
        flag = dedup.prototype_prune(rd.from_pandas(df), n_clusters=2,
                                     iters=3, drop_frac=0.25,
                                     init=init).to_pandas()
        filt = dedup.prototype_prune(rd.from_pandas(df), n_clusters=2,
                                     iters=3, drop_frac=0.25, init=init,
                                     mode="filter").to_pandas()
        kept = set(flag[~flag["pruned"]]["vec_id"])
        assert set(filt["vec_id"]) == kept

    def test_bad_args_raise(self, ray_session):
        import ray.data as rd

        ds = rd.from_pandas(_two_cluster_df())
        with pytest.raises(ValueError):
            dedup.prototype_prune(ds, mode="bogus")
        with pytest.raises(ValueError):
            dedup.prototype_prune(ds, drop_frac=1.0)


class TestMmrTopk:
    def _emb_df(self):
        rng = np.random.default_rng(11)
        q = np.zeros(6); q[0] = 1.0
        rows = [q.copy()]                      # id 0 = the query itself
        rows.append(_unit(q + 1e-4 * np.eye(6)[1]))   # id 1: near-copy of 0
        rows.append(_unit(q + 0.4 * np.eye(6)[2]))    # id 2: distinct region
        rows.append(_unit(q + 0.4 * np.eye(6)[3]))    # id 3: distinct region
        for i in range(4, 40):
            rows.append(_unit(rng.standard_normal(6)))
        return pd.DataFrame({"vec_id": np.arange(len(rows), dtype=np.int64),
                             "embedding": [list(r) for r in rows]})

    def test_lambda_1000_is_plain_topk(self, ray_session):
        import ray.data as rd

        df = self._emb_df()
        q = np.array(df["embedding"][0], np.float64)
        got = ann.mmr_topk(rd.from_pandas(df), q, k=5, lamb_milli=1000,
                           n_candidates=40)
        # plain top-k over milli sims with min-id ties
        V = np.array(df["embedding"].to_list(), np.float64)
        qn = q / np.linalg.norm(q)
        n = np.linalg.norm(V, axis=1); n[n == 0] = 1.0
        milli = np.floor((V @ qn) / n * 1000.0 + 0.5).astype(np.int64)
        ids = df["vec_id"].to_numpy()
        order = np.lexsort((ids, -milli))[:5]
        assert list(got["vec_id"]) == list(ids[order])

    def test_diversity_skips_near_copy(self, ray_session):
        import ray.data as rd

        # twins a1/a2 (identical, rel ~894, mutual sim 1000) vs a distinct
        # b (rel ~894, sim(a,b) ~800): after a1, MMR at λ=500 must prefer
        # b (score ~47) over the twin a2 (score -53); plain top-k would
        # return the twin second.
        q = np.zeros(6); q[0] = 1.0
        a = _unit(q + 0.5 * np.eye(6)[1])
        b = _unit(q + 0.5 * np.eye(6)[2])
        c = _unit(q + 0.5 * np.eye(6)[3])
        df = pd.DataFrame({
            "vec_id": np.array([10, 11, 12, 13], np.int64),
            "embedding": [list(a), list(a), list(b), list(c)],
        })
        got = ann.mmr_topk(rd.from_pandas(df), q, k=3, lamb_milli=500,
                           n_candidates=4)
        # a1 first (min-id twin), then b and c (distinct regions, score
        # ~+47 each): the twin a2 (score -53) is excluded entirely; plain
        # top-k would return it second.
        assert list(got["vec_id"]) == [10, 12, 13]

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        df = self._emb_df()
        q = np.array(df["embedding"][0], np.float64)
        a = ann.mmr_topk(rd.from_pandas(df), q, k=6, lamb_milli=700,
                         n_candidates=16)
        b = ann.mmr_topk(rd.from_pandas(df).repartition(7), q, k=6,
                         lamb_milli=700, n_candidates=16)
        pd.testing.assert_frame_equal(a, b)

    def test_k_exceeding_corpus(self, ray_session):
        import ray.data as rd

        df = self._emb_df().head(4)
        q = np.array(df["embedding"][0], np.float64)
        got = ann.mmr_topk(rd.from_pandas(df), q, k=10, lamb_milli=700,
                           n_candidates=10)
        assert len(got) == 4
        assert list(got["rank"]) == [0, 1, 2, 3]

    def test_bad_args_raise(self, ray_session):
        import ray.data as rd

        ds = rd.from_pandas(self._emb_df())
        q = np.zeros(6); q[0] = 1.0
        with pytest.raises(ValueError):
            ann.mmr_topk(ds, q, k=20, n_candidates=10)
        with pytest.raises(ValueError):
            ann.mmr_topk(ds, q, lamb_milli=1500)


class TestBatchTopk:
    def test_matches_single_query_topk(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(5)
        V = rng.standard_normal((60, 8))
        df = pd.DataFrame({"vec_id": np.arange(60, dtype=np.int64),
                           "embedding": [list(r) for r in V]})
        ds = rd.from_pandas(df)
        Q = V[:3]
        got = ann.batch_topk(ds, Q, k=5)
        for j in range(3):
            single = ann.brute_force_topk(rd.from_pandas(df), Q[j], k=5)
            g = got[got["query_idx"] == j]
            assert list(g["vec_id"]) == list(single["vec_id"])

    def test_partition_invariance_and_guard(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(6)
        V = rng.standard_normal((80, 6))
        df = pd.DataFrame({"vec_id": np.arange(80, dtype=np.int64),
                           "embedding": [list(r) for r in V]})
        a = ann.batch_topk(rd.from_pandas(df), V[:4], k=6)
        b = ann.batch_topk(rd.from_pandas(df).repartition(9), V[:4], k=6)
        pd.testing.assert_frame_equal(a, b)
        with pytest.raises(ValueError):
            ann.batch_topk(rd.from_pandas(df), np.zeros((0, 6)))


class TestAnnRecall:
    def test_recall_bounds_and_exact_self_hit(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(7)
        V = rng.standard_normal((200, 8))
        df = pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64),
                           "embedding": [list(r) for r in V]})
        out = ann.ann_recall(rd.from_pandas(df), V[:2], k=5)
        assert set(out["method"]) == {"lsh", "ivf"}
        assert ((out["recall_ppm"] >= 0)
                & (out["recall_ppm"] <= 1_000_000)).all()
        # the query IS corpus row j: its own id is always in the exact
        # truth, and every probe method scans the cell/bucket containing
        # it, so recall can never be 0
        assert (out["recall_ppm"] > 0).all()


class TestHashEmbed:
    def test_cosine_separates_near_from_far(self, ray_session):
        import ray.data as rd

        from spiderray.stages.textindex import hash_embed

        base = "the quick brown fox jumps over the lazy dog " * 4
        df = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": [base, base + "extra", "completely different words "
                     "about other topics entirely now " * 4],
        })
        out = hash_embed(rd.from_pandas(df), dim=64).to_pandas()
        V = np.array(out["embedding"].to_list(), np.float64)
        assert float(V[0] @ V[1]) > 0.8
        assert abs(float(V[0] @ V[2])) < 0.4

    def test_deterministic_zero_and_guards(self, ray_session):
        import ray.data as rd

        from spiderray.stages.textindex import hash_embed

        df = pd.DataFrame({"doc_id": [1, 2], "text": ["a b c d", ""]})
        a = (hash_embed(rd.from_pandas(df), dim=16).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (hash_embed(rd.from_pandas(df).repartition(2), dim=16)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        for x, y in zip(a["embedding"], b["embedding"]):
            assert np.array_equal(np.asarray(x), np.asarray(y))
        assert all(v == 0.0 for v in a["embedding"][1])
        assert abs(sum(x * x for x in a["embedding"][0]) - 1.0) < 1e-6
        with pytest.raises(ValueError):
            hash_embed(rd.from_pandas(df), dim=1)
