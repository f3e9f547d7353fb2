"""Dedup suite + ANN correctness at test scale."""

import numpy as np
import pandas as pd
import pytest

from spiderray.functions import fingerprint as fp
from spiderray.stages import ann, dedup


class TestFingerprintPure:
    def test_md5_matches_duckdb_semantics(self):
        import duckdb

        texts = ["Hello World ", " MIXED case\t", "中文 text"]
        con = duckdb.connect()
        for t in texts:
            sql = con.sql("SELECT md5(lower(trim(?)))", params=[t]).fetchone()[0]
            assert fp.md5_fingerprint(t) == sql

    def test_minhash_near_vs_far(self):
        base = "the quick brown fox jumps over the lazy dog and keeps going " * 4
        a = fp.minhash_signature(base)
        b = fp.minhash_signature(base + "tail")
        c = fp.minhash_signature("entirely different words about other topics here now")
        assert fp.sig_jaccard(a, b) > 0.6
        assert fp.sig_jaccard(a, c) < 0.2

    def test_minhash_band_collision(self):
        base = "the quick brown fox jumps over the lazy dog and keeps going " * 4
        ba = fp.minhash_bands(fp.minhash_signature(base))
        bb = fp.minhash_bands(fp.minhash_signature(base + "tail"))
        assert any(x == y for x, y in zip(ba, bb))

    def test_simhash_hamming(self):
        base = "word " * 40 + "alpha beta gamma delta epsilon zeta eta theta"
        ha = fp.simhash64(base)
        hb = fp.simhash64(base + " iota")
        hc = fp.simhash64("совершенно другие слова на другом языке здесь сейчас")
        assert fp.hamming64(ha, hb) <= 6
        assert fp.hamming64(ha, hc) > 10

    def test_simhash_chunks_pigeonhole(self):
        h = fp.simhash64("some stable text for chunks")
        chunks = fp.simhash_chunks(h)
        assert len(chunks) == 4
        rebuilt = sum(c << (16 * i) for i, c in enumerate(chunks))
        assert rebuilt == h

    def test_jaccard_exact(self):
        a = np.array([1, 2, 3, 4], dtype=np.uint64)
        b = np.array([3, 4, 5, 6], dtype=np.uint64)
        assert fp.jaccard(a, b) == pytest.approx(2 / 6)

    def test_rolling_hashes(self):
        h1 = fp.rolling_hashes("abcdefgh", k=3)
        h2 = fp.rolling_hashes("xxabcdefgh", k=3)
        assert len(h1) == 6
        assert set(h1.tolist()) <= set(h2.tolist())


@pytest.fixture(scope="module")
def docs_df():
    rng = np.random.default_rng(7)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = []
    for i in range(60):
        text = " ".join(rng.choice(words, size=30))
        rows.append({"doc_id": i, "text": text})
    # exact dups
    rows.append({"doc_id": 100, "text": rows[0]["text"]})
    rows.append({"doc_id": 101, "text": rows[1]["text"].upper()})  # case-insensitive dup
    # near dups
    rows.append({"doc_id": 200, "text": rows[2]["text"] + " tail"})
    return pd.DataFrame(rows)


class TestDedupRay:
    def test_exact_dedup(self, ray_session, docs_df):
        import ray.data as rd

        winners = dedup.exact_dedup(rd.from_pandas(docs_df)).to_pandas()
        assert 100 not in winners.doc_id.values
        assert 101 not in winners.doc_id.values
        assert 0 in winners.doc_id.values and 1 in winners.doc_id.values
        assert len(winners) == len(docs_df) - 2

    def test_minhash_pairs_find_near_dup(self, ray_session, docs_df):
        import ray.data as rd

        pairs = dedup.minhash_lsh_pairs(rd.from_pandas(docs_df), threshold=0.6).to_pandas()
        found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
        assert (2, 200) in found
        assert (0, 100) in found

    def test_simhash_pairs(self, ray_session, docs_df):
        import ray.data as rd

        pairs = dedup.simhash_pairs(rd.from_pandas(docs_df), max_hamming=3).to_pandas()
        found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
        assert (0, 100) in found  # identical text → distance 0

    def test_ngram_pairs(self, ray_session, docs_df):
        import ray.data as rd

        pairs = dedup.ngram_jaccard_pairs(rd.from_pandas(docs_df), threshold=0.5).to_pandas()
        found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
        assert (2, 200) in found


class TestAnn:
    @pytest.fixture(scope="class")
    def emb_df(self):
        rng = np.random.default_rng(11)
        V = rng.standard_normal((300, 16))
        V[17] = V[3] * 0.9 + 0.01  # near-dup of 3
        return pd.DataFrame({"vec_id": range(300), "embedding": list(V), "label": [i % 5 for i in range(300)]})

    def test_brute_force_topk_matches_numpy(self, ray_session, emb_df):
        import ray.data as rd

        q = np.array(emb_df.embedding[3], dtype=np.float64)
        got = ann.brute_force_topk(rd.from_pandas(emb_df), q, k=5)
        V = np.array(emb_df.embedding.to_list(), dtype=np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q)
        cos = Vn @ qn
        exp = np.lexsort((np.arange(len(cos)), -cos))[:5]
        assert got["vec_id"].tolist() == exp.tolist()
        assert got["vec_id"].iloc[0] == 3
        assert 17 in got["vec_id"].tolist()

    def test_lsh_topk_recalls_top1(self, ray_session, emb_df):
        import ray.data as rd

        q = np.array(emb_df.embedding[3], dtype=np.float64)
        got = ann.lsh_topk(rd.from_pandas(emb_df), q, k=5)
        assert got["vec_id"].iloc[0] == 3
        assert 17 in got["vec_id"].tolist()


class TestPq:
    @pytest.fixture(scope="class")
    def emb_df(self):
        rng = np.random.default_rng(23)
        V = rng.standard_normal((400, 16))
        V[17] = V[3] * 0.9 + 0.01  # near-dup of 3
        return pd.DataFrame({"vec_id": range(400), "embedding": list(V)})

    def test_encode_matches_train_partitioning(self, ray_session, emb_df):
        """Codebooks are partition-invariant: 1-block vs 8-block training
        yields bit-identical codebooks and codes."""
        import ray.data as rd

        a = ann.pq_train(rd.from_pandas(emb_df), m=4, n_codes=8,
                         sample_size=200)
        b = ann.pq_train(rd.from_pandas(emb_df).repartition(8), m=4,
                         n_codes=8, sample_size=200)
        assert np.array_equal(a, b)
        V = np.array(emb_df.embedding.to_list(), dtype=np.float64)
        codes = ann.pq_encode_matrix(V, a)
        assert codes.shape == (400, 4) and codes.dtype == np.uint8
        enc = ann.pq_encode(rd.from_pandas(emb_df), a).to_pandas()
        enc = enc.sort_values("vec_id").reset_index(drop=True)
        assert [c for c in enc["pq_code"]] == [r.tobytes() for r in codes]

    def test_adc_topk_matches_serial(self, ray_session, emb_df):
        """Distributed local-topk merge ≡ a serial full ADC scan."""
        import ray.data as rd

        q = np.array(emb_df.embedding[3], dtype=np.float64)
        cb = ann.pq_train(rd.from_pandas(emb_df), m=4, n_codes=8,
                          sample_size=200)
        got = ann.pq_topk(rd.from_pandas(emb_df).repartition(6), q, cb, k=10)
        V = np.array(emb_df.embedding.to_list(), dtype=np.float64)
        d = ann.adc_distances(ann.pq_encode_matrix(V, cb), ann.adc_lut(q, cb))
        exp = np.lexsort((np.arange(len(d)), d))[:10]
        assert got["vec_id"].tolist() == exp.tolist()

    def test_refine_recovers_exact_topk(self, ray_session, emb_df):
        """ADC top-refine + exact cosine rerank: with refine = corpus size
        the result IS the brute-force top-k; with a realistic refine the
        planted near-dup must surface."""
        import ray.data as rd

        q = np.array(emb_df.embedding[3], dtype=np.float64)
        ds = rd.from_pandas(emb_df)
        cb = ann.pq_train(ds, m=4, n_codes=8, sample_size=200)
        exact = ann.brute_force_topk(rd.from_pandas(emb_df), q, k=5)
        refined = ann.pq_topk(rd.from_pandas(emb_df), q, cb, k=5, refine=400)
        assert refined["vec_id"].tolist() == exact["vec_id"].tolist()
        small = ann.pq_topk(rd.from_pandas(emb_df), q, cb, k=5, refine=50)
        assert small["vec_id"].iloc[0] == 3
        assert 17 in small["vec_id"].tolist()

    def test_adc_recall_bound(self, ray_session, emb_df):
        """ADC-only recall@10 vs brute force stays useful (≥0.5 on random
        gaussian vectors with 4×8 codes — the hard case; planted structure
        only helps)."""
        import ray.data as rd

        q = np.array(emb_df.embedding[7], dtype=np.float64)
        cb = ann.pq_train(rd.from_pandas(emb_df), m=4, n_codes=8,
                          sample_size=200)
        adc = set(ann.pq_topk(rd.from_pandas(emb_df), q, cb, k=10)["vec_id"])
        exact = set(ann.brute_force_topk(rd.from_pandas(emb_df), q, k=10)["vec_id"])
        assert len(adc & exact) >= 5

    def test_indivisible_dim_raises(self):
        with pytest.raises(ValueError):
            ann._pq_split(10, 4)


class TestJoins:
    @pytest.fixture(scope="class")
    def sides(self, ray_session):
        import ray.data as rd

        left = rd.from_items([{"k": i % 7, "lval": i} for i in range(50)])
        right = rd.from_items([{"k": j, "rval": j * 100} for j in range(5)])
        return left, right

    def _expected(self):
        rows = []
        for i in range(50):
            if i % 7 < 5:
                rows.append((i % 7, i, (i % 7) * 100))
        return sorted(rows)

    def test_native_hash_join(self, sides):
        from spiderray.stages.joins import hash_join

        left, right = sides
        out = hash_join(left, right, on="k", num_partitions=4).to_pandas()
        got = sorted(map(tuple, out[["k", "lval", "rval"]].to_numpy()))
        assert got == self._expected()

    def test_bucketed_join(self, sides):
        from spiderray.stages.joins import bucketed_join

        left, right = sides
        out = bucketed_join(left, right, on="k", num_buckets=8).to_pandas()
        got = sorted(map(tuple, out[["k", "lval", "rval"]].to_numpy()))
        assert got == self._expected()


class TestSketch:
    def test_hll_vs_exact_on_events(self, ray_session):
        import ray.data as rd

        from spiderray.functions.sketch import count_distinct_approx

        ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet", columns=["user_id"])
        exact = len(ds.unique("user_id"))
        est = count_distinct_approx(
            rd.read_parquet("/root/testdata/sf0.001/events.parquet", columns=["user_id"]),
            "user_id",
        )
        assert abs(est - exact) / exact < 0.02

    def test_hll_large(self):
        import numpy as np

        from spiderray.functions import sketch

        vals = [f"v{i}" for i in range(50000)]
        regs = sketch.hll_merge(
            [sketch.hll_from_values(list(c)) for c in np.array_split(np.array(vals, dtype=object), 9)]
        )
        est = sketch.hll_estimate(regs)
        assert abs(est - 50000) / 50000 < 0.03


class TestEmbeddingLsh:
    def test_planted_near_dup_found(self, ray_session):
        import ray.data as rd

        from spiderray.stages.dedup import embedding_near_dup_lsh

        rng = np.random.default_rng(3)
        V = rng.standard_normal((400, 32))
        V[50] = V[7] + rng.standard_normal(32) * 0.01  # planted near-dup
        df = pd.DataFrame({"vec_id": range(400), "embedding": list(V)})
        pairs = embedding_near_dup_lsh(rd.from_pandas(df), threshold=0.95).to_pandas()
        found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
        assert (7, 50) in found


class TestMinhashJoinVerify:
    def test_join_vs_broadcast_pair_equality(self, ray_session, docs_df):
        """The join-shaped verify (scale path) must produce exactly the same
        pair set + scores as the legacy broadcast verify."""
        import ray.data as rd

        def pairset(df):
            return {
                (a, b): round(s, 9)
                for a, b, s in df[["id_a", "id_b", "score"]].itertuples(index=False)
            }

        j = dedup.minhash_lsh_pairs(
            rd.from_pandas(docs_df), threshold=0.6, verify="join"
        ).to_pandas().drop_duplicates(["id_a", "id_b"])
        b = dedup.minhash_lsh_pairs(
            rd.from_pandas(docs_df), threshold=0.6, verify="broadcast"
        ).to_pandas().drop_duplicates(["id_a", "id_b"])
        assert pairset(j) == pairset(b)
        assert (0, 100) in pairset(j)


class TestEmbeddingBlocked:
    def test_blocked_matches_dense(self, ray_session):
        """Blocked upper-triangle similarity == dense n×n reference."""
        import ray.data as rd

        rng = np.random.default_rng(5)
        V = rng.standard_normal((500, 8))
        df = pd.DataFrame(
            {"vec_id": range(500), "embedding": list(V), "label": [0] * 500}
        )
        got = (
            dedup.embedding_near_dup_pairs(rd.from_pandas(df), threshold=0.8, block_rows=64)
            .to_pandas()
            .drop_duplicates(["id_a", "id_b"])
        )
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = Vn @ Vn.T
        iu, ju = np.triu_indices(500, k=1)
        mask = S[iu, ju] >= 0.8
        exp = set(zip(iu[mask].tolist(), ju[mask].tolist()))
        assert set(map(tuple, got[["id_a", "id_b"]].to_numpy())) == exp
        assert len(exp) > 0  # the test must actually exercise matches

    def test_hot_group_skipped_and_bounded(self, ray_session):
        """A group beyond max_group is skipped (O(n²) guard) while small
        groups still produce pairs; block_rows bounds the peak allocation."""
        import ray.data as rd

        rng = np.random.default_rng(9)
        hot = rng.standard_normal((3000, 4))
        cold = rng.standard_normal((10, 4))
        cold[5] = cold[2] * 1.1  # planted pair in the small group
        df = pd.DataFrame(
            {
                "vec_id": range(3010),
                "embedding": list(np.vstack([hot, cold])),
                "label": [0] * 3000 + [1] * 10,
            }
        )
        pairs = (
            dedup.embedding_near_dup_pairs(
                rd.from_pandas(df), threshold=0.99, max_group=1000, block_rows=128
            )
            .to_pandas()
            .drop_duplicates(["id_a", "id_b"])
        )
        found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
        assert (3002, 3005) in found          # small group still verified
        assert all(a >= 3000 for a, _ in found)  # hot group skipped entirely


class TestStatsOps:
    def test_split_deterministic_and_complete(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import split_bucket, train_test_split

        df = pd.DataFrame({"doc_id": range(1000)})
        out1 = train_test_split(rd.from_pandas(df)).to_pandas()
        out2 = train_test_split(rd.from_pandas(df)).to_pandas()
        m1 = dict(zip(out1.doc_id, out1.split))
        m2 = dict(zip(out2.doc_id, out2.split))
        assert m1 == m2  # deterministic across runs
        counts = out1.split.value_counts()
        assert set(counts.index) == {"train", "val", "test"}
        assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
        assert counts.sum() == 1000  # every row assigned
        # salt changes the assignment
        out3 = train_test_split(rd.from_pandas(df), salt="v2").to_pandas()
        assert dict(zip(out3.doc_id, out3.split)) != m1
        # bucket fn is stable and language-independent (md5)
        assert split_bucket("42") == 2714814184 % 10000

    def test_quantiles_exact_matches_numpy(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import quantiles_exact

        rng = np.random.default_rng(13)
        vals = rng.integers(0, 500, size=5000)
        ds = rd.from_pandas(pd.DataFrame({"v": vals}))
        res = dict(quantiles_exact(ds, "v", [0.25, 0.5, 0.9, 1.0]))
        s = np.sort(vals)
        for q, got in res.items():
            rank = max(int(np.ceil(q * len(s))), 1)
            assert got == s[rank - 1], q

    def test_quantiles_empty(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import quantiles_exact

        ds = rd.from_pandas(pd.DataFrame({"v": pd.array([], dtype="int64")}))
        assert quantiles_exact(ds, "v", [0.5]) == [(0.5, None)]


class TestIvf:
    @pytest.fixture(scope="class")
    def corpus(self):
        rng = np.random.default_rng(21)
        # 4 well-separated clusters + a planted near-dup of one vector
        centers = rng.standard_normal((4, 16)) * 5
        V = np.vstack([c + rng.standard_normal((100, 16)) for c in centers])
        V[250] = V[37] * 1.05 + 0.01  # near-dup across the corpus
        return pd.DataFrame({"vec_id": range(400), "embedding": list(V)})

    def test_train_deterministic(self, ray_session, corpus):
        import ray.data as rd

        from spiderray.stages.ann import ivf_train

        c1 = ivf_train(rd.from_pandas(corpus), n_centroids=8, sample_size=400)
        c2 = ivf_train(rd.from_pandas(corpus), n_centroids=8, sample_size=400)
        assert np.allclose(c1, c2)
        assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)

    def test_assign_covers_all(self, ray_session, corpus):
        import ray.data as rd

        from spiderray.stages.ann import ivf_assign, ivf_train

        C = ivf_train(rd.from_pandas(corpus), n_centroids=8, sample_size=400)
        out = ivf_assign(rd.from_pandas(corpus), C).to_pandas()
        assert len(out) == 400
        assert out["ivf_cell"].between(0, 7).all()
        assert out["ivf_cell"].nunique() > 1  # actually partitions the space

    def test_topk_recalls_planted(self, ray_session, corpus):
        import ray.data as rd

        from spiderray.stages.ann import brute_force_topk, ivf_topk, ivf_train

        q = np.array(corpus.embedding[37], dtype=np.float64)
        C = ivf_train(rd.from_pandas(corpus), n_centroids=8, sample_size=400)
        got = ivf_topk(rd.from_pandas(corpus), q, C, k=5, n_probe=2)
        assert got["vec_id"].iloc[0] == 37
        assert 250 in got["vec_id"].tolist()
        # with full probe it matches brute force exactly
        full = ivf_topk(rd.from_pandas(corpus), q, C, k=5, n_probe=8)
        brute = brute_force_topk(rd.from_pandas(corpus), q, k=5)
        assert full["vec_id"].tolist() == brute["vec_id"].tolist()


class TestIncrementalDedup:
    def _runs(self):
        prior = pd.DataFrame({"doc_id": range(50), "text": [f"doc number {i}" for i in range(50)]})
        # new run: 20 repeats of prior docs + 30 fresh + an internal dup
        new = pd.DataFrame({
            "doc_id": list(range(100, 120)) + list(range(200, 230)) + [300],
            "text": [f"doc number {i}" for i in range(20)]
                    + [f"fresh document {i}" for i in range(30)]
                    + ["fresh document 0"],  # internal dup of doc 200
        })
        return prior, new

    def _fp_ds(self, df):
        import ray.data as rd

        return dedup.exact_dedup(rd.from_pandas(df)).select_columns(["fingerprint"])

    def test_broadcast_and_anti_agree(self, ray_session):
        import ray.data as rd

        prior, new = self._runs()
        prior_fps = self._fp_ds(prior).materialize()
        got_b = dedup.incremental_exact_dedup(
            rd.from_pandas(new), prior_fps, method="broadcast"
        ).to_pandas()
        got_a = dedup.incremental_exact_dedup(
            rd.from_pandas(new), prior_fps, method="anti"
        ).to_pandas()
        ids_b = sorted(got_b.doc_id.astype(int))
        ids_a = sorted(got_a.doc_id.astype(int))
        assert ids_b == ids_a
        # 30 fresh docs survive; prior repeats and the internal dup do not
        assert ids_b == list(range(200, 230))

    def test_empty_prior_keeps_all_winners(self, ray_session):
        import ray.data as rd

        _, new = self._runs()
        empty_prior = self._fp_ds(pd.DataFrame({"doc_id": [], "text": pd.array([], dtype="string")}))
        got = dedup.incremental_exact_dedup(
            rd.from_pandas(new), empty_prior, method="broadcast"
        ).to_pandas()
        # all distinct texts of the new run (internal dedup still applies)
        assert len(got) == 50  # 20 + 30 distinct texts


class TestStratifiedSample:
    def test_rates_and_determinism(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import stratified_sample

        df = pd.DataFrame({"doc_id": range(4000), "lang": ["en", "zh", "fr", "de"] * 1000})
        out1 = stratified_sample(rd.from_pandas(df), "lang",
                                 rate={"en": 0.5, "zh": 0.1}).to_pandas()
        out2 = stratified_sample(rd.from_pandas(df), "lang",
                                 rate={"en": 0.5, "zh": 0.1}).to_pandas()
        assert sorted(out1.doc_id) == sorted(out2.doc_id)  # deterministic
        c = out1.lang.value_counts()
        assert abs(c["en"] - 500) < 80      # ~50% of 1000
        assert abs(c["zh"] - 100) < 50      # ~10% of 1000
        assert c["fr"] == 1000 and c["de"] == 1000  # unlisted strata kept

    def test_membership_stable_under_growth(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import stratified_sample

        small = pd.DataFrame({"doc_id": range(500), "lang": ["en"] * 500})
        big = pd.DataFrame({"doc_id": range(2000), "lang": ["en"] * 2000})
        s_ids = set(stratified_sample(rd.from_pandas(small), "lang", 0.3).to_pandas().doc_id)
        b_ids = set(stratified_sample(rd.from_pandas(big), "lang", 0.3).to_pandas().doc_id)
        assert s_ids == {i for i in b_ids if i < 500}  # growth never flips membership


class TestChunkDedup:
    def test_cdc_properties(self):
        from spiderray.functions.fingerprint import cdc_chunks

        rng = np.random.default_rng(3)
        words = [f"w{i}" for i in range(200)]
        doc = " ".join(rng.choice(words, 500))
        chunks = cdc_chunks(doc)
        assert "".join(chunks) == doc                  # lossless
        assert all(len(c) <= 1024 + 1 for c in chunks)  # max bound
        # edit stability: a front insertion preserves most chunks
        c2 = set(cdc_chunks("INSERTED PREFIX " + doc))
        assert sum(1 for c in chunks if c in c2) >= len(chunks) - 2
        assert cdc_chunks("") == []
        assert cdc_chunks("short") == ["short"]

    def test_cross_doc_duplication_detected(self, ray_session):
        import ray.data as rd

        from spiderray.stages.dedup import chunk_dedup_stats

        rng = np.random.default_rng(11)
        words = [f"tok{i}" for i in range(300)]
        shared = " ".join(rng.choice(words, 400))   # big shared block
        rows = [
            {"doc_id": 1, "text": shared + " unique tail one " + " ".join(rng.choice(words, 50))},
            {"doc_id": 2, "text": "different head two " + shared},
            {"doc_id": 3, "text": " ".join(rng.choice(words, 450))},  # unrelated
        ]
        out = chunk_dedup_stats(rd.from_items(rows)).to_pandas().set_index("doc_id")
        assert out.loc[1, "dup_chunk_ratio"] > 0.5   # mostly the shared block
        assert out.loc[2, "dup_chunk_ratio"] > 0.5
        assert out.loc[3, "dup_chunk_ratio"] < 0.2   # random text, little overlap
        assert (out["n_chunks"] >= 1).all()


class TestSaltedJoin:
    def test_skewed_equals_naive(self, ray_session):
        import ray.data as rd

        from spiderray.stages.joins import hash_join, salted_join

        # 90% of left rows share key 7 (the skew case)
        left = pd.DataFrame({
            "k": [7] * 900 + list(range(100)),
            "lval": range(1000),
        })
        right = pd.DataFrame({"rk": range(100), "rval": [v * 10 for v in range(100)]})

        naive = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                          on="k", right_on="rk", num_partitions=4).to_pandas()
        salted = salted_join(rd.from_pandas(left), rd.from_pandas(right),
                             on="k", right_on="rk", num_partitions=4,
                             n_salts=4).to_pandas()
        key = lambda df: sorted(map(tuple, df[["k", "lval", "rval"]].to_numpy()))
        assert key(salted) == key(naive)
        assert len(salted) == 1000  # every left row matched

    def test_no_hot_keys_falls_through(self, ray_session):
        import ray.data as rd

        from spiderray.stages.joins import salted_join

        left = pd.DataFrame({"k": list(range(50)) * 2, "lval": range(100)})
        right = pd.DataFrame({"rk": range(50), "rval": range(50)})
        out = salted_join(rd.from_pandas(left), rd.from_pandas(right),
                          on="k", right_on="rk", num_partitions=4).to_pandas()
        assert len(out) == 100

    def test_explicit_hot_keys(self, ray_session):
        import ray.data as rd

        from spiderray.stages.joins import salted_join

        left = pd.DataFrame({"k": [1] * 20 + [2] * 5, "lval": range(25)})
        right = pd.DataFrame({"rk": [1, 2], "rval": [10, 20]})
        out = salted_join(rd.from_pandas(left), rd.from_pandas(right),
                          on="k", right_on="rk", hot_keys={1}, n_salts=3).to_pandas()
        assert len(out) == 25
        assert (out.loc[out.k == 1, "rval"] == 10).all()


class TestBloomFilter:
    def test_no_false_negatives_and_low_fp(self):
        from spiderray.functions.bloom import BloomFilter

        keys = [f"{i:032x}" for i in range(50_000)]
        bf = BloomFilter(len(keys))
        bf.add_many(keys)
        assert bf.contains_many(keys).all()  # never a false negative
        absent = [f"{i + 10_000_000:032x}" for i in range(50_000)]
        assert bf.contains_many(absent).mean() < 0.02  # ~1% design FP

    def test_mixed_key_types(self):
        from spiderray.functions.bloom import BloomFilter

        bf = BloomFilter(100)
        bf.add_many([1, "two", b"three", "0" * 32])
        assert bf.contains_many([1, "two", b"three", "0" * 32]).all()
        assert not bf.contains_many([99]).any() or True  # may FP; no crash

    def test_bloom_mode_matches_anti(self, ray_session):
        import ray.data as rd

        prior = pd.DataFrame({"doc_id": range(200), "text": [f"doc number {i}" for i in range(200)]})
        new = pd.DataFrame({
            "doc_id": list(range(1000, 1100)),
            "text": [f"doc number {i}" for i in range(50)]       # 50 dups
                  + [f"fresh document {i}" for i in range(50)],  # 50 new
        })
        prior_fps = dedup.exact_dedup(rd.from_pandas(prior)).select_columns(["fingerprint"]).materialize()
        a = dedup.incremental_exact_dedup(rd.from_pandas(new), prior_fps, method="anti").to_pandas()
        b = dedup.incremental_exact_dedup(rd.from_pandas(new), prior_fps, method="bloom").to_pandas()
        assert sorted(a.doc_id) == sorted(b.doc_id) == list(range(1050, 1100))


class TestGroupedQuantiles:
    def test_matches_numpy_per_group(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import grouped_quantiles_exact

        rng = np.random.default_rng(41)
        df = pd.DataFrame({
            "g": np.repeat(["a", "b", "c"], 1000),
            "v": np.concatenate([rng.integers(0, 100, 1000),
                                 rng.integers(500, 600, 1000),
                                 rng.integers(0, 10, 1000)]),
        })
        out = grouped_quantiles_exact(rd.from_pandas(df), "g", "v", [0.5, 0.9]).to_pandas()
        for g in ("a", "b", "c"):
            s = np.sort(df.loc[df.g == g, "v"].to_numpy())
            for q in (0.5, 0.9):
                rank = max(int(np.ceil(q * len(s))), 1)
                got = out[(out.g == g) & (out.q_pct == int(q * 100))].v.iloc[0]
                assert got == s[rank - 1], (g, q)


class TestChunkDedupDistinctDocs:
    def test_internal_repeat_not_cross_doc_dup(self, ray_session):
        """A chunk repeating INSIDE one doc (shared with nobody) must score
        dup_ratio 0 — counts are per-distinct-document (regression)."""
        import ray.data as rd

        from spiderray.stages.dedup import chunk_dedup_stats

        blob = "repeated paragraph body " * 8
        rows = [{"doc_id": 1, "text": blob + blob},
                {"doc_id": 2, "text": "completely different words " * 10}]
        out = chunk_dedup_stats(rd.from_items(rows), min_size=32, avg_size=64,
                                max_size=128).to_pandas().set_index("doc_id")
        assert out.loc[1, "dup_chunk_ratio"] == 0.0


class TestIncrementalStringIds:
    def test_all_modes_with_string_ids(self, ray_session):
        import ray.data as rd

        prior = pd.DataFrame({"doc_id": [f"p{i}" for i in range(40)],
                              "text": [f"doc {i}" for i in range(40)]})
        new = pd.DataFrame({"doc_id": [f"n{i}" for i in range(30)],
                            "text": [f"doc {i}" for i in range(15)]
                                  + [f"fresh {i}" for i in range(15)]})
        pf = dedup.exact_dedup(rd.from_pandas(prior)).select_columns(["fingerprint"]).materialize()
        for method in ("anti", "bloom", "broadcast"):
            out = dedup.incremental_exact_dedup(rd.from_pandas(new), pf, method=method).to_pandas()
            assert sorted(out.doc_id) == [f"n{i}" for i in range(15, 30)], method


class TestDistributedBloom:
    def test_bit_identical_and_wired(self, ray_session):
        import ray.data as rd

        from spiderray.functions.bloom import BloomFilter, build_bloom_distributed

        keys = [f"{i * 31:032x}" for i in range(30_000)]
        ds = rd.from_pandas(pd.DataFrame({"fingerprint": keys})).repartition(6)
        dist = build_bloom_distributed(ds, "fingerprint", len(keys))
        driver = BloomFilter(len(keys))
        driver.add_many(keys)
        assert (dist.bits == driver.bits).all()
        assert dist.contains_many(keys).all()

    def test_bloom_mode_uses_it(self, ray_session):
        import ray.data as rd

        prior = pd.DataFrame({"doc_id": range(300), "text": [f"doc {i}" for i in range(300)]})
        new = pd.DataFrame({"doc_id": range(1000, 1040),
                            "text": [f"doc {i}" for i in range(20)]
                                  + [f"fresh {i}" for i in range(20)]})
        pf = dedup.exact_dedup(rd.from_pandas(prior)).select_columns(["fingerprint"]).materialize()
        out = dedup.incremental_exact_dedup(rd.from_pandas(new), pf, method="bloom").to_pandas()
        assert sorted(out.doc_id) == list(range(1020, 1040))


class TestAdviceR2Regressions:
    """Round-3 regression tests for the three ADVICE r2 findings."""

    def test_bloom_mixed_hex_lengths_batch_independent(self):
        # bloom.py fast path: a batch mixing 16- and 48-char hex strings
        # whose total length sums to n*16 must NOT take the bulk reshape —
        # each key's hash must be identical alone vs in the mixed batch.
        from spiderray.functions.bloom import _key_hashes

        k16, k48 = "a" * 16, "b" * 48
        mixed = [k16, k48]  # total 64 chars = 2*32 → old fast path misfired
        alone = [_key_hashes([k16])[0], _key_hashes([k48])[0]]
        got = _key_hashes(mixed)
        assert got[0] == alone[0] and got[1] == alone[1]

        # and a genuine all-32-hex batch still takes the (identical) fast path
        hexes = [f"{i:032x}" for i in range(100)]
        bulk = _key_hashes(hexes)
        for i in (0, 37, 99):
            assert bulk[i] == _key_hashes([hexes[i]])[0]

    def test_chunk_dedup_split_document_batches(self, ray_session):
        # first_in_doc is computed in explode() where document boundaries
        # are guaranteed; re-blocking downstream must not double-count an
        # intra-document repeat as 2 docs.  Simulate the hostile re-blocking
        # by forcing tiny downstream batches via many small input blocks.
        import ray.data as rd

        from spiderray.stages.dedup import chunk_dedup_stats

        blob = "repeated paragraph body " * 8
        rows = [{"doc_id": 1, "text": blob * 6}] + [
            {"doc_id": i, "text": f"unique words for document {i} " * 12}
            for i in range(2, 10)
        ]
        out = (
            chunk_dedup_stats(
                rd.from_items(rows).repartition(5),
                min_size=32, avg_size=64, max_size=128,
            )
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[1, "dup_chunk_ratio"] == 0.0

    def test_simhash_batch_endian_explicit(self):
        # astype('>u8') path: parity with the scalar simhash64 regardless of
        # host byte order (the scalar path is already endian-explicit).
        texts = ["the quick brown fox", "jumps over the lazy dog", "", "a b a b a"]
        batch = fp.simhash64_batch(texts)
        for t, h in zip(texts, batch):
            assert int(h) == fp.simhash64(t), t


class TestNgramJoinVerify:
    """Round-3: n-gram Jaccard band rows no longer carry the gram sets;
    verify re-acquires grams via broadcast or join (minhash r1's cure)."""

    def _docs(self):
        rng = np.random.default_rng(7)
        words = [f"w{i}" for i in range(200)]
        rows = []
        for i in range(60):
            body = " ".join(rng.choice(words, 30))
            rows.append({"doc_id": 2 * i, "text": body})
            if i < 15:  # planted near-dup: one word changed
                toks = body.split()
                toks[5] = "CHANGED"
                rows.append({"doc_id": 2 * i + 1, "text": " ".join(toks)})
        return pd.DataFrame(rows)

    def test_modes_agree_and_find_planted(self, ray_session):
        import ray.data as rd

        docs = self._docs()
        out = {}
        for mode in ("broadcast", "join"):
            p = dedup.ngram_jaccard_pairs(
                rd.from_pandas(docs), threshold=0.5, verify=mode
            ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
            out[mode] = p
        a, b = out["broadcast"], out["join"]
        assert list(a.id_a) == list(b.id_a) and list(a.id_b) == list(b.id_b)
        assert np.allclose(a.score.to_numpy(), b.score.to_numpy())
        planted = {(2 * i, 2 * i + 1) for i in range(15)}
        found = set(zip(a.id_a, a.id_b))
        assert planted <= found

    def test_band_rows_carry_no_grams(self, ray_session):
        # the exploded band-row schema must be exactly (part, band,
        # band_key, id) — shuffle bytes per doc independent of bands
        import inspect

        src = inspect.getsource(dedup.ngram_jaccard_pairs)
        assert '"grams": pa.array' in src  # gram table exists...
        assert "np.repeat(ids, bands)" in src  # ...but explode emits ids only
        # structural check on the live explode output
        import pyarrow as pa

        from spiderray.functions import fingerprint as fpr

        tbl = pa.table({"doc_id": [1], "grams": [fpr.ngram_set("a b c d e", 3).tobytes()]})
        # reproduce the explode schema via a tiny run
        import ray.data as rd

        pairs_input = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2], "text": ["a b c d e f g h i", "a b c d e f g h i"]}))
        p = dedup.ngram_jaccard_pairs(pairs_input, threshold=0.5).to_pandas()
        assert set(p.columns) == {"id_a", "id_b", "score"}
        # a pair may surface once per coarse part (consumer dedups — same
        # contract as minhash_lsh_pairs); the distinct pair is unique
        distinct = p.drop_duplicates(subset=["id_a", "id_b"])
        assert len(distinct) == 1 and distinct.score.iloc[0] == 1.0


class TestMinhashSigStore:
    def test_persisted_sigs_match_materialized(self, ray_session, tmp_path):
        """sig_store_dir: signatures written to parquet and re-read must
        produce the identical pair set + scores as the in-object-store
        path (round-3 scale item: object-store footprint independent of
        corpus size)."""
        import ray.data as rd

        rng = np.random.default_rng(13)
        words = [f"tok{i}" for i in range(300)]
        rows = []
        for i in range(80):
            body = " ".join(rng.choice(words, 40))
            rows.append({"doc_id": 2 * i, "text": body})
            if i % 4 == 0:
                rows.append({"doc_id": 2 * i + 1, "text": body + " extra"})
        docs = pd.DataFrame(rows)
        key = ["id_a", "id_b"]
        a = (dedup.minhash_lsh_pairs(rd.from_pandas(docs), threshold=0.6, verify="join")
             .to_pandas().drop_duplicates(subset=key).sort_values(key).reset_index(drop=True))
        b = (dedup.minhash_lsh_pairs(rd.from_pandas(docs), threshold=0.6, verify="join",
                                     sig_store_dir=str(tmp_path / "sigs"))
             .to_pandas().drop_duplicates(subset=key).sort_values(key).reset_index(drop=True))
        assert a[key].equals(b[key])
        assert np.allclose(a.score.to_numpy(), b.score.to_numpy())
        assert (tmp_path / "sigs").exists() and any((tmp_path / "sigs").iterdir())


class TestQuantileFloatGuard:
    def test_float_column_rejected_loudly(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import grouped_quantiles_exact, quantiles_exact

        ds = rd.from_pandas(pd.DataFrame({"g": ["a"] * 10, "v": np.linspace(0, 1, 10)}))
        with pytest.raises(TypeError, match="integer domain"):
            quantiles_exact(ds, "v", [0.5])
        with pytest.raises(TypeError, match="integer domain"):
            grouped_quantiles_exact(ds, "g", "v", [0.5]).to_pandas()

    def test_int_path_unchanged(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import quantiles_exact

        vals = np.arange(1, 101, dtype=np.int64)
        ds = rd.from_pandas(pd.DataFrame({"v": vals}))
        out = dict(quantiles_exact(ds, "v", [0.5, 0.9]))
        assert out[0.5] == 50 and out[0.9] == 90

    def test_approx_bounded_error(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import quantiles_approx

        rng = np.random.default_rng(5)
        vals = rng.normal(100.0, 15.0, 20_000)
        ds = rd.from_pandas(pd.DataFrame({"v": vals}))
        n_bins = 4096
        width = (vals.max() - vals.min()) / n_bins
        s = np.sort(vals)
        for q, est in quantiles_approx(ds, "v", [0.1, 0.5, 0.99], n_bins=n_bins):
            rank = max(int(np.ceil(q * len(s))), 1)
            true = s[rank - 1]
            assert abs(est - true) <= width + 1e-9, (q, est, true, width)


class TestBucketedJoinNullColumn:
    def test_all_null_data_column_survives(self, ray_session):
        """A legitimately all-null column on one side must survive the
        bucketed join (regression: union-unpadding via dropna dropped it)."""
        import ray.data as rd

        from spiderray.stages.joins import bucketed_join

        left = rd.from_pandas(pd.DataFrame({
            "k": [1, 2, 3], "lval": [10, 20, 30],
            "maybe": pd.array([None, None, None], dtype="Int64"),
        }))
        right = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3], "rval": [7, 8, 9]}))
        out = bucketed_join(left, right, on="k").to_pandas().sort_values("k")
        assert "maybe" in out.columns
        assert out["maybe"].isna().all()
        assert list(out["rval"]) == [7, 8, 9]


class TestBm25:
    def test_matches_serial_reference(self, ray_session):
        import math

        import ray.data as rd

        from spiderray.stages.textindex import bm25_topk

        docs = pd.DataFrame({
            "doc_id": range(8),
            "text": [
                "stream join hash stream",
                "hash table build probe",
                "stream stream stream",
                "unrelated words entirely different",
                "",
                "join join join hash",
                "a b c d e f g h i j k l m n o p stream",
                "hash",
            ],
        })
        out = bm25_topk(rd.from_pandas(docs), ["stream", "hash"], k=5,
                        k1=1.5, b=0.75)
        # serial reference with identical arithmetic
        toks = [t.split() for t in docs.text]
        n = len(docs)
        avgdl = sum(len(t) for t in toks) / n
        dfs = {q: sum(1 for t in toks if q in t) for q in ("stream", "hash")}
        exp = {}
        for i, t in enumerate(toks):
            if not t:
                continue
            s = 0.0
            for q in ("stream", "hash"):
                tf = t.count(q)
                if tf:
                    idf = math.log(1 + (n - dfs[q] + 0.5) / (dfs[q] + 0.5))
                    s += idf * (tf * 2.5) / (tf + 1.5 * (0.25 + 0.75 * len(t) / avgdl))
            if s > 0:
                exp[i] = s
        top = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        assert list(out.doc_id) == [i for i, _ in top]
        assert np.allclose(out.score.to_numpy(), [s for _, s in top])

    def test_df_pruned_to_query(self, ray_session):
        import ray.data as rd

        from spiderray.stages.textindex import term_doc_freqs

        docs = pd.DataFrame({"doc_id": range(4),
                             "text": ["a b a", "b c", "c", "a c c"]})
        df = term_doc_freqs(rd.from_pandas(docs), ["a", "c"]).to_pandas()
        assert dict(zip(df.term, df.df)) == {"a": 2, "c": 3}


class TestQuantilesApproxNan:
    def test_nan_rows_ignored(self, ray_session):
        """NaNs must be ignored (np.nanquantile semantics), not cast to
        undefined int64 and counted in bin 0 (round-3 review finding)."""
        import ray.data as rd

        from spiderray.stages.stats import quantiles_approx

        rng = np.random.default_rng(9)
        vals = rng.normal(50.0, 5.0, 10_000)
        with_nan = np.concatenate([vals, np.full(2_000, np.nan)])
        rng.shuffle(with_nan)
        ds = rd.from_pandas(pd.DataFrame({"v": with_nan}))
        n_bins = 2048
        width = (np.nanmax(with_nan) - np.nanmin(with_nan)) / n_bins
        s = np.sort(vals)
        for q, est in quantiles_approx(ds, "v", [0.1, 0.5, 0.9], n_bins=n_bins):
            rank = max(int(np.ceil(q * len(s))), 1)
            assert abs(est - s[rank - 1]) <= width + 1e-9, q


class TestAsofRangeJoins:
    def test_asof_backward_semantics(self, ray_session):
        import ray.data as rd

        from spiderray.stages.joins import asof_join

        left = rd.from_pandas(pd.DataFrame({
            "t": [10, 20, 30, 5], "k": ["a", "a", "b", "b"], "lv": [1, 2, 3, 4],
        }))
        right = rd.from_pandas(pd.DataFrame({
            "t": [8, 15, 15, 25], "k": ["a", "a", "a", "b"],
            "rv": [100, 200, 201, 300], "rt": [8, 15, 15, 25],
        }))
        out = (asof_join(left, right, on="t", by="k", right_tiebreak="rv")
               .to_pandas().sort_values("lv").reset_index(drop=True))
        # lv=1 (a,10) -> rv 100 (t=8); lv=2 (a,20) -> tie at t=15 -> rv 201;
        # lv=3 (b,30) -> rv 300; lv=4 (b,5) -> no prior row -> dropped
        assert list(out.lv) == [1, 2, 3]
        assert list(out.rv.astype(int)) == [100, 201, 300]

    def test_asof_overlapping_columns_rejected(self, ray_session):
        import ray.data as rd

        from spiderray.stages.joins import asof_join

        l = rd.from_pandas(pd.DataFrame({"t": [1], "k": [1], "v": [1]}))
        r = rd.from_pandas(pd.DataFrame({"t": [1], "k": [1], "v": [2]}))
        with pytest.raises(ValueError, match="overlapping"):
            asof_join(l, r, on="t", by="k")

    def test_range_join_exact_once_across_buckets(self, ray_session):
        """An interval spanning several buckets must pair each contained
        point exactly once (replication covers the span, the point's single
        bucket dedups)."""
        import ray.data as rd

        from spiderray.stages.joins import range_join

        pts = rd.from_pandas(pd.DataFrame({
            "p": [5, 15, 25, 35, 45, 55], "pid": range(6),
        }))
        ivs = rd.from_pandas(pd.DataFrame({
            "s": [0, 12], "e": [52, 28], "iid": [0, 1],  # iid 0 spans 6 buckets
        }))
        out = range_join(pts, ivs, "p", "s", "e", bucket_width=10).to_pandas()
        pairs = sorted(zip(out.pid.astype(int), out.iid.astype(int)))
        assert pairs == [(0, 0), (1, 0), (1, 1), (2, 0), (2, 1), (3, 0), (4, 0)]
        assert len(pairs) == len(set(pairs))  # exactly once

    def test_range_join_inclusive_bounds(self, ray_session):
        import ray.data as rd

        from spiderray.stages.joins import range_join

        pts = rd.from_pandas(pd.DataFrame({"p": [10, 20], "pid": [0, 1]}))
        ivs = rd.from_pandas(pd.DataFrame({"s": [10], "e": [20], "iid": [7]}))
        out = range_join(pts, ivs, "p", "s", "e", bucket_width=7).to_pandas()
        assert sorted(out.pid.astype(int)) == [0, 1]


class TestReviewR3bRegressions:
    """Second round-3 review pass: join/quantile edge semantics."""

    def test_asof_null_data_column_match_survives(self, ray_session):
        import ray.data as rd

        from spiderray.stages.joins import asof_join

        left = rd.from_pandas(pd.DataFrame({"t": [10], "k": [1], "lv": [1]}))
        right = rd.from_pandas(pd.DataFrame(
            {"t": [5], "k": [1], "rv": pd.array([None], dtype="Float64")}))
        out = asof_join(left, right, on="t", by="k").to_pandas()
        assert len(out) == 1  # matched even though rv is null
        assert pd.isna(out.rv.iloc[0])

    def test_asof_right_side_keys_only(self, ray_session):
        # 'does a prior event exist' use: right carries ONLY (on, by)
        import ray.data as rd

        from spiderray.stages.joins import asof_join

        left = rd.from_pandas(pd.DataFrame({"t": [10, 1], "k": [1, 1], "lv": [1, 2]}))
        right = rd.from_pandas(pd.DataFrame({"t": [5], "k": [1]}))
        out = asof_join(left, right, on="t", by="k").to_pandas()
        assert list(out.lv) == [1]  # t=1 has no prior row

    def test_asof_null_on_rows_never_match(self, ray_session):
        import ray.data as rd

        from spiderray.stages.joins import asof_join

        left = rd.from_pandas(pd.DataFrame(
            {"t": pd.array([10, None], dtype="Int64"), "k": [1, 1], "lv": [1, 2]}))
        right = rd.from_pandas(pd.DataFrame({"t": [5], "k": [1], "rv": [9]}))
        out = asof_join(left, right, on="t", by="k").to_pandas()
        assert list(out.lv) == [1]

    def test_range_join_inverted_interval_empty(self, ray_session):
        import ray.data as rd

        from spiderray.stages.joins import range_join

        pts = rd.from_pandas(pd.DataFrame({"p": [30], "pid": [0]}))
        ivs = rd.from_pandas(pd.DataFrame({"s": [50, 20], "e": [20, 40],
                                           "iid": [0, 1]}))
        out = range_join(pts, ivs, "p", "s", "e", bucket_width=10).to_pandas()
        assert list(out.iid.astype(int)) == [1]  # inverted interval matches nothing

    def test_quantiles_approx_inf_ignored(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import quantiles_approx

        vals = np.concatenate([np.linspace(0, 100, 1000), [np.inf, -np.inf, np.nan]])
        ds = rd.from_pandas(pd.DataFrame({"v": vals}))
        out = dict(quantiles_approx(ds, "v", [0.5], n_bins=1000))
        assert np.isfinite(out[0.5]) and abs(out[0.5] - 50) < 1.0


class TestDecontaminate:
    def _corpus(self):
        import ray.data as rd

        docs = [
            {"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta"},
            {"doc_id": 2, "text": "one two three four five six seven"},
            {"doc_id": 3, "text": "totally different words here now ok"},
            {"doc_id": 4, "text": ""},
        ]
        bench = [{"text": "x alpha beta gamma delta epsilon zeta y"},
                 {"text": "unrelated eval prompt entirely"}]
        return rd.from_items(docs), rd.from_items(bench)

    def test_flag_counts(self, ray_session):
        ds, bench = self._corpus()
        out = dedup.decontaminate(ds, bench, n=3).to_pandas().set_index("doc_id")
        # doc 1 shares all four of its 3-grams with the bench superstring
        assert out.loc[1, "overlap_grams"] == 4 and bool(out.loc[1, "contaminated"])
        assert not out.loc[[2, 3, 4], "contaminated"].any()
        assert len(out) == 4  # flag mode keeps every row

    def test_filter_drops(self, ray_session):
        ds, bench = self._corpus()
        out = dedup.decontaminate(ds, bench, n=3, mode="filter").to_pandas()
        assert sorted(out.doc_id.tolist()) == [2, 3, 4]

    def test_empty_bench_flags_nothing(self, ray_session):
        import ray.data as rd

        ds, _ = self._corpus()
        bench = rd.from_items([{"text": ""}])
        out = dedup.decontaminate(ds, bench, n=3).to_pandas()
        assert not out.contaminated.any()

    def test_bench_cap_raises(self, ray_session):
        ds, bench = self._corpus()
        with pytest.raises(ValueError, match="corpus, not an eval set"):
            dedup.decontaminate(ds, bench, n=3, max_bench_grams=2)

    def test_bad_mode_raises(self, ray_session):
        ds, bench = self._corpus()
        with pytest.raises(ValueError, match="mode"):
            dedup.decontaminate(ds, bench, mode="drop")


class TestSemanticDedup:
    def test_planted_copies_dropped(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(11)
        V = rng.normal(size=(60, 16))
        rows = [{"vec_id": i, "embedding": V[i].tolist()} for i in range(60)]
        # planted near-copies of vecs 0..4 at ids 100..104
        for i in range(5):
            w = V[i] + 0.03 * np.roll(V[i], 1)
            rows.append({"vec_id": 100 + i, "embedding": w.tolist()})
        kept = dedup.semantic_dedup(
            rd.from_items(rows), n_clusters=4, iters=3, threshold=0.95
        ).to_pandas()
        kept_ids = set(kept.vec_id.tolist())
        # every original survives (min-id representative), every copy goes
        assert set(range(60)) <= kept_ids
        assert not kept_ids & {100, 101, 102, 103, 104}

    def test_no_pairs_is_identity(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(12)
        rows = [{"vec_id": i, "embedding": rng.normal(size=16).tolist()}
                for i in range(40)]
        kept = dedup.semantic_dedup(
            rd.from_items(rows), n_clusters=4, iters=2, threshold=0.99
        ).to_pandas()
        assert sorted(kept.vec_id.tolist()) == list(range(40))


class TestGroupedQuantilesApprox:
    def test_error_bound_vs_exact(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from spiderray.stages.stats import grouped_quantiles_approx

        rng = np.random.default_rng(3)
        df = pd.DataFrame({
            "k": rng.integers(0, 5, size=20_000),
            "v": rng.normal(scale=100.0, size=20_000),
        })
        qs = [0.1, 0.5, 0.9]
        out = grouped_quantiles_approx(
            rd.from_pandas(df), "k", "v", qs, n_bins=512
        ).to_pandas().set_index(["k", "q_pct"])
        for k, sub in df.groupby("k"):
            vals = np.sort(sub["v"].to_numpy())
            bound = (vals[-1] - vals[0]) / 512
            for q in qs:
                rank = max(int(np.ceil(q * len(vals))), 1)
                exact = vals[rank - 1]
                approx = out.loc[(k, int(q * 100)), "v"]
                assert abs(approx - exact) <= bound + 1e-9, (k, q)


    def test_null_group_key_ignored(self, ray_session):
        # review regression: a null key must be ignored (like the exact
        # sibling), not KeyError the whole query
        import pandas as pd
        import ray.data as rd

        from spiderray.stages.stats import grouped_quantiles_approx

        df = pd.DataFrame({"k": ["a", "a", None, "b"],
                           "v": [1.0, 2.0, 5.0, 3.0]})
        out = grouped_quantiles_approx(
            rd.from_pandas(df), "k", "v", [0.5], n_bins=8
        ).to_pandas()
        assert sorted(out["k"].tolist()) == ["a", "b"]

    def test_constant_and_nonfinite(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from spiderray.stages.stats import grouped_quantiles_approx

        df = pd.DataFrame({
            "k": ["a"] * 4 + ["b"] * 4,
            "v": [7.0, 7.0, 7.0, np.nan, 1.0, 2.0, np.inf, 4.0],
        })
        out = grouped_quantiles_approx(
            rd.from_pandas(df), "k", "v", [0.5], n_bins=16
        ).to_pandas().set_index("k")
        assert out.loc["a", "v"] == 7.0  # constant group returns the value
        # group b ignores the inf: median over {1,2,4} within bound of 2
        assert abs(out.loc["b", "v"] - 2.0) <= (4.0 - 1.0) / 16 + 1e-9


class TestPrepareCorpusComposition:
    def test_gopher_and_decontam_fold_into_keepdrop(self, ray_session):
        import ray.data as rd

        from spiderray.pipelines.prepare_corpus import prepare_corpus

        good = ("the be to of and that have with " + " ".join(
            f"word{i} term{i} item{i}" for i in range(20)))
        gopher_bad = "the be to of and that have with " + "same same " * 40
        rows = [
            {"doc_id": 1, "text": good},
            {"doc_id": 2, "text": gopher_bad},       # top-2gram repetition
            {"doc_id": 3, "text": good + " tail."},  # contaminated vs bench
        ]
        bench = rd.from_items([{"text": good}])
        out = prepare_corpus(
            rd.from_items(rows), gopher=True,
            decontaminate_bench=bench, decontam_ngram=8,
        ).to_pandas().set_index("doc_id")
        assert out.loc[2, "drop_reason"].startswith("gopher:")
        assert not bool(out.loc[2, "keep"])
        # docs 1 and 3 share 8-grams with the bench -> contaminated
        # (unless the spider decide already dropped them for another reason)
        for i in (1, 3):
            assert not bool(out.loc[i, "keep"])
            assert out.loc[i, "drop_reason"] in ("contaminated",) or \
                out.loc[i, "drop_reason"] != ""

    def test_defaults_unchanged(self, ray_session):
        import ray.data as rd

        from spiderray.pipelines.prepare_corpus import prepare_corpus

        rows = [{"doc_id": i, "text": f"plain text number {i} runs here"}
                for i in range(20)]
        a = prepare_corpus(rd.from_items(rows)).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        assert "overlap_grams" not in a.columns
        assert set(a.columns) >= {"doc_id", "lang", "keep", "drop_reason",
                                  "quality_score", "ws_tokens", "split", "text"}


class TestHeavyHitters:
    """stages/stats.heavy_hitters — exact heavy hitters via Misra-Gries
    partial summaries + bounded candidate recount."""

    def test_matches_exact_counts_under_compression(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import heavy_hitters

        rng = np.random.default_rng(7)
        vocab = np.array([f"v{i}" for i in range(20000)], dtype=object)
        items = vocab[rng.integers(0, 20000, size=80000)]
        heavies = np.repeat(
            np.array(["hotA", "hotB", "hotC"], dtype=object), [3000, 700, 260]
        )
        allitems = np.concatenate([items, heavies])
        rng.shuffle(allitems)
        # sketch (1024) ≪ per-batch vocabulary → the MG compression path runs
        ds = rd.from_pandas(pd.DataFrame({"v": allitems})).repartition(8)
        out = heavy_hitters(ds, "v", min_count=200, sketch_size=1024).to_pandas()
        s = pd.Series(allitems).value_counts()
        expect = s[s >= 200].sort_index().rename_axis("item")
        got = out.set_index("item")["n"].sort_index()
        assert got.equals(expect)

    def test_batch_composition_independent(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import heavy_hitters

        rng = np.random.default_rng(11)
        items = np.array(
            ["a"] * 500 + ["b"] * 120 + [f"t{i}" for i in rng.integers(0, 3000, size=6000)],
            dtype=object,
        )
        rng.shuffle(items)
        df = pd.DataFrame({"v": items})
        a = heavy_hitters(rd.from_pandas(df).repartition(2), "v",
                          min_count=100, sketch_size=512).to_pandas()
        b = heavy_hitters(rd.from_pandas(df).repartition(13), "v",
                          min_count=100, sketch_size=512).to_pandas()
        key = lambda d: sorted(map(tuple, d[["item", "n"]].to_numpy()))
        assert key(a) == key(b)
        assert set(a["item"]) == {"a", "b"}

    def test_guarantee_violation_raises(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import heavy_hitters

        items = np.array([f"u{i}" for i in range(5000)], dtype=object)
        ds = rd.from_pandas(pd.DataFrame({"v": items}))
        with pytest.raises(ValueError, match="sketch_size"):
            heavy_hitters(ds, "v", min_count=3, sketch_size=64).to_pandas()

    def test_mg_compress_bound(self):
        from spiderray.stages.stats import _mg_compress

        rng = np.random.default_rng(3)
        counts = rng.integers(1, 50, size=1000)
        items = np.array([f"i{k}" for k in range(1000)], dtype=object)
        kept, w = _mg_compress(items, counts, 64)
        assert len(kept) <= 64
        pivot = np.sort(counts)[::-1][64]
        true = dict(zip(items, counts))
        for it, wt in zip(kept, w):
            # each kept weight underestimates by exactly the pivot
            assert wt == true[it] - pivot > 0

    def test_non_string_column_casts(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import heavy_hitters

        df = pd.DataFrame({"v": [7] * 40 + [9] * 5})
        out = heavy_hitters(rd.from_pandas(df), "v", min_count=10).to_pandas()
        assert list(out["item"]) == ["7"] and list(out["n"]) == [40]


class TestTemperatureResample:
    def test_rebalances_toward_alpha_distribution(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import temperature_resample

        rng = np.random.default_rng(21)
        langs = np.array(["en"] * 8000 + ["fr"] * 1000 + ["sw"] * 250, dtype=object)
        df = pd.DataFrame({"doc_id": np.arange(len(langs)), "lang": langs})
        out = temperature_resample(
            rd.from_pandas(df).repartition(6), "lang", "doc_id", alpha=0.5
        ).to_pandas()
        got = out["lang"].value_counts()
        # smallest key keeps everything
        assert got["sw"] == 250
        # expected keeps: n * sqrt(n_min/n) = sqrt(n_min * n)
        for lang, n in (("en", 8000), ("fr", 1000)):
            expect = (250 * n) ** 0.5
            assert abs(got[lang] - expect) / expect < 0.15, (lang, got[lang], expect)
        # deterministic: same membership on a different partitioning
        out2 = temperature_resample(
            rd.from_pandas(df).repartition(13), "lang", "doc_id", alpha=0.5
        ).to_pandas()
        assert set(out["doc_id"]) == set(out2["doc_id"])

    def test_alpha_one_keeps_everything(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import temperature_resample

        df = pd.DataFrame({"doc_id": np.arange(300),
                           "lang": np.array(["a"] * 200 + ["b"] * 100, dtype=object)})
        out = temperature_resample(rd.from_pandas(df), "lang", "doc_id",
                                   alpha=1.0).to_pandas()
        assert len(out) == 300  # rate = (n_min/n)^0 = 1 for every key


class TestPrepareCorpusNewSteps:
    """compression_gate / domain_cap / temperature opt-in composition."""

    def _base_rows(self, n=60):
        good = ("the be to of and that have with " + " ".join(
            f"word{i} term{i} item{i}" for i in range(20)))
        return [{"doc_id": i, "source": f"s{i % 3}",
                 "text": good + f" tail{i}."} for i in range(n)]

    def test_compression_gate_demotes_spam_and_noise(self, ray_session):
        import hashlib

        import ray.data as rd

        from spiderray.pipelines.prepare_corpus import prepare_corpus

        rows = self._base_rows(10)
        rows[3]["text"] = "spam " * 300
        noise = "".join(
            bytes(33 + b % 94 for b in hashlib.md5(bytes([k])).digest()).decode()
            for k in range(64))
        rows[5]["text"] = noise
        out = prepare_corpus(rd.from_items(rows), compression_gate=True
                             ).to_pandas().set_index("doc_id")
        assert out.loc[3, "drop_reason"] in ("compression:repetitive",) or             not bool(out.loc[3, "keep"])
        assert not bool(out.loc[5, "keep"])
        # an untouched row keeps whatever the spider decide said
        assert "compression" not in out.loc[7, "drop_reason"]

    def test_domain_cap_keeps_at_most_k_per_source(self, ray_session):
        import ray.data as rd

        from spiderray.pipelines.prepare_corpus import prepare_corpus

        out = prepare_corpus(rd.from_items(self._base_rows(60)),
                             domain_cap=5).to_pandas()
        kept = out[out.keep]
        assert (kept.groupby("source").size() <= 5).all()
        capped = out[out.drop_reason == "domain_cap"]
        assert len(capped) > 0 and not capped.keep.any()
        # deterministic across partitionings
        out2 = prepare_corpus(
            rd.from_items(self._base_rows(60)).repartition(7), domain_cap=5
        ).to_pandas()
        assert set(out[out.keep].doc_id) == set(out2[out2.keep].doc_id)

    def test_domain_cap_join_path_matches_broadcast(self, ray_session):
        import ray.data as rd

        from spiderray.pipelines.prepare_corpus import prepare_corpus

        rows = self._base_rows(40)
        a = prepare_corpus(rd.from_items(rows), domain_cap=4).to_pandas()
        b = prepare_corpus(rd.from_items(rows), domain_cap=4,
                           broadcast_max_losers=1).to_pandas()
        ka = a.sort_values("doc_id")[["doc_id", "keep", "drop_reason"]]
        kb = b.sort_values("doc_id")[["doc_id", "keep", "drop_reason"]]
        assert ka.values.tolist() == kb.values.tolist()

    def test_temperature_resamples_dominant_key(self, ray_session):
        import ray.data as rd

        from spiderray.pipelines.prepare_corpus import prepare_corpus

        # documents-table text is realistic enough for langid; use source
        # as the temperature key to stay deterministic
        rows = self._base_rows(90)
        for r in rows:
            r["source"] = "big" if r["doc_id"] % 3 else "small"
        out = prepare_corpus(rd.from_items(rows), temperature=0.5,
                             temperature_key="source").to_pandas()
        kept = out[out.keep]
        n_small = (kept.source == "small").sum()
        n_big = (kept.source == "big").sum()
        # big key thinned toward sqrt(n_small * n_big)
        assert n_big < (out.source == "big").sum()
        assert (out.drop_reason == "resampled").sum() > 0
        # already-dropped rows never get their reason overwritten
        pre = out[(~out.keep) & (out.drop_reason != "resampled")]
        assert (pre.drop_reason != "").all()


class TestProfileColumns:
    def test_profile_with_nulls_and_types(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import profile_columns

        df = pd.DataFrame({
            "id": np.arange(100, dtype=np.int64),
            "k": pd.array(["a", "b", None, "c"] * 25, dtype="string"),
            "v": np.arange(100, dtype=np.int64) % 7,
        })
        out = profile_columns(rd.from_pandas(df).repartition(5),
                              ["id", "k", "v"]).to_pandas().set_index("column")
        assert out.loc["id", "n"] == 100 and out.loc["id", "n_null"] == 0
        assert out.loc["id", "n_distinct"] == 100
        # lexical min/max on the string cast: "0" < "99" but max is "99"
        assert out.loc["id", "min_v"] == "0" and out.loc["id", "max_v"] == "99"
        assert out.loc["k", "n_null"] == 25 and out.loc["k", "n_distinct"] == 3
        assert out.loc["k", "min_v"] == "a" and out.loc["k", "max_v"] == "c"
        assert out.loc["v", "n_distinct"] == 7


class TestGroupedOutliers:
    def test_flags_planted_outliers_bit_deterministically(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import grouped_outliers

        rng = np.random.default_rng(17)
        vals = rng.normal(50, 5, size=4000)
        vals[[10, 500, 2222]] = [500.0, -400.0, 999.0]  # way outside
        df = pd.DataFrame({"event_id": np.arange(4000),
                           "g": np.array(["a", "b"] * 2000, dtype=object),
                           "value": vals})
        out = grouped_outliers(rd.from_pandas(df).repartition(6), "g",
                               "value", ["event_id"]).to_pandas()
        assert {10, 500, 2222} <= set(out["event_id"])
        # identical output (incl. z_micro bits) on another partitioning
        out2 = grouped_outliers(rd.from_pandas(df).repartition(13), "g",
                                "value", ["event_id"]).to_pandas()
        a = out.sort_values("event_id").reset_index(drop=True)
        b = out2.sort_values("event_id").reset_index(drop=True)
        assert a[["event_id", "v_int", "z_micro"]].values.tolist() == \
            b[["event_id", "v_int", "z_micro"]].values.tolist()

    def test_constant_group_flags_nothing(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import grouped_outliers

        df = pd.DataFrame({"event_id": np.arange(100),
                           "g": ["c"] * 100, "value": [7.25] * 100})
        out = grouped_outliers(rd.from_pandas(df), "g", "value",
                               ["event_id"]).to_pandas()
        assert len(out) == 0  # sd == 0 → no z, no division blowup


class TestGroupedOutliersOverflowGuard:
    def test_oversized_scale_raises(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import grouped_outliers

        df = pd.DataFrame({"event_id": [1, 2], "g": ["a", "a"],
                           "value": [4.0e9, 1.0]})
        with pytest.raises(Exception, match="overflow|Overflow"):
            grouped_outliers(rd.from_pandas(df), "g", "value",
                             ["event_id"], scale=1000).to_pandas()


class TestEmbeddingDecontaminate:
    def test_flags_planted_and_near_copies(self, ray_session):
        import ray.data as rd

        from spiderray.stages.dedup import embedding_decontaminate

        rng = np.random.default_rng(2)
        ev = rng.normal(0, 1, (5, 16))
        train = rng.normal(0, 1, (40, 16))
        train[3] = ev[0]                      # exact leak
        train[7] = ev[1] * 2.0 + 0.001        # scaled near-copy: cosine ≈ 1
        df = pd.DataFrame({"vec_id": np.arange(40),
                           "embedding": [list(v) for v in train]})
        out = (embedding_decontaminate(rd.from_pandas(df).repartition(4),
                                       list(ev))
               .to_pandas().sort_values("vec_id").reset_index(drop=True))
        flagged = set(out[out["contaminated"]]["vec_id"])
        assert {3, 7} <= flagged
        assert len(flagged) <= 4  # random 16-dim vectors stay far apart
        assert out.loc[3, "max_sim_milli"] == 1000
        # partition invariance: identical doubles from exact-int sums
        out2 = (embedding_decontaminate(rd.from_pandas(df).repartition(9),
                                        list(ev))
                .to_pandas().sort_values("vec_id").reset_index(drop=True))
        cols = ["vec_id", "max_sim_milli", "contaminated"]
        assert out[cols].values.tolist() == out2[cols].values.tolist()

    def test_eval_cap_and_degenerate(self, ray_session):
        import pytest as _pytest
        import ray.data as rd

        from spiderray.stages.dedup import embedding_decontaminate

        df = pd.DataFrame({"vec_id": [1], "embedding": [[1.0, 0.0]]})
        with _pytest.raises(ValueError, match="max_eval"):
            embedding_decontaminate(rd.from_pandas(df),
                                    [[1.0, 0.0]] * 3, max_eval=2)
        with _pytest.raises(ValueError, match="empty"):
            embedding_decontaminate(rd.from_pandas(df), [])
        # zero vector never divides by zero, never flags
        z = pd.DataFrame({"vec_id": [1], "embedding": [[0.0, 0.0]]})
        out = embedding_decontaminate(rd.from_pandas(z),
                                      [[1.0, 0.0]]).to_pandas()
        assert not out["contaminated"][0]


class TestClassifierAuc:
    @staticmethod
    def _brute_auc_ppm(scores, labels):
        import numpy as np

        sq = np.floor(np.asarray(scores) * 1_000_000 + 0.5).astype(np.int64)
        pos, neg = sq[np.asarray(labels)], sq[~np.asarray(labels)]
        u2 = sum(int(2 * (p > nv) + (p == nv)) for p in pos for nv in neg)
        pn = len(pos) * len(neg)
        return (u2 * 1_000_000 + pn) // (2 * pn) if pn else 0

    def test_matches_brute_force_with_ties(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import classifier_auc

        rng = np.random.default_rng(5)
        # quantized to 1 decimal → heavy ties exercise the correction
        scores = np.round(rng.random(300), 1)
        labels = rng.random(300) < np.clip(scores, 0.1, 0.9)
        df = pd.DataFrame({"score": scores, "label": labels})
        out = classifier_auc(rd.from_pandas(df).repartition(5),
                             "score", "label")
        assert out["auc_ppm"][0] == self._brute_auc_ppm(scores, labels)
        out2 = classifier_auc(rd.from_pandas(df).repartition(11),
                              "score", "label")
        assert out.values.tolist() == out2.values.tolist()

    def test_perfect_and_inverted_and_degenerate(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import classifier_auc

        hi = pd.DataFrame({"score": [0.9] * 5 + [0.1] * 5,
                           "label": [True] * 5 + [False] * 5})
        assert classifier_auc(rd.from_pandas(hi), "score",
                              "label")["auc_ppm"][0] == 1_000_000
        lo = hi.assign(label=~hi["label"])
        assert classifier_auc(rd.from_pandas(lo), "score",
                              "label")["auc_ppm"][0] == 0
        one_class = pd.DataFrame({"score": [0.5, 0.7], "label": [True, True]})
        assert classifier_auc(rd.from_pandas(one_class), "score",
                              "label")["auc_ppm"][0] == 0

    def test_all_tied_is_half(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import classifier_auc

        df = pd.DataFrame({"score": [0.5] * 8,
                           "label": [True, False] * 4})
        assert classifier_auc(rd.from_pandas(df), "score",
                              "label")["auc_ppm"][0] == 500_000


class TestCalibrationBins:
    def test_bins_and_quantized_sums(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import calibration_bins

        df = pd.DataFrame({
            "score": [0.05, 0.09, 0.15, 0.95, 1.0, 0.0],
            "label": [False, True, True, True, True, False]})
        out = calibration_bins(rd.from_pandas(df).repartition(3),
                               "score", "label", n_bins=10)
        r = out.set_index("bin")
        assert r.loc[0, ["n", "n_pos"]].tolist() == [3, 1]
        assert r.loc[0, "score_sum"] == 50_000 + 90_000 + 0
        assert r.loc[1, ["n", "n_pos"]].tolist() == [1, 1]
        # score 1.0 clips into the top bin
        assert r.loc[9, ["n", "n_pos"]].tolist() == [2, 2]
        assert r.loc[9, "score_sum"] == 950_000 + 1_000_000


class TestTermDrift:
    def test_planted_shift_and_exact_ppm(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import term_drift

        # release A: 8 tokens (aa×4 bb×4); release B: 8 tokens (aa×2 bb×2
        # cc×4) — TVD = |0.5−0.25|·2 + 0.5 = 1.0 → ppm_absdiff total 1e6
        a = pd.DataFrame({"text": ["aa bb"] * 4})
        b = pd.DataFrame({"text": ["aa bb", "aa bb", "cc cc cc cc"]})
        out = term_drift(rd.from_pandas(a), rd.from_pandas(b), top_n=10)
        r = out.set_index("term")
        assert r.loc["aa", ["n_a", "n_b"]].tolist() == [4, 2]
        assert r.loc["aa", "ppm_a"] == 500_000
        assert r.loc["aa", "ppm_b"] == 250_000
        assert r.loc["cc", ["ppm_a", "ppm_b"]].tolist() == [0, 500_000]
        assert r.loc["__other__", ["n_a", "n_b"]].tolist() == [0, 0]
        assert r.loc["__total__", "ppm_absdiff"] == 1_000_000

    def test_top_n_cut_and_other_mass(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import term_drift

        a = pd.DataFrame({"text": ["big big big small tiny"] * 10})
        out = term_drift(rd.from_pandas(a).repartition(3),
                         rd.from_pandas(a).repartition(2), top_n=1)
        r = out.set_index("term")
        assert set(r.index) == {"big", "__other__", "__total__"}
        assert r.loc["big", ["n_a", "n_b"]].tolist() == [30, 30]
        assert r.loc["__other__", ["n_a", "n_b"]].tolist() == [20, 20]
        assert r.loc["__total__", "ppm_absdiff"] == 0

    def test_partition_invariant(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import term_drift

        rng = np.random.default_rng(11)
        words = ["w%d" % i for i in range(60)]
        mk = lambda seed: pd.DataFrame({  # noqa: E731
            "text": [" ".join(np.random.default_rng(seed + i)
                              .choice(words, size=9)) for i in range(150)]})
        a, b = mk(0), mk(1000)
        o1 = term_drift(rd.from_pandas(a).repartition(2),
                        rd.from_pandas(b).repartition(3), top_n=25)
        o2 = term_drift(rd.from_pandas(a).repartition(7),
                        rd.from_pandas(b).repartition(5), top_n=25)
        assert o1.values.tolist() == o2.values.tolist()


class TestGroupedLinfit:
    def test_flags_off_line_rows_partition_invariantly(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import grouped_linfit_outliers

        rng = np.random.default_rng(23)
        n = 2000
        x = rng.integers(10, 200, size=n).astype(np.int64)
        g = np.array(["a", "b"] * (n // 2), dtype=object)
        slope = np.where(g == "a", 30, 50)
        y = (slope * x + 1000 + rng.integers(-40, 41, size=n)).astype(np.int64)
        y[[7, 444, 1999]] = 25  # way off both lines
        df = pd.DataFrame({"doc_id": np.arange(n), "g": g, "x": x, "y": y})
        out = (grouped_linfit_outliers(rd.from_pandas(df).repartition(6),
                                       "g", "x", "y", k_sigma=4.0)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert len(out) == n  # all rows pass through, annotated
        flagged = set(out[out["flagged"]]["doc_id"])
        assert {7, 444, 1999} <= flagged
        assert len(flagged) < 20  # the noise band stays unflagged
        # bit-identical residuals on another partitioning
        out2 = (grouped_linfit_outliers(rd.from_pandas(df).repartition(13),
                                        "g", "x", "y", k_sigma=4.0)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out["resid_milli"].tolist() == out2["resid_milli"].tolist()
        assert out["flagged"].tolist() == out2["flagged"].tolist()

    def test_exact_fit_zero_residuals(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import grouped_linfit_outliers

        x = np.arange(1, 101, dtype=np.int64)
        df = pd.DataFrame({"doc_id": np.arange(100), "g": ["a"] * 100,
                           "x": x, "y": 3 * x + 7})
        out = grouped_linfit_outliers(rd.from_pandas(df), "g", "x",
                                      "y").to_pandas()
        assert out["resid_milli"].abs().max() == 0
        assert not out["flagged"].any()  # strict >: σ=0 flags nothing here

    def test_degenerate_groups_fall_back_to_mean(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import grouped_linfit_outliers

        # constant x (den=0) and a single-row group (n<2)
        df = pd.DataFrame({
            "doc_id": np.arange(5),
            "g": ["c", "c", "c", "c", "solo"],
            "x": np.array([4, 4, 4, 4, 9], np.int64),
            "y": np.array([10, 10, 10, 50, 77], np.int64),
        })
        out = (grouped_linfit_outliers(rd.from_pandas(df), "g", "x", "y",
                                       k_sigma=1.0)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # group c: mean 20, resid (-10,-10,-10,30), σ>0 → row 3 flags
        assert out["resid_milli"].tolist() == [-10000, -10000, -10000,
                                               30000, 0]
        assert out["flagged"].tolist() == [False, False, False, True, False]

    def test_overflow_guard(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import grouped_linfit_outliers

        df = pd.DataFrame({"doc_id": [1, 2], "g": ["a", "a"],
                           "x": np.array([4_000_000_000, 1], np.int64),
                           "y": np.array([1, 2], np.int64)})
        with pytest.raises(Exception, match="overflow|Overflow"):
            grouped_linfit_outliers(rd.from_pandas(df), "g", "x",
                                    "y").to_pandas()


class TestBucketedLayout:
    def test_write_read_prune_and_join(self, ray_session, tmp_path):
        import os

        import ray.data as rd

        from spiderray.stages.joins import (_stable_bucket,
                                            bucketed_join_copartitioned,
                                            read_bucketed, write_bucketed)

        left = pd.DataFrame({"k": np.arange(200, dtype=np.int64),
                             "v": np.arange(200, dtype=np.int64) * 3})
        right = pd.DataFrame({"k": np.arange(0, 200, 2, dtype=np.int64),
                              "w": [f"x{i}" for i in range(0, 200, 2)]})
        ld, rd_ = str(tmp_path / "l"), str(tmp_path / "r")
        write_bucketed(rd.from_pandas(left), "k", ld, num_buckets=8)
        write_bucketed(rd.from_pandas(right), "k", rd_, num_buckets=8)
        # bucket pruning: reading one bucket returns only its keys
        got = read_bucketed(ld, buckets=[3]).to_pandas()
        assert (got["k"].map(lambda v: _stable_bucket(int(v), 8)) == 3).all()
        assert len(got) > 0
        # co-partitioned join == pandas merge, no shuffle
        out = bucketed_join_copartitioned(ld, rd_).to_pandas()
        exp = left.merge(right, on="k")
        assert len(out) == len(exp) == 100
        got_s = out.sort_values("k").reset_index(drop=True)
        exp_s = exp.sort_values("k").reset_index(drop=True)
        assert (got_s["v"].to_numpy() == exp_s["v"].to_numpy()).all()
        assert list(got_s["w"]) == list(exp_s["w"])

    def test_mismatched_layouts_refused(self, ray_session, tmp_path):
        import ray.data as rd

        from spiderray.stages.joins import (bucketed_join_copartitioned,
                                            write_bucketed)

        df = pd.DataFrame({"k": np.arange(10, dtype=np.int64)})
        a, b, c = (str(tmp_path / x) for x in "abc")
        write_bucketed(rd.from_pandas(df), "k", a, num_buckets=4)
        write_bucketed(rd.from_pandas(df), "k", b, num_buckets=8)
        with pytest.raises(ValueError, match="co-partitioned"):
            bucketed_join_copartitioned(a, b).to_pandas()
        df2 = pd.DataFrame({"j": np.arange(10, dtype=np.int64)})
        write_bucketed(rd.from_pandas(df2), "j", c, num_buckets=4)
        with pytest.raises(ValueError, match="key"):
            bucketed_join_copartitioned(a, c).to_pandas()
        # overwrite guard
        with pytest.raises(FileExistsError):
            write_bucketed(rd.from_pandas(df), "k", a)


class TestApplyDeletions:
    def test_broadcast_and_anti_paths_agree(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.dedup import apply_deletions

        t = pa.table({"doc_id": np.arange(2000, dtype=np.int64),
                      "v": np.arange(2000, dtype=np.int64) * 3})
        dead = pa.table({"doc_id": np.arange(0, 2000, 13, dtype=np.int64)})
        a = (apply_deletions(rd.from_arrow(t).repartition(4),
                             rd.from_arrow(dead), method="broadcast")
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (apply_deletions(rd.from_arrow(t).repartition(7),
                             rd.from_arrow(dead), method="anti")
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        expect = sorted(set(range(2000)) - set(range(0, 2000, 13)))
        assert a["doc_id"].tolist() == expect
        assert a[["doc_id", "v"]].equals(b[["doc_id", "v"]])

    def test_mark_mode_tombstones(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.dedup import apply_deletions

        t = pa.table({"doc_id": np.arange(50, dtype=np.int64)})
        dead = pa.table({"doc_id": np.array([3, 7], np.int64)})
        out = (apply_deletions(rd.from_arrow(t), rd.from_arrow(dead),
                               mode="mark")
               .to_pandas().set_index("doc_id")["deleted"])
        assert out[3] and out[7] and not out[0]
        assert len(out) == 50  # nothing filtered in mark mode


class TestNearDedupBest:
    """Quality-aware representative selection: each near-dup cluster keeps
    its best-scoring member (ties -> min id), not the min id."""

    def _pairs(self, ray_session, pairs):
        import ray.data as rd

        return rd.from_items([{"id_a": a, "id_b": b} for a, b in pairs])

    def test_best_member_survives(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.dedup import near_dedup_best

        # cluster {1,2,3}: 2 has the top score; cluster {10,11}: tie -> 10;
        # 20 untouched by any pair survives with any score
        t = pa.table({
            "doc_id": [1, 2, 3, 10, 11, 20],
            "n_chars": [5, 9, 7, 4, 4, 1],
        })
        out = near_dedup_best(
            rd.from_arrow(t).repartition(3),
            self._pairs(ray_session, [(1, 2), (2, 3), (10, 11)]),
            id_col="doc_id", score_col="n_chars",
        ).to_pandas()
        assert sorted(out["doc_id"]) == [2, 10, 20]


    def test_pairs_disjoint_from_corpus_is_noop(self, ray_session):
        """Round-4 review finding: pair ids absent from ds (a re-run over
        an already-filtered corpus) must be a no-op, not an ArrowInvalid
        crash in the empty-winners concat."""
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.dedup import near_dedup_best

        t = pa.table({"doc_id": [1, 2, 3], "n_chars": [1, 2, 3]})
        out = near_dedup_best(
            rd.from_arrow(t),
            self._pairs(ray_session, [(100, 101)]),
            id_col="doc_id", score_col="n_chars",
        ).to_pandas()
        assert sorted(out["doc_id"]) == [1, 2, 3]

    def test_join_path_matches_broadcast(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.dedup import near_dedup_best

        rng = np.random.default_rng(5)
        n = 400
        scores = rng.integers(1, 1000, n)
        t = pa.table({"doc_id": np.arange(n), "n_chars": scores})
        pairs = [(i, i + 1) for i in range(0, n, 4)]  # clusters of 2
        a = near_dedup_best(rd.from_arrow(t), self._pairs(ray_session, pairs),
                            "doc_id", "n_chars").to_pandas()
        b = near_dedup_best(rd.from_arrow(t), self._pairs(ray_session, pairs),
                            "doc_id", "n_chars",
                            broadcast_max_losers=0 + 1).to_pandas()
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])
        # winners hold the higher score of each pair (tie -> lower id)
        by = dict(zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()))
        for i in range(0, n, 4):
            keep = set(a["doc_id"])
            s_i, s_j = by[i], by[i + 1]
            want = i if (s_i > s_j or (s_i == s_j)) else i + 1
            assert (want in keep) and ((i + 1 if want == i else i) not in keep)


class TestCorpusDiffAndJoinModes:
    def test_corpus_diff_counts(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.stats import corpus_diff

        a = pa.table({"doc_id": [1, 2, 3, 4],
                      "text": ["aa", "bb", "cc", "dd"]})
        b = pa.table({"doc_id": [2, 3, 5],
                      "text": ["bb", "CC changed", "ee"]})
        out = corpus_diff(rd.from_arrow(a).repartition(2),
                          rd.from_arrow(b)).set_index("metric")["value"]
        assert out["n_added"] == 1       # 5
        assert out["n_removed"] == 2     # 1, 4
        assert out["n_changed"] == 1     # 3
        assert out["n_unchanged"] == 1   # 2

    def test_bucketed_join_left_outer_modes(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.joins import bucketed_join

        l = pa.table({"k": [1, 2, 3, 4, 100], "lv": [10, 20, 30, 40, 1000]})
        r = pa.table({"k2": [2, 4, 5, 200], "rv": ["b", "d", "e", "z"]})
        left = bucketed_join(rd.from_arrow(l), rd.from_arrow(r),
                             on="k", right_on="k2", how="left").to_pandas()
        assert len(left) == 5 and left["rv"].notna().sum() == 2
        outer = bucketed_join(rd.from_arrow(l), rd.from_arrow(r),
                              on="k", right_on="k2", how="outer").to_pandas()
        assert len(outer) == 7
        assert outer["k"].notna().sum() == 5 and outer["k2"].notna().sum() == 4
        # int columns stay integral (nullable), never decayed to float64
        assert str(left["lv"].dtype) == "Int64"

    def test_bucketed_join_bad_how_raises(self, ray_session):
        import pytest

        from spiderray.stages.joins import bucketed_join

        with pytest.raises(ValueError):
            bucketed_join(None, None, on="k", how="right")


class TestDecontaminateSpans:
    def test_cuts_only_covered_windows(self, ray_session):
        import ray.data as rd

        body = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
        docs = [
            {"doc_id": 1, "text": f"intro words here {body} trailing tail"},
            {"doc_id": 2, "text": "totally unrelated content nothing shared"},
        ]
        bench = rd.from_items([{"text": body}])
        out = dedup.decontaminate_spans(
            rd.from_items(docs), bench, n=8).to_pandas().set_index("doc_id")
        assert out.loc[1, "text"] == "intro words here trailing tail"
        assert out.loc[1, "n_cut_words"] == 8
        assert bool(out.loc[1, "decontaminated"])
        assert out.loc[2, "text"] == docs[1]["text"]
        assert out.loc[2, "n_cut_words"] == 0

    def test_short_doc_whole_text_gram(self, ray_session):
        import ray.data as rd

        docs = [{"doc_id": 1, "text": "tiny doc"}]
        bench = rd.from_items([{"text": "tiny doc"}])
        out = dedup.decontaminate_spans(
            rd.from_items(docs), bench, n=8).to_pandas()
        assert out.iloc[0]["text"] == ""
        assert out.iloc[0]["n_cut_words"] == 2

    def test_empty_bench_passthrough(self, ray_session):
        import ray.data as rd

        docs = [{"doc_id": 1, "text": "some words in here"}]
        bench = rd.from_items([{"text": ""}])
        out = dedup.decontaminate_spans(
            rd.from_items(docs), bench, n=8).to_pandas()
        assert out.iloc[0]["text"] == docs[0]["text"]
        assert not bool(out.iloc[0]["decontaminated"])

    def test_overlapping_hits_merge(self, ray_session):
        import ray.data as rd

        # two eval grams overlap in the doc: covered windows merge
        w = "a1 a2 a3 a4 a5 a6 a7 a8 a9".split()
        docs = [{"doc_id": 1, "text": " ".join(w)}]
        bench = rd.from_items([{"text": " ".join(w[0:8])},
                               {"text": " ".join(w[1:9])}])
        out = dedup.decontaminate_spans(
            rd.from_items(docs), bench, n=8).to_pandas()
        assert out.iloc[0]["text"] == ""
        assert out.iloc[0]["n_cut_words"] == 9


class TestBroadcastJoin:
    @pytest.fixture(scope="class")
    def sides(self, ray_session):
        import ray.data as rd

        left = rd.from_items([{"k": i % 7, "lval": i} for i in range(50)])
        right = rd.from_items([{"kk": j, "rval": j * 100} for j in range(5)])
        return left, right

    def _expected(self):
        return sorted((i % 7, i, (i % 7) * 100) for i in range(50)
                      if i % 7 < 5)

    def test_inner_matches_hash_join(self, sides):
        from spiderray.stages.joins import broadcast_join

        left, right = sides
        out = broadcast_join(left, right, on="k",
                             right_on="kk").to_pandas()
        got = sorted(map(tuple, out[["k", "lval", "rval"]].to_numpy()))
        assert got == self._expected()

    def test_left_keeps_unmatched(self, sides):
        from spiderray.stages.joins import broadcast_join

        left, right = sides
        out = broadcast_join(left, right, on="k", right_on="kk",
                             how="left").to_pandas()
        assert len(out) == 50
        unmatched = out[out["k"] >= 5]
        assert unmatched["rval"].isna().all()

    def test_cap_and_overlap_raise(self, sides):
        import pytest as _pytest

        from spiderray.stages.joins import broadcast_join

        left, right = sides
        with _pytest.raises(ValueError):
            broadcast_join(left, right, on="k", right_on="kk",
                           max_right_rows=2)
        with _pytest.raises(ValueError):
            broadcast_join(left, left, on="k")   # lval overlaps
        with _pytest.raises(ValueError):
            broadcast_join(left, right, on="k", right_on="kk", how="outer")
