"""Opt-in scale stress tests (SPIDERRAY_STRESS=1): exercise the documented
scale paths at 20-100x the driver's correctness scale.  Skipped by default
so the suite stays fast; run results are recorded in BASELINE.md."""

import os

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SPIDERRAY_STRESS") != "1",
    reason="set SPIDERRAY_STRESS=1 to run scale stress tests",
)


class TestStressDedup:
    def test_minhash_join_verify_100k(self, ray_session):
        """The JOIN verify path (the 10^12 shape) at 100k docs with 10%
        planted near-dups: every planted pair must be found."""
        import ray.data as rd

        from spiderray.stages import dedup

        rng = np.random.default_rng(17)
        words = [f"w{i}" for i in range(5000)]
        n = 100_000
        texts = [" ".join(rng.choice(words, size=25)) for i in range(n)]
        rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        planted = [
            {"doc_id": n + j, "text": texts[j * 10] + " tail"} for j in range(n // 10 // 10)
        ]
        ds = rd.from_pandas(pd.DataFrame(rows + planted))
        pairs = dedup.minhash_lsh_pairs(ds, threshold=0.6, verify="join").to_pandas()
        found = set(map(tuple, pairs[["id_a", "id_b"]].drop_duplicates().to_numpy()))
        missing = [
            (j * 10, n + j) for j in range(len(planted)) if (j * 10, n + j) not in found
        ]
        assert len(missing) <= len(planted) // 50, f"missing {len(missing)}: {missing[:5]}"

    def test_bloom_incremental_1m_prior(self, ray_session):
        """Bloom prefilter with a 1M-fingerprint prior: survivors exact."""
        import ray.data as rd

        from spiderray.stages import dedup

        prior = pd.DataFrame(
            {"doc_id": range(1_000_000),
             "text": [f"prior doc {i}" for i in range(1_000_000)]}
        )
        new = pd.DataFrame(
            {"doc_id": range(2_000_000, 2_005_000),
             "text": [f"prior doc {i}" for i in range(2500)]
                   + [f"new doc {i}" for i in range(2500)]}
        )
        prior_fps = dedup.exact_dedup(
            rd.from_pandas(prior)
        ).select_columns(["fingerprint"]).materialize()
        out = dedup.incremental_exact_dedup(
            rd.from_pandas(new), prior_fps, method="bloom"
        ).to_pandas()
        assert sorted(out.doc_id) == list(range(2_002_500, 2_005_000))

    def test_embedding_hot_group_50k(self, ray_session):
        """One 50k-vector hot label must be SKIPPED by the max_group cap
        while small labels still verify — no O(n^2) allocation."""
        import ray.data as rd

        from spiderray.stages import dedup

        rng = np.random.default_rng(23)
        hot = rng.standard_normal((50_000, 8)).astype(np.float32)
        cold = rng.standard_normal((20, 8)).astype(np.float32)
        cold[7] = cold[3] * 1.05
        df = pd.DataFrame(
            {
                "vec_id": range(50_020),
                "embedding": list(np.vstack([hot, cold])),
                "label": [0] * 50_000 + [1] * 20,
            }
        )
        pairs = dedup.embedding_near_dup_pairs(
            rd.from_pandas(df), threshold=0.99, max_group=10_000
        ).to_pandas().drop_duplicates(["id_a", "id_b"])
        found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
        assert (50_003, 50_007) in found
        assert all(a >= 50_000 for a, _ in found)


class TestStressPrepareCorpus:
    def test_many_winners_no_driver_id_set(self, ray_session, monkeypatch):
        """>1e6 winners with planted duplicates through the round-3
        loser-shaped dup marking (pipelines/prepare_corpus): the winner id
        set must never materialize on the driver — only LOSER ids (== dup
        volume) may broadcast, and with broadcast_max_losers=0 the bucketed
        mark join runs with nothing driver-side at all.  Drives the marking
        machinery directly on a pre-decided 1.2M-row table (the decide
        kernels are covered elsewhere; this is the shuffle/broadcast
        contract)."""
        import pyarrow as pa
        import ray
        import ray.data as rd

        from spiderray.pipelines import prepare_corpus as pc

        n = 1_200_000
        n_dups = 2_000
        ids = np.concatenate([np.arange(n), np.arange(n, n + n_dups)])
        texts = [f"doc {i}" for i in range(n)] + [f"doc {i}" for i in range(n_dups)]
        decided = rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "keep": pa.array(np.ones(len(ids), dtype=bool)),
            "drop_reason": pa.array([""] * len(ids), pa.string()),
        })).materialize()

        losers = pc._loser_ids(decided, "text", "doc_id").materialize()
        assert losers.count() == n_dups
        loser_ids = set(losers.to_pandas()["doc_id"])
        assert loser_ids == set(range(n, n + n_dups))

        # (a) join path: nothing rides ray.put
        put_sizes = []
        real_put = ray.put

        def spy_put(obj, *a, **kw):
            try:
                size = len(obj)
            except TypeError:
                size = -1
            put_sizes.append(size)
            return real_put(obj, *a, **kw)

        monkeypatch.setattr(ray, "put", spy_put)
        marked = pc._mark_losers_join(decided, losers, "doc_id")
        got = marked.map_batches(
            lambda t: t.select(["doc_id", "keep", "drop_reason"]),
            batch_format="pyarrow", zero_copy_batch=True,
        ).to_pandas()
        assert len(got) == n + n_dups
        dup_rows = got[got.drop_reason == "duplicate"]
        assert len(dup_rows) == n_dups and (dup_rows.doc_id >= n).all()
        assert not dup_rows.keep.any()
        assert all(sz < 0 or sz < 10_000 for sz in put_sizes), put_sizes

        # (b) broadcast path: the ONLY sized ray.put payload is loser-sized
        put_sizes.clear()
        marked_b = pc._mark_losers_broadcast(decided, losers, "doc_id")
        got_b = marked_b.map_batches(
            lambda t: t.select(["doc_id", "keep", "drop_reason"]),
            batch_format="pyarrow", zero_copy_batch=True,
        ).to_pandas()
        assert int((got_b.drop_reason == "duplicate").sum()) == n_dups
        sized = [sz for sz in put_sizes if sz >= 0]
        assert sized and max(sized) <= n_dups, put_sizes


class TestStressJoins:
    def test_asof_join_1m_rows(self, ray_session):
        """as-of join at 1M left rows x 100k right rows across 200 keys:
        correctness sampled against a per-key serial check, wall bounded by
        the bucketed merge_asof shape (no driver materialization)."""
        import ray.data as rd

        rng = np.random.default_rng(29)
        nl, nr, nk = 1_000_000, 100_000, 200
        left = pd.DataFrame({
            "t": rng.integers(0, 10_000_000, nl).astype("int64"),
            "k": rng.integers(0, nk, nl).astype("int64"),
            "lid": np.arange(nl, dtype="int64"),
        })
        right = pd.DataFrame({
            "t": rng.integers(0, 10_000_000, nr).astype("int64"),
            "k": rng.integers(0, nk, nr).astype("int64"),
            "rid": np.arange(nr, dtype="int64"),
        })
        from spiderray.stages.joins import asof_join

        out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                        on="t", by="k", right_tiebreak="rid").to_pandas()
        assert 0 < len(out) <= nl
        # serial spot-check on 3 keys
        got = out.set_index("lid")
        for k in (0, 57, 199):
            lk = left[left.k == k]
            rk = right[right.k == k].sort_values(["t", "rid"])
            for _, row in lk.head(50).iterrows():
                prior = rk[rk.t <= row.t]
                if prior.empty:
                    assert row.lid not in got.index
                else:
                    assert int(got.loc[row.lid, "rid"]) == int(prior.iloc[-1].rid)


class TestStressC4Decontam:
    def _sentence_docs(self, n_docs: int, seed: int = 5):
        """Deterministic sentence-structured corpus: ~8 six-word sentences
        per doc from a 1000-word vocabulary; every 50th doc's first three
        sentences are copied into the next doc (planted global dup span)."""
        rng = np.random.default_rng(seed)
        vocab = np.array([f"w{i:03d}" for i in range(1000)])
        docs = []
        for i in range(n_docs):
            words = vocab[rng.integers(0, 1000, size=48)]
            sents = [" ".join(words[j : j + 6]) + "." for j in range(0, 48, 6)]
            docs.append(sents)
        for i in range(0, n_docs - 1, 50):
            docs[i + 1][:3] = docs[i][:3]
        return [{"doc_id": i, "text": " ".join(s)} for i, s in enumerate(docs)]

    def test_c4_span_dedup_100k(self, ray_session):
        """100k docs (~800k span rows): planted cross-doc spans resolve to
        the min-id winner; a serial per-doc spot check over a sample plus
        exact counts of modified docs."""
        import time

        import ray.data as rd

        from spiderray.functions.c4 import remove_spans
        from spiderray.stages.c4 import c4_span_dedup

        n = 100_000
        rows = self._sentence_docs(n)
        # right-size blocks: from_items yields 500-row blocks and the
        # ~40-70 ms/task Ray floor then dominates every stage (measured
        # 34-48 s → 8 s); a parquet _read at this size would give ≤16
        ds = rd.from_items(rows).repartition(16)
        t0 = time.perf_counter()
        out = c4_span_dedup(ds).to_pandas()
        dt = time.perf_counter() - t0
        out = out.set_index("doc_id").sort_index()
        orig = {r["doc_id"]: r["text"] for r in rows}
        changed = sum(1 for i in out.index if out.loc[i, "text"] != orig[i])
        # exactly the planted loser docs change (vocab 1000^18 per span —
        # natural collisions impossible)
        assert changed == len(range(0, n - 1, 50))
        # winners byte-identical; losers = original minus sentences 0-2
        for i in range(0, 2000, 50):
            assert out.loc[i, "text"] == orig[i]
            assert out.loc[i + 1, "text"] == remove_spans(orig[i + 1], [0])
        print(f"c4_span_dedup 100k docs: {dt:.1f}s, {changed} modified")

    def test_decontaminate_200k_corpus(self, ray_session):
        """200k-doc corpus vs a 500-doc benchmark: flagged set equals the
        serial reference on a sample; bench side stays under the broadcast
        cap (the documented eval-set contract)."""
        import time

        import ray.data as rd

        from spiderray.functions.fingerprint import ngram_set
        from spiderray.stages.dedup import decontaminate

        corpus = self._sentence_docs(200_000, seed=9)
        bench_rows = [{"text": corpus[i * 400]["text"]} for i in range(500)]
        t0 = time.perf_counter()
        out = decontaminate(
            rd.from_items(corpus).repartition(16), rd.from_items(bench_rows),
            n=8,
        ).to_pandas().set_index("doc_id")
        dt = time.perf_counter() - t0
        # every bench source doc self-flags
        assert all(bool(out.loc[i * 400, "contaminated"]) for i in range(500))
        # serial spot check on a slice
        bench_grams = np.unique(np.concatenate(
            [ngram_set(r["text"], 8) for r in bench_rows]))
        for i in range(0, 5000, 37):
            g = ngram_set(corpus[i]["text"], 8)
            idx = np.searchsorted(bench_grams, g)
            idx[idx == len(bench_grams)] = 0
            expect = int((bench_grams[idx] == g).sum())
            assert out.loc[i, "overlap_grams"] == expect, i
        print(f"decontaminate 200k docs: {dt:.1f}s")


class TestStressFourthContinuation:
    def test_heavy_hitters_5m_items(self, ray_session):
        """5M items over a 500k vocabulary (every batch compresses through
        the MG sketch) with 30 planted heavies: exact recovery, nothing
        vocabulary-sized on the driver."""
        import ray.data as rd

        from spiderray.stages.stats import heavy_hitters

        rng = np.random.default_rng(23)
        n = 5_000_000
        base = rng.integers(0, 500_000, size=n)
        hot = np.repeat(np.arange(30), 4000) + 1_000_000  # 30 × 4000 hits
        vals = np.concatenate([base, hot])
        rng.shuffle(vals)
        df = pd.DataFrame({"v": vals.astype(np.int64)})
        ds = rd.from_pandas(df).repartition(32)
        out = heavy_hitters(ds, "v", min_count=3000, sketch_size=8192).to_pandas()
        got = {int(i) for i in out["item"].astype(int)}
        assert {1_000_000 + k for k in range(30)} <= got
        # uniform base terms average 10 hits; none can reach 3000
        assert all(int(i) >= 1_000_000 for i in got)
        assert (out.set_index(out["item"].astype(int))["n"]
                .loc[1_000_000] == 4000)

    def test_global_scan_5m_rows(self, ray_session):
        """5M-row global prefix sum matches the serial cumsum exactly —
        bucket boundaries sampled, totals exchanged, per-bucket cumsum."""
        import ray.data as rd

        from spiderray.stages.windows import global_scan

        rng = np.random.default_rng(29)
        n = 5_000_000
        ids = rng.permutation(n)
        sizes = rng.integers(1, 600, size=n)
        df = pd.DataFrame({"k": ids, "s": sizes})
        out = global_scan(rd.from_pandas(df).repartition(32), "k", "s",
                          n_buckets=64).to_pandas().sort_values("k")
        ser = df.sort_values("k")
        expect = np.concatenate([[0], np.cumsum(ser["s"].to_numpy())[:-1]])
        assert (out["offset"].to_numpy() == expect).all()

    def test_pagerank_300k_edges(self, ray_session):
        """300k-edge multigraph (10k nodes): distributed == serial, bit
        for bit, 3 iterations."""
        import ray.data as rd

        from spiderray.stages.graph import pagerank_int, serial_pagerank_int

        rng = np.random.default_rng(31)
        m = 300_000
        src = rng.integers(0, 10_000, size=m)
        dst = (src * 31 + rng.integers(0, 997, size=m)) % 10_000
        pairs = [(f"n{a}", f"n{b}") for a, b in zip(src, dst)]
        edges = rd.from_pandas(pd.DataFrame(
            {"src": [p[0] for p in pairs], "dst": [p[1] for p in pairs]}
        )).repartition(16)
        got = dict(pagerank_int(edges, iterations=3, num_buckets=32)
                   .to_pandas().itertuples(index=False, name=None))
        expect = serial_pagerank_int(pairs, iterations=3)
        assert got == expect

    def test_hits_100k_edges(self, ray_session):
        """100k-edge multigraph (5k nodes): distributed HITS == serial twin
        bit-for-bit, 2 iterations (the scalar-max renormalization must stay
        exact through the Python-int multiply path)."""
        import ray.data as rd

        from spiderray.stages.graph import hits_int, serial_hits_int

        rng = np.random.default_rng(37)
        m = 100_000
        src = rng.integers(0, 5_000, size=m)
        dst = (src * 17 + rng.integers(0, 499, size=m)) % 5_000
        pairs = [(f"n{a}", f"n{b}") for a, b in zip(src, dst)]
        edges = rd.from_pandas(pd.DataFrame(
            {"src": [p[0] for p in pairs], "dst": [p[1] for p in pairs]}
        )).repartition(16)
        df = hits_int(edges, iterations=2, num_buckets=16).to_pandas()
        got = {r.node: (int(r.hub), int(r.auth))
               for r in df.itertuples(index=False)}
        assert got == serial_hits_int(pairs, iterations=2)


class TestStressFifthContinuation:
    def test_substring_dedup_100k_docs(self, ray_session):
        """ExactSubstr at 100k docs with 1k planted 15-token twins: every
        planted head must be cut, untouched docs byte-identical."""
        import ray.data as rd

        from spiderray.stages.substring_dedup import substring_dedup

        rng = np.random.default_rng(23)
        vocab = [f"v{i}" for i in range(20_000)]
        n = 100_000
        texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(n)]
        rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        for j in range(1000):  # twin copies doc 100j's first 15 tokens
            head = " ".join(texts[j * 100].split()[:15])
            rows.append({"doc_id": n + j, "text": f"{head} zz{j} yy xx"})
        ds = rd.from_pandas(pd.DataFrame(rows))
        out = substring_dedup(ds, window=15).to_pandas().set_index("doc_id")
        cut = sum(1 for j in range(1000)
                  if out.loc[n + j, "text"] == f"zz{j} yy xx")
        assert cut == 1000, f"only {cut}/1000 planted heads removed"
        # spot-check untouched docs (no natural 15-gram dups at this vocab)
        same = sum(1 for i in range(0, n, 9973)
                   if out.loc[i, "text"] == texts[i])
        assert same >= (n // 9973) - 1

    def test_tdigest_5m_values(self, ray_session):
        """t-digest over 5M heavy-tail values: rank error < 0.5% at both
        tails, centroid count bounded."""
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.stats import tdigest_quantiles

        rng = np.random.default_rng(29)
        x = rng.lognormal(2, 2, 5_000_000)
        ds = rd.from_arrow(pa.table({"v": x})).repartition(64)
        res = tdigest_quantiles(ds, "v", [0.001, 0.5, 0.999])
        for q, est in res:
            rank = float((x <= est).mean())
            assert abs(rank - q) < 0.005, (q, est, rank)

    def test_wds_shards_50k_samples(self, ray_session, tmp_path):
        """WebDataset sink at 50k samples / 64 shards: exact-count
        roundtrip and reproducible checksums across partitionings."""
        import pyarrow as pa
        import ray.data as rd

        from spiderray.sources.wds import read_tar_shards, write_tar_shards

        n = 50_000
        t = pa.table({
            "clip_id": [f"c{i:08d}" for i in range(n)],
            "bytes": [bytes([i % 251]) * 200 for i in range(n)],
            "codec": ["pcm_s16le"] * n,
            "sr_hz": [16000] * n,
        })
        m1 = write_tar_shards(rd.from_arrow(t).repartition(16),
                              str(tmp_path / "a"), "clip_id", "bytes",
                              ["codec"], n_shards=64).to_pandas()
        assert m1["n_samples"].sum() == n
        m2 = write_tar_shards(rd.from_arrow(t).repartition(5),
                              str(tmp_path / "b"), "clip_id", "bytes",
                              ["codec"], n_shards=64).to_pandas()
        a = m1.sort_values("shard")["tar_md5"].tolist()
        b = m2.sort_values("shard")["tar_md5"].tolist()
        assert a == b
        back = read_tar_shards(str(tmp_path / "a"))
        assert back.count() == n

    def test_quarantine_sparse_poison_1m_rows(self, ray_session, tmp_path):
        """Quarantine at 1M rows with 100 scattered poison rows: exact
        isolation, everything else processed."""
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.quarantine import (quarantine_map_batches,
                                                 read_quarantine)

        n = 1_000_000
        bad = set(range(9999, n, 10007))

        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            if len(ids) and bool(np.isin(ids, list(bad)).any()):
                raise RuntimeError("poison")
            return pa.table({"doc_id": batch.column("doc_id")})

        t = pa.table({"doc_id": np.arange(n, dtype=np.int64)})
        out = quarantine_map_batches(rd.from_arrow(t).repartition(32), fn,
                                     str(tmp_path / "q"), batch_size=4096)
        assert out.count() == n - len(bad)
        q = read_quarantine(str(tmp_path / "q")).to_pandas()
        assert sorted(q["doc_id"]) == sorted(bad)


class TestStressRound4:
    def test_near_dedup_best_100k_planted_clusters(self, ray_session):
        """100k docs, 5k planted 3-member clusters with known best members:
        every winner is the planted max-score member; join path (cap 0)
        equals broadcast; nothing corpus-sized on the driver."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.dedup import near_dedup_best

        n = 100_000
        ids = np.arange(n, dtype=np.int64)
        # score: planted pattern — cluster base i%20==0 gets members
        # (i, i+1, i+2) with scores (5, 9, 7) → winner i+1
        scores = np.full(n, 1, dtype=np.int64)
        pairs = []
        for i in range(0, n - 2, 20):
            scores[i], scores[i + 1], scores[i + 2] = 5, 9, 7
            pairs.append({"id_a": int(i), "id_b": int(i + 1)})
            pairs.append({"id_a": int(i + 1), "id_b": int(i + 2)})
        t = pa.table({"doc_id": ids, "score": scores})
        out = near_dedup_best(
            rd.from_arrow(t).repartition(32), rd.from_items(pairs),
            id_col="doc_id", score_col="score",
        ).to_pandas()
        kept = set(out["doc_id"])
        for i in range(0, n - 2, 20):
            assert i + 1 in kept and i not in kept and i + 2 not in kept
        # non-members all survive
        assert len(kept) == n - 2 * len(range(0, n - 2, 20))


class TestStressRound4Wave:
    def test_paragraph_dedup_100k(self, ray_session):
        """Global paragraph dedup at 100k docs with a 1k-way shared
        boilerplate paragraph pool: exactly one global winner per distinct
        paragraph, untouched docs byte-identical."""
        import ray.data as rd

        from spiderray.stages.c4 import paragraph_dedup

        n = 100_000
        rows = [
            {"doc_id": i,
             "text": f"boiler {i % 1000}\nunique body {i}\nfooter {i % 777}"}
            for i in range(n)
        ]
        out = paragraph_dedup(rd.from_pandas(pd.DataFrame(rows))).to_pandas()
        assert len(out) == n
        # every shared paragraph survives exactly once corpus-wide
        paras = [p for t in out.text for p in t.split("\n")
                 if p.startswith("boiler ")]
        assert len(paras) == 1000 and len(set(paras)) == 1000
        # winners are the global minimum (doc_id, idx) occurrences
        m = out.set_index("doc_id")
        for k in (0, 1, 999):
            assert m.loc[k, "text"].startswith(f"boiler {k}\n")
        # a late doc keeps only its unique body
        assert m.loc[n - 1, "text"] == f"unique body {n - 1}"

    def test_hamming_pairs_200k_hashes(self, ray_session):
        """The shared pigeonhole kernel at 200k synthetic 64-bit hashes
        with 2k planted near-pairs (1-2 bit flips): full recall, no
        false accepts."""
        import ray.data as rd

        from spiderray.stages.dedup import hamming64_pairs

        rng = np.random.default_rng(5)
        n = 200_000
        base = rng.integers(0, 2 ** 63, size=n, dtype=np.int64).astype(np.uint64)
        ids = np.arange(n, dtype=np.int64)
        flip = (np.uint64(1) << rng.integers(0, 64, size=2000).astype(np.uint64))
        dup_h = base[:2000] ^ flip
        h = np.concatenate([base, dup_h])
        all_ids = np.concatenate([ids, ids[:2000] + 1_000_000])
        ds = rd.from_arrow(__import__("pyarrow").table({
            "doc_id": all_ids, "sim": h}))
        pairs = hamming64_pairs(ds, hash_col="sim", max_hamming=3).to_pandas()
        got = set(map(tuple,
                      pairs[["id_a", "id_b"]].drop_duplicates().to_numpy()))
        want = {(int(i), int(i) + 1_000_000) for i in ids[:2000]}
        assert want <= got, f"missing {len(want - got)} planted pairs"
        # verify no false accepts: every returned pair is within distance 3
        hmap = dict(zip(all_ids.tolist(), h.tolist()))
        for a, b in got:
            assert bin(hmap[a] ^ hmap[b]).count("1") <= 3

    def test_decontaminate_spans_200k(self, ray_session):
        """Span salvage at 200k docs: contaminated docs lose exactly the
        planted window, clean docs pass byte-identical."""
        import ray.data as rd

        from spiderray.stages.dedup import decontaminate_spans

        n = 200_000
        evil = "the forbidden eval answer span goes right here now"  # 9 words
        rows = [
            {"doc_id": i,
             "text": (f"prefix {i} " + evil + f" suffix {i}"
                      if i % 100 == 0 else f"clean document body {i}")}
            for i in range(n)
        ]
        bench = rd.from_items([{"text": evil}])
        out = decontaminate_spans(
            rd.from_pandas(pd.DataFrame(rows)), bench, n=9).to_pandas()
        hit = out[out.decontaminated]
        assert len(hit) == n // 100
        assert (hit.n_cut_words == 9).all()
        sample = hit.sort_values("doc_id").iloc[0]
        assert sample.text == "prefix 0 suffix 0"
        clean = out[~out.decontaminated]
        assert (clean.n_cut_words == 0).all()


class TestStressAudioQc:
    def test_qc_battery_20k_clips(self, ray_session):
        """The fused QC battery at 20k clips (40x the driver scale):
        every stratum must still map exactly to its flag — no drift, no
        stragglers, nothing driver-sized."""
        import pyarrow as pa
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.pipelines.queries import _qc_clips_batch
        from spiderray.stages.audioquality import audio_qc_stage

        n = 20_000
        ids = rd.range(n).map_batches(
            lambda b: pa.table({"doc_id": pa.array(b["id"], pa.int64())}),
            batch_format="pandas")
        clips = ids.map_batches(_qc_clips_batch, batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=512)
        out = audio_qc_stage(clips, PipelineConfig(), concurrency=4)

        def verdicts(batch: pa.Table) -> pa.Table:
            import numpy as np_

            cid = np_.array([int(c[3:]) for c in
                             batch.column("clip_id").to_pylist()])
            stratum = np_.where(cid % 17 == 5, -1, cid % 11)
            keep = batch.column("keep").to_numpy(zero_copy_only=False)
            want_keep = np_.isin(stratum, (0, 10))
            return pa.table({
                "ok": pa.array(keep == want_keep),
            })

        agree = out.map_batches(verdicts, batch_format="pyarrow")
        assert agree.sum("ok") == n  # every clip's verdict is exact

    def test_prepare_speech_streams_5k(self, ray_session):
        """The composite at 5k clips: segment count equals the surviving
        clean-strata clip count (one burst utterance each)."""
        import pyarrow as pa
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.pipelines.prepare_speech import prepare_speech
        from spiderray.pipelines.queries import _qc_clips_batch

        n = 5_000
        ids = rd.range(n).map_batches(
            lambda b: pa.table({"doc_id": pa.array(b["id"], pa.int64())}),
            batch_format="pandas")
        clips = ids.map_batches(_qc_clips_batch, batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=512)
        segs = prepare_speech(clips, PipelineConfig())
        want = sum(1 for i in range(n)
                   if i % 17 != 5 and (i % 11) in (0, 10))
        assert segs.count() == want


class TestStressFifthWave:
    def test_prototype_prune_200k_vectors(self, ray_session):
        """Prune at 200k 32-dim vectors / 16 clusters: per-cluster drop
        counts respect the budget, pruned scores dominate kept scores,
        and the histogram exchange stays k-bounded."""
        import ray.data as rd

        from spiderray.stages import ann, dedup

        rng = np.random.default_rng(23)
        n, d, k = 200_000, 32, 16
        centers = rng.standard_normal((k, d)) * 4
        V = centers[np.arange(n) % k] + rng.standard_normal((n, d)) * 0.5
        df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                           "embedding": [list(r) for r in V]})
        ds = rd.from_pandas(df).repartition(32)
        init = ann.smallest_id_vectors(ds, k)
        out = dedup.prototype_prune(ds, n_clusters=k, iters=2,
                                    drop_frac=0.25, init=init).to_pandas()
        assert len(out) == n
        assert out["pruned"].sum() > 0
        for c, g in out.groupby("cluster"):
            nd = int(g["pruned"].sum())
            assert nd <= int(0.25 * len(g))
            if nd:
                assert (g[g["pruned"]]["proto_milli"].min()
                        > g[~g["pruned"]]["proto_milli"].max())

    def test_canary_scan_200k_docs(self, ray_session):
        """Governance scan at 200k docs x 20 canaries: exact counts."""
        import ray.data as rd

        from spiderray.stages.stats import canary_scan

        n = 200_000
        canaries = [f"CANARY-{j:04d}" for j in range(20)]
        # canary j planted in docs where i % (j+2) == 0, once
        texts = []
        for i in range(n):
            t = f"doc {i} body"
            for j in range(20):
                if i % (j + 2) == 0:
                    t += " " + canaries[j]
            texts.append(t)
        df = pd.DataFrame({"doc_id": range(n), "text": texts})
        out = canary_scan(rd.from_pandas(df).repartition(32), canaries)
        got = {r.canary: (r.n_docs, r.n_occurrences)
               for r in out.itertuples()}
        for j in range(20):
            want = (n + (j + 1)) // (j + 2)
            assert got[canaries[j]] == (want, want), (j, got[canaries[j]])

    def test_mojibake_200k_rows(self, ray_session):
        """Mojibake repair at 200k rows (10% single-mangled, 5% double):
        every mangled row recovers byte-identically; ASCII fast path
        leaves the rest untouched."""
        import ray.data as rd

        from spiderray.stages.textnorm_stage import fix_mojibake_stage

        n = 200_000
        base = "The Bär sägt — '’' hello row "
        texts, expect_passes = [], []
        for i in range(n):
            t = base + str(i) if i % 10 == 0 or i % 20 == 1 else f"ascii row {i}"
            if i % 10 == 0:
                t1 = t.encode("utf-8").decode("latin-1")
                texts.append(t1)
                expect_passes.append(1)
            elif i % 20 == 1:
                t2 = (t.encode("utf-8").decode("latin-1")
                      .encode("utf-8").decode("latin-1"))
                texts.append(t2)
                expect_passes.append(2)
            else:
                texts.append(t)
                expect_passes.append(0)
        df = pd.DataFrame({"doc_id": range(n), "text": texts})
        out = (fix_mojibake_stage(rd.from_pandas(df).repartition(32))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert list(out["moji_passes"]) == expect_passes
        fixed = out["text"].to_numpy()
        for i in (0, 10, 21, 41, 2):
            want = (base + str(i)) if expect_passes[i] else f"ascii row {i}"
            assert fixed[i] == want, i


class TestStressFifthWaveB:
    def test_batch_topk_200k_vectors_16_queries(self, ray_session):
        """Batched retrieval at 200k x 32-dim, 16 queries: per-block
        traffic stays q*k rows, results match per-query brute force on
        a sampled query."""
        import ray.data as rd

        from spiderray.stages import ann

        rng = np.random.default_rng(31)
        n, d = 200_000, 32
        V = rng.standard_normal((n, d))
        df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                           "embedding": [list(r) for r in V]})
        ds = rd.from_pandas(df).repartition(32)
        Q = V[:16]
        out = ann.batch_topk(ds, Q, k=10)
        assert len(out) == 160
        # query j IS corpus row j: rank-0 hit must be itself at sim 1000
        g0 = out[out["query_idx"] == 7].iloc[0]
        assert g0["vec_id"] == 7 and g0["sim_milli"] == 1000
        single = ann.brute_force_topk(rd.from_pandas(df), Q[3], k=10)
        assert (list(out[out["query_idx"] == 3]["vec_id"])
                == list(single["vec_id"]))

    def test_rank_blend_500k_rows(self, ray_session):
        """Rank blend at 500k rows: the exchange is the distinct-value
        histogram (~1k rows/signal), ranks are exact at the extremes
        and partition-invariant by construction."""
        import ray.data as rd

        from spiderray.stages.stats import rank_blend

        n = 500_000
        df = pd.DataFrame({
            "doc_id": np.arange(n, dtype=np.int64),
            "s1": (np.arange(n) % 997).astype(np.int64),
            "s2": ((np.arange(n) * 31) % 1009).astype(np.int64),
        })
        out = (rank_blend(rd.from_pandas(df).repartition(32),
                          ["s1", "s2"]).to_pandas())
        assert len(out) == n
        mn = out[out["s1"] == 0]["rank_s1_ppm"]
        assert (mn == 0).all()
        mx = out[out["s1"] == 996]["rank_s1_ppm"]
        # count_below of the top value = n - count(top)
        expect = (n - (mx.size)) * 1_000_000 // (n - 1)
        assert (mx == expect).all()
        assert out["blend_ppm"].between(0, 1_000_000).all()


class TestStressFuzzy:
    def test_levenshtein_pairs_200k_short_strings(self, ray_session):
        """200k short strings (8-40 chars, spread lengths) with 2k planted
        one-edit twins: every planted pair found, length-band groups stay
        under the cap."""
        import ray.data as rd

        from spiderray.stages.dedup import levenshtein_pairs

        rng = np.random.default_rng(23)
        n = 200_000
        alpha = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        rows = []
        for i in range(n):
            ln = 8 + int(rng.integers(0, 33))
            rows.append({"doc_id": i,
                         "text": "".join(rng.choice(alpha, size=ln))})
        planted = []
        for j in range(2000):
            base = rows[j * 97]["text"]
            m = len(base) // 2
            planted.append({"doc_id": n + j,
                            "text": base[:m] + "0" + base[m + 1:]})
        ds = rd.from_pandas(pd.DataFrame(rows + planted)).repartition(64)
        pairs = levenshtein_pairs(ds, max_d=1, max_group=50_000).to_pandas()
        found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
        missing = [(j * 97, n + j) for j in range(2000)
                   if (j * 97, n + j) not in found]
        assert not missing, f"missing {len(missing)}: {missing[:5]}"
