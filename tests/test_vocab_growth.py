"""Heaps-law vocabulary-growth card (stages/stats.vocab_growth):
hand-computed first-occurrence semantics and partition invariance."""

import pyarrow as pa

from spiderray.stages.stats import vocab_growth


def _docs(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })


class TestVocabGrowth:
    def test_hand_computed(self, ray_session):
        import ray.data as rd

        # max_id 9, 10 buckets -> bucket == doc_id
        t = _docs([
            (0, "a b a"),        # a,b first here        -> bucket 0: 2
            (1, "b c"),          # c first here          -> bucket 1: 1
            (5, "c d e"),        # d,e first here        -> bucket 5: 2
            (9, "a  f"),         # f first (double space)-> bucket 9: 1
        ])
        out = vocab_growth(rd.from_arrow(t), max_id=9, n_buckets=10)
        assert out.bucket.tolist() == [0, 1, 5, 9]
        assert out.new_terms.tolist() == [2, 1, 2, 1]
        assert out.cum_vocab.tolist() == [2, 3, 5, 6]

    def test_partition_invariant(self, ray_session):
        import ray.data as rd

        rows = [(i, f"w{i % 7} w{i % 13} shared") for i in range(60)]
        t = _docs(rows)
        outs = []
        for blocks in (1, 8):
            ds = rd.from_arrow(t).repartition(blocks)
            outs.append(vocab_growth(ds, max_id=59, n_buckets=10))
        assert outs[0].equals(outs[1])
        # w0..w12 (the %7 set is a subset of the %13 set) + "shared"
        assert outs[0].cum_vocab.iloc[-1] == 14

    def test_empty_and_whitespace_only_rows(self, ray_session):
        import ray.data as rd

        t = _docs([(0, "x"), (1, ""), (2, "   "), (3, "\t\n"), (4, "y x")])
        out = vocab_growth(rd.from_arrow(t), max_id=4, n_buckets=5)
        assert out.new_terms.sum() == 2
        assert out.bucket.tolist() == [0, 4]


class TestZipfRanks:
    def test_hand_computed(self, ray_session):
        import ray.data as rd

        from spiderray.stages.textindex import zipf_ranks

        t = _docs([(0, "a a a b b c"), (1, "a b  c d"), (2, "")])
        out = zipf_ranks(rd.from_arrow(t), top_n=3)
        # counts: a=4 b=3 c=2 d=1, total 10
        assert out.term.tolist() == ["a", "b", "c"]
        assert out["rank"].tolist() == [1, 2, 3]
        assert out.n.tolist() == [4, 3, 2]
        # round-half-up ppm: 400000, 300000, 200000
        assert out.ppm.tolist() == [400000, 300000, 200000]

    def test_tie_break_and_partition_invariance(self, ray_session):
        import ray.data as rd

        from spiderray.stages.textindex import zipf_ranks

        rows = [(i, "z y x w") for i in range(40)]
        t = _docs(rows)
        outs = []
        for blocks in (1, 6):
            ds = rd.from_arrow(t).repartition(blocks)
            outs.append(zipf_ranks(ds, top_n=4))
        assert outs[0].equals(outs[1])
        # equal counts -> term-ascending tie break
        assert outs[0].term.tolist() == ["w", "x", "y", "z"]


def test_all_whitespace_batch_schema_stable(ray_session):
    import ray.data as rd

    # one block of only-whitespace docs must not emit a NULL-typed block
    rows = [(i, "   ") for i in range(10)] + [(i, f"t{i}") for i in range(10, 20)]
    t = _docs(rows)
    ds = rd.from_arrow(t).repartition(4)
    out = vocab_growth(ds, max_id=19, n_buckets=4)
    assert out.new_terms.sum() == 10
