"""ExactSubstr token-window dedup (Lee et al. 2021 —
functions/leespan.py + stages/substring_dedup.py)."""

import numpy as np
import pyarrow as pa

from spiderray.functions.leespan import doc_window_hashes, remove_token_spans


class TestLeespanFunctions:
    def test_window_hashes_order_sensitive(self):
        h1, s1 = doc_window_hashes("a b c d e", 3)
        h2, _ = doc_window_hashes("b a c d e", 3)
        assert len(h1) == 3 and list(s1) == [0, 1, 2]
        assert h1[0] != h2[0]  # 'a b c' vs 'b a c'
        # identical windows hash identically across documents
        h3, _ = doc_window_hashes("x a b c", 3)
        assert h1[0] == h3[1]

    def test_short_doc_empty(self):
        h, s = doc_window_hashes("one two", 3)
        assert len(h) == 0 and len(s) == 0

    def test_remove_token_spans_merges_overlaps(self):
        text = "t0 t1 t2 t3 t4 t5 t6 t7"
        # spans [1,4) and [3,6) overlap → drop t1..t5
        assert remove_token_spans(text, [1, 3], 3) == "t0 t6 t7"
        assert remove_token_spans(text, [], 3) == text


class TestSubstringDedup:
    def _corpus(self):
        # doc 1 and doc 5 share tokens w0..w9 (a 10-token duplicate);
        # doc 7 is untouched
        head = " ".join(f"w{k}" for k in range(10))
        return pa.table({
            "doc_id": np.array([1, 5, 7], np.int64),
            "text": [f"{head} one extra", f"{head} totally different end",
                     "completely unrelated words here live happily"],
        })

    def test_winner_keeps_loser_cut(self, ray_session):
        import ray.data as rd

        from spiderray.stages.substring_dedup import substring_dedup

        out = (substring_dedup(rd.from_arrow(self._corpus()), window=10)
               .to_pandas().set_index("doc_id")["text"])
        head = " ".join(f"w{k}" for k in range(10))
        assert out[1] == f"{head} one extra"          # min id keeps
        assert out[5] == "totally different end"      # duplicate head cut
        assert out[7].startswith("completely")        # untouched

    def test_partitioning_invariant(self, ray_session):
        import ray.data as rd

        from spiderray.stages.substring_dedup import substring_dedup

        rng = np.random.default_rng(3)
        vocab = [f"v{k}" for k in range(40)]
        texts = [" ".join(rng.choice(vocab, 30)) for _ in range(60)]
        # plant: doc 10 copies doc 2's first 12 tokens
        texts[10] = " ".join(texts[2].split()[:12]) + " zz yy xx"
        t = pa.table({"doc_id": np.arange(60, dtype=np.int64), "text": texts})
        r1 = (substring_dedup(rd.from_arrow(t).repartition(2), window=12)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
        r2 = (substring_dedup(rd.from_arrow(t).repartition(9), window=12)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert r1.equals(r2)
        assert r1.loc[10, "text"] == "zz yy xx"  # planted head removed


def test_composes_with_prepare_corpus(ray_session):
    """ExactSubstr rewrites text upstream of prepare_corpus: the composed
    run must flow end-to-end with the cut text feeding the decide pass."""
    import ray.data as rd

    from spiderray.pipelines.prepare_corpus import prepare_corpus
    from spiderray.stages.substring_dedup import substring_dedup

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    out = prepare_corpus(substring_dedup(ds, window=20)).to_pandas()
    assert len(out) == ds.count()
    assert {"keep", "split", "doc_id"} <= set(out.columns)
