"""Unigram-LM tokenizer (stages/unigram_train.py, Kudo 2018 hard-EM)."""

import math

import numpy as np
import pyarrow as pa

from spiderray.stages.unigram_train import (UnigramEncoder, _viterbi,
                                            train_unigram)

WF = [("lowering", 50), ("lower", 120), ("lowest", 80), ("newest", 70),
      ("new", 200), ("wider", 40), ("widest", 30), ("low", 250)]


def _scores(vocab):
    total = sum(c for _, c in vocab) or 1
    return {p: math.log(c / total) for p, c in vocab if c > 0}


class TestUnigramTrain:
    def test_frequent_whole_words_become_pieces(self):
        vocab = train_unigram(WF, vocab_size=40, seed_size=100, n_iters=4)
        pieces = {p for p, _ in vocab}
        assert {"low", "new", "lower", "lowest", "newest"} <= pieces

    def test_deterministic(self):
        v1 = train_unigram(WF, vocab_size=40, seed_size=100, n_iters=4)
        v2 = train_unigram(WF, vocab_size=40, seed_size=100, n_iters=4)
        assert v1 == v2

    def test_char_coverage_never_fails(self):
        vocab = train_unigram(WF, vocab_size=10, seed_size=20, n_iters=2)
        sc = _scores(vocab)
        # word with chars absent from training still segments
        assert len(_viterbi("zzzq", sc, 6)) == 4

    def test_viterbi_prefers_fewer_pieces(self):
        sc = {"ab": math.log(0.25), "a": math.log(0.25), "b": math.log(0.25)}
        # ab (one piece, -1.386) beats a+b (two pieces, -2.77)
        assert _viterbi("ab", sc, 6) == ("ab",)

    def test_vocab_size_respected(self):
        vocab = train_unigram(WF, vocab_size=12, seed_size=200, n_iters=3)
        assert len(vocab) <= 12


class TestUnigramEncode:
    def test_counts_and_pieces(self):
        vocab = train_unigram(WF, vocab_size=40, seed_size=100, n_iters=4)
        enc = UnigramEncoder(vocab, emit_pieces=True)
        out = enc(pa.table({"text": ["the lowest newest", None, ""]}))
        n = out.column("n_unigram_tokens").to_pylist()
        assert n[1] == 0 and n[2] == 0 and n[0] >= 3
        pieces = out.column("unigram_pieces").to_pylist()[0].split()
        assert "lowest" in pieces and "newest" in pieces

    def test_distributed_encode_matches_serial(self, ray_session):
        import ray.data as rd

        from spiderray.stages.unigram_train import unigram_encode_stage

        vocab = train_unigram(WF, vocab_size=40, seed_size=100, n_iters=4)
        texts = [f"doc {i} has the lowest newest wider text" for i in range(500)]
        t = pa.table({"doc_id": np.arange(500), "text": texts})
        dist = (unigram_encode_stage(rd.from_arrow(t).repartition(5), vocab)
                .select_columns(["doc_id", "n_unigram_tokens"])
                .to_pandas().sort_values("doc_id").reset_index(drop=True))
        ser = UnigramEncoder(vocab)(t).to_pandas()
        assert dist["n_unigram_tokens"].tolist() == ser["n_unigram_tokens"].tolist()
