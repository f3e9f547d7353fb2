"""WordPiece trainer: incremental == naive; greedy encode; stage."""

import random
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa

from spiderray.stages.wordpiece_train import (UNK, _merge_token, _wp_symbols,
                                              train_wordpiece_merges,
                                              wordpiece_encode_stage,
                                              wordpiece_encode_word,
                                              wordpiece_vocab)


def _naive_train(word_freqs, num_merges):
    """Full pair+unit recount every merge — the reference algorithm."""
    words = {tuple(_wp_symbols(w)): n for w, n in word_freqs}
    merges = []
    for _ in range(num_merges):
        pc, uc = Counter(), Counter()
        for syms, n in words.items():
            for s in syms:
                uc[s] += n
            for p in zip(syms, syms[1:]):
                pc[p] += n
        best = None
        bc = bl = br = 0
        for p, c in sorted(pc.items()):
            if c <= 0:
                continue
            l_cnt, r_cnt = uc[p[0]], uc[p[1]]
            if best is None or c * bl * br > bc * l_cnt * r_cnt:
                best, bc, bl, br = p, c, l_cnt, r_cnt
        if best is None:
            break
        joined = _merge_token(*best)
        merges.append((best[0], best[1], joined))
        nw = defaultdict(int)
        for syms, n in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nw[tuple(out)] += n
        words = nw
    return merges


class TestTrainer:
    def test_score_prefers_exclusive_pairs(self):
        # "xy" always co-occur (score 1·…); "ab" are frequent but occur
        # apart — WordPiece merges (x, ##y) first even though (a, ##b)
        # has the higher raw count.  BPE would pick (a, ##b).
        wf = [("ab", 10), ("a", 90), ("b", 90), ("xy", 4)]
        merges = train_wordpiece_merges(wf, 1)
        assert merges[0][:2] == ("x", "##y")

    def test_incremental_equals_naive_random(self):
        random.seed(7)
        for trial in range(25):
            words = sorted({
                "".join(random.choices("abcde", k=random.randint(1, 7)))
                for _ in range(random.randint(2, 30))})
            wf = [(w, random.randint(1, 40)) for w in words]
            nm = random.randint(1, 20)
            assert train_wordpiece_merges(wf, nm) == _naive_train(wf, nm), \
                (trial, wf, nm)

    def test_merge_token_prefix_propagation(self):
        assert _merge_token("h", "##u") == "hu"
        assert _merge_token("##g", "##s") == "##gs"

    def test_vocab_alphabet_then_merges(self):
        v = wordpiece_vocab([("hug", 8), ("hugs", 3)], 2)
        assert v[:4] == sorted({"h", "##u", "##g", "##s"})  # alphabet first
        assert v[4:] == [m[2] for m in
                         train_wordpiece_merges([("hug", 8), ("hugs", 3)], 2)]


class TestEncode:
    def _vocab(self):
        return frozenset(wordpiece_vocab(
            [("hugging", 5), ("hugs", 3), ("hug", 8)], 6))

    def test_longest_match_first(self):
        v = self._vocab()
        assert wordpiece_encode_word("hugging", v) == ["hu", "##gging"]
        assert wordpiece_encode_word("hugs", v) == ["hu", "##gs"]

    def test_unknown_collapses_whole_word(self):
        assert wordpiece_encode_word("zebra", self._vocab()) == [UNK]
        assert wordpiece_encode_word("hugz", self._vocab()) == [UNK]

    def test_overlong_word_is_unk(self):
        assert wordpiece_encode_word("h" * 101, self._vocab()) == [UNK]

    def test_empty(self):
        assert wordpiece_encode_word("", self._vocab()) == []


class TestStage:
    def test_counts_distributed(self, ray_session):
        import ray.data as rd

        t = pa.table({
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["hug hugging", "hugs zebra", None, ""],
        })
        vocab = wordpiece_vocab([("hugging", 5), ("hugs", 3), ("hug", 8)], 6)
        out = (wordpiece_encode_stage(rd.from_arrow(t).repartition(2), vocab)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # hug→hu ##g (2), hugging→hu ##gging (2); hugs→2, zebra→UNK (1)
        assert out["n_wp_tokens"].tolist() == [4, 3, 0, 0]
        assert out["n_unk"].tolist() == [0, 1, 0, 0]

    def test_training_partition_invariant(self, ray_session):
        import ray.data as rd

        from spiderray.stages.wordpiece_train import train_wordpiece

        rng = np.random.default_rng(3)
        texts = [" ".join(rng.choice(["alpha", "beta", "gamma", "alphabet",
                                      "better", "gamble"], size=12))
                 for _ in range(200)]
        df = pd.DataFrame({"text": texts})
        m1 = train_wordpiece(rd.from_pandas(df).repartition(3), num_merges=30)
        m2 = train_wordpiece(rd.from_pandas(df).repartition(11), num_merges=30)
        # the 6-word inventory exhausts all pairs before 30 merges
        assert m1 == m2 and len(m1) == 24


class TestFertility:
    def test_per_lang_card(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from spiderray.stages.wordpiece_train import wordpiece_fertility

        # vocab: 'ab' whole word, 'a' + '##b' pieces, nothing for 'zq'
        vocab = ["[UNK]", "ab", "a", "b", "##b", "c", "##c"]
        df = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "lang": ["en", "en", "de"],
            "text": ["ab ab", "ab zq", "cb"],
        })
        out = wordpiece_fertility(rd.from_pandas(df), vocab,
                                  key_col="lang")
        en = out[out["lang"] == "en"].iloc[0]
        de = out[out["lang"] == "de"].iloc[0]
        # en: words ab,ab,ab,zq -> tokens 1+1+1+1(UNK) = 4; unk 1
        assert (en["n_docs"], en["n_words"], en["n_wp_tokens"],
                en["n_unk"]) == (2, 4, 4, 1)
        assert en["fertility_ppm"] == 1_000_000
        assert en["unk_ppm"] == 250_000
        # de: 'cb' -> c + ##b = 2 tokens, 1 word -> fertility 2.0
        assert (de["n_words"], de["n_wp_tokens"], de["n_unk"]) == (1, 2, 0)
        assert de["fertility_ppm"] == 2_000_000

    def test_partition_invariance(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from spiderray.stages.wordpiece_train import wordpiece_fertility

        vocab = ["[UNK]", "a", "##a", "b", "##b"]
        df = pd.DataFrame({
            "doc_id": range(100),
            "lang": ["en" if i % 2 else "fr" for i in range(100)],
            "text": ["ab ba aab" if i % 3 else "zz ab" for i in range(100)],
        })
        a = wordpiece_fertility(rd.from_pandas(df), vocab, key_col="lang")
        b = wordpiece_fertility(rd.from_pandas(df).repartition(7), vocab,
                                key_col="lang")
        pd.testing.assert_frame_equal(a, b)
