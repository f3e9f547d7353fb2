"""BPE tokenizer training + encode (stages/bpe_train)."""

import random

import pyarrow as pa
import pytest

from spiderray.stages.bpe_train import (
    BpeEncoder,
    bpe_encode_stage,
    corpus_word_freqs,
    encode_word,
    train_bpe,
    train_bpe_merges,
)


def _naive_train(word_freqs, num_merges):
    """Full-recount reference trainer (mirrors the serial oracle)."""
    from collections import defaultdict

    def symbols(word):
        chars = list(word)
        chars[-1] += "</w>"
        return tuple(chars)

    words = defaultdict(int)
    for w, n in word_freqs:
        words[symbols(w)] += n
    merges = []
    for _ in range(num_merges):
        counts = defaultdict(int)
        for syms, n in words.items():
            for pair in zip(syms, syms[1:]):
                counts[pair] += n
        if not counts:
            break
        best = min(counts.items(), key=lambda t: (-t[1], t[0]))[0]
        merges.append(best)
        new_words = defaultdict(int)
        for syms, n in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] += n
        words = new_words
    return merges


def _replay_encode(word, merges):
    chars = list(word)
    chars[-1] += "</w>"
    syms = chars
    for a, b in merges:
        if len(syms) < 2:
            break
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return tuple(syms)


def test_classic_low_lower_merges():
    # the Sennrich walkthrough corpus: 'lo' then 'low' dominate
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe_merges(freqs, num_merges=4)
    assert merges[0] == ("e", "s")            # 9 occurrences
    assert merges[1] == ("es", "t</w>")       # 9
    assert ("l", "o") in merges[:4]           # 7
    assert merges == _naive_train(freqs, 4)


def test_incremental_equals_naive_random():
    rng = random.Random(7)
    alphabet = "abcde"
    for trial in range(8):
        freqs = []
        seen = set()
        for _ in range(40):
            w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
            if w not in seen:
                seen.add(w)
                freqs.append((w, rng.randint(1, 20)))
        n = rng.randint(1, 60)
        assert train_bpe_merges(freqs, n) == _naive_train(freqs, n), trial


def test_greedy_encode_equals_replay():
    rng = random.Random(11)
    freqs = [
        ("".join(rng.choice("abcdef") for _ in range(rng.randint(1, 10))), rng.randint(1, 9))
        for _ in range(60)
    ]
    freqs = list(dict(freqs).items())
    merges = train_bpe_merges(freqs, 80)
    ranks = {m: i for i, m in enumerate(merges)}
    for _ in range(200):
        w = "".join(rng.choice("abcdefg") for _ in range(rng.randint(1, 12)))
        assert encode_word(w, ranks) == _replay_encode(w, merges), w


def test_encode_word_roundtrip_surface():
    # pieces concatenate back to the word + end marker, regardless of merges
    freqs = [("hello", 3), ("help", 2), ("world", 4)]
    ranks = {m: i for i, m in enumerate(train_bpe_merges(freqs, 20))}
    for w in ("hello", "help", "world", "held", "x"):
        assert "".join(encode_word(w, ranks)) == w[:-1] + w[-1] + "</w>"


def test_encoder_empty_and_null_text():
    enc = BpeEncoder([("a", "b</w>")])
    out = enc(pa.table({"text": pa.array(["", None, "ab"], pa.string())}))
    assert out.column("n_bpe_tokens").to_pylist() == [0, 0, 1]


def test_corpus_word_freqs_and_stage(ray_session):
    import ray.data as rd

    docs = ["the cat sat", "the cat", "a dog"] * 4
    ds = rd.from_items([{"text": t} for t in docs])
    freqs = corpus_word_freqs(ds, "text")
    assert dict(freqs)["the"] == 8 and dict(freqs)["dog"] == 4
    # deterministic ordering: (-count, word)
    assert freqs == sorted(freqs, key=lambda t: (-t[1], t[0]))

    merges = train_bpe(ds, "text", num_merges=10)
    assert merges == _naive_train(freqs, 10)

    out = bpe_encode_stage(ds, merges, "text", emit_pieces=True).to_pandas()
    ranks = {m: i for i, m in enumerate(merges)}
    for t, n, pieces in zip(out["text"], out["n_bpe_tokens"], out["bpe_pieces"]):
        want = []
        for tok in t.lower().split():
            want.extend(encode_word(tok, ranks))
        assert n == len(want)
        assert pieces == " ".join(want)


def test_max_words_cap_is_deterministic():
    freqs = [("aa", 5), ("ab", 5), ("ac", 5), ("ba", 2)]
    # cap in the middle of the tie: lexicographic order decides
    merges_all = train_bpe_merges(freqs, 5)
    merges_capped = train_bpe_merges(freqs[:2], 5)
    assert isinstance(merges_all, list) and isinstance(merges_capped, list)


def test_stage_handles_num_merges_exhaustion():
    # asking for more merges than the pair domain supports terminates
    assert len(train_bpe_merges([("ab", 1)], 100)) <= 2
