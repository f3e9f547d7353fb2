"""Distributed WordPiece tokenizer training + encode stage.

WordPiece (Schuster & Nakajima 2012, public method; the pair-scoring
formulation documented in the HuggingFace tokenizers course) completes
the repo's tokenizer-training family next to BPE (stages/bpe_train) and
unigram-LM (stages/unigram_train).  It differs from BPE in the merge
objective: instead of the most FREQUENT pair it merges the pair
maximizing ``score = count(pair) / (count(left) · count(right))`` — a
likelihood ratio preferring pairs whose parts rarely occur apart — and
non-initial symbols carry the ``##`` continuation prefix.  Encoding is
greedy longest-match-first per word with an ``[UNK]`` fallback (NOT a
merge replay, unlike BPE).

Scale shape identical to bpe_train:

* the distributed part is the word-frequency table
  (``bpe_train.corpus_word_freqs`` — per-batch Counters, keyed
  groupby-Sum, only DISTINCT words cross the shuffle, Zipf-capped);
* the merge loop is driver-side over that bounded table with
  incremental pair/unit-count maintenance;
* scores compare via exact INTEGER cross-multiplication
  (c1·l2·r2 vs c2·l1·r1) so selection is bit-deterministic — no float
  ratio ever enters — with ties broken on the lexicographically
  smallest pair;
* encoding streams: the learned vocab ships once per map task and
  word → piece-count is memoized per worker (Zipf cache).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.tokenize import RE_BPE_TOKEN

CONT = "##"
UNK = "[UNK]"


def _wp_symbols(word: str) -> list[str]:
    if not word:
        return []
    return [word[0]] + [CONT + c for c in word[1:]]


def _merge_token(a: str, b: str) -> str:
    return a + (b[len(CONT):] if b.startswith(CONT) else b)


def train_wordpiece_merges(word_freqs, num_merges: int = 1000):
    """Learn ``num_merges`` WordPiece merges from a ``[(word, count)]``
    table.  Returns ``[(left, right, merged), ...]`` in merge order.

    Deterministic: the best pair maximizes count(pair) / (count(left) ·
    count(right)) compared via exact integer cross-multiplication; ties
    break on the lexicographically smallest (left, right).  Incremental
    maintenance — a merge re-counts only words containing the merged
    pair (pair → word-index map), mirroring train_bpe_merges."""
    from collections import Counter

    words = [_wp_symbols(w) for w, _ in word_freqs]
    freqs = [int(n) for _, n in word_freqs]

    pair_counts: Counter = Counter()
    unit_counts: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, n) in enumerate(zip(words, freqs)):
        for s in syms:
            unit_counts[s] += n
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += n
            where.setdefault((a, b), set()).add(idx)

    merges: list[tuple[str, str, str]] = []
    for _ in range(num_merges):
        best = None
        bc = bl = br = 0  # best pair's count and its parts' unit counts
        for pair, cnt in pair_counts.items():
            if cnt <= 0:
                continue
            l_cnt = unit_counts[pair[0]]
            r_cnt = unit_counts[pair[1]]
            if best is None:
                better = True
            else:
                lhs = cnt * bl * br        # exact ints: cnt/(l·r) vs bc/(bl·br)
                rhs = bc * l_cnt * r_cnt
                better = lhs > rhs or (lhs == rhs and pair < best)
            if better:
                best, bc, bl, br = pair, cnt, l_cnt, r_cnt
        if best is None:
            break
        joined = _merge_token(*best)
        merges.append((best[0], best[1], joined))
        touched = where.pop(best, set())
        pair_counts.pop(best, None)
        for idx in touched:
            syms = words[idx]
            n = freqs[idx]
            for s in syms:
                unit_counts[s] -= n
            for a, b in zip(syms, syms[1:]):
                p = (a, b)
                if p in pair_counts:
                    pair_counts[p] -= n
                    if pair_counts[p] <= 0:
                        del pair_counts[p]
                if p in where:
                    where[p].discard(idx)
            out = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[idx] = out
            for s in out:
                unit_counts[s] += n
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] += n
                where.setdefault((a, b), set()).add(idx)
    return merges


def wordpiece_vocab(word_freqs, num_merges: int = 1000) -> list[str]:
    """Alphabet (every initial symbol, sorted) + merge outputs in merge
    order — the greedy-encode vocabulary."""
    alphabet = sorted({s for w, _ in word_freqs for s in _wp_symbols(w)})
    merges = train_wordpiece_merges(word_freqs, num_merges)
    return alphabet + [m[2] for m in merges]


def train_wordpiece(ds, text_col: str = "text", num_merges: int = 1000,
                    max_words: int = 100_000):
    """Distributed word counts (bpe_train.corpus_word_freqs) → driver
    merge loop.  Returns the ordered ``[(left, right, merged), ...]``."""
    from .bpe_train import corpus_word_freqs

    return train_wordpiece_merges(
        corpus_word_freqs(ds, text_col, max_words), num_merges)


def wordpiece_encode_word(word: str, vocab: frozenset[str] | set[str],
                          max_len: int = 100) -> list[str]:
    """Greedy longest-match-first WordPiece encode of one word: the
    longest vocab prefix wins, continuations carry ``##``; any dead end
    (or an over-long word) collapses the WHOLE word to [UNK] — the
    standard BERT behavior."""
    if not word:
        return []
    if len(word) > max_len:
        return [UNK]
    pieces = []
    start = 0
    while start < len(word):
        end = len(word)
        cur = None
        while end > start:
            sub = word[start:end]
            if start > 0:
                sub = CONT + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [UNK]
        pieces.append(cur)
        start = end
    return pieces


def wordpiece_encode_stage(ds, vocab, text_col: str = "text"):
    """Streaming encode: pre-tokenize with the repo's BPE-ish regex
    (lowercased, same as training), greedy-encode each word against the
    broadcast vocab (shipped once per task via closure capture of the
    frozenset — a few hundred KB), memoized per worker process.  Appends
    ``n_wp_tokens`` and ``n_unk`` (whole-word UNK count) per row."""
    vset = frozenset(vocab)
    cache: dict[str, tuple[int, int]] = {}
    cache_cap = 1_000_000  # bound worker memory on high-cardinality corpora

    def fn(batch: pa.Table) -> pa.Table:
        n_tok, n_unk = [], []
        for text in batch.column(text_col).to_pylist():
            t = u = 0
            for w in RE_BPE_TOKEN.findall(text or ""):
                w = w.lower()
                hit = cache.get(w)
                if hit is None:
                    pieces = wordpiece_encode_word(w, vset)
                    hit = (len(pieces), pieces.count(UNK))
                    if len(cache) < cache_cap:
                        cache[w] = hit
                t += hit[0]
                u += hit[1]
            n_tok.append(t)
            n_unk.append(u)
        batch = batch.append_column("n_wp_tokens",
                                    pa.array(n_tok, pa.int64()))
        return batch.append_column("n_unk", pa.array(n_unk, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def wordpiece_fertility(ds, vocab, text_col: str = "text",
                        key_col: str = "lang"):
    """Tokenizer-fit data card: per-``key_col`` fertility (WordPiece
    tokens per word) and whole-word-UNK rate — the standard published
    diagnostic for how well a tokenizer serves each language slice of a
    multilingual corpus (high fertility = the slice pays more sequence
    length per word; high UNK = vocabulary blindness).

    Scale shape: the vocab ships once per task (closure frozenset),
    per-word encodes are memoized per worker, each batch pre-aggregates
    to per-key partials, and ONE keyed groupby-Sum (bounded by the
    number of distinct keys) finishes; ratios are round-half-down
    INTEGER ppm (``n·1e6 // d``) so the card is exact under any
    partitioning.  Returns a DataFrame (key, n_docs, n_words,
    n_wp_tokens, n_unk, fertility_ppm, unk_ppm) sorted by key."""
    from ray.data.aggregate import Sum

    import pandas as pd

    vset = frozenset(vocab)
    cache: dict[str, tuple[int, int]] = {}
    cache_cap = 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        agg: dict[str, list[int]] = {}
        keys = batch.column(key_col).to_pylist()
        for key, text in zip(keys, batch.column(text_col).to_pylist()):
            key = key or ""
            row = agg.setdefault(key, [0, 0, 0, 0])
            row[0] += 1
            for w in RE_BPE_TOKEN.findall(text or ""):
                w = w.lower()
                hit = cache.get(w)
                if hit is None:
                    pieces = wordpiece_encode_word(w, vset)
                    hit = (len(pieces), pieces.count(UNK))
                    if len(cache) < cache_cap:
                        cache[w] = hit
                row[1] += 1
                row[2] += hit[0]
                row[3] += hit[1]
        ks = sorted(agg)
        return pa.table({
            key_col: pa.array(ks, pa.string()),
            "n_docs": pa.array([agg[k][0] for k in ks], pa.int64()),
            "n_words": pa.array([agg[k][1] for k in ks], pa.int64()),
            "n_wp_tokens": pa.array([agg[k][2] for k in ks], pa.int64()),
            "n_unk": pa.array([agg[k][3] for k in ks], pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(key_col)
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("n_words", alias_name="n_words"),
                      Sum("n_wp_tokens", alias_name="n_wp_tokens"),
                      Sum("n_unk", alias_name="n_unk"))
           .to_pandas())
    agg = agg.sort_values(key_col).reset_index(drop=True)
    words = agg["n_words"].to_numpy()
    toks = agg["n_wp_tokens"].to_numpy()
    unk = agg["n_unk"].to_numpy()
    fert = [int(t * 1_000_000 // w) if w else 0
            for t, w in zip(toks, words)]
    unkp = [int(u * 1_000_000 // t) if t else 0 for u, t in zip(unk, toks)]
    agg["fertility_ppm"] = pd.array(fert, dtype="int64")
    agg["unk_ppm"] = pd.array(unkp, dtype="int64")
    for c in ("n_docs", "n_words", "n_wp_tokens", "n_unk"):
        agg[c] = agg[c].astype("int64")
    return agg
