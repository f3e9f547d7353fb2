"""Distributed BPE tokenizer training + encode stage.

Byte-pair-encoding vocabulary learning (Sennrich et al. 2016, public
method) re-expressed for Ray Data.  SURVEY.md engine-additions call for
"token counting (whitespace + a BPE-ish regex)"; this completes the story:
the corpus TRAINS the subword vocabulary that then tokenizes it.

Scale shape (the part that must survive 10^12 docs):

* **Word-frequency table, not corpus, feeds the merge loop.**  BPE training
  operates on the distinct-word frequency table — the same design every
  production tokenizer trainer uses — so the distributed part is one
  ``map_batches`` pass of per-batch word Counters followed by a keyed
  groupby-Sum where only DISTINCT words cross the shuffle
  (vocabulary-bounded, Zipf-capped by ``max_words``, NOT row-bounded).
* **The merge loop itself is driver-side over that bounded table** —
  intentionally: merges are inherently sequential (merge k+1's counts
  depend on merge k) and the table is ≤``max_words`` rows.  Incremental
  pair-count maintenance (only words containing the merged pair are
  touched) keeps it O(occurrences), not O(vocab × merges).
* **Encoding streams.**  ``bpe_encode_stage`` ships the learned merge
  ranks once per actor (``fn_constructor_args``) and memoizes word →
  pieces per actor — Zipf makes the cache hit rate ≈ the corpus's
  type/token ratio.

Pre-tokenization reuses the repo's BPE-ish regex
(functions/tokenize.py: letter runs | digit runs | single other), lowercased;
each word is a char sequence whose final char carries the ``</w>``
end-of-word marker, the classic Sennrich formulation.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from ..functions.tokenize import RE_BPE_TOKEN

END = "</w>"


# ---------------------------------------------------------------------------
# Phase A — distributed word-frequency table
# ---------------------------------------------------------------------------

def _word_count_batch(batch: pa.Table, text_col: str) -> pa.Table:
    c: Counter = Counter()
    for text in batch.column(text_col).to_pylist():
        c.update(t.lower() for t in RE_BPE_TOKEN.findall(text or ""))
    words = list(c.keys())
    return pa.table(
        {
            "word": pa.array(words, pa.string()),
            "n": pa.array([c[w] for w in words], pa.int64()),
        }
    )


def corpus_word_freqs(ds, text_col: str = "text", max_words: int = 100_000):
    """One distributed pass over ``ds[text_col]`` → the word-frequency
    table the merge loop trains on: per-batch partial Counters, a keyed
    groupby-Sum (distinct words only cross the shuffle), then the driver
    keeps the ``max_words`` most frequent (deterministic tie-break on the
    word itself).  Returns ``list[(word, count)]`` sorted by (-count, word).
    """
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        lambda b: _word_count_batch(b, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    merged = partials.groupby("word").aggregate(Sum("n", alias_name="n"))
    df = merged.to_pandas()
    if df.empty:
        return []
    rows = sorted(zip(df["word"], df["n"]), key=lambda t: (-int(t[1]), t[0]))
    return [(str(w), int(n)) for w, n in rows[:max_words]]


# ---------------------------------------------------------------------------
# Phase B — merge-loop training over the bounded frequency table
# ---------------------------------------------------------------------------

def _word_symbols(word: str) -> tuple[str, ...]:
    if not word:
        return ()
    chars = list(word)
    chars[-1] += END
    return tuple(chars)


def train_bpe_merges(word_freqs, num_merges: int = 1000):
    """Learn ``num_merges`` BPE merges from a ``[(word, count)]`` table.

    Deterministic: ties on pair count break on the lexicographically
    smallest pair.  Incremental maintenance — a merge re-counts only the
    words that contain the merged pair (tracked via a pair → word-index
    map), so cost scales with pair occurrences rather than vocab size.
    Returns the ordered merge list ``[(left, right), ...]``.
    """
    words = [list(_word_symbols(w)) for w, _ in word_freqs]
    freqs = [int(n) for _, n in word_freqs]

    pair_counts: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, n) in enumerate(zip(words, freqs)):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += n
            where.setdefault((a, b), set()).add(idx)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        best_count = 0
        for pair, cnt in pair_counts.items():
            if cnt > best_count or (cnt == best_count and best is not None and pair < best):
                best, best_count = pair, cnt
        if best is None or best_count <= 0:
            break
        merges.append(best)
        joined = best[0] + best[1]
        touched = where.pop(best, set())
        pair_counts.pop(best, None)
        for idx in touched:
            syms = words[idx]
            n = freqs[idx]
            # remove this word's old pair contributions
            for a, b in zip(syms, syms[1:]):
                p = (a, b)
                if p in pair_counts:
                    pair_counts[p] -= n
                    if pair_counts[p] <= 0:
                        del pair_counts[p]
                if p in where:
                    where[p].discard(idx)
            # apply the merge left-to-right
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[idx] = out
            # add the new contributions back
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] += n
                where.setdefault((a, b), set()).add(idx)
    return merges


def train_bpe(ds, text_col: str = "text", num_merges: int = 1000,
              max_words: int = 100_000):
    """corpus → ordered merge list: distributed word counts (phase A) +
    driver merge loop over the bounded table (phase B)."""
    return train_bpe_merges(corpus_word_freqs(ds, text_col, max_words), num_merges)


# ---------------------------------------------------------------------------
# Encoding
# ---------------------------------------------------------------------------

def encode_word(word: str, ranks: dict) -> tuple[str, ...]:
    """Greedy lowest-rank-first merge of one word (GPT-2-style ``bpe()``):
    repeatedly merge the present pair with the smallest training rank.
    Equivalent to replaying the merge list in order (the serial oracle does
    exactly that — different algorithm, same fixed point)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return tuple(syms)


class BpeEncoder:
    """Actor-pool encode stage: merge ranks arrive once per actor; word →
    pieces memoized per actor (Zipf ⇒ high hit rate).  Emits per-row BPE
    token count and the joined piece string (space-separated)."""

    def __init__(self, merges, text_col: str = "text", emit_pieces: bool = False,
                 cache_cap: int = 1_000_000):
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.text_col = text_col
        self.emit_pieces = emit_pieces
        self.cache: dict[str, tuple[str, ...]] = {}
        self.cache_cap = cache_cap

    def _pieces(self, word: str) -> tuple[str, ...]:
        hit = self.cache.get(word)
        if hit is None:
            hit = encode_word(word, self.ranks)
            if len(self.cache) < self.cache_cap:
                self.cache[word] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = []
        pieces_col = []
        for text in batch.column(self.text_col).to_pylist():
            n = 0
            doc_pieces = [] if self.emit_pieces else None
            for tok in RE_BPE_TOKEN.findall((text or "").lower()):
                p = self._pieces(tok)
                n += len(p)
                if doc_pieces is not None:
                    doc_pieces.extend(p)
            counts.append(n)
            if doc_pieces is not None:
                pieces_col.append(" ".join(doc_pieces))
        out = batch.append_column("n_bpe_tokens", pa.array(counts, pa.int64()))
        if self.emit_pieces:
            out = out.append_column("bpe_pieces", pa.array(pieces_col, pa.string()))
        return out


def bpe_encode_stage(ds, merges, text_col: str = "text",
                     emit_pieces: bool = False,
                     concurrency: int | tuple[int, int] = 4,
                     batch_size: int = 1024):
    """Encode ``ds[text_col]`` with a learned merge list.  The ranks table
    ships to each actor once via ``fn_constructor_args`` (never per batch)."""
    from .perplexity_stage import _adaptive_pool

    return ds.map_batches(
        BpeEncoder,
        fn_constructor_args=(list(merges), text_col, emit_pieces),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=_adaptive_pool(concurrency),
    )
