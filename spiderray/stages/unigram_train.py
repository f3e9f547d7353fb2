"""Distributed unigram-LM tokenizer training + encode stage.

The unigram language-model tokenizer (Kudo 2018, "Subword
regularization", arXiv:1804.10959 — the SentencePiece `--model_type
unigram` method, public) re-expressed for Ray Data, completing the
subword-tokenizer pair next to stages/bpe_train.py.

Training is the hard-EM (Viterbi) variant: each EM iteration segments
every word with the current piece scores and re-estimates piece
probabilities from the INTEGER usage counts, then prunes the vocabulary
toward ``vocab_size`` on a shrink schedule.  Hard-EM is what keeps the
whole procedure bit-deterministic — counts are integers (no
order-dependent float accumulation), Viterbi ties break on an explicit
rule, and the M-step probabilities are computed once on the driver —
so the distributed run and the serial oracle agree exactly.

Scale shape (mirrors bpe_train.py):

* **Phase A is the same distributed word-frequency pass** —
  per-batch Counters, keyed groupby-Sum, only DISTINCT words cross the
  shuffle (vocabulary-bounded, not row-bounded).
* **Phase B (seed + EM + prune) is driver-side over that bounded
  table** — the E-step is embarrassingly parallel over ≤``max_words``
  rows and could fan out as map_batches + integer-count groupby if the
  word table ever outgrew one node; at the documented ``max_words`` cap
  it does not.
* **Encoding streams**: the learned piece table ships once per actor;
  word → segmentation memoized per actor (Zipf cache).
"""

from __future__ import annotations

import math
from collections import Counter

import pyarrow as pa

from .bpe_train import corpus_word_freqs

UNK_PENALTY = 30.0  # log-space cost for a char absent from the vocab


def _seed_vocab(word_freqs, max_piece_len: int = 6, seed_size: int = 4000):
    """Candidate pieces: every substring (≤ max_piece_len) of every word,
    scored by total corpus occurrences; keep the ``seed_size`` best by
    (count desc, piece asc) plus ALL single characters (coverage
    guarantee — every word must remain segmentable)."""
    sub_counts: Counter = Counter()
    chars: set[str] = set()
    for word, n in word_freqs:
        chars.update(word)
        L = len(word)
        for i in range(L):
            for j in range(i + 1, min(i + max_piece_len, L) + 1):
                sub_counts[word[i:j]] += n
    multi = [(p, c) for p, c in sub_counts.items() if len(p) > 1]
    multi.sort(key=lambda t: (-t[1], t[0]))
    vocab = {p: c for p, c in multi[: max(seed_size - len(chars), 0)]}
    for ch in chars:
        vocab[ch] = sub_counts[ch]
    return vocab


def _viterbi(word: str, scores: dict, max_piece_len: int):
    """Best segmentation of ``word`` under log-prob ``scores``.
    DP over end positions; ties prefer the LONGER last piece (smaller
    start), which is deterministic and favors compact segmentations.
    Unknown single chars get UNK_PENALTY so coverage never fails."""
    L = len(word)
    best = [0.0] + [-math.inf] * L
    back = [0] * (L + 1)
    for end in range(1, L + 1):
        for start in range(max(0, end - max_piece_len), end):
            piece = word[start:end]
            s = scores.get(piece)
            if s is None:
                if end - start > 1:
                    continue
                s = -UNK_PENALTY
            cand = best[start] + s
            # strictly better, or equal and starting earlier (longer piece)
            if cand > best[end] or (cand == best[end] and start < back[end]):
                best[end] = cand
                back[end] = start
    pieces = []
    end = L
    while end > 0:
        start = back[end]
        pieces.append(word[start:end])
        end = start
    pieces.reverse()
    return tuple(pieces)


def train_unigram(word_freqs, vocab_size: int = 2000, max_piece_len: int = 6,
                  seed_size: int = 4000, n_iters: int = 4,
                  shrink: float = 0.75):
    """Hard-EM unigram training over a ``[(word, count)]`` table.

    Each iteration: (E) Viterbi-segment every word with current scores,
    accumulating INTEGER piece-usage counts weighted by word frequency;
    (M) scores = log(count/total); prune to max(vocab_size,
    current·shrink) by (count desc, piece asc), single chars exempt.
    Returns ``[(piece, count)]`` sorted by (-count, piece) — the final
    iteration's usage counts, len ≤ vocab_size."""
    vocab = _seed_vocab(word_freqs, max_piece_len, seed_size)
    chars = {p for p in vocab if len(p) == 1}
    total = sum(vocab.values()) or 1
    scores = {p: math.log(c / total) for p, c in vocab.items() if c > 0}
    for it in range(n_iters):
        counts: Counter = Counter()
        for word, n in word_freqs:
            for piece in _viterbi(word, scores, max_piece_len):
                counts[piece] += n
        # prune: keep top target by (count, piece); chars always survive
        target = max(vocab_size, int(len(counts) * shrink))
        multi = [(p, c) for p, c in counts.items() if len(p) > 1]
        multi.sort(key=lambda t: (-t[1], t[0]))
        kept = dict(multi[: max(target - len(chars), 0)])
        for ch in chars:
            kept[ch] = counts.get(ch, 0)
        total = sum(kept.values()) or 1
        scores = {p: math.log(c / total) for p, c in kept.items() if c > 0}
        # chars with zero usage still need a finite score for coverage
        for ch in chars:
            scores.setdefault(ch, -UNK_PENALTY)
        vocab = kept
    out = [(p, int(c)) for p, c in vocab.items()]
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:vocab_size]


def train_unigram_corpus(ds, text_col: str = "text", vocab_size: int = 2000,
                         max_words: int = 100_000, **kw):
    """corpus → unigram piece table: distributed word counts (phase A,
    shared with BPE) + driver hard-EM over the bounded table (phase B)."""
    return train_unigram(corpus_word_freqs(ds, text_col, max_words),
                         vocab_size, **kw)


class UnigramEncoder:
    """Actor-pool encode stage: the piece table ships once per actor;
    word → Viterbi segmentation memoized per actor.  Emits per-row
    unigram token count and optionally the joined pieces."""

    def __init__(self, piece_counts, text_col: str = "text",
                 emit_pieces: bool = False, max_piece_len: int = 6,
                 cache_cap: int = 1_000_000):
        total = sum(c for _, c in piece_counts) or 1
        self.scores = {p: math.log(c / total) for p, c in piece_counts if c > 0}
        for p, c in piece_counts:  # zero-count survivors (rare chars)
            if c == 0:
                self.scores.setdefault(p, -UNK_PENALTY)
        self.text_col = text_col
        self.emit_pieces = emit_pieces
        self.max_piece_len = max_piece_len
        self.cache: dict[str, tuple[str, ...]] = {}
        self.cache_cap = cache_cap

    def _pieces(self, word: str) -> tuple[str, ...]:
        hit = self.cache.get(word)
        if hit is None:
            hit = _viterbi(word, self.scores, self.max_piece_len)
            if len(self.cache) < self.cache_cap:
                self.cache[word] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import RE_BPE_TOKEN

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
        out = batch.append_column("n_unigram_tokens",
                                  pa.array(counts, pa.int64()))
        if self.emit_pieces:
            out = out.append_column("unigram_pieces",
                                    pa.array(pieces_col, pa.string()))
        return out


def unigram_encode_stage(ds, piece_counts, text_col: str = "text",
                         emit_pieces: bool = False,
                         concurrency: int | tuple[int, int] = 4,
                         batch_size: int = 1024):
    """Encode ``ds[text_col]`` with a trained piece table (ships once per
    actor via fn_constructor_args, never per batch)."""
    from .perplexity_stage import _adaptive_pool

    return ds.map_batches(
        UnigramEncoder,
        fn_constructor_args=(list(piece_counts), text_col, emit_pieces),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=_adaptive_pool(concurrency),
    )
