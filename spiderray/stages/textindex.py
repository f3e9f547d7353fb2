"""Distributed text ranking: document frequencies + BM25 top-k (engine
addition — the IR-shaped sibling of the token-counting bank in
functions/tokenize.py).

Scale shape (nothing corpus-sized ever reaches the driver):

* corpus stats — per-batch partial (n_docs, total_tokens) counters → one
  tiny aggregate (ints, exact).
* document frequencies — per-batch per-DOC distinct-term rows, PRUNED to
  the query terms before the shuffle (only |query|·n_docs rows can ever
  move, and in practice far fewer), then a keyed groupby-Sum.
* scoring — a stateless map over the corpus computing each doc's BM25
  against the broadcast (tiny) idf table, emitting only the per-block
  LOCAL top-k; the driver merges k·n_blocks rows.

Tokenization is Python ``str.split()`` (identical to functions/tokenize
ws semantics and to the DuckDB ``_sql_ws_tokens`` fragment, so the SQL
oracle states the same arithmetic).  BM25: the Robertson/Sparck-Jones
variant with idf = ln(1 + (N − df + ½)/(df + ½)).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

def corpus_token_stats(ds, text_col: str = "text") -> tuple[int, int]:
    """(n_docs, total_ws_tokens) in one pass of integer partials."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        toks = sum(len((t or "").split()) for t in texts)
        return pa.table({"n_docs": pa.array([len(texts)], pa.int64()),
                         "n_tokens": pa.array([toks], pa.int64())})

    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_tokens", alias_name="n_tokens"))
    )
    return int(out["n_docs"] or 0), int(out["n_tokens"] or 0)


def term_doc_freqs(ds, terms: list[str] | None = None,
                   text_col: str = "text"):
    """Dataset[(term, df)] — number of DISTINCT documents containing each
    term.  ``terms`` prunes at the partial stage (the query-terms case:
    only matching rows ever shuffle); None computes the full DF table
    (vocabulary-bounded shuffle)."""
    from ray.data.aggregate import Sum

    want = set(terms) if terms is not None else None

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch.column(text_col).to_pylist():
            doc_terms = set((t or "").split())
            if want is not None:
                doc_terms &= want
            for term in doc_terms:
                counts[term] = counts.get(term, 0) + 1
        return pa.table({"term": pa.array(list(counts), pa.string()),
                         "df": pa.array(list(counts.values()), pa.int64())})

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )


def bm25_topk(ds, query_terms: list[str], k: int = 10,
              k1: float = 1.5, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id") -> pd.DataFrame:
    """BM25 top-k documents for ``query_terms`` → DataFrame
    (id, score) sorted by (-score, id).  Two passes over the corpus
    (stats+df, then scoring); the scoring pass emits k rows per block."""
    n_docs, total_tokens = corpus_token_stats(ds, text_col)
    if n_docs == 0:
        return pd.DataFrame({id_col: [], "score": []})
    avgdl = total_tokens / n_docs  # exact ints → one IEEE division

    df_tbl = term_doc_freqs(ds, query_terms, text_col).to_pandas()
    dfs = dict(zip(df_tbl["term"], df_tbl["df"]))
    idf = {
        t: math.log(1.0 + (n_docs - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5))
        for t in query_terms
    }
    q_terms = list(dict.fromkeys(query_terms))  # defined summation order

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_ids, out_scores = [], []
        for i, t in zip(ids, texts):
            toks = (t or "").split()
            if not toks:
                continue
            dl = len(toks)
            score = 0.0
            for term in q_terms:
                tf = toks.count(term)
                if tf:
                    score += idf[term] * (tf * (k1 + 1.0)) / (
                        tf + k1 * (1.0 - b + b * dl / avgdl)
                    )
            if score > 0.0:
                out_ids.append(i)
                out_scores.append(score)
        if not out_ids:
            return pa.table({id_col: pa.array([], batch.schema.field(id_col).type),
                             "score": pa.array([], pa.float64())})
        order = np.lexsort((np.asarray(out_ids), -np.asarray(out_scores)))[:k]
        return pa.table({
            id_col: pa.array([out_ids[j] for j in order],
                             batch.schema.field(id_col).type),
            "score": pa.array([out_scores[j] for j in order], pa.float64()),
        })

    local = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    out = local.to_pandas()  # ≤ k rows per block
    out = out.sort_values(["score", id_col], ascending=[False, True], kind="mergesort")
    return out.head(k).reset_index(drop=True)


def sliding_chunks(ds, text_col: str = "text", id_col: str = "doc_id",
                   size: int = 64, stride: int = 48,
                   min_tokens: int = 1):
    """RAG-style overlapping token chunking: each document explodes into
    windows of ``size`` whitespace tokens every ``stride`` tokens (the
    retrieval-index convention — adjacent chunks share ``size − stride``
    tokens of context so no boundary sentence is ever retrievable from
    neither side).  Pure flat-map: no shuffle, no state, deterministic;
    chunk_idx = start // stride.  Tail windows shorter than
    ``min_tokens`` are dropped (a tail fully contained in the previous
    window carries no new tokens).

    Output: (id, chunk_idx, chunk_start, n_tokens, chunk_text)."""
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError(f"need 0 < stride <= size, got {stride}/{size}")

    def fn(batch: pa.Table) -> pa.Table:
        ids_out, idxs, starts, lens, texts = [], [], [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            tokens = (t or "").split()
            n = len(tokens)
            for start in range(0, max(n, 1), stride):
                window = tokens[start : start + size]
                if len(window) < min_tokens:
                    continue
                # a tail strictly inside the previous window adds nothing
                if start > 0 and start + len(window) <= (start - stride) + size:
                    continue
                ids_out.append(i)
                idxs.append(start // stride)
                starts.append(start)
                lens.append(len(window))
                texts.append(" ".join(window))
                if start + size >= n:
                    break
        id_type = batch.schema.field(id_col).type
        return pa.table({
            id_col: pa.array(ids_out, id_type),
            "chunk_idx": pa.array(idxs, pa.int32()),
            "chunk_start": pa.array(starts, pa.int32()),
            "n_tokens": pa.array(lens, pa.int32()),
            "chunk_text": pa.array(texts, pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def build_inverted_index(ds, out_dir: str, text_col: str = "text",
                         id_col: str = "doc_id", n_buckets: int = 64):
    """Persist an inverted index (term → postings) as BUCKETED parquet:
    per-batch (term, doc_id, tf) partials pre-aggregate inside the batch,
    shuffle once by crc32(term) % n_buckets, and each bucket writes one
    postings file — so a query-term lookup reads ONLY its buckets (the
    same pruning contract as joins.read_bucketed).  Returns a manifest
    Dataset of (bucket, n_terms, n_postings)."""
    import os
    import zlib

    import pandas as pd
    import pyarrow.parquet as pq_

    os.makedirs(out_dir, exist_ok=True)

    def partial(batch: pa.Table) -> pa.Table:
        terms, ids_out, tfs = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            counts: dict[str, int] = {}
            for term in (t or "").split():
                counts[term] = counts.get(term, 0) + 1
            terms.extend(counts.keys())
            ids_out.extend([i] * len(counts))
            tfs.extend(counts.values())
        buckets = [zlib.crc32(t.encode("utf-8")) % n_buckets for t in terms]
        return pa.table({
            "bucket": pa.array(buckets, pa.int32()),
            "term": pa.array(terms, pa.string()),
            id_col: pa.array(ids_out),
            "tf": pa.array(tfs, pa.int64()),
        })

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["bucket"].iloc[0])
        g = g.sort_values(["term", id_col]).reset_index(drop=True)
        path = os.path.join(out_dir, f"bucket-{bucket:05d}.parquet")
        tmp = f"{path}.tmp.{os.getpid()}"
        pq_.write_table(
            pa.Table.from_pandas(g[["term", id_col, "tf"]],
                                 preserve_index=False), tmp)
        os.replace(tmp, path)
        return pd.DataFrame([{"bucket": bucket,
                              "n_terms": g["term"].nunique(),
                              "n_postings": len(g)}])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(write_bucket, batch_format="pandas")
    )


def lookup_postings(index_dir: str, terms: list[str],
                    n_buckets: int = 64) -> "pa.Table":
    """Read postings for ``terms`` touching only their buckets (bucket
    pruning: len(set(crc32(term)%B)) files of B)."""
    import os
    import zlib

    import pyarrow.parquet as pq_

    want = sorted(set(terms))
    buckets = sorted({zlib.crc32(t.encode("utf-8")) % n_buckets
                      for t in want})
    parts = []
    for b in buckets:
        path = os.path.join(index_dir, f"bucket-{b:05d}.parquet")
        if not os.path.exists(path):
            continue
        t = pq_.read_table(path)
        import pyarrow.compute as pc_

        t = t.filter(pc_.is_in(t.column("term"),
                               value_set=pa.array(want, pa.string())))
        parts.append(t)
    if not parts:
        return pa.table({"term": pa.array([], pa.string())})
    return pa.concat_tables(parts)


# --------------------------------------------------------------------------
# Vocabulary coverage: per-document OOV rate against the corpus's own
# top-N vocabulary — the tokenizer-fit / domain-shift data card
# --------------------------------------------------------------------------


# Both Arrow and DuckDB split with RE2, so using the SAME class on both
# sides makes the SQL restatement exact for every input, not just ASCII
# corpora (utf8_split_whitespace would additionally split on \v\f and
# Unicode spaces, which DuckDB's \s-free class does not).
_WS_PATTERN = "[ \t\n\r]+"


def _ws_tokens(col: pa.ChunkedArray | pa.Array):
    """Vectorized whitespace tokenization (list<string>), RE2-exact to the
    DuckDB fragment ``string_split_regex(text, '[ \\t\\n\\r]+')``.  Edge
    tokens may be '' (leading/trailing whitespace) — callers filter."""
    import pyarrow.compute as pc

    return pc.split_pattern_regex(col, pattern=_WS_PATTERN)


def term_value_counts(col) -> tuple[pa.Array, np.ndarray]:
    """Non-empty term value counts for a text column in one pass of Arrow
    kernels (RE2 split → flatten → ``pc.value_counts``) — no pandas
    detour on the per-batch hot path (review finding).  Returns
    (terms, int64 counts)."""
    import pyarrow.compute as pc

    vc = pc.value_counts(pc.list_flatten(_ws_tokens(col)))
    terms = vc.field("values")
    counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
    keep = pc.not_equal(terms, "").to_numpy(zero_copy_only=False)
    return terms.filter(pa.array(keep)), counts[keep]


def build_vocab(ds, vocab_size: int = 500, text_col: str = "text") -> list[str]:
    """Global top-``vocab_size`` terms by (count DESC, term ASC).

    Fully distributed: vectorized Arrow explode → per-batch partial counts
    → keyed groupby-Sum (term cardinality grows with the corpus, so the
    merge shuffles), then per-block LOCAL top-``vocab_size`` so only
    vocab_size·n_blocks rows reach the driver's final cut."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        terms, counts = term_value_counts(batch.column(text_col))
        return pa.table({"term": terms, "n": pa.array(counts, pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("term").aggregate(Sum("n", alias_name="n")))

    def local_top(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["n", "term"], ascending=[False, True], kind="mergesort")
        return pa.Table.from_pandas(df.head(vocab_size),
                                    preserve_index=False)

    merged = counts.map_batches(local_top, batch_format="pyarrow").to_pandas()
    merged = merged.sort_values(["n", "term"], ascending=[False, True],
                                kind="mergesort").head(vocab_size)
    return merged["term"].tolist()


def vocab_coverage(ds, vocab: list[str] | None = None, vocab_size: int = 500,
                   text_col: str = "text", id_col: str = "doc_id"):
    """Per-document token / OOV counts against ``vocab`` (or the corpus's
    own top-``vocab_size`` terms when omitted) → (id, n_tokens, n_oov).

    The vocabulary broadcasts once via ray.put; the coverage pass is one
    stateless vectorized map (Arrow whitespace split, is_in membership,
    bincount segment sums — no per-token Python).  An OOV rate against a
    tokenizer's vocab is the standard proxy for how badly a new corpus
    slice will fragment into bytes/unknowns."""
    import ray
    import pyarrow.compute as pc

    if vocab is None:
        vocab = build_vocab(ds, vocab_size, text_col)
    vocab_ref = ray.put(pa.array(sorted(set(vocab)), pa.string()))

    def cover(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({id_col: batch.column(id_col) if id_col in batch.column_names else pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "n_oov": pa.array([], pa.int64())})
        vset = ray.get(vocab_ref)
        toks = _ws_tokens(batch.column(text_col))
        lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        flat = pc.list_flatten(toks)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        known = pc.is_in(flat, value_set=vset).to_numpy(zero_copy_only=False)
        n_tokens = np.bincount(rows[nonempty], minlength=n)
        n_oov = np.bincount(rows[nonempty & ~known], minlength=n)
        return pa.table({id_col: batch.column(id_col),
                         "n_tokens": pa.array(n_tokens, pa.int64()),
                         "n_oov": pa.array(n_oov, pa.int64())})

    return ds.map_batches(cover, batch_format="pyarrow", zero_copy_batch=True)


def ngram_novelty(ds, id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3):
    """Per-document n-gram novelty: how much of each doc is word
    ``n``-grams that occur EXACTLY ONCE in the whole corpus — the
    uniqueness/boilerplate data card (template pages and licence
    blurbs score near 0; original prose near 1e6 ppm).

    Scale shape — two keyed groupbys, NO join: a corpus-unique gram has
    exactly one contributing doc, so ``groupby(gram) → (Σcount,
    Min(doc_id))`` attributes every novel gram directly to its one
    document; novel counts and the per-row exact total gram counts then
    merge through a single ``groupby(doc_id)`` over a union of
    (doc, n_grams, 0) and (doc, 0, n_novel) partials.  Nothing
    row-scale reaches the driver; the only big exchange is the gram
    table itself (the same cardinality any dedup/DF pass moves).

    novelty_ppm uses round-half-up INTEGER division, so the literal SQL
    restatement is exact.  Tokenization is the shared RE2 class
    (``_WS_PATTERN``); grams join with a single space."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min, Sum

    if n < 1:
        raise ValueError("n must be >= 1")

    def _row_tokens(batch: pa.Table):
        toks = _ws_tokens(batch.column(text_col))
        out = []
        for lst in toks.to_pylist():
            out.append([t for t in (lst or []) if t != ""])
        return out

    def totals(batch: pa.Table) -> pa.Table:
        counts = [max(len(t) - n + 1, 0) for t in _row_tokens(batch)]
        return pa.table({
            id_col: batch.column(id_col),
            "n_grams": pa.array(counts, pa.int64()),
            "n_novel": pa.array([0] * len(counts), pa.int64()),
        })

    def gram_pairs(batch: pa.Table) -> pa.Table:
        from collections import Counter

        id_type = batch.schema.field(id_col).type
        ids = batch.column(id_col).to_pylist()
        agg: Counter = Counter()
        for did, toks in zip(ids, _row_tokens(batch)):
            for i in range(len(toks) - n + 1):
                agg[(" ".join(toks[i:i + n]), did)] += 1
        grams = list(agg.keys())
        return pa.table({
            "gram": pa.array([g for g, _ in grams], pa.string()),
            "d": pa.array([d for _, d in grams], id_type),
            "m": pa.array([agg[k] for k in grams], pa.int64()),
        })

    pairs = ds.map_batches(gram_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
    counted = (pairs.groupby("gram")
               .aggregate(Sum("m", alias_name="cnt"),
                          Min("d", alias_name="d")))

    def novel_partial(batch: pa.Table) -> pa.Table:
        # this runs once per block of the gram table (the job's largest):
        # one arrow filter + np.unique, no pandas detour
        d_col = batch.column("d")
        keep = pc.equal(batch.column("cnt"), 1)
        d = d_col.filter(keep).to_numpy(zero_copy_only=False)
        vals, counts = (np.unique(d, return_counts=True) if len(d)
                        else (d, np.zeros(0, np.int64)))
        return pa.table({
            id_col: pa.array(vals.tolist(), d_col.type),
            "n_grams": pa.array(np.zeros(len(vals), np.int64)),
            "n_novel": pa.array(counts.astype(np.int64)),
        })

    novel = counted.map_batches(novel_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
    merged = (ds.map_batches(totals, batch_format="pyarrow",
                             zero_copy_batch=True)
              .union(novel).groupby(id_col)
              .aggregate(Sum("n_grams", alias_name="n_grams"),
                         Sum("n_novel", alias_name="n_novel")))

    def ppm(batch: pa.Table) -> pa.Table:
        ng = batch.column("n_grams").to_numpy(zero_copy_only=False)
        nv = batch.column("n_novel").to_numpy(zero_copy_only=False)
        d = np.maximum(ng, 1)
        p = (nv * 2_000_000 + d) // (2 * d)
        p = np.where(ng > 0, p, 0).astype(np.int64)
        return batch.append_column("novelty_ppm", pa.array(p, pa.int64()))

    return merged.map_batches(ppm, batch_format="pyarrow",
                              zero_copy_batch=True)


def hash_embed(ds, text_col: str = "text", dim: int = 64, n: int = 3,
               out_col: str = "embedding"):
    """Feature-hashing text embedder (the 'hashing trick', Weinberger et
    al. 2009): each word n-gram hashes to one of ``dim`` buckets with a
    ±1 sign from a second hash bit, counts accumulate, and the vector
    L2-normalizes — a deterministic, model-free featurizer that bridges
    TEXT into the embedding family (semantic_dedup, ANN top-k,
    embedding_decontaminate all consume its output unchanged).  Inner
    products approximate n-gram-profile cosine; collisions are the
    documented accuracy/dim tradeoff.

    Stateless map, no shuffle, no model; md5-based hashing so every
    worker, run, and partitioning agrees bit-for-bit.  Output vectors
    are float32 lists; all-empty texts embed as the zero vector."""
    import hashlib

    if dim < 2:
        raise ValueError("hash_embed: dim must be >= 2")
    if n < 1:
        raise ValueError("hash_embed: n must be >= 1")

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        out = np.zeros((len(texts), dim), dtype=np.float64)
        for r, t in enumerate(texts):
            toks = (t or "").split()
            for i in range(max(len(toks) - n + 1, 0)):
                g = " ".join(toks[i:i + n])
                h = hashlib.md5(g.encode()).digest()
                idx = int.from_bytes(h[:8], "big") % dim
                sign = 1.0 if h[8] & 1 else -1.0
                out[r, idx] += sign
            nrm = np.linalg.norm(out[r])
            if nrm > 0:
                out[r] /= nrm
        vecs = pa.array([row.astype(np.float32).tolist() for row in out],
                        pa.list_(pa.float32()))
        return batch.append_column(out_col, vecs)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def zipf_ranks(ds, top_n: int = 50, text_col: str = "text"):
    """Zipf rank-frequency card: the global top-``top_n`` terms with
    rank, exact count, and integer ppm of all tokens — the
    rank-frequency head whose slope (eyeballed or regressed downstream)
    says whether the corpus is natural text (~1/rank), template spam
    (flat head), or boilerplate-flooded (one term dominating).  The
    Heaps-curve companion (stats.vocab_growth): that card tracks NEW
    vocabulary, this one the mass distribution of the existing head.

    Same exchange as build_vocab — vocabulary-bounded groupby-Sum,
    per-block local top-n, driver cut — plus one scalar token total;
    ppm uses round-half-up integer division ``(n·2e6 + tot) // (2·tot)``
    (the term_drift convention) so the card restates as literal SQL.
    Returns a pandas frame (rank, term, n, ppm) sorted by rank."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        terms, counts = term_value_counts(batch.column(text_col))
        return pa.table({"term": terms, "n": pa.array(counts, pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("term").aggregate(Sum("n", alias_name="n")))

    def local_top(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["n", "term"], ascending=[False, True], kind="mergesort")
        return pa.Table.from_pandas(df.head(top_n), preserve_index=False)

    merged = counts.map_batches(local_top, batch_format="pyarrow").to_pandas()
    merged = merged.sort_values(["n", "term"], ascending=[False, True],
                                kind="mergesort").head(top_n)
    total = int(counts.sum("n"))
    merged = merged.reset_index(drop=True)
    merged.insert(0, "rank", merged.index + 1)
    merged["n"] = merged["n"].astype("int64")
    merged["ppm"] = [(int(v) * 2_000_000 + total) // (2 * total)
                     for v in merged["n"]]
    merged["rank"] = merged["rank"].astype("int64")
    merged["ppm"] = merged["ppm"].astype("int64")
    return merged[["rank", "term", "n", "ppm"]]
