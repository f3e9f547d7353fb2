"""DSIR — data selection with importance resampling (Xie et al. 2023,
public method) re-expressed for Ray Data.

Selects raw-corpus documents that look like a TARGET corpus using hashed
n-gram importance weights:

1. **Features**: word unigrams + bigrams hashed into ``n_buckets`` slots
   (the paper's 10k hashed n-gram parameterization).  Feature extraction is
   a shared per-row function (``doc_feature_ids``) so the serial oracle and
   the engine agree by construction; corpus aggregation is what the
   distributed machinery must get right.
2. **Bag-of-buckets models**: bucket-count vectors for the target and raw
   corpora via per-batch partial ``np.bincount`` + a groupby-Sum whose
   shuffle is **bounded by n_buckets** (10k rows), never by corpus size.
3. **Importance weight**: ``log p_tgt(x) − log p_raw(x)
   = Σ_tokens (log θ_tgt[b] − log θ_raw[b])`` — one broadcast log-ratio
   vector (80 KB at 10k buckets) shipped once via ``ray.put`` and read
   inside every scoring task.
4. **Selection**: deterministic top-k, or Gumbel-top-k importance sampling
   with per-doc hash-seeded noise (resumable: a doc's Gumbel key depends
   only on (seed, doc_id), not on execution order).

Scale shape: two streaming count passes + one streaming score pass; nothing
corpus-sized ever reaches the driver (the two count vectors are
n_buckets-bounded).  Skewed docs cost only their own token count.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.tokenize import RE_BPE_TOKEN

N_BUCKETS = 10_000
_ALPHA = 1.0  # add-alpha smoothing for both bag models


def _bucket_of(token: str, n_buckets: int) -> int:
    return int.from_bytes(
        hashlib.blake2b(token.encode(), digest_size=8).digest(), "big"
    ) % n_buckets


class _HashCache:
    """Per-process token → bucket memo (Zipf ⇒ high hit rate)."""

    def __init__(self, n_buckets: int, cap: int = 2_000_000):
        self.n_buckets = n_buckets
        self.cap = cap
        self.memo: dict[str, int] = {}

    def __call__(self, token: str) -> int:
        b = self.memo.get(token)
        if b is None:
            b = _bucket_of(token, self.n_buckets)
            if len(self.memo) < self.cap:
                self.memo[token] = b
        return b


def doc_feature_ids(text: str, hasher, n_buckets: int = N_BUCKETS) -> np.ndarray:
    """Bucket ids of one doc's unigram+bigram features IN TOKEN ORDER —
    the deterministic order both the engine score pass and the serial
    oracle accumulate in (bit-identical float sums)."""
    toks = [t.lower() for t in RE_BPE_TOKEN.findall(text or "")]
    ids = [hasher(t) for t in toks]
    ids.extend(hasher(f"{a} {b}") for a, b in zip(toks, toks[1:]))
    return np.asarray(ids, dtype=np.int64)


def _partial_counts(batch: pa.Table, text_col: str, n_buckets: int) -> pa.Table:
    hasher = _HashCache(n_buckets)
    acc = np.zeros(n_buckets, dtype=np.int64)
    for text in batch.column(text_col).to_pylist():
        ids = doc_feature_ids(text, hasher, n_buckets)
        if len(ids):
            acc += np.bincount(ids, minlength=n_buckets)
    nz = np.flatnonzero(acc)
    return pa.table(
        {
            "bucket": pa.array(nz, pa.int64()),
            "n": pa.array(acc[nz], pa.int64()),
        }
    )


def corpus_bucket_counts(ds, text_col: str = "text",
                         n_buckets: int = N_BUCKETS) -> np.ndarray:
    """Distributed hashed-n-gram bag: per-batch partial bincounts, then a
    groupby-Sum over at most ``n_buckets`` distinct keys.  Driver result is
    one bounded int64 vector."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        lambda b: _partial_counts(b, text_col, n_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    df = partials.groupby("bucket").aggregate(Sum("n", alias_name="n")).to_pandas()
    out = np.zeros(n_buckets, dtype=np.int64)
    if not df.empty:
        out[df["bucket"].to_numpy()] = df["n"].to_numpy()
    return out


def log_ratio_vector(target_counts: np.ndarray, raw_counts: np.ndarray,
                     alpha: float = _ALPHA) -> np.ndarray:
    """log θ_tgt − log θ_raw per bucket, add-alpha smoothed.  Pure function
    of the two count vectors — shared with the serial oracle."""
    n_buckets = len(target_counts)
    t = (target_counts + alpha) / (target_counts.sum() + alpha * n_buckets)
    r = (raw_counts + alpha) / (raw_counts.sum() + alpha * n_buckets)
    return np.log(t) - np.log(r)


class _Scorer:
    """Actor-pool score pass: the log-ratio vector arrives once per actor;
    per-doc score accumulates features in token order (deterministic)."""

    def __init__(self, lr_ref, text_col: str, n_buckets: int):
        import ray

        self.lr = ray.get(lr_ref) if not isinstance(lr_ref, np.ndarray) else lr_ref
        self.text_col = text_col
        self.n_buckets = n_buckets
        self.hasher = _HashCache(n_buckets)

    def __call__(self, batch: pa.Table) -> pa.Table:
        scores = np.empty(batch.num_rows, dtype=np.float64)
        for i, text in enumerate(batch.column(self.text_col).to_pylist()):
            ids = doc_feature_ids(text, self.hasher, self.n_buckets)
            scores[i] = float(self.lr[ids].sum()) if len(ids) else 0.0
        return batch.append_column("dsir_score", pa.array(scores, pa.float64()))


def dsir_score_stage(ds, log_ratio: np.ndarray, text_col: str = "text",
                     concurrency: int | tuple[int, int] = 4,
                     batch_size: int = 1024):
    """Append ``dsir_score`` (importance log-weight) to every row.  The
    log-ratio vector broadcasts once per actor via ray.put."""
    import ray

    from .perplexity_stage import _adaptive_pool

    lr_ref = ray.put(np.asarray(log_ratio, dtype=np.float64))
    return ds.map_batches(
        _Scorer,
        fn_constructor_args=(lr_ref, text_col, len(log_ratio)),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=_adaptive_pool(concurrency),
    )


def _gumbel_key(doc_id, seed: int) -> float:
    """Deterministic per-doc Gumbel noise from hash(seed, doc_id) — doc
    order and partitioning never change the sample."""
    h = hashlib.blake2b(f"{seed}:{doc_id}".encode(), digest_size=8).digest()
    u = (int.from_bytes(h, "big") + 1) / (2**64 + 2)  # u ∈ (0,1)
    return -np.log(-np.log(u))


def dsir_select(ds, target_ds, text_col: str = "text", id_col: str = "doc_id",
                k: int = 1000, n_buckets: int = N_BUCKETS,
                mode: str = "topk", seed: int = 0,
                concurrency: int | tuple[int, int] = 4):
    """Full DSIR selection: fit both bag models, score the raw corpus, keep
    ``k`` docs.

    mode="topk": deterministic highest-score docs (tie → lowest id).
    mode="gumbel": importance resampling via Gumbel-top-k — add
    hash-seeded Gumbel noise to each log-weight and take the top k (the
    standard reduction of weighted sampling-without-replacement to top-k).

    Returns a pandas DataFrame (id_col, dsir_score) of the selected docs —
    driver-sized (k rows).  The top-k itself runs distributed: per-block
    local head via sort, then a bounded global merge.
    """
    target_counts = corpus_bucket_counts(target_ds, text_col, n_buckets)
    raw_counts = corpus_bucket_counts(ds, text_col, n_buckets)
    lr = log_ratio_vector(target_counts, raw_counts)
    scored = dsir_score_stage(ds, lr, text_col, concurrency=concurrency)

    if mode == "gumbel":
        def add_key(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_pylist()
            keys = [
                float(batch.column("dsir_score")[i].as_py()) + _gumbel_key(ids[i], seed)
                for i in range(batch.num_rows)
            ]
            return batch.append_column("__key", pa.array(keys, pa.float64()))

        scored = scored.map_batches(add_key, batch_format="pyarrow",
                                    zero_copy_batch=True)
        key_col = "__key"
    elif mode == "topk":
        key_col = "dsir_score"
    else:
        raise ValueError(f"unknown mode {mode!r}")

    # per-block local head bounds what the global sort sees
    def local_head(batch: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(
            batch, sort_keys=[(key_col, "descending"), (id_col, "ascending")]
        )
        return batch.take(idx[: min(k, batch.num_rows)])

    head = scored.select_columns(
        [id_col, "dsir_score"] + ([key_col] if key_col != "dsir_score" else [])
    ).map_batches(local_head, batch_format="pyarrow", zero_copy_batch=True)
    out = head.sort([key_col, id_col], descending=[True, False]).limit(k).to_pandas()
    return out[[id_col, "dsir_score"]].reset_index(drop=True)
