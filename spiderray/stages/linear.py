"""Distributed logistic regression over hashed n-gram features — the
DISCRIMINATIVE member of the engine's trainable classifier pair (the
generative member is stages/nbayes.py).  This is the fastText-supervised
shape the north star names: hashed bag-of-ngrams → linear layer → binary
quality decision, trained ON the engine so a rule bank's keep/drop labels
can be distilled into a model that scores new corpora without re-running
the rules (the CCNet / FineWeb-Edu "train a cheap classifier on a
high-quality seed" recipe; reference decision surface: lang.go:133-358 →
keepdrop labels).

Bit-determinism under ANY partitioning (the property every trainer in this
repo holds) is the design constraint — naive distributed SGD fails it twice
(sample order, float gradient reduction order).  This trainer avoids both:

* FULL-BATCH gradient descent: no sample order at all; T fixed epochs.
* Per-doc residuals are quantized to INTEGER nano-units BEFORE the
  cross-partition sum, so the gradient exchange is an int64 groupby-Sum —
  exact in any order (same trick as pagerank's micro-units, graph.py).
* Features are BINARY presence of the hashed unigram+bigram buckets
  (stages/dsir.doc_feature_ids, deduplicated + sorted), so each doc's
  margin is w[ids].sum() over a canonically ordered array — the same
  float64 op sequence on every executor and in the serial twin.
* The weight update runs ONCE per epoch on the driver from the exact
  integer gradient — a single float64 expression, deterministic.

Per-epoch cost: one map_batches pass over the corpus + one groupby-Sum
whose shuffle is bounded by ``n_buckets + 2`` keys (never corpus-bounded);
driver traffic is one (n_buckets,) int64 vector per epoch.  The model is
~80 KB at 10k buckets — broadcast via ray.put to the predict actors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dsir import N_BUCKETS, _HashCache, doc_feature_ids

_QUANT = 1_000_000_000  # residual quantization (nano-units)
_BIAS_KEY = -1          # gradient row for the bias term
_COUNT_KEY = -2         # labeled-doc count row (drives the 1/n step scale)


def _unique_ids(text: str, hasher, n_buckets: int) -> np.ndarray:
    """Sorted unique feature buckets of one doc — the canonical order both
    the trainer, the predictor and the serial twin sum weights in."""
    ids = doc_feature_ids(text, hasher, n_buckets)
    return np.unique(ids) if len(ids) else ids


class LinearModel:
    """Driver-side model: (n_buckets,) float64 weights + bias.  Margin and
    probability are pure functions shared by the distributed predict stage
    and the serial oracle (the function-bank rule)."""

    def __init__(self, weights: np.ndarray, bias: float):
        self.weights = np.asarray(weights, dtype=np.float64)
        self.bias = float(bias)

    @property
    def n_buckets(self) -> int:
        return len(self.weights)

    def margin_ids(self, ids: np.ndarray) -> float:
        """w·x + b over SORTED UNIQUE bucket ids (binary features)."""
        if len(ids) == 0:
            return self.bias
        return float(self.weights[ids].sum()) + self.bias

    def prob_ids(self, ids: np.ndarray) -> float:
        m = self.margin_ids(ids)
        # stable sigmoid (float64; same expression both sides)
        if m >= 0:
            return 1.0 / (1.0 + np.exp(-m))
        e = np.exp(m)
        return float(e / (1.0 + e))


def _residual_nano(model: LinearModel, ids: np.ndarray, y: int) -> int:
    """Quantized per-doc gradient scale: round((sigma - y) * 1e9).  This is
    THE arithmetic contract between the distributed pass and the twin."""
    r = model.prob_ids(ids) - float(y)
    return int(np.floor(r * _QUANT + 0.5))


def _grad_partial(batch: pa.Table, model: LinearModel, text_col: str,
                  label_col: str, n_buckets: int) -> pa.Table:
    """Per-batch integer gradient partial: (bucket, g) rows where g sums
    the nano-residuals of docs containing that bucket, plus the bias row
    (all residuals) and the labeled-doc count row."""
    hasher = _HashCache(n_buckets)
    acc = np.zeros(n_buckets, dtype=np.int64)
    bias_g = 0
    n = 0
    for text, y in zip(
        batch.column(text_col).to_pylist(), batch.column(label_col).to_pylist()
    ):
        if y is None:
            continue
        n += 1
        ids = _unique_ids(text, hasher, n_buckets)
        r = _residual_nano(model, ids, int(y))
        bias_g += r
        if len(ids):
            acc[ids] += r
    nz = np.flatnonzero(acc)
    buckets = np.concatenate([nz, [_BIAS_KEY, _COUNT_KEY]]).astype(np.int64)
    gs = np.concatenate([acc[nz], [bias_g, n]]).astype(np.int64)
    return pa.table({"bucket": pa.array(buckets), "g": pa.array(gs)})


def train_logistic(ds, text_col: str = "text", label_col: str = "label",
                   n_buckets: int = N_BUCKETS, epochs: int = 10,
                   lr: float = 2.0, l2: float = 1e-4) -> LinearModel:
    """T full-batch GD epochs, each ONE distributed pass + one
    (n_buckets+2)-bounded groupby-Sum.  The returned model is bit-identical
    for any block layout of ``ds`` (integer gradient exchange; tested).

    lr defaults high because binary-presence gradients are 1/n-scaled and
    the corpus-level curvature is mild; l2 keeps rare-bucket weights tame.
    """
    from ray.data.aggregate import Sum

    model = LinearModel(np.zeros(n_buckets), 0.0)
    for _ in range(epochs):
        m = model  # bind per-epoch (closure ships the current weights once)
        df = (
            ds.map_batches(
                lambda b: _grad_partial(b, m, text_col, label_col, n_buckets),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby("bucket")
            .aggregate(Sum("g", alias_name="g"))
            .to_pandas()
        )
        gmap = dict(zip(df["bucket"].astype(np.int64), df["g"].astype(np.int64)))
        n = int(gmap.pop(_COUNT_KEY, 0))
        if n == 0:
            raise ValueError("no labeled rows to train on")
        bias_g = int(gmap.pop(_BIAS_KEY, 0))
        grad = np.zeros(n_buckets, dtype=np.float64)
        if gmap:
            idx = np.fromiter(gmap.keys(), dtype=np.int64, count=len(gmap))
            val = np.fromiter(gmap.values(), dtype=np.int64, count=len(gmap))
            grad[idx] = val
        scale = lr / (n * _QUANT)
        w = model.weights * (1.0 - lr * l2) - grad * scale
        b = model.bias - bias_g * scale
        model = LinearModel(w, b)
    return model


class _LinearPredictor:
    """Actor-pool predict stage: model arrives once per actor (ray.put);
    the token→bucket memo lives per actor."""

    def __init__(self, model_ref, text_col: str, out_prefix: str):
        import ray

        self.model = (
            ray.get(model_ref) if not isinstance(model_ref, LinearModel)
            else model_ref
        )
        self.text_col = text_col
        self.out_prefix = out_prefix
        self.hasher = _HashCache(self.model.n_buckets)

    def __call__(self, batch: pa.Table) -> pa.Table:
        probs, preds = [], []
        for text in batch.column(self.text_col).to_pylist():
            ids = _unique_ids(text, self.hasher, self.model.n_buckets)
            p = self.model.prob_ids(ids)
            probs.append(int(np.floor(p * 1_000_000 + 0.5)))  # micro-units
            preds.append(p >= 0.5)
        pfx = self.out_prefix
        batch = batch.append_column(
            f"{pfx}_prob_micro", pa.array(probs, pa.int64())
        )
        return batch.append_column(f"{pfx}_pred", pa.array(preds, pa.bool_()))


def linear_predict_stage(ds, model: LinearModel, text_col: str = "text",
                         out_prefix: str = "lr",
                         concurrency: int | tuple[int, int] = 4,
                         batch_size: int = 1024):
    """Append ``{prefix}_prob_micro`` (sigmoid in integer micro-units) and
    ``{prefix}_pred`` (prob >= 0.5)."""
    import ray

    from .perplexity_stage import _adaptive_pool

    model_ref = ray.put(model)
    return ds.map_batches(
        _LinearPredictor,
        fn_constructor_args=(model_ref, text_col, out_prefix),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=_adaptive_pool(concurrency),
    )
