"""Distributed multinomial Naive Bayes over hashed n-gram features.

The north star asks for *rule-free* quality filtering; this is the engine's
trainable classifier path: a multinomial NB whose sufficient statistics are
INTEGER per-class feature counts — exactly aggregatable in any order, so
the distributed training pass is bit-deterministic (unlike SGD, whose
float gradient sums depend on reduction order).  Uses the same hashed
unigram+bigram feature bank as DSIR (stages/dsir.doc_feature_ids), so one
feature extraction serves selection AND classification.

Training = one ``map_batches`` pass emitting per-batch (class, bucket,
count) partials + a groupby-Sum whose shuffle is bounded by
``n_classes × n_buckets`` rows (never corpus-bounded), then a driver-side
model assembly (n_classes × n_buckets log-prob matrix, ~2 MB at 25
classes × 10k buckets — broadcastable via ``ray.put``).

Uses: language-ID distillation (train on labeled docs, predict unlabeled),
keep/drop distillation (train on the rule bank's decisions, score new docs
without re-running the rules), topic/source routing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dsir import N_BUCKETS, _HashCache, doc_feature_ids

_ALPHA = 1.0  # add-alpha feature smoothing


class NaiveBayesModel:
    """Driver-side model: class names (sorted), log-priors, and the
    (n_classes, n_buckets) feature log-prob matrix.  Prediction ties break
    on the lexicographically smallest class (deterministic)."""

    def __init__(self, classes: list[str], class_doc_counts: np.ndarray,
                 feature_counts: np.ndarray, alpha: float = _ALPHA):
        assert list(classes) == sorted(classes)
        self.classes = list(classes)
        self.alpha = float(alpha)
        n_docs = class_doc_counts.sum()
        self.log_prior = np.log(class_doc_counts / n_docs)
        totals = feature_counts.sum(axis=1, keepdims=True)
        n_buckets = feature_counts.shape[1]
        self.log_feat = np.log(
            (feature_counts + alpha) / (totals + alpha * n_buckets)
        )

    @property
    def n_buckets(self) -> int:
        return self.log_feat.shape[1]

    def score_ids(self, ids: np.ndarray) -> np.ndarray:
        """Per-class log-posterior (unnormalized) for one doc's feature-id
        array — log_prior + Σ log_feat[:, id]."""
        if len(ids) == 0:
            return self.log_prior.copy()
        return self.log_prior + self.log_feat[:, ids].sum(axis=1)

    def predict_ids(self, ids: np.ndarray) -> tuple[str, float]:
        s = self.score_ids(ids)
        j = int(np.argmax(s))  # np.argmax takes the FIRST max → sorted-class tie-break
        return self.classes[j], float(s[j])


def _partial_class_counts(batch: pa.Table, text_col: str, label_col: str,
                          n_buckets: int) -> pa.Table:
    hasher = _HashCache(n_buckets)
    per_class: dict[str, np.ndarray] = {}
    docs: dict[str, int] = {}
    for text, label in zip(
        batch.column(text_col).to_pylist(), batch.column(label_col).to_pylist()
    ):
        if label is None:
            continue
        label = str(label)
        docs[label] = docs.get(label, 0) + 1
        ids = doc_feature_ids(text, hasher, n_buckets)
        if len(ids):
            acc = per_class.get(label)
            if acc is None:
                acc = per_class.setdefault(label, np.zeros(n_buckets, np.int64))
            acc += np.bincount(ids, minlength=n_buckets)
    labels, buckets, ns = [], [], []
    for label, acc in per_class.items():
        nz = np.flatnonzero(acc)
        labels.extend([label] * len(nz))
        buckets.extend(nz.tolist())
        ns.extend(acc[nz].tolist())
    # doc counts ride as bucket = -1 rows
    for label, n in docs.items():
        labels.append(label)
        buckets.append(-1)
        ns.append(n)
    return pa.table(
        {
            "label": pa.array(labels, pa.string()),
            "bucket": pa.array(buckets, pa.int64()),
            "n": pa.array(ns, pa.int64()),
        }
    )


def train_naive_bayes(ds, text_col: str = "text", label_col: str = "lang",
                      n_buckets: int = N_BUCKETS,
                      alpha: float = _ALPHA) -> NaiveBayesModel:
    """One distributed pass over labeled docs → NaiveBayesModel.  Shuffle
    is (n_classes × n_buckets)-bounded; counts are integers so the result
    is independent of batching/partitioning (tested)."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        lambda b: _partial_class_counts(b, text_col, label_col, n_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    df = (
        partials.groupby(["label", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if df.empty:
        raise ValueError("no labeled rows to train on")
    classes = sorted(df["label"].unique())
    cindex = {c: i for i, c in enumerate(classes)}
    feat = np.zeros((len(classes), n_buckets), dtype=np.int64)
    docs = np.zeros(len(classes), dtype=np.int64)
    for label, bucket, n in zip(df["label"], df["bucket"], df["n"]):
        if bucket < 0:
            docs[cindex[label]] = n
        else:
            feat[cindex[label], bucket] = n
    return NaiveBayesModel(classes, docs, feat, alpha)


class _NbPredictor:
    """Actor-pool predict stage: model arrives once per actor (ray.put)."""

    def __init__(self, model_ref, text_col: str, out_prefix: str):
        import ray

        self.model = (
            ray.get(model_ref) if not isinstance(model_ref, NaiveBayesModel)
            else model_ref
        )
        self.text_col = text_col
        self.out_prefix = out_prefix
        self.hasher = _HashCache(self.model.n_buckets)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, scores = [], []
        for text in batch.column(self.text_col).to_pylist():
            ids = doc_feature_ids(text, self.hasher, self.model.n_buckets)
            label, score = self.model.predict_ids(ids)
            preds.append(label)
            scores.append(score)
        p = self.out_prefix
        batch = batch.append_column(f"{p}_label", pa.array(preds, pa.string()))
        return batch.append_column(f"{p}_logp", pa.array(scores, pa.float64()))


def nb_predict_stage(ds, model: NaiveBayesModel, text_col: str = "text",
                     out_prefix: str = "nb",
                     concurrency: int | tuple[int, int] = 4,
                     batch_size: int = 1024):
    """Append ``{prefix}_label`` (argmax class, sorted-class tie-break) and
    ``{prefix}_logp`` (winning unnormalized log-posterior)."""
    import ray

    from .perplexity_stage import _adaptive_pool

    model_ref = ray.put(model)
    return ds.map_batches(
        _NbPredictor,
        fn_constructor_args=(model_ref, text_col, out_prefix),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=_adaptive_pool(concurrency),
    )
