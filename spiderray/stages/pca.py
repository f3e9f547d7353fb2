"""Distributed PCA fit + whitening transform over an embedding column.

The standard conditioning step of a large-scale embedding pipeline:
ANN recall, SemDeDup-style clustering and cosine near-dup all degrade
when a few dominant directions carry most of the variance — whitening
(project onto the principal axes, divide by sqrt(eigenvalue)) evens the
spectrum first.  The scale shape mirrors kmeans_fit_distributed
(ann.py:141): the corpus crosses the wire only as bounded per-block
moment partials; the fitted model broadcasts once; the transform is a
pure streamed map.

Determinism: embeddings quantize to integer micro-units, so the moment
sums are exact and ORDER-INDEPENDENT (per-block int64 partials merged in
Python ints on the driver — no overflow at any corpus size); the only
float step is one LAPACK ``eigh`` on the d x d covariance (deterministic
for identical input on a host), after which the whitening matrix is
re-quantized and the per-row transform is pure int64 arithmetic —
bit-stable under any partitioning, serial-twin checkable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PCA_SCALE = 1_000_000  # micro-units for both the vectors and the model


def pca_fit_distributed(ds, vec_col: str = "embedding",
                        max_dim: int = 4096) -> dict:
    """One moment-collecting pass: per block emit (count, sum, sum of
    outer products) of the micro-quantized vectors — a single
    (1 + d + d*(d+1)/2)-long int64 row per block, independent of block
    size — then merge exactly in Python ints driver-side and
    eigendecompose the d x d covariance ONCE.

    Returns {"mean_q": int64[d] (micro-units, round-half-up),
    "eigvals": float64[d] desc, "whiten_q": int64[d, d] (micro-units;
    column j maps centered micro-vectors onto whitened axis j)} — sign
    fixed per eigenvector (largest-|coefficient| positive, first-index
    tie-break) so the decomposition is convention-stable."""

    def partial(batch: pa.Table) -> pa.Table:
        V = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if V.ndim != 2 or len(V) == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "moments": pa.array([], pa.list_(pa.int64()))})
        d = V.shape[1]
        if d > max_dim:
            raise ValueError(f"embedding dim {d} > max_dim {max_dim}: "
                             f"the d^2 covariance exchange would be huge")
        q = np.floor(V * PCA_SCALE + 0.5).astype(np.int64)
        s = q.sum(axis=0)
        xx = q.T @ q  # d x d int64; |q| ~ 1e6 so a 4096-row block is safe
        iu = np.triu_indices(d)
        row = np.concatenate([s, xx[iu]])
        return pa.table({"n": pa.array([len(q)], pa.int64()),
                         "moments": pa.array([row.tolist()],
                                             pa.list_(pa.int64()))})

    n_total = 0
    moments: list[int] | None = None
    for b in ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for n, row in zip(b.column("n").to_pylist(),
                          b.column("moments").to_pylist()):
            n_total += n
            if moments is None:
                moments = [int(v) for v in row]
            else:  # Python-int merge: exact at any corpus size
                for i, v in enumerate(row):
                    moments[i] += int(v)
    if not n_total:
        raise ValueError("pca_fit_distributed: empty input")

    # recover d from the packed length 1.. : d + d(d+1)/2
    L = len(moments)
    d = int((np.sqrt(9 + 8 * L) - 3) / 2)
    assert d + d * (d + 1) // 2 == L, "packed moment length mismatch"
    S = np.array(moments[:d], dtype=np.float64)
    XX = np.zeros((d, d), dtype=np.float64)
    iu = np.triu_indices(d)
    XX[iu] = np.array(moments[d:], dtype=np.float64)
    XX = XX + np.triu(XX, 1).T
    # population covariance of the micro-quantized vectors
    C = (XX - np.outer(S, S) / n_total) / n_total
    eigvals, eigvecs = np.linalg.eigh(C)
    order = np.argsort(eigvals)[::-1]
    eigvals, eigvecs = eigvals[order], eigvecs[:, order]
    # sign convention: the largest-|coefficient| entry positive
    for j in range(d):
        i = int(np.argmax(np.abs(eigvecs[:, j])))
        if eigvecs[i, j] < 0:
            eigvecs[:, j] = -eigvecs[:, j]
    # eigvals are in micro-unit^2; whitening scales each axis to unit
    # variance in the ORIGINAL float space: W_j = v_j / sqrt(lambda_f)
    # with lambda_f = lambda_q / PCA_SCALE^2.  The spectrum floors at
    # 1e-6 of the top eigenvalue: near-null directions carry no signal,
    # and an unbounded 1/sqrt gain would push the quantized whitening
    # coefficients past what the int64 transform dot can hold
    # (gain <= 1e3/sqrt(lam_max) keeps |q . Wq| < 2^63 for d <= 4096,
    # |v| <= 2)
    lam_f = np.maximum(eigvals, 0.0) / float(PCA_SCALE) ** 2
    lam_f = np.maximum(lam_f, max(float(lam_f.max()), 1e-12) * 1e-6)
    W = eigvecs / np.sqrt(lam_f)[None, :]
    mean_q = np.floor(S / n_total + 0.5).astype(np.int64)
    whiten_q = np.floor(W * PCA_SCALE + 0.5).astype(np.int64)
    return {"mean_q": mean_q, "eigvals": lam_f, "whiten_q": whiten_q}


def pca_whiten(ds, model: dict, n_components: int = 8,
               vec_col: str = "embedding", out_prefix: str = "w"):
    """Append ``{out_prefix}0..{n_components-1}`` int64 columns: the
    whitened coordinates in micro-units.  The model broadcasts once via
    ray.put; the per-row transform is integer: (q - mean_q) . whiten_q
    // PCA_SCALE (floor, both sides of the oracle) — so output is
    bit-identical under any partitioning, and ~unit-variance axes read
    directly as micro-sigma."""
    import ray

    Wq = np.asarray(model["whiten_q"], dtype=np.int64)[:, :n_components]
    m_ref = ray.put((np.asarray(model["mean_q"], dtype=np.int64), Wq))

    def fn(batch: pa.Table) -> pa.Table:
        mean_q, W = ray.get(m_ref)
        V = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if len(V) == 0:
            for j in range(W.shape[1]):
                batch = batch.append_column(f"{out_prefix}{j}",
                                            pa.array([], pa.int64()))
            return batch
        q = np.floor(V * PCA_SCALE + 0.5).astype(np.int64) - mean_q
        # |q| ~ 1e6, |W| ~ 1e6/sqrt(lam) bounded by quantization; the
        # per-axis dot stays well inside int64 for d <= 4096
        Y = (q @ W) // PCA_SCALE
        for j in range(W.shape[1]):
            batch = batch.append_column(f"{out_prefix}{j}",
                                        pa.array(Y[:, j], pa.int64()))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
