"""t-digest — mergeable quantile sketch (Dunning & Ertl, "Computing
extremely accurate quantiles using t-digests", arXiv:1902.04023).

The merging-digest variant: a digest is a weight-ordered list of
centroids (mean, weight); building compresses a sorted value stream into
at most ~2·delta centroids whose sizes follow the k1 scale function
k(q) = (delta/2π)·asin(2q−1), giving relative accuracy at the tails
(centroids near q=0/1 hold few points, mid-range centroids hold many).
Digests MERGE: concatenate centroids, sort by mean, re-compress — which
is what makes the sketch distributable (per-batch partials, tree or
driver merge) with memory O(delta) regardless of row count.

Everything here is pure numpy/float64 arithmetic — deterministic for a
fixed input ORDER, which is why the keyed stage variant sorts centroids
by (mean, weight) before every merge pass (stages/stats.py).

This is the third quantile path next to quantiles_exact (integer-domain
histogram) and quantiles_approx (fixed-bin, needs a min/max pre-pass):
t-digest needs NO pre-pass, no value-domain bound, and its partials are
mergeable across runs/checkpoints.
"""

from __future__ import annotations

import numpy as np

DEFAULT_DELTA = 200


def _k_scale(q: np.ndarray | float, delta: float) -> np.ndarray | float:
    return delta / (2.0 * np.pi) * np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0)


def td_build(values: np.ndarray, weights: np.ndarray | None = None,
             delta: int = DEFAULT_DELTA):
    """Compress (values, weights) — values need NOT be pre-sorted — into
    t-digest centroids.  Returns (means, weights) float64/int64 arrays
    sorted by mean.

    Unweighted input takes the VECTORIZED one-shot clustering path: the
    k1 boundaries are a fixed partition of ranks (k runs −δ/4 … +δ/4 in
    unit steps), so sorted values slice at rank cuts and centroids fall
    out of one ``np.add.reduceat`` — no Python loop in the per-batch hot
    path.  Weighted input (centroid soups from merges) uses the greedy
    scan: absorb while k(q_right) − k(q_left) ≤ 1.
    """
    v = np.asarray(values, dtype=np.float64)
    if weights is None:
        v = v[np.isfinite(v)]
        if len(v) == 0:
            return np.empty(0, np.float64), np.empty(0, np.int64)
        return _td_build_sorted_unweighted(np.sort(v, kind="stable"), delta)
    w = np.asarray(weights, dtype=np.int64)
    keep = np.isfinite(v) & (w > 0)
    v, w = v[keep], w[keep]
    if len(v) == 0:
        return np.empty(0, np.float64), np.empty(0, np.int64)
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    total = int(w.sum())
    out_m: list[float] = []
    out_w: list[int] = []
    cur_sum = float(v[0]) * int(w[0])  # weighted sum, exact mean on emit
    cur_w = int(w[0])
    sigma = 0  # weight already emitted
    k_left = _k_scale(0.0, delta)
    for i in range(1, len(v)):
        wi = int(w[i])
        q_right = (sigma + cur_w + wi) / total
        if _k_scale(q_right, delta) - k_left <= 1.0:
            cur_sum += float(v[i]) * wi
            cur_w += wi
        else:
            out_m.append(cur_sum / cur_w)
            out_w.append(cur_w)
            sigma += cur_w
            k_left = _k_scale(sigma / total, delta)
            cur_sum = float(v[i]) * wi
            cur_w = wi
    out_m.append(cur_sum / cur_w)
    out_w.append(cur_w)
    return np.asarray(out_m, np.float64), np.asarray(out_w, np.int64)


def _td_build_sorted_unweighted(v: np.ndarray, delta: int):
    """One-shot k1 clustering of a SORTED unit-weight array: rank cuts at
    q_j = (sin(2π·k_j/δ)+1)/2 for k_j = −δ/4+1 … δ/4−1, centroids via
    reduceat.  Deterministic from (values, n, delta) alone."""
    n = len(v)
    j = np.arange(1, int(np.ceil(delta / 2.0)))
    qb = (np.sin(2.0 * np.pi * (-delta / 4.0 + j) / delta) + 1.0) / 2.0
    ranks = np.unique(np.round(qb * n).astype(np.int64))
    ranks = ranks[(ranks > 0) & (ranks < n)]
    starts = np.concatenate([np.zeros(1, np.int64), ranks])
    sums = np.add.reduceat(v, starts)
    counts = np.diff(np.concatenate([starts, [n]]))
    return sums / counts, counts.astype(np.int64)


def td_merge(means: np.ndarray, weights: np.ndarray,
             delta: int = DEFAULT_DELTA):
    """Merge centroid soup (concatenated from many digests) into one
    digest: sort by (mean, weight) — the deterministic tie-break — and
    re-compress.  Same (means, weights) → same output, independent of
    which digest each centroid came from."""
    m = np.asarray(means, dtype=np.float64)
    w = np.asarray(weights, dtype=np.int64)
    order = np.lexsort((w, m))
    return td_build(m[order], w[order], delta)


def td_quantile(means: np.ndarray, weights: np.ndarray, q: float,
                vmin: float, vmax: float) -> float:
    """Estimate the q-quantile from centroids (sorted by mean) with the
    standard mid-point interpolation, clamped to the true [vmin, vmax]."""
    if len(means) == 0:
        raise ValueError("empty digest")
    if len(means) == 1:
        return float(means[0])
    w = weights.astype(np.float64)
    total = w.sum()
    target = np.clip(q, 0.0, 1.0) * total
    # cumulative weight at each centroid's MIDPOINT
    cum = np.cumsum(w) - w / 2.0
    if target <= cum[0]:
        # interpolate between vmin and the first centroid mean
        frac = target / cum[0] if cum[0] > 0 else 0.0
        return float(vmin + frac * (means[0] - vmin))
    if target >= cum[-1]:
        span = total - cum[-1]
        frac = (target - cum[-1]) / span if span > 0 else 1.0
        return float(means[-1] + frac * (vmax - means[-1]))
    idx = int(np.searchsorted(cum, target, side="right"))
    lo_c, hi_c = cum[idx - 1], cum[idx]
    frac = (target - lo_c) / (hi_c - lo_c) if hi_c > lo_c else 0.0
    return float(means[idx - 1] + frac * (means[idx] - means[idx - 1]))
