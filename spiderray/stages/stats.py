"""Dataset statistics + split operators (training-data pipeline additions).

``train_test_split`` is a pure per-row map — the only correct shape for a
split at 10^12 rows: no shuffle, no state, deterministic from the row id
alone, so re-runs (and resumed partitions) assign identically.

``quantiles_exact`` computes EXACT quantiles over an integer-domain column
(cents, token counts, durations) via a distributed value histogram:
groupby(value).count() moves one row per DISTINCT value — bounded by the
value domain, not the row count (documented assumption: the domain fits on
the driver; ~10k distinct cents values ≪ 10^12 rows).  The rank definition
is explicit (1-based rank ceil(q·n), "lower" discrete quantile) so the SQL
oracle states the same arithmetic rather than relying on a library's
interpolation mode.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.arrowutil import pa_from_pandas


def split_bucket(key: str, n_buckets: int = 10_000, salt: str = "") -> int:
    """Deterministic bucket from md5 (stable across processes/languages;
    DuckDB replicates it as CAST('0x'||substr(md5(k),1,8) AS UBIGINT))."""
    h = hashlib.md5((salt + key).encode("utf-8")).hexdigest()[:8]
    return int(h, 16) % n_buckets


def train_test_split(
    ds,
    id_col: str = "doc_id",
    ratios: dict[str, float] | None = None,
    salt: str = "",
    n_buckets: int = 10_000,
):
    """Append a ``split`` column ('train'/'val'/'test'/... per ``ratios``,
    which must sum to 1) assigned by hash bucket of the row id.  Pure map:
    deterministic, order-independent, no shuffle."""
    ratios = ratios or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(ratios.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"split ratios must sum to 1 (got {total}); otherwise the last "
            "split silently absorbs the gap"
        )
    names = list(ratios)
    bounds = np.cumsum([ratios[n] for n in names]) * n_buckets
    bounds[-1] = n_buckets  # guard float drift so every bucket lands somewhere

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        buckets = np.fromiter(
            (split_bucket(str(i), n_buckets, salt) for i in ids),
            dtype=np.int64,
            count=len(ids),
        )
        idx = np.searchsorted(bounds, buckets, side="right")
        split = np.array(names, dtype=object)[idx]
        return batch.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _require_integer_domain(ds, col: str, caller: str) -> None:
    """The exact-quantile shuffle is O(distinct values) — cheap for integer
    domains (cents, counts, ms), ~O(n) for continuous doubles, where it
    silently degenerates into shuffling every row.  Refuse floats loudly and
    point at the bounded-error variant (round-2 verdict finding #4)."""
    schema = ds.schema(fetch_if_missing=True)
    base = getattr(schema, "base_schema", schema)
    if hasattr(base, "field"):  # Arrow schema
        t = base.field(col).type
        is_float = pa.types.is_floating(t)
    else:  # PandasBlockSchema (from_pandas datasets): names/types lists
        t = dict(zip(base.names, base.types)).get(col)
        is_float = t is not None and np.issubdtype(np.dtype(t), np.floating)
    if is_float:
        raise TypeError(
            f"{caller}({col!r}): column is {t} — the value-histogram shuffle "
            "is O(distinct values) and a continuous float column would "
            "shuffle ~every row.  Quantize to an integer domain first "
            "(e.g. cents) or use quantiles_approx() for a bounded-error "
            "estimate over floats."
        )


def quantiles_exact(ds, col: str, qs: list[float], num_partitions: int | None = None):
    """Exact quantiles of an integer-domain column.  Returns a list of
    (q, value) with value at 1-based rank ceil(q*n) of the sorted column.

    Shape: per-batch partial value counts → groupby(value).Sum (one row per
    distinct value crosses the shuffle) → driver cumsum over the sorted
    histogram (domain-bounded).  Floating-point columns are rejected — see
    ``_require_integer_domain`` / ``quantiles_approx``."""
    import pandas as pd

    from ray.data.aggregate import Sum

    _require_integer_domain(ds, col, "quantiles_exact")

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(vals, return_counts=True)
        return pa.table({col: pa.array(uniq), "n": pa.array(counts.astype(np.int64))})

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(col, num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n"))
    )
    df = hist.to_pandas()
    if df.empty:  # before sort_values: Ray drops columns on 0-row to_pandas
        return [(q, None) for q in qs]
    df = df.sort_values(col).reset_index(drop=True)
    cum = df["n"].cumsum().to_numpy()
    n = int(cum[-1])
    out = []
    for q in qs:
        rank = max(int(np.ceil(q * n)), 1)
        idx = int(np.searchsorted(cum, rank, side="left"))
        out.append((q, df[col].iloc[idx]))
    return out


def quantiles_approx(ds, col: str, qs: list[float], n_bins: int = 8192):
    """Bounded-error quantiles for CONTINUOUS (float) columns: a fixed-bin
    histogram between the distributed min/max.  Two passes — one Min/Max
    aggregate, then a bin-count shuffle of at most ``n_bins`` rows — so the
    shuffle is bounded by ``n_bins`` regardless of row count or value
    domain (the t-digest-lite shape; a mergeable digest would add weighted
    centroids but the error story is the same).

    Error bound: the returned value is the UPPER EDGE of the bin containing
    the true rank, so |estimate − true quantile value| ≤ (max−min)/n_bins.
    Rank definition matches quantiles_exact (1-based ceil(q·n)).
    NON-FINITE rows (NaN and ±inf) are IGNORED — NaN would cast to
    undefined int64 and land in bin 0, and a single inf would make the
    bin width infinite, poisoning every estimate."""
    from ray.data.aggregate import Max, Min, Sum

    # pass 1: finite-aware min/max via per-batch partials over the RAW
    # dataset (no filtered float copy of the column is ever materialized)
    def mm_partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        vals = vals[np.isfinite(vals)]
        if len(vals) == 0:
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({"lo": pa.array([float(vals.min())]),
                         "hi": pa.array([float(vals.max())])})

    mm = (
        ds.map_batches(mm_partial, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(Min("lo"), Max("hi"))
    )
    lo, hi = mm.get("min(lo)"), mm.get("max(hi)")
    if lo is None or hi is None:
        return [(q, None) for q in qs]
    lo, hi = float(lo), float(hi)
    if lo == hi:
        return [(q, lo) for q in qs]
    width = (hi - lo) / n_bins

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        vals = vals[np.isfinite(vals)]
        bins = np.clip(((vals - lo) / width).astype(np.int64), 0, n_bins - 1)
        uniq, counts = np.unique(bins, return_counts=True)
        return pa.table({"bin": pa.array(uniq), "n": pa.array(counts.astype(np.int64))})

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    )
    df = hist.to_pandas()
    if df.empty:
        return [(q, None) for q in qs]
    df = df.sort_values("bin").reset_index(drop=True)
    cum = df["n"].cumsum().to_numpy()
    n = int(cum[-1])
    out = []
    for q in qs:
        rank = max(int(np.ceil(q * n)), 1)
        idx = int(np.searchsorted(cum, rank, side="left"))
        b = int(df["bin"].iloc[idx])
        out.append((q, lo + (b + 1) * width))
    return out


def grouped_quantile_buckets(ds, group_col: str, col: str,
                             qs: list[float] | None = None,
                             labels: list[str] | None = None,
                             sentinel: int | None = None,
                             sentinel_label: str = "na"):
    """Label every row by which per-GROUP quantile band its integer value
    falls in — the CCNet shape (Wenzek et al. 2020, arXiv:1911.00359):
    bucket documents into head/middle/tail by per-language perplexity
    terciles so one language's ppl scale never gates another's.

    Shape: one grouped_quantiles_exact pass (integer histogram — O(distinct
    values) shuffle) computes the cut values, broadcast once via ray.put;
    the labeling is then a pure map.  ``sentinel`` rows (e.g. the -1
    inf-perplexity marker) are EXCLUDED from the cuts and labeled
    ``sentinel_label``; rows whose group has no cuts (all-sentinel group)
    get ``sentinel_label`` too."""
    import ray

    qs = qs or [1.0 / 3.0, 2.0 / 3.0]
    labels = labels or ["head", "middle", "tail"]
    if len(labels) != len(qs) + 1:
        raise ValueError(f"need {len(qs) + 1} labels for {len(qs)} cuts")

    base = ds
    if sentinel is not None:
        def drop_sentinel(batch: pa.Table) -> pa.Table:
            vals = batch.column(col).to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(vals != sentinel))
        base = ds.map_batches(drop_sentinel, batch_format="pyarrow",
                              zero_copy_batch=True)
    cuts_df = grouped_quantiles_exact(base, group_col, col, qs).to_pandas()
    cuts: dict = {}
    for _, row in cuts_df.iterrows():
        cuts.setdefault(row[group_col], []).append(
            (int(row["q_pct"]), int(row[col])))
    cut_vals = {g: [v for _, v in sorted(pairs)] for g, pairs in cuts.items()}
    cuts_ref = ray.put(cut_vals)

    def label(batch: pa.Table) -> pa.Table:
        c = ray.get(cuts_ref)
        groups = batch.column(group_col).to_pylist()
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        out = []
        for g, x in zip(groups, vals):
            edges = c.get(g)
            if edges is None or (sentinel is not None and x == sentinel):
                out.append(sentinel_label)
                continue
            k = int(np.searchsorted(np.asarray(edges), x, side="left"))
            out.append(labels[k])
        return batch.append_column("bucket", pa.array(out, pa.string()))

    return ds.map_batches(label, batch_format="pyarrow", zero_copy_batch=True)


def bottomk_sample(ds, k: int, id_col: str = "doc_id", salt: str = ""):
    """EXACT-size uniform sample of k rows via the bottom-k (KMV) sketch:
    rank every row by md5(id) — md5('<salt>:<id>') when salted — and keep
    the k smallest.  Unlike a
    rate-based sample the output size is exactly k (for n ≥ k), unlike
    reservoir sampling it is deterministic and merge-friendly: per-batch
    partial bottom-k heads (only k rows leave each batch) then one
    driver-sized k-row head — the same partial+final shape as
    top_k_per_group.  The md5 rank is reproducible in SQL — unsalted:
    md5(CAST(id AS VARCHAR)); salted: md5(CONCAT('<salt>', ':', CAST(id AS
    VARCHAR))) — so the oracle is plain ANSI SQL.  The delimited
    '<salt>:<id>' key matches epoch_order's and is unambiguous across
    (salt, id) splits (round-3 ADVICE finding).
    Returns a Dataset of the sampled rows plus their ``rank_hex``."""

    def partial(batch: pa.Table) -> pa.Table:
        import hashlib

        ids = batch.column(id_col).to_pylist()
        pre = f"{salt}:" if salt else ""
        ranks = [hashlib.md5(f"{pre}{i}".encode()).hexdigest() for i in ids]
        batch = batch.append_column("rank_hex", pa.array(ranks, pa.string()))
        order = np.argsort(np.asarray(ranks, dtype=object), kind="stable")[:k]
        return batch.take(pa.array(np.sort(order)))

    out = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # final head: candidates are ≤ k per input batch — sort the bounded
    # residue and cut at k (global sort of ≤ k·batches rows)
    return out.sort("rank_hex").limit(k)


def mixture_plan(ds, source_col: str, token_col: str,
                 weights: dict[str, float], token_budget: int):
    """Data-mixing planner: given target mixture ``weights`` (summing to
    1) and a total ``token_budget``, compute each source's sampling rate
    so the sampled corpus hits the budget at the target mixture — the
    arithmetic behind every "X% web, Y% code, Z% books" training recipe.

    One #sources histogram shuffle (integer token sums); rates are exact
    integer micro units: rate_micro = min(10^6, target_tokens·10^6 //
    tokens_s) — a source too small to fill its slice caps at 1.0
    (epochs > 1 are the trainer's business, flagged by ``short``).
    Apply with stratified_sample(rate={src: rate_micro/1e6})."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            source_col: batch.column(source_col).to_pylist(),
            "t": batch.column(token_col).to_numpy(zero_copy_only=False)
                 .astype(np.int64),
        })
        g = df.groupby(source_col, as_index=False)["t"].sum()
        return pa_from_pandas(g.rename(columns={"t": "tokens"}))

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(source_col)
        .aggregate(Sum("tokens", alias_name="tokens"))
        .to_pandas()
    )
    rows = []
    for _, r in hist.iterrows():
        src = r[source_col]
        tokens = int(r["tokens"])
        w = float(weights.get(src, 0.0))
        target = int(token_budget * w)
        rate_micro = min(1_000_000, target * 1_000_000 // tokens)             if tokens > 0 else 0
        rows.append((src, tokens, int(round(w * 1_000_000)), target,
                     rate_micro, rate_micro == 1_000_000 and target > tokens))
    rows.sort()
    return pd.DataFrame(rows, columns=[source_col, "tokens", "weight_micro",
                                       "target_tokens", "rate_micro",
                                       "short"])


def grouped_split(ds, group_col: str, ratios: dict[str, float] | None = None,
                  salt: str = "", n_buckets: int = 10_000):
    """LEAKAGE-SAFE split: the hash bucket comes from the GROUP key
    (speaker, source domain, session), so every row of a group lands in
    the same split — the speaker-disjoint train/test assignment ASR
    corpora require (splitting by clip id leaks a speaker's voice into
    both sides).  Same pure-map scale shape as train_test_split."""
    return train_test_split(ds, id_col=group_col, ratios=ratios, salt=salt,
                            n_buckets=n_buckets)


def tdigest_quantiles(ds, col: str, qs: list[float],
                      delta: int = 200, recompress_batch: int = 32_768):
    """Bounded-error quantiles via a MERGEABLE t-digest sketch
    (functions/tdigest.py) — the third quantile path: unlike
    quantiles_exact there is no integer-domain bound, and unlike
    quantiles_approx there is NO min/max pre-pass (single streaming
    pass).  Shape: per-batch vectorized digest build (≤~δ/2 centroid
    rows per batch cross the stage boundary — never raw values), one
    re-compress ``map_batches`` that folds every ``recompress_batch``
    centroid rows back to ≤~δ/2 (a ~``recompress_batch``/δ fan-in), then
    a driver-side final merge over the residue.  At 10^8 blocks the
    driver sees ~blocks·δ/fan-in rows — add more re-compress rounds if
    that ever grows past memory.

    Accuracy follows the k1 scale function: rank error ~O(1/δ), best at
    the tails.  The estimate depends (inside that bound) on block
    boundaries; use ``tdigest_quantiles_keyed`` when a bit-deterministic
    result is required (contract queries, regression pinning)."""
    from ..functions.tdigest import td_build, td_merge, td_quantile

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        vals = vals[np.isfinite(vals)]
        if len(vals) == 0:
            return pa.table({"mean": pa.array([], pa.float64()),
                             "weight": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        m, w = td_build(vals, None, delta)
        return pa.table({"mean": pa.array(m), "weight": pa.array(w),
                         "lo": pa.array(np.full(len(m), vals.min())),
                         "hi": pa.array(np.full(len(m), vals.max()))})

    def recompress(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        m = batch.column("mean").to_numpy(zero_copy_only=False)
        w = batch.column("weight").to_numpy(zero_copy_only=False)
        lo = float(batch.column("lo").to_numpy(zero_copy_only=False).min())
        hi = float(batch.column("hi").to_numpy(zero_copy_only=False).max())
        mm, mw = td_merge(m, w, delta)
        return pa.table({"mean": pa.array(mm), "weight": pa.array(mw),
                         "lo": pa.array(np.full(len(mm), lo)),
                         "hi": pa.array(np.full(len(mm), hi))})

    res = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(recompress, batch_format="pyarrow",
                     batch_size=recompress_batch)
        .to_pandas()
    )
    if res.empty:
        return [(q, None) for q in qs]
    m, w = td_merge(res["mean"].to_numpy(), res["weight"].to_numpy(), delta)
    vmin, vmax = float(res["lo"].min()), float(res["hi"].max())
    return [(q, td_quantile(m, w, q, vmin, vmax)) for q in qs]


def tdigest_quantiles_keyed(ds, id_col: str, col: str, qs: list[float],
                            delta: int = 200, num_parts: int = 64,
                            salt: str = ""):
    """Bit-DETERMINISTIC t-digest quantiles: rows route to one of
    ``num_parts`` partitions by md5 bucket of their id (independent of
    Ray's block boundaries), each partition builds one digest over its
    sorted values (groupby → map_groups), and the final merge sorts the
    combined centroid soup by (mean, weight) — so the result is a pure
    function of (table contents, delta, num_parts, salt).  One keyed
    shuffle of (part, value) pairs; output is num_parts·O(δ) centroids.
    The scale path with per-batch partials is ``tdigest_quantiles``."""
    import pandas as pd

    from ..functions.tdigest import td_build, td_merge, td_quantile

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        vals = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        parts = np.fromiter(
            (split_bucket(str(i), num_parts, salt) for i in ids),
            dtype=np.int64, count=len(ids))
        fin = np.isfinite(vals)
        return pa.table({"part": pa.array(parts[fin]),
                         "value": pa.array(vals[fin])})

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        m, w = td_build(g["value"].to_numpy(), None, delta)
        if len(m) == 0:
            return pd.DataFrame({"mean": [], "weight": [], "lo": [], "hi": []})
        v = g["value"].to_numpy()
        return pd.DataFrame({"mean": m, "weight": w,
                             "lo": float(v.min()), "hi": float(v.max())})

    res = (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    if res.empty:
        return [(q, None) for q in qs]
    m, w = td_merge(res["mean"].to_numpy(), res["weight"].to_numpy(np.int64),
                    delta)
    vmin, vmax = float(res["lo"].min()), float(res["hi"].max())
    return [(q, td_quantile(m, w, q, vmin, vmax)) for q in qs]


def stratified_sample(
    ds,
    strata_col: str,
    rate: float | dict[str, float],
    id_col: str = "doc_id",
    salt: str = "",
    n_buckets: int = 10_000,
):
    """Deterministic stratified sample: keep a row iff its id hash bucket
    falls under its stratum's rate.  Pure map (same scale shape as
    train_test_split): no shuffle, reproducible, and a row's membership
    never changes when the corpus grows — the property reservoir sampling
    lacks at scale.  ``rate`` is a global float or per-stratum dict
    (missing strata keep everything)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        strata = batch.column(strata_col).to_pylist()
        buckets = np.fromiter(
            (split_bucket(str(i), n_buckets, salt) for i in ids),
            dtype=np.int64,
            count=len(ids),
        )
        if isinstance(rate, dict):
            cut = np.fromiter(
                (rate.get(s, 1.0) * n_buckets for s in strata),
                dtype=np.float64,
                count=len(strata),
            )
        else:
            cut = np.full(len(ids), rate * n_buckets)
        return batch.filter(pa.array(buckets < cut))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def top_k_per_group(ds, group_cols: list[str], sort_col: str, k: int,
                    descending: bool = True, tie_col: str | None = None):
    """Grouped top-k: per-partition partial top-k inside map_batches (only
    k rows per group per batch survive — the combiner), then a keyed
    groupby + per-group head.  Ties break on ``tie_col`` ascending for
    determinism.  The generic form of 'top terms per source' / 'latest k
    events per user'."""
    import pandas as pd

    by = [sort_col] + ([tie_col] if tie_col else [])
    asc = [not descending] + ([True] if tie_col else [])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch  # keep the input schema; empty pandas loses dtypes
        df = batch.to_pandas()
        g = (
            df.sort_values(by, ascending=asc, kind="mergesort")
            .groupby(group_cols, as_index=False, sort=False)
            .head(k)
        )
        return pa_from_pandas(g)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(by, ascending=asc, kind="mergesort").head(k)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(group_cols).map_groups(final, batch_format="pandas")


def grouped_quantiles_exact(ds, group_col: str, col: str, qs: list[float]):
    """Exact per-group quantiles of an integer-domain column: one
    (group, value) histogram shuffle, then each group's cumsum + rank pick
    inside map_groups (same rank=ceil(q·n) definition as quantiles_exact).
    Returns a Dataset of (group, q_pct, value)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    _require_integer_domain(ds, col, "grouped_quantiles_exact")

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], batch.schema.field(group_col).type),
                    col: pa.array([], batch.schema.field(col).type),
                    "n": pa.array([], pa.int64()),
                }
            )
        df = batch.select([group_col, col]).to_pandas()
        g = df.groupby([group_col, col], as_index=False).size().rename(columns={"size": "n"})
        return pa_from_pandas(g)

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, col])
        .aggregate(Sum("n", alias_name="n"))
    )

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(col, kind="mergesort")
        cum = g["n"].cumsum().to_numpy()
        n = int(cum[-1])
        rows = []
        for q in qs:
            rank = max(int(np.ceil(q * n)), 1)
            idx = int(np.searchsorted(cum, rank, side="left"))
            rows.append((g[group_col].iloc[0], int(round(q * 100)), g[col].iloc[idx]))
        return pd.DataFrame(rows, columns=[group_col, "q_pct", col])

    return hist.groupby(group_col).map_groups(per_group, batch_format="pandas")


def grouped_quantiles_approx(ds, group_col: str, col: str, qs: list[float],
                             n_bins: int = 1024):
    """Bounded-error per-group quantiles for CONTINUOUS (float) columns —
    the grouped companion of quantiles_approx, closing the integer-domain
    restriction of grouped_quantiles_exact.  Two passes: (1) per-group
    finite min/max (per-batch pandas partials, one keyed groupby), edges
    broadcast once via ray.put; (2) per-batch (group, bin) partial counts,
    one keyed groupby — the shuffle is ≤ K·n_bins rows for K groups
    regardless of row count or value domain.  Per-group error bound:
    the result is the upper edge of the bin holding the true rank, so
    |estimate − true| ≤ (max_g − min_g)/n_bins.  Non-finite rows are
    ignored (same rationale as quantiles_approx).  Returns a Dataset of
    (group, q_pct, value); the output is inherently K-sized, so K is
    assumed driver-representable (the same contract every grouped
    quantile result carries)."""
    import ray

    from ray.data.aggregate import Max, Min, Sum

    def mm_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({group_col: pa.array([], batch.schema.field(group_col).type),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        df = batch.select([group_col, col]).to_pandas()
        df[col] = df[col].astype(np.float64)
        df = df[np.isfinite(df[col])]
        g = df.groupby(group_col, as_index=False)[col].agg(["min", "max"])
        g.columns = [group_col, "lo", "hi"]
        return pa_from_pandas(g)

    mm = (
        ds.map_batches(mm_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .aggregate(Min("lo", alias_name="lo"), Max("hi", alias_name="hi"))
        .to_pandas()
    )
    if mm.empty:
        import ray.data as rd

        return rd.from_items([])
    edges = {row[group_col]: (float(row["lo"]), float(row["hi"]))
             for _, row in mm.iterrows()}
    edges_ref = ray.put(edges)

    def partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        e = _ray.get(edges_ref)
        if batch.num_rows == 0:
            return pa.table({group_col: pa.array([], batch.schema.field(group_col).type),
                             "bin": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        df = batch.select([group_col, col]).to_pandas()
        df[col] = df[col].astype(np.float64)
        # null / unseen keys (pass 1's groupby drops null keys) are ignored,
        # matching grouped_quantiles_exact's behavior on nullable key columns
        lo_s = df[group_col].map({k: v[0] for k, v in e.items()})
        keep_rows = np.isfinite(df[col]) & lo_s.notna().to_numpy()
        df = df[keep_rows].reset_index(drop=True)
        lo = lo_s[keep_rows].to_numpy(dtype=np.float64)
        hi = df[group_col].map({k: v[1] for k, v in e.items()}).to_numpy(
            dtype=np.float64)
        width = (hi - lo) / n_bins
        vals = df[col].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            bins = np.where(width > 0,
                            np.clip(((vals - lo) / np.where(width > 0, width, 1.0)
                                     ).astype(np.int64), 0, n_bins - 1), 0)
        df["bin"] = bins.astype(np.int64)
        g = df.groupby([group_col, "bin"], as_index=False).size().rename(
            columns={"size": "n"})
        return pa_from_pandas(g)

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, "bin"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def per_group(g):
        import pandas as pd
        import ray as _ray

        e = _ray.get(edges_ref)
        key = g[group_col].iloc[0]
        lo, hi = e[key]
        width = (hi - lo) / n_bins
        g = g.sort_values("bin", kind="mergesort")
        cum = g["n"].cumsum().to_numpy()
        n = int(cum[-1])
        rows = []
        for q in qs:
            if width == 0.0:
                rows.append((key, int(round(q * 100)), lo))
                continue
            rank = max(int(np.ceil(q * n)), 1)
            idx = int(np.searchsorted(cum, rank, side="left"))
            b = int(g["bin"].iloc[idx])
            rows.append((key, int(round(q * 100)), lo + (b + 1) * width))
        return pd.DataFrame(rows, columns=[group_col, "q_pct", col])

    return hist.groupby(group_col).map_groups(per_group, batch_format="pandas")


def _mg_compress(items: np.ndarray, counts: np.ndarray, m: int):
    """Compress an exact (item, count) histogram to a Misra-Gries summary of
    ≤ m entries: subtract the (m+1)-th largest count from every counter and
    drop non-positives.  Each surviving weight underestimates the true count
    by at most that pivot, which is ≤ batch_total/(m+1) — the mergeable-
    summaries bound (Agarwal et al., PODS'12)."""
    if len(items) <= m:
        return items, counts
    # pivot = (m+1)-th largest count (kth order statistic, no full sort)
    pivot = np.partition(counts, len(counts) - (m + 1))[len(counts) - (m + 1)]
    w = counts - pivot
    keep = w > 0
    return items[keep], w[keep]


def heavy_hitters(ds, col: str, min_count: int, sketch_size: int = 4096,
                  tokenize: bool = False):
    """EXACT heavy hitters: every distinct value (or whitespace token when
    ``tokenize=True``) of ``col`` whose global count is ≥ ``min_count``,
    with its exact count.  Returns a Dataset of (item, n).

    Scale shape — the point is that NOTHING proportional to the distinct-item
    cardinality ever shuffles or lands on the driver:

    1. Per-batch exact counts compressed to a Misra-Gries summary of
       ``sketch_size`` entries (``_mg_compress``) → each block contributes
       ≤ m+1 rows to the shuffle regardless of its vocabulary.
    2. groupby(item).Sum merges the summaries; summed weight underestimates
       the true count by at most N/(m+1) (sum of per-batch pivots), so
       filtering at ``min_count − N/(m+1)`` yields a candidate superset —
       and that bound also caps the candidate count at N/(min_count−slack).
    3. Candidates broadcast via ray.put; a second pass exactly recounts ONLY
       candidate items (shuffle is O(|candidates|)) and filters ≥ min_count.

    Exactness requires min_count > N/(sketch_size+1); if the corpus turns
    out too large for the sketch, this raises with the sketch_size that
    would restore the guarantee instead of returning a silently incomplete
    answer."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    m = int(sketch_size)

    def to_items(batch: pa.Table):
        if tokenize:
            toks = pc.utf8_split_whitespace(batch.column(col))
            flat = pc.list_flatten(toks)
            arr = flat.to_numpy(zero_copy_only=False)
            return arr[arr != ""]
        # item domain is strings (matches the SQL oracle's CAST); non-string
        # columns are cast so the sentinel-append and Arrow output stay typed
        return pc.cast(batch.column(col), pa.string()).to_numpy(zero_copy_only=False)

    def sketch_partial(batch: pa.Table) -> pa.Table:
        items = to_items(batch)
        if len(items) == 0:
            return pa.table({"item": pa.array([], pa.string()),
                             "w": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.string())})
        uniq, counts = np.unique(items, return_counts=True)
        kept, w = _mg_compress(uniq, counts, m)
        return pa.table({
            "item": pa.array(np.append(kept, "").astype(object), pa.string()),
            "w": pa.array(np.append(w, len(items)).astype(np.int64)),
            # 't' sentinel row carries the batch's total item count so N is
            # an output of the same pass (no extra scan); '' item can also be
            # a real value, so the kind column (not the item) disambiguates
            "kind": pa.array(["i"] * len(kept) + ["t"], pa.string()),
        })

    summary = (
        ds.map_batches(sketch_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["kind", "item"])
        .aggregate(Sum("w", alias_name="w"))
        .materialize()
    )
    totals = summary.filter(expr="kind == 't'").to_pandas()
    n_total = int(totals["w"].sum()) if len(totals) else 0
    slack = n_total // (m + 1)  # max total underestimate across all batches
    if min_count <= slack:
        raise ValueError(
            f"heavy_hitters: min_count={min_count} ≤ N/(m+1)={slack} — the "
            f"sketch cannot guarantee completeness at this corpus size "
            f"(N={n_total}).  Use sketch_size ≥ {n_total // max(min_count - 1, 1) + 1}."
        )
    cand_df = (
        summary.filter(expr="kind == 'i'")
        .filter(expr=f"w >= {min_count - slack}")
        .to_pandas()  # bounded: ≤ N/(min_count − slack) rows by the MG bound
    )
    candidates = set(cand_df["item"].tolist())
    if not candidates:
        return ray.data.from_arrow(
            pa.table({"item": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
        )
    cand_ref = ray.put(candidates)

    def recount(batch: pa.Table) -> pa.Table:
        items = to_items(batch)
        cands = ray.get(cand_ref)
        if len(items) == 0:
            return pa.table({"item": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uniq, counts = np.unique(items, return_counts=True)
        mask = np.fromiter((u in cands for u in uniq), dtype=bool, count=len(uniq))
        return pa.table({"item": pa.array(uniq[mask].astype(object), pa.string()),
                         "n": pa.array(counts[mask].astype(np.int64))})

    exact = (
        ds.map_batches(recount, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("item")
        .aggregate(Sum("n", alias_name="n"))
        .filter(expr=f"n >= {min_count}")
    )
    return exact


def temperature_resample(ds, key_col: str, id_col: str, alpha: float = 0.5,
                         n_buckets: int = 10_000, salt: str = ""):
    """Temperature-based downsampling to rebalance a skewed key (the
    multilingual-corpus sampling of mT5/XLM-R, exponent ``alpha``): after
    filtering, each key's expected share is ∝ n_key^alpha.  Keep rate per
    key is (n_min/n_key)^(1-alpha) — the smallest key keeps everything,
    dominant keys are thinned — and the keep decision is the deterministic
    md5 bucket of the row id (``split_bucket``), so membership is stable
    across runs, processes and resumed partitions, exactly like
    ``train_test_split``/``stratified_sample``.

    Scale shape: one small groupby(key).count() (rows = #keys), thresholds
    broadcast, then a pure filter map — no data shuffle.  With alpha=0.5
    the rate is computed with IEEE-correctly-rounded ops only (divide,
    sqrt), so an independent SQL implementation reproduces the integer
    thresholds bit-exactly; other alphas go through pow(), whose last-ulp
    behavior may differ across math libraries (boundary rows could then
    differ from an external oracle — fine for production, noted for
    conformance)."""
    import math

    import ray

    counts = ds.groupby(key_col).count().to_pandas()
    n_col = [c for c in counts.columns if c != key_col][0]
    n_min = int(counts[n_col].min())
    thresholds = {}
    for k, n in zip(counts[key_col], counts[n_col]):
        if alpha == 0.5:
            rate = math.sqrt(n_min / int(n))
        else:
            rate = (n_min / int(n)) ** (1.0 - alpha)
        thresholds[k] = int(math.floor(rate * n_buckets + 0.5))
    thr_ref = ray.put(thresholds)

    def fn(batch: pa.Table) -> pa.Table:
        import ray as _ray

        thr = _ray.get(thr_ref)
        ids = batch.column(id_col).to_pylist()
        keys = batch.column(key_col).to_pylist()
        keep = np.fromiter(
            (split_bucket(str(i), n_buckets, salt) < thr.get(k, n_buckets)
             for i, k in zip(ids, keys)),
            dtype=bool, count=len(ids),
        )
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def profile_columns(ds, columns: list[str]):
    """Data-quality profile: one row per column with (n, n_null,
    n_distinct, min_v, max_v), values compared AS STRINGS (the cast is
    explicit so the SQL twin states the same lexical min/max).

    Scale shape: per-batch partials pre-deduplicate values (a block
    contributes each distinct (column, value) once) and pre-aggregate
    row/null counts, so the value shuffle is O(Σ per-column distinct ×
    blocks) and the count shuffle is O(columns × blocks); nothing
    row-count-sized moves or lands on the driver.  Returns a small
    Dataset (#columns rows)."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Min, Sum

    def partial_vals(batch: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in columns:
            col = batch.column(c)
            s = pc.cast(col, pa.string())
            arr = s.to_numpy(zero_copy_only=False)
            arr = np.unique(arr[pc.is_valid(s).to_numpy(zero_copy_only=False)])
            names.extend([c] * len(arr))
            vals.extend(arr.tolist())
        return pa.table({"column": pa.array(names, pa.string()),
                         "v": pa.array(vals, pa.string())})

    def partial_counts(batch: pa.Table) -> pa.Table:
        rows = []
        for c in columns:
            col = batch.column(c)
            n_null = int(pc.sum(pc.is_null(col)).as_py() or 0)
            rows.append((c, len(batch), n_null))
        return pa.table({
            "column": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "n_null": pa.array([r[2] for r in rows], pa.int64()),
        })

    # distinct (column, value) pairs, then per-column distinct count + range
    pairs = (
        ds.map_batches(partial_vals, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["column", "v"])
        .aggregate(Count(alias_name="_dup"))
    )
    ranges = (
        pairs.groupby("column")
        .aggregate(Count(alias_name="n_distinct"),
                   Min("v", alias_name="min_v"),
                   Max("v", alias_name="max_v"))
        .to_pandas()
    )
    counts = (
        ds.map_batches(partial_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("column")
        .aggregate(Sum("n", alias_name="n"), Sum("n_null", alias_name="n_null"))
        .to_pandas()
    )
    out = counts.merge(ranges, on="column", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype(np.int64)
    import ray

    return ray.data.from_arrow(pa.Table.from_pandas(
        out[["column", "n", "n_null", "n_distinct", "min_v", "max_v"]],
        preserve_index=False,
    ))


def grouped_outliers(ds, group_col: str, value_col: str, id_cols: list[str],
                     z_thresh: float = 3.0, scale: int = 1000):
    """Per-group z-score outliers with BIT-DETERMINISTIC statistics: values
    quantize to ``scale`` units (int64), per-batch partial (n, Σv, Σv²)
    integer sums merge exactly through one #groups-sized shuffle, and the
    mean/std/z arithmetic then uses only IEEE-correctly-rounded double ops
    in a fixed order — so an independent SQL implementation stating the
    same integer sums and the same op sequence reproduces every z bit-for-
    bit (float summation order, the usual distributed-stddev
    nondeterminism, never enters).  Σv² must fit int64: |v|·scale ≤ ~3e9
    per value at 10^12 rows; raise ``scale`` awareness accordingly.

    Returns rows whose |z| > z_thresh: (*id_cols, group, v_int, z_micro)."""
    import ray
    from ray.data.aggregate import Sum

    def quant(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        vi = np.floor(v * scale + 0.5).astype(np.int64)
        if len(vi) and int(np.abs(vi).max()) > 3_037_000_499:
            # sqrt(int64 max): one vi² would already wrap silently
            raise OverflowError(
                f"grouped_outliers: |value|·scale exceeds {3_037_000_499} "
                f"(max seen {int(np.abs(vi).max())}) — Σv² would overflow "
                "int64 and corrupt the statistics silently.  Lower `scale`."
            )
        return batch.append_column("__vi", pa.array(vi))

    quanted = ds.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            group_col: batch.column(group_col).to_numpy(zero_copy_only=False),
            "vi": batch.column("__vi").to_numpy(zero_copy_only=False),
        })
        df["vi2"] = df["vi"] * df["vi"]
        g = df.groupby(group_col, as_index=False).agg(
            n=("vi", "size"), s=("vi", "sum"), ss=("vi2", "sum"))
        return pa_from_pandas(g)

    stats = (
        quanted.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                   Sum("ss", alias_name="ss"))
        .to_pandas()  # #groups rows
    )
    params = {}
    for _, r in stats.iterrows():
        n = float(int(r["n"]))
        s = float(int(r["s"]))       # exact int → correctly-rounded double
        ss = float(int(r["ss"]))
        mean = s / n
        sd = float(np.sqrt(max(ss / n - mean * mean, 0.0)))
        params[r[group_col]] = (mean, sd)
    p_ref = ray.put(params)

    def flag(batch: pa.Table) -> pa.Table:
        import ray as _ray

        p = _ray.get(p_ref)
        keys = batch.column(group_col).to_pylist()
        vi = batch.column("__vi").to_numpy(zero_copy_only=False)
        mean = np.array([p[k][0] for k in keys])
        sd = np.array([p[k][1] for k in keys])
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(sd > 0, (vi.astype(np.float64) - mean) / sd, 0.0)
        keep = (sd > 0) & (np.abs(z) > z_thresh)
        out = batch.select(id_cols + [group_col]).filter(pa.array(keep))
        out = out.append_column(
            "v_int", pa.array(vi[keep].astype(np.int64)))
        return out.append_column(
            "z_micro",
            pa.array(np.floor(z[keep] * 1e6 + 0.5).astype(np.int64)))

    return quanted.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def classifier_auc(ds, score_col: str, label_col: str, scale: int = 1_000_000):
    """EXACT distributed ROC-AUC (Mann-Whitney U with tie correction) —
    the threshold-free companion to threshold_sweep: one number for "does
    this quality classifier rank keeps above drops at all operating
    points".

    Scores quantize to ``scale`` units (int64, the quantization IS the
    tie structure the statistic is computed on), so every count is an
    exact integer and an independent SQL restatement (window prefix sum
    over the grouped score table, the same ``//`` rounding) reproduces
    the result bit-for-bit — no float rank arithmetic, no sampling.

    Scale shape: groupby(score_q) → per-score (n_pos, n_neg) counts
    (bounded by DISTINCT scores); the ordered prefix Σ n_neg(s'<s) runs
    through windows.global_scan (sampled range partition + bucket bases —
    nothing row-sized on the driver); U2 = Σ_s np·(2·nn_below + nn) and
    AUC = U2 / (2·P·N) reported as round-half-up ppm.  U2 must fit
    int64: P·N ≤ 4.6e18 (≈2e9 rows per class) — raise ``scale``
    awareness accordingly."""
    from ray.data.aggregate import Sum

    from .windows import global_scan

    def quant(batch: pa.Table) -> pa.Table:
        s = batch.column(score_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = batch.column(label_col).to_numpy(zero_copy_only=False).astype(bool)
        sq = np.floor(s * scale + 0.5).astype(np.int64)
        return pa.table({"sq": pa.array(sq, pa.int64()),
                         "np_": pa.array(y.astype(np.int64), pa.int64()),
                         "nn": pa.array((~y).astype(np.int64), pa.int64())})

    groups = (ds.map_batches(quant, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("sq")
              .aggregate(Sum("np_", alias_name="np_"),
                         Sum("nn", alias_name="nn")))
    scanned = global_scan(groups, "sq", "nn", out_col="nn_below")

    def partial(batch: pa.Table) -> pa.Table:
        np_c = batch.column("np_").to_numpy(zero_copy_only=False)
        nn = batch.column("nn").to_numpy(zero_copy_only=False)
        below = batch.column("nn_below").to_numpy(zero_copy_only=False)
        return pa.table({
            "u2": pa.array([int((np_c * (2 * below + nn)).sum())], pa.int64()),
            "p": pa.array([int(np_c.sum())], pa.int64()),
            "n": pa.array([int(nn.sum())], pa.int64()),
        })

    import pandas as pd

    tot = (scanned.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas().sum())
    u2, p, n = int(tot["u2"]), int(tot["p"]), int(tot["n"])
    pn = p * n
    auc_ppm = (u2 * 1_000_000 + pn) // (2 * pn) if pn > 0 else 0
    return pd.DataFrame({"n_pos": pd.Series([p], dtype="int64"),
                         "n_neg": pd.Series([n], dtype="int64"),
                         "u2": pd.Series([u2], dtype="int64"),
                         "auc_ppm": pd.Series([auc_ppm], dtype="int64")})


def calibration_bins(ds, score_col: str, label_col: str, n_bins: int = 10,
                     scale: int = 1_000_000):
    """Reliability-diagram bins for a [0, 1] classifier score: per bin
    (floor(score·n_bins), clipped into [0, n_bins−1]) the row count,
    positive count and the exact integer sum of ``scale``-quantized
    scores — everything a calibration plot (observed rate vs mean
    predicted) needs, with no float summation anywhere.  One
    n_bins-bounded shuffle of per-batch integer partials."""
    from ray.data.aggregate import Sum

    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        s = batch.column(score_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = batch.column(label_col).to_numpy(zero_copy_only=False).astype(bool)
        b = np.clip(np.floor(s * n_bins).astype(np.int64), 0, n_bins - 1)
        sq = np.floor(s * scale + 0.5).astype(np.int64)
        df = pd.DataFrame({"bin": b, "n": 1,
                           "n_pos": y.astype(np.int64), "score_sum": sq})
        g = df.groupby("bin", as_index=False).sum()
        return pa_from_pandas(g)

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("bin")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("n_pos", alias_name="n_pos"),
                      Sum("score_sum", alias_name="score_sum"))
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("bin").reset_index(drop=True)


def grouped_linfit_outliers(ds, group_col: str, x_col: str, y_col: str,
                            k_sigma: float = 3.0):
    """Per-group least-squares fit ``y ~ a + b·x`` with BIT-DETERMINISTIC
    statistics, flagging rows whose residual exceeds ``k_sigma``·σ — the
    corpus-level mislabel detector (e.g. per-language transcript-token
    count vs audio duration: a clip far off its language's own
    tokens-per-millisecond line has a swapped / truncated transcript,
    which a per-row rate window like speech_rate_stage cannot see).

    Scale shape: per-batch partial integer sums (n, Σx, Σy, Σx², Σxy,
    Σy²) merge exactly through ONE #groups-sized shuffle; the driver
    computes (slope, intercept, σ) per group from exact Python ints in a
    fixed IEEE double op order; one ray.put broadcast + a stateless
    vectorized map appends (resid_milli, flagged) to every row.  An
    independent SQL restatement of the same sums and op sequence
    reproduces every residual bit-for-bit.

    Both columns must be integral; Σx²/Σxy/Σy² must fit int64 within any
    one batch (|v| is guarded at 3.037e9 — the int64-sqrt bound shared
    with grouped_outliers; at larger group sizes the exactness bound is
    n·max(v²) ≤ 9.2e18 per PARTIAL, which holds for ms-duration /
    token-count magnitudes at any realistic batch size).

    Groups with n < 2 or zero x-variance fall back to slope=0,
    intercept=mean(y).  Flag rule: |resid| > k_sigma·σ (strict, so a
    σ=0 group flags any nonzero deviation)."""
    import ray
    from ray.data.aggregate import Sum

    _GUARD = 3_037_000_499  # floor(sqrt(int64 max))

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        for name, v in ((x_col, x), (y_col, y)):
            if len(v) and int(np.abs(v).max()) > _GUARD:
                raise OverflowError(
                    f"grouped_linfit_outliers: |{name}| exceeds {_GUARD} — "
                    "squared sums would overflow int64 silently.  Rescale "
                    "the column first.")
        df = pd.DataFrame({
            group_col: batch.column(group_col).to_numpy(zero_copy_only=False),
            "x": x, "y": y,
        })
        df["xx"] = df["x"] * df["x"]
        df["xy"] = df["x"] * df["y"]
        df["yy"] = df["y"] * df["y"]
        g = df.groupby(group_col, as_index=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxx=("xx", "sum"), sxy=("xy", "sum"), syy=("yy", "sum"))
        return pa_from_pandas(g)

    stats = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                   Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
                   Sum("sxy", alias_name="sxy"), Sum("syy", alias_name="syy"))
        .to_pandas()  # #groups rows
    )
    params = {}
    for _, r in stats.iterrows():
        # exact Python-int arithmetic, then ONE rounding per float op —
        # the SQL twin states the identical sequence over HUGEINT sums
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxx, sxy, syy = int(r["sxx"]), int(r["sxy"]), int(r["syy"])
        den = n * sxx - sx * sx
        if n < 2 or den == 0:
            slope = 0.0
            intercept = float(sy) / float(n)
        else:
            slope = float(n * sxy - sx * sy) / float(den)
            intercept = (float(sy) - slope * float(sx)) / float(n)
        sse = float(syy) - (intercept * float(sy) + slope * float(sxy))
        sigma = float(np.sqrt(max(sse, 0.0) / float(n)))
        params[r[group_col]] = (intercept, slope, sigma)
    p_ref = ray.put(params)

    def flag(batch: pa.Table) -> pa.Table:
        import ray as _ray

        p = _ray.get(p_ref)
        keys = batch.column(group_col).to_pylist()
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        # null group keys are dropped by the fit's groupby (pandas
        # semantics); such rows cannot be scored — resid 0, never flagged
        known = np.array([k in p for k in keys], bool)
        a = np.array([p[k][0] if ok else 0.0 for k, ok in zip(keys, known)],
                     np.float64)
        b = np.array([p[k][1] if ok else 0.0 for k, ok in zip(keys, known)],
                     np.float64)
        s = np.array([p[k][2] if ok else 0.0 for k, ok in zip(keys, known)],
                     np.float64)
        r = np.where(known, y - (a + b * x), 0.0)
        flagged = known & (np.abs(r) > k_sigma * s)
        batch = batch.append_column(
            "resid_milli",
            pa.array(np.floor(r * 1000.0 + 0.5).astype(np.int64), pa.int64()))
        return batch.append_column("flagged", pa.array(flagged, pa.bool_()))

    return ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def term_drift(ds_a, ds_b, text_col: str = "text", top_n: int = 200):
    """Release-to-release term-distribution drift: integer-exact
    total-variation report over the union top-``top_n`` vocabulary — the
    companion to corpus_diff (which diffs *membership* by id+fingerprint;
    this diffs *content mix*, catching a language/domain shift even when
    every doc_id matches).

    Scale shape: per-batch vectorized term counts per side → ONE keyed
    groupby-Sum over (term, n_a, n_b) rows (bounded by vocabulary, never
    rows), per-block LOCAL top-``top_n`` so only top_n·n_blocks rows
    reach the driver cut; totals are two scalar Sums.

    All arithmetic is exact integers: probabilities quantize to ppm via
    round-half-up integer division ``(n·2e6 + tot) // (2·tot)`` so an
    independent SQL restatement using ``//`` reproduces every row
    bit-for-bit (no float division anywhere).  Output rows (sorted by
    term): top terms, ``__other__`` (remaining mass), ``__total__``
    (token totals; ppm_absdiff = Σ|ppm_a−ppm_b| = 2·TVD in ppm)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .textindex import term_value_counts

    def make_counts(side: str):
        def partial(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"term": pa.array([], pa.string()),
                                 "n_a": pa.array([], pa.int64()),
                                 "n_b": pa.array([], pa.int64())})
            terms, n = term_value_counts(batch.column(text_col))
            zero = np.zeros(len(n), np.int64)
            return pa.table({
                "term": terms,
                "n_a": pa.array(n if side == "a" else zero, pa.int64()),
                "n_b": pa.array(n if side == "b" else zero, pa.int64()),
            })
        return partial

    counts_a = ds_a.map_batches(make_counts("a"), batch_format="pyarrow",
                                zero_copy_batch=True)
    counts_b = ds_b.map_batches(make_counts("b"), batch_format="pyarrow",
                                zero_copy_batch=True)
    merged = (counts_a.union(counts_b).groupby("term")
              .aggregate(Sum("n_a", alias_name="n_a"),
                         Sum("n_b", alias_name="n_b"))
              .materialize())  # vocabulary-sized; three consumers below
    tot_a = int(merged.sum("n_a") or 0)
    tot_b = int(merged.sum("n_b") or 0)

    def local_top(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["_k"] = df["n_a"] + df["n_b"]
        df = df.sort_values(["_k", "term"], ascending=[False, True],
                            kind="mergesort").head(top_n)
        return pa_from_pandas(df.drop(columns="_k"))

    top = (merged.map_batches(local_top, batch_format="pyarrow")
           .to_pandas())
    top["_k"] = top["n_a"] + top["n_b"]
    top = (top.sort_values(["_k", "term"], ascending=[False, True],
                           kind="mergesort").head(top_n)
           .drop(columns="_k"))

    rows = [(str(t), int(na), int(nb))
            for t, na, nb in zip(top["term"], top["n_a"], top["n_b"])]
    rows.append(("__other__", tot_a - int(top["n_a"].sum()),
                 tot_b - int(top["n_b"].sum())))

    def ppm(n: int, tot: int) -> int:
        d = max(tot, 1)
        return (n * 2_000_000 + d) // (2 * d)

    out = [(t, na, nb, ppm(na, tot_a), ppm(nb, tot_b),
            abs(ppm(na, tot_a) - ppm(nb, tot_b))) for t, na, nb in rows]
    out.append(("__total__", tot_a, tot_b, 1_000_000, 1_000_000,
                sum(r[5] for r in out)))
    df = pd.DataFrame(out, columns=["term", "n_a", "n_b", "ppm_a", "ppm_b",
                                    "ppm_absdiff"])
    for c in df.columns[1:]:
        df[c] = df[c].astype("int64")
    return df.sort_values("term").reset_index(drop=True)


def corpus_diff(ds_a, ds_b, id_col: str = "doc_id", text_col: str = "text",
                num_buckets: int = 32):
    """Release-to-release corpus diff — the data-card maintenance pass a
    corpus publisher runs between versions: one (metric, value) table of
    n_added / n_removed / n_changed / n_unchanged, by id membership and
    content fingerprint (md5 of lower(trim(text)), null text as '' — the
    exact-dedup key; the byte-for-byte SQL restatement is
    md5(lower(trim(coalesce(text, '')))), the coalesce matching the
    engine's null handling — round-4 review finding).

    Scale shape: each side ships ONLY (id, fp, side) rows (never text);
    same-key bucketing co-locates both versions of an id, the per-bucket
    classifier is one pandas merge + vectorized comparisons emitting a
    ≤4-row count partial, and one bounded Sum finishes.  Returns pandas
    (metric, value) sorted by metric."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from ..functions.fingerprint import md5_fingerprint
    from .joins import _bucket_array

    def prep(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col)
            fps = [md5_fingerprint(t or "")
                   for t in batch.column(text_col).to_pylist()]
            return pa.table({
                id_col: ids,
                "fp": pa.array(fps, pa.string()),
                "__bucket": pa.array(_bucket_array(ids, num_buckets)),
                "__side": pa.array([side] * len(batch), pa.int8()),
            })
        return fn

    tagged = ds_a.map_batches(prep(0), batch_format="pyarrow",
                              zero_copy_batch=True).union(
        ds_b.map_batches(prep(1), batch_format="pyarrow", zero_copy_batch=True)
    )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["__side"] == 0][[id_col, "fp"]]
        b = g[g["__side"] == 1][[id_col, "fp"]]
        m = a.merge(b, on=id_col, how="outer", suffixes=("_a", "_b"))
        in_a = m["fp_a"].notna()
        in_b = m["fp_b"].notna()
        rows = {
            "n_added": int((~in_a & in_b).sum()),
            "n_removed": int((in_a & ~in_b).sum()),
            "n_changed": int((in_a & in_b & (m["fp_a"] != m["fp_b"])).sum()),
            "n_unchanged": int((in_a & in_b & (m["fp_a"] == m["fp_b"])).sum()),
        }
        return pd.DataFrame({"metric": list(rows), "n": list(rows.values())})

    out = (
        tagged.groupby("__bucket", num_partitions=min(num_buckets, 16))
        .map_groups(classify, batch_format="pandas")
        .groupby("metric")
        .aggregate(Sum("n", alias_name="value"))
        .to_pandas()
    )
    out["value"] = out["value"].astype("int64")
    return out.sort_values("metric").reset_index(drop=True)


def weighted_sample(ds, k: int, weight_col: str, id_col: str = "doc_id",
                    salt: str = ""):
    """EXACT-size weighted sample WITHOUT replacement (Efraimidis-Spirakis
    A-ES, Inf. Process. Lett. 2006): each row draws u ~ U(0,1] from
    md5('<salt>:<id>') and ranks by key = ln(u)/w — the top-k keys are a
    weighted sample without replacement (u^(1/w) order, log-domain for
    stability).  Deterministic and merge-friendly like bottomk_sample:
    per-batch partial top-k heads (≤ k rows leave each batch), one bounded
    final sort — membership depends only on (salt, id, weight), never on
    partitioning.  Rows with weight <= 0 are excluded.  Returns the
    sampled rows plus their ``es_key``."""
    import hashlib

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        pre = f"{salt}:" if salt else ""
        # 13 hex chars = 52 bits — exactly representable in float64
        u = np.fromiter(
            (int(hashlib.md5(f"{pre}{i}".encode()).hexdigest()[:13], 16)
             for i in ids),
            dtype=np.float64, count=len(ids),
        )
        u = (u + 1.0) / float(16 ** 13)  # U(0, 1]
        with np.errstate(divide="ignore", invalid="ignore"):
            key = np.log(u) / w
        ok = w > 0
        batch = batch.append_column("es_key", pa.array(key, pa.float64()))
        batch = batch.filter(pa.array(ok))
        order = np.argsort(
            batch.column("es_key").to_numpy(zero_copy_only=False))[::-1][:k]
        return batch.take(pa.array(np.sort(order)))

    out = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return out.sort("es_key", descending=True).limit(k)


def threshold_sweep(ds, score_col: str, label_col: str,
                    thresholds: list[float]):
    """Quality-classifier calibration: for each candidate keep-threshold t,
    the confusion counts and precision/recall/F1 of predicting positive
    when ``score >= t`` — the table a pipeline owner reads to pick the
    flagship keep/drop operating point.

    Scale shape: each batch digitizes scores into the sorted threshold
    grid (one searchsorted) and bincounts by label, so the shuffle is
    (len(thresholds)+1) x 2 counters per block — independent of corpus
    size; the suffix sums and ratio math run on the driver over the tiny
    grid.  Ratios are float64 int-division in a fixed expression order
    (tp/(tp+fp), 2*p*r/(p+r)), so a SQL twin computing the same
    expressions matches bit-exactly; empty denominators yield 0.0."""
    from ray.data.aggregate import Sum

    thr = np.asarray(sorted(thresholds), dtype=np.float64)
    n_thr = len(thr)
    if n_thr == 0:
        raise ValueError("thresholds must be non-empty")

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column(score_col).to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch.column(label_col).to_numpy(zero_copy_only=False).astype(bool)
        b = np.searchsorted(thr, s, side="right")  # = #{t_j <= s}
        pos = np.bincount(b[y], minlength=n_thr + 1)
        neg = np.bincount(b[~y], minlength=n_thr + 1)
        return pa.table({
            "bin": pa.array(np.arange(n_thr + 1, dtype=np.int32)),
            "n_pos": pa.array(pos.astype(np.int64)),
            "n_neg": pa.array(neg.astype(np.int64)),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(Sum("n_pos", alias_name="n_pos"),
                   Sum("n_neg", alias_name="n_neg"))
        .to_pandas()  # <= n_thr+1 rows: bounded by the grid, not the corpus
    )
    pos = np.zeros(n_thr + 1, dtype=np.int64)
    neg = np.zeros(n_thr + 1, dtype=np.int64)
    pos[agg["bin"].to_numpy()] = agg["n_pos"].to_numpy()
    neg[agg["bin"].to_numpy()] = agg["n_neg"].to_numpy()
    total_pos, total_neg = int(pos.sum()), int(neg.sum())
    cp, cn = np.cumsum(pos), np.cumsum(neg)
    tp = total_pos - cp[:n_thr]       # rows with label & score >= t_j
    fp = total_neg - cn[:n_thr]
    fn = total_pos - tp
    tn = total_neg - fp
    tp_f, fp_f, fn_f = (tp.astype(np.float64), fp.astype(np.float64),
                        fn.astype(np.float64))
    with np.errstate(divide="ignore", invalid="ignore"):
        prec = np.where(tp + fp > 0, tp_f / (tp_f + fp_f), 0.0)
        rec = np.where(tp + fn > 0, tp_f / (tp_f + fn_f), 0.0)
        f1 = np.where(prec + rec > 0.0, 2.0 * prec * rec / (prec + rec), 0.0)
    import pandas as pd

    return pd.DataFrame({
        "thr": thr, "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": prec, "recall": rec, "f1": f1,
    })


def _unimax_waterfall(counts: dict, budget_rows: float,
                      max_epochs: float) -> dict:
    """UniMax budget allocation (Chung et al. 2023, alg. 1): visit
    languages smallest-first; each gets min(n_l * max_epochs, an equal
    share of the remaining budget).  Small languages take their epoch cap,
    freeing budget that flows to the large ones — fairer than temperature
    sampling at the same budget.  Returns {key: quota_rows(float)}.
    Deterministic: ties in n broken by key."""
    items = sorted(counts.items(), key=lambda kv: (kv[1], str(kv[0])))
    quotas = {}
    remaining = float(budget_rows)
    for idx, (k, n) in enumerate(items):
        share = remaining / (len(items) - idx)
        q = min(float(n) * max_epochs, share)
        quotas[k] = q
        remaining -= q
    return quotas


def unimax_plan(ds, key_col: str, budget_rows: float,
                max_epochs: float = 1.0):
    """The UniMax sampling plan as a small table: per key (language), its
    corpus count, allocated quota, keep rate min(1, quota/n) and epoch
    count quota/n.  One small groupby(key).count() — rows = #keys —
    feeds the driver-side waterfall; nothing corpus-sized moves."""
    import pandas as pd

    counts = ds.groupby(key_col).count().to_pandas()
    n_col = [c for c in counts.columns if c != key_col][0]
    cmap = {k: int(n) for k, n in zip(counts[key_col], counts[n_col])}
    quotas = _unimax_waterfall(cmap, budget_rows, max_epochs)
    keys = sorted(cmap)
    n = np.asarray([cmap[k] for k in keys], dtype=np.int64)
    q = np.asarray([quotas[k] for k in keys], dtype=np.float64)
    return pd.DataFrame({
        key_col: keys,
        "n_rows": n,
        "quota": q,
        "keep_rate": np.minimum(1.0, q / n),
        "epochs": q / n,
    })


def unimax_resample(ds, key_col: str, id_col: str, budget_rows: float,
                    max_epochs: float = 1.0, n_buckets: int = 10_000,
                    salt: str = ""):
    """Downsample a skewed-key corpus to the UniMax allocation: keys whose
    quota covers the whole corpus pass through; oversized keys keep a
    deterministic md5-bucket fraction quota/n of their rows
    (``split_bucket`` membership — stable across runs, processes and
    resumed partitions, like ``temperature_resample``).  Keys whose quota
    exceeds one epoch (quota > n) still pass through once — replication
    into multiple epochs composes downstream via ``epoch_order``.

    Scale shape: one small groupby(key).count(), thresholds broadcast,
    then a pure filter map — no data shuffle."""
    import math

    import ray

    counts = ds.groupby(key_col).count().to_pandas()
    n_col = [c for c in counts.columns if c != key_col][0]
    cmap = {k: int(n) for k, n in zip(counts[key_col], counts[n_col])}
    quotas = _unimax_waterfall(cmap, budget_rows, max_epochs)
    thresholds = {
        k: int(math.floor(min(1.0, quotas[k] / n) * n_buckets + 0.5))
        for k, n in cmap.items()
    }
    thr_ref = ray.put(thresholds)

    def fn(batch: pa.Table) -> pa.Table:
        import ray as _ray

        thr = _ray.get(thr_ref)
        ids = batch.column(id_col).to_pylist()
        keys = batch.column(key_col).to_pylist()
        keep = np.fromiter(
            (split_bucket(str(i), n_buckets, salt) < thr.get(k, n_buckets)
             for i, k in zip(ids, keys)),
            dtype=bool, count=len(ids),
        )
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def canary_scan(ds, canaries: list[str], text_col: str = "text",
                max_canaries: int = 100_000):
    """Training-data governance scan for planted canary strings (the
    public 'Secret Sharer' methodology, Carlini et al. 2019: unique
    sentinel strings are planted in a corpus release so later corpora /
    model outputs can be audited for leakage).  Reports, for EVERY
    canary including absent ones, the number of documents containing it
    and the total occurrence count.

    Scale shape: the canary list is small by contract (a governance
    registry, not a corpus) and ships once in the task closure under a
    hard cap; each batch runs one vectorized ``pc.count_substring`` per
    canary and emits a ≤ |canaries|-row partial; ONE keyed groupby-Sum
    (bounded by |canaries|) finishes.  The corpus is never shuffled and
    nothing corpus-sized reaches the driver.  Occurrence counts are
    non-overlapping substring matches (the SQL replace()-arithmetic
    definition)."""
    from ray.data.aggregate import Sum

    if not canaries:
        raise ValueError("canary_scan: empty canary list")
    if len(canaries) > max_canaries:
        raise ValueError(
            f"canary_scan: {len(canaries)} canaries > max_canaries="
            f"{max_canaries} — at that size this is a corpus; use the "
            "decontaminate n-gram path instead.")
    if any(not c for c in canaries):
        raise ValueError("canary_scan: empty canary string")
    canon = list(dict.fromkeys(canaries))  # dedup, preserve order

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = pc.fill_null(batch.column(text_col), "")
        idx, docs, occ = [], [], []
        for i, c in enumerate(canon):
            n = pc.count_substring(col, c)
            occ_i = int(pc.sum(n).as_py() or 0)
            docs_i = int(pc.sum(pc.greater(n, 0).cast(pa.int64())).as_py()
                         or 0)
            idx.append(i)
            docs.append(docs_i)
            occ.append(occ_i)
        return pa.table({"canary_idx": pa.array(idx, pa.int64()),
                         "n_docs": pa.array(docs, pa.int64()),
                         "n_occurrences": pa.array(occ, pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("canary_idx")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("n_occurrences", alias_name="n_occurrences"))
           .to_pandas())
    counts = {int(r.canary_idx): (int(r.n_docs), int(r.n_occurrences))
              for r in agg.itertuples()}
    rows = [(c, *counts.get(i, (0, 0))) for i, c in enumerate(canon)]
    import pandas as pd

    return pd.DataFrame({
        "canary": pd.array([r[0] for r in rows], dtype="object"),
        "n_docs": pd.array([r[1] for r in rows], dtype="int64"),
        "n_occurrences": pd.array([r[2] for r in rows], dtype="int64"),
    })


def grouped_rollup(ds, keys: list, value_col: str, sentinel: str = "__ALL__"):
    """Multi-level subtotal aggregate — SQL's GROUP BY ROLLUP for the
    data-card use ("tokens by (source, lang), by source, and overall"
    in ONE result): counts and integer sums at every rollup level of
    ``keys``, rolled-up positions holding ``sentinel``.

    Scale shape: per-batch partial aggregation to the FINEST level
    (bounded by the key-combination count per batch), ONE keyed
    groupby-Sum at that level, then the coarser levels derive from the
    finest AGGREGATE (already tiny) with plain pandas — the corpus is
    touched once and only key-cardinality-sized tables move after the
    single shuffle.  ``value_col`` must be integer (quantize first) so
    every sum is exact under any partitioning.  Keys are stringified
    (the sentinel needs a common type); a NULL key becomes the string
    'None' — COALESCE upstream if that collides with real values."""
    from ray.data.aggregate import Sum

    import pandas as pd

    if not keys:
        raise ValueError("grouped_rollup: keys must be non-empty")

    def partial(batch: pa.Table) -> pa.Table:
        if not pa.types.is_integer(batch.schema.field(value_col).type):
            raise TypeError(
                f"grouped_rollup: {value_col!r} must be an integer column, "
                f"got {batch.schema.field(value_col).type} — quantize "
                "first.")
        df = batch.select(keys + [value_col]).to_pandas()
        for k in keys:
            df[k] = df[k].astype(str)
        g = df.groupby(keys, as_index=False).agg(
            n=(value_col, "size"), total=(value_col, "sum"))
        g["n"] = g["n"].astype("int64")
        g["total"] = g["total"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    finest = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(keys)
              .aggregate(Sum("n", alias_name="n"),
                         Sum("total", alias_name="total"))
              .to_pandas())
    levels = [finest]
    cur = finest
    for i in range(len(keys) - 1, -1, -1):
        up = (cur.groupby(keys[:i], as_index=False)
              .agg(n=("n", "sum"), total=("total", "sum"))
              if i else pd.DataFrame({"n": [cur["n"].sum()],
                                      "total": [cur["total"].sum()]}))
        for k in keys[i:]:
            up[k] = sentinel
        levels.append(up[keys + ["n", "total"]])
        cur = levels[-1] if i else cur
    out = pd.concat(levels, ignore_index=True)
    for c in ("n", "total"):
        out[c] = out[c].astype("int64")
    return (out[keys + ["n", "total"]]
            .sort_values(keys, kind="mergesort").reset_index(drop=True))


def rank_blend(ds, score_cols: list, id_col: str = "doc_id",
               weights: "list | None" = None,
               max_distinct: int = 2_000_000):
    """Multi-signal quality ensemble by rank normalization (the
    published FineWeb/quality-blend recipe: heterogeneous signals —
    lengths, ratios, classifier scores — become comparable as
    corpus-wide RANKS, then average into one score).  Per row, each
    signal maps to ``rank_ppm = count_below·1e6 // max(n-1, 1)`` (ties
    share the count-below rank, SQL's ``rank()-1``) and the blend is
    the weight-averaged integer ppm.

    Scale shape: each signal's exchange is a VALUE HISTOGRAM — per-batch
    (value, count) partials, one keyed groupby-Sum bounded by the
    signal's distinct-value count (quantize continuous signals first;
    a signal over ``max_distinct`` distinct values raises loudly); the
    sorted value → count-below lookup broadcasts once via ray.put and
    the final pass is a stateless searchsorted map.  All arithmetic is
    integer-exact, so a literal SQL restatement (window rank()) matches
    bit for bit."""
    import ray
    from ray.data.aggregate import Sum

    if not score_cols:
        raise ValueError("rank_blend: score_cols must be non-empty")
    w = [1] * len(score_cols) if weights is None else list(weights)
    if len(w) != len(score_cols) or any(
            not isinstance(x, int) or x <= 0 for x in w):
        raise ValueError("rank_blend: weights must be positive ints, one "
                         "per score column")
    wsum = sum(w)

    def partial(batch: pa.Table) -> pa.Table:
        sidx, vals, cnts = [], [], []
        for i, c in enumerate(score_cols):
            col = batch.column(c)
            if not pa.types.is_integer(col.type):
                raise TypeError(
                    f"rank_blend: {c!r} must be an integer column, got "
                    f"{col.type} — quantize first.")
            v, n = np.unique(col.to_numpy(zero_copy_only=False),
                             return_counts=True)
            sidx.extend([i] * len(v))
            vals.extend(v.tolist())
            cnts.extend(n.tolist())
        return pa.table({"sig": pa.array(sidx, pa.int32()),
                         "val": pa.array(vals, pa.int64()),
                         "cnt": pa.array(cnts, pa.int64())})

    hist = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["sig", "val"])
            .aggregate(Sum("cnt", alias_name="n")).to_pandas())
    if len(hist) > max_distinct:
        raise ValueError(
            f"rank_blend: {len(hist)} distinct (signal, value) pairs > "
            f"max_distinct={max_distinct} — quantize the signals.")
    lookups = []
    n_total = 0
    for i in range(len(score_cols)):
        g = hist[hist["sig"] == i].sort_values("val")
        vals = g["val"].to_numpy().astype(np.int64)
        cnts = g["n"].to_numpy().astype(np.int64)
        below = np.concatenate([[0], np.cumsum(cnts)[:-1]])
        lookups.append((vals, below))
        n_total = int(cnts.sum())
    denom = max(n_total - 1, 1)
    lk_ref = ray.put(lookups)

    def apply(batch: pa.Table) -> pa.Table:
        import ray as _ray

        lk = _ray.get(lk_ref)
        blend_num = np.zeros(len(batch), dtype=np.int64)
        for i, c in enumerate(score_cols):
            v = batch.column(c).to_numpy(zero_copy_only=False)
            vals, below = lk[i]
            pos = np.searchsorted(vals, v)
            rp = below[pos] * 1_000_000 // denom
            batch = batch.append_column(f"rank_{c}_ppm",
                                        pa.array(rp, pa.int64()))
            blend_num += w[i] * rp
        return batch.append_column("blend_ppm",
                                   pa.array(blend_num // wsum, pa.int64()))

    return ds.map_batches(apply, batch_format="pyarrow",
                          zero_copy_batch=True)


def _fill_string_nulls(batch: pa.Table, cols, null_key: str) -> pa.Table:
    """Replace nulls in string-typed columns with ``null_key``.  Null-TYPED
    columns (a block whose every value is null infers pa.null() — seen with
    from_items) cast to string first, else the groupby key sort crashes on
    None."""
    import pyarrow.compute as _pc

    for c in cols:
        col = batch.column(c)
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            batch = batch.set_column(
                batch.column_names.index(c), c, _pc.fill_null(col, null_key)
            )
    return batch


def k_anonymity(ds, quasi_cols: list, k: int):
    """k-anonymity audit over a quasi-identifier column set (Sweeney 2002):
    every distinct quasi-identifier combination with its row count and an
    ``at_risk`` flag (count < k — the combinations that re-identify an
    individual when the table is released).  The governance sibling of the
    PII scrub: scrubbing removes direct identifiers, this measures whether
    the INDIRECT ones still single people out.

    One groupby-Count whose shuffle is bounded by the number of distinct
    combinations (with per-batch pre-aggregation by Ray's partial combiners),
    never corpus-bounded.  Emits one row per combination — release gating
    joins ``at_risk`` back or drops/generalizes those rows.

    Null handling: Ray's groupby cannot sort null keys, so null STRING
    quasi values are reported under ``null_key`` (the null combination is
    itself a group — usually the riskiest one).  Null NUMERIC quasi values
    must be generalized upstream (no in-band integer sentinel is safe)."""

    from ray.data.aggregate import Count

    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    null_key = "__NULL__"

    def prefill(batch: pa.Table) -> pa.Table:
        return _fill_string_nulls(batch, quasi_cols, null_key)

    filled = ds.map_batches(prefill, batch_format="pyarrow", zero_copy_batch=True)
    agg = filled.groupby(list(quasi_cols)).aggregate(Count(alias_name="group_n"))

    def flag(batch: pa.Table) -> pa.Table:
        n = batch.column("group_n").to_numpy(zero_copy_only=False)
        return batch.append_column("at_risk", pa.array(n < k, pa.bool_()))

    return agg.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def l_diversity(ds, quasi_cols: list, sensitive_col: str, l: int):
    """l-diversity audit (Machanavajjhala 2007) — the companion of
    ``k_anonymity``: a quasi-identifier group can be large (k-safe) yet
    still leak when every member shares ONE sensitive value, so this
    reports, per distinct quasi combination, the group size AND the number
    of DISTINCT sensitive values, flagging groups with fewer than ``l``.

    Shuffle shape: one pre-aggregated groupby over (quasi…, sensitive) —
    bounded by the distinct-combination count, never rows — then a second
    #combos-sized groupby collapsing the sensitive axis.  Emits one row per
    quasi combination: (*quasi_cols, group_n, distinct_sensitive, at_risk).

    Nulls: string quasi/sensitive nulls land under ``__NULL__`` (a null
    sensitive value is itself one disclosure class); numeric quasi nulls
    must be generalized upstream, as in k_anonymity."""

    from ray.data.aggregate import Count, Sum

    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    if sensitive_col in quasi_cols:
        raise ValueError("sensitive_col must not be a quasi column")
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    null_key = "__NULL__"
    cols = list(quasi_cols) + [sensitive_col]

    def prefill(batch: pa.Table) -> pa.Table:
        return _fill_string_nulls(batch, cols, null_key)

    filled = ds.map_batches(prefill, batch_format="pyarrow", zero_copy_batch=True)
    # one row per (quasi…, sensitive) with its count — the bounded exchange
    fine = filled.groupby(cols).aggregate(Count(alias_name="__n"))
    agg = fine.groupby(list(quasi_cols)).aggregate(
        Sum("__n", alias_name="group_n"),
        Count(alias_name="distinct_sensitive"),
    )

    def flag(batch: pa.Table) -> pa.Table:
        d = batch.column("distinct_sensitive").to_numpy(zero_copy_only=False)
        return batch.append_column("at_risk", pa.array(d < l, pa.bool_()))

    return agg.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def t_closeness(ds, quasi_cols: list, sensitive_col: str, t_ppm: int):
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    member of the release-governance trio: a quasi-identifier group can be
    k-large AND l-diverse yet still leak when its sensitive-value
    DISTRIBUTION diverges from the corpus-wide one (e.g. a group that is
    90% one language in a 20%-background corpus).  For a categorical
    sensitive attribute the earth-mover distance under uniform ground
    distance is the total variation distance ½·Σ|p_i − q_i|; groups with
    TVD > t are flagged.

    Exact integer arithmetic end to end: with group counts n_gi (total
    n_g) and global counts N_i (total N), TVD = Σ|n_gi·N − N_i·n_g| /
    (2·n_g·N); the ppm report is round-half-up via integer division
    ((10⁶·num + n_g·N) // (2·n_g·N)) over PYTHON ints, so no overflow at
    any corpus size and a SQL restatement reproduces every row bit-for-bit.

    Shuffle shape: the SAME one (quasi…, sensitive) pre-aggregated
    groupby-Count l_diversity makes — bounded by the distinct-combination
    count, never rows; the global distribution and every per-group EMD are
    then derived from that #combos-sized aggregate on the driver (the
    bounded-report contract every governance card here carries).  Emits
    one row per quasi combination: (*quasi_cols, group_n, tvd_ppm,
    at_risk).  Nulls: string nulls land under ``__NULL__`` as in the
    siblings."""
    import pandas as pd

    from ray.data.aggregate import Count

    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    if sensitive_col in quasi_cols:
        raise ValueError("sensitive_col must not be a quasi column")
    if not (0 < t_ppm <= 1_000_000):
        raise ValueError(f"t_ppm must be in (0, 1e6], got {t_ppm}")
    null_key = "__NULL__"
    cols = list(quasi_cols) + [sensitive_col]

    def prefill(batch: pa.Table) -> pa.Table:
        return _fill_string_nulls(batch, cols, null_key)

    filled = ds.map_batches(prefill, batch_format="pyarrow", zero_copy_batch=True)
    fine = (filled.groupby(cols).aggregate(Count(alias_name="__n"))
            .to_pandas())  # #combos rows — the bounded exchange
    if not len(fine):
        return pd.DataFrame(
            columns=list(quasi_cols) + ["group_n", "tvd_ppm", "at_risk"])

    # global sensitive distribution and per-group EMD in exact Python ints
    glob = fine.groupby(sensitive_col)["__n"].sum()  # N_i
    n_total = int(glob.sum())
    glob_i = {k: int(v) for k, v in glob.items()}
    rows = []
    for key, g in fine.groupby(quasi_cols, dropna=False):
        if not isinstance(key, tuple):
            key = (key,)
        n_g = int(g["__n"].sum())
        have = {s: int(n) for s, n in zip(g[sensitive_col], g["__n"])}
        num = sum(abs(have.get(s, 0) * n_total - n_i * n_g)
                  for s, n_i in glob_i.items())
        den = n_g * n_total
        tvd_ppm = (1_000_000 * num + den) // (2 * den)
        rows.append((*key, n_g, tvd_ppm, tvd_ppm > t_ppm))
    out = pd.DataFrame(rows, columns=list(quasi_cols)
                       + ["group_n", "tvd_ppm", "at_risk"])
    out["group_n"] = out["group_n"].astype(np.int64)
    out["tvd_ppm"] = out["tvd_ppm"].astype(np.int64)
    return out.sort_values(list(quasi_cols)).reset_index(drop=True)


def mad_outliers(ds, group_col: str, value_col: str, id_cols: list[str],
                 k: float = 3.5, scale: int = 1000):
    """Per-group ROBUST outliers via the modified z-score (Iglewicz &
    Hoaglin 1993): z_mad = 0.6745·(v − median) / MAD, flagging |z_mad| > k.
    The robust sibling of ``grouped_outliers`` — mean/std statistics are
    themselves dragged by the outliers they hunt (masking), while the
    median/MAD breakdown point is 50%, so this is the gate to reach for on
    heavy-tailed corpus metrics (durations, lengths, perplexities).

    Bit-deterministic by the same discipline as grouped_outliers: values
    quantize to ``scale`` units (int64); the per-group median and the
    median absolute deviation are EXACT discrete quantiles (rank
    ⌈n/2⌉, via grouped_quantiles_exact's value-histogram shuffle — O(distinct
    values) per exchange, never rows); the final z arithmetic is a fixed
    IEEE double op sequence (0.6745·dev, then /MAD) over exact integers, so
    an independent SQL restatement reproduces every flagged row bit-for-bit.

    Two narrow exchanges: ONE (group, value) histogram shuffle — the
    abs-dev histogram is a pure function of the value histogram once the
    median is known (|v − med| with the same counts), so the MAD comes out
    of the SAME map_groups that picks the median (rank ⌈n/2⌉ on the derived
    histogram ≡ rank ⌈n/2⌉ on per-row abs-devs) — then a streamed flag pass
    with the #groups-sized (median, MAD) map broadcast once.  Groups whose
    MAD is 0 (≥half the group at the median) are skipped — the modified z
    is undefined there; pair with k_anonymity-style counts if those
    degenerate groups need a separate report."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    def quant(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        vi = np.floor(v * scale + 0.5).astype(np.int64)
        return batch.append_column("__vi", pa.array(vi))

    quanted = ds.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                group_col: pa.array([], batch.schema.field(group_col).type),
                "__vi": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        df = batch.select([group_col, "__vi"]).to_pandas()
        g = (df.groupby([group_col, "__vi"], as_index=False).size()
             .rename(columns={"size": "n"}))
        return pa_from_pandas(g)

    hist = (quanted.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True)
            .groupby([group_col, "__vi"])
            .aggregate(Sum("n", alias_name="n")))

    def med_mad(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values("__vi", kind="mergesort")
        vals = g["__vi"].to_numpy(np.int64)
        cnts = g["n"].to_numpy(np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        rank = max(int(np.ceil(0.5 * n)), 1)
        med = int(vals[int(np.searchsorted(cum, rank, side="left"))])
        # abs-dev histogram derived from the value histogram: same multiset
        # of |v − med| the per-row pass would produce, so the ⌈n/2⌉ rank
        # pick is bit-identical to grouped_quantiles_exact on per-row devs
        ad = np.abs(vals - med)
        order = np.argsort(ad, kind="mergesort")
        ad_cum = np.cumsum(cnts[order])
        mad = int(ad[order][int(np.searchsorted(ad_cum, rank, side="left"))])
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             "med": [med], "mad": [mad]})

    mm_df = hist.groupby(group_col).map_groups(
        med_mad, batch_format="pandas").to_pandas()  # #groups rows
    params = {r[group_col]: (int(r["med"]), int(r["mad"]))
              for _, r in mm_df.iterrows()}
    p_ref = ray.put(params)

    def flag(batch: pa.Table) -> pa.Table:
        import ray as _ray

        p = _ray.get(p_ref)
        g = batch.column(group_col).to_pylist()
        vi = batch.column("__vi").to_numpy(zero_copy_only=False)
        meds = np.array([p[x][0] for x in g], np.int64)
        mads = np.array([p[x][1] for x in g], np.int64)
        # exact ints → correctly-rounded doubles; fixed op order 0.6745·dev/MAD
        with np.errstate(divide="ignore", invalid="ignore"):
            z = 0.6745 * (vi - meds).astype(np.float64) / mads.astype(np.float64)
        keep = (mads > 0) & (np.abs(z) > k)
        out = batch.filter(pa.array(keep))
        zk = z[keep]
        zmad_micro = np.floor(zk * 1_000_000 + 0.5).astype(np.int64)
        cols = {c: out.column(c) for c in id_cols + [group_col]}
        cols["v_int"] = out.column("__vi")
        cols["zmad_micro"] = pa.array(zmad_micro)
        return pa.table(cols)

    return quanted.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def pivot_counts(ds, row_col: str, col_col: str, prefix: str = "cnt_"):
    """Crosstab / PIVOT report: one output row per distinct ``row_col``
    value, one int64 count column per distinct ``col_col`` value (named
    ``{prefix}{value}``, columns in sorted value order) — the wide-format
    data card (language × source, codec × sample-rate…) every corpus
    release ships.

    Distributed shape: one pre-aggregated (row, col)-Count groupby —
    shuffle bounded by the distinct-cell count — then the driver pivots
    the #cells-sized aggregate to wide (a report, by definition small; a
    cell count beyond driver memory means the crosstab itself is
    unprintable).  Missing cells fill 0.  Null keys land under __NULL__."""
    import pandas as pd
    import pyarrow.compute as _pc

    from ray.data.aggregate import Count

    null_key = "__NULL__"

    def prefill(batch: pa.Table) -> pa.Table:
        for c in (row_col, col_col):
            col = batch.column(c)
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                batch = batch.set_column(
                    batch.column_names.index(c), c, _pc.fill_null(col, null_key)
                )
        return batch

    cells = (
        ds.map_batches(prefill, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([row_col, col_col])
        .aggregate(Count(alias_name="n"))
        .to_pandas()  # #cells rows — the report itself
    )
    wide = cells.pivot_table(index=row_col, columns=col_col, values="n",
                             aggfunc="sum", fill_value=0)
    wide = wide.reindex(sorted(wide.columns), axis=1)
    wide.columns = [f"{prefix}{c}" for c in wide.columns]
    for c in wide.columns:
        wide[c] = wide[c].astype("int64")
    return wide.reset_index().sort_values(row_col).reset_index(drop=True)


def vocab_growth(ds, max_id: int, n_buckets: int = 10,
                 id_col: str = "doc_id", text_col: str = "text"):
    """Heaps-law vocabulary-growth data card: how many NEW distinct terms
    each successive slice of the corpus contributes — the saturation
    curve that tells a corpus builder whether more of the same source
    still buys vocabulary (a flat tail means it does not) and flags
    template/boilerplate floods (a cliff after bucket 0).

    Semantics: a term belongs to the bucket of its FIRST occurrence,
    bucket = first_doc · n_buckets // (max_id + 1) on the id axis — a
    declarative definition (no scan order), so the curve is identical
    under any partitioning and is restatable as plain SQL.

    Scale shape: vectorized Arrow explode → per-batch LOCAL min-id per
    term → one keyed groupby-Min over (term, first_doc) rows (bounded by
    vocabulary, never corpus rows — the same exchange build_vocab /
    term_drift make) → per-block bucket count partials → an n_buckets-
    bounded Sum; only the ≤ n_buckets histogram reaches the driver,
    where the cumulative column is derived.  Returns a pandas frame
    (bucket, new_terms, cum_vocab) sorted by bucket."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Min, Sum

    from .textindex import _ws_tokens

    def firsts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "first_doc": pa.array([], pa.int64())})
        toks = _ws_tokens(batch.column(text_col))
        lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
            zero_copy_only=False)
        ids = np.repeat(
            batch.column(id_col).to_numpy(zero_copy_only=False), lens)
        flat = pc.list_flatten(toks)
        df = pd.DataFrame({"term": flat.to_pandas(),
                           "first_doc": ids.astype(np.int64)})
        df = df[df.term != ""]
        if df.empty:
            # all-whitespace batch: an empty pandas object column would
            # convert to Arrow NULL type and break block-schema
            # unification with the string-typed blocks
            return pa.table({"term": pa.array([], pa.string()),
                             "first_doc": pa.array([], pa.int64())})
        g = df.groupby("term", as_index=False)["first_doc"].min()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_term = (
        ds.map_batches(firsts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term").aggregate(Min("first_doc"))
    )

    def bucketize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "new_terms": pa.array([], pa.int64())})
        fd = batch.column("min(first_doc)").to_numpy(zero_copy_only=False)
        b = fd.astype(np.int64) * n_buckets // (max_id + 1)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(ub, pa.int64()),
                         "new_terms": pa.array(cnt, pa.int64())})

    hist = (
        per_term.map_batches(bucketize, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("bucket").aggregate(Sum("new_terms"))
        .to_pandas()
    )
    hist = hist.rename(columns={"sum(new_terms)": "new_terms"})
    hist = hist.sort_values("bucket").reset_index(drop=True)
    hist["cum_vocab"] = hist["new_terms"].cumsum()
    return hist[["bucket", "new_terms", "cum_vocab"]].astype("int64")


def rate_spike_card(ds, key_col: str = "event_type", ts_col: str = "ts",
                    factor: int = 2):
    """Event-rate spike card: hourly counts per key with a
    ``is_spike`` flag when an hour's count exceeds ``factor`` × the
    key's LOWER-MEDIAN hourly count — the traffic-anomaly screen (bot
    bursts, replay floods, broken client retries) every event pipeline
    keeps.  The lower median (sorted[(n−1)//2]) is integer-exact and
    restates as DuckDB ``quantile_disc(n, 0.5)``, so the whole card is
    literal SQL — no float quantile interpolation anywhere.

    Shape: per-batch vectorized (key, hour) count partials → one
    (keys × hours)-bounded groupby-Sum; the median/flag pass runs on
    the driver over that bounded table.  Hour buckets travel as
    'YYYY-MM-DD HH:00:00' STRINGS on both sides (the retention-cohort
    dtype convention)."""
    import pandas as pd
    import pyarrow.compute as pc  # noqa: F401  (parity with siblings)
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key_col: pa.array([], pa.string()),
                             "hour_b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        df = pd.DataFrame({
            key_col: batch.column(key_col).to_pandas(),
            "hour_b": batch.column(ts_col).to_pandas()
            .dt.floor("h").dt.strftime("%Y-%m-%d %H:00:00"),
        })
        g = df.groupby([key_col, "hour_b"], sort=False).size().rename(
            "n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby([key_col, "hour_b"])
              .aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    counts["n"] = counts["n"].astype("int64")
    med = (counts.groupby(key_col)["n"]
           .apply(lambda s: int(np.sort(s.to_numpy())[(len(s) - 1) // 2]))
           .rename("med").reset_index())
    out = counts.merge(med, on=key_col)
    out["is_spike"] = out["n"] > factor * out["med"]
    out = out.sort_values([key_col, "hour_b"]).reset_index(drop=True)
    return out[[key_col, "hour_b", "n", "is_spike"]]


def grouped_bottomk_sample(ds, group_col: str, k: int,
                           id_col: str = "doc_id", salt: str = ""):
    """Per-GROUP exact-k deterministic sample — bottomk_sample's grouped
    sibling: every group keeps its k smallest md5('<salt>:<id>') rows,
    the per-domain human-review / eval-slice draw that a global sample
    starves small groups of.  Same delimited key convention; per-batch
    LOCAL per-group bottom-k (only k rows per group per batch survive)
    then one keyed exchange with a vectorized per-partition head —
    same combiner shape as top_k_per_group.  Returns the sampled rows
    plus ``rank_hex``; deterministic across runs and partitionings, so
    the SQL restatement (row_number over md5 order) is literal."""
    import hashlib

    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("rank_hex",
                                       pa.array([], pa.string()))
        ids = batch.column(id_col).to_pylist()
        pre = f"{salt}:" if salt else ""
        ranks = [hashlib.md5(f"{pre}{i}".encode()).hexdigest() for i in ids]
        batch = batch.append_column("rank_hex", pa.array(ranks, pa.string()))
        df = batch.to_pandas()
        df = (df.sort_values([group_col, "rank_hex"], kind="mergesort")
              .groupby(group_col, sort=False).head(k))
        return pa.Table.from_pandas(df, preserve_index=False)

    def head_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, "rank_hex"], kind="mergesort")
        return g.groupby(group_col, sort=False).head(k).drop(
            columns="__part")

    from .windows import _add_part

    local = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    return (_add_part(local, group_col, 32).groupby("__part")
            .map_groups(head_part, batch_format="pandas"))
