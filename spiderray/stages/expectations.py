"""Data-quality expectations — declarative corpus assertions evaluated
distributedly (the Great-Expectations-style contract check that guards a
10^12-row ingest before the expensive stages run).

An expectation is a (column, kind, params) rule; the validator makes ONE
pass with per-batch integer partial counters (rows checked / rows
violating per rule) merged through a tiny groupby — nothing row-sized
leaves the stage, results are bit-deterministic (integer sums), and the
report is SQL-restatable rule by rule.

Supported kinds:
  not_null                    — value is non-null
  unique                      — column has no duplicate values (exact,
                                via one distinct-count aggregate)
  between {lo, hi}            — lo ≤ value ≤ hi (nulls violate)
  in_set {values}             — value ∈ set (nulls violate)
  matches {pattern}           — full-match regex on strings (nulls violate)
  min_length / max_length {n} — string length bounds (nulls violate)
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa


def _violations(batch: pa.Table, col: str, kind: str, params: dict) -> int:
    vals = batch.column(col)
    n = len(vals)
    null_mask = np.asarray(vals.is_null())
    if kind == "not_null":
        return int(null_mask.sum())
    pyvals = vals.to_pylist()
    if kind == "between":
        lo, hi = params["lo"], params["hi"]
        return sum(1 for v in pyvals if v is None or not (lo <= v <= hi))
    if kind == "in_set":
        allowed = set(params["values"])
        return sum(1 for v in pyvals if v not in allowed)
    if kind == "matches":
        rx = re.compile(params["pattern"])
        return sum(1 for v in pyvals
                   if v is None or rx.fullmatch(v) is None)
    if kind == "min_length":
        m = params["n"]
        return sum(1 for v in pyvals if v is None or len(v) < m)
    if kind == "max_length":
        m = params["n"]
        return sum(1 for v in pyvals if v is None or len(v) > m)
    raise ValueError(f"unknown expectation kind {kind!r}")


def validate_expectations(ds, rules: list[dict]):
    """Evaluate ``rules`` (dicts with column/kind and rule params).  All
    scan rules AND the per-rule row/null counters ride ONE distributed
    pass of integer partials; each ``unique`` rule additionally costs one
    exact distinct-count aggregate (the price of exactness — its
    violation count is n_nonnull − n_distinct_nonnull, matching SQL's
    count(col) − count(DISTINCT col); NULLs are not_null's business).
    Returns a Dataset of (rule_id, column, kind, n_rows, n_violations,
    passed)."""
    from ray.data.aggregate import Sum

    import pandas as pd

    scan_rules = [(i, r) for i, r in enumerate(rules)
                  if r["kind"] != "unique"]
    uniq_rules = [(i, r) for i, r in enumerate(rules)
                  if r["kind"] == "unique"]

    def partial(batch: pa.Table) -> pa.Table:
        ids, checked, bad = [], [], []
        for i, r in scan_rules:
            ids.append(i)
            checked.append(batch.num_rows)
            bad.append(_violations(batch, r["column"], r["kind"], r))
        for i, r in uniq_rules:
            # the distinct count comes from the unique aggregate below;
            # this pass carries the row/null counters so no separate
            # ds.count() execution is ever needed
            ids.append(i)
            checked.append(batch.num_rows)
            bad.append(int(np.asarray(
                batch.column(r["column"]).is_null()).sum()))
        return pa.table({
            "rule_id": pa.array(ids, pa.int64()),
            "n_rows": pa.array(checked, pa.int64()),
            "n_violations": pa.array(bad, pa.int64()),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("rule_id")
        .aggregate(Sum("n_rows", alias_name="n_rows"),
                   Sum("n_violations", alias_name="n_violations"))
        .to_pandas()
    )
    by_rule = {int(r["rule_id"]): (int(r["n_rows"]), int(r["n_violations"]))
               for _, r in agg.iterrows()}
    rows = []
    for i, r in scan_rules:
        n, v = by_rule.get(i, (0, 0))
        rows.append((i, r["column"], r["kind"], n, v))
    for i, r in uniq_rules:
        col = r["column"]
        n, nulls = by_rule.get(i, (0, 0))
        distinct_nonnull = len([v for v in ds.unique(col) if v is not None])
        rows.append((i, col, "unique", n, (n - nulls) - distinct_nonnull))
    rows.sort()
    df = pd.DataFrame(rows, columns=["rule_id", "column", "kind",
                                     "n_rows", "n_violations"])
    df["passed"] = df["n_violations"] == 0
    import ray.data as rd

    return rd.from_pandas(df)


def categorical_drift(ds_a, ds_b, col: str, eps: float = 1e-6):
    """Population-Stability-Index drift between two corpus snapshots on a
    categorical column — the standard ingest-monitoring check (PSI > 0.2
    = significant shift).  One #categories-sized histogram aggregate per
    snapshot (integer counts → deterministic), PSI contributions computed
    per category from the merged table:

        contrib = (p_a − p_b) · ln(p_a / p_b),  p smoothed by ``eps``

    Returns a pandas DataFrame (category, n_a, n_b, psi_micro int64)
    sorted by category, plus the total via df.psi_micro.sum()."""
    import pandas as pd

    def hist(ds):
        from ray.data.aggregate import Count

        df = ds.groupby(col).aggregate(Count(alias_name="n")).to_pandas()
        return dict(zip(df[col], df["n"].astype(int)))

    ha, hb = hist(ds_a), hist(ds_b)
    cats = sorted(set(ha) | set(hb))
    ta = sum(ha.values()) or 1
    tb = sum(hb.values()) or 1
    rows = []
    for c in cats:
        pa_ = max(ha.get(c, 0) / ta, eps)
        pb_ = max(hb.get(c, 0) / tb, eps)
        contrib = (pa_ - pb_) * float(np.log(pa_ / pb_))
        rows.append((c, ha.get(c, 0), hb.get(c, 0),
                     int(np.floor(contrib * 1e6 + 0.5))))
    return pd.DataFrame(rows, columns=["category", "n_a", "n_b",
                                       "psi_micro"])


def windowed_drift(ds, ts_col: str, col: str, width_minutes: int = 60,
                   eps: float = 1e-6):
    """Streaming-shaped drift monitor: PSI of each tumbling event-time
    window's categorical distribution against the WHOLE corpus's — the
    per-window version of categorical_drift that flags when an ingest
    hour suddenly skews.  One (window, category) count shuffle (bounded
    by windows × categories) + one global histogram; PSI per window in
    micro units.  Returns a pandas DataFrame (window_start, n_events,
    psi_micro) sorted by window."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["window_start"] = df[ts_col].dt.floor(f"{width_minutes}min")
        g = df.groupby(["window_start", col], as_index=False).size()
        g = g.rename(columns={"size": "n"})
        from ..functions.arrowutil import pa_from_pandas

        return pa_from_pandas(g)

    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["window_start", col])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if counts.empty:
        return pd.DataFrame(columns=["window_start", "n_events", "psi_micro"])
    ref = counts.groupby(col)["n"].sum()
    ref_total = int(ref.sum())
    cats = sorted(ref.index)
    rows = []
    for w, sub in counts.groupby("window_start"):
        h = dict(zip(sub[col], sub["n"].astype(int)))
        total = sum(h.values()) or 1
        psi = 0
        for c in cats:
            pw = max(h.get(c, 0) / total, eps)
            pr = max(int(ref.get(c, 0)) / ref_total, eps)
            contrib = (pw - pr) * float(np.log(pw / pr))
            psi += int(np.floor(contrib * 1e6 + 0.5))
        rows.append((w, total, psi))
    rows.sort(key=lambda r: r[0])
    return pd.DataFrame(rows, columns=["window_start", "n_events",
                                       "psi_micro"])
