"""Windowed aggregates over the events stream (SURVEY.md §2.9 engine
additions; Ray Data has no event-time windows, so windows are expressed as
hash-partition-by-key + vectorized per-partition pandas — the ordering
assumption is per-key, stated here: events of one key must be groupable in
memory).

Tumbling windows live in queries.q_events_hourly (hour bucketing is a plain
column).  This module adds session windows (gap-based) — the shape a crawler
event stream would need."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.arrowutil import pa_from_pandas

N_PARTS = 32  # key-hash partitions; per-partition work is fully vectorized


def _add_part(ds, key_col: str, n_parts: int):
    def fn(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        if pa.types.is_integer(keys.type):
            part = (keys.to_numpy(zero_copy_only=False) % n_parts).astype(np.int32)
        else:
            import zlib

            part = np.fromiter(
                (zlib.crc32(str(k).encode()) % n_parts for k in keys.to_pylist()),
                dtype=np.int32,
                count=len(batch),
            )
        return batch.append_column("__part", pa.array(part))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def sessionize(ds, key_col: str = "user_id", ts_col: str = "ts", gap_minutes: int = 30,
               n_parts: int = N_PARTS):
    """Per-key session windows: a new session starts when the gap to the
    previous event exceeds ``gap_minutes``.  Emits one row per session:
    (key, session_id, n_events, start, end).

    Shape: ONE shuffle on hash(key) % n_parts, then each partition computes
    every key's sessions in one vectorized pandas pass (sort by (key, ts),
    break mask = key-change | gap, per-key session ids from a global cumsum
    minus each key's first value).  Per-group Python — one pandas call per
    *user* — took 4× longer at 3k users; this is one call per partition."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col], kind="mergesort")
        key_change = g[key_col] != g[key_col].shift()
        gap_break = g[ts_col].diff() > gap
        new_sess = key_change | gap_break
        sid_global = new_sess.cumsum()
        # 0-based per-key session id (matches the SQL window-sum oracle:
        # lag() is NULL on the first row of a key → new_s=0 → cumsum starts 0)
        session_id = sid_global - sid_global.groupby(g[key_col]).transform("min")
        out = (
            g.assign(session_id=session_id)
            .groupby([key_col, "session_id"], sort=False)
            .agg(n_events=(ts_col, "size"), start=(ts_col, "min"), end=(ts_col, "max"))
            .reset_index()
        )
        return out[[key_col, "session_id", "n_events", "start", "end"]]

    parted = _add_part(ds, key_col, n_parts)
    return parted.groupby("__part").map_groups(per_part, batch_format="pandas")


def tumbling(ds, ts_col: str = "ts", key_col: str | None = None,
             width_minutes: int = 60, agg_col: str | None = None):
    """Tumbling (fixed-width) windows: floor the timestamp to the window
    start, then a keyed partial+shuffle count/sum.  Returns one row per
    (key, window): (key?, window_start, n_events[, sum_<agg_col>])."""
    width = f"{width_minutes}min"

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["window_start"] = df[ts_col].dt.floor(width)
        keys = ([key_col] if key_col else []) + ["window_start"]
        aggs = {"n_events": (ts_col, "size")}
        if agg_col:
            aggs[f"sum_{agg_col}"] = (agg_col, "sum")
        g = df.groupby(keys, as_index=False).agg(**aggs)
        return pa_from_pandas(g)

    from ray.data.aggregate import Sum

    keys = ([key_col] if key_col else []) + ["window_start"]
    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    aggs = [Sum("n_events", alias_name="n_events")]
    if agg_col:
        aggs.append(Sum(f"sum_{agg_col}", alias_name=f"sum_{agg_col}"))
    return partials.groupby(keys).aggregate(*aggs)


def window_functions(ds, partition_by: list[str], order_by: list[str],
                     specs: list[dict], n_parts: int = N_PARTS):
    """Analytic (SQL OVER-clause) window functions: row_number / rank /
    dense_rank / lag / lead / cumsum / cummax / cummin / rolling_sum /
    rolling_mean, computed per partition key in ``order_by`` order and
    appended as new columns to the input rows.

    ``specs`` is a list of dicts:
      {"fn": "row_number", "out": "rn"}
      {"fn": "lag"|"lead", "col": c, "offset": 1, "default": d, "out": o}
      {"fn": "rank"|"dense_rank", "col": c, "ascending": bool, "out": o}
      {"fn": "cumsum"|"cummax"|"cummin", "col": c, "out": o}
      {"fn": "rolling_sum"|"rolling_mean", "col": c, "window": w, "out": o}

    Shape (same as sessionize): ONE shuffle on hash(partition_by[0]) %
    n_parts, then each hash partition computes every key's windows in a
    single vectorized pandas pass — one stable sort by (partition_by +
    order_by), then one cython groupby kernel per spec.  No per-key Python.
    Ordering assumption, stated: all rows of one partition key must fit one
    hash partition (same contract as sessionize); ``order_by`` should be a
    total order within a key or frame-based fns (lag/rolling) are
    tie-order-dependent.  Integer inputs stay integers in the output
    (rank/lag/rolling intermediates are cast back)."""
    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__part").sort_values(
            partition_by + order_by, kind="mergesort").reset_index(drop=True)
        gb = g.groupby(partition_by, sort=False)
        for s in specs:
            fn, out = s["fn"], s["out"]
            col = s.get("col")
            if fn == "row_number":
                g[out] = (gb.cumcount() + 1).astype(np.int64)
            elif fn in ("rank", "dense_rank"):
                method = "min" if fn == "rank" else "dense"
                g[out] = gb[col].rank(
                    method=method, ascending=s.get("ascending", True)
                ).astype(np.int64)
            elif fn in ("lag", "lead"):
                off = s.get("offset", 1)
                shifted = gb[col].shift(off if fn == "lag" else -off)
                default = s.get("default")
                if default is not None:
                    shifted = shifted.fillna(default)
                    if pd.api.types.is_integer_dtype(g[col]):
                        shifted = shifted.astype(np.int64)
                g[out] = shifted
            elif fn in ("cumsum", "cummax", "cummin"):
                g[out] = getattr(gb[col], fn)()
            elif fn in ("rolling_sum", "rolling_mean"):
                w = s["window"]
                # groupby(sort=False) on a frame already sorted by the keys
                # iterates groups in row order, so the concatenated rolling
                # result aligns positionally with g's rows
                rolled = gb[col].rolling(w, min_periods=1)
                vals = (rolled.sum() if fn == "rolling_sum" else rolled.mean()
                        ).to_numpy()
                if fn == "rolling_sum" and pd.api.types.is_integer_dtype(g[col]):
                    vals = np.rint(vals).astype(np.int64)
                g[out] = vals
            else:
                raise ValueError(f"unknown window fn {fn!r}")
        return g

    parted = _add_part(ds, partition_by[0], n_parts)
    return parted.groupby("__part").map_groups(per_part, batch_format="pandas")


def sliding(ds, ts_col: str = "ts", key_col: str | None = None,
            width_minutes: int = 60, slide_minutes: int = 30):
    """Sliding windows: each event lands in width/slide overlapping windows
    — expressed as an explode (one row per covering window) + keyed count.
    width must be a multiple of slide.  Returns (key?, window_start,
    n_events)."""
    if width_minutes % slide_minutes:
        raise ValueError("width_minutes must be a multiple of slide_minutes")
    k = width_minutes // slide_minutes
    slide = f"{slide_minutes}min"

    def explode(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        base = df[ts_col].dt.floor(slide)
        frames = []
        for i in range(k):
            f = df.copy()
            f["window_start"] = base - pd.Timedelta(minutes=slide_minutes * i)
            frames.append(f)
        out = pd.concat(frames, ignore_index=True)
        keys = ([key_col] if key_col else []) + ["window_start"]
        g = out.groupby(keys, as_index=False).agg(n_events=(ts_col, "size"))
        return pa_from_pandas(g)

    from ray.data.aggregate import Sum

    keys = ([key_col] if key_col else []) + ["window_start"]
    partials = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(keys).aggregate(Sum("n_events", alias_name="n_events"))


def global_scan(ds, order_col: str, size_col: str, out_col: str = "offset",
                n_buckets: int = 256, per_block_samples: int = 32):
    """GLOBAL ordered exclusive prefix sum: append ``out_col`` = sum of
    ``size_col`` over every row whose ``order_col`` sorts strictly before
    this row's.  ``order_col`` must be unique (ties would make the scan
    order — and therefore the offsets — ambiguous).

    This is the distributed-scan primitive ``window_functions`` (keyed
    partitions) cannot express: there is ONE logical partition.  Shape:

    1. Per-block local quantiles of ``order_col`` (≤ ``per_block_samples``
       rows each) → driver picks ``n_buckets``−1 range boundaries — the
       same sampling a distributed sort does, so bucket sizes are balanced
       even under key skew.
    2. One tiny shuffle of (bucket, partial size sum) rows → driver prefix
       over the ≤ n_buckets totals → broadcast exclusive bucket bases.
    3. groupby(bucket).map_groups: local sort + cumsum + base.  Each bucket
       must fit in a worker (n_buckets is the knob; at 10^12 rows pass
       n_buckets ≈ rows × row_bytes / 1 GiB).

    Nothing row-count-sized ever lands on the driver; the only all-to-all
    movement is the bucket-keyed shuffle any global sort needs.  The
    (order, size) projection is materialized so the sampling and
    bucket-total passes don't re-execute the caller's upstream chain — it
    is ~16 B/row in the object store (spillable), ~1000× smaller than a
    text corpus.  The upstream chain therefore executes twice end-to-end
    (once column-pruned for the slim projection, once full-width for the
    final bucket shuffle) — the standard price of a sampled range
    partition; materialize upstream first if it is expensive."""
    import ray
    from ray.data.aggregate import Sum

    slim = ds.select_columns([order_col, size_col]).materialize()

    # -- 1: sampled range boundaries ------------------------------------
    def local_quantiles(batch: pa.Table) -> pa.Table:
        keys = np.sort(batch.column(order_col).to_numpy(zero_copy_only=False))
        if len(keys) == 0:
            return pa.table({"k": pa.array([], batch.schema.field(order_col).type)})
        take = min(per_block_samples, len(keys))
        idx = np.linspace(0, len(keys) - 1, take).astype(np.int64)
        return pa.table({"k": pa.array(keys[idx])})

    sample = slim.map_batches(
        local_quantiles, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()["k"].to_numpy()
    sample = np.sort(sample)
    if len(sample) == 0:
        return ds.map_batches(
            lambda t: t.append_column(out_col, pa.array([], pa.int64())),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    nb = max(1, min(n_buckets, len(sample)))
    cut = np.linspace(0, len(sample) - 1, nb + 1).astype(np.int64)[1:-1]
    bounds = np.unique(sample[cut])  # right-exclusive range boundaries

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = batch.column(order_col).to_numpy(zero_copy_only=False)
        b = np.searchsorted(bounds, keys, side="right").astype(np.int64)
        return batch.append_column("__bucket", pa.array(b))

    # -- 2: exclusive bucket bases (over the slim projection) -----------
    def bucket_partial(batch: pa.Table) -> pa.Table:
        b = np.searchsorted(
            bounds, batch.column(order_col).to_numpy(zero_copy_only=False),
            side="right",
        ).astype(np.int64)
        s = batch.column(size_col).to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(b, return_inverse=True)
        return pa.table({"__bucket": pa.array(uniq),
                         "s": pa.array(np.bincount(inv, weights=s).astype(np.int64))})

    totals = (
        slim.map_batches(bucket_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("__bucket")
        .aggregate(Sum("s", alias_name="s"))
        .to_pandas()  # ≤ n_buckets rows
        .sort_values("__bucket")
    )
    csum = totals["s"].cumsum().to_numpy()
    bases = dict(zip(totals["__bucket"].tolist(),
                     np.concatenate([[0], csum[:-1]]).astype(np.int64).tolist()))
    bases_ref = ray.put(bases)

    # -- 3: per-bucket local sort + cumsum (the one full-input pass) ----
    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow",
                              zero_copy_batch=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(bases_ref)[int(g["__bucket"].iloc[0])]
        g = g.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        sizes = g[size_col].to_numpy().astype(np.int64)
        g[out_col] = base + np.concatenate([[0], np.cumsum(sizes)[:-1]])
        return g.drop(columns="__bucket")

    return bucketed.groupby("__bucket").map_groups(per_bucket,
                                                   batch_format="pandas")


def pack_chunks(ds, order_col: str, size_col: str, chunk_size: int,
                n_buckets: int = 256):
    """Concat-and-chunk sequence packing index (the GPT-style tokenizer
    shard map): documents are logically concatenated in ``order_col`` order
    and split into fixed ``chunk_size`` token chunks; each row gets its
    global token ``offset``, the ``chunk_id`` its first token lands in and
    the position ``chunk_pos`` within that chunk.  A pure function of the
    global scan — no chunk ever needs co-residency with its documents."""
    scanned = global_scan(ds, order_col, size_col, out_col="tok_offset",
                          n_buckets=n_buckets)

    def add_chunk(batch: pa.Table) -> pa.Table:
        off = batch.column("tok_offset").to_numpy(zero_copy_only=False)
        batch = batch.append_column(
            "chunk_id", pa.array((off // chunk_size).astype(np.int64)))
        return batch.append_column(
            "chunk_pos", pa.array((off % chunk_size).astype(np.int64)))

    return scanned.map_batches(add_chunk, batch_format="pyarrow",
                               zero_copy_batch=True)


def epoch_order(ds, id_col: str, salt: str = "e0"):
    """Reproducible per-epoch training order: rank every row by
    md5(salt + id) — a deterministic global shuffle that any worker (or
    a resumed run) reproduces exactly, one salt per epoch.  Built on the
    global_scan primitive with unit sizes (rank = count of rows hashing
    strictly before); md5 collisions are vanishing at corpus sizes and
    would only swap two adjacent ranks.  Appends ``epoch_rank`` int64."""
    import hashlib

    def key(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        ranks = [hashlib.md5(f"{salt}:{i}".encode()).hexdigest()
                 for i in ids]
        batch = batch.append_column("__order", pa.array(ranks, pa.string()))
        return batch.append_column(
            "__one", pa.array(np.ones(len(ids), np.int64)))

    keyed = ds.map_batches(key, batch_format="pyarrow", zero_copy_batch=True)
    out = global_scan(keyed, "__order", "__one", out_col="epoch_rank")
    return out.map_batches(
        lambda t: t.drop_columns(["__order", "__one"]),
        batch_format="pyarrow", zero_copy_batch=True)


def duration_bucket_batches(ds, dur_col: str, id_col: str,
                            bucket_edges_ms: list[int],
                            max_batch_ms: int = 30_000):
    """Length-bucketed batch packing — the standard ASR/TTS dataloader
    layout (sortagrad/espnet-style): clips bucket by duration range so a
    batch never pads a 1 s clip against a 30 s one, and within each
    bucket greedy cumulative packing cuts batches at ``max_batch_ms``
    total audio.  Deterministic: within-bucket order is the id, batch
    boundaries fall out of a cumulative sum — one window_functions
    shuffle (partition = bucket, order = id), then
    batch_idx = (cumsum(dur) − dur) // max_batch_ms — restatable as SQL
    window arithmetic.

    Returns the rows + (dur_bucket, batch_idx) columns."""
    edges = np.asarray(sorted(bucket_edges_ms), dtype=np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        durs = batch.column(dur_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bucket = np.searchsorted(edges, durs, side="left").astype(np.int64)
        return batch.append_column("dur_bucket", pa.array(bucket))

    with_bucket = ds.map_batches(assign, batch_format="pyarrow",
                                 zero_copy_batch=True)
    out = window_functions(
        with_bucket, ["dur_bucket"], [id_col],
        [{"fn": "cumsum", "col": dur_col, "out": "__cum"}])

    def cut(batch: pa.Table) -> pa.Table:
        cum = batch.column("__cum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        durs = batch.column(dur_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        idx = (cum - durs) // max_batch_ms
        batch = batch.drop_columns(["__cum"])
        return batch.append_column("batch_idx", pa.array(idx, pa.int64()))

    return out.map_batches(cut, batch_format="pyarrow", zero_copy_batch=True)


def pack_bins(ds, id_col: str, size_col: str, capacity: int,
              n_buckets: int = 64, salt: str = ""):
    """Sample packing: first-fit-decreasing bin packing of variable-length
    sequences into fixed ``capacity`` bins — the padding-minimizing
    batch layout modern trainers use where pack_chunks is the
    concat-and-split layout (documents stay intact here; there they are
    cut at chunk boundaries).

    Exact global FFD is inherently sequential, so the distributed form
    packs WITHIN md5 buckets: ``bucket = md5(salt:id) % n_buckets`` (a
    pure function of the id — partition-layout-invariant and stable
    across runs), one groupby(bucket).map_groups FFD per bucket, bins
    identified as (bucket, bin).  Bins never span buckets, so every bin
    is globally valid; the price vs global FFD is a bounded tail of
    under-filled last bins (≤ one per bucket) — at 10^12 rows pick
    n_buckets so a bucket's rows fit one worker (the same knob as
    global_scan).

    Items larger than ``capacity`` get a bin of their own, flagged
    ``oversize`` (the caller decides: truncate or drop).  Returns the
    input rows + (bucket, bin, bin_fill, oversize); ``bin_fill`` repeats
    the bin's total size on each member so fill-ratio stats need no
    second join."""
    import pandas as pd

    from .stats import split_bucket

    if capacity < 1:
        raise ValueError("capacity must be >= 1")

    def tag(batch: pa.Table) -> pa.Table:
        if not pa.types.is_integer(batch.schema.field(size_col).type):
            # float sizes would silently truncate in the FFD scan and
            # overfill bins past capacity (review finding) — refuse
            raise TypeError(
                f"pack_bins: {size_col!r} must be an integer column, got "
                f"{batch.schema.field(size_col).type} — quantize first.")
        ids = batch.column(id_col).to_pylist()
        b = pa.array([split_bucket(str(i), n_buckets, salt) for i in ids],
                     pa.int64())
        return batch.append_column("bucket", b)

    def ffd(group: pd.DataFrame) -> pd.DataFrame:
        # deterministic order: size DESC, id ASC (stringified for mixed
        # dtypes); classic FFD with a linear scan over open bins — bucket
        # sizes are bounded, so the quadratic worst case is bounded too
        g = group.copy()
        g["_id_s"] = g[id_col].astype(str)
        g = g.sort_values([size_col, "_id_s"], ascending=[False, True],
                          kind="mergesort")
        sizes = g[size_col].to_numpy()
        bins: list[int] = []      # remaining capacity per open bin
        assign = np.empty(len(g), np.int64)
        oversize = np.zeros(len(g), bool)
        for i, s in enumerate(sizes):
            s = int(s)
            if s > capacity:
                assign[i] = len(bins)
                bins.append(0)
                oversize[i] = True
                continue
            for j, rem in enumerate(bins):
                if rem >= s:
                    assign[i] = j
                    bins[j] = rem - s
                    break
            else:
                assign[i] = len(bins)
                bins.append(capacity - s)
        g["bin"] = assign
        fill = g.groupby("bin")[size_col].transform("sum")
        g["bin_fill"] = fill.astype("int64")
        g["oversize"] = oversize
        return g.drop(columns="_id_s")

    return (ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bucket").map_groups(ffd, batch_format="pandas"))


def funnel_counts(ds, steps: list[str], key_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts",
                  n_parts: int = N_PARTS):
    """Ordered-funnel analysis: how many users reach each stage of
    ``steps`` IN ORDER (each stage's event strictly after the previous
    stage's) — the conversion diagnostic every event pipeline ships.
    Stage semantics: a user reaches stage k when an event of type
    steps[k] exists with ts strictly greater than the ts at which they
    reached stage k-1 (earliest-qualifying, so the count is maximal and
    order-independent).

    Shape: ONE shuffle on hash(key) % n_parts (all of a user's events
    co-locate), then each partition resolves every user's depth in
    len(steps) vectorized pandas passes — no per-user Python; partials
    are len(steps) rows per partition, summed in one tiny keyed
    aggregate.  Returns a pandas frame (stage_idx, stage, users) with
    cumulative-funnel counts (users at stage k implies stages < k)."""
    from ray.data.aggregate import Sum

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        counts = []
        cur = None  # user -> ts of reaching the previous stage
        for step in steps:
            ev = g[g[type_col] == step]
            if cur is not None:
                prev = ev[key_col].map(cur)
                ev = ev[prev.notna() & (ev[ts_col] > prev)]
            cur = ev.groupby(key_col)[ts_col].min()
            counts.append(len(cur))
        return pd.DataFrame({
            "stage_idx": np.arange(1, len(steps) + 1, dtype=np.int64),
            "users": np.asarray(counts, dtype=np.int64),
        })

    parted = _add_part(ds, key_col, n_parts)
    agg = (parted.groupby("__part").map_groups(per_part,
                                               batch_format="pandas")
           .groupby("stage_idx").aggregate(Sum("users", alias_name="users"))
           .to_pandas())
    agg = agg.sort_values("stage_idx").reset_index(drop=True)
    agg["stage"] = [" > ".join(steps[:i]) for i in agg["stage_idx"]]
    agg["users"] = agg["users"].astype("int64")
    return agg[["stage_idx", "stage", "users"]]


def retention_cohorts(ds, key_col: str = "user_id", ts_col: str = "ts",
                      n_parts: int = N_PARTS):
    """Cohort retention matrix: users grouped by FIRST-ACTIVE day, counted
    on each later day they return — the (cohort_day, day_offset, n_users)
    long-form of the classic retention triangle.

    Shape: one shuffle on hash(key), per-partition vectorized pandas
    (distinct user-days, per-user min day, integer day offsets), then a
    (cohort × offset)-bounded count aggregate — partials and output are
    calendar-sized, never event-sized.  Cohort day is emitted as a
    'YYYY-MM-DD' STRING on both engine and oracle sides so the value
    hash cannot trip over date dtype differences."""
    from ray.data.aggregate import Sum

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        d = g[ts_col].dt.normalize()
        days = pd.DataFrame({key_col: g[key_col], "d": d}).drop_duplicates()
        cohort = days.groupby(key_col)["d"].transform("min")
        off = (days["d"] - cohort).dt.days.astype(np.int64)
        out = (pd.DataFrame({"cohort_day": cohort.dt.strftime("%Y-%m-%d"),
                             "day_offset": off})
               .groupby(["cohort_day", "day_offset"], sort=False)
               .size().rename("n_users").reset_index())
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    parted = _add_part(ds, key_col, n_parts)
    agg = (parted.groupby("__part").map_groups(per_part,
                                               batch_format="pandas")
           .groupby(["cohort_day", "day_offset"])
           .aggregate(Sum("n_users", alias_name="n_users"))
           .to_pandas())
    agg = agg.sort_values(["cohort_day", "day_offset"]).reset_index(drop=True)
    agg["n_users"] = agg["n_users"].astype("int64")
    agg["day_offset"] = agg["day_offset"].astype("int64")
    return agg


def event_transitions(ds, key_col: str = "user_id",
                      type_col: str = "event_type", ts_col: str = "ts",
                      id_col: str = "event_id", n_parts: int = N_PARTS):
    """First-order transition matrix of per-user event sequences — the
    Markov card behind funnel design (which hops actually happen?) and
    bot/anomaly screening (impossible transitions at volume).  Ordering
    is (ts, id) so simultaneous events resolve deterministically and the
    SQL window restates it exactly.

    Shape: one hash(key) shuffle, per-partition vectorized shift
    (sort by (key, ts, id), next type = shift(-1) masked at key
    boundaries), |types|²-bounded count partials → one tiny keyed Sum.
    Returns a pandas frame (src_type, dst_type, n) sorted."""
    from ray.data.aggregate import Sum

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        nxt = g[type_col].shift(-1)
        same = g[key_col] == g[key_col].shift(-1)
        out = (pd.DataFrame({"src_type": g[type_col][same],
                             "dst_type": nxt[same]})
               .groupby(["src_type", "dst_type"], sort=False)
               .size().rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    parted = _add_part(ds, key_col, n_parts)
    agg = (parted.groupby("__part").map_groups(per_part,
                                               batch_format="pandas")
           .groupby(["src_type", "dst_type"])
           .aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    agg["n"] = agg["n"].astype("int64")
    return agg.sort_values(["src_type", "dst_type"]).reset_index(drop=True)
