"""Large-table joins (SURVEY.md §2.4 engine additions).

The reference has no relational joins (its lookups are broadcast constant
maps, §2.4); the engine adds two both-sides-large strategies:

* ``hash_join`` — Ray Data's native ``Dataset.join`` (hash-partitioned on
  the key; available in this Ray version) with an explicit
  ``num_partitions``.
* ``bucketed_join`` — the portable explicit pattern from the Ray guide: add
  ``bucket = hash(key) % B`` to both sides, tag the side, union, group by
  bucket, and pandas-merge the two sides inside each group.  This is the
  shape to reach for when the native join's aggregator memory model doesn't
  fit (documents the partitioning assumption: B buckets must each fit in a
  worker's heap; salt hot keys into sub-buckets first).
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa


def _stable_bucket(v, num_buckets: int) -> int:
    """Process-independent bucket hash (Python hash() is salted per process
    and would scatter one key across buckets in different workers)."""
    if isinstance(v, int):
        return v % num_buckets
    return zlib.crc32(str(v).encode("utf-8")) % num_buckets


def hash_join(left, right, on: str, right_on: str | None = None, num_partitions: int = 16,
              join_type: str = "inner"):
    """Native hash-partitioned join."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,) if right_on else None,
    )


def bucketed_join(left, right, on: str, right_on: str | None = None, num_buckets: int = 32):
    """Explicit partitioned hash join (inner).  Column sets of the two sides
    must be disjoint apart from the key."""
    right_on = right_on or on

    # column provenance resolved ONCE from the schemas: merge_bucket slices
    # each side by its own column list, so a legitimately all-null data
    # column within a bucket survives (the old dropna(axis=1, how='all')
    # union-unpadding silently dropped it — round-2 verdict minor #6)
    left_cols = list(left.schema(fetch_if_missing=True).names)
    right_cols = list(right.schema(fetch_if_missing=True).names)

    def tag(side: int, key: str):
        def fn(batch: pa.Table) -> pa.Table:
            import numpy as np

            batch = batch.append_column(
                "__bucket",
                pa.array(
                    np.array(
                        [_stable_bucket(v, num_buckets) for v in batch.column(key).to_pylist()],
                        dtype=np.int64,
                    )
                ),
            )
            return batch.append_column("__side", pa.array([side] * len(batch), pa.int8()))

        return fn

    tagged = left.map_batches(tag(0, on), batch_format="pyarrow", zero_copy_batch=True).union(
        right.map_batches(tag(1, right_on), batch_format="pyarrow", zero_copy_batch=True)
    )

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lhs = g[g["__side"] == 0]
        rhs = g[g["__side"] == 1]
        if lhs.empty or rhs.empty:
            return pd.DataFrame()
        lhs = lhs[[c for c in left_cols if c in g.columns]]
        rhs = rhs[[c for c in right_cols if c in g.columns]]
        return lhs.merge(rhs, left_on=on, right_on=right_on)

    return tagged.groupby("__bucket", num_partitions=min(num_buckets, 16)).map_groups(
        merge_bucket, batch_format="pandas"
    )


def salted_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    num_partitions: int = 16,
    n_salts: int = 8,
    hot_keys: set | None = None,
    sample_rows: int = 100_000,
):
    """Hash join with HOT-KEY SALTING: a key holding a large fraction of the
    left side would concentrate one join partition (the all-to-all skew
    failure mode at scale).  Hot left keys are split across ``n_salts``
    sub-keys; the matching right rows are replicated once per salt (the
    right side of a hot key is typically the small dimension row).  Salt
    assignment is deterministic (row position within batch), so reruns
    produce identical partitioning.

    ``hot_keys=None`` detects them from a bounded driver-side sample: keys
    whose sample share exceeds 1/num_partitions.  Pass an explicit set when
    the skew is known (or persisted from a previous run's stats)."""
    import numpy as np

    right_on = right_on or on

    if hot_keys is None:
        sample = left.limit(sample_rows).select_columns([on]).to_pandas()
        if len(sample):
            counts = sample[on].value_counts()
            hot_keys = set(counts[counts > len(sample) / num_partitions].index)
        else:
            hot_keys = set()
    hot = sorted(hot_keys)
    if not hot:
        return hash_join(left, right, on, right_on, num_partitions)

    import ray

    hot_ref = ray.put(set(hot))

    def salt_left(batch: pa.Table) -> pa.Table:
        hk = ray.get(hot_ref)
        keys = batch.column(on).to_pylist()
        pos = np.arange(len(keys))
        salt = np.where(
            np.fromiter((k in hk for k in keys), dtype=bool, count=len(keys)),
            pos % n_salts,
            0,
        ).astype(np.int32)
        return batch.append_column("__salt", pa.array(salt))

    def replicate_right(batch: pa.Table) -> pa.Table:
        hk = ray.get(hot_ref)
        keys = batch.column(right_on).to_pylist()
        is_hot = np.fromiter((k in hk for k in keys), dtype=bool, count=len(keys))
        cold = batch.filter(pa.array(~is_hot)).append_column(
            "__salt", pa.array(np.zeros(int((~is_hot).sum()), dtype=np.int32))
        )
        parts = [cold]
        hot_rows = batch.filter(pa.array(is_hot))
        for s in range(n_salts):
            parts.append(
                hot_rows.append_column(
                    "__salt", pa.array(np.full(len(hot_rows), s, dtype=np.int32))
                )
            )
        return pa.concat_tables(parts)

    lsalted = left.map_batches(salt_left, batch_format="pyarrow", zero_copy_batch=True)
    rsalted = right.map_batches(replicate_right, batch_format="pyarrow", zero_copy_batch=True)
    joined = lsalted.join(
        rsalted,
        join_type="inner",
        num_partitions=num_partitions,
        on=(on, "__salt"),
        right_on=(right_on, "__salt") if right_on != on else None,
    )
    return joined.map_batches(
        lambda t: t.drop_columns([c for c in ("__salt",) if c in t.column_names]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
