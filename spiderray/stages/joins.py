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
        lhs = lhs.dropna(axis=1, how="all").drop(columns=["__side", "__bucket"])
        rhs = rhs.dropna(axis=1, how="all").drop(columns=["__side", "__bucket"])
        return lhs.merge(rhs, left_on=on, right_on=right_on)

    return tagged.groupby("__bucket", num_partitions=min(num_buckets, 16)).map_groups(
        merge_bucket, batch_format="pandas"
    )
