"""Hive-layout (value-partitioned) parquet sink — the publishing format
of a released corpus: one ``col=value/`` directory per key so consumers
prune at the directory level (``lang=en/`` only) without reading a row
of anything else.  Complements the hash-partitioned manifest sink
(state/manifest.py — resume/lineage) and the WDS/JSONL shard sinks:
hash partitions balance work, VALUE partitions serve readers.

Resume contract: the write is atomic-by-marker — data lands under
``out_dir``, then a ``_DONE.json`` manifest (row count, per-partition
counts) commits it; a re-run with a valid marker SKIPS the write
entirely, and a run that died mid-write (no marker) cleans the stale
directory and rewrites.  Ray's native ``write_parquet(partition_cols=)``
does the distributed write — every block writes its own files under the
right partition directories, nothing corpus-sized on the driver.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa


def write_hive_partitioned(ds, out_dir: str, partition_cols: list,
                           select: "list | None" = None) -> dict:
    """Write ``ds`` as hive-partitioned parquet under ``out_dir`` and
    commit with a ``_DONE.json`` manifest; returns the manifest dict.
    A valid existing marker skips the write (resume); a stale partial
    write (directory without marker) is removed first."""
    from ray.data.aggregate import Count

    if not partition_cols:
        raise ValueError("write_hive_partitioned: partition_cols must be "
                         "non-empty")
    marker = os.path.join(out_dir, "_DONE.json")
    if os.path.exists(marker):
        with open(marker) as f:
            return json.load(f)
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    if select:
        ds = ds.select_columns(select)
    ds.write_parquet(out_dir, partition_cols=list(partition_cols))
    counts = (ds.groupby(list(partition_cols))
              .aggregate(Count(alias_name="n_rows")).to_pandas())
    key = counts[partition_cols].astype(str).agg("/".join, axis=1)
    manifest = {
        "n_rows": int(counts["n_rows"].sum()),
        "partition_cols": list(partition_cols),
        "partitions": dict(sorted(zip(key, counts["n_rows"].astype(int)))),
    }
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(tmp, marker)
    return manifest


def read_hive_partitioned(in_dir: str, columns: "list | None" = None):
    """Read a hive-partitioned directory back (partition columns are
    restored as regular columns by the parquet dataset machinery);
    refuses a directory without a commit marker."""
    import ray

    if not os.path.exists(os.path.join(in_dir, "_DONE.json")):
        raise FileNotFoundError(
            f"read_hive_partitioned: {in_dir} has no _DONE.json — the "
            "write never committed; refusing a possibly-partial read.")
    return ray.data.read_parquet(in_dir, columns=columns)
