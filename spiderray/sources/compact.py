"""Parquet compaction — the table-maintenance pass every long-lived
ingest needs: thousands of small files (per-task outputs, incremental
appends) rewritten into few right-sized ones so downstream reads stop
paying per-file open/footer costs.

Shape: stream the input through Ray (column-pruned read), repartition to
ceil(rows / rows_per_file) blocks (one output file per block — Ray's
write contract), write to a fresh directory, then atomically promote a
_DONE marker recording the row count; a rerun that finds the marker
skips the work (the manifest.py promotion pattern).  Content, not
layout, is the contract: the compacted table must read back identical.
"""

from __future__ import annotations

import json
import math
import os

import pyarrow.parquet as pq


def compact_parquet(in_path: str, out_dir: str,
                    rows_per_file: int = 1_000_000,
                    columns: list[str] | None = None) -> dict:
    """Compact ``in_path`` (file or directory) into ``out_dir``.  Returns
    {n_rows, n_files, skipped}.  Idempotent via a _DONE marker."""
    import ray.data as rd

    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            done = json.load(f)
        return {**done, "skipped": True}
    ds = rd.read_parquet(in_path, columns=columns)
    n = ds.count()
    n_files = max(math.ceil(n / rows_per_file), 1)
    tmp_dir = f"{out_dir}.tmp.{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)
    ds.repartition(n_files).write_parquet(tmp_dir)
    os.makedirs(os.path.dirname(out_dir) or ".", exist_ok=True)
    if os.path.exists(out_dir):
        import shutil

        shutil.rmtree(out_dir)
    os.replace(tmp_dir, out_dir)
    written = sum(
        pq.read_metadata(os.path.join(out_dir, f)).num_rows
        for f in os.listdir(out_dir) if f.endswith(".parquet"))
    if written != n:
        raise RuntimeError(
            f"compaction wrote {written} rows for {n} inputs — refusing "
            "to promote")
    stats = {"n_rows": int(n), "n_files": int(n_files)}
    with open(marker, "w") as f:
        json.dump(stats, f)
    return {**stats, "skipped": False}


def read_parquet_evolved(in_dir: str, columns: list[str] | None = None):
    """Read a parquet directory whose files have HETEROGENEOUS schemas —
    the long-lived-ingest reality where later appends added columns.
    The unified schema comes from the file FOOTERS (no data read:
    pa.unify_schemas over the metadata), then one map task per file
    aligns its table — missing columns null-filled, order normalized —
    so downstream stages see one stable schema.  Plain read_parquet
    fails or silently drops columns on such directories."""
    import pyarrow.parquet as pq_
    import ray.data as rd

    paths = sorted(
        os.path.join(in_dir, f) for f in os.listdir(in_dir)
        if f.endswith(".parquet"))
    if not paths:
        raise FileNotFoundError(f"no parquet under {in_dir}")
    import pyarrow as pa

    unified = pa.unify_schemas(
        [pq_.read_schema(p).remove_metadata() for p in paths])
    if columns is not None:
        unified = pa.schema([unified.field(c) for c in columns])
    src = rd.from_items([{"path": p} for p in paths])

    def load(batch: pa.Table) -> pa.Table:
        parts = []
        for path in batch.column("path").to_pylist():
            t = pq_.read_table(
                path, columns=[c for c in unified.names
                               if c in pq_.read_schema(path).names])
            arrays = []
            for field in unified:
                if field.name in t.column_names:
                    arrays.append(t.column(field.name).cast(field.type))
                else:
                    arrays.append(pa.nulls(t.num_rows, field.type))
            parts.append(pa.Table.from_arrays(arrays, schema=unified))
        return pa.concat_tables(parts)

    return src.map_batches(load, batch_format="pyarrow", batch_size=1)
