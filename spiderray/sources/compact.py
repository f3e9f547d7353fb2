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
